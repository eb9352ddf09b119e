#!/usr/bin/env python
"""VERDICT r15 ask #3: measure the pandas↔Arrow conversion share of the
q3 (SF² basic) and q9 (Stetson J) kernel queries BEFORE attempting any
mapInArrow rewrite (attempt only if conversion is >25 % of kernel wall).

Decomposition per query, interleaved reps, bench-identical session
(local[$SPARK_GRAFT_CPUS], shuffle partitions = cores, rev-4 actions):

  scan      — the ingest+prune legs with NO Python boundary (count of the
              pruned source), the floor every variant pays;
  noop      — the same sorted/projected map-path input through a
              mapInPandas that returns a constant 1-row frame per
              partition WITHOUT touching the data: boundary-only
              (JVM→Arrow serialization + worker IPC + Arrow→pandas input
              conversion), no kernel;
  pandas    — the real kernel via the default mapInPandas path;
  arrow     — the real kernel via the existing arrow_native=True twin
              (mapInArrow; numpy views straight off Arrow buffers, no
              pandas input materialization) — parity-locked by
              tests/test_batch.py::test_batch_arrow_native_*.

boundary share ≈ (noop − scan) / (pandas − scan); the pandas-conversion
share specifically is bounded above by (pandas − arrow) / (pandas − scan).

Prints one JSON line per (query, variant) with all rep walls.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "5"))


def main():
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    from pyspark.sql import functions as F

    # worker-pool warm (same as bench.py)
    def _noop(batches):
        for b in batches:
            yield b

    n_cpus = int(CPUS)
    spark.range(n_cpus * 4, numPartitions=n_cpus).mapInPandas(
        _noop, "id long"
    ).count()
    for tbl in ("lineitem",):
        df = spark.read.parquet(f"{SF_DIR}/{tbl}.parquet")
        df.agg(*[F.count(c) for c in df.columns]).collect()

    from tape_spark.analysis import calc_stetson_J

    def mk():
        e = em._ensemble(spark, SF_DIR)
        e.prune(threshold=5)
        return e

    def scan():
        e = mk()
        e.source.count()

    # boundary-only: the exact map-path input plan (sort + narrow
    # projection of the shipped columns), kernel replaced by a constant
    def boundary(cols):
        e = mk()
        src = e.source.sortWithinPartitions("l_orderkey", "t").select(*cols)

        def one_row(batches):
            n = 0
            for b in batches:
                n += len(b)  # consume: forces full transfer + conversion
            yield pd.DataFrame({"n": [n]})

        src.mapInPandas(one_row, "n long").count()

    variants = {
        "q9_scan": scan,
        "q9_noop_boundary": lambda: boundary(
            ["l_orderkey", "l_extendedprice", "l_quantity", "l_returnflag"]
        ),
        "q9_pandas": lambda: mk().batch(calc_stetson_J).count(),
        "q9_arrow": lambda: mk()
        .batch(calc_stetson_J, arrow_native=True)
        .count(),
        "q3_pandas": lambda: mk().sf2(sf_method="basic").count(),
        "q3_arrow": None,  # filled below (sf2 has no arrow_native arg)
    }

    def q3_arrow():
        e = mk()
        from tape_spark.analysis.structure_function import (
            StructureFunctionArgumentContainer,
        )
        from tape_spark.analysis.structurefunction2 import calc_sf2

        ac = StructureFunctionArgumentContainer()
        ac.sf_method = "basic"
        e.batch(calc_sf2, sf_method="basic", argument_container=ac,
                arrow_native=True).count()

    variants["q3_arrow"] = q3_arrow

    def calib():
        spark.range(50_000_000, numPartitions=n_cpus).agg(F.sum("id")).collect()

    walls = {k: [] for k in list(variants) + ["calibration"]}
    for _ in range(REPS):
        for name, fn in list(variants.items()) + [("calibration", calib)]:
            t0 = time.time()
            fn()
            walls[name].append(round(time.time() - t0, 3))
    for name, ts in walls.items():
        print(json.dumps({"op": name, "walls": ts,
                          "median": round(float(np.median(ts)), 3),
                          "min": round(min(ts), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()

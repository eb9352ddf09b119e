#!/usr/bin/env python
"""Round-16 session-3 probe #2: the kernel queries (q3/q9) under
deferred-then-materialized cohesion.

Simulated deferred design: ingest WITHOUT the cohesion repartition;
prune's calc_nobs partial-aggregates over the raw scan (id column only);
sync broadcast-semi-joins (no source shuffle); the cohesion repartition
is applied AFTER the sync, so it carries only surviving rows; the batch
map path then runs as today. Compare wall + result parity vs current.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "7"))


def main():
    from pyspark.sql import SparkSession, functions as F

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
    from tape_spark import ColumnMapper, Ensemble
    from tape_spark.analysis import calc_stetson_J

    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="t",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )

    def ens_current():
        return em._ensemble(spark, SF_DIR)

    def ens_deferred_materialized(threshold=5):
        e = Ensemble(spark).from_spark(
            em._lineitem_source(spark, SF_DIR),
            column_mapper=cm,
            npartitions=None,
            partition_by_id=False,
        )
        e.prune(threshold=threshold)
        e._lazy_sync_tables("all")
        e.frames["source"] = e.frames["source"].repartition(32, "l_orderkey")
        e._source_cohesive = True
        return e

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(128, numPartitions=32).mapInPandas(_noop, "id long").count()
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df.agg(*[F.count(c) for c in df.columns]).collect()

    def q9_current():
        e = ens_current()
        e.prune(threshold=5)
        e.batch(calc_stetson_J).count()

    def q9_deferred():
        e = ens_deferred_materialized()
        e.batch(calc_stetson_J).count()

    def q3_current():
        e = ens_current()
        e.prune(threshold=5)
        e.sf2(sf_method="basic").count()

    def q3_deferred():
        e = ens_deferred_materialized()
        e.sf2(sf_method="basic").count()

    def calib():
        spark.range(50_000_000, numPartitions=32).agg(F.sum("id")).collect()

    jobs = [
        ("q9_current", q9_current),
        ("q9_deferred", q9_deferred),
        ("q3_current", q3_current),
        ("q3_deferred", q3_deferred),
        ("calibration", calib),
    ]
    samples = {n: [] for n, _ in jobs}
    for _ in range(REPS):
        for n, fn in jobs:
            t0 = time.time()
            fn()
            samples[n].append(round(time.time() - t0, 3))

    print(
        json.dumps(
            {
                n: {"median": round(float(np.median(ts)), 3), "min": min(ts), "samples": ts}
                for n, ts in samples.items()
            },
            indent=1,
        )
    )

    # parity: stetson rows identical
    ea = ens_current()
    ea.prune(threshold=5)
    ra = sorted(
        (r[0], round(r[1], 6) if r[1] == r[1] else "nan")
        for r in ea.batch(calc_stetson_J).collect()
    )
    eb = ens_deferred_materialized()
    rb = sorted(
        (r[0], round(r[1], 6) if r[1] == r[1] else "nan")
        for r in eb.batch(calc_stetson_J).collect()
    )
    print("q9 rows identical:", ra == rb, "n:", len(ra), len(rb))
    spark.stop()


if __name__ == "__main__":
    main()

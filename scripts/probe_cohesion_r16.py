#!/usr/bin/env python
"""Round-16 session-3 probe: is the ingest-time cohesion repartition a
measurable cost for the aggregate-only ensemble workflows (q1/q2/q6)?

Hypothesis (guide §2.3 "aggregate before you shuffle", §2.4 "remove
shuffles outright"): `_ensemble` applies `repartition(npartitions, id)`
at ingest, so
  - q1 (batch np.mean -> builtin agg) shuffles FULL source rows through
    the cohesion exchange, then aggregates in place -- where a plain
    groupBy would partial-aggregate map-side and shuffle only the tiny
    (id, sum, count) rows;
  - q2 (prune + sync + limit) pays the full-row exchange although its
    sync semi-join broadcasts the id set (no source shuffle needed);
  - q6 (bin_sources) likewise aggregates in place after a full-row
    exchange where partial aggregation would shuffle aggregated rows.
Only the kernel queries (q3/q9, mapInPandas over cohesive partitions)
actually need the id-partitioned layout.

Variant B simulates deferred cohesion with from_spark(...,
npartitions=None, partition_by_id=False) -- legal API, same results.
A/B interleaved in the same session, REPS reps each, plus a JVM
calibration per rep pair.
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

    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="t",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )

    def ens_current():
        return em._ensemble(spark, SF_DIR)

    def ens_deferred():
        return Ensemble(spark).from_spark(
            em._lineitem_source(spark, SF_DIR),
            column_mapper=cm,
            npartitions=None,
            partition_by_id=False,
        )

    # warm the page cache + worker pool like the bench does
    def _noop(batches):
        for b in batches:
            yield b

    spark.range(128, numPartitions=32).mapInPandas(_noop, "id long").count()
    for tbl in ("lineitem",):
        df = spark.read.parquet(f"{SF_DIR}/{tbl}.parquet")
        df.agg(*[F.count(c) for c in df.columns]).collect()

    def q1(mk):
        e = mk()
        e.batch(np.mean, "l_extendedprice", meta=("result", float)).agg(
            F.count("result")
        ).collect()

    def q2(mk):
        e = mk()
        e.prune(threshold=5)
        e.source.limit(5).collect()

    def q6(mk):
        e = mk()
        e.bin_sources(time_window=604800.0, count_col="bin_count")
        e.frames["source"].agg(
            F.sum("bin_count"), F.avg("l_extendedprice"), F.avg("l_quantity")
        ).collect()

    def calib():
        spark.range(50_000_000, numPartitions=32).agg(F.sum("id")).collect()

    jobs = []
    for q, name in ((q1, "q1"), (q2, "q2"), (q6, "q6")):
        jobs.append((f"{name}_current", lambda q=q: q(ens_current)))
        jobs.append((f"{name}_deferred", lambda q=q: q(ens_deferred)))
    jobs.append(("calibration", calib))

    samples = {n: [] for n, _ in jobs}
    for _ in range(REPS):
        for n, fn in jobs:
            t0 = time.time()
            fn()
            samples[n].append(round(time.time() - t0, 3))

    out = {
        n: {
            "median": round(float(np.median(ts)), 3),
            "min": min(ts),
            "samples": ts,
        }
        for n, ts in samples.items()
    }
    print(json.dumps(out, indent=1))

    # result-identity spot check: q1 aggregate rows, q6 aggregate rows
    a = (
        ens_current()
        .batch(np.mean, "l_extendedprice", meta=("result", float))
        .orderBy("l_orderkey")
        .limit(50)
        .collect()
    )
    b = (
        ens_deferred()
        .batch(np.mean, "l_extendedprice", meta=("result", float))
        .orderBy("l_orderkey")
        .limit(50)
        .collect()
    )
    print("q1 rows identical:", a == b)
    ea, eb = ens_current(), ens_deferred()
    for e in (ea, eb):
        e.bin_sources(time_window=604800.0, count_col="bin_count")
    ra = ea.frames["source"].agg(F.sum("bin_count"), F.round(F.avg("l_extendedprice"), 6)).collect()
    rb = eb.frames["source"].agg(F.sum("bin_count"), F.round(F.avg("l_extendedprice"), 6)).collect()
    print("q6 aggs identical:", ra == rb, ra, rb)
    spark.stop()


if __name__ == "__main__":
    main()

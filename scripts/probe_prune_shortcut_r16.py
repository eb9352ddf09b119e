#!/usr/bin/env python
"""Round-16 session-3 probe #3: prune/sync plan-slimming.

Current prune path (calc_nobs + sync) per ensemble query:
  object = src.select(id).distinct()            # hash agg 1
  counts = src.groupBy(id).count()              # hash agg 2
  object = object.join(counts, id, left).fill(0)  # join 1
  object = object.filter(nobs >= k)
  sync: src.join(object.select(id).distinct(), id, left_semi)  # hash agg 3 + join 2

Shortcut variant:
  object = src.groupBy(id).agg(count(*) as nobs_total)  # hash agg 1 (same rows)
  object = object.filter(nobs >= k)
  sync: src.join(object.select(id), id, left_semi)      # join 1 (ids already unique)

Rows identical by construction (derived object's ids == count keys; a
left_semi join is insensitive to build-side duplicates). Measures q2/q9
shapes A/B in one session.
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
    from tape_spark.analysis import calc_stetson_J

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(128, numPartitions=32).mapInPandas(_noop, "id long").count()
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df.agg(*[F.count(c) for c in df.columns]).collect()

    ID = "l_orderkey"

    def pruned_source_current(threshold=5):
        e = em._ensemble(spark, SF_DIR)
        e.prune(threshold=threshold)
        e._lazy_sync_tables("all")
        return e, e.frames["source"]

    def pruned_source_shortcut(threshold=5):
        e = em._ensemble(spark, SF_DIR)
        src = e.frames["source"]
        obj = src.groupBy(ID).agg(F.count(F.lit(1)).alias("nobs_total"))
        obj = obj.filter(F.col("nobs_total") >= threshold)
        ids = e._sync_build_side(obj.select(ID))
        synced = src.join(ids, on=ID, how="left_semi")
        e.frames["source"] = synced
        e.frames["object"] = obj.select(ID)
        e._source_dirty = False
        e._object_dirty = False
        return e, synced

    def q2_current():
        _, src = pruned_source_current()
        src.limit(5).collect()

    def q2_shortcut():
        _, src = pruned_source_shortcut()
        src.limit(5).collect()

    def q9_current():
        e, _ = pruned_source_current()
        e.batch(calc_stetson_J).count()

    def q9_shortcut():
        e, _ = pruned_source_shortcut()
        e.batch(calc_stetson_J).count()

    def calib():
        spark.range(50_000_000, numPartitions=32).agg(F.sum("id")).collect()

    jobs = [
        ("q2_current", q2_current),
        ("q2_shortcut", q2_shortcut),
        ("q9_current", q9_current),
        ("q9_shortcut", q9_shortcut),
        ("calibration", calib),
    ]
    samples = {n: [] for n, _ in jobs}
    # ABBA interleave per rep so ambient drift cancels between variants
    order_fwd = jobs
    order_rev = list(reversed(jobs))
    for i in range(REPS):
        for n, fn in order_fwd if i % 2 == 0 else order_rev:
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

    # parity: pruned source row sets identical
    _, sa = pruned_source_current()
    _, sb = pruned_source_shortcut()
    ca, cb = sa.count(), sb.count()
    diff = sa.exceptAll(sb).count() + sb.exceptAll(sa).count()
    print("pruned source identical:", ca == cb and diff == 0, ca, cb, "diff:", diff)

    # parity: stetson rows identical (result column is a map; compare reprs)
    ea, _ = pruned_source_current()
    ra = sorted(str(r) for r in ea.batch(calc_stetson_J).collect())
    eb, _ = pruned_source_shortcut()
    rb = sorted(str(r) for r in eb.batch(calc_stetson_J).collect())
    print("q9 rows identical:", ra == rb, "n:", len(ra), len(rb))

    # plan shapes
    for name, frame in (("current", sa), ("shortcut", sb)):
        p = frame._jdf.queryExecution().explainString("formatted")
        print(
            name,
            "Exchange:", p.count("Exchange"),
            "HashAggregate:", p.count("HashAggregate"),
            "Join:", p.count("Join"),
        )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump the pruned-source and q9-batch plans (formatted) for the tree whose
repo dir is argv[1]; writes to argv[2].

Produced plans/r16/prune_sync_{before,after}.txt (before = a worktree at
f13c891, after = the prune/sync-slimmed tree): the calc_nobs shortcut on
the auto-derived object table drops one scan+exchange+double-HashAggregate
subtree (the distinct) and the Inner join per prune action; the sync
semi-join keeps only the count build side."""
import os
import sys

repo = sys.argv[1]
out = sys.argv[2]
sys.path.insert(0, repo)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def fmt(df):
    from io import StringIO
    import contextlib
    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

import __spark_entry__ as em
from tape_spark.analysis import calc_stetson_J

e = em._ensemble(spark, "/root/testdata/sf0.1")
e.prune(threshold=5)
src = e.source
plan1 = fmt(src)
res = e.batch(calc_stetson_J)
plan2 = fmt(res)
with open(out, "w") as f:
    f.write("=== pruned source ===\n")
    f.write(plan1)
    f.write("\n=== q9 batch(stetson) ===\n")
    f.write(plan2)
for name, p in (("pruned_source", plan1), ("q9_batch", plan2)):
    print(
        name,
        "Exchange:", p.count("Exchange"),
        "HashAggregate:", p.count("HashAggregate"),
        "Join:", p.count("Join"),
        "Scan:", p.count("Scan parquet"),
    )
spark.stop()

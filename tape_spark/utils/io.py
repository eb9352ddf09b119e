"""Partitioned-parquet compaction shared by the append-able indexes.

Every append-able index in the engine (``bm25_append_index``,
``ivfpq_append_index``, ``minhash_append_store``) grows by plain parquet
appends: N appends leave N files inside EVERY partition directory the
batches touched, and a partition-pruned query then opens N footers per
pruned partition — read amplification that grows silently with ingest
count. Compaction is the standard warehouse answer: rewrite each
partition as one file (plus optional within-partition sort for row-group
locality), atomically swap directories, and queries read exactly the
rows they read before — the operators assert bit-identical results in
tests.

The swap is two local renames (write to ``<dir>__compact_tmp``, move the
old dir aside, move tmp in, delete old). On an object store you would
instead swap a manifest/table pointer (Iceberg/Delta style); the rename
convention here matches the local/HDFS filesystems the rest of the
index layout targets.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Sequence


def compact_partitioned_parquet(
    spark,
    dirpath: str,
    part_col: str,
    sort_cols: Optional[Sequence[str]] = None,
) -> int:
    """Rewrite ``dirpath`` (a ``partitionBy(part_col)`` parquet dir) with
    one file per partition value. Returns the number of data files
    BEFORE compaction (so callers can log the amplification removed)."""
    from pyspark.sql import functions as F

    n_before = sum(
        1
        for root, _, files in os.walk(dirpath)
        for f in files
        if f.endswith(".parquet")
    )
    df = spark.read.parquet(dirpath)
    # hash-repartition on the partition column: every partition value
    # lands in exactly one task, so each partition dir gets ONE file
    w = df.repartition(F.col(part_col))
    if sort_cols:
        w = w.sortWithinPartitions(*sort_cols)
    tmp = dirpath.rstrip("/") + "__compact_tmp"
    w.write.partitionBy(part_col).mode("overwrite").parquet(tmp)
    old = dirpath.rstrip("/") + "__compact_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(dirpath, old)
    os.rename(tmp, dirpath)
    shutil.rmtree(old)
    return n_before

#!/usr/bin/env python
"""Capture `.explain("formatted")` for every query the round-15
optimization touched, at an arbitrary repo revision.

Usage:
    TAPE_REPO=/root/repo  OUT_DIR=/root/repo/plans/r15  SUFFIX=after \
        python capture_plans_r15.py

TAPE_REPO points at the package tree to import (a git worktree of the
pre-round commit for the `_before` files, the live tree for `_after`);
OUT_DIR receives `<query>_<SUFFIX>.txt`.
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile

REPO = os.environ.get("TAPE_REPO", "/root/repo")
OUT = os.environ.get("OUT_DIR", "/root/repo/plans/r15")
SUFFIX = os.environ.get("SUFFIX", "after")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

sys.path.insert(0, REPO)


def explain_to_file(df, name: str) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    os.makedirs(OUT, exist_ok=True)
    with open(f"{OUT}/{name}_{SUFFIX}.txt", "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {name}_{SUFFIX}.txt")


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tape_spark.operators import (
        chunk_documents,
        decontaminate,
        exact_dedup,
        language_id,
        minhash_near_duplicates,
        stratified_sample,
        text_quality,
    )
    from tape_spark.operators.joins import asof_join

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # q4 of the bench: the slim banded minhash join
    explain_to_file(
        minhash_near_duplicates(
            docs, num_hashes=64, bands=16, threshold=0.3, max_bucket_size=256
        ),
        "q4_minhash_lsh",
    )

    # q7 of the bench, per component (each is its own action in bench.py)
    explain_to_file(
        language_id(docs).groupBy("pred_lang").count(), "q7_language_id"
    )
    explain_to_file(
        text_quality(docs).agg(F.avg("avg_token_len"), F.avg("punct_ratio")),
        "q7_text_quality",
    )
    explain_to_file(exact_dedup(docs), "q7_exact_dedup")

    # q10 of the bench: decontaminate -> semi-join -> stratified -> chunk
    bench_set = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)
    clean = decontaminate(train, bench_set, n=3).filter(~F.col("is_contaminated"))
    kept = stratified_sample(
        train.join(clean.select("doc_id"), "doc_id", "left_semi"),
        "lang",
        {"en": 0.8, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 0.8},
    )
    explain_to_file(
        chunk_documents(kept, chunk_tokens=64, overlap_tokens=8),
        "q10_curation_pipeline",
    )

    # the salted asof (r15: auto-S + eqNullSafe carry repair)
    left = spark.range(1000).selectExpr(
        "id AS event_id",
        "cast(id % 7 AS string) AS key",
        "cast(id AS double) AS t",
    )
    right = spark.range(500).selectExpr(
        "cast(id % 7 AS string) AS key",
        "cast(id * 2 AS double) AS t",
        "id AS payload",
    )
    explain_to_file(
        asof_join(left, right, on="t", by="key", salt_slices=2), "asof_salted"
    )

    # the streaming matcher's per-trigger batch plan against a tiny store
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming.neardup import minhash_match_batch, minhash_save_store

    tmp = tempfile.mkdtemp(prefix="plans_store_")
    try:
        store = f"{tmp}/store"
        sigs = minhash_signatures(docs.limit(200), num_hashes=64)
        minhash_save_store(sigs, store, bands=16)
        arrivals = docs.filter(F.col("doc_id") % 17 == 3).limit(50)
        explain_to_file(
            minhash_match_batch(arrivals, store, threshold=0.3),
            "stream_match_batch",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Capture `.explain("formatted")` for every query/operator the round-16
optimization touches, at an arbitrary repo revision.

Usage:
    TAPE_REPO=/root/repo  OUT_DIR=/root/repo/plans/r16  SUFFIX=after \
        python capture_plans_r16.py

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
OUT = os.environ.get("OUT_DIR", "/root/repo/plans/r16")
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
        bm25_build_index,
        chunk_documents,
        decontaminate,
        dedup_clusters,
        ngram_jaccard_pairs,
        stratified_sample,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench_set = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)

    # decontaminate, both benchmark-distribution strategies (broadcast is
    # the q10 bench path; bloom is the declared-query path)
    explain_to_file(
        decontaminate(train, bench_set, n=3), "decontaminate_broadcast"
    )
    explain_to_file(
        decontaminate(train, bench_set, n=3, method="bloom"),
        "decontaminate_bloom",
    )

    # q10 of the bench: decontaminate -> semi-join -> stratified -> chunk
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

    # the exact n-gram Jaccard inverted-index join (dedup_ngram_jaccard /
    # dedup_clusters / the minhash recall contract's exact side)
    explain_to_file(
        ngram_jaccard_pairs(docs, n=2, threshold=0.2), "ngram_jaccard"
    )
    explain_to_file(dedup_clusters(docs, n=2, threshold=0.2), "dedup_clusters")

    # BM25 index build (postings side; the stats side is one aggregate)
    postings, stats = bm25_build_index(docs)
    explain_to_file(postings, "bm25_postings")
    explain_to_file(stats, "bm25_stats")

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
        # the r16 broadcast guard's fallback path: an "oversized" arrival
        # batch (cap forced tiny) must plan every guarded leg WITHOUT the
        # F.broadcast pin (shuffle joins; auto-broadcast disabled too so
        # the dump shows the genuinely-huge regime, where Catalyst's own
        # estimates would also decline)
        import warnings

        spark.conf.set("spark.tape.match.maxBroadcastBytes", "1k")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                explain_to_file(
                    minhash_match_batch(arrivals, store, threshold=0.3),
                    "stream_match_fallback",
                )
        finally:
            spark.conf.unset("spark.tape.match.maxBroadcastBytes")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()

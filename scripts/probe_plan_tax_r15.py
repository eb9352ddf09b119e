#!/usr/bin/env python
"""Driver-side plan-construction tax probe for the batch text/curation ops
(round 15). Times ONLY DataFrame construction (no action): the wall here is
py4j round trips building Column trees, charged to every user call.

Run:  python scripts/probe_plan_tax_r15.py
Prints one JSON line per op: {"op": ..., "walls": [cold, warm...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 6


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    from tape_spark.operators import (
        chunk_documents,
        decontaminate,
        exact_dedup,
        language_id,
        stratified_sample,
        text_quality,
    )

    bench_set = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)

    ops = {
        "language_id": lambda: language_id(docs),
        "text_quality": lambda: text_quality(docs),
        "exact_dedup": lambda: exact_dedup(docs),
        "chunk_documents": lambda: chunk_documents(
            docs, chunk_tokens=64, overlap_tokens=8
        ),
        "decontaminate": lambda: decontaminate(train, bench_set, n=3),
        "stratified_sample": lambda: stratified_sample(
            train, "lang", {"en": 0.8, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 0.8}
        ),
        # the full q7/q10 bench bodies MINUS their actions, so per-op sums
        # can be checked against the whole-pipeline construction wall
        "q7_construct": lambda: (
            language_id(docs).groupBy("pred_lang").count(),
            text_quality(docs).agg(F.avg("avg_token_len"), F.avg("punct_ratio")),
            exact_dedup(docs),
        ),
        "q10_construct": lambda: chunk_documents(
            stratified_sample(
                train.join(
                    decontaminate(train, bench_set, n=3)
                    .filter(~F.col("is_contaminated"))
                    .select("doc_id"),
                    "doc_id",
                    "left_semi",
                ),
                "lang",
                {"en": 0.8, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 0.8},
            ),
            chunk_tokens=64,
            overlap_tokens=8,
        ),
    }

    for name, fn in ops.items():
        walls = []
        for _ in range(REPS):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 4))
        print(json.dumps({"op": name, "walls": walls}))

    spark.stop()


if __name__ == "__main__":
    main()

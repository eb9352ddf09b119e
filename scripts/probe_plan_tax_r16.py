#!/usr/bin/env python
"""Driver-side plan-construction tax probe for round 16's targets: the
eager per-Dataset analysis floor on decontaminate / ngram_jaccard_pairs /
bm25_build_index (+ the streaming matcher's plan build). Times ONLY
DataFrame construction (no action): r15 measured this floor at ~16 ms per
new Dataset (eager JVM analysis), round-trip-independent, so the lever is
FRAME COUNT (guide §1.2).

Run:  python scripts/probe_plan_tax_r16.py
Prints one JSON line per op: {"op": ..., "walls": [cold, warm...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 12


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
        bm25_build_index,
        decontaminate,
        ngram_jaccard_pairs,
    )

    bench_set = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)

    # JIT-warm the analyzer first (the r15 probe measured its targets after
    # six other ops had warmed the JVM; a cold analyzer adds ~5x to every
    # construction wall and would masquerade as operator cost)
    from tape_spark.operators import language_id, text_quality

    for _ in range(6):
        language_id(docs)
        text_quality(docs)

    # bloom LAST: its bitmap build runs real jobs whose GC/JIT residue
    # pollutes the construction walls of whatever runs after it
    ops = {
        "decontaminate": lambda: decontaminate(train, bench_set, n=3),
        "ngram_jaccard_pairs": lambda: ngram_jaccard_pairs(
            docs, n=2, threshold=0.2
        ),
        "bm25_build_index": lambda: bm25_build_index(docs),
        "decontaminate_bloom": lambda: decontaminate(
            train, bench_set, n=3, method="bloom"
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

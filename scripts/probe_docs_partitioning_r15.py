#!/usr/bin/env python
"""Measure the cost of `_docs`'s unconditional repartition(32) at sf0.1.

Every q4/q7/q10 action flows through `_docs`, which spreads the
single-row-group corpus with `.repartition(defaultParallelism)` — a
core-count constant. Guide §2 says derive width from INPUT SIZE. This
probe times the bench actions under three widths:

  rep32 — current (defaultParallelism = $SPARK_GRAFT_CPUS)
  repK  — size-derived (ceil(rows / 1000), clamped to [1, cores])
  rep1  — degenerate single partition (lower bound on exchange cost)

Bench-identical session, interleaved reps, stage metrics via REST API.
Emits JSON lines; appends to $PROBE_OUT.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("PROBE_REPS", "5"))
OUT = os.environ.get("PROBE_OUT", "/tmp/probe_docs_partitioning_r15.json")


def session():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _ui_base(spark):
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return f"{url}/api/v1/applications/{app}"


def _fetch_stages(spark):
    with urllib.request.urlopen(f"{_ui_base(spark)}/stages?status=complete") as r:
        return json.loads(r.read())


def timed(spark, fn):
    before = {s["stageId"] for s in _fetch_stages(spark)}
    t0 = time.time()
    fn()
    wall = time.time() - t0
    stages = [s for s in _fetch_stages(spark) if s["stageId"] not in before]
    return wall, {
        "run_ms": sum(s.get("executorRunTime", 0) for s in stages),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
        "n_stages": len(stages),
    }


def emit(phase, payload):
    rec = {"phase": phase, **payload}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


def warm(spark):
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    def _noop(batches):
        for b in batches:
            yield b

    n = int(CPUS)
    spark.range(n * 4, numPartitions=n).mapInPandas(_noop, "id long").count()
    for tbl in ("documents",):
        df = spark.read.parquet(f"{SF_DIR}/{tbl}.parquet")
        df.agg(*[F.count(c) for c in df.columns]).collect()
    return em


def main():
    spark = session()
    em = warm(spark)
    from pyspark.sql import functions as F

    from tape_spark.operators import (
        chunk_documents,
        decontaminate,
        exact_dedup,
        language_id,
        minhash_near_duplicates,
        stratified_sample,
        text_quality,
    )

    base = em._read_parquet(spark, f"{SF_DIR}/documents.parquet")
    rows = base.count()
    k = max(1, min(int(CPUS), math.ceil(rows / 1000)))
    variants_docs = [
        ("rep32", base.repartition(spark.sparkContext.defaultParallelism)),
        (f"rep{k}", base.repartition(k)),
        ("rep1", base.repartition(1)),
    ]

    def q7(docs):
        def f():
            language_id(docs).groupBy("pred_lang").count().collect()
            text_quality(docs).agg(
                F.avg("avg_token_len"), F.avg("punct_ratio")
            ).collect()
            exact_dedup(docs).count()

        return f

    def q4(docs):
        return lambda: minhash_near_duplicates(
            docs, num_hashes=64, bands=16, threshold=0.3, max_bucket_size=256
        ).count()

    def q10(docs):
        def f():
            bench_set = docs.filter(F.col("doc_id") % 23 == 0)
            train = docs.filter(F.col("doc_id") % 23 != 0)
            clean = decontaminate(train, bench_set, n=3).filter(
                ~F.col("is_contaminated")
            )
            kept = stratified_sample(
                train.join(clean.select("doc_id"), "doc_id", "left_semi"),
                "lang",
                {"en": 0.8, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 0.8},
            )
            chunk_documents(kept, chunk_tokens=64, overlap_tokens=8).count()

        return f

    variants = []
    for name, docs in variants_docs:
        variants.append((f"q7_{name}", q7(docs)))
        variants.append((f"q4_{name}", q4(docs)))
        variants.append((f"q10_{name}", q10(docs)))

    out = {
        name: {"walls": [], "run_ms": 0, "tasks": 0} for name, _ in variants
    }
    for _ in range(REPS):
        for name, fn in variants:
            wall, m = timed(spark, fn)
            out[name]["walls"].append(round(wall, 3))
            out[name]["run_ms"] += m["run_ms"]
            out[name]["tasks"] += m["tasks"]
    emit("docs_partitioning", {"reps": REPS, "rows": rows, "k": k, "results": out})
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Kernel decomposition of the two heaviest bench queries (q7, q10) at
sf0.1 — measure-first evidence for the second r15 session.

Phases:
  q7_split   — q7's three actions timed separately + language_id's
               per-expression kernels (4x regexp_count stopword votes,
               CJK rlike, lower()) isolated via noop-consumed projections
  q10_split  — q10's pipeline stages timed separately (decontaminate agg,
               semi join, stratified draw, chunk+count) + decontaminate's
               tokenize/ngram/hash kernels isolated

Bench-identical session shape (local[$SPARK_GRAFT_CPUS], shuffle
partitions = core count, AQE on), bench-identical warmup (source persist
+ page-cache warm + worker-pool spin-up), interleaved reps, stage metrics
from the status REST API. Emits JSON lines to stdout and appends to
$PROBE_OUT (default /tmp/probe_bench_kernels_r15.json).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("PROBE_REPS", "5"))
OUT = os.environ.get("PROBE_OUT", "/tmp/probe_bench_kernels_r15.json")


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
        "cpu_ms": sum(s.get("executorCpuTime", 0) for s in stages) // 1_000_000,
        "input_mb": round(sum(s.get("inputBytes", 0) for s in stages) / 1e6, 1),
    }


def emit(phase, payload):
    rec = {"phase": phase, **payload}
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


def interleave(spark, variants, reps=REPS):
    """variants: list[(name, thunk)] — interleaved reps, per-variant walls
    and summed stage metrics."""
    out = {name: {"walls": [], "run_ms": 0, "cpu_ms": 0} for name, _ in variants}
    for _ in range(reps):
        for name, fn in variants:
            wall, m = timed(spark, fn)
            out[name]["walls"].append(round(wall, 3))
            out[name]["run_ms"] += m["run_ms"]
            out[name]["cpu_ms"] += m["cpu_ms"]
    return out


def warm(spark):
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    def _noop(batches):
        for b in batches:
            yield b

    n = int(CPUS)
    spark.range(n * 4, numPartitions=n).mapInPandas(_noop, "id long").count()
    for tbl in ("lineitem", "documents", "embeddings", "events"):
        p = f"{SF_DIR}/{tbl}.parquet"
        if os.path.exists(p):
            df = spark.read.parquet(p)
            df.agg(*[F.count(c) for c in df.columns]).collect()
    return em


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def q7_split():
    spark = session()
    em = warm(spark)
    from pyspark.sql import functions as F

    from tape_spark.operators import exact_dedup, language_id, text_quality

    docs = em._docs(spark, SF_DIR)

    variants = [
        ("lang_id_full", lambda: language_id(docs).groupBy("pred_lang").count().collect()),
        ("quality_full", lambda: text_quality(docs).agg(
            F.avg("avg_token_len"), F.avg("punct_ratio")).collect()),
        ("exact_dedup_full", lambda: exact_dedup(docs).count()),
        # kernel isolation: each expression consumed via an aggregate so
        # pruning can't drop it; scan-only control for the baseline
        ("scan_only", lambda: docs.selectExpr("sum(length(text)) AS s").collect()),
        ("k_lower", lambda: docs.selectExpr(
            "sum(length(lower(text))) AS s").collect()),
        ("k_one_vote", lambda: docs.selectExpr(
            "sum(regexp_count(lower(text), '\\\\b(the|and|of|to|is|in|that|it)\\\\b')) AS s"
        ).collect()),
        ("k_four_votes", lambda: docs.selectExpr(
            "sum(regexp_count(lower(text), '\\\\b(the|and|of|to|is|in|that|it)\\\\b') +"
            " regexp_count(lower(text), '\\\\b(der|die|das|und|ist|nicht|ein|zu)\\\\b') +"
            " regexp_count(lower(text), '\\\\b(le|la|les|et|est|une|que|dans)\\\\b') +"
            " regexp_count(lower(text), '\\\\b(el|los|las|es|una|que|por|con)\\\\b')) AS s"
        ).collect()),
        ("k_cjk_rlike", lambda: docs.selectExpr(
            "count_if(text RLIKE '[一-鿿]') AS s").collect()),
        # quality kernels
        ("k_split_count", lambda: docs.selectExpr(
            "sum(CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE size(split(trim(text), '\\\\s+')) END) AS s").collect()),
        ("k_ws_strip_regex", lambda: docs.selectExpr(
            "sum(length(regexp_replace(trim(text), '\\\\s+', ''))) AS s").collect()),
        ("k_punct_strip_regex", lambda: docs.selectExpr(
            "sum(length(regexp_replace(text, '[.,!?;:]', ''))) AS s").collect()),
        # candidate replacements (equivalence checked separately)
        ("k_ws_strip_translate", lambda: docs.selectExpr(
            "sum(length(translate(trim(text), ' \\t\\n\\u000B\\f\\r', ''))) AS s").collect()),
        ("k_punct_strip_translate", lambda: docs.selectExpr(
            "sum(length(translate(text, '.,!?;:', ''))) AS s").collect()),
        # dedup kernel
        ("k_sha2", lambda: docs.selectExpr(
            "count(distinct sha2(text, 256)) AS s").collect()),
        ("k_xxhash", lambda: docs.selectExpr(
            "count(distinct xxhash64(text)) AS s").collect()),
    ]
    emit("q7_split", {"reps": REPS, "results": interleave(spark, variants)})
    spark.stop()


def q10_split():
    spark = session()
    em = warm(spark)
    from pyspark.sql import functions as F

    from tape_spark.operators import chunk_documents, decontaminate, stratified_sample

    docs = em._docs(spark, SF_DIR)
    bench_set = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)

    def decon_only():
        noop(decontaminate(train, bench_set, n=3).filter(~F.col("is_contaminated")))

    def full():
        clean = decontaminate(train, bench_set, n=3).filter(~F.col("is_contaminated"))
        kept = stratified_sample(
            train.join(clean.select("doc_id"), "doc_id", "left_semi"),
            "lang",
            {"en": 0.8, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 0.8},
        )
        chunk_documents(kept, chunk_tokens=64, overlap_tokens=8).count()

    def chunk_only():
        chunk_documents(train, chunk_tokens=64, overlap_tokens=8).count()

    variants = [
        ("full_pipeline", full),
        ("decon_only", decon_only),
        ("chunk_only", chunk_only),
        # decontaminate kernels over the train side
        ("k_tokens", lambda: noop(train.selectExpr(
            "doc_id", "size(split(trim(text), '\\\\s+')) AS s"))),
        ("k_grams_explode", lambda: noop(
            train.selectExpr("doc_id", "split(trim(text), '\\\\s+') AS __tk")
            .selectExpr(
                "doc_id",
                "explode_outer(array_distinct(CASE WHEN size(__tk) >= 3 THEN "
                "transform(sequence(0, size(__tk) - 3), "
                "i -> array_join(slice(__tk, i + 1, 3), ' ')) "
                "ELSE cast(array() as array<string>) END)) AS g"))),
        ("k_grams_hash_agg", lambda: train.selectExpr(
            "doc_id", "split(trim(text), '\\\\s+') AS __tk")
            .selectExpr(
                "doc_id",
                "explode_outer(array_distinct(CASE WHEN size(__tk) >= 3 THEN "
                "transform(sequence(0, size(__tk) - 3), "
                "i -> array_join(slice(__tk, i + 1, 3), ' ')) "
                "ELSE cast(array() as array<string>) END)) AS g")
            .selectExpr("doc_id", "xxhash64(g) AS h")
            .groupBy("doc_id").agg(F.expr("count(h) AS n"))
            .agg(F.sum("n")).collect()),
    ]
    emit("q10_split", {"reps": REPS, "results": interleave(spark, variants)})
    spark.stop()


if __name__ == "__main__":
    phases = sys.argv[1:] or ["q7_split", "q10_split"]
    for p in phases:
        globals()[p]()

#!/usr/bin/env python
"""End-to-end LLM training-data pipeline over realistic (Zipf) text.

Chains the curation layer the way a pretraining pipeline actually runs
it, on the 50k-doc Zipf corpus (heavy-tailed vocabulary, planted
exact/near duplicates):

  normalize -> exact dedup -> MinHash near-dup resolve -> decontaminate
  (vs a held-out eval slice) -> NB quality score -> token-budget select
  -> chunk -> pack

Each stage reports rows in/out and wall seconds; the end emits one JSON
line (appended to the current round's BENCH_sf100_r{N}.json as phase
"llm_pipeline") so the
composition — not just each operator alone — has a measured artifact.

Usage: python scripts/llm_pipeline_demo.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("DEMO_SF_DIR", os.path.join(REPO, ".benchdata", "sf1_zipf"))
DEDUP_METHOD = os.environ.get("DEMO_DEDUP_METHOD", "exact")
if DEDUP_METHOD not in ("exact", "minhash"):
    # a typo must not silently run the exact path at a scale where the
    # docs say it DNFs, then mislabel the benchmark record
    raise SystemExit(f"DEMO_DEDUP_METHOD must be exact|minhash, got {DEDUP_METHOD!r}")
def _default_out():
    """Append to the CURRENT round's sf100 artifact (highest existing
    BENCH_sf100_r{N}.json), so re-running the demo in a later round does
    not retro-edit a judged artifact."""
    import glob
    import re

    best, best_n = os.path.join(REPO, "BENCH_sf100_r11.json"), 11
    for p in glob.glob(os.path.join(REPO, "BENCH_sf100_r*.json")):
        m = re.search(r"BENCH_sf100_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best


OUT = os.environ.get("DEMO_OUT", _default_out())


def main():
    from pyspark.sql import SparkSession, functions as F

    from tape_spark.operators import (
        chunk_documents,
        decontaminate,
        dedup_keep_first,
        dedup_clusters,
        nb_score,
        normalize_text,
        pack_sequences,
        resolve_duplicates,
        select_by_budget,
        train_nb_classifier,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    stages = []

    def stage(name, fn):
        t0 = time.time()
        out, n = fn()
        stages.append({"stage": name, "rows": int(n), "secs": round(time.time() - t0, 1)})
        print(stages[-1], flush=True)
        return out

    docs0 = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", "text", "lang")
    )
    n0 = docs0.count()
    print({"stage": "input", "rows": n0}, flush=True)

    # 1. normalize (codegen path: control strip + casefold + ws collapse)
    def _norm():
        d = normalize_text(docs0, form=None).persist()
        return d, d.count()

    docs = stage("normalize", _norm)

    # 2. exact dedup (keep lowest id per identical text)
    def _exact():
        d = dedup_keep_first(docs, text_col="text", id_col="doc_id").persist()
        return d, d.count()

    docs = stage("exact_dedup", _exact)

    # 3. near-dup resolve: similarity clusters -> keep the longest copy.
    # DEMO_DEDUP_METHOD picks the pair generator: 'exact' (inverted-index
    # n-gram Jaccard with the hot-shingle cap — quadratic in shingle df,
    # the Zipf head would explode it 47x without the cap, SCALING.md) or
    # 'minhash' (banded LSH — the 100 TB path; pair cost is bands x
    # bucket collisions, never df^2).
    def _near():
        if DEDUP_METHOD == "minhash":
            # join_mode defaults to 'auto': exact dedup already ran,
            # buckets are capped, and the threshold is high, so the
            # measured candidate count stays O(n_docs) and auto picks the
            # slim shape — the 16-byte band join + per-side signature
            # attach (~8 GB local disk at 5M docs) instead of the fused
            # signature-carrying exchange (~75 GB with join-side sort
            # spill — measured DNF on this host, twice).
            # signature_bits=32 halves every signature payload with
            # est_jaccard granularity unchanged.
            clusters = dedup_clusters(
                docs, n=2, threshold=0.5, method="minhash",
                num_hashes=64, bands=16, signature_bits=32,
                max_bucket_size=2000,
            )
        else:
            clusters = dedup_clusters(
                docs, n=2, threshold=0.5,
                max_doc_frequency=100, stop_shingle_sample=0.02,
            )
        # resolve_duplicates returns the full surviving rows — no
        # re-derive join needed, just drop the helper quality column
        d = resolve_duplicates(
            docs.withColumn("n_chars", F.length("text")),
            clusters,
            quality_col="n_chars",
        ).drop("n_chars").persist()
        return d, d.count()

    docs = stage("near_dedup", _near)

    # 4. decontaminate against a held-out eval slice (every 31st doc)
    def _decon():
        bench = docs.filter(F.col("doc_id") % 31 == 0)
        train = docs.filter(F.col("doc_id") % 31 != 0)
        # 5-grams, not 3: on a 10k-word vocabulary 3-grams of head words
        # collide corpus-wide (an 86% false-contamination rate measured on
        # this corpus); real pipelines use 8-13 grams (GPT-3 used 13)
        hits = decontaminate(train, bench, n=5, method="bloom")
        d = (
            train.join(
                hits.filter(F.col("n_contaminated") > 0).select("doc_id"),
                "doc_id",
                "left_anti",
            )
        ).persist()
        return d, d.count()

    docs = stage("decontaminate", _decon)

    # 5. NB quality score (weak labels: long docs as positive exemplars)
    def _score():
        model = train_nb_classifier(docs, label_expr="length(text) > 400")
        d = docs.join(nb_score(docs, model), "doc_id").persist()
        return d, d.count()

    scored = stage("nb_quality", _score)

    # 6. token-budget select: keep the best docs within 60% of the tokens
    def _budget():
        base = scored.withColumn(
            "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
        )
        total = base.agg(F.sum("n_tokens").alias("t")).collect()[0]["t"]
        d = select_by_budget(
            base, int(total) * 3 // 5, "nb_logodds", "n_tokens"
        ).persist()
        return d, d.count()

    selected = stage("budget_select", _budget)

    # 7. chunk to 128-token windows, 8-token overlap
    def _chunk():
        d = chunk_documents(
            selected.select("doc_id", "text"), chunk_tokens=128, overlap_tokens=8
        ).persist()
        return d, d.count()

    chunks = stage("chunk", _chunk)

    # 8. pack chunk token streams into 512-token training sequences
    def _pack():
        d = pack_sequences(chunks, budget=512).persist()
        return d, d.count()

    packed = stage("pack", _pack)

    total_secs = round(sum(s["secs"] for s in stages), 1)
    rec = {
        "phase": "llm_pipeline",
        "sf_dir": SF_DIR,
        "dedup_method": DEDUP_METHOD,
        "input_rows": int(n0),
        "stages": stages,
        "total_secs": total_secs,
    }
    existing = []
    if os.path.exists(OUT):
        with open(OUT) as fh:
            existing = [json.loads(l) for l in fh if l.strip()]
    existing = [
        r for r in existing
        if not (
            r.get("phase") == "llm_pipeline"
            and r.get("sf_dir", SF_DIR) == SF_DIR
            and r.get("dedup_method", "exact") == DEDUP_METHOD
        )
    ]
    existing.append(rec)
    with open(OUT, "w") as fh:
        for r in existing:
            fh.write(json.dumps(r) + "\n")
    print(json.dumps(rec))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Scale probes for the round-8 operators — interval_overlap_join,
semantic_dedup, perplexity_score, BPE tokenize — on the replicated scale
tables (.benchdata/sf{1,10,100}). One phase per process:

  python scripts/probe_r8_ops.py <sf_dir> overlap|semdedup|ppl|bpe

Appends JSON lines to $PROBE_OUT (default /tmp/probe_r8_ops.jsonl).
Times are for the full action (count/collect) on a warm session; each
phase runs the action twice and reports both (cold, warm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("PROBE_OUT", "/tmp/probe_r8_ops.jsonl")


def session():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def emit(rec):
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def main():
    sf_dir, phase = sys.argv[1], sys.argv[2]
    spark = session()
    from pyspark.sql import functions as F

    if phase == "overlap":
        # sessions (from sessionize) overlap-joined against 15-min outage
        # windows every 4h — the events_session_window shape at scale
        from tape_spark.operators import interval_overlap_join
        from tape_spark.streaming import sessionize

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __spark_entry__ as em

        ev = em._events(spark, sf_dir)
        n_events = ev.count()

        def run():
            base = ev.groupBy("user_id").agg(
                F.min("t").alias("s"), F.max("t").alias("e")
            )
            bounds = base.agg(
                F.floor(F.min("s") / 14400.0).cast("long").alias("k0"),
                F.floor(F.max("e") / 14400.0).cast("long").alias("k1"),
            )
            outages = bounds.select(
                F.explode(F.sequence("k0", "k1")).alias("k")
            ).select(
                (F.col("k") * 14400.0).alias("os"),
                (F.col("k") * 14400.0 + 900.0).alias("oe"),
            )
            return interval_overlap_join(
                base, outages, "s", "e", "os", "oe", by=None,
                bucket_width=14400.0,
            ).count()

        ts, n = [], 0
        for _ in range(2):
            t0 = time.time()
            n = run()
            ts.append(round(time.time() - t0, 2))
        emit({"phase": "overlap", "sf_dir": sf_dir, "n_events": n_events,
              "n_overlap_rows": n, "secs": ts})

    elif phase == "semdedup":
        from tape_spark.operators import semantic_dedup

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        ts, nsurv = [], 0
        for _ in range(2):
            t0 = time.time()
            nsurv = (
                semantic_dedup(
                    emb, threshold=0.95, num_clusters=256, train_sample=8192,
                    max_cluster_size=50_000,
                )
                .filter(F.col("is_survivor"))
                .count()
            )
            ts.append(round(time.time() - t0, 2))
        emit({"phase": "semdedup", "sf_dir": sf_dir, "n_vectors": n,
              "n_survivors": nsurv, "secs": ts})

    elif phase == "ppl":
        from tape_spark.operators import perplexity_score, train_bigram_lm

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        t0 = time.time()
        lm = train_bigram_lm(docs, sample_fraction=0.01, max_docs=400, min_count=3)
        train_sec = round(time.time() - t0, 2)
        ts = []
        for _ in range(2):
            t0 = time.time()
            perplexity_score(docs, lm).agg(F.avg("ppl")).collect()
            ts.append(round(time.time() - t0, 2))
        emit({"phase": "ppl", "sf_dir": sf_dir, "n_docs": n,
              "train_sec": train_sec, "vocab": lm.vocab_size, "secs": ts})

    elif phase == "bpe":
        from tape_spark.operators.text import tokenize_chunks
        from tape_spark.utils.bpe import train_bpe_from_corpus

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        t0 = time.time()
        bpe = train_bpe_from_corpus(docs, num_merges=200, sample_fraction=0.01,
                                    max_docs=300)
        train_sec = round(time.time() - t0, 2)
        ts, ntok = [], 0
        for _ in range(2):
            t0 = time.time()
            ntok = (
                tokenize_chunks(docs, tokenizer=bpe, text_col="text", id_col="doc_id")
                .agg(F.sum("n_input_ids"))
                .collect()[0][0]
            )
            ts.append(round(time.time() - t0, 2))
        emit({"phase": "bpe", "sf_dir": sf_dir, "n_docs": n,
              "train_sec": train_sec, "n_subword_tokens": ntok, "secs": ts})

    else:
        raise SystemExit(f"unknown phase {phase!r}")
    spark.stop()


if __name__ == "__main__":
    main()

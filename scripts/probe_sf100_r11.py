#!/usr/bin/env python
"""Round-11 sf100 probes (each phase its own process, per the sf100
shuffle-reclaim convention). Phases:

  python scripts/probe_sf100_r11.py overlap_left3   # third complement path: persist + left_id (r10 verdict ask #5)
  python scripts/probe_sf100_r11.py budget_sweep    # select_by_budget num_buckets sweep + edge-bucket share (ask #8)
  python scripts/probe_sf100_r11.py budget_coarse   # the coarse-score repro the r10 verdict demanded (ask #1 done=)
  python scripts/probe_sf100_r11.py streaming       # real micro-batch run over 100M events, state-store metrics (ask #7)
  python scripts/probe_sf100_r11.py bm25_zipf       # bm25 on the Zipf corpus: the df<<N selective regime (ask #4)
  python scripts/probe_sf100_r11.py dedup_zipf      # MinHash-LSH over 5M realistic docs, planted-pair recall bands
  python scripts/probe_sf100_r11.py jaccard_cap     # hot-shingle cap on the Zipf head (47x candidate reduction)
  python scripts/probe_sf100_r11.py celebrity_skew  # one user holding 10% of events through the per-user windows
  python scripts/probe_sf100_r11.py bm25_indexed    # inverted index vs scan: build once, query ~ sum(df)
  python scripts/probe_sf100_r11.py ivfpq_indexed   # persisted IVFPQ index vs per-call encode
  python scripts/probe_sf100_r11.py stream_neardup  # streaming near-dup vs the 5M-doc signature store

Emits one JSON line per phase and appends to BENCH_sf100_r11.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("PROBE_SF_DIR", os.path.join(REPO, ".benchdata", "sf100"))
ZIPF_DIR = os.environ.get("PROBE_ZIPF_DIR", os.path.join(REPO, ".benchdata", "sf100_zipf"))
OUT = os.path.join(REPO, "BENCH_sf100_r11.json")
REPS = int(os.environ.get("PROBE_REPS", "2"))


def session(extra=None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "96g"))
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIR", "/tmp/spark-probe"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def emit(phase, payload):
    rec = {"phase": phase, "sf_dir": SF_DIR, **payload}
    line = json.dumps(rec)
    print(line, flush=True)
    existing = []
    if os.path.exists(OUT):
        with open(OUT) as fh:
            existing = [json.loads(l) for l in fh if l.strip()]
    existing = [r for r in existing if r.get("phase") != phase]
    existing.append(rec)
    with open(OUT, "w") as fh:
        for r in existing:
            fh.write(json.dumps(r) + "\n")


def _sessions_frame(spark):
    """95M per-user sessions derived from 100M events — the expensive-
    lineage left side shared by all overlap_left variants (two windows +
    a groupBy before the join ever starts)."""
    from pyspark.sql import Window, functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp_ltz").cast("double").alias("t")
    )
    gap = F.col("t") - F.lag("t").over(Window.partitionBy("user_id").orderBy("t"))
    return (
        ev.withColumn("__new", (gap.isNull() | (gap > 1800)).cast("int"))
        .withColumn(
            "__sid",
            F.sum("__new").over(
                Window.partitionBy("user_id")
                .orderBy("t")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "__sid")
        .agg(F.min("t").alias("ss"), F.max("t").alias("se"))
        .withColumn("rid", F.xxhash64("user_id", "__sid"))
    )


def main():
    phase = sys.argv[1]
    spark = session()

    if phase == "overlap_left3":
        # r10 measured lazy left_id (106.3s: lineage evaluated in BOTH the
        # join and the anti-join complement branch) vs synthetic-id eager
        # localCheckpoint (47.2s: computed once, pinned to executor disk).
        # The docstring names a third path — the CALLER persists the left
        # frame and passes left_id — predicted to beat both when the left
        # fits memory. Measure it with the persist build time broken out.
        from pyspark.sql import functions as F

        from tape_spark.operators import interval_overlap_join

        out = {}
        for name in ("caller_id_lazy", "synthetic_checkpoint", "persist_caller_id"):
            sess = _sessions_frame(spark)
            t0 = time.time()
            build_s = 0.0
            kw = {}
            if name == "persist_caller_id":
                sess = sess.persist()
                sess.count()  # materialize once, both branches read cache
                build_s = round(time.time() - t0, 1)
                kw = {"left_id": "rid"}
            elif name == "caller_id_lazy":
                kw = {"left_id": "rid"}
            bounds = sess.agg(
                F.floor(F.min("ss") / 14400.0).cast("long").alias("k0"),
                F.floor(F.max("se") / 14400.0).cast("long").alias("k1"),
            )
            outages = bounds.select(
                F.explode(F.sequence("k0", "k1")).alias("k")
            ).select(
                (F.col("k") * 14400.0).alias("os"),
                (F.col("k") * 14400.0 + 900.0).alias("oe"),
            )
            r = (
                interval_overlap_join(
                    sess, outages, "ss", "se", "os", "oe",
                    by=None, bucket_width=14400.0, how="left", **kw,
                )
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum(F.col("os").isNull().cast("long")).alias("unmatched"),
                )
                .collect()[0]
            )
            total = round(time.time() - t0, 1)
            out[name] = {
                "secs_total": total,
                "secs_persist_build": build_s,
                "rows": r["rows"],
                "unmatched": r["unmatched"],
            }
            if name == "persist_caller_id":
                sess.unpersist()
        out["paths_agree"] = (
            len({(v["rows"], v["unmatched"]) for v in out.values() if isinstance(v, dict)}) == 1
        )
        emit(phase, out)

    elif phase in ("budget_sweep", "budget_coarse"):
        # ask #8 (sweep) and the ask-#1 done-condition repro (coarse):
        # 5M docs, integer 0-5 quality score (~N/6 in the boundary bucket),
        # 40% token budget. Before the r11 prefix-sum fix this was ONE
        # Window.orderBy task over ~830k rows; now the boundary walk is
        # range-partitioned. The sweep records the edge(=boundary)-bucket
        # row share per num_buckets — the residual tuning knob.
        from pyspark.sql import functions as F

        from tape_spark.operators import select_by_budget

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .repartition(64)
            .withColumn("toks", F.size(F.split(F.trim("text"), r"\s+")))
            .withColumn("quality", F.pmod(F.xxhash64("doc_id"), F.lit(6)).cast("int"))
            .select("doc_id", "quality", "toks")
            .persist()
        )
        total = docs.agg(F.sum("toks").alias("t")).collect()[0]["t"]
        budget = int(total * 0.4)
        grid = []
        for nb in (64, 256, 1024) if phase == "budget_sweep" else (256,):
            reps = []
            kept = n_boundary = None
            for _ in range(REPS):
                t0 = time.time()
                sel = select_by_budget(
                    docs, budget, "quality", "toks", id_col="doc_id", num_buckets=nb
                )
                kept = sel.count()
                reps.append(round(time.time() - t0, 1))
            # boundary bucket share: with 6 distinct scores every cut grid
            # collapses to the same 6 effective buckets; measure the share
            # of rows carrying the cutoff score (the exact-walk population).
            # Read the cutoff off the LAST timed selection — re-running
            # select_by_budget just for the min would double the workload
            # outside the timing loop for an identical deterministic value
            cutoff = sel.agg(F.min("quality").alias("q")).collect()[0]["q"]
            n_boundary = docs.filter(F.col("quality") == cutoff).count()
            grid.append({
                "num_buckets": nb,
                "secs": reps,
                "kept_rows": kept,
                "boundary_rows": n_boundary,
                "boundary_share": round(n_boundary / docs.count(), 4),
            })
        emit(phase, {
            "docs": docs.count(), "distinct_scores": 6,
            "budget_tokens": budget, "grid": grid,
        })
        docs.unpersist()

    elif phase == "streaming":
        # ask #7: a REAL trigger-by-trigger Structured Streaming run over
        # the 100M-event table (file source, bounded files/trigger), a
        # 1-day tumbling window x event_type with a 1-hour watermark in
        # append mode, state-store metrics from every progress event, and
        # a batch-parity assertion on the emitted (closed) windows.
        from pyspark.sql import functions as F

        from tape_spark.streaming.windows import read_event_stream, tumbling_window_agg

        ev_path = f"{SF_DIR}/events.parquet"
        schema = spark.read.parquet(ev_path).schema
        # parquet timestamps load as TIMESTAMP_NTZ; watermarks require
        # TIMESTAMP (ltz) — cast on both the stream and the batch side
        stream = read_event_stream(
            spark, ev_path, schema, max_files_per_trigger=2
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        agg = tumbling_window_agg(
            stream, ts_col="ts", window="1 day", keys=["event_type"],
            value_col="value", watermark="1 hour",
        )
        t0 = time.time()
        q = (
            agg.writeStream.format("memory")
            .queryName("ev_windows")
            .outputMode("append")
            .option("checkpointLocation", "/tmp/spark-probe/ckpt-ev")
            .trigger(availableNow=True)
            .start()
        )
        progress = []
        while q.isActive:
            time.sleep(2)
        q.awaitTermination()
        wall = round(time.time() - t0, 1)
        # recentProgress is capped (~100 updates): a run with more
        # micro-batches would silently under-report state growth — flag it
        progress_truncated = len(q.recentProgress) >= 100
        for p in q.recentProgress:
            so = (p["stateOperators"] or [{}])[0]
            progress.append({
                "batch": p["batchId"],
                "input_rows": p["numInputRows"],
                "state_rows": so.get("numRowsTotal"),
                "state_mem_bytes": so.get("memoryUsedBytes"),
                "rows_dropped_by_watermark": so.get("numRowsDroppedByWatermark"),
            })
        emitted = spark.table("ev_windows")
        batch = tumbling_window_agg(
            spark.read.parquet(ev_path).withColumn(
                "ts", F.col("ts").cast("timestamp")
            ),
            ts_col="ts", window="1 day", keys=["event_type"], value_col="value",
        )
        # every emitted (closed) window must match the batch row exactly
        j = emitted.alias("s").join(
            batch.alias("b"), ["window_start", "window_end", "event_type"], "left"
        )
        mism = j.filter(
            (F.col("s.n") != F.col("b.n"))
            | (F.abs(F.col("s.avg_value") - F.col("b.avg_value")) > 1e-9)
            | F.col("b.n").isNull()
        ).count()
        emit(phase, {
            "wall_secs": wall,
            "micro_batches": len(progress),
            "progress_truncated": progress_truncated,
            "emitted_windows": emitted.count(),
            "batch_windows": batch.count(),
            "emitted_mismatches": mism,
            "max_state_rows": max((p["state_rows"] or 0) for p in progress),
            "max_state_mem_mb": round(
                max((p["state_mem_bytes"] or 0) for p in progress) / 1e6, 1
            ),
            "total_dropped_by_watermark": sum(
                p["rows_dropped_by_watermark"] or 0 for p in progress
            ),
            "batches": progress,
        })

    elif phase == "bm25_zipf":
        # ask #4's probe: on the 31-word corpus every term has df~N (the
        # easiest pruning geometry — nothing is selective). The Zipf corpus
        # has a 10k-word heavy-tailed vocabulary: mid/tail query terms hit
        # df<<N, so the "documents sharing no query term never enter the
        # ranking shuffle" claim is finally exercised for real. Record df/N
        # per term band and bm25 wall time for head vs tail query mixes.
        from pyspark.sql import functions as F

        from tape_spark.operators import bm25_topk

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64).persist()
        n_docs = docs.count()
        out = {"docs": n_docs}
        for name, words in (
            ("head_terms", ["w00001", "w00002", "w00003", "w00005", "w00008"]),
            ("tail_terms", ["w04217", "w06533", "w07911", "w08864", "w09427"]),
        ):
            dfreq = (
                docs.select(
                    F.explode(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias("w")
                )
                .filter(F.col("w").isin(words))
                .groupBy("w")
                .count()
                .collect()
            )
            dfmap = {r["w"]: r["count"] for r in dfreq}
            reps = []
            nrows = None
            for _ in range(REPS):
                t0 = time.time()
                r = bm25_topk(docs, [("q0", " ".join(words))], k=10)
                nrows = r.count()
                reps.append(round(time.time() - t0, 1))
            out[name] = {
                "df": {w: dfmap.get(w, 0) for w in words},
                "df_over_n": {w: round(dfmap.get(w, 0) / n_docs, 5) for w in words},
                "secs": reps,
                "rows": nrows,
            }
        docs.unpersist()
        emit(phase, out)

    elif phase == "dedup_zipf":
        # MinHash-LSH over the 5M-doc Zipf corpus: realistic heavy-tailed
        # vocabulary (not the 31-word degenerate case) with KNOWN planted
        # structure — every doc_id%10==9 is an exact copy of id-1, every
        # doc_id%10==5 a ~8%-mutated near copy. Recall is measured against
        # the planted pairs' EXACT bigram Jaccard (a linear paired join —
        # no quadratic all-pairs replay), split by similarity band.
        from pyspark.sql import functions as F

        from tape_spark.operators import minhash_near_duplicates

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64).persist()
        n_docs = docs.count()
        # signature_bits=32 is the documented payload knob: the band-entry
        # exchange carries the signature on both join sides (~45 GB at 64-bit
        # over 5M docs — more than this host's free disk once join-side sort
        # spill doubles it); 32-bit halves it, est_jaccard granularity is
        # unchanged (still 1/num_hashes) and per-position collisions are 2^-32
        t0 = time.time()
        pairs = minhash_near_duplicates(
            docs, num_hashes=64, bands=16, threshold=0.3, signature_bits=32
        ).select("id_a", "id_b").persist()
        n_pairs = pairs.count()
        lsh_secs = round(time.time() - t0, 1)

        grams = docs.select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(split(trim(lower(text)), '\\\\s+')) - 1), "
                    "i -> array_join(slice(split(trim(lower(text)), '\\\\s+'), i, 2), ' '))"
                )
            ).alias("g"),
        )
        planted = (
            docs.select(F.col("doc_id").alias("id_b"))
            .filter(F.pmod("id_b", F.lit(10)).isin(5, 9))
            .withColumn("id_a", F.col("id_b") - 1)
            .withColumn(
                "kind",
                F.when(F.pmod("id_b", F.lit(10)) == 5, "near").otherwise("exact"),
            )
        )
        withj = (
            planted.join(grams.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga")), "id_a")
            .join(grams.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb")), "id_b")
            .withColumn(
                "j",
                F.size(F.array_intersect("ga", "gb"))
                / F.size(F.array_union("ga", "gb")),
            )
            .drop("ga", "gb")
        )
        # one exists-join: planted pair found iff the LSH output has it
        merged = withj.join(
            pairs.select("id_a", "id_b").withColumn("f2", F.lit(True)),
            ["id_a", "id_b"],
            "left",
        ).withColumn("found", F.coalesce("f2", F.lit(False)))
        bands_out = [
            {
                "band": r["band"],
                "pairs": r["n"],
                "found": r["nf"],
                "recall": round(r["nf"] / r["n"], 4) if r["n"] else None,
            }
            for r in merged.withColumn(
                "band",
                F.when(F.col("j") >= 0.999, "exact(J=1.0)")
                .when(F.col("j") >= 0.7, "J>=0.7")
                .when(F.col("j") >= 0.5, "0.5<=J<0.7")
                .otherwise("J<0.5"),
            )
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("found").cast("long")).alias("nf"))
            .collect()
        ]
        pairs.unpersist()
        docs.unpersist()
        emit(phase, {
            "docs": n_docs,
            "lsh_secs": lsh_secs,
            "lsh_pairs": n_pairs,
            "planted_bands": sorted(bands_out, key=lambda r: r["band"]),
        })

    elif phase == "jaccard_cap":
        # estimate_stop_shingles + max_doc_frequency on REALISTIC data:
        # on the Zipf corpus the head bigrams ("w00001 w00001" and kin)
        # have df in the tens of thousands at 50k docs, so the uncapped
        # shingle self-join's candidate volume sum(C(df,2)) explodes.
        # Measure that sum EXACTLY (one cheap aggregation — no need to
        # run the explosion), then run the capped pipeline and its
        # planted-pair recall (exact J >= 0.7 pairs, linear paired join).
        from pyspark.sql import functions as F

        from tape_spark.operators import ngram_jaccard_pairs

        sf1_zipf = os.environ.get(
            "PROBE_SF1_ZIPF_DIR", os.path.join(REPO, ".benchdata", "sf1_zipf")
        )
        docs = spark.read.parquet(f"{sf1_zipf}/documents.parquet").repartition(32).persist()
        n_docs = docs.count()
        sh = docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(split(trim(lower(text)), '\\\\s+')) - 1), "
                        "i -> array_join(slice(split(trim(lower(text)), '\\\\s+'), i, 2), ' '))"
                    )
                )
            ).alias("shingle"),
        )
        dfstats = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(
                F.count(F.lit(1)).alias("distinct_shingles"),
                F.max("df").alias("max_df"),
                F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("uncapped_pair_rows"),
                F.sum(
                    F.when(F.col("df") <= 100, F.col("df") * (F.col("df") - 1) / 2)
                    .otherwise(F.lit(0))
                ).alias("capped_pair_rows"),
            )
            .collect()[0]
        )
        t0 = time.time()
        pairs = ngram_jaccard_pairs(
            docs, n=2, threshold=0.5,
            max_doc_frequency=100, stop_shingle_sample=0.02,
        ).persist()
        n_pairs = pairs.count()
        capped_secs = round(time.time() - t0, 1)
        # planted recall: exact J from the arithmetic pair ids (linear)
        grams = docs.select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(split(trim(lower(text)), '\\\\s+')) - 1), "
                    "i -> array_join(slice(split(trim(lower(text)), '\\\\s+'), i, 2), ' '))"
                )
            ).alias("g"),
        )
        planted = (
            docs.select(F.col("doc_id").alias("id_b"))
            .filter(F.pmod("id_b", F.lit(10)).isin(5, 9))
            .withColumn("id_a", F.col("id_b") - 1)
        )
        withj = (
            planted.join(grams.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga")), "id_a")
            .join(grams.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb")), "id_b")
            .withColumn(
                "j",
                F.size(F.array_intersect("ga", "gb")) / F.size(F.array_union("ga", "gb")),
            )
            .select("id_a", "id_b", "j")
            .filter(F.col("j") >= 0.7)
        )
        n_planted = withj.count()
        n_found = withj.join(pairs, ["id_a", "id_b"], "left_semi").count()
        pairs.unpersist()
        docs.unpersist()
        emit(phase, {
            "docs": n_docs,
            "distinct_shingles": int(dfstats["distinct_shingles"]),
            "max_shingle_df": int(dfstats["max_df"]),
            "uncapped_pair_rows": int(dfstats["uncapped_pair_rows"]),
            "capped_pair_rows": int(dfstats["capped_pair_rows"]),
            "capped_secs": capped_secs,
            "pairs_found": n_pairs,
            "planted_j07_pairs": n_planted,
            "planted_j07_found": n_found,
            "planted_recall": round(n_found / n_planted, 4) if n_planted else None,
        })

    elif phase == "bm25_indexed":
        # index-once-query-many vs the per-call scan: build the inverted
        # index over the 5M-doc Zipf corpus once (term-bucket-partitioned
        # parquet), then run the same head/tail query mixes as bm25_zipf
        # through bm25_topk_indexed. The tail mix should collapse to the
        # matched-postings sliver (sum(df) ~ 30k rows) via tbucket
        # partition pruning + the pushed term filter.
        from pyspark.sql import functions as F

        from tape_spark.operators import (
            bm25_build_index,
            bm25_load_index,
            bm25_save_index,
            bm25_topk,
            bm25_topk_indexed,
        )

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64)
        idx_path = os.path.join(REPO, ".benchdata", "bm25_idx_zipf")
        t0 = time.time()
        postings, stats = bm25_build_index(docs, num_term_buckets=64)
        bm25_save_index(postings, stats, idx_path)
        build_secs = round(time.time() - t0, 1)
        p2, s2 = bm25_load_index(spark, idx_path)
        n_postings = p2.count()
        out = {"build_secs": build_secs, "postings_rows": n_postings}
        docs_p = docs.persist()
        docs_p.count()
        for name, words in (
            ("head_terms", ["w00001", "w00002", "w00003", "w00005", "w00008"]),
            ("tail_terms", ["w04217", "w06533", "w07911", "w08864", "w09427"]),
        ):
            q = [("q0", " ".join(words))]
            reps_idx, reps_scan = [], []
            idx_rows = scan_rows = None
            for _ in range(REPS):
                t0 = time.time()
                r = bm25_topk_indexed(p2, s2, q, k=10)
                idx_rows = sorted(tuple(x) for x in r.collect())
                reps_idx.append(round(time.time() - t0, 1))
            for _ in range(REPS):
                t0 = time.time()
                r = bm25_topk(docs_p, q, k=10)
                scan_rows = sorted(tuple(x) for x in r.collect())
                reps_scan.append(round(time.time() - t0, 1))
            out[name] = {
                "indexed_secs": reps_idx,
                "scan_secs": reps_scan,
                "results_identical": idx_rows == scan_rows,
            }
        docs_p.unpersist()
        emit(phase, out)

    elif phase == "celebrity_skew":
        # The one skew shape the r8/r9 probes didn't plant: a celebrity
        # KEY in the per-key window operators. Sessionization is
        # inherently sequential per user (a running sum over an ordered
        # window), so one bot/celebrity user holding 10% of 100M events
        # funnels 10M rows through ONE task's sort+scan. Measure the
        # degradation against the uniform baseline and record the
        # mitigation guidance (windowed aggs are immune — their keys are
        # (window, type) — and the fix for sessionize is upstream
        # bot-filtering or per-(user, coarse-time) pre-splitting).
        from pyspark.sql import functions as F

        from tape_spark.streaming.windows import sessionize, tumbling_window_agg

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("ts").cast("timestamp_ltz").cast("double").alias("t"),
            "value",
        )
        # remap ~10% of events (hash-chosen) onto ONE user id
        skewed = ev.withColumn(
            "user_id",
            F.when(F.pmod(F.xxhash64("t", "value"), F.lit(10)) == 0, F.lit(-1))
            .otherwise(F.col("user_id")),
        )
        out = {}
        for name, frame in (("uniform", ev), ("celebrity_10pct", skewed)):
            t0 = time.time()
            n_sess = sessionize(
                frame, user_col="user_id", ts_col="t", gap_seconds=1800.0
            ).count()
            sess_secs = round(time.time() - t0, 1)
            t0 = time.time()
            n_win = tumbling_window_agg(
                frame, ts_col="ts", window="1 day", keys=["user_id"],
                value_col="value",
            ).count()
            win_secs = round(time.time() - t0, 1)
            out[name] = {
                "sessionize_secs": sess_secs,
                "sessions": n_sess,
                "tumbling_secs": win_secs,
                "windows": n_win,
            }
        emit(phase, out)

    elif phase == "ivfpq_indexed":
        # the dense mirror of bm25_indexed: train once, encode once
        # (saved cluster-partitioned), then query via encoded= vs the
        # per-call encode path. 2M vectors, 32 corpus-member queries.
        import numpy as np
        from pyspark.sql import functions as F

        from tape_spark.operators import (
            ivfpq_cosine_topk,
            ivfpq_encode,
            ivfpq_load_index,
            ivfpq_save_index,
            train_pq_codebooks,
            train_spherical_kmeans,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
        n_vec = emb.count()
        q = emb.filter(F.pmod("vec_id", F.lit(62501)) == 7).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        nq = q.count()
        t0 = time.time()
        coarse = train_spherical_kmeans(emb, num_clusters=64, train_sample=8192)
        books = train_pq_codebooks(emb, m=8, num_centroids=256)
        train_secs = round(time.time() - t0, 1)
        idx_path = os.path.join(REPO, ".benchdata", "ivfpq_idx")
        t0 = time.time()
        ivfpq_save_index(ivfpq_encode(emb, coarse, books), coarse, books, idx_path)
        encode_save_secs = round(time.time() - t0, 1)
        enc2, coarse2, books2 = ivfpq_load_index(spark, idx_path)
        out = {
            "vectors": n_vec, "queries": nq,
            "train_secs": train_secs, "encode_save_secs": encode_save_secs,
        }
        for name, kw in (
            ("per_call_encode", {"coarse_centroids": coarse, "codebooks": books}),
            ("saved_index", {"coarse_centroids": coarse2, "codebooks": books2, "encoded": enc2}),
        ):
            reps = []
            res = None
            for _ in range(REPS):
                t0 = time.time()
                r = ivfpq_cosine_topk(emb, q, k=10, nprobe=8, **kw)
                res = sorted(tuple(x) for x in r.collect())
                reps.append(round(time.time() - t0, 1))
            out[name] = {"secs": reps, "rows": len(res)}
            out.setdefault("results", []).append(res)
        a, b = out.pop("results")
        out["results_identical"] = a == b
        emb.unpersist()
        emit(phase, out)

    elif phase == "decon_eval_sweep":
        # decontaminate's cost axis nobody measured: the EVAL-SET size.
        # The 5M-doc pipeline's heaviest stage was decontaminate at 239 s
        # against a ~130k-doc eval slice, vs r10's 49 s against a small
        # bench set — sweep the eval size at fixed train size to separate
        # the bloom-build term (scales with eval grams) from the
        # probe+confirm term (scales with train grams x hit rate).
        from pyspark.sql import functions as F

        from tape_spark.operators import decontaminate

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64).persist()
        n_docs = docs.count()
        rows = []
        for modulus in (500, 100, 38):  # ~10k / 50k / ~130k eval docs
            bench = docs.filter(F.col("doc_id") % modulus == 0).persist()
            n_bench = bench.count()
            train = docs.filter(F.col("doc_id") % modulus != 0)
            t0 = time.time()
            hits = decontaminate(train, bench, n=5, method="bloom")
            n_hit = hits.filter(F.col("n_contaminated") > 0).count()
            rows.append({
                "eval_docs": n_bench,
                "train_docs": n_docs - n_bench,
                "contaminated_docs": n_hit,
                "secs": round(time.time() - t0, 1),
            })
            print(rows[-1], flush=True)
            bench.unpersist()
        emit(phase, {"docs": n_docs, "sweep": rows})

    elif phase == "cdc_chunking":
        # chunk_documents_cdc at 5M realistic docs vs fixed windows: both
        # are shuffle-free narrow maps, but CDC pays one md5 PER TOKEN
        # inside an interpreted lambda — measure that tax, plus the
        # property the tax buys: re-chunk the corpus with 3 tokens
        # prepended to EVERY doc and count how many chunk ids (sha of
        # doc-relative text) survive under each scheme.
        from pyspark.sql import functions as F

        from tape_spark.operators import chunk_documents, chunk_documents_cdc

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64).persist()
        n_docs = docs.count()
        out = {"docs": n_docs}
        # persist both baselines: the shift semi-joins below must not
        # recompute them, or the shift timings double-pay the cut cost
        # (and CDC's md5-per-token pass is the expensive one)
        t0 = time.time()
        fixed = chunk_documents(docs, chunk_tokens=64).select("doc_id", "chunk").persist()
        out["fixed_chunks"] = fixed.count()
        out["fixed_secs"] = round(time.time() - t0, 1)
        t0 = time.time()
        cdc = chunk_documents_cdc(docs, target_tokens=64).select("doc_id", "chunk").persist()
        out["cdc_chunks"] = cdc.count()
        out["cdc_secs"] = round(time.time() - t0, 1)
        shifted = docs.withColumn("text", F.concat(F.lit("pre0 pre1 pre2 "), F.col("text")))
        t0 = time.time()
        f2 = chunk_documents(shifted, chunk_tokens=64).select("doc_id", "chunk")
        out["fixed_stable_chunks"] = fixed.join(f2, ["doc_id", "chunk"], "left_semi").count()
        out["fixed_shift_secs"] = round(time.time() - t0, 1)
        t0 = time.time()
        c2 = chunk_documents_cdc(shifted, target_tokens=64).select("doc_id", "chunk")
        out["cdc_stable_chunks"] = cdc.join(c2, ["doc_id", "chunk"], "left_semi").count()
        out["cdc_shift_secs"] = round(time.time() - t0, 1)
        out["fixed_stable_share"] = round(out["fixed_stable_chunks"] / max(out["fixed_chunks"], 1), 4)
        out["cdc_stable_share"] = round(out["cdc_stable_chunks"] / max(out["cdc_chunks"], 1), 4)
        emit(phase, out)

    elif phase == "stream_neardup":
        # stream_minhash_matches at warehouse scale: 100k arriving docs
        # (half of them near-copies of corpus docs) streamed in micro-
        # batches against the 5M-doc Zipf signature store. The contract
        # under test: per-trigger cost is ONE narrow probe scan of the
        # persisted signatures (the arriving batch's entries broadcast),
        # zero static-side exchange — plus found-match sanity.
        from pyspark.sql import functions as F

        from tape_spark.operators import minhash_signatures
        from tape_spark.streaming import stream_minhash_matches

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64)
        t0 = time.time()
        sigs = minhash_signatures(docs, signature_bits=32).persist()
        n_sigs = sigs.count()
        sig_secs = round(time.time() - t0, 1)
        # arriving: 50k exact/near copies (corpus docs with a tail) +
        # 50k fresh-vocabulary docs; ids shifted above the corpus range
        arr = (
            docs.filter(F.col("doc_id") % 50 == 3)
            .select(
                (F.col("doc_id") + 100_000_000).alias("doc_id"),
                F.concat("text", F.lit(" arrivals tail")).alias("text"),
            )
            .unionByName(
                docs.filter(F.col("doc_id") % 50 == 17).select(
                    (F.col("doc_id") + 200_000_000).alias("doc_id"),
                    F.concat_ws(
                        " ",
                        F.array(*[
                            F.concat(F.lit(f"fresh{j}x"), F.col("doc_id"))
                            for j in range(40)
                        ]),
                    ).alias("text"),
                )
            )
        )
        arr_dir = "/tmp/spark-probe/neardup_arrivals"
        arr.repartition(8).write.mode("overwrite").parquet(arr_dir)
        n_arr = spark.read.parquet(arr_dir).count()
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 2)
            .parquet(arr_dir)
        )
        out = stream_minhash_matches(stream, sigs, threshold=0.3)
        t0 = time.time()
        q = (
            out.writeStream.format("memory")
            .queryName("neardup_sf100")
            .outputMode("append")
            .option("checkpointLocation", "/tmp/spark-probe/ckpt-neardup")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 1)
        batches = [
            {"batch": p["batchId"], "input_rows": p["numInputRows"],
             "secs": round((p["batchDuration"] or 0) / 1000.0, 1)}
            for p in q.recentProgress if p["numInputRows"]
        ]
        matches = spark.table("neardup_sf100")
        n_match = matches.count()
        matched_arrivals = matches.select("doc_id").distinct().count()
        # every near-copy arrival should match its source; fresh ones not
        copies_found = matches.filter(
            (F.col("doc_id") - 100_000_000) == F.col("corpus_id")
        ).count()
        fresh_matched = matches.filter(F.col("doc_id") >= 200_000_000).count()
        emit(phase, {
            "corpus_sigs": n_sigs, "sig_build_secs": sig_secs,
            "arrivals": n_arr, "stream_wall_secs": wall,
            "micro_batches": len(batches), "batches": batches,
            "match_pairs": n_match, "matched_arrivals": matched_arrivals,
            "self_pairs_found": copies_found,
            "fresh_false_matches": fresh_matched,
        })

    else:
        print(f"unknown phase {phase}")
        return 2
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Round-12 sf100 probes (each phase its own process, per the sf100
shuffle-reclaim convention). Phases close the round-11 verdict's
"Done =" measurement criteria:

  python scripts/probe_sf100_r12.py store_growth    # ask #1 done=: per-trigger wall vs store size (1M vs 5M docs, fixed arrivals)
  python scripts/probe_sf100_r12.py automode_ab     # ask #4: auto vs forced-slim vs forced-fused, interleaved same-host
  python scripts/probe_sf100_r12.py late_data       # ask #5: 5% out-of-order replay, predicted vs measured drops + state
  python scripts/probe_sf100_r12.py cdc_ab          # ask #6 done=: CDC md5 vs md5_arrow at 5M docs, identical chunk ids
  python scripts/probe_sf100_r12.py compaction      # ask #7 done=: query wall after 16 appends, before/after compact
  python scripts/probe_sf100_r12.py celebrity_guard # ask #8 done=: max_rows_per_key raise on the 10%-hot-user frame
  python scripts/probe_sf100_r12.py ingest_loop     # full match+append streaming-ingest loop with mid-run compaction

Emits one JSON line per phase and appends to BENCH_sf100_r12.json.
Inputs: .benchdata/sf100 (events) and .benchdata/sf100_zipf (documents)
from scripts/make_scale_data.py + scripts/make_zipf_data.py.
"""

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("PROBE_SF_DIR", os.path.join(REPO, ".benchdata", "sf100"))
ZIPF_DIR = os.environ.get("PROBE_ZIPF_DIR", os.path.join(REPO, ".benchdata", "sf100_zipf"))
SCRATCH = os.environ.get("PROBE_SCRATCH", os.path.join(REPO, ".benchdata", "r12_scratch"))
OUT = os.environ.get("PROBE_OUT", os.path.join(REPO, "BENCH_sf100_r12.json"))
REPS = int(os.environ.get("PROBE_REPS", "2"))


def session(extra=None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
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


def main():
    phase = sys.argv[1]
    spark = session()
    os.makedirs(SCRATCH, exist_ok=True)

    if phase == "store_growth":
        # Verdict ask #1 done-criterion: with the partition-pruned store,
        # per-trigger cost must track ARRIVALS, not corpus — measure the
        # same fixed arrival batches against a 1M-doc and a 5M-doc store.
        # Two regimes:
        #   - 50k-doc triggers: the arrivals' band entries hit every
        #     pbucket, so the floor is one narrow 16B/row entries scan —
        #     grows mildly with the corpus but is a small share of the
        #     trigger (signature compute + verify dominate).
        #   - 8-doc triggers (point lookups): the IN-set covers a strict
        #     subset of partitions and the read is pruned hard.
        # Baseline: the r11 frame-probe path (stream_minhash_matches) at
        # the same 5M store paid 32-142 s per 50k trigger.
        from pyspark.sql import functions as F

        from tape_spark.operators import minhash_signatures
        from tape_spark.streaming import (
            minhash_match_batch,
            minhash_save_store,
            stream_minhash_matches,
        )

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64).persist()
        n_docs = docs.count()
        stores = {}
        t0 = time.time()
        sigs = minhash_signatures(docs, signature_bits=32).persist()
        sigs.count()
        sig_secs = round(time.time() - t0, 1)
        for label, cond in (("1m", F.col("doc_id") < 1_000_000), ("5m", F.lit(True))):
            path = f"{SCRATCH}/store_{label}"
            if os.path.exists(path):
                shutil.rmtree(path)
            t0 = time.time()
            minhash_save_store(sigs.filter(cond), path, num_entry_buckets=64,
                               num_sig_buckets=32)
            stores[label] = {"path": path, "save_secs": round(time.time() - t0, 1)}

        def arrivals(mod_val, width, n_target):
            # copies of corpus docs (ids drawn across the FULL 5M range)
            # with a tail appended: planted near-matches; id shifted out
            # of the corpus range
            return (
                docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(width)) == mod_val)
                .limit(n_target)
                .select(
                    (F.col("doc_id") + 100_000_000).alias("doc_id"),
                    F.concat("text", F.lit(" arrivals tail marker")).alias("text"),
                )
            )

        results = {"50k": [], "8": []}
        for rep, mod_val in enumerate((3, 17, 29)):
            for size_label, width, n_target in (("50k", 100, 50_000), ("8", 600_000, 8)):
                arr = arrivals(mod_val, width, n_target).persist()
                n_arr = arr.count()
                # isolate the store-dependent cost: arrival signatures are
                # computed ONCE here (timed separately) and passed in
                from tape_spark.streaming.neardup import (
                    _arrival_signatures,
                    _entry_rows,
                    _load_store_meta,
                )

                meta = _load_store_meta(spark, stores["5m"]["path"])
                t0 = time.time()
                asigs = _arrival_signatures(arr, meta, "text", "doc_id").persist()
                asigs.count()
                arr_sig_secs = round(time.time() - t0, 2)
                pbuckets = (
                    _entry_rows(asigs.select(F.col("doc_id").alias("corpus_id"), "signature"),
                                "corpus_id", meta["bands"],
                                meta["num_hashes"] // meta["bands"],
                                meta["num_entry_buckets"])
                    .select("pbucket").distinct().count()
                )
                row = {"rep": rep, "n_arrivals": n_arr,
                       "arr_sig_secs": arr_sig_secs,
                       "pbuckets_hit": pbuckets,
                       "pbuckets_total": meta["num_entry_buckets"]}
                for label in ("1m", "5m"):
                    caches = []
                    t0 = time.time()
                    m = minhash_match_batch(
                        arr, stores[label]["path"], threshold=0.5,
                        _arrival_sigs=asigs, _cleanup=caches,
                    )
                    n_matches = m.count()
                    row[f"store_{label}_secs"] = round(time.time() - t0, 2)
                    row[f"store_{label}_matches"] = n_matches
                    for c in caches:
                        c.unpersist()
                results[size_label].append(row)
                asigs.unpersist()
                arr.unpersist()
        # the r11 frame-probe baseline: one 50k trigger via
        # stream_minhash_matches against the full 5M signature FRAME
        arr = arrivals(3, 100, 50_000).persist()
        arr.count()
        t0 = time.time()
        base_matches = stream_minhash_matches(
            arr, sigs, threshold=0.5, broadcast_arrivals=True
        ).count()
        frame_probe_secs = round(time.time() - t0, 1)
        emit(phase, {
            "n_docs": n_docs,
            "corpus_sig_secs": sig_secs,
            "stores": {k: v for k, v in stores.items()},
            "triggers": results,
            "frame_probe_5m_50k_secs": frame_probe_secs,
            "frame_probe_5m_50k_matches": base_matches,
        })

    elif phase == "automode_ab":
        # Verdict ask #4: auto's byte-model pick vs the measured-best
        # shape, interleaved same-host, at points that straddle the
        # crossover. 1M zipf docs (fused is disk-safe at this size); a
        # fourth point plants 2k identical boilerplate docs so the
        # candidate term dominates and auto must flip to fused.
        from pyspark.sql import functions as F

        from tape_spark.operators import dedup as dedup_mod
        from tape_spark.operators import minhash_near_duplicates, minhash_signatures

        docs = (
            spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 1_000_000)
            .repartition(64)
            .persist()
        )
        n_docs = docs.count()
        boiler = spark.range(2000).select(
            (F.col("id") + 50_000_000).alias("doc_id"),
            F.lit("the same boilerplate header repeated across the mirror set "
                  "of this corpus snapshot for every page").alias("text"),
        )
        corpora = {
            "zipf1m": docs,
            "zipf1m_boiler2k": docs.select("doc_id", "text").unionByName(boiler).persist(),
        }
        sig_frames = {}
        for name, frame in corpora.items():
            s = minhash_signatures(frame, signature_bits=32).persist()
            s.count()
            sig_frames[name] = s
        points = [
            {"corpus": "zipf1m", "cap": None, "thr": 0.5},
            {"corpus": "zipf1m", "cap": 64, "thr": 0.7},
            {"corpus": "zipf1m", "cap": 8, "thr": 0.9},
            {"corpus": "zipf1m_boiler2k", "cap": None, "thr": 0.5},
        ]
        table = []
        for pt in points:
            rec = {**pt, "walls": {m: [] for m in ("fused", "slim", "auto")}}
            for rep in range(REPS):
                for mode in ("fused", "slim", "auto"):
                    t0 = time.time()
                    n = minhash_near_duplicates(
                        corpora[pt["corpus"]],
                        signatures=sig_frames[pt["corpus"]],
                        num_hashes=64, bands=16,
                        threshold=pt["thr"], max_bucket_size=pt["cap"],
                        join_mode=mode,
                    ).count()
                    rec["walls"][mode].append(round(time.time() - t0, 2))
                    rec["pairs"] = n
                    if mode == "auto" and rep == 0:
                        rec["auto_decision"] = dedup_mod._LAST_AUTO_DECISION
            best = min(("fused", "slim"), key=lambda m: min(rec["walls"][m]))
            rec["measured_best"] = best
            rec["auto_picked_best"] = rec["auto_decision"]["picked"] == best
            table.append(rec)
        emit(phase, {"n_docs": n_docs, "reps": REPS, "points": table})

    elif phase == "late_data":
        # Verdict ask #5: drive the watermark's late-data path at 100M
        # events with a CONTROLLED out-of-order replay — 5% of rows
        # (hash-chosen) arrive 3 files after their event-time cohort —
        # and assert the dropped-row count and emitted windows match a
        # batch-side prediction exactly, plus the state-store ceiling.
        from pyspark.sql import functions as F

        from tape_spark.streaming.windows import read_event_stream, tumbling_window_agg

        N_BATCHES = 20
        DELAY = 3
        replay = f"{SCRATCH}/late_replay"
        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select(F.col("ts").cast("timestamp").alias("ts"), "event_type",
                    "value", "event_id")
        )
        bounds = ev.agg(
            F.min("ts").cast("double").alias("mn"), F.max("ts").cast("double").alias("mx")
        ).first()
        mn, mx = bounds["mn"], bounds["mx"]
        span = mx - mn + 1e-6
        tsd = F.col("ts").cast("double")
        orig_b = F.least(
            F.lit(N_BATCHES - 1),
            F.floor((tsd - F.lit(mn)) / F.lit(span) * N_BATCHES),
        ).cast("int")
        is_late = F.pmod(F.xxhash64("event_id"), F.lit(20)) == 7  # 5%
        arr_b = F.when(
            is_late, F.least(F.lit(N_BATCHES - 1), orig_b + DELAY)
        ).otherwise(orig_b)
        tagged = ev.withColumn("orig_b", orig_b).withColumn(
            "late", is_late
        ).withColumn("arr_b", arr_b)
        if not os.path.exists(f"{replay}/batch-{N_BATCHES - 1:03d}.parquet"):
            if os.path.exists(replay):
                shutil.rmtree(replay)
            staged = f"{SCRATCH}/late_staged"
            if os.path.exists(staged):
                shutil.rmtree(staged)
            t0 = time.time()
            (
                tagged.select("ts", "event_type", "value", "event_id", "arr_b")
                .repartition(F.col("arr_b"))
                .write.partitionBy("arr_b")
                .parquet(staged)
            )
            os.makedirs(replay)
            # one file per arrival batch, names + mtimes in replay order
            # (the file source orders by modification time)
            now = time.time()
            for b in range(N_BATCHES):
                d = f"{staged}/arr_b={b}"
                parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
                assert len(parts) == 1, (b, parts)
                dst = f"{replay}/batch-{b:03d}.parquet"
                shutil.move(os.path.join(d, parts[0]), dst)
                os.utime(dst, (now + b, now + b))
            shutil.rmtree(staged)
            write_secs = round(time.time() - t0, 1)
        else:
            write_secs = 0.0

        # --- batch-side prediction (same formulas, no streaming) ---
        per_batch = (
            tagged.groupBy("arr_b").agg(F.max(tsd).alias("mx")).orderBy("arr_b").collect()
        )
        wm_before, wm_end, cm = {}, {}, float("-inf")
        for r in per_batch:
            b = int(r["arr_b"])
            wm_before[b] = cm - 3600.0 if cm > float("-inf") else float("-inf")
            cm = max(cm, float(r["mx"]))
            wm_end[b] = cm - 3600.0
        # Spark keeps TWO watermarks per stateful operator: late-event
        # FILTERING uses the previous batch's eviction watermark
        # (eventTimeWatermarkForLateEvents — so rows that raced the update
        # are not wrongly dropped), while EVICTION/emission uses the
        # current one. A batch-b row is dropped iff its window end <=
        # wm_evict(b-1) — exactly "the window was already emitted";
        # otherwise it merges into still-live state. The smoke run
        # confirmed this empirically (drops matched wm_evict(b-1), state
        # and emission matched wm_evict(b)).
        NEG = -1e18
        wm_late = {
            b: (wm_before[b - 1] if b >= 1 and wm_before[b - 1] > float("-inf") else NEG)
            for b in range(N_BATCHES)
        }
        # 20-entry literal map (codegen lookup, no Python in the 100M-row path)
        wm_map = F.create_map(
            *[x for b in range(N_BATCHES) for x in (F.lit(b), F.lit(wm_late[b]))]
        )
        day = 86400.0
        win_end = (F.floor(tsd / day) + 1) * day
        sim = tagged.withColumn("win_end", win_end).withColumn(
            "wmb", wm_map[F.col("arr_b")]
        )
        dropped_rows = sim.filter(F.col("win_end") <= F.col("wmb"))
        predicted_dropped = dropped_rows.count()
        # numRowsDroppedByWatermark counts rows AT THE STATE OPERATOR —
        # i.e. after the map-side partial aggregation, so one row per
        # (batch, window, key) per input partition, NOT per input row.
        # With one file per micro-batch the batch is a handful of input
        # partitions; predict the single-partition floor (distinct dropped
        # keys per batch) and assert measured lies in
        # [floor, floor × input_partitions]. The row-exact check is the
        # emission parity below (emitted windows == kept-row aggregate).
        predicted_dropped_keys = (
            dropped_rows.select("arr_b", "win_end", "event_type").distinct().count()
        )
        kept = sim.filter(F.col("win_end") > F.col("wmb"))
        final_wm = wm_end[N_BATCHES - 1]
        pred_emitted = (
            kept.filter(F.col("win_end") <= final_wm)
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "event_type", "n", "avg_value")
            .persist()
        )
        pred_emitted_n = pred_emitted.count()
        # predicted state ceiling: the watermark a batch evicts with is
        # fixed at batch PLANNING (from data through the previous batch),
        # so state at the end of batch b holds windows arrived ≤ b with
        # end > wm_before(b); the final no-data batch then evicts with
        # the last updated watermark. Drive the (N_BATCHES+1)-step sim
        # over the distinct-window summary (small).
        wins = (
            kept.groupBy(F.col("win_end").alias("we"), "event_type")
            .agg(F.min("arr_b").alias("first_b"))
            .collect()
        )
        wm_seq = [wm_before[b] for b in range(N_BATCHES)] + [wm_end[N_BATCHES - 1]]
        pred_state = [
            sum(
                1
                for w in wins
                if w["first_b"] <= min(b, N_BATCHES - 1) and float(w["we"]) > wm
            )
            for b, wm in enumerate(wm_seq)
        ]

        # --- the real streamed run ---
        schema = spark.read.parquet(f"{replay}/batch-000.parquet").schema
        stream = read_event_stream(spark, f"{replay}/*.parquet", schema,
                                   max_files_per_trigger=1)
        agg = tumbling_window_agg(
            stream, ts_col="ts", window="1 day", keys=["event_type"],
            value_col="value", watermark="1 hour",
        )
        ckpt = f"{SCRATCH}/late_ckpt"
        if os.path.exists(ckpt):
            shutil.rmtree(ckpt)
        t0 = time.time()
        q = (
            agg.writeStream.format("memory").queryName("late_windows")
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 1)
        progress = []
        for p in q.recentProgress:
            so = (p["stateOperators"] or [{}])[0]
            et = p["eventTime"] or {}
            progress.append({
                "batch": p["batchId"],
                "input_rows": p["numInputRows"],
                "state_rows": so.get("numRowsTotal"),
                "dropped": so.get("numRowsDroppedByWatermark"),
                "watermark": et.get("watermark"),
                "max_event_time": et.get("max"),
            })
        measured_dropped = sum(p["dropped"] or 0 for p in progress)
        emitted = spark.table("late_windows").persist()
        emitted_n = emitted.count()
        mism = (
            emitted.alias("s")
            .join(pred_emitted.alias("p"),
                  ["window_start", "window_end", "event_type"], "full")
            .filter(
                F.col("s.n").isNull() | F.col("p.n").isNull()
                | (F.col("s.n") != F.col("p.n"))
                | (F.abs(F.col("s.avg_value") - F.col("p.avg_value")) > 1e-9)
            )
            .count()
        )
        emit(phase, {
            "n_batches": len(progress),
            "replay_write_secs": write_secs,
            "stream_wall_secs": wall,
            "late_fraction": 0.05,
            "delay_files": DELAY,
            "predicted_dropped_input_rows": predicted_dropped,
            "predicted_dropped_state_keys": predicted_dropped_keys,
            "measured_dropped": measured_dropped,
            "drops_match_keys_floor": predicted_dropped_keys == measured_dropped,
            "drops_within_bounds": predicted_dropped_keys
            <= measured_dropped
            <= predicted_dropped,
            "predicted_emitted_windows": pred_emitted_n,
            "emitted_windows": emitted_n,
            "emitted_mismatches": mism,
            "predicted_max_state_rows": max(pred_state),
            "measured_max_state_rows": max((p["state_rows"] or 0) for p in progress),
            "batches": progress,
        })

    elif phase == "cdc_ab":
        # Verdict ask #6 done-criterion: the Arrow boundary draw must cut
        # IDENTICAL chunks (checksum over content-addressed chunk ids) at
        # 5M docs, and the A/B records what the fast mode buys.
        from pyspark.sql import functions as F

        from tape_spark.operators import chunk_documents_cdc

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64).persist()
        n_docs = docs.count()

        def run(draw):
            t0 = time.time()
            row = (
                chunk_documents_cdc(docs, target_tokens=64, draw=draw)
                .agg(
                    F.count(F.lit(1)).alias("n_chunks"),
                    F.sum(F.pmod(F.xxhash64("chunk_id"), F.lit(1_000_000_007))).alias("id_sum"),
                    F.sum("n_chunk_tokens").alias("tok_sum"),
                )
                .first()
            )
            return round(time.time() - t0, 1), row

        walls = {"md5": [], "md5_arrow": []}
        sums = {}
        for rep in range(REPS):
            for draw in ("md5", "md5_arrow"):
                w, row = run(draw)
                walls[draw].append(w)
                sums[draw] = {"n_chunks": row["n_chunks"],
                              "id_sum": int(row["id_sum"]),
                              "tok_sum": int(row["tok_sum"])}
        emit(phase, {
            "n_docs": n_docs,
            "walls": walls,
            "checksums": sums,
            "identical": sums["md5"] == sums["md5_arrow"],
            "speedup_min_over_min": round(min(walls["md5"]) / min(walls["md5_arrow"]), 2),
        })

    elif phase == "compaction":
        # Verdict ask #7 done-criterion: measure the read amplification N
        # appends leave behind, and what compaction buys, on the two
        # append paths with real query mixes. Results must be identical
        # before/after (checksummed here; bit-level asserted in tests).
        from pyspark.sql import functions as F

        from tape_spark.operators import (
            bm25_append_index,
            bm25_build_index,
            bm25_compact_index,
            bm25_load_index,
            bm25_save_index,
            bm25_topk_indexed,
        )
        from tape_spark.streaming import (
            minhash_append_store,
            minhash_compact_store,
            minhash_match_batch,
            minhash_save_store,
        )
        from tape_spark.operators import minhash_signatures

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64).persist()
        docs.count()

        # --- BM25: base 1M docs + 15 appends of 250k ---
        idx = f"{SCRATCH}/bm25_idx"
        if os.path.exists(idx):
            shutil.rmtree(idx)
        base = docs.filter(F.col("doc_id") < 1_000_000)
        t0 = time.time()
        postings, stats = bm25_build_index(base)
        bm25_save_index(postings, stats, idx)
        build_secs = round(time.time() - t0, 1)
        t0 = time.time()
        n_appends = 15
        for i in range(n_appends):
            lo = 1_000_000 + i * 250_000
            bm25_append_index(
                docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 250_000)),
                idx,
            )
        append_secs = round(time.time() - t0, 1)
        queries = [
            ("q_head", "w00001 w00002 w00003"),
            ("q_mid", "w00412 w01731"),
            ("q_tail", "w07321 w09871"),
            ("q_mix", "w00005 w04242 w09001"),
        ]

        def bm25_wall():
            p, s = bm25_load_index(spark, idx)
            walls, checks = [], None
            for _ in range(3):
                t0 = time.time()
                res = bm25_topk_indexed(p, s, queries, k=10)
                rows = sorted(
                    (r["query_id"], r["rank"], int(r["doc_id"]), int(r["score_units"]))
                    for r in res.collect()
                )
                walls.append(round(time.time() - t0, 2))
                checks = hash(tuple(rows))
            return walls, checks

        pre_walls, pre_check = bm25_wall()
        t0 = time.time()
        bm25_info = bm25_compact_index(spark, idx)
        bm25_compact_secs = round(time.time() - t0, 1)
        post_walls, post_check = bm25_wall()
        post_files = sum(
            1 for root, _, files in os.walk(idx) for f in files if f.endswith(".parquet")
        )

        # --- near-dup store: base 1M + 10 appends of 50k, one 10k match ---
        store = f"{SCRATCH}/nd_store"
        if os.path.exists(store):
            shutil.rmtree(store)
        sigs = minhash_signatures(base, signature_bits=32).persist()
        sigs.count()
        minhash_save_store(sigs, store, num_entry_buckets=64, num_sig_buckets=32)
        for i in range(10):
            lo = 1_000_000 + i * 50_000
            minhash_append_store(
                docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 50_000)),
                store,
            )
        arr = (
            docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(500)) == 3)
            .limit(10_000)
            .select((F.col("doc_id") + 100_000_000).alias("doc_id"),
                    F.concat("text", F.lit(" tail")).alias("text"))
            .persist()
        )
        arr.count()

        def nd_wall():
            walls, check = [], None
            for _ in range(3):
                caches = []
                t0 = time.time()
                m = minhash_match_batch(arr, store, threshold=0.5, _cleanup=caches)
                row = m.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.pmod(F.xxhash64("doc_id", "corpus_id"),
                                 F.lit(1_000_000_007))).alias("s"),
                ).first()
                walls.append(round(time.time() - t0, 2))
                check = (row["n"], int(row["s"] or 0))
                for c in caches:
                    c.unpersist()
            return walls, check

        nd_pre_walls, nd_pre_check = nd_wall()
        t0 = time.time()
        nd_info = minhash_compact_store(spark, store)
        nd_compact_secs = round(time.time() - t0, 1)
        nd_post_walls, nd_post_check = nd_wall()
        nd_post_files = sum(
            1 for root, _, files in os.walk(store) for f in files if f.endswith(".parquet")
        )
        emit(phase, {
            "bm25": {
                "base_docs": 1_000_000, "appends": n_appends, "rows_per_append": 250_000,
                "build_secs": build_secs, "append_secs_total": append_secs,
                "files_before": bm25_info["postings_files_before"]
                if "postings_files_before" in bm25_info else bm25_info,
                "files_after": post_files,
                "query_walls_before": pre_walls, "query_walls_after": post_walls,
                "compact_secs": bm25_compact_secs,
                "results_identical": pre_check == post_check,
            },
            "neardup_store": {
                "base_docs": 1_000_000, "appends": 10, "rows_per_append": 50_000,
                "files_before": nd_info, "files_after": nd_post_files,
                "match_walls_before": nd_pre_walls, "match_walls_after": nd_post_walls,
                "compact_secs": nd_compact_secs,
                "results_identical": nd_pre_check == nd_post_check,
            },
        })

    elif phase == "celebrity_guard":
        # Verdict ask #8 done-criterion: exercise the opt-in hot-key guard
        # on the celebrity frame (one synthetic user holding ~10% of 100M
        # events): the guard must raise naming the hot key BEFORE the
        # single-task sort, and its cost must be one map-side-combined
        # count aggregate (measured as overhead vs the unguarded run at a
        # permissive threshold).
        from pyspark.sql import functions as F

        from tape_spark.streaming.windows import sessionize

        ev = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select(
                F.when(F.pmod(F.xxhash64("user_id"), F.lit(10)) == 0, F.lit(42))
                .otherwise(F.col("user_id")).alias("user_id"),
                F.col("ts").cast("timestamp").cast("double").alias("t"),
            )
            .persist()
        )
        n = ev.count()
        # 1) the raise: threshold below the hot key's ~10% share (2% of n)
        t0 = time.time()
        raised, msg = False, ""
        try:
            sessionize(ev, max_rows_per_key=max(100, n // 50)).count()
        except ValueError as e:
            raised, msg = True, str(e)[:300]
        raise_secs = round(time.time() - t0, 1)
        # 2) overhead: guarded (permissive threshold) vs unguarded, interleaved
        walls = {"unguarded": [], "guarded": []}
        for _ in range(REPS):
            t0 = time.time()
            sessionize(ev).agg(F.count(F.lit(1))).collect()
            walls["unguarded"].append(round(time.time() - t0, 1))
            t0 = time.time()
            sessionize(ev, max_rows_per_key=n).agg(F.count(F.lit(1))).collect()
            walls["guarded"].append(round(time.time() - t0, 1))
        emit(phase, {
            "n_events": n,
            "guard_raised": raised,
            "guard_raise_secs": raise_secs,
            "guard_message_head": msg,
            "walls": walls,
            "guard_overhead_pct": round(
                100.0 * (min(walls["guarded"]) - min(walls["unguarded"]))
                / max(min(walls["unguarded"]), 1e-9), 1,
            ),
        })

    elif phase == "ingest_loop":
        # The FULL incremental-ingest loop the store exists for: 12
        # triggers of 50k arriving docs, each matched against the store
        # and THEN appended to it (append_arrivals semantics, driven via
        # the same minhash_match_batch + minhash_append_store verbs the
        # foreachBatch wrapper composes). The store GROWS 1M -> 1.6M docs
        # across the run; per-trigger wall should grow only with the
        # accumulated per-append file generations — and compacting at
        # trigger 8 should knock the wall back down. Self-matching is the
        # planted signal: every arrival is a near-copy of a corpus doc,
        # and arrivals from trigger i are in the store for trigger j>i.
        from pyspark.sql import functions as F

        from tape_spark.operators import minhash_signatures
        from tape_spark.streaming import (
            minhash_append_store,
            minhash_compact_store,
            minhash_match_batch,
            minhash_save_store,
        )

        docs = spark.read.parquet(f"{ZIPF_DIR}/documents.parquet").repartition(64).persist()
        docs.count()
        store = f"{SCRATCH}/ingest_store"
        if os.path.exists(store):
            shutil.rmtree(store)
        base = docs.filter(F.col("doc_id") < 1_000_000)
        sigs = minhash_signatures(base, signature_bits=32)
        minhash_save_store(sigs, store, num_entry_buckets=64, num_sig_buckets=32)
        triggers = []
        compact_info = None
        for i in range(12):
            lo = 1_000_000 + i * 50_000
            # arrivals are near-copies of the PREVIOUS trigger's cohort
            # (trigger 0 copies the tail of the base corpus): every
            # trigger's matches therefore come from rows appended one
            # trigger earlier — the cross-generation contract under test
            arr_lo = lo - 50_000
            arr = (
                docs.filter(
                    (F.col("doc_id") >= arr_lo) & (F.col("doc_id") < arr_lo + 50_000)
                )
                .select(
                    (F.col("doc_id") + 100_000_000).alias("doc_id"),
                    F.concat("text", F.lit(" ingest tail")).alias("text"),
                )
                .persist()
            )
            arr.count()
            caches = []
            t0 = time.time()
            m = minhash_match_batch(arr, store, threshold=0.5, _cleanup=caches)
            n_matches = m.count()
            match_secs = round(time.time() - t0, 2)
            for c in caches:
                c.unpersist()
            t0 = time.time()
            # append the ORIGINAL new docs (ids in corpus space), so later
            # triggers can match against this trigger's cohort
            minhash_append_store(
                docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 50_000)),
                store,
            )
            append_secs = round(time.time() - t0, 2)
            files = sum(
                1 for r, _, fs in os.walk(store) for f in fs if f.endswith(".parquet")
            )
            triggers.append({
                "trigger": i, "store_docs": 1_000_000 + i * 50_000,
                "matches": n_matches, "match_secs": match_secs,
                "append_secs": append_secs, "store_files": files,
            })
            arr.unpersist()
            if i == 7:
                t0 = time.time()
                compact_info = minhash_compact_store(spark, store)
                compact_info["secs"] = round(time.time() - t0, 1)
        emit(phase, {
            "base_docs": 1_000_000, "trigger_docs": 50_000, "n_triggers": 12,
            "compact_after_trigger": 7, "compact": compact_info,
            "triggers": triggers,
        })

    else:
        raise SystemExit(f"unknown phase {phase!r}")

    spark.stop()


if __name__ == "__main__":
    main()

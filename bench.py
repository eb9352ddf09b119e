#!/usr/bin/env python
"""Benchmark harness: headline workloads at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each workload runs $SPARK_GRAFT_REPS times (default 5), interleaved in
suite order; "queries" holds the per-query MEDIAN and "spread" the
[min, max] so a single host-load spike (this machine swings 2-3x under
load) cannot masquerade as a regression. "value" is the sum of medians.

Workloads mirror the reference's asv suite (benchmarks/benchmarks.py:27-40)
plus the scale-path pipeline operators:
  q1 batch_mean   — batch(np.mean) (rewritten to a built-in aggregate)
  q2 prune_sync   — count-filter + implicit left-semi sync + head
  q3 sf2_basic    — SF² kernel over all curves (UDF-bound)
  q4 minhash_lsh  — MinHash+LSH near-dup over documents
  q5 ann_topk     — brute-force cosine top-k over embeddings
  q6 bin_sources  — time-bucket partial aggregation
  q7 text_pipeline — language ID + quality + exact dedup over documents
  q8 events_windows — tumbling-window agg + sessionize over events
  q9 stetson_j    — block-vectorized Stetson J over all curves
  q10 curation_pipeline — decontaminate → stratified_sample → chunk
"""

from __future__ import annotations

import json
import os
import re
import sys

# Bumped whenever ANY workload's action definition changes, so
# BENCH_r*.json is self-describing across rounds: same bench_rev ⇒ the
# numbers measure the same work; different bench_rev ⇒ compare only
# within-rev (the r7→r8 "regression" was rev 1→2 measuring more).
# rev 1 = r2–r7 actions; rev 2 = r8 consume-the-computed-columns fix
# (q1/q6/q7/q8 stopped letting Catalyst prune the measured expressions).
# rev 3 = r12 deterministic-ambient fix: all input tables are page-cache
# warmed BEFORE timing (the r11 ±15% drift tracked page-cache state
# inherited from whatever ran earlier on the host), and an IO-bound
# calibration probe is interleaved alongside the pure-JVM one so the
# calibration columns actually span the dimension the drift lives in.
# rev 4 = r16 no-cached-base-tables fix: the suite-level
# `ens.frames["source"].persist()` is gone and q1 re-ingests inside its
# timed body like q2/q3/q6/q9. This slows MORE than q1: Spark's cache
# manager matches by canonicalized logical plan, so the re-ingests in
# q2/q3/q6/q9 were ALSO silently resolving their source scans to the
# suite-level InMemoryRelation (measured r16: their rev-3 walls were
# compute-over-cached-input too). Rev 4 q1/q2/q3/q6/q9 measure honest
# scan+compute — expect each a few tenths to ~2x SLOWER than rev 3;
# that is the comparability break, not a code regression.
# The rev→round map lives in docs/SCALING.md §Bench comparability.
BENCH_REV = 4
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "5")))
# numeric core count for partition sizing; CPUS may be non-numeric
# (local[*] is a valid master) so fall back to the machine's count
try:
    N_CPUS = int(CPUS)
except ValueError:
    N_CPUS = os.cpu_count() or 8


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(N_CPUS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    workloads = []

    def run(name, fn):
        workloads.append((name, fn))

    # Spin up the Python UDF worker pool before timing (the no-op
    # mapInPandas job forces one pandas+numpy import per worker process),
    # so queries measure steady-state compute — the signal that
    # extrapolates to a long-lived cluster — not one-time JVM/worker
    # start-up.
    def _noop(batches):
        for b in batches:
            yield b

    spark.range(N_CPUS * 4, numPartitions=N_CPUS).mapInPandas(
        _noop, "id long"
    ).count()

    # Deterministic ambient state: fully read every input table ONCE
    # before timing, so the OS page-cache state the measured reps see is
    # "inputs warm" regardless of what ran on the host earlier. Without
    # this, a round that previously streamed tens of GB (the sf100
    # probes) evicts the bench inputs and the first reps measure disk,
    # not code — the r11 ±15% attribution fight. Skipped under
    # SPARK_GRAFT_NO_PERSIST (the huge-SF probes WANT cold-ish IO and
    # could not hold sf100 in cache anyway).
    if not os.environ.get("SPARK_GRAFT_NO_PERSIST"):
        for tbl in ("lineitem", "documents", "embeddings", "events"):
            p = f"{SF_DIR}/{tbl}.parquet"
            if os.path.exists(p):
                df = spark.read.parquet(p)
                # count EVERY column: column pruning would otherwise warm
                # only a sliver of the file's byte range
                df.agg(*[F.count(c) for c in df.columns]).collect()

    # .agg(count(result)) instead of .count(): consume the computed column
    # so pruning cannot drop the aggregate expression (see q7's note).
    # rev 4: re-ingest inside the timed body (same pattern as q2/q3/q6/q9)
    # — rev ≤3 timed this against a suite-level persisted source table,
    # i.e. compute-over-cached-input rather than scan+compute.
    def batch_mean():
        e = em._ensemble(spark, SF_DIR)
        e.batch(np.mean, "l_extendedprice", meta=("result", float)).agg(
            F.count("result")
        ).collect()

    run("q1_batch_mean", batch_mean)

    def prune_sync():
        e = em._ensemble(spark, SF_DIR)
        e.prune(threshold=5)
        e.source.limit(5).collect()

    run("q2_prune_sync", prune_sync)

    def sf2():
        e = em._ensemble(spark, SF_DIR)
        e.prune(threshold=5)
        e.sf2(sf_method="basic").count()

    run("q3_sf2_basic", sf2)

    docs = em._docs(spark, SF_DIR)
    from tape_spark.operators import cosine_topk, minhash_near_duplicates

    # max_bucket_size=256 is the documented scale knob for boilerplate
    # mega-buckets; sf0.1's largest band bucket is 14 (measured), so the
    # cap is inert at the comparable SF and only engages at sf10+.
    #
    # Comparability note for q4's r6->r7 median (~0.43 -> ~1.0 s): the
    # round-6 implementation persisted its signature table and never
    # unpersisted it, so bench reps 2-5 silently reused the leaked cache
    # (measured: r6 signatures alone 0.6 s > r6 "full" 0.51 s warm).
    # Round 7 releases the cache (the correct lifecycle), so every rep
    # honestly recomputes signatures; the search itself got faster (fused
    # single join + codegen-unrolled verify: sf100 went DNF -> 39 min).
    run(
        "q4_minhash_lsh",
        lambda: minhash_near_duplicates(
            docs, num_hashes=64, bands=16, threshold=0.3, max_bucket_size=256
        ).count(),
    )

    emb = em._emb(spark, SF_DIR)
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    run("q5_ann_topk", lambda: cosine_topk(emb, queries_df, k=10).count())

    def bins():
        e = em._ensemble(spark, SF_DIR)
        e.bin_sources(time_window=604800.0, count_col="bin_count")
        # consume the binned aggregates (see q7's note)
        e.frames["source"].agg(
            F.sum("bin_count"), F.avg("l_extendedprice"), F.avg("l_quantity")
        ).collect()

    run("q6_bin_sources", bins)

    from tape_spark.operators import exact_dedup, language_id, text_quality

    # Actions must CONSUME the computed columns: `.count()` lets column
    # pruning delete the language/quality expressions from the plan
    # entirely (round-8 lesson, docs/SCALING.md "asof correction" — the
    # prior q7 timed two bare scans plus the dedup). Aggregating over the
    # computed columns forces the real work; comparability note: r8+ q7
    # is therefore measuring MORE than r2–r7 q7 did.
    def text_pipeline():
        language_id(docs).groupBy("pred_lang").count().collect()
        text_quality(docs).agg(
            F.avg("avg_token_len"), F.avg("punct_ratio")
        ).collect()
        exact_dedup(docs).count()

    run("q7_text_pipeline", text_pipeline)

    def events_windows():
        from tape_spark.streaming import sessionize

        ev = em._events(spark, SF_DIR)
        ev.groupBy((F.floor(F.col("t") / 900)).cast("long").alias("w"), "event_type").agg(
            F.count(F.lit(1)).alias("n"), F.avg("value").alias("av")
        ).agg(F.sum("n"), F.avg("av")).collect()
        sessionize(ev, user_col="user_id", ts_col="t", order_cols=["event_id"]).count()

    run("q8_events_windows", events_windows)

    def stetson():
        from tape_spark.analysis import calc_stetson_J

        e = em._ensemble(spark, SF_DIR)
        e.prune(threshold=5)
        e.batch(calc_stetson_J).count()

    run("q9_stetson_j", stetson)

    def curation_pipeline():
        from tape_spark.operators import chunk_documents, decontaminate, stratified_sample

        bench_set = docs.filter(F.col("doc_id") % 23 == 0)
        train = docs.filter(F.col("doc_id") % 23 != 0)
        clean = decontaminate(train, bench_set, n=3).filter(~F.col("is_contaminated"))
        kept = stratified_sample(
            train.join(clean.select("doc_id"), "doc_id", "left_semi"),
            "lang",
            {"en": 0.8, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 0.8},
        )
        chunk_documents(kept, chunk_tokens=64, overlap_tokens=8).count()

    run("q10_curation_pipeline", curation_pipeline)

    # fixed-cost calibration probe: a pure-JVM sum over a constant range.
    # Its wall time has no dependence on this repo's code, so drift in the
    # calibration medians ACROSS ROUNDS measures ambient host load — the
    # denominator that separates "the machine was busy" from "the code got
    # slower". Interleaved like a workload, reported separately (not part
    # of the headline total, which stays comparable across rounds).
    def calibration():
        spark.range(50_000_000, numPartitions=N_CPUS).agg(F.sum("id")).collect()

    # IO-bound calibration: re-read a FIXED parquet byte range end to end
    # (documents.text dominates that table's bytes). The pure-JVM probe
    # above is blind to page-cache/IO state by construction — r11's drift
    # lived exactly there (its calibration ran FASTER on the slower
    # round). Two probes per rep span both dimensions: jvm flat + io flat
    # but queries up ⇒ code; io up too ⇒ host/IO state.
    io_path = f"{SF_DIR}/documents.parquet"

    def io_calibration():
        spark.read.parquet(io_path).agg(F.sum(F.length("text"))).collect()

    probes = [("calibration", calibration)]
    if os.path.exists(io_path):
        probes.append(("io_calibration", io_calibration))

    # SPARK_GRAFT_ONLY=q1_batch_mean,q3_sf2_basic restricts the suite — for
    # huge local scale probes, run small groups in separate processes so
    # each JVM exit reclaims its shuffle files (a full sf100 suite in one
    # session accumulates hundreds of GB of shuffle data on one host)
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        known = {n for n, _ in workloads}
        unknown = names - known
        if unknown:  # a typo must not silently produce an empty-suite artifact
            raise SystemExit(
                f"SPARK_GRAFT_ONLY names unknown workloads: {sorted(unknown)}; "
                f"known: {sorted(known)}"
            )
        workloads = [(n, f) for n, f in workloads if n in names]

    # interleave repetitions in suite order: a load spike hits one rep of
    # several queries instead of all reps of one, and the median shrugs it off
    samples = {name: [] for name, _ in workloads + probes}
    for _ in range(REPS):
        for name, fn in workloads + probes:
            t0 = time.time()
            fn()
            samples[name].append(time.time() - t0)

    calib = {
        name: {
            "median": round(float(np.median(ts)), 3),
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
            # per-rep series, suite order: co-movement with the query
            # series below is what attributes drift (host vs code)
            "samples": [round(t, 3) for t in ts],
        }
        for name, ts in samples.items()
        if any(name == p for p, _ in probes)
    }
    samples = {name: ts for name, ts in samples.items() if name not in calib}
    timings = {name: round(float(np.median(ts)), 3) for name, ts in samples.items()}
    spread = {
        name: [round(min(ts), 3), round(max(ts), 3)] for name, ts in samples.items()
    }
    # per-query minimum: the best-observed run is the least host-load-
    # contaminated sample, so min vs median separates machine noise from
    # real regressions across rounds
    minimums = {name: round(min(ts), 3) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    # defensive: a custom data dir without an sf<N> suffix must not crash
    # the run after all workloads already completed
    m = re.search(r"sf([0-9.]+)/?$", SF_DIR)
    try:
        sf = float(m.group(1)) if m else -1.0
    except ValueError:
        sf = -1.0
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "bench_rev": BENCH_REV,
                "queries": timings,
                "sf": sf,
                "reps": REPS,
                "spread": spread,
                "min": minimums,
                "min_total": round(sum(minimums.values()), 3),
                "samples": {
                    name: [round(t, 3) for t in ts] for name, ts in samples.items()
                },
                "calibration": calib,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

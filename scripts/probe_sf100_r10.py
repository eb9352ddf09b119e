#!/usr/bin/env python
"""Round-10 sf100 probes (each phase its own process, per the sf100
methodology — JVM exit reclaims shuffle files):

  python scripts/probe_sf100_r10.py split       # gated split_contaminated A/B (vs r9's 422s rare / 481s hot)
  python scripts/probe_sf100_r10.py bm25_map    # map-lookup tf vector at max_terms (vs r9's transform scan)
  python scripts/probe_sf100_r10.py dsir_topk   # two-phase rank pre-top-k (selection bit-identity + timing)
  python scripts/probe_sf100_r10.py ivfpq_sweep # recall@10 / latency vs num_clusters x nprobe at 2M vectors
  python scripts/probe_sf100_r10.py resample_guard # max_grid_rows estimate cost at 600M rows

Appends one JSON line per phase to $PROBE_OUT (default
/root/repo/.benchdata/probe_sf100_r10.jsonl). The benchmarked action
always CONSUMES the operator's output columns (sums over the computed
fields) so Catalyst cannot prune the measured work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PROBE_SF_DIR", "/root/repo/.benchdata/sf100")
OUT = os.environ.get("PROBE_OUT", "/root/repo/.benchdata/probe_sf100_r10.jsonl")
WAREHOUSE = "/root/repo/.benchdata/warehouse"
DERBY = "/root/repo/.benchdata/derby"
REPS = int(os.environ.get("PROBE_REPS", "2"))


def session():
    from pyspark.sql import SparkSession

    os.makedirs(DERBY, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .enableHiveSupport()
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.warehouse.dir", WAREHOUSE)
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={DERBY}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def emit(phase, payload):
    rec = {"phase": phase, "sf_dir": SF_DIR, "reps": REPS, **payload}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def main():
    phase = sys.argv[1]
    spark = session()

    if phase == "split":
        # Gated split_contaminated at 5M docs, SAME geometry as the r9
        # probe (bench = every 23rd doc; rare = benchmark rewritten with
        # _q-suffixed tokens so collisions are ~zero; hot = the raw
        # benchmark, ~96% of train docs hit). r9 ungated: rare 428/422s,
        # hot 481s.
        from pyspark.sql import functions as F

        from tape_spark.operators import split_contaminated

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        bench_hot = docs.filter(F.col("doc_id") % 23 == 0)
        train = docs.filter(F.col("doc_id") % 23 != 0)
        bench_rare = bench_hot.select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
                    lambda t: F.concat(t, F.lit("_q")),
                ),
                " ",
            ).alias("text"),
        )
        out = {}
        for name, bench in (("rare", bench_rare), ("hot", bench_hot)):
            reps = []
            stats = None
            for _ in range(REPS):
                t0 = time.time()
                agg = split_contaminated(train, bench, n=3, radius=1).agg(
                    F.count(F.lit(1)).alias("docs"),
                    F.sum("n_pieces").alias("pieces"),
                    F.sum("n_removed_tokens").alias("removed"),
                ).collect()[0]
                stats = (agg["docs"], agg["pieces"], agg["removed"])
                reps.append(round(time.time() - t0, 1))
            out[name] = {"secs": reps, "docs": stats[0],
                         "pieces": stats[1], "removed_tokens": stats[2]}
        emit(phase, out)

    elif phase == "bm25_map":
        # bm25_topk at 5M docs with a LARGE term universe (the regime
        # the O(|terms|)-per-token transform scan was worst at). Queries
        # are assembled from the corpus vocabulary (31 distinct words —
        # padded with synthetic multi-word queries to push distinct
        # terms up), k=10.
        from pyspark.sql import functions as F

        from tape_spark.operators import bm25_topk

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        vocab = [
            r["w"]
            for r in docs.select(
                F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
            ).groupBy("w").count().orderBy(F.col("count").desc()).collect()
            if r["w"]
        ]
        # 16 queries x up to 8 terms over the 31-word vocab (plus cold
        # terms that match nothing) — distinct universe ~63 terms
        queries = []
        for q in range(16):
            terms = [vocab[(q * 3 + j) % len(vocab)] for j in range(8)]
            terms += [f"zz_cold_{q}_{j}" for j in range(2)]
            queries.append((f"q{q}", " ".join(terms)))
        reps = []
        chk = None
        for _ in range(REPS):
            t0 = time.time()
            top = bm25_topk(docs, queries, k=10)
            agg = top.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("score_units").alias("units"),
                F.sum(F.col("rank") * F.col("doc_id")).alias("rd"),
            ).collect()[0]
            chk = (agg["rows"], agg["units"], agg["rd"])
            reps.append(round(time.time() - t0, 1))
        emit(phase, {"secs": reps, "rows": chk[0], "units": chk[1], "rank_dot": chk[2]})

    elif phase == "dsir_topk":
        # dsir_select at 5M docs (r9 geometry: target = every 101st doc)
        # after the two-phase final rank — selection must stay
        # bit-identical (checksum over selected ids) at unchanged cost.
        from pyspark.sql import functions as F

        from tape_spark.operators import dsir_select

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        target = docs.filter(F.col("doc_id") % 101 == 0)
        raw = docs.filter(F.col("doc_id") % 101 != 0)
        reps = []
        chk = None
        for _ in range(REPS):
            t0 = time.time()
            sel = dsir_select(raw, target, k=100_000, num_buckets=65536)
            agg = sel.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("doc_id").alias("idsum"),
                F.min("logw_units").alias("wmin"),
                F.max("logw_units").alias("wmax"),
            ).collect()[0]
            chk = (agg["n"], agg["idsum"], agg["wmin"], agg["wmax"])
            reps.append(round(time.time() - t0, 1))
        emit(phase, {"secs": reps, "selected": chk[0], "idsum": chk[1],
                     "logw_units_range": [chk[2], chk[3]]})

    elif phase == "ivfpq_sweep":
        # IVFPQ recall@10 and warm scan time vs num_clusters x nprobe at
        # 2M vectors, 64 queries drawn from the corpus (ground truth =
        # brute-force cosine_topk). The SCALING.md curve the r9 verdict
        # asked for.
        import numpy as np
        from pyspark.sql import functions as F

        from tape_spark.operators import cosine_topk
        from tape_spark.operators.quantization import ivfpq_cosine_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(64)
        emb = emb.persist()
        emb.count()
        qrows = emb.filter(F.col("vec_id") % 31337 == 0).limit(64).collect()
        qdf = spark.createDataFrame(
            [(r["vec_id"], r["embedding"]) for r in qrows],
            "query_id long, embedding array<float>",
        )
        truth = {
            (r["query_id"], r["corpus_id"])
            for r in cosine_topk(emb, qdf, k=10).collect()
        }
        grid = []
        for num_clusters in (64, 256, 1024):
            for nprobe in (1, 4, 8, 16):
                t0 = time.time()
                got = ivfpq_cosine_topk(
                    emb, qdf, k=10, num_clusters=num_clusters, nprobe=nprobe,
                ).collect()
                dt = round(time.time() - t0, 1)
                hits = sum(
                    1 for r in got if (r["query_id"], r["corpus_id"]) in truth
                )
                grid.append({
                    "num_clusters": num_clusters, "nprobe": nprobe,
                    "secs": dt, "recall_at_10": round(hits / len(truth), 4),
                })
                print(json.dumps(grid[-1]))
        emit(phase, {"grid": grid, "queries": len(qrows)})

    elif phase == "ivfpq_sweep_hard":
        # Same grid, HARD queries: corpus vectors perturbed with
        # deterministic Gaussian noise to cos~0.9 from their source, so
        # queries land near coarse-cell boundaries and the nprobe knee
        # becomes visible (the corpus-member sweep is flat at 1.0 on the
        # easy synthetic geometry). Ground truth is brute force on the
        # SAME perturbed queries.
        import numpy as np
        from pyspark.sql import functions as F

        from tape_spark.operators import cosine_topk
        from tape_spark.operators.quantization import ivfpq_cosine_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(64)
        emb = emb.persist()
        emb.count()
        qrows = emb.filter(F.col("vec_id") % 31337 == 0).limit(64).collect()
        sigma = 0.484  # |noise|/|v| for E[cos] ~ 0.9 at high dim
        qs, cosims = [], []
        for r in qrows:
            v = np.asarray(r["embedding"], dtype=np.float64)
            rng = np.random.default_rng(int(r["vec_id"]) + 17)
            g = rng.standard_normal(v.shape)
            g = g / np.linalg.norm(g) * sigma * np.linalg.norm(v)
            q = v + g
            cosims.append(float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))))
            qs.append((int(r["vec_id"]), [float(x) for x in q]))
        qdf = spark.createDataFrame(qs, "query_id long, embedding array<double>")
        truth = {
            (r["query_id"], r["corpus_id"])
            for r in cosine_topk(emb, qdf, k=10).collect()
        }
        grid = []
        for num_clusters in (64, 256, 1024):
            for nprobe in (1, 4, 8, 16):
                t0 = time.time()
                got = ivfpq_cosine_topk(
                    emb, qdf, k=10, num_clusters=num_clusters, nprobe=nprobe,
                ).collect()
                dt = round(time.time() - t0, 1)
                hits = sum(
                    1 for r in got if (r["query_id"], r["corpus_id"]) in truth
                )
                grid.append({
                    "num_clusters": num_clusters, "nprobe": nprobe,
                    "secs": dt, "recall_at_10": round(hits / len(truth), 4),
                })
                print(json.dumps(grid[-1]))
        emit(phase, {
            "grid": grid, "queries": len(qs),
            "mean_query_source_cos": round(sum(cosims) / len(cosims), 4),
        })

    elif phase == "overlap_left":
        # interval_overlap_join how='left' at 100M events: per-user
        # sessions (30-min gap) left-joined to 15-min outage windows
        # every 4h — BOTH complement paths: the caller-id lazy anti-join
        # (sessions have a unique (user, start) -> synthesize one id
        # column) and the synthetic-id eager-checkpoint fallback. Both
        # must agree on the match/unmatched split.
        from pyspark.sql import Window, functions as F

        from tape_spark.operators import interval_overlap_join

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "user_id", F.col("ts").cast("timestamp_ltz").cast("double").alias("t")
        )
        gap = F.col("t") - F.lag("t").over(
            Window.partitionBy("user_id").orderBy("t")
        )
        sess = (
            ev.withColumn("__new", (gap.isNull() | (gap > 1800)).cast("int"))
            .withColumn("__sid", F.sum("__new").over(
                Window.partitionBy("user_id").orderBy("t")
                .rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("user_id", "__sid")
            .agg(F.min("t").alias("ss"), F.max("t").alias("se"))
            .withColumn("rid", F.xxhash64("user_id", "__sid"))
        )
        bounds = sess.agg(
            F.floor(F.min("ss") / 14400.0).cast("long").alias("k0"),
            F.floor(F.max("se") / 14400.0).cast("long").alias("k1"),
        )
        outages = bounds.select(F.explode(F.sequence("k0", "k1")).alias("k")).select(
            (F.col("k") * 14400.0).alias("os"),
            (F.col("k") * 14400.0 + 900.0).alias("oe"),
        )
        out = {}
        for name, kw in (("caller_id", {"left_id": "rid"}), ("synthetic", {})):
            t0 = time.time()
            r = interval_overlap_join(
                sess, outages, "ss", "se", "os", "oe",
                by=None, bucket_width=14400.0, how="left", **kw,
            ).agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.col("os").isNull().cast("long")).alias("unmatched"),
            ).collect()[0]
            out[name] = {"secs": round(time.time() - t0, 1),
                         "rows": r["rows"], "unmatched": r["unmatched"]}
        out["paths_agree"] = (
            out["caller_id"]["rows"] == out["synthetic"]["rows"]
            and out["caller_id"]["unmatched"] == out["synthetic"]["unmatched"]
        )
        emit(phase, out)

    elif phase == "normalize":
        # normalize_text over 5M docs: NFC form (one Arrow stage with the
        # ASCII fast path — the synthetic corpus is pure ASCII, so this
        # measures the fast path) vs form=None (pure codegen). The action
        # consumes the normalized text (length sum + one sha).
        from pyspark.sql import functions as F

        from tape_spark.operators import normalize_text

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        out = {}
        for name, form in (("nfc_arrow", "NFC"), ("codegen_only", None)):
            reps = []
            chk = None
            for _ in range(REPS):
                t0 = time.time()
                agg = normalize_text(
                    docs, output_col="__n", form=form, lowercase=True
                ).agg(
                    F.sum(F.length("__n")).alias("chars"),
                    F.sum(F.xxhash64("__n").cast("decimal(38,0)")).alias("h"),
                ).collect()[0]
                chk = (int(agg["chars"]), str(agg["h"]))
                reps.append(round(time.time() - t0, 1))
            out[name] = {"secs": reps, "chars": chk[0], "checksum": chk[1]}
        # ASCII corpus: both paths must normalize identically
        out["paths_agree"] = out["nfc_arrow"]["checksum"] == out["codegen_only"]["checksum"]
        emit(phase, out)

    elif phase == "resample_guard":
        # the max_grid_rows estimator: its cost must be one tiny span
        # aggregate over the bucketed events table, not a full resample
        from pyspark.sql import functions as F

        from tape_spark.operators import resample_timeseries

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "user_id",
            F.col("ts").cast("timestamp_ltz").cast("double").alias("t"),
            "value",
        )
        reps = []
        err = None
        for _ in range(REPS):
            t0 = time.time()
            try:
                resample_timeseries(
                    ev, on="t", value_col="value", step=0.001, by="user_id",
                    max_grid_rows=1_000_000,
                )
            except ValueError as e:
                err = str(e)[:200]
            reps.append(round(time.time() - t0, 1))
        emit(phase, {"secs": reps, "raised": err})

    elif phase == "longdoc":
        # Adversarial long-document skew: ONE 5M-token giant (~25 MB of
        # text, built JVM-side) unioned into the 5M-doc corpus. The
        # per-document array operators (tokenize, inline positional
        # grams, tf aggregate) each hold one giant row in one task —
        # this measures that the skew degrades that task linearly, not
        # the job catastrophically.
        from pyspark.sql import functions as F

        from tape_spark.operators import bm25_topk, split_contaminated

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        giant = spark.range(1).select(
            F.lit(6_000_000_000).alias("doc_id"),
            F.array_join(
                F.array_repeat(F.lit("alpha beta gamma delta"), 1_250_000), " "
            ).alias("text"),
        )
        train = docs.select("doc_id", "text").unionByName(giant)
        bench_rare = docs.filter(F.col("doc_id") % 23 == 0).select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
                    lambda t: F.concat(t, F.lit("_q")),
                ),
                " ",
            ).alias("text"),
        )
        out = {}
        t0 = time.time()
        # CONSUME pieces (concat_ws forces the rebuild) — summing only
        # counters lets Catalyst prune the rebuild entirely (r7 lesson)
        agg = split_contaminated(train, bench_rare, n=3, radius=1).agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("toks"),
            F.sum("n_pieces").alias("pieces"),
            F.sum(F.length(F.concat_ws(" ", "pieces"))).alias("piece_chars"),
        ).collect()[0]
        out["split_rare_secs"] = round(time.time() - t0, 1)
        out["split_docs"] = agg["docs"]
        out["split_tokens"] = agg["toks"]
        out["split_piece_chars"] = agg["piece_chars"]
        for name, frame in (("bm25_with_giant", train),
                            ("bm25_no_giant", docs.select("doc_id", "text"))):
            t0 = time.time()
            top = bm25_topk(frame, [("q1", "alpha gamma"), ("q2", "beta")], k=10)
            r = top.agg(F.count(F.lit(1)).alias("rows"),
                        F.sum("score_units").alias("units")).collect()[0]
            out[f"{name}_secs"] = round(time.time() - t0, 1)
            out[f"{name}_rows"] = r["rows"]
        emit(phase, out)

    elif phase == "budget_sf100":
        # select_by_budget over 5M docs: score = a cheap quality proxy,
        # weight = whitespace token count, budget = 40% of total tokens.
        # The action CONSUMES the kept set (count + weight sum + id
        # checksum) so the prune/window work is actually measured.
        from pyspark.sql import functions as F

        from tape_spark.operators import select_by_budget

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        scored = docs.select(
            "doc_id",
            (F.xxhash64("doc_id") % 1000003).cast("double").alias("score"),
            F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
            .cast("long").alias("w"),
        )
        total = scored.agg(F.sum("w").alias("t")).collect()[0]["t"]
        budget = int(total) * 2 // 5
        reps = []
        chk = None
        for _ in range(REPS):
            t0 = time.time()
            kept = select_by_budget(scored, budget, "score", "w")
            agg = kept.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("w").alias("kw"),
                F.sum("doc_id").alias("idsum"),
            ).collect()[0]
            chk = (agg["n"], agg["kw"], agg["idsum"])
            reps.append(round(time.time() - t0, 1))
        emit(phase, {"secs": reps, "total_tokens": int(total), "budget": budget,
                     "kept": chk[0], "kept_tokens": chk[1], "idsum": chk[2]})

    else:
        raise SystemExit(f"unknown phase {phase!r}")

    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-9 sf100 probes (each phase its own process, per the sf100
methodology — JVM exit reclaims shuffle files):

  python scripts/probe_sf100_r9.py q9_ab        # persist_synced A/B on the Stetson session
  python scripts/probe_sf100_r9.py q3_ab        # persist_synced A/B on the SF2 session
  python scripts/probe_sf100_r9.py semdedup_lt  # least_typical survivor rule at 2M vectors
  python scripts/probe_sf100_r9.py skew         # hot-cell semantic_dedup + hot-bucket overlap join

Appends one JSON line per phase to $PROBE_OUT (default
/root/repo/.benchdata/probe_sf100_r9.jsonl).

The persist_synced A/B measures the SESSION shape the knob exists for —
sync once, then several actions over the synced state:

  q9 session: prune(5) -> object.count() (survivor inspection)
              -> batch(calc_stetson_J).count()
  q3 session: prune(5) -> sf2(basic).count()   (sf2 is internally
              multi-action: the bin-edge job precedes the main pass)

Without the knob every action's lineage replays the prune/sync
semi-join pass over the full source table (pure-JVM but tens of
seconds at sf100); with it the first action materializes the cache and
the rest read it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PROBE_SF_DIR", "/root/repo/.benchdata/sf100")
OUT = os.environ.get("PROBE_OUT", "/root/repo/.benchdata/probe_sf100_r9.jsonl")
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


def emit(phase: str, payload: dict):
    rec = {"phase": phase, "sf": 100.0, **payload}
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def _ens_bucketed(spark, persist_synced: bool):
    from tape_spark import ColumnMapper, Ensemble

    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="t",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    return Ensemble(spark, persist_synced=persist_synced).from_table(
        "lineitem_sf100_b", column_mapper=cm
    )


def main():
    phase = sys.argv[1]
    spark = session()

    if phase in ("q9_ab", "q3_ab"):
        from tape_spark.analysis import calc_stetson_J

        def q9_session(ens):
            # The session shape the knob targets: TWO actions consuming
            # the synced SOURCE (surviving-source inspection, then the
            # batch kernel). Baseline replays the prune/sync semi-join in
            # both lineages; persist_synced pays it once plus one cache
            # write. (An object-only count does NOT fire the sync — the
            # dirty table itself is never stale — so the first cut of
            # this probe accidentally measured a one-action session,
            # where the knob correctly loses: cache write, no reuse.)
            steps = {}
            t0 = time.time()
            ens.prune(threshold=5)
            n = ens.source.count()  # sync fires here; persists if enabled
            steps["prune_src_count"] = round(time.time() - t0, 1)
            t0 = time.time()
            ens.batch(calc_stetson_J).count()
            steps["batch"] = round(time.time() - t0, 1)
            steps["surviving_sources"] = n
            return steps

        def q3_session(ens):
            steps = {}
            t0 = time.time()
            ens.prune(threshold=5)
            steps["rows"] = ens.sf2(sf_method="basic").count()
            steps["sf2"] = round(time.time() - t0, 1)
            return steps

        run = q9_session if phase == "q9_ab" else q3_session
        res = {}
        for mode in (False, True):
            key = "persist_synced" if mode else "baseline"
            res[key] = []
            for _ in range(REPS):
                ens = _ens_bucketed(spark, persist_synced=mode)
                t0 = time.time()
                steps = run(ens)
                steps["total"] = round(time.time() - t0, 1)
                ens.unpersist(blocking=True)
                spark.catalog.clearCache()
                res[key].append(steps)
        emit(phase, {"reps": res})

    elif phase == "semdedup_lt":
        # least_typical survivor rule at 2M vectors (the r8 30.3 s number
        # is min_id; least_typical adds a per-group argmin over centroid
        # cosines) + the caller-centroids warehouse path.
        from tape_spark.operators import semantic_dedup, train_spherical_kmeans

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        out = {"vectors": n}
        t0 = time.time()
        cents = train_spherical_kmeans(
            emb, num_clusters=256, train_sample=8192, seed=11
        )
        out["train_sec"] = round(time.time() - t0, 1)
        for keep in ("min_id", "least_typical"):
            t0 = time.time()
            surv = (
                semantic_dedup(emb, threshold=0.95, centroids=cents, keep=keep)
                .filter("is_survivor")
                .count()
            )
            out[keep] = {"sec": round(time.time() - t0, 1), "survivors": surv}
        emit(phase, out)

    elif phase == "skew":
        # Adversarial single-hot-cell probes (round-8 verdict item 8).
        from pyspark.sql import functions as F

        from tape_spark.operators import interval_overlap_join, semantic_dedup

        out = {}
        # (a) semantic_dedup with one mega-cluster: all vectors near one
        # direction -> the coarse quantizer assigns ~everything to a
        # single cell; max_cluster_size must engage and bound the cost.
        n_vec = 2_000_000
        dim = 16
        base = spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                # deterministic tiny per-element jitter around one axis
                lambda i: F.when(i == 0, 1.0).otherwise(
                    F.sin(F.col("id") * (i + F.lit(17))) * 0.005
                ),
            ).alias("embedding"),
        )
        t0 = time.time()
        surv = (
            semantic_dedup(
                base,
                threshold=0.999999,
                num_clusters=64,
                train_sample=4096,
                max_cluster_size=100_000,
            )
            .filter("is_survivor")
            .count()
        )
        out["semdedup_hot_cluster"] = {
            "vectors": n_vec,
            "sec": round(time.time() - t0, 1),
            "survivors": surv,
        }
        # (b) interval_overlap_join with one 4h bucket holding ~10% of
        # spans: the hot (by, bucket) cell degrades to one fat join task.
        n_span = 5_000_000
        hot_frac = 0.10
        spans = (
            spark.range(n_span)
            .select(
                F.col("id").alias("sid"),
                F.when(
                    F.col("id") % int(1 / hot_frac) == 0, F.lit(0.0)
                )
                .otherwise((F.col("id") % 1_000_000).cast("double") * 100.0)
                .alias("s"),
            )
            .withColumn("e", F.col("s") + 50.0)
        )
        probes = spark.range(1000).select(
            F.col("id").alias("pid"),
            (F.col("id").cast("double") * 90_000.0).alias("ps"),
            (F.col("id").cast("double") * 90_000.0 + 14_400.0).alias("pe"),
        )
        t0 = time.time()
        cnt = interval_overlap_join(
            spans, probes, "s", "e", "ps", "pe", bucket_width=14_400.0
        ).count()
        out["overlap_hot_bucket"] = {
            "spans": n_span,
            "hot_frac": hot_frac,
            "pairs": cnt,
            "sec": round(time.time() - t0, 1),
        }
        emit(phase, out)

    elif phase == "nb":
        # NB quality classifier at 5M docs: bounded driver train + the
        # zero-shuffle Arrow scoring pass (same shape as perplexity_score).
        from pyspark.sql import functions as F

        from tape_spark.operators import nb_score, train_nb_classifier

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n = docs.count()
        t0 = time.time()
        model = train_nb_classifier(
            docs, label_expr="source <= 'src4'", sample_fraction=0.5,
            max_docs=500, min_count=2,
        )
        train_sec = round(time.time() - t0, 1)
        reps = []
        for _ in range(REPS):
            t0 = time.time()
            agg = nb_score(docs, model).agg(
                F.sum(F.col("nb_logodds")).alias("s"),
                F.sum(F.col("nb_label").cast("long")).alias("n_pos"),
            ).collect()[0]
            reps.append(round(time.time() - t0, 1))
        emit(phase, {
            "n_docs": n, "train_sec": train_sec, "vocab": model.vocab_size,
            "n_pos": agg["n_pos"], "secs": reps,
        })

    elif phase == "bloom":
        # decontaminate A/B at 5M docs: broadcast distinct-set vs bloom
        # bitmap + exact confirm. Every 23rd doc is the "benchmark" —
        # ~217k docs, a deliberately LARGE eval side where the broadcast
        # relation is heaviest and the bitmap's 1.25 bytes/key matters.
        from pyspark.sql import functions as F

        from tape_spark.operators import decontaminate

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        bench = docs.filter(F.col("doc_id") % 23 == 0)
        train = docs.filter(F.col("doc_id") % 23 != 0)
        out = {}
        for m in ("broadcast", "bloom"):
            reps = []
            contaminated = None
            for _ in range(REPS):
                t0 = time.time()
                agg = decontaminate(train, bench, n=3, method=m).agg(
                    F.sum(F.col("is_contaminated").cast("long")).alias("c"),
                    F.sum("n_ngrams").alias("g"),
                ).collect()[0]
                contaminated = (agg["c"], agg["g"])
                reps.append(round(time.time() - t0, 1))
            out[m] = {"secs": reps, "contaminated_docs": contaminated[0],
                      "total_ngrams": contaminated[1]}
        emit(phase, out)

    elif phase == "bloom_rare":
        # The regime the bitmap exists for: contamination is RARE (real
        # decontamination: a few eval suites vs a fresh crawl, ~0% of
        # corpus n-grams hit). The clone-heavy scale table is ~100%
        # contaminated, so the prefilter there passes everything and
        # bloom honestly loses (see the `bloom` phase). Here the
        # benchmark's tokens are rewritten (t -> t||'_q') so corpus hits
        # are ~0 and the prefilter's selectivity does its job.
        from pyspark.sql import functions as F

        from tape_spark.operators import decontaminate

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        bench = docs.filter(F.col("doc_id") % 23 == 0).select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
                    lambda t: F.concat(t, F.lit("_q")),
                ),
                " ",
            ).alias("text"),
        )
        train = docs.filter(F.col("doc_id") % 23 != 0)
        out = {}
        for m in ("broadcast", "bloom"):
            reps = []
            stats = None
            for _ in range(REPS):
                t0 = time.time()
                agg = decontaminate(train, bench, n=3, method=m).agg(
                    F.sum(F.col("is_contaminated").cast("long")).alias("c"),
                    F.sum("n_ngrams").alias("g"),
                ).collect()[0]
                stats = (agg["c"], agg["g"])
                reps.append(round(time.time() - t0, 1))
            out[m] = {"secs": reps, "contaminated_docs": stats[0],
                      "total_ngrams": stats[1]}
        emit(phase, out)

    elif phase == "split":
        # split_contaminated at 5M docs: the surgical GPT-3 appendix-C
        # path. Rewritten-benchmark (rare-hit) geometry — the realistic
        # regime, where almost every doc survives whole — plus the
        # clone-heavy worst case where nearly everything is hit.
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

    elif phase == "dsir":
        # DSIR importance resampling at 5M docs: two gram-count passes
        # (<=B-key shuffles), the broadcast ratio join + per-doc integer
        # sum, percentile probe, top-k rank over ~margin*k candidates.
        from pyspark.sql import functions as F

        from tape_spark.operators import dsir_select

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        target = docs.filter(F.col("doc_id") % 101 == 0)
        raw = docs.filter(F.col("doc_id") % 101 != 0)
        reps = []
        sel_stats = None
        for _ in range(REPS):
            t0 = time.time()
            sel = dsir_select(raw, target, k=100000, num_buckets=65536)
            agg = sel.agg(
                F.count(F.lit(1)).alias("n"),
                F.min("logw_units").alias("wmin"),
                F.max("logw_units").alias("wmax"),
            ).collect()[0]
            sel_stats = (agg["n"], agg["wmin"], agg["wmax"])
            reps.append(round(time.time() - t0, 1))
        emit(phase, {
            "n_raw": raw.count(), "k": 100000, "num_buckets": 65536,
            "secs": reps, "selected": sel_stats[0],
            "logw_units_range": [sel_stats[1], sel_stats[2]],
        })

    elif phase == "bm25":
        # bm25_topk at 5M docs: one corpus-stats aggregate (N, sumdl,
        # per-term df) + one candidate pass with map-side WindowGroupLimit
        # before the single top-k exchange. Queries drawn from the ranked
        # vocabulary exactly like the driver row.
        from pyspark.sql import functions as F

        from tape_spark.operators import bm25_topk, vocab_topk

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        vocab = {r["rank"]: r["word"]
                 for r in vocab_topk(docs, k=31).collect()}
        queries = [
            ("q1", vocab[7]),
            ("q2", vocab[3] + " " + vocab[18]),
            ("q3", vocab[12] + " " + vocab[24] + " " + vocab[30]),
        ]
        reps = []
        nrows = None
        for _ in range(REPS):
            t0 = time.time()
            res = bm25_topk(docs, queries, k=10)
            agg = res.agg(F.count(F.lit(1)).alias("n"),
                          F.sum("score_units").alias("u")).collect()[0]
            nrows = (agg["n"], agg["u"])
            reps.append(round(time.time() - t0, 1))
        emit(phase, {"n_docs": docs.count(), "queries": 3, "k": 10,
                     "secs": reps, "rows": nrows[0], "sum_units": nrows[1]})

    elif phase == "hybrid":
        # the full driver-row retrieval chain at sf100: vocab ranks ->
        # 3 BM25 queries over 5M docs -> top-1 seeds pull their
        # embeddings -> dense cosine top-5 over 2M vectors -> integer
        # RRF fusion. End-to-end wall time for the whole hybrid stack.
        from pyspark.sql import functions as F

        from tape_spark.operators import bm25_topk, cosine_topk, rrf_fuse, vocab_topk

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(64)
        reps = []
        stats = None
        for _ in range(REPS):
            t0 = time.time()
            vocab = {r["rank"]: r["word"] for r in vocab_topk(docs, k=31).collect()}
            queries = [
                ("q1", vocab[7]),
                ("q2", vocab[3] + " " + vocab[18]),
                ("q3", vocab[12] + " " + vocab[24] + " " + vocab[30]),
            ]
            hits = bm25_topk(docs, queries, k=5)
            top1 = {r["query_id"]: r["doc_id"]
                    for r in hits.filter(F.col("rank") == 1).collect()}
            seeds = {r["vec_id"]: r["embedding"]
                     for r in emb.filter(F.col("vec_id").isin(list(top1.values()))).collect()}
            qvecs = [(q, seeds[d]) for q, d in sorted(top1.items()) if d in seeds]
            lists = [hits.select("query_id", "doc_id", "rank")]
            if qvecs:
                qdf = spark.createDataFrame(qvecs, "query_id string, embedding array<float>")
                lists.append(cosine_topk(emb, qdf, k=5).select(
                    "query_id", F.col("corpus_id").alias("doc_id"), "rank"))
            fused = rrf_fuse(lists, k=5)
            agg = fused.agg(F.count(F.lit(1)).alias("n"),
                            F.sum("rrf_units").alias("u")).collect()[0]
            stats = (agg["n"], agg["u"], len(qvecs))
            reps.append(round(time.time() - t0, 1))
        emit(phase, {"n_docs": 5000000, "n_vectors": 2000000,
                     "secs": reps, "fused_rows": stats[0],
                     "sum_units": stats[1], "dense_queries": stats[2]})

    elif phase == "bm25_hot":
        # adversarial: the rank-1 corpus token as the query — EVERY doc
        # is a candidate, so the top-k window's input is the full corpus.
        # The map-side WindowGroupLimit must bound the exchange to
        # k rows per partition, keeping the hot query within a small
        # factor of the selective ones.
        from pyspark.sql import functions as F

        from tape_spark.operators import bm25_topk, vocab_topk

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
        vocab = {r["rank"]: r["word"] for r in vocab_topk(docs, k=2).collect()}
        reps = []
        stats = None
        for _ in range(REPS):
            t0 = time.time()
            res = bm25_topk(docs, [("hot", vocab[1])], k=10)
            agg = res.agg(F.count(F.lit(1)).alias("n"),
                          F.sum("score_units").alias("u")).collect()[0]
            stats = (agg["n"], agg["u"])
            reps.append(round(time.time() - t0, 1))
        emit(phase, {"hot_term": vocab[1], "secs": reps,
                     "rows": stats[0], "sum_units": stats[1]})

    elif phase == "pq":
        # Product quantization at 2M x 64-dim vectors: codebook train
        # (bounded sample), full-corpus encode (256B float32 -> 8B codes,
        # one Arrow pass), ADC scan for 64 queries with and without the
        # exact rerank, plus recall vs the brute reference.
        from pyspark.sql import functions as F

        from tape_spark.operators import (
            cosine_topk,
            pq_cosine_topk,
            pq_encode,
            train_pq_codebooks,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(64)
        q = emb.filter(F.col("vec_id") < 64).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        t0 = time.time()
        books = train_pq_codebooks(emb, m=8, num_centroids=256)
        train_sec = round(time.time() - t0, 1)
        t0 = time.time()
        n_codes = pq_encode(emb, books).count()
        encode_sec = round(time.time() - t0, 1)
        brute = {(r["query_id"], r["corpus_id"])
                 for r in cosine_topk(emb, q, k=10).collect()}
        out = {}
        for name, rf in (("adc_only", 0), ("adc_rerank8", 8)):
            reps = []
            hits = None
            for _ in range(REPS):
                t0 = time.time()
                rows = pq_cosine_topk(
                    emb, q, k=10, codebooks=books, rerank_factor=rf
                ).collect()
                reps.append(round(time.time() - t0, 1))
                hits = {(r["query_id"], r["corpus_id"]) for r in rows}
            out[name] = {"secs": reps,
                         "recall": round(len(hits & brute) / len(brute), 3)}
        emit(phase, {"n_vectors": n_codes, "n_queries": 64,
                     "train_sec": train_sec, "encode_sec": encode_sec,
                     "bytes_per_vec": {"raw_f32": 256, "pq": 8}, **out})

    elif phase == "resample":
        # resample_timeseries over the bucketed 600M-row lineitem: every
        # 1000th object's band-R curve onto a 30-day grid (the slice keeps
        # the grid ~10M rows; the full-corpus variant is a grid-size
        # decision, not an operator limit). Scan + filter + MIN dedup +
        # span agg + two as-of joins + codegen interpolation.
        from pyspark.sql import functions as F

        from tape_spark.operators import resample_timeseries

        li = spark.table("lineitem_sf100_b").filter(
            (F.col("l_orderkey") % 1000 == 1) & (F.col("l_returnflag") == "R")
        )
        reps = []
        stats = None
        for _ in range(REPS):
            t0 = time.time()
            rs = resample_timeseries(
                li, on="t", value_col="l_extendedprice",
                step=2592000.0, by="l_orderkey",
            )
            agg = rs.agg(
                F.count(F.lit(1)).alias("grid"),
                F.sum(F.col("l_extendedprice").isNotNull().cast("long")).alias("interp"),
                F.countDistinct("l_orderkey").alias("objs"),
            ).collect()[0]
            stats = (agg["grid"], agg["interp"], agg["objs"])
            reps.append(round(time.time() - t0, 1))
        emit(phase, {"secs": reps, "grid_rows": stats[0],
                     "interpolated": stats[1], "objects": stats[2],
                     "step_days": 30})

    elif phase == "cbs":
        # cluster_balanced_sample at 2M vectors: one Arrow assignment
        # pass + the exact-k sampler's two tiny aggregates + narrow
        # filter + small window. k=100k over 64 clusters.
        from pyspark.sql import functions as F

        from tape_spark.operators import cluster_balanced_sample, train_spherical_kmeans

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(64)
        t0 = time.time()
        books = train_spherical_kmeans(emb, num_clusters=64)
        train_sec = round(time.time() - t0, 1)
        reps = []
        stats = None
        for _ in range(REPS):
            t0 = time.time()
            sel = cluster_balanced_sample(emb, k=100000, centroids=books)
            agg = sel.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).agg(
                F.count(F.lit(1)).alias("clusters"),
                F.sum("n").alias("total"),
                F.min("n").alias("min_q"),
                F.max("n").alias("max_q"),
            ).collect()[0]
            stats = (agg["clusters"], agg["total"], agg["min_q"], agg["max_q"])
            reps.append(round(time.time() - t0, 1))
        emit(phase, {"n_vectors": emb.count(), "k": 100000,
                     "train_sec": train_sec, "secs": reps,
                     "clusters": stats[0], "total": stats[1],
                     "quota_range": [stats[2], stats[3]]})

    elif phase == "ivfpq":
        # the composed IVF+PQ index at 2M vectors: scan cost should be
        # ~nprobe/num_clusters of the full-PQ scan.
        from pyspark.sql import functions as F

        from tape_spark.operators import (
            cosine_topk,
            ivfpq_cosine_topk,
            train_pq_codebooks,
            train_spherical_kmeans,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(64)
        q = emb.filter(F.col("vec_id") < 64).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        t0 = time.time()
        coarse = train_spherical_kmeans(emb, num_clusters=64)
        books = train_pq_codebooks(emb, m=8, num_centroids=256)
        train_sec = round(time.time() - t0, 1)
        brute = {(r["query_id"], r["corpus_id"])
                 for r in cosine_topk(emb, q, k=10).collect()}
        reps = []
        rec = None
        for _ in range(REPS):
            t0 = time.time()
            rows = ivfpq_cosine_topk(
                emb, q, k=10, coarse_centroids=coarse, codebooks=books,
                nprobe=8, rerank_factor=8,
            ).collect()
            reps.append(round(time.time() - t0, 1))
            hits = {(r["query_id"], r["corpus_id"]) for r in rows}
            rec = round(len(hits & brute) / len(brute), 3)
        emit(phase, {"n_vectors": 2000000, "n_queries": 64,
                     "num_clusters": 64, "nprobe": 8,
                     "train_sec": train_sec, "secs": reps, "recall": rec})

    elif phase == "knn":
        # knn_classify at 2M corpus vectors x 64 queries: the vote adds
        # two tiny aggregations on top of cosine_topk's one BLAS pass.
        from pyspark.sql import functions as F

        from tape_spark.operators import cosine_topk, knn_classify

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(64)
        q = emb.filter(F.col("vec_id") < 64).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = {}
        for name, fn in (
            ("topk_only", lambda: cosine_topk(emb, q, k=10).count()),
            ("knn_classify", lambda: knn_classify(
                emb, q, k=10, exclude_self=True
            ).agg(F.sum("votes").alias("v"), F.count(F.lit(1)).alias("n"))
             .collect()[0]["n"]),
        ):
            reps = []
            res = None
            for _ in range(REPS):
                t0 = time.time()
                res = fn()
                reps.append(round(time.time() - t0, 1))
            out[name] = {"secs": reps, "rows": res}
        emit(phase, {"n_vectors": emb.count(), "n_queries": 64, **out})

    else:
        raise SystemExit(f"unknown phase {phase!r}")

    spark.stop()


if __name__ == "__main__":
    main()

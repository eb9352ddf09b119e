"""Product quantization (PQ) for embedding search at 100 TB scale.

No reference counterpart — this extends the ANN family in
``similarity.py`` (brute / IVF / LSH) with the memory-compressed path:
a 64-dim float32 embedding (256 B) compresses to ``m`` one-byte codes
(8 B at m=8), so a corpus whose raw vectors would spill out of executor
memory scans as a narrow binary column instead (Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search").

Scale shape:
- **Train** driver-side on a bounded deterministic sample (same
  xxhash64-ordered draw as the IVF coarse quantizer): one independent
  euclidean k-means per subspace.
- **Encode** is one narrow Arrow pass (``mapInPandas``): per batch, one
  BLAS distance matrix per subspace, argmin → byte codes. No shuffle.
- **Search** (asymmetric distance computation): the query builds an
  ``m × k`` lookup table; scanning a batch is ``m`` vectorized gathers
  and an add — no BLAS against the corpus, no decompression. Local
  top-k per batch, global resolve over the tiny union of local winners
  (the same O(k·|queries|) per-executor output contract as
  ``cosine_topk``).
- **Rerank** (optional, the standard ADC+rerank pipeline): the PQ
  shortlist (``rerank_factor × k`` ids per query) joins back to the
  corpus for exact JVM-side cosines — the join's left side is tiny by
  construction, so Spark broadcasts it.

Vectors are L2-normalized before subspace split (spherical convention
shared with the rest of the ANN family), so the ADC score approximates
the cosine. NULL embeddings are excluded from encoding (they are not
searchable); zero vectors score 0 everywhere instead of NaN.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    num_centroids: int = 256,
    train_sample: int = 8192,
    kmeans_iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Train ``m`` independent euclidean k-means codebooks, one per
    subspace, on a bounded deterministic corpus sample (xxhash64-ordered
    draw — reproducible and decorrelated from storage order, planned as
    a per-partition heap). Returns ``(m, k_eff, dim/m)`` float64; k_eff
    is capped by the sample size so a tiny corpus still trains.
    """
    if m < 1:
        raise ValueError("m must be >= 1")
    if num_centroids < 1 or num_centroids > 256:
        raise ValueError("num_centroids must be in [1, 256] (one byte per code)")
    rows = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__h"), F.col(id_col))
        .orderBy("__h", id_col)
        .limit(train_sample)
        .select(vec_col)
        .collect()
    )
    sample = np.array([r[0] for r in rows], dtype=np.float64)
    if sample.size == 0:
        return np.zeros((0, 0, 0))
    dim = sample.shape[1]
    if dim % m != 0:
        raise ValueError(f"m={m} must divide the embedding dim {dim}")
    dsub = dim // m
    sample = _normalize(sample)
    rng = np.random.default_rng(seed)
    k_eff = min(num_centroids, len(sample))
    books = np.zeros((m, k_eff, dsub))
    for s in range(m):
        sub = sample[:, s * dsub : (s + 1) * dsub]
        cents = sub[rng.choice(len(sub), k_eff, replace=False)]
        for _ in range(kmeans_iters):
            # argmin ||x-c||^2 == argmax (x·c - ||c||^2/2)
            assign = (sub @ cents.T - 0.5 * (cents**2).sum(axis=1)).argmax(axis=1)
            for c in range(k_eff):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every non-NULL vector to ``m`` byte codes (one narrow Arrow
    pass, zero shuffle). Returns ``(id_col, pq_code binary)`` —
    ``length(pq_code) == m``.
    """
    books = np.asarray(codebooks, dtype=np.float64)
    if books.ndim != 3 or books.size == 0:
        raise ValueError("codebooks must be a non-empty (m, k, dsub) array")
    if books.shape[1] > 256:
        raise ValueError(
            f"codebooks have {books.shape[1]} centroids per subspace; the "
            "one-byte code format holds at most 256 (caller-provided "
            "codebooks would otherwise overflow uint8 silently)"
        )
    m, _, dsub = books.shape
    # per-subspace squared-norm halves, precomputed once for the argmin
    half_sq = 0.5 * (books**2).sum(axis=2)  # (m, k)
    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [T.StructField(id_col, id_type), T.StructField("pq_code", T.BinaryType())]
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            codes = np.empty((len(pdf), m), dtype=np.uint8)
            for s in range(m):
                sub = mat[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = (sub @ books[s].T - half_sq[s]).argmax(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "pq_code": [c.tobytes() for c in codes]}
            )

    src = corpus.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col)
    return src.mapInPandas(encode, out_schema)


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codebooks: Optional[np.ndarray] = None,
    m: int = 8,
    num_centroids: int = 256,
    train_sample: int = 8192,
    kmeans_iters: int = 10,
    seed: int = 11,
    rerank_factor: int = 0,
) -> DataFrame:
    """Approximate cosine top-k via PQ asymmetric distance computation.

    With ``rerank_factor > 0`` the PQ scan produces a
    ``rerank_factor × k`` shortlist per query which is re-scored with
    EXACT cosines JVM-side (the shortlist side is tiny, so the join back
    to the corpus broadcasts) — the standard ADC+rerank pipeline: PQ
    bounds the scan cost, exact math fixes the final order.

    Returns ``(query_id, corpus_id, score, rank)``; ``score`` is the ADC
    approximation (or the exact cosine after reranking). Ties break on
    corpus id. Pass caller-owned ``codebooks`` (from
    :func:`train_pq_codebooks`) to amortize training across sessions —
    the warehouse pattern shared with ``semantic_dedup(centroids=…)``.
    """
    if rerank_factor < 0:
        raise ValueError("rerank_factor must be >= 0")
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus,
            vec_col=vec_col,
            id_col=id_col,
            m=m,
            num_centroids=num_centroids,
            train_sample=train_sample,
            kmeans_iters=kmeans_iters,
            seed=seed,
        )
    books = np.asarray(codebooks, dtype=np.float64)
    q_rows = queries.select(query_id_col, vec_col).collect()
    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id_col].dataType),
            T.StructField("corpus_id", corpus.schema[id_col].dataType),
            T.StructField("score", T.DoubleType()),
        ]
    )
    spark = corpus.sparkSession
    if not q_rows or books.size == 0:
        return (
            spark.createDataFrame([], out_schema)
            .withColumn("rank", F.lit(1).cast("long"))
            .limit(0)
        )
    m_eff, _, dsub = books.shape
    q_ids = [r[0] for r in q_rows]
    q_mat = _normalize(np.array([r[1] for r in q_rows], dtype=np.float64))
    # per-query ADC lookup tables: (nq, m, k) — built once on the driver
    luts = np.stack(
        [q_mat[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(m_eff)],
        axis=1,
    )
    n_short = k * rerank_factor if rerank_factor else k

    codes_df = pq_encode(corpus, books, vec_col=vec_col, id_col=id_col)

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["pq_code"]), dtype=np.uint8
            ).reshape(len(pdf), m_eff)
            scores = np.zeros((len(q_ids), len(pdf)))
            for s in range(m_eff):
                scores += luts[:, s, :][:, codes[:, s]]
            ids = pdf[id_col].to_numpy()
            take = min(n_short, len(pdf))
            for qi, qid in enumerate(q_ids):
                # local top-n_short by (score desc, id asc)
                order = np.lexsort((ids, -scores[qi]))[:take]
                yield pd.DataFrame(
                    {
                        "query_id": [qid] * take,
                        "corpus_id": ids[order],
                        "score": scores[qi][order],
                    }
                )

    local = codes_df.mapInPandas(scan, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    short = (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n_short)
    )
    if not rerank_factor:
        return short.filter(F.col("rank") <= k)

    # exact rerank: fetch the shortlist's true vectors (broadcast the tiny
    # shortlist into the corpus scan) and re-score with JVM-side cosine
    qlit = F.map_from_arrays(
        F.array(*[F.lit(q) for q in q_ids]),
        F.array(
            *[
                F.array(*[F.lit(float(x)) for x in q_mat[i]])
                for i in range(len(q_ids))
            ]
        ),
    )
    vecs = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("__v")
    )
    joined = (
        F.broadcast(short.select("query_id", "corpus_id"))
        .join(vecs, "corpus_id")
        .withColumn("__q", qlit[F.col("query_id")])
    )
    dot = F.aggregate(
        F.zip_with("__v", "__q", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("__v", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    exact = joined.select(
        "query_id",
        "corpus_id",
        (dot / F.greatest(norm, F.lit(1e-300))).alias("score"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
    )


_SIZE_UNITS = {
    "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40,
}


def _parse_size_bytes(v: str) -> int:
    """Parse a Spark size conf value ('10485760', '10MB', '1g', '-1')."""
    s = str(v).strip().lower()
    for suffix in sorted(_SIZE_UNITS, key=len, reverse=True):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * _SIZE_UNITS[suffix])
    return int(float(s))


def _rerank_broadcast_cutoff_bytes(spark) -> int:
    """Config-aware cutoff for the rerank covered-slice broadcast.

    Priority: an explicit ``spark.tape.rerank.broadcastCutoffBytes``
    wins; else if the session has DISABLED auto broadcasts
    (``spark.sql.autoBroadcastJoinThreshold`` <= 0) the hint is never
    applied (return 0 — the admin said this cluster cannot hold
    broadcast tables, a signal a hardcoded constant ignored); else the
    cutoff is ~15% of the configured executor (or, in local mode,
    driver) heap, floored at the session threshold and capped at the
    512 MB bound measured safe on this host class."""
    explicit = spark.conf.get("spark.tape.rerank.broadcastCutoffBytes", None)
    if explicit is not None:
        return _parse_size_bytes(explicit)
    thr = _parse_size_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    if thr <= 0:
        return 0
    mem_conf = spark.conf.get("spark.executor.memory", None)
    if mem_conf is None:
        mem_conf = spark.conf.get("spark.driver.memory", "1g")
    heap = _parse_size_bytes(mem_conf)
    return min(512 * 1024 * 1024, max(thr, int(heap * 0.15)))


def ivfpq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_clusters: int = 64,
    nprobe: int = 8,
    coarse_centroids: Optional[np.ndarray] = None,
    codebooks: Optional[np.ndarray] = None,
    m: int = 8,
    num_centroids: int = 256,
    train_sample: int = 8192,
    kmeans_iters: int = 10,
    seed: int = 11,
    rerank_factor: int = 0,
    encoded: Optional[DataFrame] = None,
) -> DataFrame:
    """IVF + PQ — the textbook composition (FAISS's IVFADC): a coarse
    spherical k-means quantizer routes each query to its ``nprobe``
    nearest clusters, and only THOSE clusters' one-byte PQ codes are
    ADC-scored. Relative to :func:`pq_cosine_topk` the scan touches
    ``~nprobe / num_clusters`` of the corpus; relative to
    ``ivf_cosine_topk`` the probed partitions hold 8-byte codes instead
    of raw vectors.

    One narrow Arrow pass encodes (cluster, code) per corpus vector; the
    query→cluster probe list is a driver-side matmul over the collected
    (small) query matrix; candidate selection is ONE equi-join on the
    cluster id; scoring is the same lookup-table gather as
    ``pq_cosine_topk``; ``rerank_factor > 0`` re-scores the shortlist
    with exact JVM-side cosines. Pass caller-owned ``coarse_centroids``
    / ``codebooks`` to amortize training, and ``encoded`` (an
    :func:`ivfpq_encode` output, typically read back via
    :func:`ivfpq_load_index`) to skip the per-call corpus encode
    entirely — the full warehouse pattern: train once, encode once,
    query forever. The probed-cluster set is applied as a literal
    IN-filter, so a cluster-partitioned saved index reads only the
    probed partitions. ``rerank_factor > 0`` still reads raw vectors
    from ``corpus`` for the exact re-score.

    Returns ``(query_id, corpus_id, score, rank)``; ties break on
    corpus id. Like the other seeded indexes, results are fully
    deterministic for a fixed corpus.
    """
    from .similarity import train_spherical_kmeans

    if rerank_factor < 0:
        raise ValueError("rerank_factor must be >= 0")
    if nprobe < 1:
        raise ValueError("nprobe must be >= 1")
    if encoded is not None and (coarse_centroids is None or codebooks is None):
        # auto-training here would produce models that DIFFER from the ones
        # the corpus was encoded with — silent wrong answers, so refuse
        raise ValueError(
            "encoded= requires the coarse_centroids and codebooks the "
            "corpus was encoded with (use ivfpq_load_index)"
        )
    if coarse_centroids is None:
        coarse_centroids = train_spherical_kmeans(
            corpus, vec_col, id_col, num_clusters, train_sample, kmeans_iters, seed
        )
    coarse = np.asarray(coarse_centroids, dtype=np.float64)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus,
            vec_col=vec_col,
            id_col=id_col,
            m=m,
            num_centroids=num_centroids,
            train_sample=train_sample,
            kmeans_iters=kmeans_iters,
            seed=seed,
        )
    books = np.asarray(codebooks, dtype=np.float64)
    q_rows = queries.select(query_id_col, vec_col).collect()
    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id_col].dataType),
            T.StructField("corpus_id", corpus.schema[id_col].dataType),
            T.StructField("score", T.DoubleType()),
        ]
    )
    spark = corpus.sparkSession
    if not q_rows or books.size == 0 or coarse.size == 0:
        return (
            spark.createDataFrame([], out_schema)
            .withColumn("rank", F.lit(1).cast("long"))
            .limit(0)
        )
    m_eff, k_codes, dsub = books.shape
    if k_codes > 256:
        raise ValueError("codebooks have more than 256 centroids per subspace")
    if encoded is not None:
        # caller-owned encoded corpus: the models MUST be the ones it was
        # encoded with — they are, when all three come from
        # ivfpq_load_index. One O(1) first-row probe catches a mismatched
        # code width (the silent-wrong-answer failure mode).
        probe_row = encoded.select(F.octet_length("pq_code").alias("w")).first()
        if probe_row is not None and int(probe_row["w"]) != m_eff:
            raise ValueError(
                f"encoded pq_code width {int(probe_row['w'])} != codebooks "
                f"m={m_eff}; pass the models the index was built with"
            )
    q_ids = [r[0] for r in q_rows]
    q_mat = _normalize(np.array([r[1] for r in q_rows], dtype=np.float64))
    luts = np.stack(
        [q_mat[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(m_eff)],
        axis=1,
    )
    # driver-side probe lists: nprobe nearest coarse cells per query
    sims = q_mat @ coarse.T
    n_probe_eff = min(nprobe, coarse.shape[0])
    probe = np.argsort(-sims, axis=1)[:, :n_probe_eff]
    n_short = k * rerank_factor if rerank_factor else k
    qi_by_id = {qid: i for i, qid in enumerate(q_ids)}

    if encoded is not None:
        enc = encoded.select(F.col(id_col), "cluster", "pq_code")
    else:
        # ONE encoder (ivfpq_encode) serves the per-call path, the saved
        # index, and the append path — a second inline copy here could
        # drift from the persisted encoding and break encoded= parity in
        # a way the pq_code width probe cannot catch
        enc = ivfpq_encode(
            corpus, coarse, books, vec_col=vec_col, id_col=id_col
        )
    # STATIC cluster pruning: the probe lists are driver-side, so the
    # probed-cluster set is a literal IN-filter — on a saved index
    # (ivfpq_save_index partitions by cluster) this prunes at the parquet
    # scan, reading only nprobe*|queries| of num_clusters partitions
    probed_clusters = sorted({int(c) for qi in range(len(q_ids)) for c in probe[qi]})
    enc = enc.filter(F.col("cluster").isin(probed_clusters))
    # (query, probed cluster) pairs — tiny; the equi-join prunes the scan
    pairs = spark.createDataFrame(
        [(q_ids[qi], int(c)) for qi in range(len(q_ids)) for c in probe[qi]],
        T.StructType(
            [
                T.StructField("query_id", queries.schema[query_id_col].dataType),
                T.StructField("cluster", T.IntegerType()),
            ]
        ),
    )
    cand = enc.join(F.broadcast(pairs), "cluster").select(
        "query_id", F.col(id_col).alias("corpus_id"), "pq_code"
    )

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["pq_code"]), dtype=np.uint8
            ).reshape(len(pdf), m_eff)
            qidx = pdf["query_id"].map(qi_by_id).to_numpy()
            scores = np.zeros(len(pdf))
            for s in range(m_eff):
                scores += luts[qidx, s, codes[:, s]]
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "corpus_id": pdf["corpus_id"],
                    "score": scores,
                }
            )
            # local top-n_short per query inside the batch
            out = out.sort_values(
                ["query_id", "score", "corpus_id"],
                ascending=[True, False, True],
            ).groupby("query_id", sort=False).head(n_short)
            yield out

    local = cand.mapInPandas(scan, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    short = (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n_short)
    )
    if not rerank_factor:
        return short.filter(F.col("rank") <= k)
    qlit = F.map_from_arrays(
        F.array(*[F.lit(q) for q in q_ids]),
        F.array(
            *[
                F.array(*[F.lit(float(x)) for x in q_mat[i]])
                for i in range(len(q_ids))
            ]
        ),
    )
    vecs = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("__v")
    )
    # LEFT join + raise on a missing raw vector: with encoded= the
    # shortlist can hold ids the caller's corpus frame does not cover
    # (e.g. ivfpq_append_index grew the index but the caller passed only
    # the base corpus) — an inner join would silently drop those
    # candidates from the top-k. The guard is fused into the score
    # expression (no extra job) and fails the query naming the id.
    #
    # Join shape matters: a LeftOuter broadcast-hash join can only BUILD
    # the right side, so hinting broadcast on the (left) shortlist is
    # ignored and Spark falls back to shuffling the ENTIRE raw-vector
    # corpus per query batch. Instead the corpus is first semi-joined
    # down to the shortlist's ids (broadcast build = the tiny id set,
    # corpus stays a pure scan), and that ≤|shortlist| slice is the
    # BROADCAST RIGHT side of the outer join — both joins exchange-free
    # on the corpus. The shortlist backs two plan legs (the semi-probe
    # build and the outer-join stream side) and is bounded at
    # |queries| × n_short rows, so it is materialized DRIVER-SIDE into a
    # local relation: both legs read the local rows, nothing upstream
    # recomputes, and no executor cache outlives the call (a persist
    # here leaked one cached frame per rerank query for the session).
    # The collect is GUARDED by a row bound (|queries| × n_short is known
    # before running anything): past it, the shortlist is materialized
    # EXECUTOR-SIDE via an eager localCheckpoint instead — lineage is
    # truncated (neither leg recomputes the ADC scan) and the blocks are
    # reclaimed by the ContextCleaner when the frame is unreferenced, so
    # the r12 leak does not return with the fallback.
    collect_limit = int(
        spark.conf.get("spark.tape.rerank.collectRowLimit", "500000")
    )
    n_short_rows_bound = len(q_ids) * n_short
    if n_short_rows_bound <= collect_limit:
        short_schema = short.schema
        short_rows = short.collect()
        short = spark.createDataFrame(short_rows, short_schema)
        n_distinct_short_ids = len({r["corpus_id"] for r in short_rows})
    else:
        short = short.localCheckpoint(eager=True)
        n_distinct_short_ids = n_short_rows_bound  # conservative bound
    covered = vecs.join(
        F.broadcast(short.select("corpus_id").distinct()), "corpus_id", "left_semi"
    )
    # The covered slice broadcast is bounded by distinct shortlist ids ×
    # the vector width: ≤ |queries| × n_short × dim × 8 B (plus overhead).
    # For wide embeddings and large query batches that bound can exceed
    # executor memory / Spark's 8 GB broadcast cap where a shuffle join
    # would (slowly) complete — so past the cutoff the hint is dropped
    # and the ≤|shortlist|-row outer join falls back to a shuffle of two
    # small-by-contract sides. The cutoff is CONFIG-AWARE, not a bare
    # constant: see _rerank_broadcast_cutoff_bytes.
    dim = q_mat.shape[1]
    est_broadcast_bytes = n_distinct_short_ids * dim * 8
    if est_broadcast_bytes <= _rerank_broadcast_cutoff_bytes(spark):
        covered = F.broadcast(covered)
    joined = (
        short.select("query_id", "corpus_id")
        .join(covered, "corpus_id", "left")
        .withColumn("__q", qlit[F.col("query_id")])
    )
    dot = F.aggregate(
        F.zip_with("__v", "__q", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("__v", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    exact = joined.select(
        "query_id",
        "corpus_id",
        F.when(
            F.col("__v").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "ivfpq rerank: corpus frame has no raw vector for "
                        "encoded id "
                    ),
                    F.col("corpus_id").cast("string"),
                    F.lit(
                        " — with rerank_factor>0 the corpus must cover every "
                        "encoded id (pass the base+appended union)"
                    ),
                )
            ).cast("double"),
        )
        .otherwise(dot / F.greatest(norm, F.lit(1e-300)))
        .alias("score"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivfpq_encode(
    corpus: DataFrame,
    coarse_centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode a corpus against trained IVFPQ models: one narrow Arrow
    pass emitting ``(id, cluster int, pq_code binary)`` — the table a
    warehouse persists so queries never touch raw vectors. Feed the
    result (or :func:`ivfpq_load_index`'s read-back) to
    :func:`ivfpq_cosine_topk` via ``encoded=``."""
    coarse = np.asarray(coarse_centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    if coarse.size == 0 or books.size == 0:
        raise ValueError("coarse_centroids and codebooks must be non-empty")
    m_eff, _, dsub = books.shape
    half_sq = 0.5 * (books**2).sum(axis=2)
    coarse_T = coarse.T.copy()
    enc_schema = T.StructType(
        [
            T.StructField(id_col, corpus.schema[id_col].dataType),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("pq_code", T.BinaryType()),
        ]
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            cl = (mat @ coarse_T).argmax(axis=1).astype(np.int32)
            codes = np.empty((len(pdf), m_eff), dtype=np.uint8)
            for s in range(m_eff):
                sub = mat[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = (sub @ books[s].T - half_sq[s]).argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": cl,
                    "pq_code": [c.tobytes() for c in codes],
                }
            )

    return (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .mapInPandas(encode, enc_schema)
    )


def ivfpq_save_index(
    encoded: DataFrame,
    coarse_centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
) -> None:
    """Persist an IVFPQ index: the encoded table PARTITIONED BY
    ``cluster`` (so a query's nprobe cells partition-prune at the scan)
    plus the two numpy models as a one-row parquet of raw bytes +
    shapes (self-describing — :func:`ivfpq_load_index` needs no side
    channel)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..utils.io import write_partitioned_single_file

    write_partitioned_single_file(encoded, "cluster", None, f"{path}/encoded",
                                  "overwrite")
    coarse = np.ascontiguousarray(np.asarray(coarse_centroids, dtype=np.float64))
    books = np.ascontiguousarray(np.asarray(codebooks, dtype=np.float64))
    pq.write_table(
        pa.table(
            {
                "coarse": [coarse.tobytes()],
                "coarse_shape": [list(coarse.shape)],
                "books": [books.tobytes()],
                "books_shape": [list(books.shape)],
            }
        ),
        f"{path}/models.parquet",
    )


def ivfpq_load_index(spark, path: str):
    """Read back ``(encoded, coarse_centroids, codebooks)`` as saved by
    :func:`ivfpq_save_index`."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{path}/models.parquet").to_pylist()[0]
    coarse = np.frombuffer(t["coarse"], dtype=np.float64).reshape(t["coarse_shape"])
    books = np.frombuffer(t["books"], dtype=np.float64).reshape(t["books_shape"])
    return spark.read.parquet(f"{path}/encoded"), coarse, books


def ivfpq_append_index(
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Grow a saved IVFPQ index with new vectors — one append, trivially
    consistent: ADC scores depend only on the (frozen) models, never on
    corpus statistics, so encoding the batch with the STORED models and
    appending its (id, cluster, pq_code) rows makes queries against the
    grown index bit-identical to a rebuild over the union corpus.
    Caller contract: new ids only (a re-appended vector appears twice in
    every shortlist it reaches). Quantization drift is the one caveat —
    models trained on an old distribution encode new out-of-distribution
    vectors with higher error; retrain + rebuild when recall on fresh
    data degrades."""
    spark = new_vectors.sparkSession
    _, coarse, books = ivfpq_load_index(spark, path)
    from ..utils.io import write_partitioned_single_file

    write_partitioned_single_file(
        ivfpq_encode(new_vectors, coarse, books, vec_col=vec_col, id_col=id_col),
        "cluster", None, f"{path}/encoded", "append",
    )


def ivfpq_compact_index(spark, path: str) -> dict:
    """Compact a saved IVFPQ index after appends: N ``ivfpq_append_index``
    calls leave N files per touched cluster partition; a probed query
    then opens N footers per probed cluster. Rewrites the encoded table
    as ONE file per cluster (sorted by id within). ADC scores depend
    only on the frozen models and the (id, cluster, pq_code) rows —
    unchanged by the rewrite — so queries are bit-identical (asserted in
    tests). Returns ``{"encoded_files_before": n}``."""
    from ..utils.io import compact_partitioned_parquet

    id_cols = [
        c
        for c in spark.read.parquet(f"{path}/encoded").columns
        if c not in ("cluster", "pq_code")
    ]
    n = compact_partitioned_parquet(
        spark, f"{path}/encoded", "cluster", sort_cols=id_cols[:1]
    )
    return {"encoded_files_before": n}

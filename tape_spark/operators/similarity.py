"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (and the oracle target);
random-hyperplane LSH bucketing is the scale path — at 100 TB the
broadcast-join + per-bucket ranking keeps cost proportional to bucket
occupancy instead of |corpus| × |queries|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# Vector arithmetic. The PER-PAIR cosine after a join is unrolled to
# scalar codegen when the embedding dim is known (HOF lambdas are
# interpreted per element — see utils/vector.py and the q4-sf100
# decomposition in docs/SCALING.md). PER-ROW prep (cast, norm, bucket
# bits) deliberately stays in HOF form: those expressions feed many
# consumers BEFORE any exchange, and the optimizer's projection collapse
# inlines an unrolled CreateArray into every consumer — measured 22 s of
# planning + a driver-memory blowup on the LSH path. After the join the
# vectors are concrete exchange attributes, so the unrolled dot is pure
# win exactly where the quadratic work happens.
from ..utils import vector as _vec


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b, dim=None):
    return _vec.dot(a, b, dim) if dim else _vec.hof_dot(a, b)


def _norm(col):
    # zero-norm guard: an all-zero vector scores cosine 0 everywhere
    # instead of NaN (Spark sorts NaN above every double, so an unguarded
    # zero vector would take rank 1 in every bucket it lands in)
    return F.greatest(
        F.sqrt(_vec.hof_sq_norm(col)),
        F.lit(1e-300),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the ``k``
    most-similar corpus vectors.

    Plan: collect the (small) query matrix to a numpy array shipped in the
    UDF closure, stream corpus partitions through ``mapInPandas`` computing
    all cosines per Arrow batch with one BLAS matmul, keep only each
    batch's local top-k per query, then resolve the global top-k with a
    per-query window over the (tiny) union of local winners. At 100 TB the
    per-executor output is O(k · |queries|), not O(|corpus|·|queries|).
    Ties break on corpus id for determinism.
    """
    q_rows = queries.select(query_id_col, vec_col).collect()

    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id_col].dataType),
            T.StructField("corpus_id", corpus.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    if not q_rows:
        # an empty query set is a valid input (e.g. a filter matched no
        # ids); norm over a 0-d matrix would raise on the driver
        spark = corpus.sparkSession
        return spark.createDataFrame([], out_schema).withColumn("rank", F.lit(1)).limit(0)

    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    # same zero-norm guard as the corpus side: an all-zero query yields
    # cosine 0 everywhere instead of NaN (which would silently drop it)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-300)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            c_mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            c_mat /= np.maximum(np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-300)
            sims = c_mat @ q_mat.T  # (batch, n_queries)
            n_local = min(k, sims.shape[0])
            cid = pdf[id_col].to_numpy()
            # local top-k per query, tie-aware AND bounded: rows strictly
            # above the k-th cosine always advance; within the tie class at
            # the k-th value, the globally-winning rows are exactly the
            # smallest corpus_ids (the global window orders by cosine DESC,
            # corpus_id ASC), so keeping the n_local smallest tied ids is
            # lossless while restoring the O(k·|queries|) per-batch output
            # bound — a bare `col >= kth` could ship a whole batch of
            # duplicate/zero vectors.
            frames = []
            for j in range(sims.shape[1]):
                col = sims[:, j]
                if n_local < len(col):
                    kth = -np.partition(-col, n_local - 1)[n_local - 1]
                    idx = np.nonzero(col >= kth)[0]
                    if len(idx) > n_local:
                        strict = idx[col[idx] > kth]
                        tie = idx[col[idx] == kth]
                        fill = n_local - len(strict)
                        tie = tie[np.argsort(cid[tie], kind="stable")][:fill]
                        idx = np.concatenate([strict, tie])
                else:
                    idx = np.arange(len(col))
                frames.append(
                    pd.DataFrame(
                        {"query_id": q_ids[j], "corpus_id": cid[idx], "cosine": col[idx]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    local = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def train_spherical_kmeans(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_clusters: int = 16,
    train_sample: int = 4096,
    kmeans_iters: int = 10,
    seed: int = 11,
) -> "np.ndarray":
    """Spherical k-means coarse quantizer, trained driver-side on a
    bounded deterministic sample — the shared trainer behind
    :func:`ivf_cosine_topk` and ``semantic_dedup``.

    The sample is drawn by hash order, not bare limit(): xxhash64(id)
    decorrelates the draw from storage order (a bare limit takes whole
    leading partitions) AND makes it deterministic, so the trained index
    — and downstream recall — is reproducible run-to-run. Plans as
    TakeOrderedAndProject: a train_sample-sized heap per partition.
    Returns the L2-normalized centroid matrix (k_eff × dim).
    """
    if num_clusters < 1:
        raise ValueError("num_clusters must be >= 1")
    sample = np.array(
        [
            r[0]
            for r in corpus.select(
                F.col(vec_col), F.xxhash64(F.col(id_col)).alias("__h"), F.col(id_col)
            )
            .orderBy("__h", id_col)
            .limit(train_sample)
            .select(vec_col)
            .collect()
        ],
        dtype=np.float64,
    )
    if sample.size == 0:  # empty corpus: no quantizer to train
        return np.zeros((0, 0))
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-300)
    rng = np.random.default_rng(seed)
    k_eff = min(num_clusters, len(sample))
    centroids = sample[rng.choice(len(sample), k_eff, replace=False)]
    for _ in range(kmeans_iters):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(k_eff):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-300)
    return centroids


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_clusters: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    kmeans_iters: int = 10,
    seed: int = 11,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index.

    1. **Train** a coarse quantizer: k-means over a driver-side sample of
       the corpus (spherical — vectors L2-normalized, centroids
       re-normalized each iteration).
    2. **Assign** every corpus vector to its nearest centroid — one BLAS
       matmul per Arrow batch against the broadcast centroid matrix.
    3. **Probe**: each query searches only its ``nprobe`` nearest
       centroids' inverted lists; candidates come from an equi-join on the
       cluster id, local top-k per batch, global window resolve.

    At 100 TB the corpus pass is one narrow map; search cost scales with
    ``nprobe / num_clusters`` of the corpus instead of all of it. Recall
    improves with ``nprobe`` (= brute force at ``nprobe == num_clusters``).
    """
    centroids = train_spherical_kmeans(
        corpus, vec_col, id_col, num_clusters, train_sample, kmeans_iters, seed
    )
    k_eff = len(centroids)
    cent_T = centroids.T.copy()
    sample_dim = centroids.shape[1] if centroids.size else 0

    @F.pandas_udf(T.IntegerType())
    def nearest_cluster(vs: pd.Series) -> pd.Series:
        mat = np.array(vs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        return pd.Series((mat @ cent_T).argmax(axis=1).astype(np.int32))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_clusters(vs: pd.Series) -> pd.Series:
        mat = np.array(vs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        sims = mat @ cent_T
        order = np.argsort(-sims, axis=1)[:, : min(nprobe, k_eff)].astype(np.int32)
        return pd.Series(list(order))

    dim = sample_dim or None
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cnorm", _norm(F.col("cv"))).withColumn(
        "cluster", nearest_cluster(F.col("cv"))
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
        )
        .withColumn("qnorm", _norm(F.col("qv")))
        .withColumn("cluster", F.explode(probe_clusters(F.col("qv"))))
    )

    # the per-candidate cosine is the hot path (candidates x queries);
    # with dim known it compiles to one codegen multiply-add chain
    scored = c.join(F.broadcast(q), on="cluster").withColumn(
        "cosine", _dot(F.col("cv"), F.col("qv"), dim) / (F.col("cnorm") * F.col("qnorm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 6,
    num_tables: int = 1,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH with OR
    amplification.

    Each of ``num_tables`` tables gets its own seeded ``num_planes``-plane
    set; a vector's bucket in table t is ``t * 2^planes + sign-bits``, so
    all tables share one equi-join. Ranking happens only within matching
    buckets; a pair colliding in several tables is deduplicated by a
    scalar-only aggregate before the top-k window (vectors never shuffle
    twice). Recall follows 1-(1-p^planes)^tables — more tables raise
    recall at proportional candidate cost; ``num_tables=1`` is the classic
    single-table trade-off. The hyperplanes are literal arrays in the
    plan — no Python at execution time.
    """
    dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    tables = [rng.standard_normal((num_planes, dim)) for _ in range(num_tables)]

    def bucket_array(vcol):
        buckets = []
        for t, planes in enumerate(tables):
            acc = F.lit(t * (2**num_planes))
            for p in range(num_planes):
                plane = F.array(*[F.lit(float(x)) for x in planes[p]])
                acc = acc + F.when(_dot(vcol, plane) >= 0, F.lit(2**p)).otherwise(F.lit(0))
            buckets.append(acc)
        return F.array(*buckets)

    c = (
        corpus.select(
            F.col(id_col).alias("corpus_id"), _as_double(F.col(vec_col)).alias("cv")
        )
        .withColumn("cnorm", _norm(F.col("cv")))
        .withColumn("bucket", F.explode(bucket_array(F.col("cv"))))
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
        )
        .withColumn("qnorm", _norm(F.col("qv")))
        .withColumn("bucket", F.explode(bucket_array(F.col("qv"))))
    )

    scored = c.join(F.broadcast(q), on="bucket").withColumn(
        "cosine", _dot(F.col("cv"), F.col("qv"), dim) / (F.col("cnorm") * F.col("qnorm"))
    )
    # multi-table collisions duplicate (query, corpus) pairs; the cosine is
    # identical across tables, so dedupe on the scalar before ranking
    deduped = scored.groupBy("query_id", "corpus_id").agg(F.first("cosine").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        deduped.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
) -> DataFrame:
    """k-nearest-neighbor classification over an embedding column: each
    query's predicted label is the majority vote of its ``k`` most
    cosine-similar corpus vectors' labels.

    Composition, not new machinery: the neighbor search IS
    :func:`cosine_topk` (broadcast query matrix + one BLAS matmul per
    Arrow batch + per-query window over the tiny local-winner union), and
    the vote is two codegen aggregations over the O(k · |queries|)
    neighbor rows. ``exclude_self`` drops a corpus row whose id equals
    the query id before ranking (the standard leave-one-out evaluation
    when the queries are drawn from the corpus itself).

    Ties are deterministic end-to-end: neighbor ranking breaks on corpus
    id (inherited from ``cosine_topk``), the vote breaks on the smaller
    label. NULL corpus labels never vote — they are filtered before the
    aggregation (a NULL "class" is an absence of ground truth, and
    engines disagree on NULL ordering, so letting it into the tie-break
    would be both meaningless and non-portable). Returns one row per
    query: ``(query_id, pred_label, votes, k_eff)`` where ``k_eff`` is
    the number of neighbors that actually voted (< k when the corpus
    runs out of rows or some neighbors are unlabeled; a query whose
    every neighbor is unlabeled emits no row).

    Scale: no new exchange beyond ``cosine_topk``'s — the vote shuffles
    at most ``k * |queries|`` rows, and the label join hashes on the
    corpus id over that same small set.
    """
    if k <= 0:
        raise ValueError("k must be > 0")
    from pyspark.sql import Window

    fetch = k + 1 if exclude_self else k
    tk = cosine_topk(
        corpus, queries, k=fetch, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )
    if exclude_self:
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("corpus_id")
        )
        tk = (
            tk.filter(F.col("corpus_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    # NULL corpus labels carry no class information and are excluded from
    # the vote BEFORE aggregation — without this, the vote tie-break
    # (ORDER BY __lbl ASC) sorts NULL first in Spark but LAST in ANSI
    # engines like DuckDB, so a nullable label column would win ties
    # differently cross-engine and could emit a NULL prediction.
    labeled = tk.join(
        corpus.select(
            F.col(id_col).alias("corpus_id"), F.col(label_col).alias("__lbl")
        ),
        "corpus_id",
    ).filter(F.col("__lbl").isNotNull())
    votes = labeled.groupBy("query_id", "__lbl").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("__lbl")
    )
    totals = labeled.groupBy("query_id").agg(F.count(F.lit(1)).alias("k_eff"))
    return (
        votes.withColumn("__r", F.row_number().over(wv))
        .filter(F.col("__r") == 1)
        .drop("__r")
        .withColumnRenamed("__lbl", "pred_label")
        .join(totals, "query_id")
        .select("query_id", "pred_label", "votes", "k_eff")
    )


def cluster_assign(
    df: DataFrame,
    centroids: "np.ndarray | None" = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    num_clusters: int = 16,
    train_sample: int = 4096,
    kmeans_iters: int = 10,
    seed: int = 11,
) -> DataFrame:
    """Attach the nearest-centroid cluster id to every row — the exposed
    primitive behind IVF probing and ``semantic_dedup``'s coarse
    quantizer (one narrow Arrow pass against the broadcast centroid
    matrix, zero shuffle).

    Pass caller-owned ``centroids`` (from :func:`train_spherical_kmeans`)
    to amortize training across sessions; otherwise a quantizer is
    trained on the bounded deterministic sample. Rows with NULL vectors
    get cluster ``-1`` (they have no geometry to assign); ties take the
    lowest cluster id (numpy argmax convention), so the assignment is
    deterministic for fixed centroids.
    """
    if centroids is None:
        centroids = train_spherical_kmeans(
            df, vec_col, id_col, num_clusters, train_sample, kmeans_iters, seed
        )
    cents = np.asarray(centroids, dtype=np.float64)
    if cents.size == 0:
        return df.withColumn(cluster_col, F.lit(-1).cast("int"))
    cent_T = cents.T.copy()

    @F.pandas_udf(T.IntegerType())
    def nearest(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        mask = vs.notna()
        out = np.full(len(vs), -1, dtype=np.int32)
        if mask.any():
            mat = np.array(vs[mask].tolist(), dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
            out[mask.to_numpy()] = (mat @ cent_T).argmax(axis=1).astype(np.int32)
        return pd.Series(out)

    return df.withColumn(cluster_col, nearest(F.col(vec_col)))


def cluster_balanced_sample(
    df: DataFrame,
    k: int,
    centroids: "np.ndarray | None" = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_clusters: int = 16,
    train_sample: int = 4096,
    kmeans_iters: int = 10,
    seed: int = 11,
    salt: str = "",
) -> DataFrame:
    """Equal-representation sample across embedding clusters — the
    diversity-curation pattern: assign every row to its nearest centroid
    (:func:`cluster_assign`), split ``k`` into per-cluster quotas
    (``k // n`` each, remainder to the lowest non-empty cluster ids),
    then draw each quota content-addressed (the md5-smallest ids per
    cluster, via ``stratified_sample_exact``) so the kept set is a pure
    function of the ids present — partitioning- and engine-independent.

    NULL-vector rows (cluster ``-1``) are never sampled. A cluster
    holding fewer rows than its quota contributes everything it has
    (total may come up short rather than borrowing from denser clusters
    — balance is the point). Returns the sampled rows with ``cluster``
    attached.

    Scale shape: one narrow Arrow assignment pass, two O(#clusters)
    driver aggregates, one narrow threshold filter, and a window over
    only ~margin·k candidate rows (``stratified_sample_exact``'s
    skew-safe plan).
    """
    if k <= 0:
        raise ValueError("k must be > 0")
    from ..utils.caching import materialized_small_result
    from .curation import stratified_sample_exact

    assigned = cluster_assign(
        df,
        centroids=centroids,
        vec_col=vec_col,
        id_col=id_col,
        num_clusters=num_clusters,
        train_sample=train_sample,
        kmeans_iters=kmeans_iters,
        seed=seed,
    )
    # The quota machinery fires several actions (distinct clusters,
    # per-stratum counts, candidate counts, final draw) — each would
    # re-run the full BLAS assignment pass through the lineage. The
    # narrow (id, cluster) persist + materialize-k-rows + release
    # lifecycle is the shared audited helper (dsir_select / bm25_topk /
    # SF² combine).
    narrow = assigned.select(F.col(id_col), F.col("cluster")).filter(
        F.col("cluster") >= 0
    )

    def _build(pinned: DataFrame) -> "DataFrame | None":
        present = sorted(
            r[0] for r in pinned.select("cluster").distinct().collect()
        )
        if not present:
            return None
        base, rem = divmod(k, len(present))
        counts = {c: base + (1 if i < rem else 0) for i, c in enumerate(present)}
        counts = {c: q for c, q in counts.items() if q > 0}
        return stratified_sample_exact(
            pinned,
            strata_col="cluster",
            counts=counts,
            id_col=id_col,
            salt=salt,
        )

    sel = materialized_small_result(narrow, _build)
    if sel is None:  # every vector was NULL: nothing is sampleable
        return assigned.limit(0)
    return df.join(sel, id_col)

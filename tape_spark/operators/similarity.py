"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (and the oracle target);
random-hyperplane LSH bucketing is the scale path — at 100 TB the
broadcast-join + per-bucket ranking keeps cost proportional to bucket
occupancy instead of |corpus| × |queries|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


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

    Plan: broadcast the (small) query side, one pass over the corpus
    computing cosine via built-in higher-order functions (zip_with +
    aggregate — JVM-side, no Python), then a per-query window ranking.
    Ties break on corpus id for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cnorm", _norm(F.col("cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))

    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", _dot(F.col("cv"), F.col("qv")) / (F.col("cnorm") * F.col("qnorm"))
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
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Both sides get a ``num_planes``-bit sign signature against a fixed
    (seeded) set of hyperplanes; ranking happens only within matching
    buckets. Recall trades off against ``num_planes``; multi-probe can be
    layered by unioning neighbor buckets. The hyperplanes are literal
    arrays in the plan — no Python at execution time.
    """
    import numpy as np

    dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))

    def bucket_expr(vcol):
        acc = None
        for p in range(num_planes):
            plane = F.array(*[F.lit(float(x)) for x in planes[p]])
            bit = F.when(_dot(vcol, plane) >= 0, F.lit(2**p)).otherwise(F.lit(0))
            acc = bit if acc is None else acc + bit
        return acc

    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cnorm", _norm(F.col("cv"))).withColumn("bucket", bucket_expr(F.col("cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qnorm", _norm(F.col("qv"))).withColumn("bucket", bucket_expr(F.col("qv")))

    scored = c.join(F.broadcast(q), on="bucket").withColumn(
        "cosine", _dot(F.col("cv"), F.col("qv")) / (F.col("cnorm") * F.col("qnorm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )

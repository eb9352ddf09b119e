"""Product-quantization tests: codebook shape/determinism, encode
contract, ADC recall on clustered data, exact-rerank ordering, edges."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tape_spark.operators import (
    cosine_topk,
    ivfpq_cosine_topk,
    pq_cosine_topk,
    pq_encode,
    train_pq_codebooks,
)

DIM, M = 16, 4


def _clustered(n_clusters=8, per_cluster=40, seed=7):
    """Well-separated unit clusters: the regime PQ is built for."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            v = c + 0.05 * rng.normal(size=DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _clustered(), "vec_id long, embedding array<float>"
    ).cache()


def _brute_topk(rows, q_rows, k):
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for qid, qv in q_rows:
        q = np.asarray(qv, dtype=np.float64)
        q /= np.linalg.norm(q)
        sims = mat @ q
        order = np.lexsort((ids, -sims))[:k]
        out[qid] = list(ids[order])
    return out


def test_codebooks_shape_and_determinism(corpus):
    b1 = train_pq_codebooks(corpus, m=M, num_centroids=16, train_sample=200)
    b2 = train_pq_codebooks(corpus, m=M, num_centroids=16, train_sample=200)
    assert b1.shape == (M, 16, DIM // M)
    assert np.array_equal(b1, b2)
    with pytest.raises(ValueError, match="divide"):
        train_pq_codebooks(corpus, m=3)
    with pytest.raises(ValueError, match="num_centroids"):
        train_pq_codebooks(corpus, m=M, num_centroids=300)


def test_encode_bytes_and_clone_codes(spark, corpus):
    books = train_pq_codebooks(corpus, m=M, num_centroids=16)
    codes = pq_encode(corpus, books).collect()
    assert len(codes) == corpus.count()
    assert all(len(r["pq_code"]) == M for r in codes)
    # identical vectors encode identically
    v = corpus.filter("vec_id = 0").collect()[0]["embedding"]
    clones = spark.createDataFrame(
        [(100, v), (200, v)], "vec_id long, embedding array<float>"
    )
    c = {r["vec_id"]: r["pq_code"] for r in pq_encode(clones, books).collect()}
    assert c[100] == c[200]
    # NULL embeddings are excluded, not crashed on
    with_null = spark.createDataFrame(
        [(1, v), (2, None)], "vec_id long, embedding array<float>"
    )
    assert pq_encode(with_null, books).count() == 1


def test_pq_adc_recall_on_clusters(spark, corpus):
    rows = _clustered()
    q_rows = [(r[0], r[1]) for r in rows[:5]]
    queries = spark.createDataFrame(
        [(int(q), v) for q, v in q_rows], "query_id long, embedding array<float>"
    )
    res = pq_cosine_topk(
        corpus, queries, k=10, m=M, num_centroids=32, rerank_factor=0
    )
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], set()).add(r["corpus_id"])
    # PQ quantizes near-duplicates to the SAME code, so within-cluster
    # order is unresolvable by design (rerank exists for that); the ADC
    # contract here is cluster-level: every hit lies in the query's true
    # cluster (ids are laid out in 40-wide cluster blocks).
    for qid, _ in q_rows:
        block = qid // 40
        assert len(got[qid]) == 10
        assert all(cid // 40 == block for cid in got[qid]), (
            f"query {qid}: ADC escaped its cluster: {sorted(got[qid])}"
        )


def test_pq_rerank_matches_brute_exactly(spark, corpus):
    rows = _clustered()
    q_rows = [(r[0], r[1]) for r in rows[:3]]
    queries = spark.createDataFrame(
        [(int(q), v) for q, v in q_rows], "query_id long, embedding array<float>"
    )
    res = pq_cosine_topk(
        corpus, queries, k=5, m=M, num_centroids=32, rerank_factor=8
    )
    got = {}
    for r in res.orderBy("query_id", "rank").collect():
        got.setdefault(r["query_id"], []).append(r["corpus_id"])
    brute = _brute_topk(rows, q_rows, k=5)
    for qid, want in brute.items():
        # with a 40-deep exact-reranked shortlist on tight clusters the
        # final ORDER matches brute force, not just the set
        assert got[qid] == want, f"query {qid}: {got[qid]} vs {want}"
    # reranked scores are true cosines: top-1 for a corpus query is itself
    top1 = {q: ds[0] for q, ds in got.items()}
    assert all(top1[q] == q for q, _ in q_rows)


def test_pq_encode_rejects_oversized_codebooks(spark, corpus):
    # caller-owned codebooks with >256 centroids would overflow the
    # one-byte codes silently — must raise instead
    books = np.zeros((M, 300, DIM // M))
    with pytest.raises(ValueError, match="256"):
        pq_encode(corpus, books)


def test_pq_empty_edges(spark, corpus):
    books = train_pq_codebooks(corpus, m=M, num_centroids=8)
    empty_q = spark.createDataFrame([], "query_id long, embedding array<float>")
    assert pq_cosine_topk(corpus, empty_q, k=3, codebooks=books).count() == 0
    empty_c = corpus.limit(0)
    assert train_pq_codebooks(empty_c, m=M).size == 0
    q = spark.createDataFrame(
        [(1, [0.0] * DIM)], "query_id long, embedding array<float>"
    )
    # zero query vector: scores are finite (0), no NaN poisoning
    rows = pq_cosine_topk(corpus, q, k=3, codebooks=books).collect()
    assert len(rows) == 3 and all(np.isfinite(r["score"]) for r in rows)


def test_ivfpq_rerank_matches_brute_with_full_probe(spark, corpus):
    # nprobe == num_clusters makes the coarse stage lossless, so the
    # ADC+rerank composition must reproduce the brute order exactly
    rows = _clustered()
    q_rows = [(r[0], r[1]) for r in rows[:3]]
    queries = spark.createDataFrame(
        [(int(q), v) for q, v in q_rows], "query_id long, embedding array<float>"
    )
    res = ivfpq_cosine_topk(
        corpus, queries, k=5, num_clusters=8, nprobe=8,
        m=M, num_centroids=32, rerank_factor=8,
    )
    got = {}
    for r in res.orderBy("query_id", "rank").collect():
        got.setdefault(r["query_id"], []).append(r["corpus_id"])
    brute = _brute_topk(rows, q_rows, k=5)
    for qid, want in brute.items():
        assert got[qid] == want, f"query {qid}: {got[qid]} vs {want}"


def test_ivfpq_narrow_probe_stays_in_cluster(spark, corpus):
    # nprobe=1 on well-separated clusters: every hit lies in the query's
    # own cluster block, and results are deterministic across calls
    rows = _clustered()
    q_rows = [(r[0], r[1]) for r in rows[:4]]
    queries = spark.createDataFrame(
        [(int(q), v) for q, v in q_rows], "query_id long, embedding array<float>"
    )
    r1 = ivfpq_cosine_topk(
        corpus, queries, k=10, num_clusters=8, nprobe=1, m=M, num_centroids=32
    ).collect()
    got = {}
    for r in r1:
        got.setdefault(r["query_id"], set()).add(r["corpus_id"])
    for qid, _ in q_rows:
        assert len(got[qid]) == 10
        assert all(cid // 40 == qid // 40 for cid in got[qid])
    r2 = ivfpq_cosine_topk(
        corpus, queries, k=10, num_clusters=8, nprobe=1, m=M, num_centroids=32
    ).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_ivfpq_caller_owned_indexes_and_edges(spark, corpus):
    from tape_spark.operators import train_spherical_kmeans

    coarse = train_spherical_kmeans(corpus, num_clusters=8, train_sample=200)
    books = train_pq_codebooks(corpus, m=M, num_centroids=16)
    q = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = ivfpq_cosine_topk(
        corpus, q, k=3, coarse_centroids=coarse, codebooks=books,
        nprobe=2, rerank_factor=4,
    ).collect()
    assert len(rows) == 3 and rows[0]["corpus_id"] == 0  # self top-1 after rerank
    empty_q = spark.createDataFrame([], "query_id long, embedding array<float>")
    assert ivfpq_cosine_topk(corpus, empty_q, k=3).count() == 0
    with pytest.raises(ValueError):
        ivfpq_cosine_topk(corpus, q, k=3, nprobe=0)


def test_ivfpq_encoded_path_matches_per_call_encode(spark, corpus, tmp_path):
    """encoded= (the warehouse pattern: train once, encode once, query
    forever) must return exactly what the per-call encode returns, both
    in-memory and through a save/load roundtrip."""
    from tape_spark.operators import (
        ivfpq_encode,
        ivfpq_load_index,
        ivfpq_save_index,
        train_spherical_kmeans,
    )

    coarse = train_spherical_kmeans(corpus, num_clusters=8, train_sample=200)
    books = train_pq_codebooks(corpus, m=M, num_centroids=16)
    q = corpus.filter("vec_id in (0, 55, 200)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def run(**kw):
        return sorted(
            tuple(r)
            for r in ivfpq_cosine_topk(
                corpus, q, k=5, coarse_centroids=coarse, codebooks=books,
                nprobe=3, **kw,
            ).collect()
        )

    want = run()
    enc = ivfpq_encode(corpus, coarse, books)
    assert run(encoded=enc) == want

    path = str(tmp_path / "ivfpq_idx")
    ivfpq_save_index(enc, coarse, books, path)
    enc2, coarse2, books2 = ivfpq_load_index(spark, path)
    assert np.allclose(coarse2, coarse) and np.allclose(books2, books)
    got = sorted(
        tuple(r)
        for r in ivfpq_cosine_topk(
            corpus, q, k=5, coarse_centroids=coarse2, codebooks=books2,
            nprobe=3, encoded=enc2,
        ).collect()
    )
    assert got == want
    # rerank still works from the raw corpus alongside encoded=
    rr = ivfpq_cosine_topk(
        corpus, q, k=3, coarse_centroids=coarse2, codebooks=books2,
        nprobe=3, encoded=enc2, rerank_factor=4,
    ).collect()
    assert any(r["corpus_id"] == r["query_id"] and r["rank"] == 1 for r in rr)


def test_ivfpq_encoded_validations(spark, corpus):
    from tape_spark.operators import ivfpq_encode, train_spherical_kmeans

    coarse = train_spherical_kmeans(corpus, num_clusters=4, train_sample=200)
    books = train_pq_codebooks(corpus, m=M, num_centroids=16)
    enc = ivfpq_encode(corpus, coarse, books)
    q = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # encoded without its models is refused
    with pytest.raises(ValueError, match="encoded="):
        ivfpq_cosine_topk(corpus, q, k=3, encoded=enc)
    # mismatched code width (models with a different m) is caught by the
    # one-row probe, not returned as silent wrong answers
    books2 = train_pq_codebooks(corpus, m=2, num_centroids=16)
    with pytest.raises(ValueError, match="pq_code width"):
        ivfpq_cosine_topk(
            corpus, q, k=3, coarse_centroids=coarse, codebooks=books2,
            encoded=enc, m=2,
        )


def test_ivfpq_append_equals_rebuild(spark, corpus, tmp_path):
    from tape_spark.operators import (
        ivfpq_append_index,
        ivfpq_encode,
        ivfpq_load_index,
        ivfpq_save_index,
        train_spherical_kmeans,
    )

    base = corpus.filter("vec_id < 200")
    delta = corpus.filter("vec_id >= 200")
    coarse = train_spherical_kmeans(base, num_clusters=8, train_sample=200)
    books = train_pq_codebooks(base, m=M, num_centroids=16)
    path = str(tmp_path / "ivfpq_grow")
    ivfpq_save_index(ivfpq_encode(base, coarse, books), coarse, books, path)
    ivfpq_append_index(delta, path)
    enc, c2, b2 = ivfpq_load_index(spark, path)
    q = corpus.filter("vec_id in (10, 250)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        tuple(r)
        for r in ivfpq_cosine_topk(
            corpus, q, k=5, coarse_centroids=c2, codebooks=b2,
            nprobe=8, encoded=enc,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivfpq_cosine_topk(
            corpus, q, k=5, coarse_centroids=coarse, codebooks=books, nprobe=8,
        ).collect()
    )
    assert got == want
    # an appended (union-corpus) query can reach the delta vectors
    assert any(r[1] >= 200 for r in got)


def test_ivfpq_rerank_raises_on_uncovered_encoded_ids(spark, corpus, tmp_path):
    """With encoded= + rerank_factor>0, a corpus frame that does not
    cover every encoded id must FAIL naming the id, not silently drop
    shortlist candidates from the top-k (an inner join's failure mode)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from tape_spark.operators import (
        ivfpq_cosine_topk,
        ivfpq_encode,
        train_spherical_kmeans,
    )

    rows = _clustered()
    coarse = train_spherical_kmeans(corpus, num_clusters=8, train_sample=200)
    books = train_pq_codebooks(corpus, m=M, num_centroids=16)
    enc = ivfpq_encode(corpus, coarse, books)
    queries = spark.createDataFrame(
        [(int(rows[0][0]), rows[0][1])], "query_id long, embedding array<float>"
    )
    # drop half the raw vectors: shortlist ids hit the hole
    partial = corpus.filter("vec_id % 2 = 0")
    with pytest.raises(SparkRuntimeException, match="no raw vector for encoded id"):
        ivfpq_cosine_topk(
            partial, queries, k=5, nprobe=8, rerank_factor=8,
            coarse_centroids=coarse, codebooks=books, encoded=enc,
        ).collect()
    # full coverage still works unchanged through the left-join guard
    ok = ivfpq_cosine_topk(
        corpus, queries, k=5, nprobe=8, rerank_factor=8,
        coarse_centroids=coarse, codebooks=books, encoded=enc,
    ).collect()
    assert len(ok) == 5


def test_ivfpq_compact_index_preserves_queries(spark, corpus, tmp_path):
    import glob
    import os

    from tape_spark.operators import (
        ivfpq_append_index,
        ivfpq_compact_index,
        ivfpq_cosine_topk,
        ivfpq_encode,
        ivfpq_load_index,
        ivfpq_save_index,
        train_spherical_kmeans,
    )

    base = corpus.filter("vec_id < 200")
    coarse = train_spherical_kmeans(base, num_clusters=8, train_sample=200)
    books = train_pq_codebooks(base, m=M, num_centroids=16)
    path = str(tmp_path / "ivfidx")
    ivfpq_save_index(ivfpq_encode(base, coarse, books), coarse, books, path)
    ivfpq_append_index(corpus.filter("vec_id >= 200 and vec_id < 260"), path)
    ivfpq_append_index(corpus.filter("vec_id >= 260"), path)
    q = corpus.filter("vec_id in (0, 100)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def run():
        enc, c2, b2 = ivfpq_load_index(spark, path)
        return sorted(
            tuple(r)
            for r in ivfpq_cosine_topk(
                corpus, q, k=5, coarse_centroids=c2, codebooks=b2,
                nprobe=8, encoded=enc,
            ).collect()
        )

    before = run()
    ivfpq_compact_index(spark, path)
    after = run()
    assert after == before and before
    for d in glob.glob(f"{path}/encoded/cluster=*"):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d


def test_ivfpq_rerank_plan_never_shuffles_corpus(spark, corpus):
    """The rerank coverage guard must not cost the broadcast: a LeftOuter
    broadcast join can only build its RIGHT side, so the corpus slice
    (semi-joined down to the shortlist ids) must be the broadcast build —
    the rerank plan may not fall back to a SortMergeJoin on the corpus."""
    rows = _clustered()
    queries = spark.createDataFrame(
        [(int(r[0]), r[1]) for r in rows[:3]],
        "query_id long, embedding array<float>",
    )
    out = ivfpq_cosine_topk(
        corpus, queries, k=3, num_clusters=8, nprobe=2,
        m=M, num_centroids=32, rerank_factor=2,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert out.count() > 0


def test_ivfpq_rerank_leaves_no_cached_frames(spark, corpus):
    """The rerank path used to persist the shortlist and never release
    it — one leaked cached frame per query for the session. The
    shortlist is now a driver-side local relation (bounded at
    |queries| x n_short rows), so no persisted RDDs outlive the call."""
    from tape_spark.operators import ivfpq_cosine_topk

    queries = corpus.filter("vec_id < 3").withColumnRenamed("vec_id", "query_id")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    res = ivfpq_cosine_topk(
        corpus, queries, k=5, num_clusters=4, nprobe=2, m=4,
        train_sample=256, rerank_factor=3,
    )
    assert res.count() > 0
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before

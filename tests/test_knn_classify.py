"""knn_classify: numpy brute-force parity, leave-one-out mode, ties,
and degenerate inputs.

No reference counterpart (the reference engine has no embedding/ML
surface); part of the beyond-reference similarity layer."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tape_spark.operators import knn_classify

RNG = np.random.default_rng(7)
N, D = 60, 8


def _make(n=N, d=D):
    # three separable clusters with integer labels 0/1/2
    centers = np.array([[4.0] * d, [-4.0] * d, [4.0, -4.0] * (d // 2)])
    labels = RNG.integers(0, 3, size=n)
    vecs = centers[labels] + RNG.normal(0, 0.5, size=(n, d))
    return vecs, labels


VECS, LABELS = _make()


def _py_knn(q_ids, k, exclude_self):
    vn = VECS / np.linalg.norm(VECS, axis=1, keepdims=True)
    out = {}
    for qi in q_ids:
        cos = vn @ vn[qi]
        order = sorted(range(N), key=lambda j: (-cos[j], j))
        if exclude_self:
            order = [j for j in order if j != qi]
        nb = order[:k]
        votes = {}
        for j in nb:
            votes[LABELS[j]] = votes.get(LABELS[j], 0) + 1
        pred = sorted(votes, key=lambda l: (-votes[l], l))[0]
        out[qi] = (int(pred), votes[pred], len(nb))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pd.DataFrame(
        {
            "vec_id": range(N),
            "embedding": [v.tolist() for v in VECS],
            "label": LABELS.astype(int),
        }
    )
    return spark.createDataFrame(pdf)


def _queries(corpus, ids):
    from pyspark.sql import functions as F

    return corpus.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_numpy_parity(corpus):
    q_ids = [0, 7, 23, 41]
    got = {
        r["query_id"]: (r["pred_label"], r["votes"], r["k_eff"])
        for r in knn_classify(corpus, _queries(corpus, q_ids), k=5).collect()
    }
    assert got == _py_knn(q_ids, 5, exclude_self=False)


def test_exclude_self_parity(corpus):
    q_ids = [3, 14, 50]
    got = {
        r["query_id"]: (r["pred_label"], r["votes"], r["k_eff"])
        for r in knn_classify(
            corpus, _queries(corpus, q_ids), k=7, exclude_self=True
        ).collect()
    }
    assert got == _py_knn(q_ids, 7, exclude_self=True)


def test_separable_clusters_classify_correctly(corpus):
    q_ids = list(range(10))
    got = {
        r["query_id"]: r["pred_label"]
        for r in knn_classify(
            corpus, _queries(corpus, q_ids), k=9, exclude_self=True
        ).collect()
    }
    # well-separated clusters: leave-one-out knn recovers every label
    assert got == {qi: int(LABELS[qi]) for qi in q_ids}


def test_k_larger_than_corpus(corpus):
    got = knn_classify(corpus, _queries(corpus, [2]), k=500).collect()
    assert len(got) == 1 and got[0]["k_eff"] == N


def test_vote_tie_breaks_on_smaller_label(spark):
    # 2 neighbors of label 1, 2 of label 0, equidistant-ish: k=4 ties 2-2
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [[1.0, 0.0], [0.9, 0.1], [1.0, 0.1], [0.95, 0.0]],
            "label": [1, 1, 0, 0],
        }
    )
    corpus = spark.createDataFrame(pdf)
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [99], "embedding": [[1.0, 0.05]]})
    )
    r = knn_classify(corpus, q, k=4).collect()[0]
    assert r["pred_label"] == 0 and r["votes"] == 2


def test_empty_queries(corpus):
    empty = _queries(corpus, [])
    assert knn_classify(corpus, empty, k=3).count() == 0


def test_validation(corpus):
    with pytest.raises(ValueError):
        knn_classify(corpus, _queries(corpus, [0]), k=0)


def test_null_labels_never_vote(spark):
    """NULL corpus labels are excluded from the vote (ADVICE r9): Spark
    sorts NULL first on ASC while ANSI engines sort it last, so a NULL
    label in the tie-break would diverge cross-engine — and a NULL
    'prediction' is meaningless anyway."""
    rows = [
        (0, [1.0, 0.0], None),
        (1, [0.9, 0.1], None),
        (2, [1.0, 0.1], 7),
        (3, [0.95, 0.0], 7),
    ]
    schema = "vec_id long, embedding array<double>, label long"
    corpus = spark.createDataFrame(rows, schema)
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [99], "embedding": [[1.0, 0.05]]})
    )
    r = knn_classify(corpus, q, k=4).collect()
    assert len(r) == 1
    # the two NULL neighbors don't vote: label 7 wins 2-0, k_eff counts voters
    assert r[0]["pred_label"] == 7 and r[0]["votes"] == 2 and r[0]["k_eff"] == 2
    # all-NULL corpus => no prediction row at all, never a NULL prediction
    all_null = spark.createDataFrame(
        [(i, e, None) for i, e, _ in rows], schema
    )
    assert knn_classify(all_null, q, k=4).count() == 0

"""cluster_assign / cluster_balanced_sample tests: assignment parity
with numpy, NULL handling, quota balance, determinism, short clusters."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tape_spark.operators import (
    cluster_assign,
    cluster_balanced_sample,
    train_spherical_kmeans,
)

DIM = 8


def _clustered(n_clusters=4, per_cluster=30, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
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


def test_assign_matches_numpy(spark, corpus):
    books = train_spherical_kmeans(corpus, num_clusters=4, train_sample=200)
    got = {
        r["vec_id"]: r["cluster"] for r in cluster_assign(corpus, books).collect()
    }
    rows = _clustered()
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    want = (mat @ books.T).argmax(axis=1)
    assert all(got[r[0]] == want[i] for i, r in enumerate(rows))


def test_assign_null_and_empty_centroids(spark, corpus):
    v = _clustered()[0][1]
    df = spark.createDataFrame(
        [(1, v), (2, None)], "vec_id long, embedding array<float>"
    )
    books = train_spherical_kmeans(corpus, num_clusters=4, train_sample=200)
    got = {r["vec_id"]: r["cluster"] for r in cluster_assign(df, books).collect()}
    assert got[2] == -1 and got[1] >= 0
    # empty corpus → empty centroid matrix → everything unassigned
    empty = corpus.limit(0)
    assert cluster_assign(df, train_spherical_kmeans(empty)).filter(
        F.col("cluster") != -1
    ).count() == 0


def test_balanced_sample_quotas_and_determinism(spark, corpus):
    s1 = cluster_balanced_sample(corpus, k=22, num_clusters=4)
    rows1 = s1.collect()
    assert len(rows1) == 22
    per = {}
    for r in rows1:
        per[r["cluster"]] = per.get(r["cluster"], 0) + 1
    # 22 over 4 non-empty clusters: quotas 6/6/5/5 (remainder to lowest ids)
    assert sorted(per.values(), reverse=True) == [6, 6, 5, 5]
    assert min(per) >= 0
    rows2 = cluster_balanced_sample(corpus, k=22, num_clusters=4).collect()
    assert sorted(r["vec_id"] for r in rows1) == sorted(r["vec_id"] for r in rows2)
    # a different salt draws a different (but equally balanced) set
    rows3 = cluster_balanced_sample(corpus, k=22, num_clusters=4, salt="x").collect()
    assert sorted(r["vec_id"] for r in rows3) != sorted(r["vec_id"] for r in rows1)
    assert len(rows3) == 22


def test_balanced_sample_short_cluster_and_nulls(spark, corpus):
    # plant a tiny artificial cluster far from the data + NULL rows
    far = [10.0] + [0.0] * (DIM - 1)
    extra = spark.createDataFrame(
        [(1000, far), (1001, None)], "vec_id long, embedding array<float>"
    )
    df = corpus.unionByName(extra)
    books = np.vstack(
        [train_spherical_kmeans(corpus, num_clusters=4, train_sample=200),
         np.array([far]) / np.linalg.norm(far)]
    )
    sel = cluster_balanced_sample(df, k=25, centroids=books).collect()
    # 5 clusters x quota 5, but the planted cluster holds ONE row → total 21
    assert len(sel) == 21
    assert sum(1 for r in sel if r["vec_id"] == 1000) == 1
    assert all(r["vec_id"] != 1001 for r in sel)  # NULL never sampled
    with pytest.raises(ValueError):
        cluster_balanced_sample(df, k=0)



def test_dedup_clusters_minhash_method(spark):
    """method='minhash' must produce the same clusters as the exact path
    on planted exact-copy groups (recall 1.0 by construction: identical
    docs agree in every band) and reject unknown methods."""
    from tape_spark.operators import dedup_clusters

    rows = []
    for g in range(6):
        text = " ".join(f"g{g}w{j}" for j in range(30))
        for m in range(3):  # three exact copies per group
            rows.append((g * 10 + m, text))
    rows += [(900 + i, " ".join(f"solo{i}w{j}" for j in range(30))) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = sorted(
        tuple(r) for r in dedup_clusters(docs, n=2, threshold=0.7).collect()
    )
    mh = sorted(
        tuple(r)
        for r in dedup_clusters(docs, n=2, threshold=0.7, method="minhash").collect()
    )
    assert mh == exact
    assert len(mh) == 18  # 6 groups x 3 members; solos excluded
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exact\\|minhash"):
        dedup_clusters(docs, method="simhash")



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


def test_resolve_duplicates_null_quality_semantics(spark):
    """NULL quality must sort last (never beat a non-NULL member) and an
    all-NULL component must fall back to smallest id — the window
    ordering [desc_nulls_last(q), asc(id)] the aggregation paths replaced
    must be reproduced exactly."""
    from tape_spark.operators import resolve_duplicates

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0),        # A: tie at 9 -> keep 2
         (10, None), (11, 3.0), (12, None),   # B: nulls last -> keep 11
         (20, None), (21, None),              # C: all null -> keep 20
         (30, 1.0)],                          # unclustered, untouched
        "doc_id long, q double")
    clusters = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (10, "B"), (11, "B"), (12, "B"),
         (20, "C"), (21, "C")],
        "doc_id long, component string")
    kept = {r.doc_id for r in resolve_duplicates(docs, clusters, quality_col="q").collect()}
    assert kept == {2, 11, 20, 30}


def test_resolve_duplicates_matches_window_replica_randomized(spark):
    """The two-pass argmax must equal the removed row_number window plan
    on randomized clusters with NULLs, ties, and singleton components."""
    import random

    from pyspark.sql import Window, functions as F

    from tape_spark.operators import resolve_duplicates

    rng = random.Random(11)
    rows = []
    for i in range(400):
        comp = rng.randrange(40)
        q = rng.choice([None, 0.0, 1.5, 1.5, 3.0, float(rng.randrange(5))])
        rows.append((i, comp, q))
    docs = spark.createDataFrame(rows, "doc_id long, comp long, q double")
    clusters = docs.select("doc_id", F.col("comp").alias("component"))

    agg_kept = {
        r.doc_id
        for r in resolve_duplicates(
            docs.select("doc_id", "q"), clusters, quality_col="q"
        ).collect()
    }

    w = Window.partitionBy("component").orderBy(
        F.desc_nulls_last("q"), F.asc("doc_id")
    )
    member = clusters.join(docs.select("doc_id", "q"), "doc_id", "left")
    drops = (
        member.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > 1)
        .select("doc_id")
    )
    win_kept = {
        r.doc_id
        for r in docs.select("doc_id", "q").join(drops, "doc_id", "left_anti").collect()
    }
    assert agg_kept == win_kept


def test_minhash_slim_join_mode_matches_fused(spark):
    """join_mode='slim' (16-byte band join + per-side signature attach)
    must return exactly the fused path's (id_a, id_b, est_jaccard) rows,
    with and without bucket capping."""
    from tape_spark.operators import minhash_near_duplicates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def pairs(mode, **kw):
        out = minhash_near_duplicates(
            docs, num_hashes=64, bands=16, threshold=0.4, join_mode=mode, **kw
        )
        return sorted((r.id_a, r.id_b, round(r.est_jaccard, 9)) for r in out.collect())

    assert pairs("slim") == pairs("fused")
    assert pairs("slim", max_bucket_size=50) == pairs("fused", max_bucket_size=50)
    # the exact config the 5M benchmark and README recommend
    assert pairs("slim", signature_bits=32) == pairs("fused", signature_bits=32)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fused\\|slim"):
        minhash_near_duplicates(docs, join_mode="wide")


def test_dedup_clusters_minhash_rejects_exact_only_knobs(spark):
    """The exact path's skew knobs must not become silent no-ops on a
    method switch: a bare max_doc_frequency raises with guidance, and
    stop_shingle_sample + max_doc_frequency maps onto the minhash
    kernel's stop-shingle exclusion (still returns the planted exact
    copies — identical signatures agree in every band regardless of
    which shingles are excluded corpus-wide)."""
    import pytest as _pytest

    from tape_spark.operators import dedup_clusters

    rows = [(g * 10 + m, " ".join(f"g{g}w{j}" for j in range(30)))
            for g in range(4) for m in range(2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    with _pytest.raises(ValueError, match="max_bucket_size"):
        dedup_clusters(docs, method="minhash", max_doc_frequency=100)
    with _pytest.raises(ValueError, match="max_doc_frequency"):
        dedup_clusters(docs, method="minhash", stop_shingle_sample=0.5)

    out = dedup_clusters(
        docs, n=2, threshold=0.7, method="minhash",
        max_doc_frequency=100, stop_shingle_sample=1.0,
    )
    assert out.count() == 8  # all four planted pairs survive


def test_dedup_keep_first_null_ids(spark):
    """NULL ids must reproduce the removed window's asc-nulls-first
    semantics: the NULL-id row survives its group, and an all-NULL-id
    group returns a REAL input row, never a fabricated all-NULL row."""
    from tape_spark.operators import dedup_keep_first

    docs = spark.createDataFrame(
        [(None, "shared text"), (7, "shared text"),
         (None, "only null ids"), (None, "only null ids"),
         (3, "unique")],
        "doc_id long, text string")
    out = {(r.doc_id, r.text) for r in dedup_keep_first(docs).collect()}
    assert out == {(None, "shared text"), (None, "only null ids"), (3, "unique")}


def test_minhash_auto_join_mode(spark):
    """join_mode='auto' must return the same pairs as either explicit
    shape (the decision changes the plan, never the output), and the
    measured decision must flip: a mostly-unique corpus picks slim
    (C << n), a corpus of identical docs picks fused (C ~ n^2 >> 8n) —
    observable only through output equality here, so assert both
    regimes return the correct pair sets."""
    from tape_spark.operators import minhash_near_duplicates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def pairs(frame, mode, **kw):
        out = minhash_near_duplicates(
            frame, num_hashes=64, bands=16, threshold=0.4, join_mode=mode, **kw
        )
        return sorted((r.id_a, r.id_b, round(r.est_jaccard, 9)) for r in out.collect())

    assert pairs(docs, "auto") == pairs(docs, "fused")

    # hot corpus: 60 identical docs -> C = 16 bands * C(60,2), far past
    # the byte-model crossover
    hot = spark.createDataFrame(
        [(i, "the same boilerplate " * 5) for i in range(60)],
        "doc_id long, text string",
    )
    want = {(a, b) for a in range(60) for b in range(a + 1, 60)}
    got = {(r[0], r[1]) for r in pairs(hot, "auto")}
    assert got == want
    # the decision hook must record the fused pick (C ~ 16*C(60,2) makes
    # slim's candidate term dominate) with the measured volumes
    from tape_spark.operators import dedup as _dedup

    dec = _dedup._LAST_AUTO_DECISION
    assert dec is not None and dec["picked"] == "fused"
    assert dec["candidate_pairs"] == 16 * 60 * 59 // 2
    assert dec["n_docs"] == 60
    assert dec["slim_vol_bytes"] > dec["fused_vol_bytes"]


def test_connected_components_raises_when_not_converged(spark):
    """Exhausting max_iterations without the edge fingerprint settling
    must raise — emitting un-propagated labels would be silently wrong
    clusters (a long path needs ~log2(diameter) alternating rounds)."""
    import pytest as _pytest

    from tape_spark.operators import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=1)
    # and with room to converge the same chain is one component
    out = connected_components(pairs, max_iterations=25)
    assert {r.component for r in out.collect()} == {0}


def test_minhash_auto_warns_on_uncached_caller_signatures(spark):
    """auto join-mode on a caller-provided UNPERSISTED signature frame
    must warn (its measurement jobs would otherwise silently re-run the
    shingling) and still return the correct pairs; a persisted frame
    must not warn."""
    import warnings

    from tape_spark.operators import minhash_near_duplicates, minhash_signatures

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(20))) for i in range(10)]
        + [(100, "a b c d e f g h i j"), (101, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = minhash_near_duplicates(
            docs, signatures=sigs, join_mode="auto", threshold=0.5
        ).collect()
    assert any("not persisted" in str(w.message) for w in rec)
    assert {(r.id_a, r.id_b) for r in out} == {(100, 101)}
    # measurement cache must be RELEASED afterwards
    lvl = sigs.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)

    cached = minhash_signatures(docs).persist()
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        out2 = minhash_near_duplicates(
            docs, signatures=cached, join_mode="auto", threshold=0.5
        ).collect()
    assert not any("not persisted" in str(w.message) for w in rec2)
    assert {(r.id_a, r.id_b) for r in out2} == {(100, 101)}
    cached.unpersist()


def test_auto_join_mode_anchors_pinned():
    """Regression-pin the fitted auto decision against the two MEASURED
    anchors (docs/SCALING.md "auto join-mode"), so _SLIM_COST_RATIO
    cannot drift silently: the r12 boilerplate corner (slim measured
    2.9-3.3x faster despite 2.3x the modeled bytes) must pick slim, and
    the r11 candidate-explosion point (slim exhausted local disk at 5 M
    docs, C=7.4e8) must pick fused."""
    from tape_spark.operators.dedup import _auto_join_mode_decision

    # r12 boilerplate anchor: recorded auto_decision in BENCH_sf100_r12
    # phase automode_ab, corpus zipf1m_boiler2k
    boiler = _auto_join_mode_decision(
        n_docs=1_002_000, bands=16, sig_bytes=256, candidate_pairs=34_168_328
    )
    assert boiler["picked"] == "slim"
    assert boiler["fused_vol_bytes"] == 4_360_704_000
    assert boiler["slim_vol_bytes"] == 10_063_321_216
    # r11 disk-DNF anchor: 5 M Zipf docs, measured C = 7.4e8 candidate
    # pairs — the regime where slim's candidate re-shuffle exhausted
    # local disk and fused completed
    dnf = _auto_join_mode_decision(
        n_docs=5_000_000, bands=16, sig_bytes=256, candidate_pairs=740_000_000
    )
    assert dnf["picked"] == "fused"
    # the three plain zipf1m points (C ~ 2.1-2.2e6) all stay slim
    for cand in (2_184_328, 2_150_315, 2_119_840):
        assert _auto_join_mode_decision(1_000_000, 16, 256, cand)["picked"] == "slim"

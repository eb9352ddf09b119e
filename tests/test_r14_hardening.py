"""Round-14 hardening: bounded IN-pushdown (chunked literal sets), the
rebucket in-progress sentinel, batch-marker folding at compaction, the
guarded rerank shortlist collect, the config-aware rerank broadcast
cutoff, and the sampled auto join-mode measurement pass."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- chunked IN


def test_filter_in_chunked_small_set_is_plain_isin(spark, tmp_path):
    from tape_spark.utils.io import filter_in_chunked

    p = str(tmp_path / "t")
    spark.range(0, 1000).withColumnRenamed("id", "v").write.parquet(p)
    df = spark.read.parquet(p)
    out = filter_in_chunked(df, "v", [5, 7, 7, 900])
    assert sorted(r["v"] for r in out.collect()) == [5, 7, 900]
    # below the bound: one scan, no union
    assert "Union" not in out._jdf.queryExecution().executedPlan().toString()


def test_filter_in_chunked_union_is_exact(spark, tmp_path):
    from tape_spark.utils.io import filter_in_chunked

    p = str(tmp_path / "t2")
    spark.range(0, 500).withColumnRenamed("id", "v").write.parquet(p)
    df = spark.read.parquet(p)
    want = sorted(range(0, 500, 3))
    out = filter_in_chunked(df, "v", want, max_pushed_literals=40)
    assert sorted(r["v"] for r in out.collect()) == want
    assert "Union" in out._jdf.queryExecution().executedPlan().toString()


def test_filter_in_chunked_5k_literals_survives_raised_pushdown(spark, tmp_path):
    """The r13 probe showed a pushed In past ~1-2k literals overflows the
    parquet filter evaluator's stack when inFilterThreshold is raised.
    The chunked form must complete WITH pushdown enabled at 5k literals
    and return the exact row set (the verdict's done-criterion)."""
    from tape_spark.utils.io import filter_in_chunked

    p = str(tmp_path / "sorted_store")
    (
        spark.range(0, 60_000)
        .select(F.xxhash64("id").alias("v"), F.col("id"))
        .sort("v")
        .coalesce(1)
        .write.parquet(p)
    )
    df = spark.read.parquet(p)
    # 5k existing values (so the filter tree is actually evaluated
    # against populated pages, not pruned away by min/max alone)
    literals = [r["v"] for r in df.limit(5000).collect()]
    old = spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold", None)
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "100000")
    try:
        out = filter_in_chunked(df, "v", literals)
        assert out.count() == len(set(literals))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # every scan slice actually pushed its literals
        assert "PushedFilters: [" in plan and "In(v" in plan, plan
    finally:
        if old is None:
            spark.conf.unset("spark.sql.parquet.pushdown.inFilterThreshold")
        else:
            spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", old)


def _neardup_corpus(spark, n=8, id_base=100):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (id_base + i, f"{base} doc{i} " + " ".join(f"c{i}w{j}" for j in range(10)))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_match_batch_push_bucket_in_equals_default(spark, tmp_path):
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import minhash_match_batch, minhash_save_store

    corpus_rows, corpus = _neardup_corpus(spark)
    sigs = minhash_signatures(corpus).persist()
    store = str(tmp_path / "store_push")
    minhash_save_store(sigs, store, num_entry_buckets=8, num_sig_buckets=4)
    arriving = spark.createDataFrame(
        [(i, corpus_rows[i][1] + " extra tail") for i in range(4)],
        "doc_id long, text string",
    )
    want = sorted(
        tuple(r)
        for r in minhash_match_batch(arriving, store, threshold=0.3).collect()
    )
    assert want
    with pytest.warns(UserWarning, match="diagnostic"):
        pushed = minhash_match_batch(
            arriving, store, threshold=0.3, push_bucket_in=True
        )
    assert sorted(tuple(r) for r in pushed.collect()) == want
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "In(bucket" in plan or "bucket IN" in plan, plan
    sigs.unpersist()


# ------------------------------------------------------------- sentinel


def test_rebucket_sentinel_blocks_store_paths(spark, tmp_path):
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_append_store,
        minhash_compact_store,
        minhash_match_batch,
        minhash_rebucket_store,
        minhash_save_store,
    )
    from tape_spark.utils.io import REBUCKET_SENTINEL, write_rebucket_sentinel

    _, corpus = _neardup_corpus(spark, n=4)
    sigs = minhash_signatures(corpus)
    store = str(tmp_path / "store_sent")
    minhash_save_store(sigs, store, num_entry_buckets=4, num_sig_buckets=2)
    write_rebucket_sentinel(store)  # simulate a crash mid-rebucket
    probe = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="rebucket"):
        minhash_match_batch(probe, store, threshold=0.3).collect()
    with pytest.raises(RuntimeError, match="rebucket"):
        minhash_append_store(probe, store)
    with pytest.raises(RuntimeError, match="rebucket"):
        minhash_compact_store(spark, store)
    # the documented repair: re-run the rebucket verb — clears the sentinel
    minhash_rebucket_store(spark, store, num_entry_buckets=8)
    assert not os.path.exists(os.path.join(store, REBUCKET_SENTINEL))
    assert minhash_match_batch(probe, store, threshold=0.3).count() >= 0


def test_rebucket_sentinel_blocks_bm25_paths(spark, tmp_path):
    from tape_spark.operators import (
        bm25_build_index,
        bm25_compact_index,
        bm25_load_index,
        bm25_rebucket_index,
        bm25_save_index,
    )
    from tape_spark.operators.retrieval import bm25_append_index
    from tape_spark.utils.io import REBUCKET_SENTINEL, write_rebucket_sentinel

    docs = spark.createDataFrame(
        [(1, "spark shuffles data"), (2, "ducks like data lakes")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25_sent")
    postings, stats = bm25_build_index(docs, num_term_buckets=4)
    bm25_save_index(postings, stats, idx)
    write_rebucket_sentinel(idx)
    with pytest.raises(RuntimeError, match="rebucket"):
        bm25_load_index(spark, idx)
    with pytest.raises(RuntimeError, match="rebucket"):
        bm25_append_index(
            spark.createDataFrame([(3, "more data")], "doc_id long, text string"),
            idx,
        )
    with pytest.raises(RuntimeError, match="rebucket"):
        bm25_compact_index(spark, idx)
    # re-running the rebucket verb repairs and clears
    bm25_rebucket_index(spark, idx, num_term_buckets=8)
    assert not os.path.exists(os.path.join(idx, REBUCKET_SENTINEL))
    p2, s2 = bm25_load_index(spark, idx)
    assert p2.count() == postings.count()


def test_save_store_clears_stale_sentinel(spark, tmp_path):
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import minhash_match_batch, minhash_save_store
    from tape_spark.utils.io import REBUCKET_SENTINEL, write_rebucket_sentinel

    _, corpus = _neardup_corpus(spark, n=4)
    store = str(tmp_path / "store_resave")
    minhash_save_store(minhash_signatures(corpus), store,
                       num_entry_buckets=4, num_sig_buckets=2)
    write_rebucket_sentinel(store)
    # a FULL rewrite is as good a repair as re-running the rebucket verb
    minhash_save_store(minhash_signatures(corpus), store,
                       num_entry_buckets=4, num_sig_buckets=2)
    assert not os.path.exists(os.path.join(store, REBUCKET_SENTINEL))
    probe = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    assert minhash_match_batch(probe, store, threshold=0.3).count() >= 0


# -------------------------------------------------------- marker folding


def test_compact_folds_store_markers(spark, tmp_path):
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_append_store,
        minhash_compact_store,
        minhash_match_batch,
    )
    from tape_spark.streaming.neardup import _read_store_markers
    from tape_spark.streaming import minhash_save_store

    corpus_rows, corpus = _neardup_corpus(spark, n=4)
    store = str(tmp_path / "store_fold")
    minhash_save_store(minhash_signatures(corpus), store,
                       num_entry_buckets=4, num_sig_buckets=2)
    for i in range(3):
        newdoc = spark.createDataFrame(
            [(500 + i, f"fresh doc {i} " + " ".join(f"n{i}x{j}" for j in range(12)))],
            "doc_id long, text string",
        )
        minhash_append_store(newdoc, store, batch_id=f"b{i}")
    batches_dir = os.path.join(store, "batches")
    files_before = [f for f in os.listdir(batches_dir) if f.endswith(".parquet")]
    # at least one file per trigger (observed: 2 part files per write)
    assert len(files_before) >= 3
    res = minhash_compact_store(spark, store)
    assert res["marker_files_before"] == len(files_before)
    files_after = [f for f in os.listdir(batches_dir) if f.endswith(".parquet")]
    assert len(files_after) == 1
    # ids preserved exactly: applied batches stay no-ops on retry
    assert _read_store_markers(spark, store) == {"b0", "b1", "b2"}
    n_sigs = spark.read.parquet(f"{store}/sigs").count()
    dup = spark.createDataFrame(
        [(500, "retry of applied batch")], "doc_id long, text string"
    )
    minhash_append_store(dup, store, batch_id="b0")  # marker-checked no-op
    assert spark.read.parquet(f"{store}/sigs").count() == n_sigs
    probe = spark.createDataFrame(
        [(9, corpus_rows[0][1])], "doc_id long, text string"
    )
    assert minhash_match_batch(probe, store, threshold=0.3).count() >= 1


def test_bm25_compact_folds_markers(spark, tmp_path):
    from tape_spark.operators import (
        bm25_build_index,
        bm25_compact_index,
        bm25_save_index,
    )
    from tape_spark.operators.retrieval import (
        _read_batch_markers,
        bm25_append_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha data"), (2, "beta data")], "doc_id long, text string"
    )
    idx = str(tmp_path / "bm25_fold")
    p, s = bm25_build_index(docs, num_term_buckets=4)
    bm25_save_index(p, s, idx)
    for i in range(3):
        bm25_append_index(
            spark.createDataFrame(
                [(10 + i, f"gamma doc {i}")], "doc_id long, text string"
            ),
            idx,
            batch_id=f"a{i}",
        )
    res = bm25_compact_index(spark, idx)
    assert res["marker_files_before"] >= 3
    files_after = [
        f
        for f in os.listdir(os.path.join(idx, "batches"))
        if f.endswith(".parquet")
    ]
    assert len(files_after) == 1
    assert _read_batch_markers(spark, idx) == {"a0", "a1", "a2"}


# ------------------------------------------------ rerank guard + cutoff


def test_parse_size_bytes():
    from tape_spark.operators.quantization import _parse_size_bytes

    assert _parse_size_bytes("10485760") == 10 * 1024 * 1024
    assert _parse_size_bytes("10MB") == 10 * 1024 * 1024
    assert _parse_size_bytes("1g") == 1 << 30
    assert _parse_size_bytes("512k") == 512 * 1024
    assert _parse_size_bytes("-1") == -1
    assert _parse_size_bytes("  2Gb ") == 2 << 30


def test_rerank_broadcast_cutoff_is_config_aware(spark):
    from tape_spark.operators.quantization import _rerank_broadcast_cutoff_bytes

    base = _rerank_broadcast_cutoff_bytes(spark)
    assert 0 < base <= 512 * 1024 * 1024
    try:
        # admin disabled broadcasts entirely -> the hint is never applied
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert _rerank_broadcast_cutoff_bytes(spark) == 0
        # explicit override wins over everything
        spark.conf.set("spark.tape.rerank.broadcastCutoffBytes", "123456")
        assert _rerank_broadcast_cutoff_bytes(spark) == 123456
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.tape.rerank.broadcastCutoffBytes")


def _ivfpq_inputs(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(30):
            v = c + 0.05 * rng.normal(size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(rows[:3], "query_id long, embedding array<float>")
    return corpus, queries


def test_rerank_collect_guard_falls_back_to_checkpoint(spark):
    """Past the collect row bound the shortlist must materialize
    executor-side (localCheckpoint) with IDENTICAL results — the driver
    never holds |queries| x n_short rows."""
    from tape_spark.operators import ivfpq_cosine_topk

    corpus, queries = _ivfpq_inputs(spark)
    kwargs = dict(k=5, num_clusters=4, nprobe=4, m=4, num_centroids=16,
                  rerank_factor=4)
    want = sorted(
        map(tuple, ivfpq_cosine_topk(corpus, queries, **kwargs).collect())
    )
    try:
        # 3 queries x 20 shortlist rows = 60 > 10 -> fallback engages
        spark.conf.set("spark.tape.rerank.collectRowLimit", "10")
        got = sorted(
            map(tuple, ivfpq_cosine_topk(corpus, queries, **kwargs).collect())
        )
    finally:
        spark.conf.unset("spark.tape.rerank.collectRowLimit")
    assert got == want


def test_rerank_shuffle_fallback_under_disabled_broadcasts(spark):
    """With session broadcasts disabled the covered-slice hint must be
    dropped (shuffle fallback) and the result must be unchanged."""
    from tape_spark.operators import ivfpq_cosine_topk

    corpus, queries = _ivfpq_inputs(spark)
    kwargs = dict(k=5, num_clusters=4, nprobe=4, m=4, num_centroids=16,
                  rerank_factor=4)
    want = sorted(
        map(tuple, ivfpq_cosine_topk(corpus, queries, **kwargs).collect())
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        res = ivfpq_cosine_topk(corpus, queries, **kwargs)
        got = sorted(map(tuple, res.collect()))
        plan = res._jdf.queryExecution().executedPlan().toString()
        # the rerank outer join can no longer be a broadcast join
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert got == want


# ------------------------------------------------- sampled auto decision


def test_auto_mode_sampled_measurement_same_result(spark, monkeypatch):
    """Force the sampled measurement pass on a small corpus: the decision
    must record a sub-1 sample fraction and the returned pairs must be
    unchanged (sampling affects only the measurement, never the join)."""
    import tape_spark.operators.dedup as dd
    from tape_spark.operators import minhash_near_duplicates

    text = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(100, text), (101, text + " tail")]
        + [(200 + i, f"unique doc {i} " + " ".join(f"u{i}x{j}" for j in range(12)))
           for i in range(20)],
        "doc_id long, text string",
    )
    want = {(r.id_a, r.id_b) for r in
            minhash_near_duplicates(docs, join_mode="fused", threshold=0.5).collect()}
    monkeypatch.setattr(dd, "_AUTO_TARGET_ENTRIES", 64)
    got = {(r.id_a, r.id_b) for r in
           minhash_near_duplicates(docs, join_mode="auto", threshold=0.5).collect()}
    assert got == want == {(100, 101)}
    dec = dd._LAST_AUTO_DECISION
    assert 0 < dec["sample_fraction"] < 1
    assert dec["picked"] in ("fused", "slim")


def test_auto_mode_sampled_estimator_is_calibrated(spark, monkeypatch):
    """On a corpus with one heavy planted cluster the sampled C-hat must
    land within 2x of the exact count — the decision boundary is a 6x
    volume ratio, so 2x estimator error cannot flip a non-borderline
    pick."""
    import tape_spark.operators.dedup as dd
    from tape_spark.operators import minhash_near_duplicates, minhash_signatures

    text = " ".join(f"shared{i}" for i in range(25))
    rows = [(i, text + f" v{i % 3}") for i in range(400)] + [
        (1000 + i, f"solo {i} " + " ".join(f"s{i}y{j}" for j in range(10)))
        for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs).persist()
    # exact C
    minhash_near_duplicates(docs, signatures=sigs, join_mode="auto",
                            threshold=0.9).count()
    exact_c = dd._LAST_AUTO_DECISION["candidate_pairs"]
    assert dd._LAST_AUTO_DECISION["sample_fraction"] == 1.0
    assert exact_c > 10_000  # the planted cluster dominates
    # sampled C-hat at ~p=0.25
    monkeypatch.setattr(dd, "_AUTO_TARGET_ENTRIES", 2_000)
    minhash_near_duplicates(docs, signatures=sigs, join_mode="auto",
                            threshold=0.9).count()
    est = dd._LAST_AUTO_DECISION
    assert est["sample_fraction"] < 1
    assert exact_c / 2 <= est["candidate_pairs"] <= exact_c * 2, (
        exact_c, est["candidate_pairs"], est["sample_fraction"],
    )
    sigs.unpersist()

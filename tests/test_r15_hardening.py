"""Round-15 hardening: marker-fold crash recovery (a crashed
atomic_replace_parquet swap of {path}/batches must roll forward, not read
as "no markers applied"), NULL-``by``-key parity for the salted asof plan,
the bounded + warning-gated diagnostic ``push_bucket_in``, auto-derived
``salt_slices``, the ``suggest_num_buckets`` coverage-rule advisor, the
``_plan_row_estimate`` private-API guard, and the memoized single-SQL
banding/verify kernels."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _crash_swap(dirpath: str) -> None:
    """Simulate a crash BETWEEN atomic_replace_parquet's two renames: the
    live dir has moved to __compact_old and the tmp (fully written) has
    not moved in yet — the live path is missing, data intact."""
    os.rename(dirpath, dirpath + "__compact_tmp")


def _neardup_corpus(spark, n=6, id_base=100):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (id_base + i, f"{base} doc{i} " + " ".join(f"c{i}w{j}" for j in range(10)))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


# -------------------------------------------------- marker-fold recovery


def test_store_marker_crash_rolls_forward_and_retry_is_noop(spark, tmp_path):
    """A crash between the marker-fold renames leaves {store}/batches
    missing; without recovery a retried append reads the marker set as
    EMPTY and double-inserts its batch."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import minhash_append_store, minhash_save_store
    from tape_spark.streaming.neardup import _read_store_markers

    _, corpus = _neardup_corpus(spark, n=4)
    store = str(tmp_path / "store_crash")
    minhash_save_store(
        minhash_signatures(corpus), store, num_entry_buckets=4, num_sig_buckets=2
    )
    arriving = spark.createDataFrame(
        [(900, "zeta eta theta brand new arrival doc")], "doc_id long, text string"
    )
    minhash_append_store(arriving, store, batch_id="b0")
    n_sigs = spark.read.parquet(f"{store}/sigs").count()
    assert _read_store_markers(spark, store) == {"b0"}

    _crash_swap(f"{store}/batches")
    assert not os.path.exists(f"{store}/batches")
    # the reader repairs the swap instead of reporting an empty set ...
    assert _read_store_markers(spark, store) == {"b0"}
    # ... so the retried append is the no-op the batch contract promises
    minhash_append_store(arriving, store, batch_id="b0")
    assert spark.read.parquet(f"{store}/sigs").count() == n_sigs


def test_bm25_marker_crash_does_not_double_count_stats(spark, tmp_path):
    from tape_spark.operators import bm25_build_index, bm25_save_index
    from tape_spark.operators.retrieval import (
        _read_batch_markers,
        bm25_append_index,
    )

    docs = spark.createDataFrame(
        [(1, "spark shuffles data"), (2, "ducks like data lakes")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25_crash")
    postings, stats = bm25_build_index(docs, num_term_buckets=4)
    bm25_save_index(postings, stats, idx)
    newdocs = spark.createDataFrame(
        [(3, "parquet footers are tiny")], "doc_id long, text string"
    )
    bm25_append_index(newdocs, idx, batch_id="a0")
    srows = spark.read.parquet(f"{idx}/stats").count()

    _crash_swap(f"{idx}/batches")
    assert _read_batch_markers(spark, idx) == {"a0"}
    bm25_append_index(newdocs, idx, batch_id="a0")  # retry: must be a no-op
    assert spark.read.parquet(f"{idx}/stats").count() == srows


def test_load_index_and_store_meta_recover_crashed_swaps(spark, tmp_path):
    from tape_spark.operators import bm25_build_index, bm25_save_index
    from tape_spark.operators.retrieval import bm25_load_index
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import minhash_save_store
    from tape_spark.streaming.neardup import _load_store_meta

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    idx = str(tmp_path / "bm25_loadcrash")
    postings, stats = bm25_build_index(docs, num_term_buckets=2)
    bm25_save_index(postings, stats, idx)
    _crash_swap(f"{idx}/stats")
    _, st = bm25_load_index(spark, idx)
    assert st.count() == 1

    _, corpus = _neardup_corpus(spark, n=3)
    store = str(tmp_path / "store_metacrash")
    minhash_save_store(
        minhash_signatures(corpus), store, num_entry_buckets=2, num_sig_buckets=2
    )
    _crash_swap(f"{store}/meta")
    assert _load_store_meta(spark, store)["bands"] == 16


# -------------------------------------------- salted asof: NULL by keys


def _null_by_frames(seed=47, n_left=120, n_right=80):
    rng = np.random.default_rng(seed)
    keys = ["a", "b", None]
    left = pd.DataFrame(
        {
            "key": [keys[i % 3] for i in range(n_left)],
            "t": rng.uniform(0, 1000, n_left).round(1),
            "qty": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "key": [keys[i % 3] for i in range(n_right)],
            "t": rng.uniform(0, 1000, n_right).round(1),
            "px": rng.uniform(1, 2, n_right).round(4),
        }
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_salted_null_by_key_parity(spark, direction):
    """NULL ``by`` keys group together in both the window partitioning
    and the carry aggregate; the carry JOIN must be null-safe on the by
    keys or NULL-key left rows silently lose their cross-slice matches.
    Salted output must equal the unsalted plan row-for-row."""
    from tape_spark.operators.joins import asof_join

    left, right = _null_by_frames()
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)

    def rows(salt):
        out = [
            (r["key"], r["t"], r["qty"], r["t_r"], r["px"])
            for r in asof_join(
                sl, sr, on="t", by="key", direction=direction,
                salt_slices=salt,
            ).collect()
        ]
        return sorted(
            out,
            key=lambda tup: tuple(
                (v is None, 0 if v is None else v) for v in tup
            ),
        )

    assert rows(5) == rows(None)
    # and the NULL-key group really does carry across slices: at 5 slices
    # some NULL-key left rows' predecessors are in earlier slices, so a
    # null-rejecting carry join would show as missing px values here
    nulls_matched = [r for r in rows(5) if r[0] is None and r[4] is not None]
    assert nulls_matched


# ------------------------------------- push_bucket_in: diagnostic + bound


def test_push_bucket_in_warns_and_falls_back_past_bound(spark, tmp_path):
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import minhash_match_batch, minhash_save_store

    corpus_rows, corpus = _neardup_corpus(spark)
    store = str(tmp_path / "store_pushbound")
    minhash_save_store(
        minhash_signatures(corpus), store, num_entry_buckets=8, num_sig_buckets=4
    )
    arriving = spark.createDataFrame(
        [(i, corpus_rows[i][1] + " tail") for i in range(3)],
        "doc_id long, text string",
    )
    want = sorted(
        tuple(r) for r in minhash_match_batch(arriving, store, threshold=0.3).collect()
    )
    assert want
    # enabling the diagnostic flag warns, citing the r14 measurement
    with pytest.warns(UserWarning, match="diagnostic"):
        pushed = minhash_match_batch(
            arriving, store, threshold=0.3, push_bucket_in=True
        )
    assert sorted(tuple(r) for r in pushed.collect()) == want
    # past the probe-pair bound: falls back to pbucket-only pruning —
    # identical rows, NO bucket IN-filter in the plan
    spark.conf.set("spark.tape.match.maxPushedBuckets", "1")
    try:
        with pytest.warns(UserWarning, match="diagnostic"):
            capped = minhash_match_batch(
                arriving, store, threshold=0.3, push_bucket_in=True
            )
        assert sorted(tuple(r) for r in capped.collect()) == want
        plan = capped._jdf.queryExecution().executedPlan().toString()
        assert "In(bucket" not in plan, plan
    finally:
        spark.conf.unset("spark.tape.match.maxPushedBuckets")


# ------------------------------------------------- auto salt_slices


def _celebrity_frames(spark):
    left = spark.createDataFrame(
        [("hot", float(t), t) for t in range(400)]
        + [("cold", float(t), 1000 + t) for t in range(20)],
        "key string, t double, qty long",
    )
    right = spark.createDataFrame(
        [("hot", float(t) + 0.5, float(t)) for t in range(0, 400, 5)]
        + [("cold", 7.5, 1.25)],
        "key string, t double, px double",
    )
    return left, right


def test_asof_guard_error_names_computed_salt(spark):
    from tape_spark.operators.joins import asof_join

    left, right = _celebrity_frames(spark)
    with pytest.raises(ValueError, match=r"salt_slices=5"):
        asof_join(left, right, on="t", by="key", max_rows_per_key=100).collect()


def test_asof_auto_salt_matches_unsalted(spark):
    from tape_spark.operators.joins import asof_join

    left, right = _celebrity_frames(spark)

    def rows(**kw):
        return sorted(
            (r["key"], r["t"], r["qty"], r["t_r"], r["px"])
            for r in asof_join(left, right, on="t", by="key", **kw).collect()
        )

    want = rows()
    # auto derives S=ceil(480/100)=5 from the guard count and salts
    # instead of raising; results identical to the unsalted plan
    assert rows(max_rows_per_key=100, salt_slices="auto") == want
    # no hot key at a loose bound: auto degrades to the unsalted plan
    assert rows(max_rows_per_key=10_000, salt_slices="auto") == want


def test_asof_explicit_salt_relaxes_guard(spark):
    """With an explicit salt the guard bounds per-SLICE rows (~n/S): a
    sufficient S passes where the unsalted call raises; an insufficient
    one still raises, naming the S that would do."""
    from tape_spark.operators.joins import asof_join

    left, right = _celebrity_frames(spark)
    ok = asof_join(
        left, right, on="t", by="key", max_rows_per_key=100, salt_slices=8
    )
    assert ok.count() == 420
    with pytest.raises(ValueError, match=r"already salted.*salt_slices=5"):
        asof_join(
            left, right, on="t", by="key", max_rows_per_key=100, salt_slices=2
        ).collect()


def test_asof_auto_salt_validation(spark):
    from tape_spark.operators.joins import asof_join

    left, right = _celebrity_frames(spark)
    with pytest.raises(ValueError, match="max_rows_per_key"):
        asof_join(left, right, on="t", by="key", salt_slices="auto")
    with pytest.raises(ValueError, match="int or 'auto'"):
        asof_join(left, right, on="t", by="key", salt_slices="many")


# ---------------------------------------------- suggest_num_buckets


def test_suggest_num_buckets_flips_between_measured_anchors():
    """The r14 anchors (docs/SCALING.md, cold_pointlookup*): the 5 M-doc
    store wants 320 buckets for 8-doc point lookups and 64 for
    coverage-saturating 100-doc triggers."""
    from tape_spark.streaming import suggest_num_buckets

    point = suggest_num_buckets(5_000_000, 8, bands=16)
    assert point["regime"] == "point-lookup"
    assert point["num_buckets"] == 320
    assert point["expected_coverage"] < 0.5

    scan = suggest_num_buckets(5_000_000, 100, bands=16)
    assert scan["regime"] == "scan-saturated"
    assert scan["num_buckets"] == 64
    assert scan["expected_coverage"] > 0.99

    with pytest.raises(ValueError):
        suggest_num_buckets(0, 8)


def test_suggest_num_buckets_for_store(spark, tmp_path):
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import minhash_save_store, suggest_num_buckets_for_store

    _, corpus = _neardup_corpus(spark, n=5)
    store = str(tmp_path / "store_suggest")
    minhash_save_store(
        minhash_signatures(corpus), store, num_entry_buckets=4, num_sig_buckets=2
    )
    out = suggest_num_buckets_for_store(spark, store, expected_trigger_docs=2)
    assert out["current_num_buckets"] == 4
    assert out["total_entries"] == 5 * 16
    assert out["num_buckets"] >= 8  # floor


# ------------------------------------------- _plan_row_estimate guard


def test_plan_row_estimate_degrades_to_none_on_private_api_drift(spark):
    from tape_spark.operators.dedup import _plan_row_estimate

    class _Broken:
        @property
        def _jdf(self):
            raise AttributeError("py4j surface moved")

    assert _plan_row_estimate(_Broken()) is None
    # and the real surface still works on a count-known relation
    df = spark.range(10).persist()
    df.count()
    est = _plan_row_estimate(df)
    assert est is None or est == 10
    df.unpersist()


def test_auto_mode_row_estimate_uses_pre_guard_frame(spark):
    """The plan-embedded width guard is a Filter node, and Filter hides
    a cached relation's exact rowCount from the stats visitor — so auto
    mode must estimate from the PRE-guard signatures frame, or every
    auto call on a caller-provided cache pays a full count() job (the
    r15 auto-wall regression: 2.5 s -> 9-12 s at 1 M docs)."""
    from tape_spark.operators.dedup import (
        _plan_row_estimate,
        minhash_near_duplicates,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"some shared words plus row {i}") for i in range(40)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, num_hashes=16).persist()
    sigs.count()
    try:
        direct = _plan_row_estimate(sigs)
        guarded = _plan_row_estimate(
            sigs.filter(F.assert_true(F.size("signature") == 16).isNull())
        )
        # the premise: the guard filter really does hide the count
        assert direct == 40
        assert guarded is None
        # and auto mode still works end-to-end on the guarded path
        out = minhash_near_duplicates(
            docs, num_hashes=16, bands=4, threshold=0.9,
            signatures=sigs, join_mode="auto",
        )
        assert out.columns == ["id_a", "id_b", "est_jaccard"]
        out.collect()
    finally:
        sigs.unpersist()


# --------------------------------------- cross-trigger store cache (r15)


def test_read_parquet_snapshot_is_frozen_and_does_not_poison_dir_reads(
    spark, tmp_path
):
    """Persisting a DIR-rooted read makes every later read of the dir
    return the stale cache after out-of-band appends (Spark substitutes
    cached plans by root-path-canonicalized equality). The snapshot read
    roots at the files, so fresh dir reads stay correct while the cache
    is live, and the snapshot itself stays frozen."""
    from pyspark import StorageLevel

    from tape_spark.utils.io import read_parquet_snapshot

    p = str(tmp_path / "snap")
    spark.range(0, 10).withColumn("part", F.pmod("id", F.lit(2)).cast("int")) \
        .write.partitionBy("part").parquet(p)
    snap = read_parquet_snapshot(spark, p).persist(StorageLevel.MEMORY_AND_DISK)
    assert snap.count() == 10
    assert set(snap.columns) == {"id", "part"}  # basePath keeps partitions
    spark.range(100, 105).withColumn("part", F.lit(0)) \
        .write.mode("append").partitionBy("part").parquet(p)
    try:
        # fresh dir read sees the append even with the snapshot cached
        assert spark.read.parquet(p).count() == 15
        assert snap.count() == 10  # the snapshot stays a snapshot
    finally:
        snap.unpersist()
    with pytest.raises(FileNotFoundError):
        read_parquet_snapshot(spark, str(tmp_path / "missing"))


def test_foreach_batch_cached_equals_uncached_and_disk_stays_fresh(
    spark, tmp_path
):
    """The cache_store loop must produce the same per-trigger matches as
    the scan-per-trigger loop, grow the store exactly once per batch, and
    leave direct dir reads correct while the stream's cache is live."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_match_batch,
        minhash_match_foreach_batch,
        minhash_save_store,
    )

    corpus_rows, corpus = _neardup_corpus(spark, n=6)

    def run(cache):
        store = str(tmp_path / f"store_cache_{cache}")
        minhash_save_store(
            minhash_signatures(corpus), store,
            num_entry_buckets=4, num_sig_buckets=2,
        )
        fn = minhash_match_foreach_batch(
            store,
            lambda df, bid: got.append(
                sorted((r[0], r[1]) for r in df.collect())
            ),
            threshold=0.3,
            append_arrivals=True,
            cache_store=cache,
        )
        got = []
        # trigger 0: near-copies of corpus docs 0-1; trigger 1: a
        # near-copy of TRIGGER 0's arrival 900 (only matchable through
        # the delta/cache growth) plus a fresh doc
        t0 = spark.createDataFrame(
            [(900 + i, corpus_rows[i][1] + " tail") for i in range(2)],
            "doc_id long, text string",
        )
        t1 = spark.createDataFrame(
            [(950, corpus_rows[0][1] + " tail extra"),
             (951, "totally fresh words nothing shared")],
            "doc_id long, text string",
        )
        fn(t0, 0)
        fn(t1, 1)
        return store, got

    store_c, got_c = run(True)
    store_u, got_u = run(False)
    assert got_c == got_u
    # trigger 1's arrival 950 found trigger 0's appended 900 via the cache
    assert any(pair[1] == 900 for pair in got_c[1])
    # disk reads are NOT poisoned by the live cache: a fresh batch match
    # straight off the dir sees both appended batches
    probe = spark.createDataFrame(
        [(999, corpus_rows[0][1] + " tail")], "doc_id long, text string"
    )
    ids_c = sorted(
        r["corpus_id"]
        for r in minhash_match_batch(probe, store_c, threshold=0.3).collect()
    )
    ids_u = sorted(
        r["corpus_id"]
        for r in minhash_match_batch(probe, store_u, threshold=0.3).collect()
    )
    assert ids_c == ids_u and 900 in ids_c
    assert (
        spark.read.parquet(f"{store_c}/sigs").count()
        == spark.read.parquet(f"{store_u}/sigs").count()
        == 6 + 4
    )


def test_persisted_inputs_reach_plans_as_inmemory_scans(spark, tmp_path):
    """Cache-linkage lock: a persisted caller signatures frame must be
    served from the cache by the slim join, and the cross-trigger store
    cache's persisted frames by the matcher. A single parameterized
    spark.sql(..., frame=...) call LOOKS equivalent but substitutes the
    frame through a temp view, whose re-resolved plan no longer matches
    the persisted plan in the cache manager — the r15 regression this
    test pins: plans silently degraded to fresh FileScans (full store
    re-reads per trigger, full signature recompute per action)."""
    from pyspark import StorageLevel

    from tape_spark.operators import minhash_signatures
    from tape_spark.operators.dedup import minhash_near_duplicates
    from tape_spark.streaming import minhash_match_batch, minhash_save_store
    from tape_spark.utils.io import read_parquet_snapshot

    corpus_rows, corpus = _neardup_corpus(spark, n=6)
    sigs = minhash_signatures(corpus).persist()
    sigs.count()
    try:
        out = minhash_near_duplicates(
            corpus.select("doc_id"), num_hashes=64, bands=16, threshold=0.3,
            signatures=sigs, join_mode="slim",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        # the signature pipeline (shingle + minhash UDF) must NOT appear
        # outside the cached subtree: no scan of the source table
        assert "Scan ExistingRDD" not in plan.split("InMemoryRelation")[0]
    finally:
        sigs.unpersist()

    store = str(tmp_path / "store_linkage")
    minhash_save_store(
        minhash_signatures(corpus), store,
        num_entry_buckets=4, num_sig_buckets=2,
    )
    e = read_parquet_snapshot(spark, f"{store}/entries").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    s = read_parquet_snapshot(spark, f"{store}/sigs").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    e.count(), s.count()
    try:
        probe = spark.createDataFrame(
            [(900, corpus_rows[0][1] + " tail")], "doc_id long, text string"
        )
        m = minhash_match_batch(
            probe, store, threshold=0.3, _store_entries=e, _store_sigs=s
        )
        plan = m._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2
        # neither store table may fall back to its parquet files
        assert f"{store}/entries" not in plan.replace("\n", " ").split(
            "InMemoryRelation"
        )[0]
        assert m.count() >= 1
    finally:
        e.unpersist()
        s.unpersist()


# ------------------------------------- memoized single-SQL plan kernels


def test_kernel_sql_builders_are_memoized_and_correct(spark):
    from tape_spark.operators.dedup import (
        _band_struct_sql,
        _est_jaccard,
        _est_jaccard_sql,
        _first_agreeing_band,
    )

    assert _band_struct_sql(4, 2) is _band_struct_sql(4, 2)  # lru_cache hit
    assert _est_jaccard_sql("__sig_a", "__sig_b", 8) is _est_jaccard_sql(
        "__sig_a", "__sig_b", 8
    )
    df = spark.range(3).select(
        F.array(*[F.xxhash64("id", F.lit(i)) for i in range(8)]).alias("sa"),
        F.array(*[F.xxhash64("id", F.lit(i)) for i in range(8)]).alias("sb"),
    )
    rows = df.select(
        _est_jaccard("sa", "sb", 8).alias("e"),
        _first_agreeing_band("sa", "sb", 4, 2).alias("fb"),
    ).collect()
    assert all(r["e"] == 1.0 and r["fb"] == 0 for r in rows)


# --------------------------- batch text/curation fragment conversions
# The r15 verdict measured 0.18-0.32 s of per-call Column-API py4j plan
# construction in the q7/q10 batch ops; they now build from memoized SQL
# fragments (utils/sqlfrag.py). These tests pin the conversion to the
# EXACT legacy Column semantics on the adversarial shapes (NULL / empty /
# whitespace-only text, quotes and backslashes in values and salts) so a
# fragment-escaping bug cannot drift the oracle-hashed driver rows.


def _edge_docs(spark):
    return spark.createDataFrame(
        [
            (1, None, None),
            (2, "", "en"),
            (3, "   ", "de"),
            (4, "\t\n  x ", None),
            (5, "the and of to is in that it", "en"),
            (6, "你好 世界 一二三", "zh"),
            (7, "a'b \\ backslash 'quoted'", "weird'quote"),
            (8, "est est une une le la les et dans", "fr"),
            (9, ".,!?;: only punct", "es"),
        ],
        "doc_id long, text string, lang string",
    )


def test_language_id_fragments_match_legacy_column_semantics(spark):
    from tape_spark.operators.text import (
        CJK_PATTERN,
        LANG_STOPWORDS,
        _language_id_fragments,
        _stopword_hits,
        language_id,
    )

    # memoized: the fragment tuples are built once per (text_col, id_col)
    assert _language_id_fragments("text", "doc_id") is _language_id_fragments(
        "text", "doc_id"
    )
    docs = _edge_docs(spark)
    scored = docs.select(
        F.col("doc_id"),
        *[
            _stopword_hits(F.col("text"), ws).alias(f"score_{lang}")
            for lang, ws in LANG_STOPWORDS.items()
        ],
        F.col("text").rlike(CJK_PATTERN).alias("has_cjk"),
    )
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(F.col("has_cjk"), F.lit("zh")).when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    legacy = scored.select(F.col("doc_id"), pred.alias("pred_lang"))
    assert sorted(map(tuple, language_id(docs).collect())) == sorted(
        map(tuple, legacy.collect())
    )


def test_text_quality_fragments_match_legacy_column_semantics(spark):
    from tape_spark.operators.text import PUNCT_CLASS, text_quality

    docs = _edge_docs(spark)
    text = F.col("text")
    tokens = F.split(F.trim(text), r"\s+")
    n_chars = F.length(text)
    n_tokens = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens))
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    legacy = docs.select(
        F.col("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (
            F.when(
                n_tokens > 0,
                F.length(F.regexp_replace(F.trim(text), r"\s+", "")) / n_tokens,
            ).otherwise(F.lit(0.0))
        ).alias("avg_token_len"),
        (F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))).alias(
            "punct_ratio"
        ),
    )
    got = text_quality(docs)
    assert got.schema == legacy.schema
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, legacy.collect()))


def test_chunk_documents_fragments_match_legacy_column_semantics(spark):
    from tape_spark.operators import chunk_documents

    docs = _edge_docs(spark)
    for ct, ov in ((5, 0), (5, 2), (64, 8)):
        stride = ct - ov
        text = F.trim(F.coalesce(F.col("text"), F.lit("")))
        toks = F.when(F.length(text) == 0, F.array()).otherwise(F.split(text, r"\s+"))
        staged = docs.select(F.col("doc_id"), toks.alias("__toks"))
        chunks = F.expr(
            f"transform(sequence(0, int(greatest(1, ceil((size(__toks) - {ct}) / {stride}) + 1)) - 1), "
            f"i -> slice(__toks, i * {stride} + 1, {ct}))"
        )
        legacy = staged.select(
            F.col("doc_id"), F.posexplode(chunks).alias("chunk_index", "__chunk")
        ).select(
            F.col("doc_id"),
            "chunk_index",
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk"),
            F.sha2(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("chunk_index").cast("string"),
                ),
                256,
            ).alias("chunk_id"),
        )
        got = chunk_documents(docs, chunk_tokens=ct, overlap_tokens=ov)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, legacy.collect())
        ), f"chunk_tokens={ct} overlap={ov}"


def test_md5_unit_sql_matches_column(spark):
    from tape_spark.utils.hashing import md5_unit, md5_unit_sql

    df = spark.createDataFrame(
        [(1,), (2,), (37,), (123456789,)], "doc_id long"
    ).withColumn("s", F.col("doc_id").cast("string"))
    for salt in ("", "x", "s'alt\\y"):
        got = df.select(
            md5_unit(F.col("doc_id"), salt).alias("a"),
            F.expr(md5_unit_sql("`doc_id`", salt)).alias("b"),
        ).collect()
        assert all(r["a"] == r["b"] for r in got), salt


def test_stratified_sample_fragment_matches_legacy_filter(spark):
    from tape_spark.operators import stratified_sample
    from tape_spark.utils.hashing import md5_unit

    docs = _edge_docs(spark)
    fr = {"en": 0.8, "de": 0.35, "weird'quote": 0.5, "zh": 1.0, "es": 0.0}
    salt = "s'alt\\x"
    rate = F.lit(0.1)
    expr = None
    for s, frac in fr.items():
        cond = F.col("lang") == F.lit(s)
        expr = (
            F.when(cond, F.lit(float(frac)))
            if expr is None
            else expr.when(cond, F.lit(float(frac)))
        )
    legacy = docs.filter(md5_unit(F.col("doc_id"), salt) < expr.otherwise(rate))
    got = stratified_sample(
        docs, "lang", fr, default_fraction=0.1, salt=salt
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, legacy.collect()))


def test_text_signals_fragments_match_legacy_column_semantics(spark):
    from tape_spark.operators.text import (
        BPE_ISH_PATTERN,
        CJK_PATTERN,
        LANG_STOPWORDS,
        PUNCT_CLASS,
        _stopword_hits,
        text_signals,
    )

    docs = _edge_docs(spark)
    # note: stopwords become regex alternation branches, so a word with a
    # backslash would be an invalid pattern in BOTH forms — quotes are the
    # escaping hazard the fragment path must handle
    for rep_n, words in ((2, None), (3, ["est", "o'brien"])):
        w = words or LANG_STOPWORDS["en"]
        text = F.col("text")
        ws = F.split(F.trim(text), r"\s+")
        n_chars = F.length(text)
        n_tokens = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(ws))
        n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
        grams = F.when(
            F.size(F.col("__toks")) >= rep_n,
            F.expr(
                f"transform(sequence(1, size(__toks) - {rep_n - 1}), "
                f"i -> array_join(slice(__toks, i, {rep_n}), ' '))"
            ),
        ).otherwise(F.array())
        total = F.size(F.col("__grams"))
        langs = list(LANG_STOPWORDS)
        staged = (
            docs.withColumn("__toks", F.split(F.trim(F.lower(text)), r"\s+"))
            .withColumn("__grams", grams)
            .withColumns(
                {
                    f"__s_{lang}": _stopword_hits(text, ws_)
                    for lang, ws_ in LANG_STOPWORDS.items()
                }
            )
            .withColumn("__cjk", text.rlike(CJK_PATTERN))
            .withColumn(
                "__stop_hits",
                F.col("__s_en") if w == LANG_STOPWORDS["en"] else _stopword_hits(text, w),
            )
        )
        best = F.greatest(*[F.col(f"__s_{lang}") for lang in langs])
        pred = F.when(F.col("__cjk"), F.lit("zh")).when(best <= 0, F.lit("und"))
        for lang in langs:
            pred = pred.when(F.col(f"__s_{lang}") == best, F.lit(lang))
        legacy = staged.select(
            F.col("doc_id"),
            pred.alias("pred_lang"),
            n_chars.cast("long").alias("n_chars"),
            n_tokens.cast("long").alias("n_tokens"),
            (
                F.when(
                    n_tokens > 0,
                    F.length(F.regexp_replace(F.trim(text), r"\s+", "")) / n_tokens,
                ).otherwise(F.lit(0.0))
            ).alias("avg_token_len"),
            (F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))).alias(
                "punct_ratio"
            ),
            (
                F.when(n_tokens > 0, F.col("__stop_hits") / n_tokens).otherwise(
                    F.lit(0.0)
                )
            ).alias("stop_ratio"),
            (
                F.when(
                    total > 0, 1.0 - F.size(F.array_distinct(F.col("__grams"))) / total
                ).otherwise(F.lit(0.0))
            ).alias("rep_ratio"),
            F.regexp_count(F.lower(text), F.lit(BPE_ISH_PATTERN))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
        got = text_signals(docs, rep_n=rep_n, stopwords=words)
        assert got.schema == legacy.schema
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, legacy.collect())
        ), (rep_n, words)


def test_corpus_filter_fragments_match_legacy_column_semantics(spark):
    from tape_spark.operators.text import (
        LANG_STOPWORDS,
        _stopword_hits,
        corpus_filter,
    )

    docs = _edge_docs(spark)
    for kw in (
        {},
        dict(min_tokens=3, max_tokens=6, max_rep_ratio=0.3, min_stop_ratio=0.0,
             min_avg_token_len=1.5, max_avg_token_len=9.0,
             stopwords=["le", "o'brien"], rep_n=3),
    ):
        words = kw.get("stopwords") or LANG_STOPWORDS["en"]
        rep_n = kw.get("rep_n", 2)
        min_tokens = kw.get("min_tokens", 10)
        max_tokens = kw.get("max_tokens", 100_000)
        max_rep_ratio = kw.get("max_rep_ratio", 0.5)
        min_stop_ratio = kw.get("min_stop_ratio", 0.02)
        min_avg_token_len = kw.get("min_avg_token_len", 2.0)
        max_avg_token_len = kw.get("max_avg_token_len", 12.0)
        text = F.col("text")
        ws = F.split(F.trim(text), r"\s+")
        n_tokens = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(ws))
        avg_len = F.when(
            n_tokens > 0,
            F.length(F.regexp_replace(F.trim(text), r"\s+", "")) / n_tokens,
        ).otherwise(F.lit(0.0))
        stop_ratio = F.when(
            n_tokens > 0, _stopword_hits(text, words) / n_tokens
        ).otherwise(F.lit(0.0))
        grams = F.when(
            F.size(F.col("__toks")) >= rep_n,
            F.expr(
                f"transform(sequence(1, size(__toks) - {rep_n - 1}), "
                f"i -> array_join(slice(__toks, i, {rep_n}), ' '))"
            ),
        ).otherwise(F.array())
        total = F.size(F.col("__grams"))
        rep_ratio = F.when(
            total > 0, 1.0 - F.size(F.array_distinct(F.col("__grams"))) / total
        ).otherwise(F.lit(0.0))
        staged = docs.withColumn(
            "__toks", F.split(F.trim(F.lower(text)), r"\s+")
        ).withColumn("__grams", grams)
        reasons = F.concat_ws(
            ",",
            F.when(n_tokens < min_tokens, F.lit("too_short")),
            F.when(n_tokens > max_tokens, F.lit("too_long")),
            F.when(rep_ratio > max_rep_ratio, F.lit("repetitive")),
            F.when(stop_ratio < min_stop_ratio, F.lit("low_stopword")),
            F.when(
                (avg_len < min_avg_token_len) | (avg_len > max_avg_token_len),
                F.lit("odd_token_len"),
            ),
        )
        legacy = staged.select(
            F.col("doc_id"), (reasons == "").alias("keep"), reasons.alias("reasons")
        )
        got = corpus_filter(docs, **kw)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, legacy.collect())
        ), kw


def test_memo_udf_reuses_per_session_and_keys_on_params(spark):
    """memo_udf must hand back the SAME UDF object for equal parameter
    tuples within a session (that is the whole optimization: no per-call
    cloudpickle/JVM registration) while distinct parameters get distinct
    kernels — and repeated operator calls must stay value-identical."""
    from tape_spark.operators.text import (
        _build_unicode_normalize_udf,
        _build_winnow_udf,
    )
    from tape_spark.utils.sqlfrag import memo_udf

    u1 = memo_udf(("t_memo", 5, 4), lambda: _build_winnow_udf(5, 4))
    u2 = memo_udf(("t_memo", 5, 4), lambda: _build_winnow_udf(5, 4))
    u3 = memo_udf(("t_memo", 3, 2), lambda: _build_winnow_udf(3, 2))
    assert u1 is u2
    assert u3 is not u1

    from tape_spark.operators import document_fingerprint, normalize_text

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "Café  du  Mondé"), (3, None)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, document_fingerprint(df).collect()))
    b = sorted(map(tuple, document_fingerprint(df).collect()))
    assert a == b
    n1 = sorted(map(tuple, normalize_text(df, form="NFC", lowercase=True).collect()))
    n2 = sorted(map(tuple, normalize_text(df, form="NFC", lowercase=True).collect()))
    assert n1 == n2
    by_id = {r[0]: r[1] for r in n1}
    assert by_id[2] == "café du mondé"
    assert by_id[3] == ""

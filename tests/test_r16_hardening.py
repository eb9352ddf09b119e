"""Round-16 hardening: the broadcast size guard on the store matcher
(oversized micro-batches degrade to shuffle joins instead of OOMing the
driver), the store-cache memory ceiling, the single-job keyless auto-salt
pre-pass, the filesystem-agnostic entry-file layout probe, the
small-file-packing-aware docs spread gate, and the ADVICE r15 fixes
(escapedStringLiterals fragment guard, memo_udf without an active
session, non-string strata keys, dotted id_col in exact_dedup)."""

from __future__ import annotations

import os
import sys
import warnings

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _neardup_corpus(spark, n=6, id_base=100):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (id_base + i, f"{base} doc{i} " + " ".join(f"c{i}w{j}" for j in range(10)))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def _arrivals(spark):
    # doc 100's text verbatim (a guaranteed match) + one novel doc
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    return spark.createDataFrame(
        [
            (900, f"{base} doc0 " + " ".join(f"c0w{j}" for j in range(10))),
            (901, "entirely novel arrival with no overlap whatsoever here"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture
def store(spark, tmp_path):
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import minhash_save_store

    _, corpus = _neardup_corpus(spark, n=6)
    path = str(tmp_path / "store_r16")
    minhash_save_store(
        minhash_signatures(corpus), path, num_entry_buckets=4, num_sig_buckets=2
    )
    return path


# ---------------------------------------------- broadcast size guard


def test_match_batch_broadcast_guard_falls_back_and_matches_identically(
    spark, store
):
    """With spark.tape.match.maxBroadcastBytes below the batch's exact
    size estimate, every pinned broadcast leg degrades to a Catalyst
    shuffle join (SortMergeJoin in the plan) and the matches are
    row-identical to the broadcast plan."""
    from tape_spark.streaming import minhash_match_batch

    arr = _arrivals(spark)
    baseline = sorted(
        tuple(r)
        for r in minhash_match_batch(arr, store, threshold=0.5).collect()
    )
    assert baseline, "fixture must produce at least one match"
    spark.conf.set("spark.tape.match.maxBroadcastBytes", "1k")
    # emulate the real oversized regime, where Catalyst's own estimate
    # would ALSO decline to broadcast — on toy frames auto-broadcast
    # would otherwise re-add the hash join the guard just dropped
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            guarded = minhash_match_batch(arr, store, threshold=0.5)
            got = sorted(tuple(r) for r in guarded.collect())
            plan = guarded._jdf.queryExecution().executedPlan().toString()
        assert any("maxBroadcastBytes" in str(x.message) for x in w)
        assert got == baseline
        # the guard dropped our pins: shuffle joins appear in the final
        # plan (AQE may still rewrite SOME leg back to broadcast from
        # exact runtime sizes — that is its call, made safely, not ours)
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.tape.match.maxBroadcastBytes")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.catalog.clearCache()


def test_match_batch_default_cap_keeps_broadcast_plan(spark, store):
    """At the default 512m cap a toy batch stays on the designed
    broadcast plan (the guard must not demote the measured anchors)."""
    from tape_spark.streaming import minhash_match_batch

    out = minhash_match_batch(_arrivals(spark), store, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    spark.catalog.clearCache()


def test_parse_size_bytes():
    from tape_spark.streaming.neardup import _parse_size_bytes

    assert _parse_size_bytes("512m") == 512 * 1024**2
    assert _parse_size_bytes("16g") == 16 * 1024**3
    assert _parse_size_bytes("10485760b") == 10 * 1024**2
    assert _parse_size_bytes("1k") == 1024
    assert _parse_size_bytes(1234) == 1234
    assert _parse_size_bytes("2t") == 2 * 1024**4


# ---------------------------------------------- store-cache ceiling


def test_foreach_batch_cache_ceiling_degrades_with_identical_matches(
    spark, store
):
    """A store whose decode estimate exceeds
    spark.tape.match.maxCachedStoreBytes runs scan-per-trigger (no
    persisted store frames) with a warning — matches identical."""
    from tape_spark.streaming import minhash_match_foreach_batch

    arr = _arrivals(spark)

    def run(**kw):
        got = {}

        def sink(matches, batch_id):
            got[batch_id] = sorted(tuple(r) for r in matches.collect())

        fn = minhash_match_foreach_batch(store, sink, threshold=0.5, **kw)
        fn(arr, 0)
        fn(arr, 1)
        return got

    baseline = run(cache_store=False)
    spark.conf.set("spark.tape.match.maxCachedStoreBytes", "1")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            degraded = run(cache_store=True)
        assert any("maxCachedStoreBytes" in str(x.message) for x in w)
        assert degraded == baseline
    finally:
        spark.conf.unset("spark.tape.match.maxCachedStoreBytes")
    # ceiling disabled (0): the cache builds and still matches identically
    spark.conf.set("spark.tape.match.maxCachedStoreBytes", "0")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            cached = run(cache_store=True)
        assert not any("maxCachedStoreBytes" in str(x.message) for x in w)
        assert cached == baseline
    finally:
        spark.conf.unset("spark.tape.match.maxCachedStoreBytes")
    spark.catalog.clearCache()


# ---------------------------------------------- keyless auto-salt pre-pass


def test_keyless_auto_salt_single_union_count_same_s(spark, monkeypatch):
    """The keyless 'auto' pre-pass derives S from ONE union count; the
    derived S equals left+right row count, and the salted result matches
    the unsalted plan row-for-row."""
    import pandas as pd

    import tape_spark.operators.joins as joins_mod
    from tape_spark.utils import keys as keys_mod

    left = spark.createDataFrame(
        pd.DataFrame({"t": [float(i) for i in range(40)], "v": range(40)})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"t": [float(i) + 0.5 for i in range(25)], "r": range(25)})
    )
    seen = {}
    real = keys_mod.suggest_salt_slices

    def spy(total, bound):
        seen["total"] = total
        return real(total, bound)

    monkeypatch.setattr(keys_mod, "suggest_salt_slices", spy)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        salted = joins_mod.asof_join(
            left, right, on="t", salt_slices="auto", max_rows_per_key=10
        )
        plain = joins_mod.asof_join(left, right, on="t")
    assert seen["total"] == 65
    key = lambda r: (r["t"], r["v"])  # noqa: E731
    assert sorted(map(tuple, salted.collect()), key=lambda x: x[:2]) == sorted(
        map(tuple, plain.collect()), key=lambda x: x[:2]
    )


# ---------------------------------------------- entry-file layout probe


def test_parquet_layout_non_local_path_degrades_to_none():
    import __spark_entry__ as em

    assert em._parquet_layout("hdfs://nonexistent-namenode/x.parquet") is None
    assert em._parquet_layout("s3a://no-such-bucket/docs.parquet") is None
    assert em._parquet_layout("/no/such/local/file.parquet") is None
    # and the miss is cached (no repeated probing)
    assert "hdfs://nonexistent-namenode/x.parquet" in em._LAYOUT_CACHE


def test_docs_loader_without_layout_knowledge_returns_plain_scan(
    spark, monkeypatch
):
    import __spark_entry__ as em

    plain = em._read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    monkeypatch.setattr(em, "_parquet_layout", lambda p: None)
    df = em._docs(spark, "/root/testdata/sf0.001")
    assert df.rdd.getNumPartitions() == plain.rdd.getNumPartitions()
    assert df.count() == plain.count()


def test_docs_spread_fires_when_small_files_pack_into_few_partitions(
    spark, tmp_path
):
    """ADVICE r15: footer file count overstates input partitions when
    Spark packs small files; the spread gate must consult the ACTUAL
    scan partitioning."""
    import __spark_entry__ as em

    sf_dir = str(tmp_path / "sfpack")
    src = em._read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    # many tiny files ...
    src.repartition(8).write.parquet(f"{sf_dir}/documents.parquet")
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    spark.conf.set("spark.tape.docs.rowsPerSlice", "100")
    try:
        raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
        packed = raw.rdd.getNumPartitions()
        width = max(
            1,
            min(
                spark.sparkContext.defaultParallelism,
                -(-raw.count() // 100),
            ),
        )
        if packed >= width:
            pytest.skip("packing did not engage on this layout")
        df = em._docs(spark, sf_dir)
        assert df.rdd.getNumPartitions() == width
    finally:
        spark.conf.unset("spark.sql.files.minPartitionNum")
        spark.conf.unset("spark.tape.docs.rowsPerSlice")


# ---------------------------------------------- ADVICE r15 fixes


def test_fragments_refuse_escaped_string_literals_mode(spark):
    from tape_spark.operators import language_id, stratified_sample

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        with pytest.raises(ValueError, match="escapedStringLiterals"):
            language_id(df)
        with pytest.raises(ValueError, match="escapedStringLiterals"):
            stratified_sample(df, "text", {"en": 0.5})
    finally:
        spark.conf.unset("spark.sql.parser.escapedStringLiterals")
    # default mode still works
    assert language_id(df).count() == 1


def test_memo_udf_skips_memo_without_active_session(monkeypatch):
    import pyspark.sql as psql

    from tape_spark.utils import sqlfrag

    monkeypatch.setattr(
        psql.SparkSession, "getActiveSession", classmethod(lambda cls: None)
    )
    calls = []
    out1 = sqlfrag.memo_udf(("k",), lambda: calls.append(1) or object())
    out2 = sqlfrag.memo_udf(("k",), lambda: calls.append(1) or object())
    assert len(calls) == 2  # no memoization without a session
    assert out1 is not out2
    assert not any(k[0] is None for k in sqlfrag._UDF_MEMO)


def test_stratified_sample_int_and_bool_strata(spark):
    from tape_spark.operators import stratified_sample

    df = spark.createDataFrame(
        [(i, i % 3, i % 2 == 0) for i in range(60)],
        "doc_id long, grp int, flag boolean",
    )
    kept = stratified_sample(df, "grp", {0: 1.0, 1: 0.0, 2: 0.0})
    assert sorted(r["doc_id"] % 3 for r in kept.collect()) == [0] * 20
    kept_b = stratified_sample(df, "flag", {True: 1.0, False: 0.0})
    assert all(r["flag"] for r in kept_b.collect())
    with pytest.raises(ValueError, match="unsupported type"):
        stratified_sample(df, "grp", {(1, 2): 0.5})


def test_exact_dedup_dotted_id_col(spark):
    from tape_spark.operators import exact_dedup

    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], ["a.b", "text"]
    )
    for by_hash in (True, False):
        out = exact_dedup(df, text_col="text", id_col="a.b", by_hash=by_hash)
        assert out.columns == ["a.b", "dup_count"]
        assert sorted(tuple(r) for r in out.collect()) == [(1, 2), (3, 1)]


# ------------------------------- ngram generator-shape pin (r16 session 2)


def test_ngram_jaccard_generator_shape_avoids_inferred_chain_filter(spark):
    """The gram array must feed explode as an INLINE expression with the
    doc size riding inside the exploded struct: exploding a STAGED array
    attribute triggers InferFiltersFromGenerate, whose size(chain)>0
    predicate re-evaluates the whole nested-HOF gram chain per row in an
    interpreted Filter (measured 30x the operator wall on 600-token
    docs), and a post-Generate size(__sh) makes the array ride every
    exploded row. Pin: no Filter in the plan evaluates the gram chain,
    and no array column crosses the Generate."""
    import contextlib
    import io

    from tape_spark.operators import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z")],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(df, n=2, threshold=0.1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    for line in plan.splitlines():
        if line.startswith("Condition"):
            assert "array_distinct" not in line, line
            assert "array_join" not in line, line
    # the Generate consumes the struct array expression inline: no staged
    # gram-array attribute (the old `... AS __sh#N` projection) exists to
    # ride through it ("__sh_b", the join-side id rename, is fine)
    assert " AS __sh#" not in plan
    # results sanity (same pairs as the pre-fix plan)
    got = sorted(tuple(r) for r in out.collect())
    assert got == [(1, 2, 0.5)]


# ------------------------- prune/sync plan slimming (r16 session 3)


def _ramp_ensemble(spark, object_frame=None):
    from tape_spark import ColumnMapper, Ensemble

    rows = [
        (i, float(j), 100.0 + i + j, 1.0, "r" if j % 2 else "g")
        for i in range(8)
        for j in range(i + 1)
    ]
    src = spark.createDataFrame(rows, "oid long, t double, flux double, err double, band string")
    cm = ColumnMapper(
        id_col="oid", time_col="t", flux_col="flux", err_col="err", band_col="band"
    )
    return Ensemble(spark).from_spark(
        src, object_frame=object_frame, column_mapper=cm, npartitions=2
    )


def test_prune_on_derived_object_collapses_to_single_count_subtree(spark):
    """With the auto-derived object table, calc_nobs must replace it with
    groupBy(id).count() outright (same rows: derived ids == count keys)
    instead of distinct + inner-join + fill, and the sync semi-join must
    use the unique ids without a defensive distinct. Pin: the pruned
    source's plan holds exactly TWO source subtrees (the survivor scan and
    the count build side) and no Inner join; before this change it held
    three subtrees and an Inner join (measured at sf0.1: 3 scans -> 2,
    4 HashAggregates -> 2, 2 joins -> 1 per prune action)."""
    ens = _ramp_ensemble(spark)
    ens.prune(threshold=4)
    plan = ens.source._jdf.queryExecution().executedPlan().toString()
    assert "Inner" not in plan, plan
    assert "LeftSemi" in plan
    # one aggregate pair (partial+final count), not two (count + distinct)
    assert plan.count("HashAggregate") == 2, plan
    # rows: objects with >= 4 observations survive (oid 3..7)
    ids = sorted(r[0] for r in ens.object.select("oid").collect())
    assert ids == [3, 4, 5, 6, 7]
    assert ens.source.count() == sum(i + 1 for i in range(3, 8))


def test_prune_with_user_object_keeps_join_semantics(spark):
    """A user-supplied object table must keep the old calc_nobs path
    (left join onto the EXISTING object rows — not a rebuilt count table)
    and the defensive distinct on the sync build side. The extra column
    proves the join path ran: the slimmed path would have dropped it."""
    obj = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], "oid long, name string"
    )
    ens = _ramp_ensemble(spark, object_frame=obj)
    ens.calc_nobs(temporary=False)
    rows = {r["oid"]: r for r in ens.object.collect()}
    # ingest sync (keep_empty_objects=False) drops source-less oids 8, 9
    assert sorted(rows) == list(range(8))
    assert rows[7]["nobs_total"] == 8
    assert rows[7]["name"] == "name7"  # user columns survive: join path, not rebuild
    ens.prune(threshold=4)
    ids = sorted(r[0] for r in ens.object.select("oid").collect())
    assert ids == [3, 4, 5, 6, 7]


def test_prune_parity_derived_vs_user_object(spark):
    """The slimmed derived-object path and the fallback path must produce
    identical pruned sources when the user object equals the derived one."""
    ens_a = _ramp_ensemble(spark)
    ens_a.prune(threshold=3)
    obj = spark.createDataFrame([(i,) for i in range(8)], "oid long")
    ens_b = _ramp_ensemble(spark, object_frame=obj)
    ens_b.prune(threshold=3)
    rows_a = sorted(tuple(r) for r in ens_a.source.collect())
    rows_b = sorted(tuple(r) for r in ens_b.source.collect())
    assert rows_a == rows_b


def test_calc_nobs_keeps_empty_objects_after_source_filter(spark):
    """keep_empty_objects=True + a source filter + calc_nobs: the object
    table stays pristine by identity (sync does not rebuild it), but the
    count keys shrink to the filtered source — the pristine shortcut must
    NOT fire, so filtered-out objects keep nobs_total = 0 exactly as the
    left-join + fill path always gave."""
    from tape_spark import ColumnMapper, Ensemble

    rows = [
        (i, float(j), 100.0 + i + j, 1.0, "r" if j % 2 else "g")
        for i in range(8)
        for j in range(i + 1)
    ]
    src = spark.createDataFrame(rows, "oid long, t double, flux double, err double, band string")
    cm = ColumnMapper(
        id_col="oid", time_col="t", flux_col="flux", err_col="err", band_col="band"
    )
    ens = Ensemble(spark, keep_empty_objects=True).from_spark(
        src, column_mapper=cm, npartitions=2
    )
    ens.query("flux >= 106.0", table="source")  # oids 0..2 lose all rows
    ens.calc_nobs(temporary=False)
    counts = {r["oid"]: r["nobs_total"] for r in ens.object.collect()}
    assert sorted(counts) == list(range(8))  # every pristine id survives
    assert counts == {0: 0, 1: 0, 2: 0, 3: 1, 4: 3, 5: 5, 6: 7, 7: 8}

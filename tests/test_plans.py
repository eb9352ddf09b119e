"""Physical-plan assertions: the scale properties (pushdown, pruning,
broadcast, shuffle counts) that make each operator viable at 100 TB.
These lock in the plan shapes audited via .explain('formatted')."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tape_spark import ColumnMapper, Ensemble


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def li_ensemble(spark):
    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="l_linenumber",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    return Ensemble(spark).from_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        column_mapper=cm,
        additional_cols=False,
        npartitions=8,
    )


def test_column_pruning_reaches_scan(li_ensemble):
    """additional_cols=False must prune the parquet ReadSchema to the five
    critical columns — no full-width scan for a 5-column projection."""
    plan = plan_of(li_ensemble.source)
    assert "l_partkey" not in plan
    assert "l_shipdate" not in plan
    assert "ReadSchema" in plan


def test_filter_pushdown_reaches_scan(spark, li_ensemble):
    li_ensemble.query("l_extendedprice > 30000")
    plan = plan_of(li_ensemble.frames["source"])
    assert "PushedFilters: [IsNotNull(l_extendedprice), GreaterThan(l_extendedprice,30000.0)" in plan


def test_batch_map_path_single_exchange(li_ensemble):
    """The cohesive fast path: exactly one Exchange (the ingest
    repartition), then MapInPandas — no per-group shuffle. Uses a custom
    kernel: recognized reducers like np.mean now rewrite to a built-in
    aggregate before path selection (plan shape pinned in
    test_batch.py::test_builtin_reducer_uses_no_python)."""
    kernel = lambda f: float(np.mean(f))  # noqa: E731 — opaque to the rewriter
    result = li_ensemble.batch(kernel, "l_extendedprice", meta=("result", float))
    plan = plan_of(result)
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert plan.count("Exchange") == 1


def test_batch_shuffle_path_when_forced(li_ensemble):
    result = li_ensemble.batch(
        np.mean, "l_extendedprice", meta=("result", float), use_map=False
    )
    assert "FlatMapGroupsInPandas" in plan_of(result)


def test_batch_falls_back_without_cohesion(li_ensemble):
    li_ensemble.frames["source"] = li_ensemble.frames["source"].repartition(8)
    li_ensemble._source_cohesive = False
    kernel = lambda f: float(np.mean(f))  # noqa: E731 — opaque to the rewriter
    result = li_ensemble.batch(kernel, "l_extendedprice", meta=("result", float))
    assert "FlatMapGroupsInPandas" in plan_of(result)


def test_sync_is_semi_join_not_collect(li_ensemble):
    li_ensemble.prune(threshold=4)
    plan = plan_of(li_ensemble.source)
    assert "LeftSemi" in plan


def test_sync_shuffle_bound(li_ensemble):
    """The prune→sync plan must stay at ≤3 hash exchanges (source
    repartition + the two id-aggregation branches, which are identical and
    deduplicated by AQE's ReuseExchange at runtime) and must broadcast the
    surviving-id side rather than shuffle-join the full source."""
    li_ensemble.prune(threshold=4)
    plan = plan_of(li_ensemble.source)
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_sync_broadcasts_past_planner_threshold(spark):
    """The sync_broadcast policy is explicit code, not planner luck: with
    autoBroadcastJoinThreshold forced to -1 (planner would ALWAYS pick
    sort-merge on its own), the "auto" hint must still produce a
    BroadcastHashJoin whenever the surviving-id estimate fits
    sync_broadcast_bytes — and sync_broadcast=False must hand the choice
    back to the planner. Scale calibration and the sf100 A/B live in
    docs/SCALING.md."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="l_linenumber",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ens = Ensemble(spark).from_parquet(
            "/root/testdata/sf0.001/lineitem.parquet",
            column_mapper=cm,
            additional_cols=False,
            npartitions=8,
        )
        ens.prune(threshold=4)
        plan = plan_of(ens.source)
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
        # and the policy is honored when turned off: planner alone → SMJ
        ens2 = Ensemble(spark, sync_broadcast=False).from_parquet(
            "/root/testdata/sf0.001/lineitem.parquet",
            column_mapper=cm,
            additional_cols=False,
            npartitions=8,
        )
        ens2.prune(threshold=4)
        assert "BroadcastHashJoin" not in plan_of(ens2.source)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_merge_broadcast_hint(spark, li_ensemble):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    merged = li_ensemble.merge(orders, on="l_orderkey", how="inner", broadcast_right=True)
    assert "BroadcastHashJoin" in plan_of(merged)


def test_bin_sources_partial_aggregation(li_ensemble):
    """bin_sources must be one partial+final aggregation (map-side combine),
    not a UDAF: two HashAggregates around a single new Exchange."""
    li_ensemble.bin_sources(time_window=2.0, count_col="n")
    plan = plan_of(li_ensemble.frames["source"])
    assert "partial_" in plan  # map-side partial aggregation present
    assert "FlatMapGroupsInPandas" not in plan


def test_sort_lightcurves_no_global_shuffle(li_ensemble):
    before = plan_of(li_ensemble.source).count("Exchange")
    li_ensemble.sort_lightcurves()
    plan = plan_of(li_ensemble.frames["source"])
    assert plan.count("Exchange") == before  # sortWithinPartitions adds none
    assert "Sort " in plan or "Sort [" in plan


def test_bucketed_table_elides_all_shuffles(spark, li_ensemble, tmp_path):
    """The at-rest storage contract: an id-bucketed table feeds groupBy(id)
    aggregations and the shuffle-path batch() with ZERO exchanges."""
    from tape_spark import ColumnMapper, Ensemble

    # lands in ./spark-warehouse (gitignored); dropped in the finally block
    li_ensemble.save_bucketed("bucketed_src_test", num_buckets=8)
    try:
        cm = ColumnMapper(
            id_col="l_orderkey",
            time_col="l_linenumber",
            flux_col="l_extendedprice",
            err_col="l_quantity",
            band_col="l_returnflag",
        )
        ens = Ensemble(spark).from_table("bucketed_src_test", column_mapper=cm)

        counts = ens.frames["source"].groupBy("l_orderkey").count()
        assert "Exchange" not in plan_of(counts)

        shuffle_batch = ens.batch(
            np.mean, "l_extendedprice", meta=("result", float), use_map=False
        )
        assert "Exchange" not in plan_of(shuffle_batch)

        # recognized reducer: rewritten to a built-in aggregate that rides
        # the bucketing — still zero exchanges, and no Python at all
        agg_batch = ens.batch(np.mean, "l_extendedprice", meta=("result", float))
        agg_plan = plan_of(agg_batch)
        assert "HashAggregate" in agg_plan and "Exchange" not in agg_plan
        assert "InPandas" not in agg_plan

        kernel = lambda f: float(np.mean(f))  # noqa: E731 — opaque to the rewriter
        map_batch = ens.batch(kernel, "l_extendedprice", meta=("result", float))
        plan = plan_of(map_batch)
        assert "MapInPandas" in plan and "Exchange" not in plan

        # correctness of the bucketed path against a plain aggregation
        expected = (
            li_ensemble.frames["source"].groupBy("l_orderkey").count().count()
        )
        assert counts.count() == expected
        # the map fast path must emit exactly one row per object — a split
        # bucket file (autoBucketedScan fallback) would duplicate objects
        assert map_batch.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_src_test")


@pytest.fixture
def docs_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_exact_dedup_exchange_keys_on_hash(docs_df):
    """The scale-default exact dedup must shuffle on the 16-byte
    (xxhash64, length) key, with map-side partial aggregation before the
    exchange — the raw text column must never be a shuffle key (Spark
    aliases grouping expressions, so assert no exchange keys on text#)."""
    from tape_spark.operators import exact_dedup

    plan = plan_of(exact_dedup(docs_df))
    assert "xxhash64" in plan
    assert "partial_min" in plan  # map-side combine precedes the shuffle
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex and not any("text#" in l for l in ex)


def test_dedup_keep_first_aggregates_not_window(docs_df):
    """Keep-first must be a partial-aggregable min_by, NOT a row_number
    window: a window partition is one unsplittable sort task, so a hot
    text group (10^8 copies of one boilerplate doc at 100 TB) would drag
    every copy through one executor. min_by map-side-combines each group
    to one candidate row per input partition before the exchange."""
    from tape_spark.operators import dedup_keep_first

    plan = plan_of(dedup_keep_first(docs_df))
    assert "xxhash64" in plan and "Window" not in plan
    assert "partial_min_by" in plan  # map-side combine precedes the shuffle
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex and not any("text#" in l for l in ex)


def test_cosine_topk_no_cartesian(spark):
    """Brute-force top-k must stream the corpus once through MapInPandas
    with a broadcast query matrix — never a cartesian/nested-loop join."""
    from tape_spark.operators import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = plan_of(cosine_topk(emb, q, k=5))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_object_table_roundtrip(spark, li_ensemble):
    li_ensemble.calc_nobs(temporary=False)
    li_ensemble.save_bucketed("b_src2", object_table="b_obj2", num_buckets=4)
    try:
        from tape_spark import ColumnMapper, Ensemble

        cm = ColumnMapper(
            id_col="l_orderkey", time_col="l_linenumber", flux_col="l_extendedprice",
            err_col="l_quantity", band_col="l_returnflag",
        )
        ens = Ensemble(spark).from_table("b_src2", object_table="b_obj2", column_mapper=cm)
        assert "nobs_total" in ens.object.columns
        # bucketed object ⋈ bucketed source sync: no exchange on either side
        ens.prune(threshold=4)
        assert ens.object.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_src2")
        spark.sql("DROP TABLE IF EXISTS b_obj2")


def test_batch_map_path_prunes_columns_at_python_boundary(spark):
    """The map path must ship only kernel-read columns through Arrow:
    Catalyst cannot prune through an opaque mapInPandas, and at scale the
    Python-boundary transfer dominates the batch stage (measured: a no-op
    round trip of 34M rows costs ~16 s wall on local[32] while the kernel
    itself is ~1 s — see SCALING.md)."""
    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="l_linenumber",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    ens = Ensemble(spark).from_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        column_mapper=cm,
        additional_cols=True,  # wide source: carries every lineitem column
        npartitions=4,
    )
    result = ens.batch(np.mean, "l_extendedprice", meta=("result", float), use_map=True)
    plan = plan_of(result)
    map_line = next(l for l in plan.splitlines() if "MapInPandas" in l)
    # only the group key + the one kernel column cross the boundary
    assert "l_orderkey" in map_line and "l_extendedprice" in map_line
    for unused in ("l_comment", "l_shipmode", "l_partkey", "l_tax"):
        assert unused not in map_line, unused


def test_semantic_dedup_single_cell_shuffle(spark):
    """semantic_dedup's only table-sized exchange is the (cluster, cell)
    hash shuffle feeding applyInPandas; the size aggregate joins back by
    broadcast and assignment is a narrow map."""
    import numpy as np

    from tape_spark.operators import semantic_dedup

    rng = np.random.default_rng(0)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=4)]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    plan = semantic_dedup(
        df, num_clusters=4, train_sample=32
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # one hash exchange for the cell groupBy, one for the tiny size agg
    assert plan.count("Exchange hashpartitioning") <= 2


def test_perplexity_score_no_shuffle(spark):
    """LM scoring is a narrow Arrow map: zero exchanges on top of the
    input scan."""
    from tape_spark.operators import perplexity_score, train_bigram_lm

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha") for i in range(40)],
        "doc_id long, text string",
    )
    lm = train_bigram_lm(docs, sample_fraction=1.0, max_docs=20, min_count=1)
    plan = perplexity_score(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_interval_overlap_join_single_join_exchanges(spark):
    """The overlap join plans as ONE equi-join on (by, bucket): no
    nested loop, and the ownership dedup adds no exchange (pure filter)."""
    import pandas as pd

    from tape_spark.operators import interval_overlap_join

    left = spark.createDataFrame(
        pd.DataFrame({"key": [1] * 8, "ls": range(8), "le": range(1, 9)})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"key": [1] * 4, "rs": range(4), "re": range(2, 6)})
    )
    plan = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", by="key", bucket_width=2.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_bm25_scoring_plan_no_python_single_topk_exchange(spark):
    """BM25's candidate/scoring stage is pure codegen (no Python
    evaluators) and its only exchange is the per-query top-k window —
    with a map-side WindowGroupLimit pushed below it."""
    from tape_spark.operators import bm25_topk

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma " * (1 + i % 3)) for i in range(60)],
        "doc_id long, text string",
    )
    res = bm25_topk(docs, [("q", "alpha gamma")], k=3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "WindowGroupLimit" in plan


def test_rrf_fuse_no_python_no_nested_loop(spark):
    """RRF is a union + one hash aggregate + one window: no Python, no
    joins at all."""
    from tape_spark.operators import rrf_fuse

    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "query_id string, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [("q", 2, 1), ("q", 3, 2)], "query_id string, doc_id long, rank long"
    )
    plan = rrf_fuse([a, b], k=2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_pq_encode_no_shuffle(spark):
    """PQ encoding is one narrow Arrow pass: zero exchanges on top of
    the input scan."""
    import numpy as np

    from tape_spark.operators import pq_encode, train_pq_codebooks

    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    books = train_pq_codebooks(emb, m=4, num_centroids=8, train_sample=64)
    plan = pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gram_derivation_stays_staged(spark):
    """The regex split must appear ONCE per corpus side in the optimized
    plan — staged as a token column the transform lambdas reference. If
    a refactor (or a CollapseProject behavior change) re-inlines the
    split into the gram lambdas, it re-evaluates PER ELEMENT —
    O(tokens^2) per document, the round-10 long-doc bug (decontaminate
    3.7x / split_contaminated 6.1x / dsir 3.0x at sf100 came from
    fixing exactly this). Re-inlined plans show 3x+ the split count."""
    from tape_spark.operators import decontaminate, dsir_logweights

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "c d e f g")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "c d e")], "doc_id long, text string")
    p = decontaminate(docs, bench, n=3)._jdf.queryExecution().optimizedPlan().toString()
    assert p.count("split(") <= 3, "decontaminate gram split re-inlined into a lambda"
    p = dsir_logweights(docs, bench)._jdf.queryExecution().optimizedPlan().toString()
    assert p.count("split(") <= 7, "dsir gram split re-inlined into a lambda"


def test_select_by_budget_returns_windowless_plan(spark):
    """The boundary-bucket exact walk must never surface as a window in
    the RETURNED plan. A coarse score (integer 0-5 quality tier) routes
    ~N/(distinct scores) of the corpus into ONE histogram bucket, and an
    unpartitioned Window.orderBy over that bucket is a single task over
    ~2 TB at the 100 TB design point (the r10 verdict's perf-weak). The
    r11 shape locates the cutoff key on a range-partitioned narrow
    projection, so the result is union(filter, filter): no Window node,
    and the kept set still matches the naive walk exactly."""
    from tape_spark.operators import select_by_budget

    rows = [(i, float(i % 6), float(1 + i % 7)) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, score double, w double").repartition(8)
    out = select_by_budget(df, 900, "score", "w", num_buckets=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "boundary-bucket window leaked into the result plan"
    # and the coarse-score kept set is still the exact greedy prefix
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    kept, cum = set(), 0.0
    for i, _, w in order:
        if cum + w <= 900:
            kept.add(i)
            cum += w
        else:
            break
    assert {r["doc_id"] for r in out.collect()} == kept

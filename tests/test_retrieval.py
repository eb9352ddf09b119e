"""BM25 retrieval tests: brute-force reference parity, determinism
contract (integer units, quantized idf), and edge cases."""

from __future__ import annotations

import math
import re

import pytest

from tape_spark.operators import bm25_topk

K1, B = 1.2, 0.75


def _tok(text):
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _brute_bm25(docs, queries, k):
    """Pure-Python reference implementing the module's determinism
    contract exactly (quantized idf, per-term floor to micro-units,
    integer sum, (units desc, doc_id asc) ties)."""
    toks = {d: _tok(t) for d, t in docs}
    n = len(docs)
    sumdl = sum(len(v) for v in toks.values())
    avgdl = (sumdl * 1.0) / n
    out = []
    for qid, qtext in queries:
        terms = sorted(set(_tok(qtext)))
        if not terms:
            continue
        scored = []
        for d, tv in toks.items():
            units = 0
            hit = False
            for t in terms:
                tf = tv.count(t)
                if tf == 0:
                    continue
                hit = True
                df = sum(1 for v in toks.values() if t in v)
                idf = math.floor(
                    math.log(1.0 + ((n - df) + 0.5) / (df + 0.5)) * 1e6 + 0.5
                ) / 1e6
                num = tf * (K1 + 1.0)
                den = tf + K1 * ((1.0 - B) + ((B * len(tv)) / avgdl))
                units += int(math.floor(((1e6 * idf) * num) / den + 0.5))
            if hit and units > 0:
                scored.append((d, units))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, u) in enumerate(scored[:k], 1):
            out.append((qid, r, d, u))
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick red fox"),
    (3, "lazy summer afternoon with a lazy dog and a lazy cat"),
    (4, "pack my box with five dozen liquor jugs"),
    (5, "dog dog dog"),
    (6, ""),
    (7, None),
    (8, "Fox! FOX? fox... and the dog-house"),
]
QUERIES = [
    ("q_fox", "quick fox"),
    ("q_dog", "lazy dog"),
    ("q_none", "zzzunseen"),
    ("q_empty", "   ...   "),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_brute_force(spark, docs_df):
    got = sorted(
        tuple(r)
        for r in bm25_topk(docs_df, QUERIES, k=3, k1=K1, b=B).collect()
    )
    want = sorted(_brute_bm25(DOCS, QUERIES, k=3))
    assert got == want
    # q_none (term absent) and q_empty (no tokens) produce no rows
    assert not any(r[0] in ("q_none", "q_empty") for r in got)


def test_bm25_dataframe_queries_and_ranks(spark, docs_df):
    qdf = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    res = bm25_topk(docs_df, qdf, k=10, k1=K1, b=B)
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        units = [r["score_units"] for r in rs]
        assert units == sorted(units, reverse=True)
    # tokenizer strips punctuation: doc 8 matches "fox" and "dog"
    assert any(r["doc_id"] == 8 for r in by_q["q_fox"])
    assert any(r["doc_id"] == 8 for r in by_q["q_dog"])


def test_bm25_tie_break_by_doc_id(spark):
    docs = spark.createDataFrame(
        [(10, "apple pie"), (3, "apple pie"), (7, "apple pie")],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, [("q", "apple")], k=2).orderBy("rank").collect()
    # identical docs → identical units → doc_id ascending wins
    assert [r["doc_id"] for r in rows] == [3, 7]
    assert rows[0]["score_units"] == rows[1]["score_units"]


def test_bm25_term_in_every_doc_still_positive(spark):
    docs = spark.createDataFrame(
        [(1, "common word alpha"), (2, "common word beta beta")],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, [("q", "common")], k=5).collect()
    # idf = ln(1 + 0.5/(df+0.5)) > 0, so df == N never zeroes the score
    assert len(rows) == 2
    assert all(r["score_units"] > 0 for r in rows)


def test_bm25_empty_and_bounds(spark, docs_df):
    empty_q = bm25_topk(docs_df, [], k=3)
    assert empty_q.count() == 0
    assert [f.name for f in empty_q.schema.fields] == [
        "query_id",
        "rank",
        "doc_id",
        "score_units",
    ]
    empty_docs = docs_df.limit(0)
    assert bm25_topk(empty_docs, QUERIES, k=3).count() == 0
    with pytest.raises(ValueError, match="max_terms"):
        bm25_topk(docs_df, [("q", "a b c d e")], k=1, max_terms=3)


def test_bm25_repeated_query_term_collapses(spark, docs_df):
    once = bm25_topk(docs_df, [("q", "fox")], k=8).collect()
    thrice = bm25_topk(docs_df, [("q", "fox fox FOX")], k=8).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, thrice))


# ---------------------------------------------------------------- rrf_fuse

from tape_spark.operators import rrf_fuse  # noqa: E402


def _rank_df(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id long, rank long")


def _brute_rrf(lists, k, c=60, scale=1_000_000):
    agg = {}
    for rows in lists:
        for qid, d, r in rows:
            u, n = agg.get((qid, d), (0, 0))
            agg[(qid, d)] = (u + scale // (c + r), n + 1)
    out = []
    by_q = {}
    for (qid, d), (u, n) in agg.items():
        by_q.setdefault(qid, []).append((d, u, n))
    for qid, items in by_q.items():
        items.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, u, n) in enumerate(items[:k], 1):
            out.append((qid, rank, d, u, n))
    return sorted(out)


def test_rrf_matches_brute_force(spark):
    a = [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3), ("q2", 9, 1)]
    b = [("q1", 2, 1), ("q1", 4, 2), ("q2", 9, 1), ("q2", 7, 2)]
    got = sorted(
        tuple(r)
        for r in rrf_fuse([_rank_df(spark, a), _rank_df(spark, b)], k=3).collect()
    )
    assert got == _brute_rrf([a, b], k=3)
    # doc 2 appears in both lists (ranks 2 and 1) and must beat doc 1
    g = {(r[0], r[3]): r for r in got}
    top_q1 = [r for r in got if r[0] == "q1" and r[1] == 1][0]
    assert top_q1[2] == 2 and top_q1[4] == 2


def test_rrf_integer_units_and_ties(spark):
    # identical contributions → tie broken by doc_id ascending
    a = [("q", 5, 1), ("q", 3, 2)]
    b = [("q", 3, 1), ("q", 5, 2)]
    rows = (
        rrf_fuse([_rank_df(spark, a), _rank_df(spark, b)], k=5)
        .orderBy("rank")
        .collect()
    )
    assert rows[0]["doc_id"] == 3 and rows[1]["doc_id"] == 5
    assert rows[0]["rrf_units"] == rows[1]["rrf_units"]
    assert rows[0]["rrf_units"] == 1_000_000 // 61 + 1_000_000 // 62


def test_rrf_single_list_and_validation(spark):
    a = [("q", 1, 1), ("q", 2, 2)]
    rows = rrf_fuse([_rank_df(spark, a)], k=1).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1 and rows[0]["n_lists"] == 1
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([_rank_df(spark, a)], c=-1)


def test_rrf_drops_invalid_ranks(spark):
    # NULL / zero / negative ranks (incl. rank == -c, the div-by-zero
    # case) are dropped, never silent-NULL contributions or n_lists hits
    bad = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, None), ("q", 3, 0), ("q", 4, -60)],
        "query_id string, doc_id long, rank long",
    )
    rows = rrf_fuse([bad], k=10).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_lists"] == 1 and rows[0]["rrf_units"] == 1_000_000 // 61


def test_bm25_rejects_non_integral_id(spark):
    """A non-numeric string id must raise, not silently cast to NULL
    doc_id (ADVICE r9)."""
    docs = spark.createDataFrame(
        [("a1", "spark shuffles data"), ("b2", "bm25 ranks docs")],
        "doc_id string, text string",
    )
    with pytest.raises(TypeError, match="integral id column"):
        bm25_topk(docs, [("q1", "spark")], k=1)


# ---------------------------------------------------------------------------
# bm25_build_index / bm25_topk_indexed: index-once-query-many parity
# ---------------------------------------------------------------------------


def test_indexed_bm25_bit_identical_to_scan(spark, docs_df):
    from tape_spark.operators import bm25_build_index, bm25_topk_indexed

    postings, stats = bm25_build_index(docs_df, num_term_buckets=8)
    got = sorted(
        tuple(r)
        for r in bm25_topk_indexed(postings, stats, QUERIES, k=3, k1=K1, b=B).collect()
    )
    want = sorted(
        tuple(r) for r in bm25_topk(docs_df, QUERIES, k=3, k1=K1, b=B).collect()
    )
    assert got == want  # ranks, doc ids AND integer micro-unit scores
    assert want == sorted(_brute_bm25(DOCS, QUERIES, k=3))


def test_indexed_bm25_postings_shape(spark, docs_df):
    from tape_spark.operators import bm25_build_index

    postings, stats = bm25_build_index(docs_df, num_term_buckets=8)
    rows = postings.collect()
    # one row per distinct (doc, term); dl is denormalized per doc
    assert len(rows) == len({(r["doc_id"], r["term"]) for r in rows})
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["dl"])
        assert 0 <= r["tbucket"] < 8
        assert r["tf"] >= 1
    assert all(len(v) == 1 for v in by_doc.values())
    s = stats.collect()[0]
    assert s["n"] == len(DOCS)
    assert s["num_term_buckets"] == 8
    assert s["sumdl"] == sum(len(_tok(t)) for _, t in DOCS)


def test_indexed_bm25_save_load_roundtrip_and_pruning(spark, docs_df, tmp_path):
    from tape_spark.operators import (
        bm25_build_index,
        bm25_load_index,
        bm25_save_index,
        bm25_topk_indexed,
    )

    postings, stats = bm25_build_index(docs_df, num_term_buckets=8)
    path = str(tmp_path / "bm25_idx")
    bm25_save_index(postings, stats, path)
    p2, s2 = bm25_load_index(spark, path)
    got = sorted(
        tuple(r) for r in bm25_topk_indexed(p2, s2, QUERIES, k=3, k1=K1, b=B).collect()
    )
    want = sorted(
        tuple(r) for r in bm25_topk(docs_df, QUERIES, k=3, k1=K1, b=B).collect()
    )
    assert got == want
    # the term filter must reach the scan as a tbucket PartitionFilter —
    # a query reads only the partitions its terms hash into
    from pyspark.sql import functions as F

    plan = (
        p2.filter(F.col("tbucket").isin([1, 3]) & F.col("term").isin(["fox"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "tbucket" in plan.split("PartitionFilters")[1][:200]


def test_indexed_bm25_empty_cases(spark, docs_df):
    from tape_spark.operators import bm25_build_index, bm25_topk_indexed

    postings, stats = bm25_build_index(docs_df)
    assert bm25_topk_indexed(postings, stats, [], k=3).count() == 0
    assert (
        bm25_topk_indexed(postings, stats, [("q", "zzzunseen")], k=3).count() == 0
    )
    empty_docs = docs_df.limit(0)
    p0, s0 = bm25_build_index(empty_docs)
    assert bm25_topk_indexed(p0, s0, QUERIES, k=3).count() == 0


def test_indexed_bm25_property_random_corpora(spark):
    """Index-vs-scan bit-identity on randomized corpora (hypothesis):
    any divergence in idf quantization, association order, dl
    denormalization, or tie-breaks would surface as a score or rank
    mismatch."""
    from hypothesis import given, settings, strategies as st

    from tape_spark.operators import bm25_build_index, bm25_topk_indexed

    words = st.sampled_from(
        ["fox", "dog", "cat", "run", "red", "big", "a1", "b2", "zz"]
    )
    docs_strategy = st.lists(
        st.lists(words, min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=12,
    )

    @given(
        texts=docs_strategy,
        qwords=st.lists(words, min_size=1, max_size=4),
        nb=st.sampled_from([1, 2, 7]),
    )
    @settings(max_examples=8, deadline=None)
    def _check(texts, qwords, nb):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        queries = [("q", " ".join(qwords))]
        postings, stats = bm25_build_index(docs, num_term_buckets=nb)
        got = sorted(
            tuple(r)
            for r in bm25_topk_indexed(postings, stats, queries, k=5).collect()
        )
        want = sorted(tuple(r) for r in bm25_topk(docs, queries, k=5).collect())
        assert got == want

    _check()


def test_bm25_max_doc_tokens_counts_bm25_grammar(spark):
    """The giant-doc guard must count with BM25's [^a-z0-9]+ grammar, not
    the whitespace proxy: a punctuation-dense document (minified code, log
    spam) has few whitespace tokens but many BM25 tokens, and the tf pass
    pays per BM25 token."""
    from tape_spark.operators import bm25_build_index

    # ONE whitespace token, 50 BM25 tokens
    dense = ",".join(f"t{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(1, dense), (2, "short text")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_doc_tokens"):
        bm25_topk(docs, [("q", "t1")], max_doc_tokens=20)
    with pytest.raises(ValueError, match="max_doc_tokens"):
        bm25_build_index(docs, max_doc_tokens=20)
    # within bound: both paths proceed
    assert bm25_topk(docs, [("q", "t1")], max_doc_tokens=64).count() >= 1


def test_indexed_bm25_append_equals_rebuild(spark, docs_df, tmp_path):
    """Appending a batch must be BIT-IDENTICAL to rebuilding on the union
    corpus: N and sum(dl) are pure sums across stats rows, df comes from
    the postings union, so every idf, unit, and tie-break agrees."""
    from tape_spark.operators import (
        bm25_append_index,
        bm25_build_index,
        bm25_load_index,
        bm25_save_index,
        bm25_topk_indexed,
    )

    base = docs_df.filter("doc_id <= 4")
    delta = docs_df.filter("doc_id > 4")
    path = str(tmp_path / "bm25_grow")
    p0, s0 = bm25_build_index(base, num_term_buckets=8)
    bm25_save_index(p0, s0, path)
    bm25_append_index(delta, path)

    p1, s1 = bm25_load_index(spark, path)
    assert s1.count() == 2  # one stats row per generation
    got = sorted(
        tuple(r)
        for r in bm25_topk_indexed(p1, s1, QUERIES, k=3, k1=K1, b=B).collect()
    )
    want = sorted(
        tuple(r) for r in bm25_topk(docs_df, QUERIES, k=3, k1=K1, b=B).collect()
    )
    assert got == want

    # inconsistent bucket moduli are refused, not silently mispruned
    rows = [r.asDict() for r in s1.collect()]
    rows[0]["num_term_buckets"] = 4
    bad_stats = spark.createDataFrame(rows, s1.schema)
    with pytest.raises(ValueError, match="disagree"):
        bm25_topk_indexed(p1, bad_stats, QUERIES, k=3)
    with pytest.raises(ValueError, match="inconsistent"):
        # corrupt the saved stats the same way, then append
        bad_stats.write.mode("overwrite").parquet(f"{path}/stats")
        bm25_append_index(delta, path)


def test_bm25_compact_index_preserves_queries(spark, docs_df, tmp_path):
    """Append several batches, compact, and assert (a) queries are
    bit-identical before/after, (b) each tbucket partition holds ONE
    file after, (c) stats fold to one summed row."""
    import glob
    import os

    from tape_spark.operators import (
        bm25_append_index,
        bm25_build_index,
        bm25_compact_index,
        bm25_load_index,
        bm25_save_index,
        bm25_topk_indexed,
    )

    half = docs_df.filter("doc_id % 3 = 0")
    p, s = bm25_build_index(half, num_term_buckets=8)
    path = str(tmp_path / "bmidx")
    bm25_save_index(p, s, path)
    for m in (1, 2):
        bm25_append_index(docs_df.filter(f"doc_id % 3 = {m}"), path)
    queries = [("q1", "the quick brown"), ("q2", "fox jumps")]
    p2, s2 = bm25_load_index(spark, path)
    before = sorted(tuple(r) for r in bm25_topk_indexed(p2, s2, queries, k=5).collect())
    info = bm25_compact_index(spark, path)
    assert info["stats_rows_before"] == 3
    p3, s3 = bm25_load_index(spark, path)
    after = sorted(tuple(r) for r in bm25_topk_indexed(p3, s3, queries, k=5).collect())
    assert after == before and before
    assert s3.count() == 1
    for d in glob.glob(f"{path}/postings/tbucket=*"):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d


def test_bm25_append_index_batch_id_idempotent(spark, docs_df, tmp_path):
    """With batch_id, a retry of a fully-applied append is a no-op and a
    retry after only the stats write landed skips the duplicate stats row
    — the recovery decision is decidable from the index itself, not a
    caller guess."""
    from pyspark.sql import functions as F

    from tape_spark.operators import (
        bm25_append_index,
        bm25_build_index,
        bm25_load_index,
        bm25_save_index,
        bm25_topk_indexed,
    )

    base = docs_df.filter("doc_id % 2 = 0")
    batch = docs_df.filter("doc_id % 2 = 1")
    p, s = bm25_build_index(base, num_term_buckets=8)
    path = str(tmp_path / "idx")
    bm25_save_index(p, s, path)
    bm25_append_index(batch, path, batch_id="b1")
    queries = [("q1", "the quick brown"), ("q2", "fox jumps")]

    def snap():
        pp, ss = bm25_load_index(spark, path)
        return (
            sorted(tuple(r) for r in bm25_topk_indexed(pp, ss, queries, k=5).collect()),
            ss.count(),
        )

    want, n_stats = snap()
    # full retry: marker present -> no-op (no duplicate stats, no duplicate postings)
    bm25_append_index(batch, path, batch_id="b1")
    assert snap() == (want, n_stats)
    # simulate "stats landed, postings did not": write the stats row for a
    # NEW batch id, then run the append with that id — the stats write must
    # be skipped (no double count) while postings+marker land
    _, s2 = bm25_build_index(docs_df.filter("doc_id % 7 = 3"), num_term_buckets=8)
    s2.withColumn("batch_id", F.lit("b2")).write.mode("append").parquet(f"{path}/stats")
    pre_stats = spark.read.parquet(f"{path}/stats").count()
    bm25_append_index(docs_df.filter("doc_id % 7 = 3"), path, batch_id="b2")
    assert spark.read.parquet(f"{path}/stats").count() == pre_stats
    # and the b2 docs are now queryable: the appended index equals a rebuild
    pp, ss = bm25_load_index(spark, path)
    got = sorted(tuple(r) for r in bm25_topk_indexed(pp, ss, queries, k=5).collect())
    union = base.unionByName(batch).unionByName(docs_df.filter("doc_id % 7 = 3"))
    pr, sr = bm25_build_index(union, num_term_buckets=8)
    want2 = sorted(tuple(r) for r in bm25_topk_indexed(pr, sr, queries, k=5).collect())
    assert got == want2


def test_recover_compact_swap_rolls_forward(spark, tmp_path):
    """A crash between the two swap renames leaves the live dir missing;
    recovery must roll the fully-written tmp forward instead of failing
    at the next read."""
    import os

    from tape_spark.utils.io import recover_compact_swap

    live = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(live)
    # simulate the crash window: tmp fully written, live renamed away
    spark.read.parquet(live).write.parquet(live + "__compact_tmp")
    os.rename(live, live + "__compact_old")
    recover_compact_swap(live)
    assert os.path.exists(live)
    assert not os.path.exists(live + "__compact_old")
    assert not os.path.exists(live + "__compact_tmp")
    assert spark.read.parquet(live).count() == 1


def test_bm25_append_batch_retry_replaces_postings(spark, docs_df, tmp_path):
    """The one crash window batch_id used to leave open — postings landed
    but the marker write did not — now converges on retry: batch-tagged
    files are REPLACED, not duplicated, and the retried index equals a
    from-scratch rebuild on the union corpus."""
    from pyspark.sql import functions as F

    from tape_spark.operators import (
        bm25_append_index,
        bm25_build_index,
        bm25_load_index,
        bm25_save_index,
        bm25_topk_indexed,
    )
    from tape_spark.utils.io import append_partitioned_batch

    base = docs_df.filter("doc_id % 2 = 0")
    batch = docs_df.filter("doc_id % 2 = 1")
    path = str(tmp_path / "idx")
    p, s = bm25_build_index(base, num_term_buckets=8)
    bm25_save_index(p, s, path)

    # hand-construct the half-applied state: stats stamped + postings
    # moved in (batch-tagged), marker MISSING — i.e. a crash after the
    # postings commit
    bp, bs = bm25_build_index(batch, num_term_buckets=8)
    bs.withColumn("batch_id", F.lit("bx")).write.mode("append").parquet(
        f"{path}/stats"
    )
    append_partitioned_batch(bp, "tbucket", ["term"], f"{path}/postings", "bx")
    import os

    assert not os.path.exists(f"{path}/batches")
    n_postings_half = spark.read.parquet(f"{path}/postings").count()

    # retry the whole append: stats skipped (stamp present), postings
    # REPLACED (same count, not doubled), marker lands
    bm25_append_index(batch, path, batch_id="bx")
    assert spark.read.parquet(f"{path}/postings").count() == n_postings_half
    assert spark.read.parquet(f"{path}/batches").count() == 1

    queries = [("q1", "the quick brown"), ("q2", "fox jumps")]
    pp, ss = bm25_load_index(spark, path)
    got = sorted(tuple(r) for r in bm25_topk_indexed(pp, ss, queries, k=5).collect())
    pr, sr = bm25_build_index(base.unionByName(batch), num_term_buckets=8)
    want = sorted(tuple(r) for r in bm25_topk_indexed(pr, sr, queries, k=5).collect())
    assert got == want


def test_bm25_compact_refuses_half_applied_batch(spark, docs_df, tmp_path):
    """Compacting while a stamped stats row has no completion marker
    would erase the stamp and let the retry double-count the batch —
    refuse, then succeed once the append is retried to completion."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tape_spark.operators import (
        bm25_append_index,
        bm25_build_index,
        bm25_compact_index,
        bm25_save_index,
    )

    base = docs_df.filter("doc_id % 2 = 0")
    batch = docs_df.filter("doc_id % 2 = 1")
    path = str(tmp_path / "idx")
    p, s = bm25_build_index(base, num_term_buckets=8)
    bm25_save_index(p, s, path)
    # half-applied: stats row stamped, no postings, no marker
    _, bs = bm25_build_index(batch, num_term_buckets=8)
    bs.withColumn("batch_id", F.lit("bz")).write.mode("append").parquet(
        f"{path}/stats"
    )
    with _pytest.raises(ValueError, match="half-applied.*bz"):
        bm25_compact_index(spark, path)
    # retrying the append completes the batch; compaction then proceeds
    bm25_append_index(batch, path, batch_id="bz")
    info = bm25_compact_index(spark, path)
    assert info["stats_rows_before"] == 2

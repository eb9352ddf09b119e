"""Temporal joins: asof_join vs pandas.merge_asof (the public semantics it
mirrors), interval_join vs a brute-force containment join, plus plan-shape
locks (no nested-loop join; a single exchange for the as-of scan)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tape_spark.operators import asof_join, interval_join
from tape_spark.operators.text import boilerplate_lines, remove_boilerplate


def _trades_quotes(seed=7, n_keys=4, n_left=200, n_right=120):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n_left),
            "t": np.round(rng.uniform(0, 1000, n_left), 3),
            "qty": rng.integers(1, 100, n_left),
        }
    )
    right = pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n_right),
            "t": np.round(rng.uniform(0, 1000, n_right), 3),
            "px": np.round(rng.normal(100, 5, n_right), 4),
        }
    )
    return left, right


def _expected_asof(left, right, direction, tolerance=None):
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    exp = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort").rename(columns={"t": "t_r", "px": "px"}),
        left_on="t",
        right_on="t_r",
        by="key",
        direction=direction,
        **kw,
    )
    return exp.sort_values(["key", "t", "qty"]).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_pandas_merge_asof(spark, direction):
    left, right = _trades_quotes()
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="key",
            direction=direction,
        )
        .toPandas()
        .sort_values(["key", "t", "qty"])
        .reset_index(drop=True)
    )
    exp = _expected_asof(left, right, direction)
    assert list(out.columns) == ["key", "t", "qty", "t_r", "px"]
    pd.testing.assert_frame_equal(
        out[["key", "t", "qty", "t_r", "px"]],
        exp[["key", "t", "qty", "t_r", "px"]],
        check_dtype=False,
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_tolerance(spark, direction):
    left, right = _trades_quotes(seed=11)
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="key",
            direction=direction,
            tolerance=25.0,
        )
        .toPandas()
        .sort_values(["key", "t", "qty"])
        .reset_index(drop=True)
    )
    exp = _expected_asof(left, right, direction, tolerance=25.0)
    pd.testing.assert_frame_equal(
        out[["key", "t", "qty", "t_r", "px"]],
        exp[["key", "t", "qty", "t_r", "px"]],
        check_dtype=False,
    )


def test_asof_equal_timestamps_match(spark):
    """A right row AT the left timestamp matches for backward and forward,
    exactly as merge_asof's inclusive semantics."""
    left = pd.DataFrame({"key": [1, 1], "t": [10.0, 20.0], "qty": [1, 2]})
    right = pd.DataFrame({"key": [1, 1], "t": [10.0, 30.0], "px": [5.0, 7.0]})
    for direction, exp_px in [("backward", [5.0, 5.0]), ("forward", [5.0, 7.0])]:
        out = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                on="t",
                by="key",
                direction=direction,
            )
            .orderBy("t")
            .toPandas()
        )
        assert out["px"].tolist() == exp_px


def test_asof_null_right_payload_not_skipped(spark):
    """A genuinely-NULL payload field of the matched right row must come
    through as NULL, not be replaced by an older row's value (struct
    propagation, not per-column last(ignorenulls))."""
    left = pd.DataFrame({"key": [1], "t": [30.0], "qty": [1]})
    right = spark.createDataFrame(
        [(1, 10.0, 99.0), (1, 20.0, None)], "key long, t double, px double"
    )
    out = asof_join(
        spark.createDataFrame(left), right, on="t", by="key"
    ).collect()[0]
    assert out["t_r"] == 20.0 and out["px"] is None


def test_asof_no_by_global(spark):
    left = pd.DataFrame({"t": [1.0, 5.0], "qty": [1, 2]})
    right = pd.DataFrame({"t": [0.0, 4.0], "px": [1.5, 2.5]})
    out = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right), on="t")
        .orderBy("t")
        .toPandas()
    )
    assert out["px"].tolist() == [1.5, 2.5]


def test_asof_plan_single_exchange_no_nested_loop(spark):
    left, right = _trades_quotes()
    plan = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="t",
        by="key",
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # one hash-partition exchange for the union scan (createDataFrame
    # parallelize sides contribute none)
    assert plan.count("Exchange hashpartitioning") == 1


def _events_sessions(seed=3, n_keys=5, n_left=300, n_right=60):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n_left),
            "t": np.round(rng.uniform(0, 5000, n_left), 3),
            "v": rng.integers(0, 10, n_left),
        }
    )
    start = np.round(rng.uniform(0, 5000, n_right), 3)
    right = pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n_right),
            "s": start,
            "e": np.round(start + rng.uniform(0, 900, n_right), 3),
            "label": [f"iv{i}" for i in range(n_right)],
        }
    )
    return left, right


def _expected_interval(left, right, by=True):
    keys = ["key"] if by else []
    merged = left.merge(right, on=keys or None, how="cross" if not by else "inner")
    m = merged[(merged["s"] <= merged["t"]) & (merged["t"] <= merged["e"])]
    return m.sort_values(["key", "t", "v", "label"]).reset_index(drop=True)


@pytest.mark.parametrize("bucket_width", [50.0, 500.0, 10000.0])
def test_interval_join_matches_bruteforce(spark, bucket_width):
    left, right = _events_sessions()
    out = (
        interval_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            left_ts="t",
            right_start="s",
            right_end="e",
            by="key",
            bucket_width=bucket_width,
        )
        .toPandas()
        .sort_values(["key", "t", "v", "label"])
        .reset_index(drop=True)
    )
    exp = _expected_interval(left, right)
    cols = ["key", "t", "v", "s", "e", "label"]
    pd.testing.assert_frame_equal(out[cols], exp[cols], check_dtype=False)


def test_interval_join_left_outer(spark):
    left, right = _events_sessions(seed=9)
    out = interval_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        left_ts="t",
        right_start="s",
        right_end="e",
        by="key",
        bucket_width=200.0,
        how="left",
    ).toPandas()
    exp_inner = _expected_interval(left, right)
    # every left row appears at least once; unmatched rows carry NULLs
    assert len(out) == len(exp_inner) + (
        len(left) - len(exp_inner[["key", "t", "v"]].drop_duplicates())
    )
    matched = out[out["label"].notna()].sort_values(
        ["key", "t", "v", "label"]
    ).reset_index(drop=True)
    cols = ["key", "t", "v", "s", "e", "label"]
    pd.testing.assert_frame_equal(matched[cols], exp_inner[cols], check_dtype=False)


def test_interval_join_no_nested_loop(spark):
    left, right = _events_sessions()
    plan = interval_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        left_ts="t",
        right_start="s",
        right_end="e",
        by="key",
        bucket_width=500.0,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


DOCS = [
    (0, "alpha beta\nCOOKIE BANNER\nunique zero text\nfooter (c) corp"),
    (1, "COOKIE BANNER\nsome other prose\nfooter (c) corp"),
    (2, "totally original\nnothing shared here at all"),
    (3, "  COOKIE BANNER  \nmore prose\nfooter (c) corp\nCOOKIE BANNER"),
    (4, ""),
]


def test_boilerplate_lines_census(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bp = boilerplate_lines(docs, min_doc_frequency=2).toPandas()
    got = dict(zip(bp["sample_line"], bp["n_docs"]))
    # doc 3 repeats the banner twice but counts once (distinct per doc);
    # whitespace-variant lines normalize to the same trimmed form
    assert got == {"COOKIE BANNER": 3, "footer (c) corp": 3}


def test_remove_boilerplate_preserves_order_and_counts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = (
        remove_boilerplate(docs, min_doc_frequency=2)
        .orderBy("doc_id")
        .toPandas()
    )
    assert out["text"].tolist() == [
        "alpha beta\nunique zero text",
        "some other prose",
        "totally original\nnothing shared here at all",
        "more prose",
        "",
    ]
    assert out["n_lines_removed"].tolist() == [2, 2, 0, 3, 0]


def test_remove_boilerplate_short_lines_exempt(spark):
    docs = spark.createDataFrame(
        [(0, "ok\nlong shared line"), (1, "ok\nlong shared line"), (2, "ok")],
        "doc_id long, text string",
    )
    out = (
        remove_boilerplate(docs, min_doc_frequency=2, min_line_chars=4)
        .orderBy("doc_id")
        .toPandas()
    )
    # "ok" is under min_line_chars: shared but never stripped
    assert out["text"].tolist() == ["ok", "ok", "ok"]
    assert out["n_lines_removed"].tolist() == [1, 1, 0]


def test_ensemble_align_bands(spark, ramp_ensemble):
    """Color-curve construction: each r observation pairs with the
    temporally nearest g observation of the same object, replayed with
    pandas merge_asof(nearest) per object."""
    out = ramp_ensemble.align_bands("r", "g", direction="nearest").toPandas()
    src = ramp_ensemble.source.toPandas()
    r = src[src["band"] == "r"][["id", "time", "flux", "err"]]
    g = src[src["band"] == "g"][["id", "time", "flux", "err"]]
    exp = pd.merge_asof(
        r.sort_values("time"),
        g.sort_values("time").rename(
            columns={"time": "time_b", "flux": "flux_b", "err": "err_b"}
        ),
        left_on="time",
        right_on="time_b",
        by="id",
        direction="nearest",
    )
    got = out.sort_values(["id", "time"]).reset_index(drop=True)
    exp = exp.sort_values(["id", "time"]).reset_index(drop=True)
    assert list(got.columns) == [
        "id", "time", "flux", "err", "time_b", "flux_b", "err_b", "dt",
    ]
    pd.testing.assert_frame_equal(
        got[["id", "time", "flux", "err", "time_b", "flux_b"]],
        exp[["id", "time", "flux", "err", "time_b", "flux_b"]],
        check_dtype=False,
    )
    assert np.allclose(got["dt"], got["time_b"] - got["time"])


def test_ensemble_align_bands_tolerance(spark, ramp_ensemble):
    out = ramp_ensemble.align_bands("r", "g", direction="backward", tolerance=300.0)
    pdf = out.toPandas()
    matched = pdf[pdf["time_b"].notna()]
    assert ((matched["time"] - matched["time_b"]) <= 300.0).all()
    assert ((matched["time"] - matched["time_b"]) >= 0).all()
    # rows outside tolerance still present with NULL match (left-outer)
    assert len(pdf) == pdf["id"].map(lambda _: 1).sum()


def test_interval_join_left_outer_null_payload(spark):
    """A left row with a NULL payload column must not be duplicated as
    unmatched next to its inner match (null-safe anti-join)."""
    left = spark.createDataFrame(
        [(1, 10.0, None), (1, 9999.0, None)], "key long, t double, v double"
    )
    right = spark.createDataFrame(
        [(1, 5.0, 15.0, "iv0")], "key long, s double, e double, label string"
    )
    out = interval_join(
        left, right, left_ts="t", right_start="s", right_end="e",
        by="key", bucket_width=100.0, how="left",
    ).toPandas()
    assert len(out) == 2
    assert out[out["t"] == 10.0]["label"].tolist() == ["iv0"]
    assert out[out["t"] == 9999.0]["label"].isna().all()


def test_interval_join_derived_bucket_width(spark):
    left, right = _events_sessions(seed=21)
    out = (
        interval_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            left_ts="t",
            right_start="s",
            right_end="e",
            by="key",
            bucket_width=None,
        )
        .toPandas()
        .sort_values(["key", "t", "v", "label"])
        .reset_index(drop=True)
    )
    exp = _expected_interval(left, right)
    cols = ["key", "t", "v", "s", "e", "label"]
    pd.testing.assert_frame_equal(out[cols], exp[cols], check_dtype=False)


def test_interval_join_boundary_exactness(spark):
    """Timestamps exactly at interval endpoints and at bucket edges are
    inclusive on both ends, regardless of how buckets cut the axis."""
    left = spark.createDataFrame(
        [(1, 100.0, 0), (1, 200.0, 1), (1, 99.999, 2), (1, 200.001, 3)],
        "key long, t double, v long",
    )
    right = spark.createDataFrame(
        [(1, 100.0, 200.0, "iv")], "key long, s double, e double, label string"
    )
    for w in (50.0, 100.0, 1000.0):
        got = (
            interval_join(
                left, right, left_ts="t", right_start="s", right_end="e",
                by="key", bucket_width=w,
            )
            .toPandas()
            .sort_values("v")
        )
        assert got["v"].tolist() == [0, 1]


def test_interval_join_zero_length_intervals(spark):
    """Point intervals (start == end) match only exact-timestamp rows,
    including under the derived bucket width (falls back to unit width
    when the median length is zero)."""
    left = spark.createDataFrame(
        [(1, 5.0, 0), (1, 5.5, 1)], "key long, t double, v long"
    )
    right = spark.createDataFrame(
        [(1, 5.0, 5.0, "pt")], "key long, s double, e double, label string"
    )
    got = interval_join(
        left, right, left_ts="t", right_start="s", right_end="e",
        by="key", bucket_width=None,
    ).toPandas()
    assert got["v"].tolist() == [0]


def test_asof_output_collision_raises(spark):
    left = spark.createDataFrame([(1, 1.0, 2)], "key long, t double, qty long")
    right = spark.createDataFrame(
        [(1, 0.5, 9.0)], "key long, t double, t_r double"
    )
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, on="t", by="key")


def test_multi_key_by_both_joins(spark):
    left = spark.createDataFrame(
        [(1, "a", 5.0, 1), (1, "b", 5.0, 2)], "k1 long, k2 string, t double, v long"
    )
    right = spark.createDataFrame(
        [(1, "a", 4.0, 6.0, "iv")], "k1 long, k2 string, s double, e double, lab string"
    )
    iv = interval_join(
        left, right, "t", "s", "e", by=["k1", "k2"], bucket_width=10.0
    ).toPandas()
    assert iv["v"].tolist() == [1]  # (1,"b") shares k1 but not k2
    av = asof_join(
        left,
        right.select("k1", "k2", right["s"].alias("t"), "lab"),
        on="t",
        by=["k1", "k2"],
    ).orderBy("v").toPandas()
    assert av["lab"].tolist() == ["iv", None]


def test_asof_null_on_rows(spark):
    """Right rows with NULL `on` are dropped (merge_asof raises on them);
    left rows with NULL `on` pass through unmatched — never silently
    matched to the NULL-timestamp right row."""
    left = spark.createDataFrame(
        [(1, 5.0, 10), (1, None, 11)], "key long, t double, qty long"
    )
    right = spark.createDataFrame(
        [(1, None, 1.0), (1, 4.0, 2.0)], "key long, t double, px double"
    )
    for direction in ("backward", "forward", "nearest"):
        out = {
            r["qty"]: (r["t_r"], r["px"])
            for r in asof_join(
                left, right, on="t", by="key", direction=direction
            ).collect()
        }
        assert len(out) == 2
        # NULL-t left row: always unmatched
        assert out[11] == (None, None)
        # the valid left row never sees the NULL-t right row's payload
        if direction == "backward" or direction == "nearest":
            assert out[10] == (4.0, 2.0)
        else:  # forward: no right row at-or-after 5.0
            assert out[10] == (None, None)


def test_asof_tied_right_rows_deterministic(spark):
    """Multiple right rows at the SAME (by, on): backward takes the last
    input row, forward the first — pandas.merge_asof semantics, locked
    against merge_asof itself."""
    left = pd.DataFrame({"key": [1, 1], "t": [10.0, 3.0], "qty": [0, 1]})
    right = pd.DataFrame(
        {"key": [1, 1, 1], "t": [5.0, 5.0, 5.0], "px": [1.0, 2.0, 3.0]}
    )
    for direction in ("backward", "forward"):
        exp = pd.merge_asof(
            left.sort_values("t", kind="mergesort"),
            right.rename(columns={"t": "t_r"}),
            left_on="t",
            right_on="t_r",
            by="key",
            direction=direction,
        ).sort_values("qty")
        for _ in range(3):  # deterministic across repeated runs
            got = (
                asof_join(
                    spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="t",
                    by="key",
                    direction=direction,
                )
                .orderBy("qty")
                .toPandas()
            )
            norm = lambda xs: [None if x != x else x for x in xs]  # noqa: E731
            assert norm(got["px"]) == norm(exp["px"]), direction


def test_asof_matched_on_keeps_dtype(spark):
    """The matched right timestamp comes back at its ORIGINAL dtype (only
    the internal sort key is cast to double)."""
    left = spark.createDataFrame([(1, 10, 0)], "key long, t long, qty long")
    right = spark.createDataFrame([(1, 7, 5.0)], "key long, t long, px double")
    out = asof_join(left, right, on="t", by="key")
    assert dict(out.dtypes)["t_r"] == "bigint"
    row = out.collect()[0]
    assert row["t_r"] == 7 and row["px"] == 5.0


def test_asof_no_by_warns(spark):
    import warnings as _w

    left = spark.createDataFrame([(1.0, 1)], "t double, qty long")
    right = spark.createDataFrame([(0.5, 2.0)], "t double, px double")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        asof_join(left, right, on="t")
    assert any("globally ordered" in str(x.message) for x in rec)


def _spans(seed=13, n_keys=4, n_left=80, n_right=60):
    rng = np.random.default_rng(seed)
    ls = np.round(rng.uniform(0, 5000, n_left), 3)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n_left),
            "ls": ls,
            "le": np.round(ls + rng.uniform(0, 600, n_left), 3),
            "lv": np.arange(n_left),
        }
    )
    rs = np.round(rng.uniform(0, 5000, n_right), 3)
    right = pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n_right),
            "rs": rs,
            "re": np.round(rs + rng.uniform(0, 900, n_right), 3),
            "lab": [f"iv{i}" for i in range(n_right)],
        }
    )
    return left, right


def _expected_overlap(left, right, min_overlap=0.0):
    m = left.merge(right, on="key")
    ov = np.minimum(m["le"], m["re"]) - np.maximum(m["ls"], m["rs"])
    m = m[ov >= min_overlap]
    return m.sort_values(["key", "lv", "lab"]).reset_index(drop=True)


@pytest.mark.parametrize("bucket_width", [100.0, 700.0, 10000.0, None])
def test_interval_overlap_join_matches_bruteforce(spark, bucket_width):
    from tape_spark.operators import interval_overlap_join

    left, right = _spans()
    out = (
        interval_overlap_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "ls", "le", "rs", "re",
            by="key",
            bucket_width=bucket_width,
        )
        .toPandas()
        .sort_values(["key", "lv", "lab"])
        .reset_index(drop=True)
    )
    exp = _expected_overlap(left, right)
    cols = ["key", "ls", "le", "lv", "rs", "re", "lab"]
    assert len(out) == len(exp)  # ownership dedup: exactly one row per pair
    pd.testing.assert_frame_equal(out[cols], exp[cols], check_dtype=False)


def test_interval_overlap_join_min_overlap_and_touching(spark):
    from tape_spark.operators import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0.0, 10.0, 0), (1, 50.0, 60.0, 1)], "key long, ls double, le double, lv long"
    )
    right = spark.createDataFrame(
        [(1, 10.0, 20.0, "touch"), (1, 55.0, 58.0, "inside")],
        "key long, rs double, re double, lab string",
    )
    # touching endpoints overlap with length 0 by default
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", by="key", bucket_width=7.0
    ).toPandas()
    assert sorted(got["lab"]) == ["inside", "touch"]
    # min_overlap excludes the point-touch
    got2 = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", by="key", bucket_width=7.0,
        min_overlap=1.0,
    ).toPandas()
    assert got2["lab"].tolist() == ["inside"]


def test_interval_overlap_join_left_outer(spark):
    from tape_spark.operators import interval_overlap_join

    left, right = _spans(seed=29)
    out = interval_overlap_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        "ls", "le", "rs", "re",
        by="key",
        bucket_width=300.0,
        how="left",
    ).toPandas()
    exp = _expected_overlap(left, right)
    n_unmatched = len(left) - exp["lv"].nunique()
    assert len(out) == len(exp) + n_unmatched
    matched = out[out["lab"].notna()].sort_values(["key", "lv", "lab"]).reset_index(drop=True)
    cols = ["key", "ls", "le", "lv", "rs", "re", "lab"]
    pd.testing.assert_frame_equal(matched[cols], exp[cols], check_dtype=False)


def test_interval_overlap_join_point_intervals_derived_width(spark):
    """bucket_width=None with degenerate (point) intervals: a 0.0 median
    is a legitimate statistic, not falsy-missing — the derived width must
    clamp to a positive value and the join must still find every
    point-touch pair (and respect min_overlap filtering them out)."""
    from tape_spark.operators import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 5.0, 5.0, 0), (1, 9.0, 9.0, 1), (1, 30.0, 30.0, 2)],
        "key long, ls double, le double, lv long",
    )
    right = spark.createDataFrame(
        [(1, 5.0, 5.0, "at5"), (1, 0.0, 10.0, "span"), (1, 50.0, 50.0, "far")],
        "key long, rs double, re double, lab string",
    )
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", by="key", bucket_width=None
    ).toPandas()
    exp = {(0, "at5"), (0, "span"), (1, "span")}
    assert set(zip(got["lv"], got["lab"])) == exp
    # positive-length spans on one side only: max of medians still positive
    got2 = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", by="key", bucket_width=None,
        min_overlap=1.0,
    ).toPandas()
    assert len(got2) == 0  # point overlaps all have length 0


def test_interval_overlap_join_no_nested_loop(spark):
    from tape_spark.operators import interval_overlap_join

    left, right = _spans()
    plan = interval_overlap_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        "ls", "le", "rs", "re",
        by="key",
        bucket_width=300.0,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_left_outer_is_structural(spark):
    """interval_join how='left' is ONE structural left join (containment
    inside the join condition): no synthetic row ids, no anti-join
    branch, no checkpoint — a left row owns exactly one bucket, so an
    unmatched row null-extends exactly once (r10 redesign)."""
    from tape_spark.operators import interval_join

    left = spark.createDataFrame(
        [(1, 5.0, "a", "b", "c")], "key long, ts double, p1 string, p2 string, p3 string"
    )
    right = spark.createDataFrame(
        [(1, 0.0, 10.0, "lab")], "key long, rs double, re double, lab string"
    )
    out = interval_join(left, right, "ts", "rs", "re", by="key",
                        bucket_width=100.0, how="left")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan and "LeftOuter" in plan
    assert all(not c.startswith("__lrow") for c in out.columns)


def test_overlap_left_outer_caller_id_path(spark):
    """interval_overlap_join how='left' with a caller-named unique id:
    the complement anti-joins on that column lazily — zero caching, no
    synthetic ids, and the id column survives in the output."""
    from tape_spark.operators import interval_overlap_join

    left = spark.createDataFrame(
        [(10, 1, 0.0, 5.0), (11, 1, 50.0, 60.0)],
        "rid long, key long, s double, e double",
    )
    right = spark.createDataFrame(
        [(1, 4.0, 6.0, "x")], "key long, rs double, re double, lab string"
    )
    out = interval_overlap_join(
        left, right, "s", "e", "rs", "re", by="key",
        bucket_width=10.0, how="left", left_id="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln][0]
    assert "rid" in anti and "lab" not in anti
    rows = {r["rid"]: r for r in out.collect()}
    assert rows[10]["lab"] == "x" and rows[11]["lab"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="left_id column"):
        interval_overlap_join(
            left, right, "s", "e", "rs", "re", by="key", how="left",
            left_id="nope",
        )
    # the uniqueness contract fails SILENTLY when violated (a matched
    # duplicate hides its unmatched copies from the complement), so the
    # opt-in validator must catch both duplicates and NULL ids
    dup = spark.createDataFrame(
        [(10, 1, 0.0, 5.0), (10, 1, 50.0, 60.0)],
        "rid long, key long, s double, e double",
    )
    with _pytest.raises(ValueError, match="uniqueness contract"):
        interval_overlap_join(
            dup, right, "s", "e", "rs", "re", by="key", how="left",
            left_id="rid", validate_left_id=True,
        )
    nulls = spark.createDataFrame(
        [(None, 1, 0.0, 5.0), (11, 1, 50.0, 60.0)],
        "rid long, key long, s double, e double",
    )
    with _pytest.raises(ValueError, match="uniqueness contract"):
        interval_overlap_join(
            nulls, right, "s", "e", "rs", "re", by="key", how="left",
            left_id="rid", validate_left_id=True,
        )
    # and a clean id passes through the validator unchanged
    ok = interval_overlap_join(
        left, right, "s", "e", "rs", "re", by="key",
        bucket_width=10.0, how="left", left_id="rid", validate_left_id=True,
    )
    assert {r["rid"] for r in ok.collect()} == {10, 11}


def test_left_outer_duplicate_left_rows_survive(spark):
    """All-column anti-equality cannot distinguish identical left rows;
    the row-id protocol must keep BOTH copies of a duplicated unmatched
    left row, and both copies of a matched one."""
    from tape_spark.operators import interval_join, interval_overlap_join

    left = spark.createDataFrame(
        [(1, 5.0), (1, 5.0), (1, 99.0), (1, 99.0)], "key long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 0.0, 10.0, "lab")], "key long, rs double, re double, lab string"
    )
    out = interval_join(left, right, "ts", "rs", "re", by="key",
                        bucket_width=100.0, how="left").toPandas()
    assert len(out) == 4
    assert out[out.ts == 5.0]["lab"].tolist() == ["lab", "lab"]
    assert out[out.ts == 99.0]["lab"].isna().all()
    # same contract for the span-vs-span join
    lspan = spark.createDataFrame(
        [(1, 5.0, 6.0), (1, 5.0, 6.0), (1, 90.0, 91.0)],
        "key long, ls double, le double",
    )
    o2 = interval_overlap_join(
        lspan, right.selectExpr("key", "rs", "re", "lab"),
        "ls", "le", "rs", "re", by="key", bucket_width=50.0, how="left",
    ).toPandas()
    assert len(o2) == 3
    assert o2[o2.ls == 5.0]["lab"].tolist() == ["lab", "lab"]


def test_asof_join_max_rows_per_key_guard(spark):
    """Opt-in celebrity-key guard: a key whose UNION rows exceed the
    bound must raise naming the key BEFORE the window sort; under the
    bound the result is unchanged; validation errors are explicit."""
    from tape_spark.operators import asof_join

    left = spark.createDataFrame(
        [(u, float(t), f"l{t}") for u in (1, 2) for t in range(10)],
        "user long, t double, lv string",
    )
    right = spark.createDataFrame(
        [(1, float(t) + 0.5, t) for t in range(40)] + [(2, 1.5, 99)],
        "user long, t double, rv long",
    )
    with pytest.raises(ValueError, match="user=1.*50 rows"):
        asof_join(left, right, on="t", by="user", max_rows_per_key=30).collect()
    ok = asof_join(left, right, on="t", by="user", max_rows_per_key=1000)
    base = asof_join(left, right, on="t", by="user")
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, base.collect()))
    with pytest.raises(ValueError, match="must be positive"):
        asof_join(left, right, on="t", by="user", max_rows_per_key=0)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("slices", [3, 16])
def test_asof_salted_matches_pandas(spark, direction, slices):
    """salt_slices must not change a single match: the salted two-phase
    plan (per-(key, time-slice) scans + boundary carries) is compared
    row-for-row against pandas.merge_asof on random data."""
    left, right = _trades_quotes(seed=23)
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="key",
            direction=direction,
            salt_slices=slices,
        )
        .toPandas()
        .sort_values(["key", "t", "qty"])
        .reset_index(drop=True)
    )
    exp = _expected_asof(left, right, direction)
    pd.testing.assert_frame_equal(
        out[["key", "t", "qty", "t_r", "px"]],
        exp[["key", "t", "qty", "t_r", "px"]],
        check_dtype=False,
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_salted_tolerance_and_ties(spark, direction):
    """Boundary-adversarial case: duplicated timestamps (ties must keep
    merge_asof's last/first-input-row choice ACROSS slice boundaries)
    plus a tolerance that invalidates distant carries."""
    left, right = _trades_quotes(seed=31, n_left=150, n_right=90)
    # force heavy timestamp ties, including across slice boundaries
    right["t"] = np.round(right["t"], -1)
    left["t"] = np.round(left["t"], -1)
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="key",
            direction=direction,
            tolerance=25.0,
            salt_slices=7,
        )
        .toPandas()
        .sort_values(["key", "t", "qty"])
        .reset_index(drop=True)
    )
    exp = _expected_asof(left, right, direction, tolerance=25.0)
    pd.testing.assert_frame_equal(
        out[["key", "t", "qty", "t_r", "px"]],
        exp[["key", "t", "qty", "t_r", "px"]],
        check_dtype=False,
    )


def test_asof_salted_no_by_and_edges(spark):
    """salt_slices with by=None (the global-sort bottleneck it also
    lifts), the all-equal-timestamps degenerate range (salting becomes a
    no-op), salt_slices=1 (no-op), and salt_slices=0 (raises)."""
    import warnings as _w

    from tape_spark.operators import asof_join

    left, right = _trades_quotes(seed=41, n_keys=1, n_left=60, n_right=40)
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        base = sorted(
            map(tuple, asof_join(ldf.drop("key"), rdf.drop("key"), on="t").collect())
        )
        salted = sorted(
            map(
                tuple,
                asof_join(
                    ldf.drop("key"), rdf.drop("key"), on="t", salt_slices=8
                ).collect(),
            )
        )
    assert salted == base
    # degenerate time range: every row at the same timestamp
    l1 = spark.createDataFrame([(1, 5.0, "a"), (1, 5.0, "b")], "k long, t double, v string")
    r1 = spark.createDataFrame([(1, 5.0, 9.0)], "k long, t double, px double")
    got = asof_join(l1, r1, on="t", by="k", salt_slices=4).collect()
    assert all(r["px"] == 9.0 for r in got) and len(got) == 2
    # salt_slices=1 is a documented no-op
    one = sorted(map(tuple, asof_join(ldf, rdf, on="t", by="key", salt_slices=1).collect()))
    plain = sorted(map(tuple, asof_join(ldf, rdf, on="t", by="key").collect()))
    assert one == plain
    with pytest.raises(ValueError, match="salt_slices"):
        asof_join(ldf, rdf, on="t", by="key", salt_slices=0)

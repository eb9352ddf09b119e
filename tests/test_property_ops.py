"""Property-based operator checks (hypothesis): randomized inputs against
independent reference implementations. Spark-backed properties keep
max_examples small (each example is a Spark job); numpy properties run the
default budget."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from tape_spark.analysis.structure_function.base_calculator import binned_statistic


# --------------------------------------------------------------------- #
# binned_statistic vs a direct per-bin loop (pure numpy, cheap examples) #
# --------------------------------------------------------------------- #


@given(
    data=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=60
    ),
    cuts=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=2, max_size=8
    ),
)
@settings(max_examples=200, deadline=None)
def test_binned_statistic_matches_reference_loop(data, cuts):
    x = np.asarray(data, dtype=float)
    edges = np.unique(np.asarray(cuts, dtype=float))
    if edges.size < 2:
        return
    vals = x * 2.0 + 1.0
    stat, _, _ = binned_statistic(x, vals, statistic="mean", bins=edges)
    n_bins = edges.size - 1
    for b in range(n_bins):
        lo, hi = edges[b], edges[b + 1]
        if b == n_bins - 1:
            mask = (x >= lo) & (x <= hi)  # last bin right-inclusive
        else:
            mask = (x >= lo) & (x < hi)
        if mask.any():
            assert stat[b] == pytest.approx(vals[mask].mean(), rel=1e-12)
        else:
            assert np.isnan(stat[b])


# --------------------------------------------------------------------- #
# exact dedup: hash-keyed plan == full-text plan on random corpora       #
# --------------------------------------------------------------------- #

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    texts = [
        " ".join(draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=4)))
        for _ in range(n)
    ]
    return texts


@given(texts=corpora())
@settings(max_examples=10, deadline=None)
def test_exact_dedup_hash_equals_text_property(spark, texts):
    from tape_spark.operators import exact_dedup

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    by_text = exact_dedup(docs, by_hash=False).toPandas().sort_values("doc_id").reset_index(drop=True)
    by_hash = exact_dedup(docs, by_hash=True).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(by_text, by_hash)


# --------------------------------------------------------------------- #
# sessionize vs a pure-python reference over random event streams        #
# --------------------------------------------------------------------- #


def _sessions_reference(times, gap):
    """Independent session counter: sorted times, gap > threshold splits."""
    if not times:
        return 0
    times = sorted(times)
    n = 1
    for prev, cur in zip(times, times[1:]):
        if cur - prev > gap:
            n += 1
    return n


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # user
            st.floats(min_value=0, max_value=10_000, allow_nan=False),  # t
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_sessionize_matches_reference_property(spark, events):
    from tape_spark.streaming import sessionize

    gap = 600.0
    df = spark.createDataFrame(
        [(u, float(t), i) for i, (u, t) in enumerate(events)],
        "user_id long, t double, event_id long",
    )
    out = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sessionize(df, gap_seconds=gap, order_cols=["event_id"]).collect()
    }
    by_user = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, times in by_user.items():
        assert out[u] == (_sessions_reference(times, gap), len(times))

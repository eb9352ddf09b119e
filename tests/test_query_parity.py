"""Property-based parity: Ensemble.query's pandas-dialect expressions must
select exactly the rows pandas DataFrame.query selects, across randomly
generated boolean expressions over the ramp columns."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from tape_spark.utils.expr import translate_query_expr

COLUMNS = ["flux", "err", "time"]
OPS = [">", ">=", "<", "<=", "==", "!="]


@st.composite
def comparisons(draw):
    col = draw(st.sampled_from(COLUMNS))
    op = draw(st.sampled_from(OPS))
    val = draw(st.sampled_from([0, 0.3, 1, 2.5, 3, 500, 999]))
    return f"({col} {op} {val})"


@st.composite
def expressions(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        base = draw(comparisons())
    else:
        left = draw(expressions(depth=depth - 1))
        right = draw(expressions(depth=depth - 1))
        join = draw(st.sampled_from(["&", "|"]))
        base = f"({left} {join} {right})"
    if draw(st.booleans()):
        base = f"~{base}"
    return base


@pytest.fixture(scope="module")
def parity_frames(spark):
    rng = np.random.default_rng(8)
    pdf = pd.DataFrame(
        {
            "id": np.arange(400) % 7,
            "flux": np.round(rng.uniform(0, 4, 400), 2),
            "err": np.round(rng.uniform(0, 1, 400), 2),
            "time": np.arange(400, dtype=float),
            "band": np.array(["g", "r"])[np.arange(400) % 2],
        }
    )
    sdf = spark.createDataFrame(pdf)
    return pdf, sdf


@settings(max_examples=60, deadline=None)
@given(expr=expressions())
def test_query_matches_pandas(parity_frames, expr):
    pdf, sdf = parity_frames
    expected = pdf.query(expr)
    got = sdf.filter(translate_query_expr(expr)).toPandas()
    assert len(got) == len(expected)
    if len(expected):
        g = got.sort_values(["id", "time"]).reset_index(drop=True)
        e = expected.sort_values(["id", "time"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, e, check_dtype=False)

"""sorted_factorize == np.unique(return_inverse=True) on every shape the
block kernels feed it (tape_spark/analysis/kernel_util.py)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tape_spark.analysis.kernel_util import sorted_factorize


@given(
    vals=st.lists(
        st.sampled_from(["g", "r", "i", "z", "y"]), min_size=0, max_size=200
    )
)
@settings(max_examples=100, deadline=None)
def test_matches_np_unique_on_strings(vals):
    arr = np.asarray(vals, dtype=object)
    got_u, got_c = sorted_factorize(arr)
    if arr.size == 0:
        assert got_u.size == 0 and got_c.size == 0
        return
    exp_u, exp_c = np.unique(arr, return_inverse=True)
    assert list(got_u) == list(exp_u)
    assert (got_c == exp_c).all()


@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000), max_size=200))
@settings(max_examples=100, deadline=None)
def test_matches_np_unique_on_ints(vals):
    arr = np.asarray(vals, dtype=np.int64)
    got_u, got_c = sorted_factorize(arr)
    if arr.size == 0:
        assert got_u.size == 0 and got_c.size == 0
        return
    exp_u, exp_c = np.unique(arr, return_inverse=True)
    assert (got_u == exp_u).all() and (got_c == exp_c).all()


def test_none_raises_like_np_unique():
    arr = np.asarray(["g", None, "r"], dtype=object)
    with pytest.raises(TypeError):
        np.unique(arr)
    with pytest.raises(TypeError):
        sorted_factorize(arr)

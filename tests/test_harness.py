"""The local correctness gate must predict the driver's dtype-sensitive
value hash: these pin the compare() rules that caught (and must keep
catching) oracle-typing drift."""

import importlib.util
import os

import numpy as np
import pandas as pd

_SPEC = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "check_correctness.py",
    ),
)
cc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(cc)


def test_compare_flags_int_vs_float_kind():
    a = pd.DataFrame({"x": np.array([849], dtype=np.int32)})
    b = pd.DataFrame({"x": np.array([849.0])})
    assert cc.compare(a, b).startswith("DTYPE")


def test_compare_flags_integer_width():
    a = pd.DataFrame({"x": np.array([849], dtype=np.int32)})
    b = pd.DataFrame({"x": np.array([849], dtype=np.int64)})
    assert cc.compare(a, b).startswith("DTYPE")


def test_compare_accepts_matching_dtypes_and_values():
    a = pd.DataFrame({"x": np.array([1, 2], dtype=np.int64), "y": [0.5, np.nan]})
    b = pd.DataFrame({"y": [0.5, np.nan], "x": np.array([1, 2], dtype=np.int64)})
    assert cc.compare(a, b) == "OK"


def test_compare_rounds_floats_to_6dp_before_equality():
    a = pd.DataFrame({"x": [0.12345649]})
    b = pd.DataFrame({"x": [0.12345640]})
    assert cc.compare(a, b) == "OK"
    c = pd.DataFrame({"x": [0.1234570]})
    assert cc.compare(a, c).startswith("VALUES")


def test_compare_string_columns_exact():
    a = pd.DataFrame({"s": ["g", "r"]})
    assert cc.compare(a, pd.DataFrame({"s": ["r", "g"]})) == "OK"  # order-free
    assert cc.compare(a, pd.DataFrame({"s": ["g", "b"]})).startswith("VALUES")

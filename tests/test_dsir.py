"""DSIR importance resampling: python-reference parity, determinism,
and plan locks.

The reference engine has no data-selection surface; DSIR is part of the
beyond-reference LLM-pipeline layer (published recipe: hashed-n-gram
importance weights + Gumbel top-k resampling, arXiv:2302.03169)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest

from tape_spark.operators import dsir_logweights, dsir_select

B = 128
A = 0.1


# ------------------------------------------------------- python reference


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:13], 16) % B


def _grams(text):
    toks = (text or "").strip().lower().split()
    return toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]


def _q(x: float) -> int:
    return math.floor(x * 1e12 + 0.5)


def _py_logweights(raw: dict, target: dict) -> dict:
    tc = Counter(_bucket(g) for t in target.values() for g in _grams(t))
    rc = Counter(_bucket(g) for t in raw.values() for g in _grams(t))
    t_tot, r_tot = sum(tc.values()), sum(rc.values())

    def lr(b):
        return (
            _q(math.log(tc.get(b, 0) + A))
            - _q(math.log(t_tot + A * B))
            - _q(math.log(rc.get(b, 0) + A))
            + _q(math.log(r_tot + A * B))
        )

    return {
        i: sum(lr(_bucket(g)) for g in _grams(t)) for i, t in raw.items()
    }


def _py_gumbel_units(doc_id: int, salt: str = "") -> int:
    seed = str(doc_id) + (":" + salt if salt else "")
    u = int(hashlib.md5(seed.encode()).hexdigest()[:13], 16) / 2.0 ** 52
    u = max(u, 2.0 ** -52)
    return math.floor(-math.log(-math.log(u)) * 1e12 + 0.5)


# ----------------------------------------------------------------- fixtures

RAW = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "spark engines shuffle data across many executors",
    2: "the lazy dog sleeps under the quick brown fox",
    3: "unrelated text about cooking pasta with tomato sauce",
    4: "",
    5: None,
    6: "quick brown quick brown quick brown",
}
TARGET = {
    100: "the quick brown fox is the target distribution",
    101: "brown fox and lazy dog sentences are wanted",
}


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            [(i, t) for i, t in RAW.items()], columns=["doc_id", "text"]
        )
    )


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            [(i, t) for i, t in TARGET.items()], columns=["doc_id", "text"]
        )
    )


# --------------------------------------------------------------------- tests


def test_logweights_python_parity(raw_df, target_df):
    got = {
        r["doc_id"]: r["logw_units"]
        for r in dsir_logweights(
            raw_df, target_df, num_buckets=B, smoothing=A
        ).collect()
    }
    assert got == _py_logweights(RAW, TARGET)


def test_empty_and_null_text_score_zero(raw_df, target_df):
    got = {
        r["doc_id"]: r["logw_units"]
        for r in dsir_logweights(
            raw_df, target_df, num_buckets=B, smoothing=A
        ).collect()
    }
    assert got[4] == 0 and got[5] == 0


def test_fox_docs_outrank_offtopic(raw_df, target_df):
    got = {
        r["doc_id"]: r["logw_units"]
        for r in dsir_logweights(
            raw_df, target_df, num_buckets=B, smoothing=A
        ).collect()
    }
    # docs 0 and 2 share the target's fox/dog vocabulary; doc 3 doesn't
    assert got[0] > got[3] and got[2] > got[3]


def test_select_python_parity(raw_df, target_df):
    lw = _py_logweights(RAW, TARGET)
    scores = {i: lw[i] + _py_gumbel_units(i) for i in RAW}
    expect = sorted(scores, key=lambda i: (-scores[i], i))[:4]
    got = (
        dsir_select(raw_df, target_df, k=4, num_buckets=B, smoothing=A)
        .orderBy("rank")
        .collect()
    )
    assert [r["doc_id"] for r in got] == expect
    assert [r["rank"] for r in got] == [1, 2, 3, 4]
    assert all(r["logw_units"] == lw[r["doc_id"]] for r in got)


def test_select_k_exceeds_n_returns_all(raw_df, target_df):
    got = dsir_select(raw_df, target_df, k=100, num_buckets=B, smoothing=A)
    assert got.count() == len(RAW)


def test_partitioning_invariance(raw_df, target_df):
    a = (
        dsir_select(raw_df, target_df, k=4, num_buckets=B, smoothing=A)
        .select("doc_id", "rank")
        .collect()
    )
    b = (
        dsir_select(
            raw_df.repartition(7), target_df.repartition(3),
            k=4, num_buckets=B, smoothing=A,
        )
        .select("doc_id", "rank")
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salt_changes_draw_not_weights(raw_df, target_df):
    base = dsir_select(raw_df, target_df, k=3, num_buckets=B, smoothing=A)
    salted = dsir_select(
        raw_df, target_df, k=3, num_buckets=B, smoothing=A, salt="epoch2"
    )
    w0 = {r["doc_id"]: r["logw_units"] for r in base.collect()}
    w1 = {r["doc_id"]: r["logw_units"] for r in salted.collect()}
    for i in set(w0) & set(w1):
        assert w0[i] == w1[i]


def test_validations(raw_df, target_df):
    with pytest.raises(ValueError):
        dsir_logweights(raw_df, target_df, num_buckets=0)
    with pytest.raises(ValueError):
        dsir_logweights(raw_df, target_df, smoothing=0.0)
    with pytest.raises(ValueError):
        dsir_select(raw_df, target_df, k=0)
    with pytest.raises(ValueError):
        dsir_select(raw_df, target_df, k=5, margin=1.0)


def test_logweights_plan_no_python(raw_df, target_df):
    plan = (
        dsir_logweights(raw_df, target_df, num_buckets=B, smoothing=A)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # B-row ratio table broadcast into scoring


def test_two_phase_topk_plan_and_parity(spark):
    """The final rank is two-phase (VERDICT r9 #3): the partitioned
    phase-1 window gets WindowGroupLimit (map-side prune to k), the
    unpartitioned global rank then sorts <= k*P rows — and the selection
    is bit-identical to a single global rank."""
    from pyspark.sql import Window, functions as F

    from tape_spark.operators.dsir import _two_phase_topk

    df = spark.range(20000).repartition(8).select(
        F.col("id"), (F.col("id") * 2654435761 % 65537).cast("long").alias("sc")
    )
    two = _two_phase_topk(df, 9, "sc", "id")
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
    w = Window.orderBy(F.col("sc").desc(), F.col("id"))
    ref = (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 9)
    )
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, ref.collect()))

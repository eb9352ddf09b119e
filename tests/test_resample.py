"""resample_timeseries / Ensemble.resample_lightcurves tests: numpy
interpolation parity, methods, grid geometry, gaps, ties, edges."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tape_spark.operators import resample_timeseries

ROWS = [
    # series "a": irregular but dense
    ("a", 0.0, 10.0),
    ("a", 3.0, 16.0),
    ("a", 4.0, 4.0),
    ("a", 9.5, 15.0),
    # series "b": one observation only
    ("b", 5.0, 7.0),
    # series "c": a wide gap between 2 and 20
    ("c", 2.0, 1.0),
    ("c", 20.0, 10.0),
    # simultaneous observations at t=3 collapse to MIN
    ("d", 3.0, 5.0),
    ("d", 3.0, 2.0),
    ("d", 7.0, 8.0),
]


@pytest.fixture(scope="module")
def ts_df(spark):
    return spark.createDataFrame(ROWS, "sid string, t double, v double")


def _brute_linear(rows, step, max_gap=None):
    by = {}
    for s, t, v in rows:
        by.setdefault(s, {})
        by[s][t] = min(v, by[s].get(t, np.inf))
    out = {}
    for s, obs in by.items():
        ts = np.array(sorted(obs))
        vs = np.array([obs[t] for t in ts])
        lo, hi = int(np.ceil(ts[0] / step)), int(np.floor(ts[-1] / step))
        for i in range(lo, hi + 1):
            tg = i * step
            ip = np.searchsorted(ts, tg, side="right") - 1
            iq = np.searchsorted(ts, tg, side="left")
            tp, tn = ts[ip], ts[iq] if iq < len(ts) else None
            if tn is None:
                val = None
            elif tn == tp:
                val = vs[ip]
            elif max_gap is not None and tn - tp > max_gap:
                val = None
            else:
                val = vs[ip] + (vs[iq] - vs[ip]) * ((tg - tp) / (tn - tp))
            out[(s, tg)] = val
    return out


def test_linear_matches_numpy(spark, ts_df):
    res = resample_timeseries(ts_df, on="t", value_col="v", step=2.0, by="sid")
    got = {(r["sid"], r["t"]): r["v"] for r in res.collect()}
    want = _brute_linear(ROWS, 2.0)
    assert set(got) == set(want)
    for k, v in want.items():
        if v is None:
            assert got[k] is None, k
        else:
            assert got[k] == pytest.approx(v, abs=1e-12), k
    # series b spans no grid-aligned interval of its own: single obs at 5.0
    # → grid floor(5/2)=2..ceil(5/2)=3 is empty range (3 > 2 reversed guard)
    assert not any(k[0] == "b" for k in got) or all(
        k[1] in (4.0, 6.0) for k in got if k[0] == "b"
    )


def test_exact_observation_on_grid(spark, ts_df):
    # t=4 is a grid point AND an observation: interpolation returns it
    res = resample_timeseries(ts_df, on="t", value_col="v", step=2.0, by="sid")
    r = [x for x in res.collect() if x["sid"] == "a" and x["t"] == 4.0][0]
    assert r["v"] == 4.0 and r["t_prev"] == 4.0 and r["t_next"] == 4.0


def test_simultaneous_obs_min_convention(spark, ts_df):
    res = resample_timeseries(ts_df, on="t", value_col="v", step=1.0, by="sid")
    r = [x for x in res.collect() if x["sid"] == "d" and x["t"] == 3.0][0]
    assert r["v"] == 2.0  # min(5.0, 2.0)


def test_max_gap_masks_wide_spans(spark, ts_df):
    res = resample_timeseries(
        ts_df, on="t", value_col="v", step=2.0, by="sid", max_gap=10.0
    )
    cs = {r["t"]: r["v"] for r in res.collect() if r["sid"] == "c"}
    assert cs and all(v is None for t, v in cs.items() if 2.0 < t < 20.0)
    assert cs[2.0] == 1.0 and cs[20.0] == 10.0  # exact hits stay


def test_previous_and_nearest_methods(spark, ts_df):
    prev = {
        (r["sid"], r["t"]): r["v"]
        for r in resample_timeseries(
            ts_df, on="t", value_col="v", step=2.0, by="sid", method="previous"
        ).collect()
    }
    assert prev[("a", 6.0)] == 4.0  # holds the t=4 observation
    near = {
        (r["sid"], r["t"]): r["v"]
        for r in resample_timeseries(
            ts_df, on="t", value_col="v", step=2.0, by="sid", method="nearest"
        ).collect()
    }
    assert near[("a", 2.0)] == 16.0  # t=3 closer than t=0; tie rule unused
    assert near[("a", 6.0)] == 4.0  # |6-4| < |9.5-6|


def test_max_gap_previous_and_nearest(spark, ts_df):
    # previous: hold distance t - t_prev bounded
    prev = {
        (r["sid"], r["t"]): r["v"]
        for r in resample_timeseries(
            ts_df, on="t", value_col="v", step=2.0, by="sid",
            method="previous", max_gap=3.0,
        ).collect()
    }
    # series c: obs at 2 and 20; grid 2..20 — holds only within 3.0
    assert prev[("c", 2.0)] == 1.0 and prev[("c", 4.0)] == 1.0
    assert prev[("c", 6.0)] is None and prev[("c", 18.0)] is None
    assert prev[("c", 20.0)] == 10.0
    # nearest: distance to the CHOSEN side bounded
    near = {
        (r["sid"], r["t"]): r["v"]
        for r in resample_timeseries(
            ts_df, on="t", value_col="v", step=2.0, by="sid",
            method="nearest", max_gap=3.0,
        ).collect()
    }
    assert near[("c", 4.0)] == 1.0       # 2.0 away from t=2
    assert near[("c", 10.0)] is None     # 8 from both sides
    assert near[("c", 18.0)] == 10.0     # 2.0 away from t=20


def test_validation_and_nulls(spark, ts_df):
    with pytest.raises(ValueError):
        resample_timeseries(ts_df, on="t", value_col="v", step=0.0, by="sid")
    with pytest.raises(ValueError):
        resample_timeseries(ts_df, on="t", value_col="v", step=1.0, by="sid", method="cubic")
    with_null = ts_df.union(
        ts_df.sparkSession.createDataFrame(
            [("a", None, 1.0), ("a", 11.0, None)], "sid string, t double, v double"
        )
    )
    res = resample_timeseries(with_null, on="t", value_col="v", step=2.0, by="sid")
    # NULL time/value observations are ignored: same grid as before
    assert res.filter("sid = 'a'").count() == 5  # grid 0,2,4,6,8


def test_ensemble_wrapper(spark, ramp_ensemble):
    out = ramp_ensemble.resample_lightcurves(step=7.0, band="r")
    assert out.columns == ["id", "time", "flux", "time_prev", "time_next"]
    some = out.filter(F.col("flux").isNotNull())
    assert some.count() > 0
    r = some.limit(1).collect()[0]
    assert r["time_prev"] <= r["time"] <= r["time_next"]
    # per-band mode groups by (id, band)
    per_band = ramp_ensemble.resample_lightcurves(step=7.0)
    assert per_band.columns[:2] == ["id", "band"]
    assert per_band.count() > 0


def test_max_grid_rows_guard(spark):
    """The output size is the caller's grid choice; max_grid_rows turns a
    silent 'step too fine' blow-up into an error WITH the estimated row
    count, computed from the tiny span aggregate (VERDICT r9 #7)."""
    import pytest as _pytest

    from tape_spark.operators import resample_timeseries

    df = spark.createDataFrame(
        [(1, 0.0, 1.0), (1, 100.0, 2.0), (2, 0.0, 5.0), (2, 50.0, 6.0)],
        "sid long, t double, v double",
    )
    # grid = 101 + 51 = 152 points at step=1
    with _pytest.raises(ValueError, match="152 rows"):
        resample_timeseries(
            df, on="t", value_col="v", step=1.0, by="sid", max_grid_rows=100
        )
    # exactly at the bound passes and produces that many rows
    out = resample_timeseries(
        df, on="t", value_col="v", step=1.0, by="sid", max_grid_rows=152
    )
    assert out.count() == 152
    with _pytest.raises(ValueError, match="max_grid_rows must be > 0"):
        resample_timeseries(
            df, on="t", value_col="v", step=1.0, by="sid", max_grid_rows=0
        )

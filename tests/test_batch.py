"""batch() UDF-engine tests (reference model: ``test_ensemble.py:1927-2251``
batch variants, custom meta, by_band pivot shape)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tape_spark.analysis import AnalysisFunction


def test_batch_np_mean_matches_sql(ramp_ensemble):
    result = ramp_ensemble.batch(np.mean, "flux", meta=("result", float)).toPandas()
    expected = ramp_ensemble.compute("source").groupby("id")["flux"].mean()
    merged = result.set_index("id")["result"].sort_index()
    assert np.allclose(merged.to_numpy(), expected.sort_index().to_numpy())


def test_batch_custom_kernel_two_cols(ramp_ensemble):
    def weighted_mean(flux, err):
        w = 1.0 / (err**2 + 1e-9)
        return float(np.average(flux, weights=w))

    result = ramp_ensemble.batch(weighted_mean, "flux", "err", meta=("wmean", float)).toPandas()
    assert len(result) == 5
    assert result["wmean"].notna().all()


def test_batch_default_meta(ramp_ensemble):
    result = ramp_ensemble.batch(np.std, "flux")
    assert result.columns == ["id", "result"]


def test_batch_meta_shapes(ramp_ensemble):
    # dict meta with two fields
    def two_stats(flux):
        return {"lo": float(np.min(flux)), "hi": float(np.max(flux))}

    r = ramp_ensemble.batch(two_stats, "flux", meta={"lo": float, "hi": float}).toPandas()
    assert set(r.columns) == {"id", "lo", "hi"}
    assert (r["hi"] >= r["lo"]).all()

    # DDL-string meta
    r2 = ramp_ensemble.batch(lambda f: float(f.sum()), "flux", meta="total double")
    assert [f.name for f in r2.schema.fields] == ["id", "total"]

    # list-of-tuples meta
    r3 = ramp_ensemble.batch(
        lambda f: (float(f.min()), float(f.max())), "flux", meta=[("lo", float), ("hi", float)]
    ).toPandas()
    assert (r3["hi"] >= r3["lo"]).all()


def test_batch_series_result(ramp_ensemble):
    def as_series(flux):
        return pd.Series({"lo": float(np.min(flux)), "hi": float(np.max(flux))})

    r = ramp_ensemble.batch(as_series, "flux", meta={"lo": float, "hi": float}).toPandas()
    assert set(r.columns) == {"id", "lo", "hi"}


def test_batch_dataframe_result_multi_row(ramp_ensemble):
    def per_band_table(flux, band):
        return (
            pd.DataFrame({"flux": flux, "band": band})
            .groupby("band")["flux"]
            .mean()
            .rename("mean_flux")
            .reset_index()
        )

    r = ramp_ensemble.batch(
        per_band_table, "flux", "band", meta={"band": str, "mean_flux": float}
    ).toPandas()
    assert len(r) == 20  # 5 objects x 4 bands
    assert set(r["band"]) == {"r", "g", "b", "i"}


def test_batch_by_band_pivot(ramp_ensemble):
    r = ramp_ensemble.batch(
        np.mean, "flux", meta=("result", float), by_band=True, band_values=["b", "g", "i", "r"]
    )
    assert sorted(r.columns) == ["id", "result_b", "result_g", "result_i", "result_r"]
    pdf = r.toPandas()
    assert len(pdf) == 5


def test_batch_by_band_infers_bands(ramp_ensemble):
    r = ramp_ensemble.batch(np.mean, "flux", meta=("result", float), by_band=True)
    assert sorted(r.columns) == ["id", "result_b", "result_g", "result_i", "result_r"]


def test_batch_on_object_column(ramp_ensemble_with_object):
    """Grouping on an object-table column pulls it into source via join."""
    ens = ramp_ensemble_with_object
    r = ens.batch(np.mean, "flux", meta=("result", float), on=["name"]).toPandas()
    assert len(r) == 5
    assert "name" in r.columns


def test_batch_missing_column_raises(ramp_ensemble):
    with pytest.raises(KeyError, match="not found"):
        ramp_ensemble.batch(np.mean, "no_such_col", meta=("result", float))


def test_batch_tracks_result_frame(ramp_ensemble):
    n_before = len(ramp_ensemble.frames)
    ramp_ensemble.batch(np.mean, "flux", meta=("result", float), label="my_result")
    assert len(ramp_ensemble.frames) == n_before + 1
    assert "my_result" in ramp_ensemble.frames


def test_batch_analysis_function_dispatch(ramp_ensemble):
    class MeanFlux(AnalysisFunction):
        def cols(self, ens):
            return [ens._flux_col]

        def meta(self, ens):
            return {"mean_flux": float}

        def on(self, ens):
            return [ens._id_col]

        def __call__(self, flux, **kwargs):
            return float(np.mean(flux))

    r = ramp_ensemble.batch(MeanFlux()).toPandas()
    assert set(r.columns) == {"id", "mean_flux"}
    assert len(r) == 5


def test_batch_runs_after_sync(ramp_ensemble):
    ramp_ensemble.query("id >= 8003", table="object")
    r = ramp_ensemble.batch(np.mean, "flux", meta=("result", float)).toPandas()
    assert set(r["id"]) == {8003, 8004}


def test_batch_kwargs_passthrough(ramp_ensemble):
    def quantile(flux, q=0.5):
        return float(np.quantile(flux, q))

    r50 = ramp_ensemble.batch(quantile, "flux", meta=("v", float)).toPandas()
    r90 = ramp_ensemble.batch(quantile, "flux", meta=("v", float), q=0.9).toPandas()
    assert (r90["v"] >= r50["v"]).all()


def test_batch_by_band_multi_result_columns(ramp_ensemble):
    """Pivot naming for multi-column results follows the reference's
    {col}_{band} convention (ensemble.py:1284-1306)."""

    def lo_hi(flux):
        return {"lo": float(np.min(flux)), "hi": float(np.max(flux))}

    r = ramp_ensemble.batch(
        lo_hi, "flux", meta={"lo": float, "hi": float}, by_band=True, band_values=["g", "r"]
    )
    assert sorted(r.columns) == ["hi_g", "hi_r", "id", "lo_g", "lo_r"]


def test_batch_multi_key_grouping(ramp_ensemble):
    r = ramp_ensemble.batch(
        np.mean, "flux", meta=("result", float), on=["id", "band"]
    ).toPandas()
    assert len(r) == 20  # 5 objects x 4 bands
    assert {"id", "band", "result"} == set(r.columns)


def test_batch_map_and_shuffle_paths_agree(ramp_ensemble):
    fast = (
        ramp_ensemble.batch(np.std, "flux", meta=("s", float), use_map=True)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    slow = (
        ramp_ensemble.batch(np.std, "flux", meta=("s", float), use_map=False)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)


def test_batch_columnar_map_and_shuffle_paths_agree(ramp_ensemble):
    """The columnar protocol (supports_columnar kernels returning
    dict-of-ndarrays on the map path) must produce exactly the per-group
    DataFrame result the shuffle path builds."""
    from tape_spark.analysis import calc_sf2

    key = ["id", "band", "dt"]
    fast = (
        ramp_ensemble.batch(calc_sf2, use_map=True)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    slow = (
        ramp_ensemble.batch(calc_sf2, use_map=False)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, slow)


def test_builtin_reducer_fast_path_parity(ramp_ensemble):
    """Every recognized reducer: the engine-chosen built-in-aggregate path
    must match the forced pandas shuffle path at float tolerance."""
    for fn in (np.mean, np.sum, np.min, np.max, np.median, np.std, np.var):
        fast = ramp_ensemble.batch(fn, "flux", meta=("result", float)).toPandas()
        slow = ramp_ensemble.batch(
            fn, "flux", meta=("result", float), use_map=False
        ).toPandas()
        m = fast.merge(slow, on="id", suffixes=("_f", "_s"))
        assert len(m) == 5, fn
        assert np.allclose(
            m["result_f"], m["result_s"], rtol=1e-9, equal_nan=True
        ), fn


def test_builtin_reducer_uses_no_python(ramp_ensemble):
    """batch(np.mean) with the physical path left to the engine must plan
    as a pure JVM aggregate — no Arrow/pandas evaluation anywhere."""
    result = ramp_ensemble.batch(np.mean, "flux", meta=("result", float))
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "ArrowEvalPython" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_builtin_reducer_nan_null_forces_nan(spark):
    """A group containing NULL or NaN yields NaN — exactly what the numpy
    callable sees through the pandas conversion on the UDF path."""
    from tape_spark import ColumnMapper, Ensemble

    pdf = pd.DataFrame(
        {
            "id": [1, 1, 2, 2, 3, 3],
            "t": [0.0, 1.0, 0.0, 1.0, 0.0, 1.0],
            "flux": [1.0, None, 2.0, float("nan"), 3.0, 5.0],
            "err": [0.1] * 6,
            "band": ["g"] * 6,
        }
    )
    sdf = spark.createDataFrame(pdf)
    cm = ColumnMapper(id_col="id", time_col="t", flux_col="flux", err_col="err", band_col="band")
    ens = Ensemble(spark).from_spark(sdf, column_mapper=cm, npartitions=2)
    fast = ens.batch(np.mean, "flux", meta=("result", float)).toPandas().set_index("id")["result"]
    slow = (
        ens.batch(np.mean, "flux", meta=("result", float), use_map=False)
        .toPandas()
        .set_index("id")["result"]
    )
    for series in (fast, slow):
        assert np.isnan(series[1]) and np.isnan(series[2])
        assert series[3] == 4.0


def test_builtin_reducer_by_band_pivot(ramp_ensemble):
    """Fast path composes with the by_band pivot identically to the
    pandas path."""
    fast = ramp_ensemble.batch(np.mean, "flux", meta=("result", float), by_band=True).toPandas()
    slow = ramp_ensemble.batch(
        np.mean, "flux", meta=("result", float), by_band=True, use_map=False
    ).toPandas()
    cols = sorted(c for c in fast.columns if c.startswith("result_"))
    assert cols == sorted(c for c in slow.columns if c.startswith("result_"))
    m = fast.merge(slow, on="id", suffixes=("_f", "_s"))
    for c in cols:
        assert np.allclose(m[f"{c}_f"], m[f"{c}_s"], rtol=1e-9, equal_nan=True)


def test_batch_arrow_native_map_path_parity(ramp_ensemble):
    """The Arrow-native map wrapper (mapInArrow, numpy views straight off
    the RecordBatch) must reproduce the pandas map path exactly — scalar
    kernels, multi-row kernels, and the columnar protocol."""
    fast = (
        ramp_ensemble.batch(np.std, "flux", meta=("s", float), use_map=True,
                            arrow_native=True)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    ref = (
        ramp_ensemble.batch(np.std, "flux", meta=("s", float), use_map=True)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, ref)
    plan = ramp_ensemble.batch(
        np.std, "flux", meta=("s", float), use_map=True, arrow_native=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan and "MapInPandas" not in plan

    from tape_spark.analysis import calc_sf2

    key = ["id", "band", "dt"]
    fast2 = (
        ramp_ensemble.batch(calc_sf2, use_map=True, arrow_native=True)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    ref2 = (
        ramp_ensemble.batch(calc_sf2, use_map=True)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    assert len(fast2) > 0
    pd.testing.assert_frame_equal(fast2, ref2)


def test_batch_arrow_native_stetson_parity(ramp_ensemble):
    from tape_spark.analysis import StetsonJ

    fast = (
        ramp_ensemble.batch(StetsonJ(), use_map=True, arrow_native=True)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    ref = (
        ramp_ensemble.batch(StetsonJ(), use_map=True)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, ref)

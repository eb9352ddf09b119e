"""Ingestion + relational surface tests (reference model:
``test_ensemble.py:1618-1797`` query/filter/select/assign, flux→mag)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tape_spark import ColumnMapper, Ensemble


def test_from_source_dict_generates_object(ramp_ensemble):
    assert ramp_ensemble.object.count() == 5
    assert ramp_ensemble.source.count() == 1000


def test_from_pandas_with_object(ramp_ensemble_with_object):
    ens = ramp_ensemble_with_object
    assert ens.object.count() == 5
    assert "name" in ens.object.columns


def test_from_parquet_testdata(spark):
    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="l_linenumber",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    ens = Ensemble(spark).from_parquet(
        "/root/testdata/sf0.001/lineitem.parquet", column_mapper=cm, npartitions=4
    )
    assert ens.source.count() > 0
    assert ens.object.count() == ens.source.select("l_orderkey").distinct().count()


def test_from_parquet_additional_cols_false(spark):
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
        additional_cols=False,
        npartitions=4,
    )
    assert sorted(ens.source.columns) == sorted(
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_returnflag"]
    )


def test_ingestion_requires_column_mapper(spark, ramp_rows):
    with pytest.raises(ValueError, match="ColumnMapper"):
        Ensemble(spark).from_source_dict(ramp_rows)


def test_incomplete_column_mapper_rejected(spark, ramp_rows):
    with pytest.raises(ValueError, match="missing critical"):
        Ensemble(spark).from_source_dict(ramp_rows, column_mapper=ColumnMapper(id_col="id"))


def test_select_keeps_id(ramp_ensemble):
    ramp_ensemble.select(["flux", "time"])
    assert sorted(ramp_ensemble.frames["source"].columns) == ["flux", "id", "time"]


def test_query_filters_rows(ramp_ensemble):
    ramp_ensemble.query("flux > 2.0")
    pdf = ramp_ensemble.compute("source")
    assert (pdf["flux"] > 2.0).all()
    assert len(pdf) == 250  # ramp flux cycles 0,1,2,3 → one in four is 3


def test_query_pandas_boolean_ops(ramp_ensemble):
    ramp_ensemble.query("(flux > 1.0) & ~(band == 'i')")
    pdf = ramp_ensemble.compute("source")
    assert set(pdf["band"]) <= {"r", "g", "b"}
    assert (pdf["flux"] > 1.0).all()


def test_query_rejects_at_variables(ramp_ensemble):
    with pytest.raises(ValueError, match="@variable"):
        ramp_ensemble.query("flux > @threshold")


def test_filter_from_series(ramp_ensemble):
    ramp_ensemble.filter_from_series(F.col("err") < 0.5)
    pdf = ramp_ensemble.compute("source")
    assert (pdf["err"] < 0.5).all()


def test_dropna_subset(spark, ramp_rows, ramp_cm):
    rows = dict(ramp_rows)
    flux = rows["flux"].astype(float).copy()
    flux[::10] = np.nan
    rows["flux"] = flux
    ens = Ensemble(spark).from_source_dict(rows, column_mapper=ramp_cm, npartitions=2)
    ens.dropna(table="source", subset=["flux"])
    assert ens.source.count() == 900


def test_assign_column_and_expr(ramp_ensemble):
    ramp_ensemble.assign(lower_bound=F.col("flux") - 2 * F.col("err"), half="flux / 2")
    pdf = ramp_ensemble.compute("source")
    assert np.allclose(pdf["lower_bound"], pdf["flux"] - 2 * pdf["err"])
    assert np.allclose(pdf["half"], pdf["flux"] / 2)


def test_assign_callable(ramp_ensemble):
    ramp_ensemble.assign(doubled=lambda df: df["flux"] * 2)
    pdf = ramp_ensemble.compute("source")
    assert np.allclose(pdf["doubled"], pdf["flux"] * 2)


def test_drop_columns(ramp_ensemble):
    ramp_ensemble.drop("count")
    assert "count" not in ramp_ensemble.frames["source"].columns


def test_coalesce_first_non_null(spark, ramp_cm):
    pdf = pd.DataFrame(
        {
            "id": [1, 1, 2, 2],
            "time": [1.0, 2.0, 3.0, 4.0],
            "flux": [np.nan, 2.0, np.nan, 4.0],
            "flux2": [10.0, 20.0, 30.0, np.nan],
            "err": [0.1] * 4,
            "band": ["g"] * 4,
        }
    )
    ens = Ensemble(spark).from_pandas(pdf, column_mapper=ramp_cm, npartitions=1)
    ens.coalesce(["flux", "flux2"], "flux_c")
    out = ens.compute("source").sort_values("time")
    assert list(out["flux_c"]) == [10.0, 2.0, 30.0, 4.0]


def test_coalesce_drop_inputs_remaps_role(spark, ramp_cm):
    pdf = pd.DataFrame(
        {
            "id": [1, 1],
            "time": [1.0, 2.0],
            "flux": [np.nan, 2.0],
            "flux2": [10.0, 20.0],
            "err": [0.1, 0.1],
            "band": ["g", "g"],
        }
    )
    ens = Ensemble(spark).from_pandas(pdf, column_mapper=ramp_cm, npartitions=1)
    ens.coalesce(["flux", "flux2"], "flux_c", drop_inputs=True)
    assert ens._flux_col == "flux_c"
    assert "flux" not in ens.frames["source"].columns


def test_head_tail(ramp_ensemble):
    assert len(ramp_ensemble.head(7)) == 7
    assert len(ramp_ensemble.tail(3)) == 3


def test_insert_sources(ramp_ensemble):
    before = ramp_ensemble.source.count()
    ramp_ensemble.insert_sources(
        obj_ids=[8000, 8001], bands=["g", "r"], timestamps=[5000.0, 5001.0],
        fluxes=[1.5, 2.5], flux_errs=[0.1, 0.2],
    )
    assert ramp_ensemble.source.count() == before + 2


def test_sample_returns_new_ensemble(ramp_ensemble):
    sub = ramp_ensemble.sample(frac=0.5, random_state=42)
    assert sub is not ramp_ensemble
    n_obj = sub.object.count()
    assert 0 <= n_obj <= 5
    # sources follow the sampled objects via sync
    src_ids = {r[0] for r in sub.source.select("id").distinct().collect()}
    obj_ids = {r[0] for r in sub.object.select("id").collect()}
    assert src_ids == obj_ids
    # original untouched
    assert ramp_ensemble.object.count() == 5


def test_merge_broadcast(ramp_ensemble_with_object, spark):
    dim = spark.createDataFrame(pd.DataFrame({"id": [8000, 8001], "extra": ["a", "b"]}))
    out = ramp_ensemble_with_object.merge(dim, on="id", how="inner", table="object", broadcast_right=True)
    assert out.count() == 2
    assert "extra" in out.columns


def test_frame_management(ramp_ensemble, spark):
    df = spark.range(3)
    label = ramp_ensemble.add_frame(df, "aux")
    assert label == "aux"
    assert ramp_ensemble.select_frame("aux") is df
    with pytest.raises(ValueError):
        ramp_ensemble.add_frame(df, "aux")
    ramp_ensemble.update_frame(df.limit(1), "aux")
    assert ramp_ensemble.select_frame("aux").count() == 1
    ramp_ensemble.drop_frame("aux")
    with pytest.raises(KeyError):
        ramp_ensemble.select_frame("aux")
    with pytest.raises(ValueError):
        ramp_ensemble.drop_frame("source")
    info = ramp_ensemble.frame_info()
    assert set(info["label"]) >= {"source", "object"}


def test_convert_flux_to_mag_values(ramp_ensemble):
    ramp_ensemble.query("flux > 0")
    ramp_ensemble.convert_flux_to_mag(zero_point=25.0)
    pdf = ramp_ensemble.compute("source")
    expected = -2.5 * np.log10(pdf["flux"]) + 25.0
    assert np.allclose(pdf["flux_mag"], expected)
    expected_err = (2.5 / np.log(10)) * (pdf["err"] / pdf["flux"])
    assert np.allclose(pdf["flux_mag_err"], expected_err)


def test_convert_flux_to_mag_flux_form(ramp_ensemble):
    ramp_ensemble.query("flux > 0")
    ramp_ensemble.convert_flux_to_mag(zero_point=100.0, zp_form="flux", out_col_name="m")
    pdf = ramp_ensemble.compute("source")
    assert np.allclose(pdf["m"], -2.5 * np.log10(pdf["flux"] / 100.0))


def test_save_and_load_roundtrip(tmp_path, ramp_ensemble, spark):
    root = ramp_ensemble.save_ensemble(str(tmp_path), "ens")
    ens2 = Ensemble(spark).from_ensemble(root)
    assert ens2.source.count() == 1000
    assert ens2.object.count() == 5
    assert ens2._flux_col == "flux"


def test_to_timeseries(ramp_ensemble):
    ts = ramp_ensemble.to_timeseries(8000)
    assert ts.meta["id"] == 8000
    assert len(ts.time) == 200
    assert set(ts.band.unique()) <= {"r", "g", "b", "i"}


def test_introspection_surface(ramp_ensemble):
    assert "flux" in ramp_ensemble.columns
    info = ramp_ensemble.info(verbose=False)
    assert set(info["label"]) >= {"source", "object"}
    assert info.set_index("label").loc["source", "rows"] == 1000
    ci = ramp_ensemble.client_info()
    assert ci["master"].startswith("local")


def test_make_and_update_column_map(ramp_ensemble):
    cm = ramp_ensemble.make_column_map()
    assert cm.map["flux_col"] == "flux"
    ramp_ensemble.assign(flux2=lambda df: df["flux"] * 2)
    ramp_ensemble.update_column_mapping(flux_col="flux2")
    assert ramp_ensemble._flux_col == "flux2"
    result = ramp_ensemble.batch(np.mean, "flux2", meta=("m", float)).toPandas()
    assert len(result) == 5


def test_select_random_timeseries(ramp_ensemble):
    ts = ramp_ensemble.select_random_timeseries(seed=3)
    assert ts.meta["id"] in {8000, 8001, 8002, 8003, 8004}
    assert len(ts.time) == 200


def test_sample_hash_method_deterministic(ramp_ensemble):
    """method='hash': same objects kept across repeated calls (no RNG), a
    rough fraction of objects kept, and replacement rejected."""
    import pytest

    a = sorted(r[0] for r in ramp_ensemble.sample(frac=0.5, method="hash").object.select("id").collect())
    b = sorted(r[0] for r in ramp_ensemble.sample(frac=0.5, method="hash").object.select("id").collect())
    assert a == b
    total = ramp_ensemble.object.count()
    assert 0 < len(a) < total
    sub = sorted(r[0] for r in ramp_ensemble.sample(frac=0.2, method="hash").object.select("id").collect())
    assert set(sub) <= set(a)  # hash sampling nests: smaller frac ⊂ larger frac
    with pytest.raises(ValueError):
        ramp_ensemble.sample(frac=0.5, replace=True, method="hash")


class TestFoldLightcurves:
    def test_global_period(self, ramp_ensemble):
        ens = ramp_ensemble.fold_lightcurves(period=7.5, t0=1.0)
        pdf = ens.source.select("id", "time", "phase").toPandas()
        exp = ((pdf["time"] - 1.0) / 7.5) % 1.0
        assert np.allclose(pdf["phase"], exp)
        assert ((pdf["phase"] >= 0) & (pdf["phase"] < 1)).all()

    def test_per_object_period(self, ramp_ensemble_with_object):
        ens = ramp_ensemble_with_object
        # attach per-object periods to the object table: id 8000 -> 3.0, etc.
        ens.frames["object"] = ens.object.withColumn(
            "period", F.when(F.col("id") == 8004, F.lit(None)).otherwise(
                (F.col("id") - 7999).cast("double"))
        )
        ens.fold_lightcurves(period_col="period")
        pdf = ens.source.select("id", "time", "phase").toPandas()
        for oid, grp in pdf.groupby("id"):
            if oid == 8004:
                assert grp["phase"].isna().all()
            else:
                p = float(oid - 7999)
                assert np.allclose(grp["phase"], (grp["time"] / p) % 1.0)

    def test_negative_time_folds_into_unit(self, ramp_ensemble):
        ens = ramp_ensemble.fold_lightcurves(period=10.0, t0=5000.0)
        pdf = ens.source.select("phase").toPandas()
        assert ((pdf["phase"] >= 0) & (pdf["phase"] < 1)).all()

    def test_arg_validation(self, ramp_ensemble):
        import pytest as _pt
        with _pt.raises(ValueError):
            ramp_ensemble.fold_lightcurves()
        with _pt.raises(ValueError):
            ramp_ensemble.fold_lightcurves(period=1.0, period_col="x")
        with _pt.raises(ValueError):
            ramp_ensemble.fold_lightcurves(period=-2.0)

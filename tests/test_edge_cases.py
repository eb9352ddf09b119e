"""Degenerate-input robustness: empty frames, filter-all, tiny groups —
the shapes that crash naive per-group code at scale."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tape_spark import Ensemble


def test_batch_on_empty_source(ramp_ensemble):
    ramp_ensemble.query("flux > 1e12")  # drops every row
    result = ramp_ensemble.batch(np.mean, "flux", meta=("result", float))
    pdf = result.toPandas()
    assert len(pdf) == 0
    assert list(pdf.columns) == ["id", "result"]


def test_batch_shuffle_path_on_empty_source(ramp_ensemble):
    ramp_ensemble.query("flux > 1e12")
    result = ramp_ensemble.batch(np.mean, "flux", meta=("result", float), use_map=False)
    assert result.count() == 0


def test_sf2_on_empty_source(ramp_ensemble):
    ramp_ensemble.query("flux > 1e12")
    assert ramp_ensemble.sf2(sf_method="basic").count() == 0


def test_batch_single_row_groups(spark, ramp_cm):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "time": [1.0, 2.0, 3.0],
            "flux": [1.0, 2.0, 3.0],
            "err": [0.1, 0.1, 0.1],
            "band": ["g", "g", "g"],
        }
    )
    ens = Ensemble(spark).from_pandas(pdf, column_mapper=ramp_cm, npartitions=2)
    out = ens.batch(np.mean, "flux", meta=("m", float)).toPandas()
    assert sorted(out["m"]) == [1.0, 2.0, 3.0]


def test_bin_sources_empty(ramp_ensemble):
    ramp_ensemble.query("flux > 1e12")
    ramp_ensemble.bin_sources(time_window=10.0)
    assert ramp_ensemble.frames["source"].count() == 0


def test_prune_to_empty_then_ops(ramp_ensemble):
    ramp_ensemble.prune(threshold=10_000)
    assert ramp_ensemble.object.count() == 0
    assert ramp_ensemble.source.count() == 0
    assert len(ramp_ensemble.head(5)) == 0


def test_calc_nobs_on_empty(ramp_ensemble):
    ramp_ensemble.query("flux > 1e12")
    ramp_ensemble.calc_nobs()
    assert ramp_ensemble.compute("object").empty


def test_sample_frac_zero_and_one(ramp_ensemble):
    assert ramp_ensemble.sample(frac=0.0, random_state=1).object.count() == 0
    full = ramp_ensemble.sample(frac=1.0, random_state=1)
    assert full.source.count() == 1000


def test_dropna_everything(spark, ramp_cm, ramp_rows):
    rows = dict(ramp_rows)
    rows["flux"] = np.full(len(rows["id"]), np.nan)
    ens = Ensemble(spark).from_source_dict(rows, column_mapper=ramp_cm, npartitions=2)
    ens.dropna(subset=["flux"])
    assert ens.source.count() == 0
    assert ens.object.count() == 0  # empties dropped by sync


def test_find_day_gap_offset_no_gap(spark, ramp_cm):
    # observations in every hour → no empty run → -1.0
    t = 59000 + np.arange(240) / 24.0
    pdf = pd.DataFrame({"id": np.arange(240) % 3, "time": t, "flux": 1.0, "err": 0.1, "band": "g"})
    ens = Ensemble(spark).from_pandas(pdf, column_mapper=ramp_cm, npartitions=2)
    assert ens.find_day_gap_offset() == -1.0


def test_entry_smoke(spark):
    """The driver's flagship entry() must run and return rows."""
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"l_orderkey", "result"}


def test_skewed_object_correctness(spark, ramp_cm):
    """One pathological object with 100x the observations of the rest:
    batch (both paths), prune, and sync stay correct (the heavy group lands
    in one task — see docs/SCALING.md for the skew discussion)."""
    import pandas as pd

    n_heavy, n_light = 20_000, 50
    pdf = pd.DataFrame(
        {
            "id": np.r_[np.zeros(n_heavy, int), 1 + (np.arange(n_light * 9) % 9)],
            "time": np.arange(n_heavy + n_light * 9, dtype=float),
            "flux": np.r_[np.full(n_heavy, 5.0), np.full(n_light * 9, 7.0)],
            "err": 0.1,
            "band": "g",
        }
    )
    ens = Ensemble(spark).from_pandas(pdf, column_mapper=ramp_cm, npartitions=8)
    out = ens.batch(np.mean, "flux", meta=("m", float)).toPandas().set_index("id")
    assert out.loc[0, "m"] == 5.0
    assert (out.drop(index=0)["m"] == 7.0).all()

    ens.prune(threshold=1000)  # only the heavy object survives
    assert ens.object.count() == 1
    assert ens.source.count() == n_heavy


def test_sf2_combine_bootstrap_on_empty_source(ramp_ensemble):
    from tape_spark.analysis import StructureFunctionArgumentContainer

    ramp_ensemble.query("flux < -1")  # nothing survives
    container = StructureFunctionArgumentContainer()
    container.combine = True
    container.estimate_err = True
    container.calculation_repetitions = 3
    container.random_seed = 5
    assert ramp_ensemble.sf2(argument_container=container, combine=True).count() == 0


def test_sf2_combine_on_empty_source(ramp_ensemble):
    ramp_ensemble.query("flux > 1e12")
    assert ramp_ensemble.sf2(sf_method="basic", combine=True).count() == 0

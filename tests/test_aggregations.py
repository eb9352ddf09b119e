"""Aggregation / layout-op tests (reference model:
``test_ensemble.py:1545-1617`` calc_nobs/prune, ``:1798-1926`` binning,
``:1974-2046`` sort enforcement)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tape_spark import Ensemble


def test_calc_nobs_total(ramp_ensemble):
    ramp_ensemble.calc_nobs()
    obj = ramp_ensemble.compute("object")
    assert (obj["nobs_total"] == 200).all()


def test_calc_nobs_by_band(ramp_ensemble):
    ramp_ensemble.calc_nobs(by_band=True)
    obj = ramp_ensemble.compute("object")
    for b in ("r", "g", "b", "i"):
        assert f"nobs_{b}" in obj.columns
        assert (obj[f"nobs_{b}"] == 50).all()
    assert (obj["nobs_total"] == 200).all()


def test_calc_nobs_known_band_values_avoids_distinct(ramp_ensemble):
    ramp_ensemble.calc_nobs(by_band=True, band_values=["r", "g", "b", "i"])
    obj = ramp_ensemble.compute("object")
    assert (obj["nobs_total"] == 200).all()


def test_prune_threshold(spark, ramp_rows, ramp_cm):
    rows = {k: np.asarray(v)[:-100] for k, v in ramp_rows.items()}  # id 8000-8004 uneven
    ens = Ensemble(spark).from_source_dict(rows, column_mapper=ramp_cm, npartitions=2)
    counts = ens.compute("source").groupby("id").size()
    threshold = int(counts.max())
    ens.prune(threshold=threshold)
    surviving = set(ens.compute("object")["id"])
    assert surviving == set(counts[counts >= threshold].index)


def test_bin_sources_daily(spark, ramp_cm):
    # two observations of the same (id, band) inside one day-bucket
    pdf = pd.DataFrame(
        {
            "id": [1, 1, 1, 2],
            "time": [0.1, 0.9, 1.5, 0.5],
            "flux": [1.0, 3.0, 5.0, 7.0],
            "err": [3.0, 4.0, 1.0, 2.0],
            "band": ["g", "g", "g", "g"],
        }
    )
    ens = Ensemble(spark).from_pandas(pdf, column_mapper=ramp_cm, npartitions=1)
    ens.bin_sources(time_window=1.0, offset=0.0, count_col="n")
    out = ens.compute("source").sort_values(["id", "time"]).reset_index(drop=True)
    assert len(out) == 3
    first = out.iloc[0]
    assert first["time"] == 0.5 and first["flux"] == 2.0
    assert np.isclose(first["err"], np.sqrt(9 + 16) / 2)  # sqrt(sum err^2)/n
    assert first["n"] == 2


def test_bin_sources_custom_aggr(spark, ramp_cm):
    pdf = pd.DataFrame(
        {
            "id": [1, 1],
            "time": [0.1, 0.2],
            "flux": [1.0, 3.0],
            "err": [1.0, 1.0],
            "band": ["g", "g"],
            "extra": [10.0, 30.0],
        }
    )
    ens = Ensemble(spark).from_pandas(pdf, column_mapper=ramp_cm, npartitions=1)
    ens.bin_sources(time_window=1.0, custom_aggr={"extra": "max"})
    out = ens.compute("source")
    assert out["extra"].iloc[0] == 30.0


def test_find_day_gap_offset(spark, ramp_cm):
    # observations only in hours 0-5 → longest gap 6..23, midpoint 15 → 15/24
    rng = np.random.default_rng(0)
    hours = rng.integers(0, 6, 500)
    t = 59000 + rng.integers(0, 30, 500) + hours / 24.0 + rng.random(500) / 48.0
    pdf = pd.DataFrame(
        {"id": np.arange(500) % 7, "time": t, "flux": 1.0, "err": 0.1, "band": "g"}
    )
    ens = Ensemble(spark).from_pandas(pdf, column_mapper=ramp_cm, npartitions=2)
    offset = ens.find_day_gap_offset()
    assert np.isclose(offset, 15.0 / 24.0)


def test_sort_lightcurves_and_check_sorted(ramp_ensemble):
    ens = ramp_ensemble
    ens.sort_lightcurves(by_band=True)
    assert ens.check_sorted()
    assert ens.check_lightcurve_cohesion()


def test_cohesion_detects_split_objects(spark, ramp_rows, ramp_cm):
    ens = Ensemble(spark).from_source_dict(ramp_rows, column_mapper=ramp_cm, npartitions=4)
    assert ens.check_lightcurve_cohesion()
    # round-robin repartition deliberately breaks cohesion
    ens.frames["source"] = ens.frames["source"].repartition(8)
    assert not ens.check_lightcurve_cohesion()


def test_batch_kernel_sees_time_sorted_rows(ramp_ensemble):
    """Port of the reference's sort-enforcement test
    (test_ensemble.py:1974-2046): a kernel that raises on unsorted input
    must succeed on the map path, which time-sorts within groups."""

    def assert_sorted(time, flux):
        if not np.all(np.diff(time) >= 0):
            raise ValueError("input not time-sorted")
        return float(flux[0])

    out = ramp_ensemble.batch(assert_sorted, "time", "flux", meta=("first_flux", float))
    assert out.count() == 5


def test_check_sorted_detects_unsorted(ramp_ensemble):
    ens = ramp_ensemble
    # interleaved ids within partitions → id column not monotonic
    assert not ens.check_sorted()
    ens.sort_lightcurves()
    assert ens.check_sorted()

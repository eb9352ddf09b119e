"""Analysis-kernel tests with the reference's golden values
(``test_ensemble.py:1934-1963`` StetsonJ, ``test_analysis.py:138-158``
sf2 base case) plus per-calculator unit tests
(``tests/tape_tests/structure_function_calculators/``)."""

import numpy as np
import pandas as pd
import pytest

from tape_spark.analysis import (
    SF_METHODS,
    StructureFunctionArgumentContainer,
    calc_sf2,
    calc_stetson_J,
)
from tape_spark.analysis.light_curve import LightCurve, StructureFunctionLightCurve
from tape_spark.analysis.structure_function.base_calculator import (
    binned_statistic,
    compute_dt_bins,
)

# The reference's 8-point test curve (test_analysis.py:144-147).
TEST_T = [1.11, 2.23, 3.45, 4.01, 5.67, 6.32, 7.88, 8.2]
TEST_Y = [0.11, 0.23, 0.45, 0.01, 0.67, 0.32, 0.88, 0.2]
TEST_YERR = [0.1, 0.023, 0.045, 0.1, 0.067, 0.032, 0.8, 0.02]


def test_sf2_base_case_golden():
    res = calc_sf2(
        time=TEST_T,
        flux=TEST_Y,
        err=TEST_YERR,
        band=np.array(["r"] * 8),
        lc_id=[1] * 8,
    )
    assert res["dt"][0] == pytest.approx(3.1482, rel=0.001)
    assert res["sf2"][0] == pytest.approx(0.005365, rel=0.001)


def test_sf2_all_none_times():
    res = calc_sf2(
        time=np.array([None] * 8),
        flux=TEST_Y,
        err=TEST_YERR,
        band=np.array(["r"] * 8),
        lc_id=[1] * 8,
    )
    assert len(res) > 0  # falls back to ordinal times


def test_sf2_scalar_err():
    res = calc_sf2(
        time=TEST_T, flux=TEST_Y, err=0.1, band=np.array(["r"] * 8), lc_id=[1] * 8
    )
    assert len(res) > 0


def test_sf2_band_to_calc_filter():
    band = np.array(["r", "r", "r", "r", "g", "g", "g", "g"])
    container = StructureFunctionArgumentContainer()
    container.band_to_calc = "r"
    res = calc_sf2(
        time=TEST_T, flux=TEST_Y, err=TEST_YERR, band=band, lc_id=[1] * 8,
        argument_container=container,
    )
    assert set(res["band"]) == {"r"}


def test_sf2_wrong_length_band_raises():
    with pytest.raises(ValueError, match="same length"):
        calc_sf2(time=TEST_T, flux=TEST_Y, err=TEST_YERR, band=np.array(["r"] * 3), lc_id=[1] * 8)


def test_sf2_method_mismatch_raises():
    container = StructureFunctionArgumentContainer()
    container.sf_method = "basic"
    # explicitly asking for a different method than the container was built for
    with pytest.raises((ValueError, TypeError)):
        calc_sf2(
            time=TEST_T, flux=TEST_Y, err=TEST_YERR, band=np.array(["r"] * 8),
            lc_id=[1] * 8, sf_method="no_such_method", argument_container=container,
        )


@pytest.mark.parametrize("method", ["basic", "macleod_2012", "bauer_2009a", "bauer_2009b", "schmidt_2010"])
def test_all_sf_methods_run(method):
    rng = np.random.default_rng(11)
    n = 50
    res = calc_sf2(
        time=np.sort(rng.uniform(0, 100, n)),
        flux=rng.normal(10, 1, n),
        err=np.abs(rng.normal(0.1, 0.01, n)),
        band=np.array(["g"] * n),
        lc_id=[7] * n,
        sf_method=method,
    )
    assert len(res) > 0
    assert res["dt"].is_monotonic_increasing


def test_sf_registry_complete():
    assert set(SF_METHODS) == {"basic", "macleod_2012", "bauer_2009a", "bauer_2009b", "schmidt_2010"}


# One shared 3-point curve (the SF minimum): pairs give
# dt = [1, 3, 2], d_flux = [2, 5, 3], err^2-sums = [0.05, 0.10, 0.13].
_T3, _F3, _E3 = np.array([1.0, 2.0, 4.0]), np.array([1.0, 3.0, 6.0]), np.array([0.1, 0.2, 0.3])
_DF = np.array([2.0, 5.0, 3.0])
_E2 = np.array([0.05, 0.10, 0.13])


def _one_bin_calc(method):
    lc = StructureFunctionLightCurve(times=_T3, fluxes=_F3, errors=_E3)
    container = SF_METHODS[method].expected_argument_container()()
    container.sf_method = method
    container.bins = [0.0, 5.0]
    return SF_METHODS[method](lightcurves=[lc], argument_container=container)


def test_basic_calculator_exact():
    dts, sf2s = _one_bin_calc("basic").calculate()
    assert np.isclose(dts[0][0], 2.0)
    assert np.isclose(sf2s[0][0], np.mean(_DF**2 - _E2))


def test_bauer_2009a_exact():
    _, sf2s = _one_bin_calc("bauer_2009a").calculate()
    assert np.isclose(sf2s[0][0], np.mean(_DF**2) - np.mean(_E2))


def test_bauer_2009b_exact():
    _, sf2s = _one_bin_calc("bauer_2009b").calculate()
    assert np.isclose(sf2s[0][0], (np.pi / 2) * np.mean(np.abs(_DF)) ** 2 - np.mean(_E2))


def test_schmidt_2010_exact():
    _, sf2s = _one_bin_calc("schmidt_2010").calculate()
    expected = np.mean(np.sqrt(np.pi / 2) * np.abs(_DF) - np.sqrt(_E2)) ** 2
    assert np.isclose(sf2s[0][0], expected)


def test_macleod_2012_exact():
    _, sf2s = _one_bin_calc("macleod_2012").calculate()
    q75, q25 = np.percentile(_DF, [75, 25])
    assert np.isclose(sf2s[0][0], (0.74 * (q75 - q25)) ** 2)


def test_degenerate_curve_does_not_crash_ragged():
    """A curve with all-duplicate timestamps yields zero positive-dt pairs;
    the estimator must skip it rather than raise on ragged arrays
    (ADVICE r1, low: calculators.py ragged np.asarray)."""
    good = StructureFunctionLightCurve(
        times=np.array([1.0, 2.0, 3.0]), fluxes=np.array([1.0, 2.0, 3.0]),
        errors=np.array([0.1, 0.1, 0.1]),
    )
    degenerate = StructureFunctionLightCurve(
        times=np.array([5.0, 5.0, 5.0]), fluxes=np.array([1.0, 2.0, 3.0]),
        errors=np.array([0.1, 0.1, 0.1]),
    )
    container = StructureFunctionArgumentContainer()
    container.bins = [0.0, 10.0]
    for method in ("basic", "bauer_2009a", "bauer_2009b"):
        calc = SF_METHODS[method](lightcurves=[good, degenerate], argument_container=container)
        dts, sf2s = calc.calculate()
        assert len(dts) == 2
        assert dts[1].size == 0  # degenerate curve contributes nothing


def test_binned_statistic_matches_manual():
    x = np.array([0.5, 1.5, 1.6, 2.5, 3.0])
    v = np.array([1.0, 2.0, 4.0, 8.0, 16.0])
    stat, edges, _ = binned_statistic(x, v, statistic="mean", bins=[0.0, 1.0, 2.0, 3.0])
    assert np.isclose(stat[0], 1.0)
    assert np.isclose(stat[1], 3.0)
    assert np.isclose(stat[2], 12.0)  # right edge inclusive in last bin


def test_binned_statistic_callable_and_empty_bins():
    x = np.array([0.5, 2.5])
    v = np.array([3.0, 7.0])
    stat, _, _ = binned_statistic(x, v, statistic=np.max, bins=[0.0, 1.0, 2.0, 3.0])
    assert stat[0] == 3.0 and np.isnan(stat[1]) and stat[2] == 7.0


@pytest.mark.parametrize("method", ["size", "length", "loglength"])
def test_compute_dt_bins_cover_all_samples(method):
    rng = np.random.default_rng(3)
    dts = rng.uniform(0.1, 50.0, 500)
    edges = compute_dt_bins(dts, method, count_target=100)
    assert edges[0] <= dts.min() or np.isclose(edges[0], dts.min())
    assert edges[-1] >= dts.max() or np.isclose(edges[-1], dts.max())
    idx = np.digitize(dts, edges) - 1
    # float round-trip (exp∘log) can land the max a hair past the last edge
    idx[np.isclose(dts, edges[-1]) | (dts >= edges[-1])] = edges.size - 2
    assert ((idx >= 0) & (idx <= edges.size - 2)).all()


def test_stetson_j_constant_curve_near_zero():
    rng = np.random.default_rng(5)
    n = 500
    err = np.full(n, 0.1)
    flux = 10.0 + rng.normal(0, 0.1, n)
    out = calc_stetson_J(flux, err, np.array(["g"] * n))
    assert abs(out["g"]) < 0.6  # pure noise → J ≈ 0 (statistical bound)


def test_stetson_j_variable_curve_positive():
    rng = np.random.default_rng(6)
    n = 500
    err = np.full(n, 0.1)
    flux = 10.0 + 5.0 * np.sin(np.linspace(0, 20, n)) + rng.normal(0, 0.1, n)
    out = calc_stetson_J(flux, err, np.array(["g"] * n))
    assert out["g"] > 10  # strong coherent variability


def test_stetson_j_band_selection_and_missing_band():
    flux = np.array([1.0, 2.0, 3.0, 4.0])
    err = np.array([0.1, 0.1, 0.1, 0.1])
    band = np.array(["g", "g", "r", "r"])
    out = calc_stetson_J(flux, err, band, band_to_calc=["g", "z"])
    assert set(out) == {"g", "z"}
    assert np.isnan(out["z"])


def test_stetson_j_single_point_nan():
    out = calc_stetson_J(np.array([1.0]), np.array([0.1]), np.array(["g"]))
    assert np.isnan(out["g"])


def test_light_curve_nan_filtering():
    lc = LightCurve(
        times=np.array([1.0, 2.0, np.nan, 4.0]),
        fluxes=np.array([1.0, np.nan, 3.0, 4.0]),
        errors=np.array([0.1, 0.1, 0.1, 0.1]),
    )
    assert len(lc._times) == 2  # rows 0 and 3 survive


def test_light_curve_minimum_points():
    with pytest.raises(ValueError):
        StructureFunctionLightCurve(
            times=np.array([1.0]), fluxes=np.array([1.0]), errors=np.array([0.1])
        )


def test_sf_light_curve_pairwise_differences():
    lc = StructureFunctionLightCurve(
        times=np.array([1.0, 2.0, 4.0]), fluxes=np.array([1.0, 3.0, 6.0]),
        errors=np.array([0.1, 0.2, 0.3]),
    )
    assert sorted(lc._all_d_times.tolist()) == [1.0, 2.0, 3.0]
    # d_fluxes correspond to (later - earlier) for positive dt pairs
    assert sorted(np.abs(lc._all_d_fluxes).tolist()) == [2.0, 3.0, 5.0]


# ------------------------------------------------------------------ #
# golden end-to-end through the Spark engine                          #
# ------------------------------------------------------------------ #


def test_golden_stetson_j_through_batch(golden_ensemble):
    """The reference's flagship integration test
    (test_ensemble.py:1934-1963): prune(10) → dropna → batch(StetsonJ)
    must reproduce g ≈ -0.04174282 and r ≈ 0.6075282."""
    ens = golden_ensemble
    ens.prune(10)
    ens.dropna(table="source")
    result = ens.batch(calc_stetson_J, band_to_calc=None, label="stetson_j")
    assert "stetson_j" in ens.frames
    pdf = result.toPandas().sort_values("ps1_objid").reset_index(drop=True)
    j = pdf["stetsonJ"].iloc[0]
    assert j["g"] == pytest.approx(-0.04174282, rel=0.001)
    assert j["r"] == pytest.approx(0.6075282, rel=0.001)


def test_golden_sf2_through_ensemble(golden_ensemble):
    """sf2 through the full engine returns per-(curve, band) rows with
    finite dt (test_ensemble.py:2349-2391 analog)."""
    ens = golden_ensemble
    ens.prune(10)
    ens.dropna(table="source")
    res = ens.sf2(sf_method="basic").toPandas()
    assert len(res) > 0
    # group key (ps1_objid) is prepended by the batch engine
    assert {"lc_id", "band", "dt", "sf2", "1_sigma"} <= set(res.columns)
    assert np.isfinite(res["dt"]).all()


def test_golden_stetson_j_grouped_by_band(golden_ensemble):
    """The reference's on=['ps1_objid','filterName'] variant
    (test_ensemble.py:1959-1961): per-(id, band) groups reproduce the same
    golden values as the per-id dict result."""
    ens = golden_ensemble
    ens.prune(10)
    ens.dropna(table="source")
    result = ens.batch(calc_stetson_J, on=["ps1_objid", "filterName"])
    pdf = result.toPandas().sort_values(["ps1_objid", "filterName"]).reset_index(drop=True)
    first = pdf[pdf["ps1_objid"] == pdf["ps1_objid"].iloc[0]].set_index("filterName")
    assert first.loc["g", "stetsonJ"]["g"] == pytest.approx(-0.04174282, rel=0.001)
    assert first.loc["r", "stetsonJ"]["r"] == pytest.approx(0.6075282, rel=0.001)


class TestLombScargle:
    def test_direct_sum_parity(self):
        """Chunked power equals an independent per-frequency direct sum."""
        from tape_spark.analysis import lomb_scargle_power

        rng = np.random.default_rng(5)
        t = np.sort(rng.uniform(0, 100, 120))
        y = np.sin(2 * np.pi * t / 7.3) + 0.2 * rng.standard_normal(120)
        freqs = np.linspace(0.01, 1.5, 333)
        got = lomb_scargle_power(t, y, freqs, block=32)

        yc = y - y.mean()
        var = yc.dot(yc) / (len(yc) - 1)
        exp = []
        for f in freqs:
            w = 2 * np.pi * f
            tau = np.arctan2(np.sum(np.sin(2 * w * t)), np.sum(np.cos(2 * w * t))) / (2 * w)
            c = np.cos(w * (t - tau)); s = np.sin(w * (t - tau))
            exp.append(0.5 * ((yc @ c) ** 2 / (c @ c) + (yc @ s) ** 2 / (s @ s)) / var)
        assert np.allclose(got, np.array(exp), rtol=1e-10, atol=1e-10)

    def test_recovers_planted_period(self):
        from tape_spark.analysis import LombScargle

        rng = np.random.default_rng(11)
        t = np.sort(rng.uniform(0, 60, 300))
        true_p = 4.21
        y = 2.0 * np.sin(2 * np.pi * t / true_p + 0.7) + 0.3 * rng.standard_normal(300)
        ls = LombScargle(min_period=1.0, max_period=30.0, n_freq=4000)
        out = ls(t, y, np.array(["g"] * 300))
        assert abs(out["best_period"] - true_p) < 0.05
        assert out["best_power"] > 10

    def test_degenerate_curves(self):
        from tape_spark.analysis import LombScargle

        ls = LombScargle(min_period=1.0, max_period=10.0)
        out = ls(np.array([1.0, 2.0]), np.array([1.0, 2.0]), np.array(["g", "g"]))
        assert np.isnan(out["best_period"])
        # constant flux: zero variance -> power 0 everywhere, period still
        # defined (argmax of zeros) but power 0
        t = np.linspace(0, 50, 40)
        out2 = ls(t, np.ones(40), np.array(["g"] * 40))
        assert out2["best_power"] == 0.0

    def test_batch_integration(self, ramp_ensemble):
        """Runs through Ensemble.batch: one (best_period, best_power) row
        per object, sinusoid objects recover their period."""
        from tape_spark.analysis import calc_lomb_scargle

        res = ramp_ensemble.batch(
            calc_lomb_scargle(min_period=2.0, max_period=100.0, n_freq=512)
        )
        pdf = res.toPandas()
        assert set(pdf.columns) >= {"id", "best_period", "best_power"}
        assert len(pdf) == 5
        assert pdf["best_period"].notna().all()


def test_find_periods_then_fold_workflow(spark):
    """End-to-end find-period -> fold: planted sinusoids, recovered
    periods land on the object table, fold by the recovered column."""
    import numpy as np
    import pandas as pd

    from tape_spark import ColumnMapper, Ensemble

    rng = np.random.default_rng(42)
    rows = []
    for oid, period in ((1, 3.7), (2, 8.2)):
        t = np.sort(rng.uniform(0, 120, 300))
        flux = np.sin(2 * np.pi * t / period) + rng.normal(0, 0.05, t.size)
        for ti, fi in zip(t, flux):
            rows.append((oid, float(ti), float(fi), 0.05, "g"))
    src = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "time", "flux", "err", "band"])
    )
    cm = ColumnMapper(id_col="id", time_col="time", flux_col="flux",
                      err_col="err", band_col="band")
    ens = Ensemble(spark).from_spark(src, column_mapper=cm, npartitions=4)
    ens.find_periods(min_period=1.0, max_period=50.0, n_freq=4096)
    obj = {r["id"]: r["best_period"] for r in ens.object.collect()}
    assert abs(obj[1] / 3.7 - 1) < 0.02 and abs(obj[2] / 8.2 - 1) < 0.02
    ens.fold_lightcurves(period_col="best_period")
    from pyspark.sql import functions as F

    ph = ens.frames["source"].agg(F.min("phase"), F.max("phase")).collect()[0]
    assert 0.0 <= ph[0] and ph[1] < 1.0
    # re-running with the same label REPLACES the columns (no ambiguous
    # duplicates) and a fold by that label still resolves
    ens.find_periods(min_period=1.0, max_period=50.0, n_freq=4096)
    obj_cols = ens.object.columns
    assert obj_cols.count("best_period") == 1
    assert obj_cols.count("best_period_power") == 1
    ens.fold_lightcurves(period_col="best_period", label="phase2")
    assert "phase2" in ens.frames["source"].columns

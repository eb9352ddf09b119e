"""SF² advanced paths: bootstrap error estimation, repetitions, combine
mode, binning knobs (reference model: ``test_analysis.py`` bootstrap and
combine cases)."""

import numpy as np
import pandas as pd
import pytest

from tape_spark.analysis import StructureFunctionArgumentContainer, calc_sf2


def _curve(n=60, seed=4, lc=1):
    rng = np.random.default_rng(seed)
    return dict(
        time=np.sort(rng.uniform(0, 100, n)),
        flux=rng.normal(10, 1, n),
        err=np.abs(rng.normal(0.1, 0.01, n)),
        band=np.array(["g"] * n),
        lc_id=[lc] * n,
    )


def test_sf2_repetitions_with_bootstrap():
    container = StructureFunctionArgumentContainer()
    container.estimate_err = True
    container.calculation_repetitions = 25
    container.random_seed = 42
    res = calc_sf2(**_curve(), argument_container=container)
    assert len(res) > 0
    assert (res["1_sigma"] > 0).any()  # resampling spread reported


def test_sf2_bootstrap_deterministic_with_seed():
    def run():
        container = StructureFunctionArgumentContainer()
        container.estimate_err = True
        container.calculation_repetitions = 10
        container.random_seed = 7
        return calc_sf2(**_curve(), argument_container=container)

    pd.testing.assert_frame_equal(run(), run())


def test_sf2_upper_lower_errors_reported():
    container = StructureFunctionArgumentContainer()
    container.estimate_err = True
    container.calculation_repetitions = 10
    container.random_seed = 1
    container.report_upper_lower_error_separately = True
    res = calc_sf2(**_curve(), argument_container=container)
    assert {"lower_error", "upper_error"} <= set(res.columns)
    assert ((res["lower_error"] >= 0) & (res["upper_error"] >= 0)).all()


def test_sf2_combine_merges_curves():
    c1, c2 = _curve(seed=1, lc=1), _curve(seed=2, lc=2)
    merged = {
        k: np.concatenate([np.asarray(c1[k]), np.asarray(c2[k])]) for k in c1
    }
    container = StructureFunctionArgumentContainer()
    container.combine = True
    res = calc_sf2(**merged, argument_container=container)
    assert set(res["lc_id"]) == {"combined"}
    assert res["dt"].is_monotonic_increasing


def test_sf2_explicit_bins_respected():
    container = StructureFunctionArgumentContainer()
    container.bins = [0.0, 25.0, 50.0, 100.0]
    res = calc_sf2(**_curve(), argument_container=container)
    assert len(res) == 3


@pytest.mark.parametrize("method", ["length", "loglength"])
def test_sf2_bin_methods(method):
    container = StructureFunctionArgumentContainer()
    container.bin_method = method
    res = calc_sf2(**_curve(), argument_container=container)
    assert len(res) > 0


def test_sf2_ignore_timestamps():
    container = StructureFunctionArgumentContainer()
    container.ignore_timestamps = True
    res = calc_sf2(**_curve(), argument_container=container)
    assert len(res) > 0


def _kernel_combine(ramp_rows, **ac_kwargs):
    """In-kernel combine-mode result on the ramp data (the golden model for
    the distributed plan)."""
    container = StructureFunctionArgumentContainer()
    container.combine = True
    for k, v in ac_kwargs.items():
        setattr(container, k, v)
    res = calc_sf2(
        time=ramp_rows["time"],
        flux=ramp_rows["flux"],
        err=ramp_rows["err"],
        band=ramp_rows["band"],
        lc_id=ramp_rows["id"],
        argument_container=container,
    )
    # the kernel emits NaN rows for empty bins; the distributed plan omits
    # those buckets entirely — align by dropping them before comparison
    return res.dropna(subset=["sf2"]).sort_values(["band", "dt"]).reset_index(drop=True)


def test_sf2_combine_distributed_matches_kernel(ramp_ensemble, ramp_rows):
    """Golden parity: the distributed combine plan reproduces the in-kernel
    combine path (dt, sf2 bin-for-bin; 1_sigma exactly zero without
    bootstrap) on the same data."""
    dist = (
        ramp_ensemble.sf2(combine=True, exact_quantiles=True)
        .toPandas()
        .sort_values(["band", "dt"])
        .reset_index(drop=True)
    )
    kern = _kernel_combine(ramp_rows)
    assert list(dist["band"]) == list(kern["band"])
    np.testing.assert_allclose(dist["dt"], kern["dt"], rtol=1e-9)
    np.testing.assert_allclose(dist["sf2"], kern["sf2"], rtol=1e-9, atol=1e-12)
    assert (dist["1_sigma"] == 0.0).all()
    assert set(dist["lc_id"]) == {"combined"}


def test_sf2_combine_approx_quantiles_close(ramp_ensemble, ramp_rows):
    """The approx_percentile edge path (no single-task quantile stage) lands
    within a bin of the exact path: same bands, similar bin structure."""
    approx = (
        ramp_ensemble.sf2(combine=True, exact_quantiles=False)
        .toPandas()
        .sort_values(["band", "dt"])
        .reset_index(drop=True)
    )
    kern = _kernel_combine(ramp_rows)
    assert set(approx["band"]) == set(kern["band"])
    # approx_percentile returns actual elements (no interpolation), so bin
    # edges shift slightly; bin counts stay within a few of exact
    for b in set(kern["band"]):
        n_a = int((approx["band"] == b).sum())
        n_k = int((kern["band"] == b).sum())
        assert abs(n_a - n_k) <= max(3, int(0.15 * n_k))
    assert np.isfinite(approx["sf2"]).all()


def test_sf2_combine_bootstrap_error_bars(ramp_ensemble):
    """estimate_err + repetitions: 1_sigma reported and positive somewhere;
    per-(band,curve) seeding makes the distributed bootstrap deterministic."""
    container = StructureFunctionArgumentContainer()
    container.combine = True
    container.estimate_err = True
    container.calculation_repetitions = 10
    container.random_seed = 42

    def run():
        return (
            ramp_ensemble.sf2(argument_container=container, combine=True)
            .toPandas()
            .sort_values(["band", "dt"])
            .reset_index(drop=True)
        )

    res = run()
    assert set(res["lc_id"]) == {"combined"}
    assert (res["1_sigma"] >= 0).all()
    assert (res["1_sigma"] > 0).any()
    pd.testing.assert_frame_equal(res, run())


def test_sf2_does_not_mutate_callers_container(ramp_ensemble):
    container = StructureFunctionArgumentContainer()
    ramp_ensemble.sf2(argument_container=container, combine=True, band_to_calc="g")
    assert container.combine is False
    assert container.band_to_calc is None


def test_sf2_combine_honors_label(ramp_ensemble):
    ramp_ensemble.sf2(combine=True, label="my_sf2")
    assert "my_sf2" in ramp_ensemble.frames


def test_sf2_distributed_bounds_columns(ramp_ensemble):
    """report_upper_lower_error_separately must survive the batch schema
    (the default 5-column meta would silently drop the two bounds)."""
    container = StructureFunctionArgumentContainer()
    container.estimate_err = True
    container.calculation_repetitions = 5
    container.random_seed = 2
    container.report_upper_lower_error_separately = True
    res = ramp_ensemble.sf2(argument_container=container).toPandas()
    assert {"lower_error", "upper_error"} <= set(res.columns)
    finite = res.dropna(subset=["lower_error", "upper_error"])
    assert ((finite["lower_error"] >= 0) & (finite["upper_error"] >= 0)).all()


def test_sf2_combine_single_curve_band_keeps_id(spark):
    """Kernel parity: combine mode labels a band 'combined' only when more
    than one curve contributes; a single-curve band keeps the curve id."""
    from tape_spark import ColumnMapper, Ensemble

    rng = np.random.default_rng(8)
    rows = {"id": [], "time": [], "flux": [], "err": [], "band": []}
    for lc, bands in ((1, ["g", "u"]), (2, ["g"])):
        for b in bands:
            for i in range(12):
                rows["id"].append(lc)
                rows["time"].append(float(i) + (0.1 if b == "u" else 0.0))
                rows["flux"].append(float(rng.normal(10, 1)))
                rows["err"].append(0.1)
                rows["band"].append(b)
    cm = ColumnMapper(id_col="id", time_col="time", flux_col="flux", err_col="err", band_col="band")
    ens = Ensemble(spark).from_source_dict(rows, column_mapper=cm, npartitions=2)
    res = ens.sf2(combine=True).toPandas()
    labels = {b: set(g["lc_id"]) for b, g in res.groupby("band")}
    assert labels["g"] == {"combined"}
    assert labels["u"] == {"1"}


def test_sf2_combine_bounds_and_band_filter(ramp_ensemble):
    container = StructureFunctionArgumentContainer()
    container.combine = True
    container.estimate_err = True
    container.calculation_repetitions = 5
    container.random_seed = 3
    container.band_to_calc = "g"
    container.report_upper_lower_error_separately = True
    res = ramp_ensemble.sf2(argument_container=container, combine=True).toPandas()
    assert set(res["band"]) == {"g"}
    assert {"lower_error", "upper_error"} <= set(res.columns)
    assert ((res["lower_error"] >= 0) & (res["upper_error"] >= 0)).all()


def test_sf2_equally_weight_lightcurves():
    """Two curves of very different lengths, equal weighting resamples the
    larger down to the smaller count."""
    big, small = _curve(n=120, seed=5, lc=1), _curve(n=20, seed=6, lc=2)
    merged = {k: np.concatenate([np.asarray(big[k]), np.asarray(small[k])]) for k in big}
    container = StructureFunctionArgumentContainer()
    container.equally_weight_lightcurves = True
    container.random_seed = 3
    res = calc_sf2(**merged, argument_container=container)
    assert set(res["lc_id"]) == {"1", "2"}

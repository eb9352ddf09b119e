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

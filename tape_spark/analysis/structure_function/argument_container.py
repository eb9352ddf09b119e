"""Configuration container for structure-function calculations.

Parity target:
``/root/reference/src/tape/analysis/structure_function/base_argument_container.py:97-116``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Union


@dataclass
class StructureFunctionArgumentContainer:
    """Less-often-used configuration knobs for ``calc_sf2``.

    Attributes
    ----------
    band, lc_id
        Fallback band / lightcurve-id arrays when not passed to ``calc_sf2``.
    sf_method
        Which registered calculator to use (default ``'basic'``).
    band_to_calc
        Restrict computation to these bands (default: all present).
    combine
        If True, treat all light curves as one when binning/aggregating.
    bins, bin_method, bin_count_target
        Manual bin edges, or the auto-binning scheme (``'size'`` quantile,
        ``'length'`` equal-width, ``'loglength'`` equal-width in log) with a
        target sample count per bin.
    ignore_timestamps
        Assume equidistant observation times instead of the time column.
    random_seed
        Seed for bootstrap resampling reproducibility.
    equally_weight_lightcurves, number_lightcurve_samples
        Sub-sample each curve's differences so no curve dominates.
    estimate_err, calculation_repetitions
        Bootstrap-repeat the calculation and report quantile spread.
    lower_error_quantile, upper_error_quantile
        Quantiles used for the 1-sigma estimate ((upper-lower)/2).
    report_upper_lower_error_separately
        Emit ``lower_error``/``upper_error`` columns too.
    """

    band: List[str] = None
    lc_id: Union[int, List[int]] = None
    sf_method: str = "basic"
    band_to_calc: Union[str, List[str]] = None
    combine: bool = False
    bins: List[float] = None
    bin_method: str = "size"
    bin_count_target: int = 100
    ignore_timestamps: bool = False
    random_seed: int = None
    equally_weight_lightcurves: bool = False
    number_lightcurve_samples: int = None
    estimate_err: bool = False
    calculation_repetitions: int = 1
    lower_error_quantile: float = 0.16
    upper_error_quantile: float = 0.84
    report_upper_lower_error_separately: bool = False

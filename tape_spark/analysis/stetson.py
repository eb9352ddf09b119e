"""Stetson J variability statistic (Stetson 1996, PASP 108, 851).

The kernel is pure numpy and runs per light curve inside
``groupBy().applyInPandas``. The robust mean follows the standard
LSST/Stetson down-weighting scheme (alpha=2, beta=2, 20 iterations,
tolerance 1e-6).

Parity target: ``/root/reference/src/tape/analysis/stetsonj.py:12-190``;
golden values: band g ≈ -0.04174282, band r ≈ 0.6075282 on the reference
test parquet (``test_ensemble.py:1956-1963``).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Union

import numpy as np

from .base import AnalysisFunction
from .kernel_util import sorted_factorize

__all__ = ["calc_stetson_J", "StetsonJ"]


def _stetson_mean(
    values: np.ndarray,
    errors: np.ndarray,
    mean: Optional[float] = None,
    alpha: float = 2.0,
    beta: float = 2.0,
    n_iter: int = 20,
    tol: float = 1e-6,
) -> float:
    """Iteratively re-weighted mean that down-weights outliers.

    Each iteration scales the inverse-variance weights by
    ``1 / (1 + (|chi|/alpha)**beta)`` where chi is the error-normalized,
    bias-corrected residual. Stops early when the mean moves by less than
    ``tol`` both absolutely and fractionally.

    The fractional test divides by the SIGNED mean, mirroring the
    published LSST ``meas_base`` kernel (and the reference's
    ``stetsonj.py:184-189``) verbatim: for a negative mean the fractional
    test is vacuously true, so iteration stops as soon as the absolute
    move is below ``tol``. The golden parity values depend on reproducing
    this early-exit exactly, so it is intentional, not a bug to fix.
    """
    n = len(values)
    bias_factor = np.sqrt(n / (n - 1))
    inv_var = 1.0 / errors**2

    def wavg(w):
        # same multiply-sum-divide sequence as np.average, without its
        # generic weight validation — ~3x per-call overhead on tiny arrays
        return (values * w).sum() / w.sum()

    if mean is None:
        mean = wavg(inv_var)
    # the default alpha=2/beta=2 weight 1/(1+(|chi|/2)^2) is chi-sign-free,
    # so the abs/divide/power chain collapses to one fused chi² expression —
    # fewer tiny-array ufunc dispatches in the 20-iteration hot loop (the
    # kernel's dominant cost on short curves). Differences vs the generic
    # form are last-ulp only; the golden 6-dp constants are unaffected.
    fast = alpha == 2.0 and beta == 2.0
    if fast:
        chi2_scale = (bias_factor / errors) ** 2 * 0.25
    for _ in range(n_iter):
        resid = values - mean
        if fast:
            new_mean = wavg(inv_var / (1.0 + resid * resid * chi2_scale))
        else:
            chi = np.abs(bias_factor * resid / errors)
            new_mean = wavg(inv_var / (1.0 + (chi / alpha) ** beta))
        delta = np.abs(new_mean - mean)
        mean = new_mean
        if mean == 0:
            break
        # signed mean on purpose — see docstring (meas_base early-exit)
        if delta / mean < tol and delta < tol:
            break
    return mean


def _stetson_J_single_band(fluxes: np.ndarray, errors: np.ndarray) -> float:
    """Stetson J for one band of one light curve; NaN if fewer than 2 points."""
    n = len(fluxes)
    if n <= 1:
        return np.nan
    mean = _stetson_mean(fluxes, errors)
    delta = np.sqrt(n / (n - 1)) * (fluxes - mean) / errors
    p_k = delta**2 - 1.0
    return float(np.mean(np.sign(p_k) * np.sqrt(np.abs(p_k))))


class StetsonJ(AnalysisFunction):
    """Compute Stetson J per band for one light curve.

    Returns a dict ``{band: J}``. Via ``Ensemble.batch`` the dict is
    standardized into per-band result columns.
    """

    def cols(self, ens) -> List[str]:
        return [ens._flux_col, ens._err_col, ens._band_col]

    def meta(self, ens):
        # dict-valued result → MapType(band → J) column in Spark
        return "stetsonJ", dict

    def on(self, ens) -> List[str]:
        return [ens._id_col]

    def __call__(
        self,
        flux: np.ndarray,
        err: np.ndarray,
        band: np.ndarray,
        *,
        band_to_calc: Union[str, Iterable[str], None] = None,
        check_nans: bool = False,
    ):
        flux = np.asarray(flux, dtype=float)
        err = np.asarray(err, dtype=float)
        band = np.asarray(band)

        if check_nans:
            keep = ~(np.isnan(flux) | np.isnan(err))
            flux, err, band = flux[keep], err[keep], band[keep]

        present = np.unique(band)
        if band_to_calc is None:
            band_to_calc = present
        elif isinstance(band_to_calc, str):
            band_to_calc = [band_to_calc]

        out = {}
        for b in band_to_calc:
            if b in present:
                sel = band == b
                out[b] = _stetson_J_single_band(flux[sel], err[sel])
            else:
                out[b] = np.nan
        return out

    def process_block(self, col_arrays, starts, ends, *, band_to_calc=None, check_nans=False):
        """Whole-block vectorized evaluation for the batch engine: one call
        per Arrow block computes every group's per-band J with segment
        ``bincount`` reductions instead of a Python loop over groups.

        The iteratively re-weighted mean runs all segments in lock-step; a
        converged segment's mean is frozen (exactly the per-curve early
        exit) while the rest keep iterating, up to the same 20-iteration
        cap. Declines (returns None → engine falls back to per-group
        calls) when ``band_to_calc`` is set — the explicit-band path wants
        NaN rows for absent bands and is not a hot shape."""
        if band_to_calc is not None:
            return None
        flux = np.asarray(col_arrays[0], dtype=float)
        err = np.asarray(col_arrays[1], dtype=float)
        band = np.asarray(col_arrays[2])
        n_groups = len(starts)
        group_idx = np.repeat(np.arange(n_groups), np.asarray(ends) - np.asarray(starts))
        if check_nans:
            keep = ~(np.isnan(flux) | np.isnan(err))
            flux, err, band, group_idx = flux[keep], err[keep], band[keep], group_idx[keep]

        bands_uniq, bcode = sorted_factorize(band)
        nb = bands_uniq.size
        seg_uniq, seg_c = sorted_factorize(group_idx * nb + bcode)
        nseg = seg_uniq.size
        n = np.bincount(seg_c, minlength=nseg)

        J = np.full(nseg, np.nan)
        multi = n >= 2  # single-point bands stay NaN, as in the scalar path
        if multi.any():
            rm = multi[seg_c]
            seg_m = (np.cumsum(multi) - 1)[seg_c[rm]]
            v, e = flux[rm], err[rm]
            m = int(multi.sum())
            n_m = n[multi].astype(float)
            bias = np.sqrt(n_m / (n_m - 1.0))
            inv = 1.0 / (e * e)
            mean = np.bincount(seg_m, v * inv, minlength=m) / np.bincount(
                seg_m, inv, minlength=m
            )
            c_row = bias[seg_m] / e
            c_row = c_row * c_row * 0.25  # default alpha=2/beta=2 weight scale
            active = np.ones(m, dtype=bool)
            for _ in range(20):
                resid = v - mean[seg_m]
                w = inv / (1.0 + resid * resid * c_row)
                new_mean = np.bincount(seg_m, v * w, minlength=m) / np.bincount(
                    seg_m, w, minlength=m
                )
                delta = np.abs(new_mean - mean)
                mean = np.where(active, new_mean, mean)
                # same exit as _stetson_mean: evaluated on the updated mean,
                # signed-mean fractional test on purpose
                with np.errstate(divide="ignore", invalid="ignore"):
                    stop = (mean == 0) | ((delta / mean < 1e-6) & (delta < 1e-6))
                active &= ~stop
                if not active.any():
                    break
            d = bias[seg_m] * (v - mean[seg_m]) / e
            p_k = d * d - 1.0
            J[multi] = (
                np.bincount(seg_m, np.sign(p_k) * np.sqrt(np.abs(p_k)), minlength=m) / n_m
            )

        names = bands_uniq.tolist()
        out_g = (seg_uniq // nb).tolist()
        out_b = (seg_uniq % nb).tolist()
        results: list = [{} for _ in range(n_groups)]
        for g, b, j in zip(out_g, out_b, J.tolist()):
            results[g][names[b]] = j
        return results


calc_stetson_J = StetsonJ()

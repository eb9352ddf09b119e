"""Base machinery shared by all structure-function estimators.

Handles delta-t binning (three schemes), per-curve vs combined binned
statistics, and bootstrap sub-sampling. Pure numpy; executed inside
Spark pandas-UDF workers, one call per light-curve group (or one call over
a collected set in combine mode).

Parity target:
``/root/reference/src/tape/analysis/structure_function/base_calculator.py:60-215``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List

import numpy as np

from .argument_container import StructureFunctionArgumentContainer
from ..light_curve import StructureFunctionLightCurve


def _classify(x, edges):
    """Digitize ``x`` into 0-based bin indices with scipy's convention:
    left-closed/right-open bins, last bin right-inclusive. The single home
    of the edge convention — both binning entry points share it. Returns
    (idx, valid)."""
    n_bins = edges.size - 1
    if n_bins == 1:
        # same convention, no digitize: everything inside [e0, e1] is bin 0
        # (last-edge inclusive), outside is invalid
        return np.zeros(x.size, dtype=np.int64), (x >= edges[0]) & (x <= edges[1])
    idx = np.digitize(x, edges) - 1
    idx[x == edges[-1]] = n_bins - 1
    valid = (idx >= 0) & (idx < n_bins)
    return idx, valid


def _stat_per_bin(x, values, statistic, edges, idx, valid):
    """Apply ``statistic`` ('mean' or a callable) to the values in each
    bin; empty bins yield NaN."""
    n_bins = edges.size - 1
    stat = np.full(n_bins, np.nan)
    if statistic == "mean":
        counts = np.bincount(idx[valid], minlength=n_bins)
        sums = np.bincount(idx[valid], weights=values[valid], minlength=n_bins)
        nonzero = counts > 0
        stat[nonzero] = sums[nonzero] / counts[nonzero]
    elif callable(statistic):
        for b in range(n_bins):
            mask = valid & (idx == b)
            if mask.any():
                stat[b] = statistic(values[mask])
    else:
        raise ValueError(f"Unsupported statistic: {statistic!r}")
    return stat


def binned_statistic(x, values, statistic="mean", bins=10):
    """Numpy-only stand-in for ``scipy.stats.binned_statistic``.

    Supports the subset the SF estimators use: ``statistic`` is ``'mean'``
    or a callable applied to the values falling in each bin. Empty bins
    yield NaN. Returns ``(statistic_per_bin, bin_edges,
    bin_index_per_sample)``.

    The sandbox has no scipy, so this keeps the estimators importable in
    Spark Python workers with only numpy on the path.
    """
    x = np.asarray(x, dtype=float)
    values = np.asarray(values, dtype=float)
    edges = np.asarray(bins, dtype=float)
    idx, valid = _classify(x, edges)
    stat = _stat_per_bin(x, values, statistic, edges, idx, valid)
    return stat, edges, idx + 1


def _binned_pair(x, values, statistic, edges):
    """One digitize pass returning (mean-of-x, statistic-of-values) per bin.

    Performs the exact operation sequence of two :func:`binned_statistic`
    calls sharing the same ``x`` and ``edges`` (the hot shape in
    ``_binned_statistics``) while classifying samples only once — on tiny
    per-curve arrays the digitize/validity masks are half the cost.
    """
    x = np.asarray(x, dtype=float)
    values = np.asarray(values, dtype=float)
    edges = np.asarray(edges, dtype=float)
    idx, valid = _classify(x, edges)
    mean_x = _stat_per_bin(x, x, "mean", edges, idx, valid)
    stat = _stat_per_bin(x, values, statistic, edges, idx, valid)
    return mean_x, stat


def compute_dt_bins(dts: np.ndarray, method: str, count_target: int) -> np.ndarray:
    """Derive bin edges for an array of time differences.

    The number of bins targets ``count_target`` samples per bin; edges are
    computed over the *unique* dt values.

    - ``'size'``: quantile edges → roughly equal sample counts per bin.
    - ``'length'``: equal-width edges; first edge nudged down by 0.1% of the
      range so the minimum value falls inside (pandas.cut convention).
    - ``'loglength'``: equal width in log space, same first-edge nudge.
    """
    num_bins = int(np.ceil(len(dts) / count_target))
    if num_bins == 1 and method == "size":
        # the single-bin case (short curves — the dominant shape in survey
        # data) needs only the endpoints, and min/max over the raw values
        # equal min/max over the uniques: skip the per-curve unique sort,
        # linspace, and interpolation entirely
        return np.array([dts.min(), dts.max()], dtype=float)
    uniq = np.unique(dts)
    if method == "size":
        # inline linear-interpolation quantiles over the already-sorted
        # uniq: np.quantile's generic machinery is ~10% of the whole SF²
        # kernel on tiny per-curve arrays. Replicates numpy's _lerp
        # (including the t >= 0.5 symmetric form) so edges are
        # bit-identical to the np.quantile(uniq, linspace(0, 1, ...)) they
        # replace.
        pos = np.linspace(0.0, 1.0, num_bins + 1) * (uniq.size - 1)
        lo = pos.astype(np.int64)
        hi = np.minimum(lo + 1, uniq.size - 1)
        t = pos - lo
        a, b = uniq[lo], uniq[hi]
        diff = b - a
        edges = a + t * diff
        high = t >= 0.5
        edges[high] = b[high] - diff[high] * (1.0 - t[high])
        return edges
    if method == "length":
        lo, hi = uniq.min(), uniq.max()
        edges = np.linspace(lo, hi, num_bins + 1)
        edges[0] -= 0.001 * (hi - lo)
        return edges
    if method == "loglength":
        logs = np.log(uniq)
        lo, hi = logs.min(), logs.max()
        edges = np.linspace(lo, hi, num_bins + 1)
        edges[0] -= 0.001 * (hi - lo)
        return np.exp(edges)
    raise ValueError(f"Method '{method}' not recognized")


class StructureFunctionCalculator(ABC):
    """Base class for SF estimators; subclasses implement :meth:`calculate`.

    A calculator owns a list of :class:`StructureFunctionLightCurve` plus the
    argument container, and provides binning + binned-statistic helpers.
    """

    def __init__(
        self,
        lightcurves: List[StructureFunctionLightCurve],
        argument_container: StructureFunctionArgumentContainer,
    ):
        self._lightcurves = lightcurves
        self._argument_container = argument_container
        self._bins = argument_container.bins  # None → auto-bin on first use

    @abstractmethod
    def calculate(self):
        """Return (list-of-dt-arrays, list-of-sf-arrays), one entry per curve
        (or a single entry in combine mode)."""
        raise NotImplementedError

    @staticmethod
    @abstractmethod
    def name_id() -> str:
        """Unique registry name for this method."""
        raise NotImplementedError

    @staticmethod
    def expected_argument_container() -> type:
        """Argument-container class this method needs."""
        return StructureFunctionArgumentContainer

    def _bootstrap(self, random_generator=None):
        """Resample every curve's difference arrays (with replacement).

        Sample size is the smallest curve's difference count when
        ``equally_weight_lightcurves`` is set, else the user-specified
        ``number_lightcurve_samples``.
        """
        counts = [lc.number_of_difference_values for lc in self._lightcurves]
        if self._argument_container.equally_weight_lightcurves:
            n_samples = min(counts)
        else:
            n_samples = self._argument_container.number_lightcurve_samples
        for lc in self._lightcurves:
            lc.select_difference_samples(n_samples, random_generator=random_generator)

    def _binned_statistics(self, sample_values=None, statistic="mean"):
        """Bin each curve's dt values and apply ``statistic`` to the matching
        sample values per bin.

        Returns (mean-dt-per-bin arrays, statistic-per-bin arrays) — one array
        per curve, or one combined pair when ``combine`` is set. Bin edges are
        computed once (from the first eligible curve's full dt set, or the
        union in combine mode) and reused, matching the reference behavior.
        """
        if sample_values is None:
            sample_values = [lc.sample_d_fluxes for lc in self._lightcurves]
        if len(sample_values) != len(self._lightcurves):
            raise AttributeError("Number of lightcurves must equal sample_values.")

        if self._argument_container.combine and len(self._lightcurves) > 1:
            sample_dts = np.hstack([lc.sample_d_times for lc in self._lightcurves])
            binning_dts = np.hstack([lc._all_d_times for lc in self._lightcurves])
            values = np.hstack(list(sample_values))
            if self._bins is None:
                self._bins = compute_dt_bins(
                    binning_dts,
                    self._argument_container.bin_method,
                    self._argument_container.bin_count_target,
                )
            mean_dt, stat = _binned_pair(sample_dts, values, statistic, self._bins)
            return [mean_dt], [stat]

        dt_out, stat_out = [], []
        for lc, values in zip(self._lightcurves, sample_values):
            if lc._all_d_times.size > 1:
                if self._bins is None:
                    self._bins = compute_dt_bins(
                        lc._all_d_times,
                        self._argument_container.bin_method,
                        self._argument_container.bin_count_target,
                    )
                mean_dt, stat = _binned_pair(
                    lc.sample_d_times, values, statistic, self._bins
                )
                dt_out.append(mean_dt)
                stat_out.append(stat)
            else:
                dt_out.append(np.array([]))
                stat_out.append(np.array([]))
        return dt_out, stat_out

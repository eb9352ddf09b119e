"""Structure-function-squared driver: validation, band masking, calculator
dispatch, and bootstrap error estimation.

Runs per light-curve group inside ``groupBy().applyInPandas`` (via
``Ensemble.batch``/``Ensemble.sf2``) or locally over ``TimeSeries`` data.

Parity target: ``/root/reference/src/tape/analysis/structurefunction2.py:14-218``
(driver) and ``:221-473`` (validators). Golden values: basic method on the
reference test data gives dt ≈ 3.1482, sf2 ≈ 0.005365
(``test_analysis.py:138-158``). Unlike the reference, repetitions are
aggregated per curve so degenerate curves (empty difference arrays) do not
crash on ragged stacking.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from .base import AnalysisFunction
from .kernel_util import sorted_factorize
from .light_curve import MIN_OBSERVATIONS_REQUIRED_FOR_SF, StructureFunctionLightCurve
from .structure_function import SF_METHODS, StructureFunctionArgumentContainer

__all__ = ["StructureFunction2", "calc_sf2"]


def _resolve_arg_container(sf_method: str, argument_container):
    """Build a default argument container of the method's expected type when
    none was provided; resolve which method name wins (explicit arg beats the
    container only when non-default)."""
    if argument_container is None:
        container_type = SF_METHODS[sf_method].expected_argument_container()
        argument_container = container_type()
        argument_container.sf_method = sf_method
    if sf_method == "basic":  # default → defer to the container's choice
        sf_method = argument_container.sf_method
    if sf_method not in SF_METHODS:
        raise ValueError(f"Unknown structure function calculator method: {sf_method}")
    if type(argument_container) is not SF_METHODS[sf_method].expected_argument_container():
        raise TypeError("Argument container does not match Structure Function calculator method")
    return sf_method, argument_container


def _coerce_aligned(value, flux, fallback, name: str) -> np.ndarray:
    """Return an array aligned with flux: the given value, the container
    fallback, or a zeros array; length-checked."""
    if value is None:
        value = fallback
    if value is None:
        value = np.zeros(len(flux), dtype=np.int8)
    if len(value) != len(flux):
        raise ValueError(
            f"Value of `{name}` should be `None` or array with the same length as the `flux` array."
        )
    return np.asarray(value)


def _band_times(time, band_mask, argument_container) -> np.ndarray:
    """Times for one band: masked user times, or 0..N-1 when absent/ignored."""
    if time is None or argument_container.ignore_timestamps:
        return np.arange(int(np.sum(band_mask)), dtype=int)
    times = np.asarray(time)[band_mask]
    # the all-None check only applies to object arrays; numeric times
    # (the batch-engine shape) can never hold None
    if times.dtype == object and np.all(np.equal(times, None)):
        return np.arange(times.size, dtype=int)
    return times


def _band_errors(err, band_mask) -> np.ndarray:
    """Errors for one band: masked array, scalar broadcast, or zeros."""
    n = int(np.sum(band_mask))
    if err is None:
        return np.zeros(n)
    if np.isscalar(err):
        return np.full(n, float(err))
    return np.array(err)[band_mask]


class StructureFunction2(AnalysisFunction):
    """Self-describing SF² analysis function for ``Ensemble.batch``.

    Returns a DataFrame ``{lc_id, band, dt, sf2, 1_sigma}`` per group
    (``lower_error``/``upper_error`` appended when requested).
    """

    def cols(self, ens) -> List[str]:
        return [ens._time_col, ens._flux_col, ens._err_col, ens._band_col, ens._id_col]

    def meta(self, ens) -> Dict[str, type]:
        return {"lc_id": str, "band": str, "dt": float, "sf2": float, "1_sigma": float}

    def on(self, ens) -> List[str]:
        return [ens._id_col]

    # the batch engine may request dict-of-arrays output (one pandas
    # DataFrame per partition instead of per group — construction is ~20%
    # of the per-group budget on tiny curves)
    supports_columnar = True

    def __call__(
        self,
        time,
        flux,
        err=None,
        band=None,
        lc_id=None,
        *,
        sf_method: str = "basic",
        argument_container: Optional[StructureFunctionArgumentContainer] = None,
        _columnar: bool = False,
    ) -> pd.DataFrame:
        sf_method, argument_container = _resolve_arg_container(sf_method, argument_container)
        band = _coerce_aligned(band, flux, argument_container.band, "band")
        lc_id = _coerce_aligned(lc_id, flux, argument_container.lc_id, "lc_id")

        unique_bands = np.unique(band)
        # the batch engine calls once per id-group, so the ids are constant;
        # skip the per-call O(n log n) unique for that hot shape
        if lc_id.size and lc_id[0] == lc_id[-1] and (lc_id == lc_id[0]).all():
            unique_ids = lc_id[:1]
        else:
            unique_ids = np.unique(lc_id)

        band_to_calc = argument_container.band_to_calc
        if band_to_calc is None:
            band_to_calc = unique_bands
        elif isinstance(band_to_calc, str):
            band_to_calc = [band_to_calc]

        want_bounds = argument_container.report_upper_lower_error_separately
        pieces = []
        # default_rng construction is ~20% of a small group's budget; only
        # the bootstrap path consumes it
        rng = (
            np.random.default_rng(argument_container.random_seed)
            if argument_container.estimate_err
            else None
        )

        for b in band_to_calc:
            if b not in unique_bands:
                continue
            band_mask = band == b
            times = _band_times(time, band_mask, argument_container)
            errors = _band_errors(err, band_mask)
            fluxes = np.asarray(flux)[band_mask]
            ids_here = lc_id[band_mask]

            curves, curve_ids = [], []
            for uid in unique_ids:
                mask = ids_here == uid
                try:
                    curves.append(
                        StructureFunctionLightCurve(
                            times=np.asarray(times)[mask],
                            fluxes=fluxes[mask],
                            errors=errors[mask],
                        )
                    )
                    curve_ids.append(uid)
                except ValueError:
                    # Too few points in this band for this curve — skip it,
                    # matching the reference's behavior.
                    continue
            if not curves:
                continue

            calculator = SF_METHODS[sf_method](curves, argument_container)

            # reps[r] = (dts-per-curve, sfs-per-curve); combine mode yields a
            # single pseudo-curve per repetition.
            rep_dts, rep_sfs = [], []
            for _ in range(argument_container.calculation_repetitions):
                if argument_container.estimate_err:
                    calculator._bootstrap(random_generator=rng)
                d, s = calculator.calculate()
                rep_dts.append(d)
                rep_sfs.append(s)

            n_entries = len(rep_dts[0])
            if argument_container.combine and len(curves) > 1:
                entry_ids = ["combined"]
            else:
                entry_ids = [str(curve_ids[i]) for i in range(n_entries)]

            # Aggregate repetitions per curve (median + quantile spread),
            # tolerating empty arrays from degenerate curves. One repetition
            # is the common (non-bootstrap) case: the stack is a single row,
            # so the median is the row and the spread is exactly zero —
            # skipping nanmedian/nanquantile there roughly halves the
            # kernel's per-curve cost.
            single = len(rep_dts) == 1
            for i in range(n_entries):
                if not rep_dts[0][i].size:
                    continue
                if single:
                    med_d = np.asarray(rep_dts[0][i], dtype=float)
                    med_s = np.asarray(rep_sfs[0][i], dtype=float)
                    lo_q = hi_q = med_s
                else:
                    stack_d = np.vstack([rep_dts[r][i] for r in range(len(rep_dts))])
                    stack_s = np.vstack([rep_sfs[r][i] for r in range(len(rep_sfs))])
                    med_d = np.nanmedian(stack_d, axis=0)
                    med_s = np.nanmedian(stack_s, axis=0)
                    lo_q, hi_q = np.nanquantile(
                        stack_s,
                        (
                            argument_container.lower_error_quantile,
                            argument_container.upper_error_quantile,
                        ),
                        axis=0,
                    )
                piece = {
                    "lc_id": entry_ids[i],
                    "band": str(b),
                    "dt": med_d,
                    "sf2": med_s,
                    "1_sigma": (hi_q - lo_q) / 2.0,
                }
                if want_bounds:
                    piece["lower_error"] = med_s - lo_q
                    piece["upper_error"] = hi_q - med_s
                pieces.append(piece)

        columns = ["lc_id", "band", "dt", "sf2", "1_sigma"]
        if want_bounds:
            columns += ["lower_error", "upper_error"]
        if not pieces:
            if _columnar:
                return {c: np.empty(0) for c in columns}
            return pd.DataFrame({c: [] for c in columns})
        # one DataFrame build for the whole call, not one per (curve, band);
        # dict insertion order == the output column order, so no re-index
        # (a trailing [columns] select costs ~40% of the whole kernel when
        # curves are tiny — pandas indexer overhead per call)
        sizes = [p["dt"].size for p in pieces]
        data = {
            "lc_id": np.repeat([p["lc_id"] for p in pieces], sizes),
            "band": np.repeat([p["band"] for p in pieces], sizes),
            "dt": np.concatenate([p["dt"] for p in pieces]),
            "sf2": np.concatenate([p["sf2"] for p in pieces]),
            "1_sigma": np.concatenate([np.broadcast_to(p["1_sigma"], (s,)) for p, s in zip(pieces, sizes)]),
        }
        if want_bounds:
            data["lower_error"] = np.concatenate([p["lower_error"] for p in pieces])
            data["upper_error"] = np.concatenate([p["upper_error"] for p in pieces])
        if _columnar:
            return data
        return pd.DataFrame(data, copy=False)

    def process_block(
        self,
        col_arrays,
        starts,
        ends,
        *,
        sf_method: str = "basic",
        argument_container: Optional[StructureFunctionArgumentContainer] = None,
        _columnar: bool = False,
        **kwargs,
    ):
        """Whole-block vectorized evaluation of the hot SF² shape: basic
        estimator, single repetition, engine-derived 'size' bins where every
        curve's pair count fits one bin.

        Pair differences for EVERY (group, band) segment are built with one
        pass of integer index arithmetic (i-major, ascending j — the exact
        order the per-curve ``nonzero`` scan produces, so the bincount sums
        are bit-identical to the per-group path), then dt/sf² reduce per
        segment. Declines (returns None → per-group fallback) for any other
        configuration, or when a segment's pair count exceeds
        ``bin_count_target`` (multi-bin curves need the per-curve quantile
        binning)."""
        if not _columnar or kwargs:
            return None
        sf_method, ac = _resolve_arg_container(sf_method, argument_container)
        if (
            sf_method != "basic"
            or ac.combine
            or ac.estimate_err
            or ac.calculation_repetitions != 1
            or ac.bins is not None
            or ac.bin_method != "size"
            or ac.band_to_calc is not None
            or ac.report_upper_lower_error_separately
            or ac.ignore_timestamps
        ):
            return None
        time, flux, err, band, lc_id = col_arrays
        if time is None or band is None or err is None or np.isscalar(err):
            return None
        t = np.asarray(time, dtype=float)
        f = np.asarray(flux, dtype=float)
        e = np.asarray(err, dtype=float)
        band = np.asarray(band)
        if t.dtype == object or band.dtype.kind not in "USO":
            return None
        starts = np.asarray(starts)
        counts = np.asarray(ends) - starts
        n_groups = len(starts)
        group_idx = np.repeat(np.arange(n_groups), counts)
        id_str = [str(v) for v in np.asarray(lc_id)[starts].tolist()]

        keep = ~(np.isnan(t) | np.isnan(f) | np.isnan(e))
        t, f, e = t[keep], f[keep], e[keep]
        band, group_idx = band[keep], group_idx[keep]

        columns = ("lc_id", "band", "dt", "sf2", "1_sigma")
        empty = {c: np.empty(0) for c in columns}
        bands_uniq, bcode = sorted_factorize(band)
        nb = bands_uniq.size
        if nb == 0:
            return [empty] * n_groups
        seg_uniq, seg_c = sorted_factorize(group_idx * nb + bcode)
        n_per_seg = np.bincount(seg_c)
        eligible = n_per_seg >= MIN_OBSERVATIONS_REQUIRED_FOR_SF
        if not eligible.any():
            return [empty] * n_groups
        rm = eligible[seg_c]
        seg_m = (np.cumsum(eligible) - 1)[seg_c[rm]]
        t_rm = t[rm]
        # (segment, time) sort: the upper-triangle pair construction below
        # requires ascending time per segment. The map path already delivers
        # time-sorted groups (lexsort is stable → order unchanged, keeping
        # bincount sums bit-identical to the per-group scan); the shuffle
        # path may not, and sorting makes the pair SET correct there too.
        order = np.lexsort((t_rm, seg_m))
        seg_s = seg_m[order]
        ts, fs, es = t_rm[order], f[rm][order], e[rm][order]
        m = int(eligible.sum())
        L = np.bincount(seg_s, minlength=m)

        # all i<j index pairs per contiguous segment, i-major
        seg_start_row = np.repeat(np.cumsum(L) - L, L)
        local_i = np.arange(seg_s.size) - seg_start_row
        reps = L[seg_s] - 1 - local_i
        i_glob = np.repeat(np.arange(seg_s.size), reps)
        off = np.cumsum(reps) - reps
        within = np.arange(int(reps.sum())) - np.repeat(off, reps)
        j_glob = i_glob + within + 1

        dt = ts[j_glob] - ts[i_glob]
        pos = dt > 0  # rows are time-ascending, so ties are the only non-positives
        i_glob, j_glob, dt = i_glob[pos], j_glob[pos], dt[pos]
        pseg = seg_s[i_glob]
        pcnt = np.bincount(pseg, minlength=m)
        if pcnt.size and pcnt.max() > ac.bin_count_target:
            return None  # multi-bin curve present → per-curve binning applies

        emit = pcnt > 1  # mirrors _binned_statistics' `size > 1` gate
        d_flux = fs[j_glob] - fs[i_glob]
        sf_vals = d_flux * d_flux - (es[i_glob] ** 2 + es[j_glob] ** 2)
        sums_dt = np.bincount(pseg, dt, minlength=m)
        sums_sf = np.bincount(pseg, sf_vals, minlength=m)

        sel = np.flatnonzero(emit)
        dt_mean = sums_dt[sel] / pcnt[sel]
        sf_mean = sums_sf[sel] / pcnt[sel]
        seg_ids = seg_uniq[eligible][sel]
        g_sel = seg_ids // nb
        band_sel = bands_uniq.astype(str)[seg_ids % nb]

        per_g = np.bincount(g_sel, minlength=n_groups)
        pos0 = np.cumsum(per_g) - per_g
        results: list = []
        for g in range(n_groups):
            k = int(per_g[g])
            if k == 0:
                results.append(empty)
                continue
            sl = slice(int(pos0[g]), int(pos0[g]) + k)
            results.append(
                {
                    "lc_id": np.full(k, id_str[g], dtype=object),
                    "band": band_sel[sl],
                    "dt": dt_mean[sl],
                    "sf2": sf_mean[sl],
                    "1_sigma": np.zeros(k),
                }
            )
        return results


calc_sf2 = StructureFunction2()

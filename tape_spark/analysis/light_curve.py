"""In-memory single-light-curve containers used inside pandas-UDF workers.

These run per-group inside ``groupBy().applyInPandas`` — each instance sees
one light curve's numpy arrays, never a distributed collection.

Parity targets: ``/root/reference/src/tape/analysis/light_curve.py:4-72``
(NaN filtering + validation) and
``/root/reference/src/tape/analysis/structure_function/sf_light_curve.py:9-99``
(pairwise differences, bootstrap sub-sampling).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

MIN_OBSERVATIONS_REQUIRED_FOR_SF = 3


class LightCurve:
    """One light curve's (time, flux, error) arrays, NaN-filtered and validated.

    Raises ``ValueError`` if array lengths differ or, after NaN removal,
    fewer than ``minimum_observations`` points remain.
    """

    def __init__(
        self,
        times: np.ndarray,
        fluxes: np.ndarray,
        errors: np.ndarray,
        minimum_observations: int = 0,
    ):
        times = np.asarray(times, dtype=float)
        fluxes = np.asarray(fluxes, dtype=float)
        errors = np.asarray(errors, dtype=float)

        if times.size != fluxes.size or times.size != errors.size:
            raise ValueError("Input arrays are expected to have the same size.")

        keep = ~(np.isnan(times) | np.isnan(fluxes) | np.isnan(errors))
        self._times = times[keep]
        self._fluxes = fluxes[keep]
        self._errors = errors[keep]

        if self._times.size < minimum_observations:
            raise ValueError("Too few observations provided to create `LightCurve`.")

    def __len__(self):
        return self._times.size


class StructureFunctionLightCurve(LightCurve):
    """A light curve plus its all-pairs difference arrays.

    For every ordered pair (earlier, later) with a strictly positive time
    difference we keep:

    - ``d_time  = t_later - t_earlier``
    - ``d_flux  = f_later - f_earlier``
    - ``sum_squared_error = err_earlier**2 + err_later**2``

    Pairs with ``d_time <= 0`` (duplicate timestamps) are discarded, which
    also removes self-pairs and double counting. O(n^2) per curve, in memory —
    acceptable because each curve is small; distribution happens at the
    per-curve grouping level in Spark.
    """

    def __init__(self, times: np.ndarray, fluxes: np.ndarray, errors: np.ndarray):
        super().__init__(times, fluxes, errors, MIN_OBSERVATIONS_REQUIRED_FOR_SF)

        # Pairwise deltas: earlier index i, later index j, requiring t[j] > t[i].
        t = self._times
        i_idx, j_idx = np.nonzero(t[None, :] - t[:, None] > 0)
        self._all_d_times = t[j_idx] - t[i_idx]
        self._all_d_fluxes = self._fluxes[j_idx] - self._fluxes[i_idx]
        self._all_sum_squared_error = self._errors[i_idx] ** 2 + self._errors[j_idx] ** 2

        self.number_of_difference_values = self._all_d_times.size

        # The "sample" views are what calculators consume; bootstrap resampling
        # replaces them while the _all_* arrays stay intact for re-binning.
        self.sample_d_times = self._all_d_times
        self.sample_d_fluxes = self._all_d_fluxes
        self.sample_sum_squared_error = self._all_sum_squared_error

    def select_difference_samples(
        self,
        number_of_samples: Optional[int] = None,
        random_generator: Optional[np.random.Generator] = None,
    ):
        """Randomly resample the difference arrays (bootstrap, with replacement).

        The three arrays are resampled with a single shared index draw so that
        (d_time, d_flux, error) triples stay aligned.
        """
        if number_of_samples is None:
            number_of_samples = self.number_of_difference_values
        if number_of_samples > self.number_of_difference_values:
            raise ValueError(
                f"Requesting {number_of_samples} samples, but only "
                f"{self.number_of_difference_values} are present in the lightcurve"
            )
        if random_generator is None:
            random_generator = np.random.default_rng()

        stacked = np.vstack(
            (self._all_d_times, self._all_d_fluxes, self._all_sum_squared_error)
        ).astype(float)
        picked = random_generator.choice(stacked, number_of_samples, replace=True, axis=1, shuffle=False)
        self.sample_d_times, self.sample_d_fluxes, self.sample_sum_squared_error = picked

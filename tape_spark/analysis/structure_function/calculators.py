"""The five structure-function estimators.

All return **SF squared** per (curve, band, dt-bin). Formula citations are to
the published papers; parity targets are the reference implementations under
``/root/reference/src/tape/analysis/structure_function/*/calculator.py``.
"""

from __future__ import annotations

import numpy as np

from .base_calculator import StructureFunctionCalculator

# MacLeod et al. 2012 (Erratum 2014ApJ...782..119M): sigma ≈ 0.74 * IQR.
IQR_TO_SIGMA = 0.74
PI_OVER_2 = np.pi / 2.0
SQRT_PI_OVER_2 = np.sqrt(np.pi / 2.0)


class BasicStructureFunctionCalculator(StructureFunctionCalculator):
    """Excess variance: mean(d_flux^2 - (err_i^2 + err_j^2)) per dt bin.

    Kozlowski 2016 eq. 12 (arXiv:1604.05858).
    """

    def calculate(self):
        values = [
            np.square(lc.sample_d_fluxes) - lc.sample_sum_squared_error for lc in self._lightcurves
        ]
        return self._binned_statistics(sample_values=values)

    @staticmethod
    def name_id() -> str:
        return "basic"


class Macleod2012StructureFunctionCalculator(StructureFunctionCalculator):
    """SF = 0.74 * IQR of the d_flux distribution per bin; returns SF^2.

    MacLeod et al. 2012 (arXiv:1112.0679), Erratum 2014ApJ...782..119M.
    """

    @staticmethod
    def _iqr_sf2(binned_values):
        q75, q25 = np.percentile(binned_values, [75, 25])
        return (IQR_TO_SIGMA * (q75 - q25)) ** 2

    def calculate(self):
        return self._binned_statistics(statistic=self._iqr_sf2)

    @staticmethod
    def name_id() -> str:
        return "macleod_2012"


class Bauer2009AStructureFunctionCalculator(StructureFunctionCalculator):
    """SF^2 = mean(d_flux^2) - mean(err_i^2 + err_j^2) per bin.

    Bauer et al. 2009 eq. 4 (arXiv:0902.4103).
    """

    def calculate(self):
        dts, mean_df2 = self._binned_statistics(
            sample_values=[np.square(lc.sample_d_fluxes) for lc in self._lightcurves]
        )
        _, mean_err2 = self._binned_statistics(
            sample_values=[lc.sample_sum_squared_error for lc in self._lightcurves]
        )
        # Per-curve elementwise subtraction: curves with no positive-dt pairs
        # produce empty arrays, so a stacked np.asarray would be ragged.
        sfs = [df2 - err2 for df2, err2 in zip(mean_df2, mean_err2)]
        return dts, sfs

    @staticmethod
    def name_id() -> str:
        return "bauer_2009a"


class Bauer2009BStructureFunctionCalculator(StructureFunctionCalculator):
    """SF^2 = (pi/2) * mean(|d_flux|)^2 - mean(err_i^2 + err_j^2) per bin.

    Bauer et al. 2009 eq. 5 (arXiv:0902.4103).
    """

    def calculate(self):
        dts, mean_abs_df = self._binned_statistics(
            sample_values=[np.abs(lc.sample_d_fluxes) for lc in self._lightcurves]
        )
        _, mean_err2 = self._binned_statistics(
            sample_values=[lc.sample_sum_squared_error for lc in self._lightcurves]
        )
        sfs = [
            PI_OVER_2 * np.square(abs_df) - err2
            for abs_df, err2 in zip(mean_abs_df, mean_err2)
        ]
        return dts, sfs

    @staticmethod
    def name_id() -> str:
        return "bauer_2009b"


class Schmidt2010StructureFunctionCalculator(StructureFunctionCalculator):
    """SF = mean(sqrt(pi/2)*|d_flux| - sqrt(err_i^2 + err_j^2)) per bin;
    returns SF^2.

    Schmidt et al. 2010 eq. 2 (arXiv:1002.2642), Erratum 2010ApJ...721.1941S.
    """

    def calculate(self):
        values = [
            SQRT_PI_OVER_2 * np.abs(lc.sample_d_fluxes) - np.sqrt(lc.sample_sum_squared_error)
            for lc in self._lightcurves
        ]
        dts, sfs = self._binned_statistics(sample_values=values)
        return dts, [s**2 for s in sfs]

    @staticmethod
    def name_id() -> str:
        return "schmidt_2010"

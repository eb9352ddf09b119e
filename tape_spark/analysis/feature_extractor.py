"""Wrapper exposing the ``light-curve`` (Rust) feature evaluators to
``Ensemble.batch``.

The package is optional; import errors surface only when the extractor is
actually constructed, so the rest of the analysis library works without it.
The Rust evaluators run fine inside Spark Python workers (they are plain
CPython extension calls on numpy arrays).

Parity target: ``/root/reference/src/tape/analysis/feature_extractor.py:17-98``.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd

from .base import AnalysisFunction

try:  # pragma: no cover - exercised only when light-curve is installed
    import light_curve as licu

    BaseLightCurveFeature = licu.light_curve_ext._FeatureEvaluator
    LIGHT_CURVE_AVAILABLE = True
except ImportError:  # pragma: no cover
    licu = None
    BaseLightCurveFeature = None
    LIGHT_CURVE_AVAILABLE = False

__all__ = [
    "FeatureExtractor",
    "LIGHT_CURVE_AVAILABLE",
    "PythonFeatureEvaluator",
    "PyAmplitude",
    "PyMean",
    "PyStandardDeviation",
    "PyMedian",
    "PyExtractor",
]


class PythonFeatureEvaluator:
    """Pure-python stand-in for a ``light_curve`` feature evaluator.

    Implements the same contract the Rust evaluators expose — a ``names``
    sequence naming the output columns and ``__call__(t, m, sigma,
    **kwargs)`` returning one float per name — so the
    :class:`FeatureExtractor` dispatch path (``batch`` → per-curve call →
    per-name columns) is exercised end-to-end even where the optional
    ``light-curve`` wheel is not installed. Feature definitions follow the
    package's public docs (e.g. amplitude = half the magnitude range).

    Deviation from the Rust evaluators: a curve whose band mask leaves too
    few observations yields NaN instead of raising — a raise inside a
    pandas-UDF worker aborts the whole Spark job, which is never the right
    outcome for one thin curve at scale.
    """

    names: tuple = ()
    #: minimum observations for a defined value; NaN below this
    min_observations: int = 1

    def __call__(self, t, m, sigma=None, **kwargs) -> np.ndarray:
        m = np.asarray(m, dtype=float)
        if m.size < self.min_observations:
            return np.full(len(self.names), np.nan)
        return self._evaluate(t, m, sigma, **kwargs)

    def _evaluate(self, t, m, sigma, **kwargs) -> np.ndarray:
        raise NotImplementedError


class PyAmplitude(PythonFeatureEvaluator):
    names = ("amplitude",)

    def _evaluate(self, t, m, sigma, **kwargs):
        return np.array([(np.max(m) - np.min(m)) / 2.0])


class PyMean(PythonFeatureEvaluator):
    names = ("mean",)

    def _evaluate(self, t, m, sigma, **kwargs):
        return np.array([np.mean(m)])


class PyStandardDeviation(PythonFeatureEvaluator):
    names = ("standard_deviation",)
    min_observations = 2  # ddof=1 needs at least two points

    def _evaluate(self, t, m, sigma, **kwargs):
        return np.array([np.std(m, ddof=1)])


class PyMedian(PythonFeatureEvaluator):
    names = ("median",)

    def _evaluate(self, t, m, sigma, **kwargs):
        return np.array([np.median(m)])


class PyExtractor(PythonFeatureEvaluator):
    """Bundle of evaluators, mirroring ``licu.Extractor``: concatenated
    ``names`` and concatenated results in declaration order."""

    def __init__(self, *features: PythonFeatureEvaluator):
        self._features = features
        self.names = tuple(n for f in features for n in f.names)

    def __call__(self, t, m, sigma=None, **kwargs):
        return np.concatenate([np.atleast_1d(f(t, m, sigma, **kwargs)) for f in self._features])


class FeatureExtractor(AnalysisFunction):
    """Run one ``light-curve`` feature evaluator per light curve.

    ``feature`` must be a ``light_curve`` evaluator (e.g. ``licu.Amplitude()``
    or a ``licu.Extractor(...)`` bundle); its ``names`` attribute defines the
    output columns (all float64).
    """

    def __init__(self, feature):
        if isinstance(feature, PythonFeatureEvaluator):
            self.feature = feature
            return
        if not LIGHT_CURVE_AVAILABLE:
            raise ImportError(
                "The 'light-curve' package is required for Rust feature "
                "evaluators; install it (pip install light-curve) or pass a "
                "PythonFeatureEvaluator fallback (PyAmplitude, PyMean, ...)."
            )
        if not isinstance(feature, BaseLightCurveFeature):
            raise TypeError("feature must be a light-curve feature evaluator")
        self.feature = feature

    def cols(self, ens) -> List[str]:
        return [ens._time_col, ens._flux_col, ens._err_col, ens._band_col]

    def meta(self, ens):
        return {name: float for name in self.feature.names}

    def on(self, ens) -> List[str]:
        return [ens._id_col]

    def __call__(self, time, flux, err, band, *, band_to_calc: str, **kwargs) -> pd.Series:
        if band_to_calc is not None:
            mask = band == band_to_calc
            time, flux, err = (np.asarray(a)[mask] for a in (time, flux, err))

        if not kwargs.get("sorted", False):
            order = np.argsort(time)
            time, flux, err = (np.asarray(a)[order] for a in (time, flux, err))
            kwargs = dict(kwargs, sorted=True)

        dtype = np.result_type(*(np.asarray(a).dtype for a in (time, flux, err)))
        time, flux, err = (np.asarray(a, dtype=dtype) for a in (time, flux, err))

        values = self.feature(time, flux, err, **kwargs)
        return pd.Series(dict(zip(self.feature.names, values)))

"""Analysis kernels: pure-numpy per-lightcurve functions run inside
``groupBy().applyInPandas`` workers, plus the self-describing
:class:`AnalysisFunction` contract that lets ``Ensemble.batch`` plan them."""

from .base import AnalysisFunction
from .feature_extractor import (
    LIGHT_CURVE_AVAILABLE,
    FeatureExtractor,
    PyAmplitude,
    PyExtractor,
    PyMean,
    PyMedian,
    PyStandardDeviation,
    PythonFeatureEvaluator,
)
from .light_curve import LightCurve, StructureFunctionLightCurve
from .periodogram import LombScargle, calc_lomb_scargle, lomb_scargle_power
from .stetson import StetsonJ, calc_stetson_J
from .structurefunction2 import calc_sf2
from .structure_function import SF_METHODS, StructureFunctionArgumentContainer

__all__ = [
    "AnalysisFunction",
    "FeatureExtractor",
    "LIGHT_CURVE_AVAILABLE",
    "LightCurve",
    "PyAmplitude",
    "PyExtractor",
    "PyMean",
    "PyMedian",
    "PyStandardDeviation",
    "PythonFeatureEvaluator",
    "StructureFunctionLightCurve",
    "LombScargle",
    "calc_lomb_scargle",
    "lomb_scargle_power",
    "StetsonJ",
    "calc_stetson_J",
    "calc_sf2",
    "SF_METHODS",
    "StructureFunctionArgumentContainer",
]

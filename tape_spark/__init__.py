"""tape_spark — a PySpark-native time-series (light-curve) analytics engine.

Re-expresses the capabilities of lincc-frameworks/tape (the reference at
/root/reference, a Dask-based engine) on Spark DataFrames: an Object/Source
two-table data model with lazy consistency sync, a ``batch()`` grouped-apply
engine over ``groupBy().applyInPandas``, astronomy analysis kernels
(Stetson J, structure functions), plus large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

from .ensemble import Ensemble
from .readers import (
    available_datasets,
    read_dataset,
    read_ensemble,
    read_hipscat,
    read_pandas_dataframe,
    read_parquet,
    read_source_dict,
    read_spark_dataframe,
)
from .timeseries import TimeSeries
from .utils.column_mapper import ColumnMapper, PS1ColumnMapper, ZTFColumnMapper

__version__ = "0.2.0"

__all__ = [
    "Ensemble",
    "TimeSeries",
    "ColumnMapper",
    "ZTFColumnMapper",
    "PS1ColumnMapper",
    "read_ensemble",
    "read_parquet",
    "read_pandas_dataframe",
    "read_spark_dataframe",
    "read_source_dict",
    "read_hipscat",
    "read_dataset",
    "available_datasets",
]

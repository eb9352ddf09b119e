"""Module-level reader functions: thin wrappers constructing an
:class:`~tape_spark.ensemble.Ensemble` per source kind.

Parity target: ``/root/reference/src/tape/ensemble_readers.py:14-452``.
``read_dask_dataframe`` maps to :func:`read_spark_dataframe`; the LSDB
dependency of the reference's HiPSCat path is replaced by Spark's native
Hive-style partition discovery.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .ensemble import Ensemble
from .utils.column_mapper import ColumnMapper

__all__ = [
    "read_ensemble",
    "read_parquet",
    "read_pandas_dataframe",
    "read_spark_dataframe",
    "read_source_dict",
    "read_hipscat",
    "read_dataset",
    "available_datasets",
]


def read_ensemble(
    dirpath: str, additional_frames=True, spark: Optional[SparkSession] = None, **kwargs
) -> Ensemble:
    """Load a saved ensemble directory (``save_ensemble`` output).
    Parity: ``ensemble_readers.py:14-61``."""
    return Ensemble(spark).from_ensemble(dirpath, additional_frames=additional_frames, **kwargs)


def read_parquet(
    source_file: str,
    object_file: Optional[str] = None,
    column_mapper: Optional[ColumnMapper] = None,
    spark: Optional[SparkSession] = None,
    **kwargs,
) -> Ensemble:
    """Load source (and optional object) parquet into a new Ensemble.
    Parity: ``ensemble_readers.py:180-246``."""
    return Ensemble(spark).from_parquet(
        source_file, object_file=object_file, column_mapper=column_mapper, **kwargs
    )


def read_pandas_dataframe(
    source_frame: pd.DataFrame,
    object_frame: Optional[pd.DataFrame] = None,
    column_mapper: Optional[ColumnMapper] = None,
    spark: Optional[SparkSession] = None,
    **kwargs,
) -> Ensemble:
    """Ingest in-memory pandas frames. Parity: ``ensemble_readers.py:63-120``."""
    return Ensemble(spark).from_pandas(
        source_frame, object_frame=object_frame, column_mapper=column_mapper, **kwargs
    )


def read_spark_dataframe(
    source_frame: DataFrame,
    object_frame: Optional[DataFrame] = None,
    column_mapper: Optional[ColumnMapper] = None,
    spark: Optional[SparkSession] = None,
    **kwargs,
) -> Ensemble:
    """Ingest existing Spark DataFrames (the analog of the reference's
    ``read_dask_dataframe``, ``ensemble_readers.py:122-178``)."""
    return Ensemble(spark or source_frame.sparkSession).from_spark(
        source_frame, object_frame=object_frame, column_mapper=column_mapper, **kwargs
    )


def read_source_dict(
    source_dict: dict,
    column_mapper: Optional[ColumnMapper] = None,
    spark: Optional[SparkSession] = None,
    **kwargs,
) -> Ensemble:
    """Load a dict of columns. Parity: ``ensemble_readers.py:377-452``."""
    return Ensemble(spark).from_source_dict(source_dict, column_mapper=column_mapper, **kwargs)


def read_hipscat(
    source_path: str,
    object_path: Optional[str] = None,
    column_mapper: Optional[ColumnMapper] = None,
    spark: Optional[SparkSession] = None,
    **kwargs,
) -> Ensemble:
    """Load HiPSCat-style (``Norder=/Dir=/Npix=``) partitioned catalogs via
    Spark partition discovery. Parity: ``ensemble_readers.py:307-375``."""
    return Ensemble(spark).from_hipscat(
        source_path, object_path=object_path, column_mapper=column_mapper, **kwargs
    )


# ------------------------------------------------------------------ #
# curated dataset registry                                            #
# ------------------------------------------------------------------ #

# The reference fetches a JSON registry over HTTP
# (``ensemble.py:2008-2066``); in network-less deployments the registry can
# be pointed at a local JSON file via TAPE_SPARK_DATASET_REGISTRY.
DATASET_REGISTRY_ENV = "TAPE_SPARK_DATASET_REGISTRY"
DATASET_REGISTRY_URL = (
    "https://raw.githubusercontent.com/lincc-frameworks/tape_benchmarking/main/data/datasets.json"
)


def _load_registry() -> dict:
    import json
    import os
    import urllib.request

    local = os.environ.get(DATASET_REGISTRY_ENV)
    if local:
        with open(local) as fh:
            return json.load(fh)
    with urllib.request.urlopen(DATASET_REGISTRY_URL, timeout=30) as resp:
        return json.loads(resp.read().decode())


def available_datasets() -> dict:
    """Names + descriptions of curated datasets (reference
    ``ensemble.py:2036-2066``). Requires network access or a local registry
    file via ``TAPE_SPARK_DATASET_REGISTRY``."""
    return {
        name: entry.get("description", "") for name, entry in _load_registry().items()
    }


def read_dataset(dataset: str, spark: Optional[SparkSession] = None, **kwargs) -> Ensemble:
    """Load a curated dataset by registry name (reference
    ``ensemble.py:2008-2034``): the registry entry supplies parquet paths
    and the column map."""
    entry = _load_registry()[dataset]
    cm = ColumnMapper(**entry["column_map"])
    return read_parquet(
        source_file=entry["source_file"],
        object_file=entry.get("object_file"),
        column_mapper=cm,
        spark=spark,
        **kwargs,
    )

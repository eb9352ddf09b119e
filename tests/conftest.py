"""Shared fixtures: one local SparkSession per test session, the
reference-style deterministic ramp dataset, and the golden parquet
ensembles (reference fixtures: ``tests/tape_tests/conftest.py:17-31``
ramp dict, ``:137-148`` golden parquet loaders)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tape_spark import ColumnMapper, Ensemble

REF_SOURCE = "/root/reference/tests/tape_tests/data/source/test_source.parquet"
REF_OBJECT = "/root/reference/tests/tape_tests/data/object/test_object.parquet"
TESTDATA = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture
def ramp_rows() -> dict:
    """Deterministic synthetic source: 1000 rows, 5 objects (8000-8004),
    4 bands, ramp flux/err — mirrors the reference's create_test_rows."""
    num_points = 1000
    all_bands = np.array(["r", "g", "b", "i"])
    return {
        "id": 8000 + (np.arange(num_points) % 5),
        "time": np.arange(num_points, dtype=float),
        "flux": (np.arange(num_points) % len(all_bands)).astype(float),
        "band": np.repeat(all_bands, num_points // len(all_bands)),
        "err": 0.1 * (np.arange(num_points) % 10),
        "count": np.arange(num_points),
    }


@pytest.fixture
def ramp_cm() -> ColumnMapper:
    return ColumnMapper(id_col="id", time_col="time", flux_col="flux", err_col="err", band_col="band")


@pytest.fixture
def ramp_ensemble(spark, ramp_rows, ramp_cm) -> Ensemble:
    return Ensemble(spark).from_source_dict(ramp_rows, column_mapper=ramp_cm, npartitions=4)


@pytest.fixture
def ramp_ensemble_with_object(spark, ramp_rows, ramp_cm) -> Ensemble:
    obj = pd.DataFrame({"id": 8000 + np.arange(5), "name": [str(8000 + i) for i in range(5)]})
    return Ensemble(spark).from_pandas(
        pd.DataFrame(ramp_rows), object_frame=obj, column_mapper=ramp_cm, npartitions=4
    )


@pytest.fixture
def golden_cm() -> ColumnMapper:
    return ColumnMapper(
        id_col="ps1_objid",
        time_col="midPointTai",
        flux_col="psFlux",
        err_col="psFluxErr",
        band_col="filterName",
    )


@pytest.fixture
def golden_ensemble(spark, golden_cm) -> Ensemble:
    """The reference's 2000-row golden parquet (index materialized as a
    column, as Spark has no index concept)."""
    if not os.path.exists(REF_SOURCE):
        pytest.skip("reference golden parquet not available")
    src = pd.read_parquet(REF_SOURCE).reset_index()
    obj = pd.read_parquet(REF_OBJECT).reset_index()
    return Ensemble(spark).from_pandas(src, object_frame=obj, column_mapper=golden_cm, npartitions=4)

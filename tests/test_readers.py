"""Module-level reader wrappers (reference: ``ensemble_readers.py``) and
the gated FeatureExtractor."""

import json

import numpy as np
import pandas as pd
import pytest

import tape_spark
from tape_spark import (
    ColumnMapper,
    read_ensemble,
    read_pandas_dataframe,
    read_parquet,
    read_source_dict,
    read_spark_dataframe,
)
from tape_spark.analysis.feature_extractor import LIGHT_CURVE_AVAILABLE, FeatureExtractor


def test_read_source_dict(spark, ramp_rows, ramp_cm):
    ens = read_source_dict(ramp_rows, column_mapper=ramp_cm, spark=spark, npartitions=2)
    assert ens.object.count() == 5


def test_read_pandas_dataframe(spark, ramp_rows, ramp_cm):
    ens = read_pandas_dataframe(pd.DataFrame(ramp_rows), column_mapper=ramp_cm, spark=spark)
    assert ens.source.count() == 1000


def test_read_spark_dataframe(spark, ramp_rows, ramp_cm):
    df = spark.createDataFrame(pd.DataFrame(ramp_rows))
    ens = read_spark_dataframe(df, column_mapper=ramp_cm)
    assert ens.source.count() == 1000


def test_read_parquet_and_read_ensemble_roundtrip(spark, tmp_path):
    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="l_linenumber",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    ens = read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet", column_mapper=cm, spark=spark, npartitions=4
    )
    n = ens.source.count()
    root = ens.save_ensemble(str(tmp_path), "saved")
    ens2 = read_ensemble(root, spark=spark)
    assert ens2.source.count() == n


def test_read_hipscat_partition_discovery(spark, tmp_path, ramp_rows, ramp_cm):
    """Write a Norder=/Npix=-style layout and read it back with partition
    discovery providing the partition columns."""
    pdf = pd.DataFrame(ramp_rows)
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "cat")
    df.withColumn("Norder", (df.id % 2).cast("int")).write.partitionBy("Norder").parquet(path)
    ens = tape_spark.read_hipscat(path, column_mapper=ramp_cm, spark=spark)
    assert ens.source.count() == 1000
    assert "Norder" in ens.source.columns


def test_from_lsdb_uses_native_hipscat_path(spark, tmp_path, ramp_rows, ramp_cm):
    """An LSDB-shaped catalog that exposes its on-disk HiPSCat root must be
    read natively by Spark (no lsdb import, no driver compute())."""
    from types import SimpleNamespace

    from tape_spark import Ensemble

    pdf = pd.DataFrame(ramp_rows)
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "lsdb_cat")
    df.withColumn("Norder", (df.id % 2).cast("int")).write.partitionBy("Norder").parquet(path)

    class _FakeCatalog:
        hc_structure = SimpleNamespace(catalog_path=path)

        def compute(self):  # would require lsdb+dask; must never be called
            raise AssertionError("native path should not materialize via compute()")

    ens = Ensemble(spark).from_lsdb(_FakeCatalog(), column_mapper=ramp_cm, npartitions=2)
    assert ens.source.count() == 1000


def test_read_dataset_local_registry(spark, tmp_path, monkeypatch):
    registry = {
        "tiny_lineitem": {
            "description": "local test dataset",
            "source_file": "/root/testdata/sf0.001/lineitem.parquet",
            "column_map": {
                "id_col": "l_orderkey",
                "time_col": "l_linenumber",
                "flux_col": "l_extendedprice",
                "err_col": "l_quantity",
                "band_col": "l_returnflag",
            },
        }
    }
    reg_path = tmp_path / "registry.json"
    reg_path.write_text(json.dumps(registry))
    monkeypatch.setenv("TAPE_SPARK_DATASET_REGISTRY", str(reg_path))
    assert tape_spark.available_datasets() == {"tiny_lineitem": "local test dataset"}
    ens = tape_spark.read_dataset("tiny_lineitem", spark=spark, npartitions=4)
    assert ens.source.count() > 0


def test_feature_extractor_gated():
    if LIGHT_CURVE_AVAILABLE:
        pytest.skip("light-curve installed; gating not applicable")
    with pytest.raises(ImportError, match="light-curve"):
        FeatureExtractor(object())


def test_feature_extractor_python_fallback_batch(ramp_ensemble, ramp_rows):
    """The FeatureExtractor dispatch path (batch → per-curve __call__ →
    per-name columns) runs end-to-end on the pure-python evaluators, and
    the values match direct numpy per-curve computation."""
    import numpy as np

    from tape_spark.analysis import PyAmplitude, PyExtractor, PyMean

    feat = FeatureExtractor(PyExtractor(PyAmplitude(), PyMean()))
    res = (
        ramp_ensemble.batch(feat, band_to_calc="g")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(res.columns) == ["id", "amplitude", "mean"]

    flux = np.asarray(ramp_rows["flux"], dtype=float)
    ids = np.asarray(ramp_rows["id"])
    bands = np.asarray(ramp_rows["band"])
    for _, row in res.iterrows():
        m = flux[(ids == row["id"]) & (bands == "g")]
        assert row["amplitude"] == pytest.approx((m.max() - m.min()) / 2.0)
        assert row["mean"] == pytest.approx(m.mean())


def test_feature_extractor_empty_band_yields_nan(spark):
    """A curve with no observations in the requested band produces NaN
    features instead of crashing the pandas-UDF worker."""
    import numpy as np

    from tape_spark import ColumnMapper, Ensemble
    from tape_spark.analysis import PyAmplitude

    rows = {
        "id": [1, 1, 1, 2, 2, 2],
        "time": [0.0, 1.0, 2.0, 0.0, 1.0, 2.0],
        "flux": [1.0, 3.0, 2.0, 5.0, 6.0, 7.0],
        "err": [0.1] * 6,
        "band": ["g", "g", "g", "r", "r", "r"],  # curve 2 has no 'g'
    }
    cm = ColumnMapper(id_col="id", time_col="time", flux_col="flux", err_col="err", band_col="band")
    ens = Ensemble(spark).from_source_dict(rows, column_mapper=cm, npartitions=2)
    res = (
        ens.batch(FeatureExtractor(PyAmplitude()), band_to_calc="g")
        .toPandas()
        .set_index("id")["amplitude"]
    )
    assert res[1] == pytest.approx(1.0)
    assert np.isnan(res[2])


def test_feature_extractor_single_evaluator(ramp_ensemble):
    from tape_spark.analysis import PyMedian

    res = ramp_ensemble.batch(FeatureExtractor(PyMedian()), band_to_calc=None).toPandas()
    assert list(res.columns) == ["id", "median"]
    assert len(res) == 5


def test_from_lsdb_in_memory_spills_to_parquet(spark, ramp_rows, ramp_cm):
    """An in-memory catalog (no on-disk HiPSCat root) must ingest through
    the Dask-collection → temp-parquet spill, never via driver-side
    compute()."""
    from tape_spark import Ensemble

    pdf = pd.DataFrame(ramp_rows)

    class _FakeDdf:
        """Dask-DataFrame-shaped: partition-wise parquet writer."""

        def __init__(self, frame):
            self._frame = frame

        def reset_index(self):
            return _FakeDdf(self._frame.reset_index(drop=True))

        def to_parquet(self, path, write_index=False):
            import os

            os.makedirs(path, exist_ok=True)
            half = len(self._frame) // 2
            self._frame.iloc[:half].to_parquet(os.path.join(path, "part.0.parquet"))
            self._frame.iloc[half:].to_parquet(os.path.join(path, "part.1.parquet"))

    class _FakeCatalog:
        _ddf = _FakeDdf(pdf)

        def compute(self):
            raise AssertionError("spill path should not materialize via compute()")

    ens = Ensemble(spark).from_lsdb(_FakeCatalog(), column_mapper=ramp_cm, npartitions=2)
    assert ens.source.count() == len(pdf)


def test_from_lsdb_compute_fallback_is_size_capped(spark, ramp_rows, ramp_cm, monkeypatch):
    """A catalog with no reachable Dask collection may compute() only below
    the driver-materialization cap; above it, from_lsdb must refuse."""
    import pytest

    from tape_spark import Ensemble

    pdf = pd.DataFrame(ramp_rows)

    class _FakeCatalog:
        def __len__(self):
            return len(pdf)

        def compute(self):
            return pdf.copy()

    ens = Ensemble(spark).from_lsdb(_FakeCatalog(), column_mapper=ramp_cm, npartitions=2)
    assert ens.source.count() == len(pdf)

    monkeypatch.setattr(Ensemble, "_LSDB_COMPUTE_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="capped"):
        Ensemble(spark).from_lsdb(_FakeCatalog(), column_mapper=ramp_cm, npartitions=2)

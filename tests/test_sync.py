"""Dirty/sync consistency-protocol tests (reference model:
``test_ensemble.py:1097-1283`` test_sync_tables / test_lazy_sync_tables /
test_temporary_cols, ``:1411-1544`` dropna/keep_empty)."""

import numpy as np
from pyspark.sql import functions as F

from tape_spark import Ensemble


def test_object_filter_drops_sources(ramp_ensemble):
    ens = ramp_ensemble
    ens.query("id >= 8002", table="object")
    assert ens._object_dirty
    src = ens.compute("source")
    assert set(src["id"].unique()) == {8002, 8003, 8004}
    assert not ens._object_dirty


def test_source_filter_drops_objects(ramp_ensemble):
    ens = ramp_ensemble
    ens.query("id == 8000", table="source")
    assert ens._source_dirty
    obj = ens.compute("object")
    assert list(obj["id"]) == [8000]


def test_keep_empty_objects(spark, ramp_rows, ramp_cm):
    ens = Ensemble(spark, keep_empty_objects=True).from_source_dict(
        ramp_rows, column_mapper=ramp_cm, npartitions=2
    )
    ens.query("id == 8000", table="source")
    assert ens.compute("object")["id"].nunique() == 5  # empties survive
    assert ens.compute("source")["id"].nunique() == 1


def test_lazy_sync_is_lazy(ramp_ensemble):
    ens = ramp_ensemble
    ens.query("id == 8000", table="source")
    # no read of the object table yet → still dirty
    assert ens._source_dirty
    _ = ens.frames["object"]  # raw dict access does NOT trigger sync
    assert ens._source_dirty
    _ = ens.object  # property read does
    assert not ens._source_dirty


def test_bidirectional_sync(ramp_ensemble):
    ens = ramp_ensemble
    ens.query("id >= 8001", table="object")
    ens.query("flux > 2", table="source")
    src = ens.compute("source")
    obj = ens.compute("object")
    assert set(src["id"].unique()) == set(obj["id"])
    assert (src["flux"] > 2).all()
    assert 8000 not in set(obj["id"])


def test_temporary_columns_dropped_at_sync(ramp_ensemble):
    ens = ramp_ensemble
    ens.calc_nobs(temporary=True)
    assert "nobs_total" in ens.frames["object"].columns
    ens.query("flux > 1", table="source")  # marks source dirty
    obj = ens.object  # sync drops the stale temporary column
    assert "nobs_total" not in obj.columns


def test_permanent_columns_survive_sync(ramp_ensemble):
    ens = ramp_ensemble
    ens.calc_nobs(temporary=False)
    ens.query("flux > 1", table="source")
    assert "nobs_total" in ens.object.columns


def test_assign_temporary_registry(ramp_ensemble):
    ens = ramp_ensemble
    ens.assign(table="source", temporary=True, tmp=F.lit(1))
    assert "tmp" in ens.frames["source"].columns
    ens.query("id >= 8001", table="object")
    assert "tmp" not in ens.source.columns


def test_prune_then_source_access(ramp_ensemble):
    """The canonical benchmark workflow (reference benchmarks.py:35-40)."""
    ens = ramp_ensemble
    ens.prune(threshold=200)  # every ramp object has exactly 200 rows
    assert ens.object.count() == 5
    ens2_rows = ens.source.count()
    assert ens2_rows == 1000

    ens.prune(threshold=201)
    assert ens.object.count() == 0
    assert ens.source.count() == 0


def test_update_frame_marks_dirty(ramp_ensemble):
    ens = ramp_ensemble
    filtered = ens.frames["object"].filter(F.col("id") == 8000)
    ens.update_frame(filtered, "object")
    assert ens._object_dirty
    assert ens.compute("source")["id"].nunique() == 1


def test_persist_synced_pins_and_preserves_results(spark, ramp_rows, ramp_cm):
    """persist_synced=True must not change any result, must actually pin
    the sync output, and must hand cache generations off two-deep."""
    ens = Ensemble(spark, persist_synced=True).from_source_dict(
        ramp_rows, column_mapper=ramp_cm, npartitions=4
    )
    base = Ensemble(spark).from_source_dict(
        ramp_rows, column_mapper=ramp_cm, npartitions=4
    )
    for e in (ens, base):
        e.query("id >= 8002", table="object")
    got = ens.compute("source")
    exp = base.compute("source")
    assert sorted(got["id"].unique()) == sorted(exp["id"].unique())
    # the synced source frame is pinned (gen 1 live, nothing retired yet)
    assert len(ens._auto_persisted) >= 1
    assert ens.frames["source"].storageLevel.useMemory
    gen1 = list(ens._auto_persisted)
    # second sync: generation handoff — gen1 retired (still cached), new pinned
    ens.query("id >= 8003", table="object")
    ens.source.count()
    assert ens._retired_persists == gen1
    assert all(df.storageLevel.useMemory for df in ens._retired_persists)
    gen2 = list(ens._auto_persisted)
    # third sync: gen1 evicted, gen2 retired
    ens.query("id >= 8004", table="object")
    ens.source.count()
    assert ens._retired_persists == gen2
    assert all(not df.storageLevel.useMemory for df in gen1)
    assert ens.compute("source")["id"].nunique() == 1
    # unpersist releases everything
    ens.unpersist()
    assert ens._auto_persisted == [] and ens._retired_persists == []
    assert not ens.frames["source"].storageLevel.useMemory


def test_persist_synced_off_by_default(ramp_ensemble):
    ens = ramp_ensemble
    ens.query("id >= 8002", table="object")
    ens.source.count()
    assert ens._auto_persisted == []
    assert not ens.frames["source"].storageLevel.useMemory


def test_unpersist_on_copy_leaves_original_pins(ramp_ensemble):
    """A _copy() shares DataFrame objects with its original; calling
    unpersist() on the copy must NOT evict frames the original pinned
    (ownership-scoped cache release — ADVICE r9)."""
    ens = ramp_ensemble
    ens.persist("source")
    ens.source.count()
    assert ens.frames["source"].storageLevel.useMemory
    twin = ens.sample(frac=0.5, method="hash")  # goes through _copy()
    twin.unpersist()
    # the original's explicit pin survives the copy's release
    assert ens.frames["source"].storageLevel.useMemory
    # and the original can still release its own pin
    ens.unpersist()
    assert not ens.frames["source"].storageLevel.useMemory
    assert ens._explicit_persists == []

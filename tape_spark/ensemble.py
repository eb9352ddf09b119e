"""The Ensemble session: a two-table (Object/Source) light-curve data model
on Spark DataFrames with lazy consistency sync and a grouped-apply engine.

Architecture (Spark-first, not a port):

- Frames are plain immutable ``pyspark.sql.DataFrame``s tracked in a dict;
  every op is declared through the DataFrame API so Catalyst handles
  pushdown, pruning, join strategy, and AQE does runtime re-planning.
- "Lightcurve cohesion" (all rows of one object co-located) is
  ``repartition(id_col)`` at ingest; at rest it should be bucketed parquet.
  ``groupBy(id).applyInPandas`` then reuses that partitioning.
- The dirty/sync protocol (the reference's one novel semantic) is session
  bookkeeping only: mutating ops mark a table dirty; the next read of the
  *other* table injects ``left_semi`` joins. No driver-side id collection.

Parity targets: ``/root/reference/src/tape/ensemble.py`` (session, ops,
batch at :1054-1237, sync at :2196-2292) and
``/root/reference/src/tape/ensemble_frame.py`` (frame ops). The Dask
partition-type dispatch machinery (~600 LoC) is intentionally absent —
Spark needs none of it.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analysis.base import AnalysisFunction
from .timeseries import TimeSeries
from .utils.column_mapper import ColumnMapper
from .utils.expr import translate_query_expr

SOURCE_FRAME_LABEL = "source"
OBJECT_FRAME_LABEL = "object"

# Reductions batch() recognizes and rewrites to built-in Catalyst
# aggregates (see the fast path in batch()): the numpy callable users pass
# per the reference's API, mapped to the JVM-side equivalent with
# identical semantics on clean data (NaN/NULL groups are forced to NaN to
# match what the callable would see through the pandas conversion).
# np.std/np.var default to ddof=0, hence the _pop variants; Spark's
# median is the exact interpolating median, same as np.median.
_BUILTIN_REDUCERS: Dict[Callable, Callable] = {
    np.mean: F.avg,
    np.sum: F.sum,
    np.min: F.min,
    np.max: F.max,
    np.median: F.median,
    np.std: F.stddev_pop,
    np.var: F.var_pop,
}
METADATA_FILENAME = "ensemble_metadata.json"


def _spark_type(t) -> T.DataType:
    """Translate a python/numpy/pandas type marker into a Spark DataType.

    Covers the shapes the reference's ``meta`` accepted
    (``ensemble.py:2477-2505``): python builtins, numpy dtypes, strings.
    ``dict`` maps to ``MapType(string, double)`` for per-band dict results.
    """
    if isinstance(t, T.DataType):
        return t
    if t is dict:
        return T.MapType(T.StringType(), T.DoubleType())
    if t is float:
        return T.DoubleType()
    if t is int:
        return T.LongType()
    if t is str or t is object:
        return T.StringType()
    if t is bool:
        return T.BooleanType()
    if isinstance(t, str):
        lowered = t.lower()
        ddl = {
            "float": T.DoubleType(), "float64": T.DoubleType(), "double": T.DoubleType(),
            "float32": T.FloatType(),
            "int": T.LongType(), "int64": T.LongType(), "long": T.LongType(),
            "int32": T.IntegerType(), "integer": T.IntegerType(),
            "str": T.StringType(), "string": T.StringType(), "object": T.StringType(),
            "bool": T.BooleanType(), "boolean": T.BooleanType(),
        }
        if lowered in ddl:
            return ddl[lowered]
        return T._parse_datatype_string(t)
    # numpy dtype-ish
    kind = np.dtype(t).kind
    if kind == "f":
        return T.DoubleType()
    if kind in ("i", "u"):
        return T.LongType()
    if kind == "b":
        return T.BooleanType()
    return T.StringType()


class Ensemble:
    """Session object holding named Spark frames + the column-role map.

    Parameters
    ----------
    spark : SparkSession, optional
        An existing session; when omitted the active (or a new local)
        session is used.
    keep_empty_objects : bool
        When False (default), syncing after a source filter also drops
        objects that lost all their sources.
    sync_broadcast : bool or "auto"
        Physical strategy for the dirty-sync semi-joins. "auto" (default)
        broadcasts the surviving-id build side whenever Catalyst's own
        size estimate for it is at most ``sync_broadcast_bytes`` (128 MB)
        — the default 10 MB ``autoBroadcastJoinThreshold`` is calibrated
        for *data* joins, while an id-only semi-join build side is worth
        shipping at 10x that before a sort-merge of the full source table
        wins. True forces the hint regardless of estimate — the cluster
        deployment setting, where the source-table sort the SMJ pays
        parallelizes worse than one survivor-id broadcast (single-host
        measurements at sf100 show the opposite ordering; see the
        re-measured A/B in ``docs/SCALING.md``). False never hints.
    persist_synced : bool
        When True, every ``_sync_tables`` pins the frames it rebuilt
        (``persist()``, default storage level) so a chain that syncs once
        and then runs several actions — the canonical
        ``prune → count → batch`` analysis session — pays the semi-join
        pass ONCE instead of replaying it inside every action's lineage
        (Spark recomputes non-persisted lineage per action; measured as
        tens of seconds of pure-JVM work at sf100, ``docs/SCALING.md``
        §"Where q9's time actually goes"). Cache lifecycle is
        two-generational: the frames pinned by sync N stay cached until
        sync N+2 — at sync N+1 the NEW frames' lineage still reads
        *through* generation N's cache, so the first action after N+1
        materializes the new cache cheaply from the old one; evicting N
        at N+1 would force one full recompute from the raw scan. Off by
        default: a one-shot query pays a materialization it never
        amortizes, and pinned frames hold executor memory/disk the user
        didn't ask for. ``unpersist()`` releases everything early.
    """

    def __init__(
        self,
        spark: Optional[SparkSession] = None,
        keep_empty_objects: bool = False,
        sync_broadcast: Union[bool, str] = "auto",
        sync_broadcast_bytes: int = 128 << 20,
        persist_synced: bool = False,
    ):
        self.spark = spark or SparkSession.builder.getOrCreate()
        self.frames: Dict[str, DataFrame] = {}
        self.keep_empty_objects = keep_empty_objects
        self.sync_broadcast = sync_broadcast
        self.sync_broadcast_bytes = sync_broadcast_bytes
        self.persist_synced = persist_synced
        # persist_synced cache lifecycle (two generations, see _sync_tables)
        self._auto_persisted: List[DataFrame] = []
        self._retired_persists: List[DataFrame] = []
        # frames THIS instance pinned via explicit persist(); unpersist()
        # releases only these (plus the auto generations above), never
        # self.frames directly — a _copy() shares frame objects with its
        # original, and evicting shared frames from the copy would pull
        # caches out from under the original
        self._explicit_persists: List[DataFrame] = []

        # Lightcurve cohesion: true when every object's rows are known to be
        # co-located in one source partition (established at ingest by
        # repartition(id); invalidated by unions/rebinning). Gates the
        # batch() mapInPandas fast path.
        self._source_cohesive = False

        # Object-table provenance, for two plan-slimming fast paths
        # (measured r16: together ~0.1-0.3 s/action off the canonical
        # prune->batch workflow at sf0.1; the saved operators are
        # per-action hash aggregates + a join, data-proportional at scale):
        # - _pristine_object: identity of the auto-derived
        #   ``select(id).distinct()`` object frame. While frames["object"]
        #   IS this exact object, calc_nobs may replace it with
        #   ``groupBy(id).count()`` outright (same rows by construction)
        #   instead of distinct + left-join + fill. ANY reassignment of
        #   frames["object"] breaks the identity, so the fallback is
        #   automatic and conservative.
        # - _object_unique_ids: object rows are known unique per id
        #   (derived via distinct/groupBy(id); preserved by filters,
        #   column attaches keyed by id, semi-join syncs). Lets
        #   _sync_tables skip the defensive ``.distinct()`` on the sync
        #   build side — a left_semi join is insensitive to build-side
        #   duplicates, so this is a pure operator saving; the distinct
        #   stays for user-supplied object tables, where it may shrink
        #   the broadcast.
        self._pristine_object: Optional[DataFrame] = None
        self._object_unique_ids = False

        self._source_dirty = False
        self._object_dirty = False
        self._source_temp: List[str] = []
        self._object_temp: List[str] = []
        self._frame_counter = 0

        self.column_mapper: Optional[ColumnMapper] = None
        self._id_col: Optional[str] = None
        self._time_col: Optional[str] = None
        self._flux_col: Optional[str] = None
        self._err_col: Optional[str] = None
        self._band_col: Optional[str] = None

    # ------------------------------------------------------------------ #
    # frame tracking                                                     #
    # ------------------------------------------------------------------ #

    @property
    def source(self) -> DataFrame:
        """The source (per-observation) frame, synced if stale."""
        self._lazy_sync_tables(SOURCE_FRAME_LABEL)
        return self.frames[SOURCE_FRAME_LABEL]

    @property
    def object(self) -> DataFrame:
        """The object (per-lightcurve) frame, synced if stale."""
        self._lazy_sync_tables(OBJECT_FRAME_LABEL)
        return self.frames[OBJECT_FRAME_LABEL]

    def _generate_label(self) -> str:
        self._frame_counter += 1
        return f"result_{self._frame_counter}"

    def add_frame(self, frame: DataFrame, label: Optional[str] = None) -> str:
        """Track a result frame under ``label`` (auto-generated if omitted)."""
        label = label or self._generate_label()
        if label in self.frames:
            raise ValueError(f"Frame label '{label}' already exists; use update_frame")
        self.frames[label] = frame
        return label

    def update_frame(self, frame: DataFrame, label: str) -> str:
        """Replace (or create) the frame tracked under ``label``."""
        self.frames[label] = frame
        if label == SOURCE_FRAME_LABEL:
            self._source_dirty = True
            self._source_cohesive = False  # arbitrary replacement — unknown layout
        elif label == OBJECT_FRAME_LABEL:
            self._object_dirty = True
            self._object_unique_ids = False  # arbitrary replacement — unknown keys
        return label

    def drop_frame(self, label: str):
        """Stop tracking ``label`` (the two core frames cannot be dropped)."""
        if label in (SOURCE_FRAME_LABEL, OBJECT_FRAME_LABEL):
            raise ValueError(f"Cannot drop the core '{label}' frame")
        del self.frames[label]

    def select_frame(self, label: str) -> DataFrame:
        """Fetch a tracked frame by label."""
        if label not in self.frames:
            raise KeyError(f"Unknown frame label '{label}'; known: {sorted(self.frames)}")
        return self.frames[label]

    def frame_info(self) -> pd.DataFrame:
        """Summary table of tracked frames (label, columns)."""
        rows = [{"label": k, "columns": ", ".join(v.columns)} for k, v in self.frames.items()]
        return pd.DataFrame(rows)

    # ------------------------------------------------------------------ #
    # ingestion                                                          #
    # ------------------------------------------------------------------ #

    def _load_column_mapper(self, column_mapper: ColumnMapper):
        ready, needed = column_mapper.is_ready(show_needed=True)
        if not ready:
            raise ValueError(f"ColumnMapper is missing critical columns: {needed}")
        self.column_mapper = column_mapper
        m = column_mapper.map
        self._id_col = m["id_col"]
        self._time_col = m["time_col"]
        self._flux_col = m["flux_col"]
        self._err_col = m["err_col"]
        self._band_col = m["band_col"]

    def from_spark(
        self,
        source_frame: DataFrame,
        object_frame: Optional[DataFrame] = None,
        column_mapper: Optional[ColumnMapper] = None,
        sync_tables: bool = True,
        npartitions: Optional[int] = None,
        partition_by_id: bool = True,
        sort: bool = False,
    ) -> "Ensemble":
        """Core ingestion (analog of the reference's ``from_dask_dataframe``,
        ``ensemble.py:1586-1665``): establish lightcurve cohesion by
        repartitioning on the id column, optionally sort curves in-partition,
        and derive the object table when absent.

        At 100 TB the repartition is the one unavoidable shuffle; writing the
        result as id-bucketed parquet lets every later groupBy/join reuse it.
        """
        if column_mapper is not None:
            self._load_column_mapper(column_mapper)
        if self.column_mapper is None:
            raise ValueError("A ColumnMapper is required on first ingestion")

        df = source_frame
        if npartitions:
            df = df.repartition(npartitions, self._id_col)
        elif partition_by_id:
            df = df.repartition(self._id_col)
        if sort:
            df = df.sortWithinPartitions(self._id_col, self._band_col, self._time_col)
        self._source_cohesive = bool(npartitions or partition_by_id)
        self.frames[SOURCE_FRAME_LABEL] = df

        if object_frame is None:
            self.frames[OBJECT_FRAME_LABEL] = df.select(self._id_col).distinct()
            self._pristine_object = self.frames[OBJECT_FRAME_LABEL]
            self._object_unique_ids = True
            self._source_dirty = False
            self._object_dirty = False
        else:
            self.frames[OBJECT_FRAME_LABEL] = object_frame
            self._pristine_object = None
            self._object_unique_ids = False
            if sync_tables:
                self._source_dirty = True
                self._object_dirty = True
                self._sync_tables()
        return self

    def from_parquet(
        self,
        source_file: str,
        object_file: Optional[str] = None,
        column_mapper: Optional[ColumnMapper] = None,
        additional_cols: bool = True,
        npartitions: Optional[int] = None,
        sort: bool = False,
        **kwargs,
    ) -> "Ensemble":
        """Load source (and optional object) parquet.

        ``additional_cols=False`` restricts the scan to the five critical
        columns — Catalyst prunes the parquet read schema accordingly.
        Parity: ``ensemble.py:1920-2006``.
        """
        if column_mapper is not None:
            self._load_column_mapper(column_mapper)
        if self.column_mapper is None:
            raise ValueError("A ColumnMapper is required on first ingestion")
        src = self.spark.read.parquet(source_file)
        if not additional_cols:
            critical = [self._id_col, self._time_col, self._flux_col, self._err_col, self._band_col]
            src = src.select(*critical)
        obj = self.spark.read.parquet(object_file) if object_file else None
        return self.from_spark(src, object_frame=obj, npartitions=npartitions, sort=sort, **kwargs)

    def from_pandas(
        self,
        source_frame: pd.DataFrame,
        object_frame: Optional[pd.DataFrame] = None,
        column_mapper: Optional[ColumnMapper] = None,
        **kwargs,
    ) -> "Ensemble":
        """Ingest in-memory pandas frames (parity: ``ensemble.py:1535-1584``)."""
        src = self.spark.createDataFrame(source_frame)
        obj = self.spark.createDataFrame(object_frame) if object_frame is not None else None
        return self.from_spark(src, object_frame=obj, column_mapper=column_mapper, **kwargs)

    def from_source_dict(
        self, source_dict: dict, column_mapper: Optional[ColumnMapper] = None, **kwargs
    ) -> "Ensemble":
        """Ingest a dict of equal-length columns (parity: ``ensemble.py:2068-2108``)."""
        return self.from_pandas(pd.DataFrame(source_dict), column_mapper=column_mapper, **kwargs)

    def from_hipscat(
        self,
        source_path: str,
        object_path: Optional[str] = None,
        column_mapper: Optional[ColumnMapper] = None,
        **kwargs,
    ) -> "Ensemble":
        """Load HiPSCat-style spatially partitioned catalogs.

        The on-disk layout is Hive-like (``Norder=/Dir=/Npix=`` directories of
        parquet); Spark's partition discovery reads it natively, and partition
        pruning applies to any filter on the partition columns.
        Parity: ``ensemble.py:1760-1842`` (without the LSDB dependency).
        """
        if column_mapper is not None:
            self._load_column_mapper(column_mapper)
        if self.column_mapper is None:
            raise ValueError("A ColumnMapper is required on first ingestion")
        src = self.spark.read.option("basePath", source_path).parquet(source_path)
        obj = (
            self.spark.read.option("basePath", object_path).parquet(object_path)
            if object_path
            else None
        )
        return self.from_spark(src, object_frame=obj, **kwargs)

    def save_bucketed(
        self,
        source_table: str,
        object_table: Optional[str] = None,
        num_buckets: int = 32,
        mode: str = "overwrite",
    ) -> "Ensemble":
        """Write the source as an id-bucketed, id/band/time-sorted metastore
        table — the at-rest storage contract for 100 TB deployments
        (docs/SCALING.md). A bucketed scan satisfies Catalyst's id-hash
        distribution requirement, so ``groupBy(id)`` aggregations, the sync
        semi-joins, and ``batch()`` run with no exchange at all.
        """
        self._lazy_sync_tables("all")
        (
            self.frames[SOURCE_FRAME_LABEL]
            .write.mode(mode)
            .format("parquet")
            .bucketBy(num_buckets, self._id_col)
            .sortBy(self._id_col, self._band_col, self._time_col)
            .saveAsTable(source_table)
        )
        if object_table:
            (
                self.frames[OBJECT_FRAME_LABEL]
                .write.mode(mode)
                .format("parquet")
                .bucketBy(num_buckets, self._id_col)
                .sortBy(self._id_col)
                .saveAsTable(object_table)
            )
        return self

    def from_table(
        self,
        source_table: str,
        object_table: Optional[str] = None,
        column_mapper: Optional[ColumnMapper] = None,
    ) -> "Ensemble":
        """Load from metastore tables written by :meth:`save_bucketed`.

        No repartition is issued: a bucketed table's scan already reports
        id-hash partitioning (one bucket per task, files unsplit), so
        cohesion holds and every downstream id-keyed plan elides its
        shuffle.
        """
        if column_mapper is not None:
            self._load_column_mapper(column_mapper)
        if self.column_mapper is None:
            raise ValueError("A ColumnMapper is required on first ingestion")
        # The cohesion contract REQUIRES the bucketed scan: with
        # autoBucketedScan enabled (default since Spark 3.1) a plan with no
        # bucketing-aware operator (e.g. batch()'s mapInPandas fast path)
        # silently falls back to split file scans, and a bucket file larger
        # than maxPartitionBytes would straddle tasks — duplicate partial
        # per-object results. Pin the scan to one-bucket-per-task.
        self.spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        src = self.spark.table(source_table)
        self.frames[SOURCE_FRAME_LABEL] = src
        if object_table:
            self.frames[OBJECT_FRAME_LABEL] = self.spark.table(object_table)
            self._pristine_object = None
            self._object_unique_ids = False
        else:
            self.frames[OBJECT_FRAME_LABEL] = src.select(self._id_col).distinct()
            self._pristine_object = self.frames[OBJECT_FRAME_LABEL]
            self._object_unique_ids = True
        self._source_dirty = False
        self._object_dirty = False
        self._source_cohesive = True  # bucketed scan: one bucket per task
        return self

    def from_lsdb(
        self,
        source_catalog,
        object_catalog=None,
        column_mapper: Optional[ColumnMapper] = None,
        **kwargs,
    ) -> "Ensemble":
        """Ingest LSDB ``Catalog`` objects (parity: ``ensemble.py:1667-1758``).

        Scale path: when the catalog carries its on-disk HiPSCat location
        (``catalog.hc_structure.catalog_path`` / ``catalog_base_dir``),
        Spark reads the ``Norder=/Dir=/Npix=`` parquet layout directly via
        :meth:`from_hipscat` — partition discovery, no driver round-trip.
        Only catalogs without a usable path (in-memory/derived) fall back
        to materializing the Dask collection (``.compute()``) and
        re-distributing through Spark.
        """
        src_path = _lsdb_catalog_path(source_catalog)
        if src_path is not None:
            return self.from_hipscat(
                src_path,
                object_path=_lsdb_catalog_path(object_catalog),
                column_mapper=column_mapper,
                **kwargs,
            )
        # In-memory/derived catalog: spill the underlying Dask collection to
        # a temp parquet partition-by-partition (worker-side writes — the
        # driver never holds the table) and ingest through the native
        # parquet reader. Only a catalog exposing no Dask collection falls
        # back to compute() → createDataFrame, and that fallback refuses
        # tables above a size threshold rather than silently materializing
        # them on the driver.
        src_df = self._spill_lsdb_catalog(source_catalog, "source")
        obj_df = (
            self._spill_lsdb_catalog(object_catalog, "object")
            if object_catalog is not None
            else None
        )
        return self.from_spark(
            src_df, object_frame=obj_df, column_mapper=column_mapper, **kwargs
        )

    # driver-side materialization guard for the no-Dask-collection fallback
    _LSDB_COMPUTE_MAX_ROWS = 1_000_000

    # temp parquet dirs written by _spill_lsdb_catalog, reaped at exit
    _lsdb_spill_dirs: List[str] = []

    @staticmethod
    def _reap_lsdb_spills() -> None:
        import shutil

        for d in Ensemble._lsdb_spill_dirs:
            shutil.rmtree(d, ignore_errors=True)
        Ensemble._lsdb_spill_dirs.clear()

    def _spill_lsdb_catalog(self, catalog, label: str) -> DataFrame:
        """Turn one in-memory LSDB catalog into a Spark DataFrame without a
        driver round-trip when possible.

        Preferred path: the catalog's Dask collection (``_ddf``) writes
        itself to a temp parquet directory — each Dask partition becomes a
        file, written where the partition lives — and Spark reads the
        directory back (distributed end to end). Fallback (no reachable
        Dask collection): ``compute()`` with a hard row cap, because an
        unbounded driver materialization is exactly the failure mode the
        spill exists to avoid. Reference behavior: ``ensemble.py:1667-1758``.

        Spark reads the spill lazily, so the directory can't be deleted
        eagerly; every spill dir is recorded in ``_lsdb_spill_dirs`` and
        reaped at interpreter exit (callers that outlive the process should
        persist via ``to_hipscat``/``save_ensemble`` instead of spilling).
        """
        import atexit
        import tempfile

        ddf = getattr(catalog, "_ddf", None)
        if ddf is not None and hasattr(ddf, "to_parquet"):
            spill_root = tempfile.mkdtemp(prefix="tape_spark_lsdb_")
            if not Ensemble._lsdb_spill_dirs:
                atexit.register(Ensemble._reap_lsdb_spills)
            Ensemble._lsdb_spill_dirs.append(spill_root)
            out_dir = os.path.join(spill_root, label)
            # reset_index first: Spark has no index concept, the reference
            # likewise surfaces the hipscat index as a column
            ddf.reset_index().to_parquet(out_dir, write_index=False)
            return self.spark.read.parquet(out_dir)
        n_rows = None
        try:
            n_rows = int(len(catalog))
        except Exception:
            pass
        if n_rows is not None and n_rows > self._LSDB_COMPUTE_MAX_ROWS:
            raise ValueError(
                f"in-memory catalog has {n_rows} rows; driver-side compute() "
                "is capped at "
                f"{self._LSDB_COMPUTE_MAX_ROWS} — persist the catalog "
                "(to_hipscat) and use from_hipscat, or expose a Dask "
                "collection for the parquet spill path"
            )
        return self.spark.createDataFrame(catalog.compute().reset_index())

    def insert_sources(
        self,
        obj_ids: list,
        bands: list,
        timestamps: list,
        fluxes: list,
        flux_errs: list,
        force_repartition: bool = False,
    ) -> "Ensemble":
        """Append observation rows to the source table
        (parity: ``ensemble.py:268-356``)."""
        rows = pd.DataFrame(
            {
                self._id_col: obj_ids,
                self._band_col: bands,
                self._time_col: timestamps,
                self._flux_col: fluxes,
                self._err_col: flux_errs,
            }
        )
        new_df = self.spark.createDataFrame(rows)
        src = self.frames[SOURCE_FRAME_LABEL]
        for col in src.columns:  # align schemas; absent extra columns → null
            if col not in new_df.columns:
                new_df = new_df.withColumn(col, F.lit(None).cast(src.schema[col].dataType))
        for field in src.schema.fields:
            new_df = new_df.withColumn(field.name, F.col(field.name).cast(field.dataType))
        merged = src.unionByName(new_df.select(*src.columns))
        if force_repartition:
            merged = merged.repartition(self._id_col)
        else:
            # appended rows live in their own partitions → an object's rows
            # may now straddle partitions
            self._source_cohesive = False
        self.frames[SOURCE_FRAME_LABEL] = merged
        self._source_dirty = True
        return self

    # ------------------------------------------------------------------ #
    # dirty/sync consistency protocol                                    #
    # ------------------------------------------------------------------ #

    def _mark_dirty(self, table: str):
        if table == SOURCE_FRAME_LABEL:
            self._source_dirty = True
        elif table == OBJECT_FRAME_LABEL:
            self._object_dirty = True

    def _lazy_sync_tables(self, table: str = "all"):
        """Inject pending semi-joins before reading a stale table.

        Reading source is stale when object was filtered (and vice versa).
        Parity: ``ensemble.py:2196-2233``.
        """
        if table == SOURCE_FRAME_LABEL and self._object_dirty:
            self._sync_tables()
        elif table == OBJECT_FRAME_LABEL and self._source_dirty:
            self._sync_tables()
        elif table == "all" and (self._source_dirty or self._object_dirty):
            self._sync_tables()

    def _sync_tables(self):
        """Re-establish referential consistency with ``left_semi`` joins.

        Both directions are Catalyst-native semi-joins on the id column —
        never a driver-side collected id list (the reference's slow path at
        ``ensemble.py:2254-2258`` is deliberately not reproduced). Temporary
        columns registered via ``assign(..., temporary=True)`` /
        ``calc_nobs`` are dropped.

        Physical strategy: the build side is an id-only projection, so it
        is broadcast-hinted per ``sync_broadcast`` — at scale the default
        10 MB ``autoBroadcastJoinThreshold`` silently flips this join to a
        sort-merge of the *entire* source table once the surviving-id set
        outgrows it (measured 68x regression sf10→sf100 on the canonical
        prune workflow; full A/B in ``docs/SCALING.md``). The "auto" gate
        reads Catalyst's own size estimate so an id set the driver could
        not hold is never hinted; note AQE cannot rescue this join at
        runtime — the id-partitioned layout leaves it no adjacent
        exchanges to re-plan from.
        """
        id_col = self._id_col
        src = self.frames[SOURCE_FRAME_LABEL]
        obj = self.frames[OBJECT_FRAME_LABEL]

        # Temporary columns live only until the next sync, on both tables
        # (they may be stale once either side has been filtered).
        if self._object_temp:
            obj = obj.select(*[c for c in obj.columns if c not in self._object_temp])
            self._object_temp = []
        if self._source_temp:
            src = src.select(*[c for c in src.columns if c not in self._source_temp])
            self._source_temp = []

        src_rebuilt = self._object_dirty
        if self._object_dirty:
            # The defensive distinct() on the build side only matters when
            # object rows might repeat an id (it shrinks the broadcast); a
            # left_semi join is insensitive to build-side duplicates, so
            # when the object table is known unique per id (derived via
            # distinct/groupBy(id), preserved by filters/attaches/syncs)
            # the distinct is a pure per-action hash-aggregate tax — skip.
            ids = obj.select(id_col)
            if not self._object_unique_ids:
                ids = ids.distinct()
            src = src.join(
                self._sync_build_side(ids),
                on=id_col,
                how="left_semi",
            )

        obj_rebuilt = self._source_dirty and not self.keep_empty_objects
        if obj_rebuilt:
            obj = obj.join(
                self._sync_build_side(src.select(id_col).distinct()),
                on=id_col,
                how="left_semi",
            )

        if self.persist_synced and (src_rebuilt or obj_rebuilt):
            # Two-generation cache handoff (see __init__ docs): evict
            # generation N-1, retire generation N, pin generation N+1.
            # The new frames' lineage reads through generation N's cache,
            # so the first action after this sync fills the new cache
            # from the old one, not from the raw scan.
            for old in self._retired_persists:
                old.unpersist(blocking=False)
            self._retired_persists = self._auto_persisted
            self._auto_persisted = []
            if src_rebuilt:
                src = src.persist()
                self._auto_persisted.append(src)
            if obj_rebuilt:
                obj = obj.persist()
                self._auto_persisted.append(obj)

        self.frames[SOURCE_FRAME_LABEL] = src
        self.frames[OBJECT_FRAME_LABEL] = obj
        self._source_dirty = False
        self._object_dirty = False

    def _sync_build_side(self, ids: DataFrame) -> DataFrame:
        """Broadcast-hint a sync build side per the ``sync_broadcast``
        policy (see ``__init__``). "auto" consults Catalyst's optimized
        size estimate — the same statistic ``autoBroadcastJoinThreshold``
        compares against, so the gate flips exactly where raising that
        threshold would, without mutating session config."""
        if self.sync_broadcast is True:
            return F.broadcast(ids)
        if self.sync_broadcast == "auto":
            est = self._estimated_bytes(ids)
            if est is not None and est <= self.sync_broadcast_bytes:
                return F.broadcast(ids)
        return ids

    @staticmethod
    def _estimated_bytes(df: DataFrame) -> Optional[int]:
        """Catalyst's sizeInBytes estimate for ``df``'s optimized plan;
        None when the private plan API is unavailable (e.g. Connect)."""
        try:
            return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        except Exception:
            return None

    # ------------------------------------------------------------------ #
    # projections / filters / column ops                                 #
    # ------------------------------------------------------------------ #

    def _table_df(self, table: str) -> DataFrame:
        if table not in self.frames:
            raise KeyError(f"Unknown table '{table}'")
        self._lazy_sync_tables(table)
        return self.frames[table]

    def select(self, columns: List[str], table: str = SOURCE_FRAME_LABEL) -> "Ensemble":
        """Keep only ``columns`` (the id column is always retained).
        Parity: ``ensemble.py:641-661``."""
        df = self._table_df(table)
        keep = [self._id_col] + [c for c in columns if c != self._id_col]
        self.frames[table] = df.select(*keep)
        return self

    def query(self, expr: str, table: str = SOURCE_FRAME_LABEL) -> "Ensemble":
        """Row filter with a pandas-query-style expression; marks the table
        dirty. Parity: ``ensemble.py:663-694``."""
        df = self._table_df(table)
        self.frames[table] = df.filter(translate_query_expr(expr))
        self._mark_dirty(table)
        return self

    def filter_from_series(self, keep_condition: Column, table: str = SOURCE_FRAME_LABEL) -> "Ensemble":
        """Filter by a boolean Column expression
        (parity: ``ensemble.py:696-715`` — the aligned-series contract maps
        onto a Column in Spark's immutable model)."""
        df = self._table_df(table)
        self.frames[table] = df.filter(keep_condition)
        self._mark_dirty(table)
        return self

    def dropna(
        self,
        table: str = SOURCE_FRAME_LABEL,
        how: str = "any",
        thresh: Optional[int] = None,
        subset: Optional[List[str]] = None,
    ) -> "Ensemble":
        """Drop rows with nulls/NaNs (parity: ``ensemble.py:614-639``)."""
        df = self._table_df(table)
        if thresh is not None:
            self.frames[table] = df.na.drop(thresh=thresh, subset=subset)
        else:
            self.frames[table] = df.na.drop(how=how, subset=subset)
        self._mark_dirty(table)
        return self

    def assign(self, table: str = SOURCE_FRAME_LABEL, temporary: bool = False, **columns) -> "Ensemble":
        """Add computed columns. Values may be Spark Columns, SQL strings, or
        callables ``df -> Column``. ``temporary`` columns are auto-dropped at
        the next sync. Parity: ``ensemble.py:717-771``."""
        df = self._table_df(table)
        for name, value in columns.items():
            if callable(value) and not isinstance(value, Column):
                value = value(df)
            if isinstance(value, str):
                value = F.expr(value)
            if not isinstance(value, Column):
                value = F.lit(value)
            df = df.withColumn(name, value)
            if temporary:
                registry = self._source_temp if table == SOURCE_FRAME_LABEL else self._object_temp
                registry.append(name)
        self.frames[table] = df
        return self

    def drop(self, columns: Union[str, List[str]], table: str = SOURCE_FRAME_LABEL) -> "Ensemble":
        """Drop columns (parity: ``ensemble_frame.py:470-507``)."""
        df = self._table_df(table)
        columns = [columns] if isinstance(columns, str) else columns
        self.frames[table] = df.drop(*columns)
        return self

    def coalesce(
        self,
        input_cols: List[str],
        output_col: str,
        table: str = SOURCE_FRAME_LABEL,
        drop_inputs: bool = False,
    ) -> "Ensemble":
        """First-non-null across ``input_cols`` → ``output_col``; built-in
        ``F.coalesce``. The reference's pandas ``combine_first`` treats NaN
        as missing, so float columns are NaN-masked before coalescing.
        Re-maps a critical column role when its source column is dropped.
        Parity: ``ensemble_frame.py:1136-1208``."""
        df = self._table_df(table)
        parts = []
        for c in input_cols:
            if isinstance(df.schema[c].dataType, (T.DoubleType, T.FloatType)):
                parts.append(F.when(~F.isnan(F.col(c)), F.col(c)))
            else:
                parts.append(F.col(c))
        df = df.withColumn(output_col, F.coalesce(*parts))
        if drop_inputs:
            for role, col in list(self.column_mapper.map.items()):
                if col in input_cols:
                    self.column_mapper.assign(**{role: output_col})
                    setattr(self, f"_{role}", output_col)
            df = df.drop(*[c for c in input_cols if c != output_col])
        self.frames[table] = df
        return self

    def merge(
        self,
        right: Union[DataFrame, str],
        on: Union[str, List[str], None] = None,
        how: str = "inner",
        table: str = SOURCE_FRAME_LABEL,
        broadcast_right: bool = False,
        label: Optional[str] = None,
    ) -> DataFrame:
        """Relational merge of a tracked table with another frame.

        ``right`` may be a DataFrame or a tracked frame label. Catalyst/AQE
        picks broadcast vs sort-merge automatically; ``broadcast_right``
        forces the hint for known-small dimensions.
        Parity: ``ensemble_frame.py:313-406`` (merge) / ``:408-468`` (join).
        """
        left = self._table_df(table)
        if isinstance(right, str):
            right = self.select_frame(right)
        if broadcast_right:
            right = F.broadcast(right)
        on = on or self._id_col
        result = left.join(right, on=on, how=how)
        self.add_frame(result, label or self._generate_label())
        return result

    def join(
        self,
        other: Union[DataFrame, str],
        how: str = "left",
        table: str = SOURCE_FRAME_LABEL,
        label: Optional[str] = None,
    ) -> DataFrame:
        """Index (id-column) join — thin wrapper over :meth:`merge`."""
        return self.merge(other, on=self._id_col, how=how, table=table, label=label)

    def sample(
        self,
        frac: float,
        replace: bool = False,
        random_state: Optional[int] = None,
        method: str = "random",
    ) -> "Ensemble":
        """Random sample of *objects*, propagated to sources via sync;
        returns a new Ensemble. Parity: ``ensemble.py:524-581``.

        ``method='random'`` (default) is the reference's seeded-RNG
        Bernoulli sample. ``method='hash'`` is a content-addressed
        deterministic sample: md5 of the object id mapped to [0, 1) and
        compared against ``frac`` — the same objects are kept across runs,
        engines, and cluster sizes (no RNG/partition dependence), which is
        what reproducible corpus subsampling needs at scale. Both are one
        narrow filter, no shuffle."""
        new_ens = self._copy()
        obj = new_ens.frames[OBJECT_FRAME_LABEL]
        if method == "hash":
            if replace:
                raise ValueError("method='hash' draws without replacement")
            # 52 md5 bits → [0, 1): 52 ≤ the double mantissa, so the
            # int→double conversion is exact (no rounding) and the SQL
            # replay is bit-identical on any engine
            from .utils.hashing import md5_unit

            sampled = obj.filter(md5_unit(F.col(self._id_col)) < frac)
        elif method == "random":
            sampled = obj.sample(withReplacement=replace, fraction=frac, seed=random_state)
        else:
            raise ValueError(f"unknown sample method: {method!r}")
        new_ens.frames[OBJECT_FRAME_LABEL] = sampled
        new_ens._object_dirty = True
        return new_ens

    def head(self, n: int = 5, table: str = SOURCE_FRAME_LABEL) -> pd.DataFrame:
        """First ``n`` rows as pandas (parity: ``ensemble.py:592-612``)."""
        return self._table_df(table).limit(n).toPandas()

    def tail(self, n: int = 5, table: str = SOURCE_FRAME_LABEL) -> pd.DataFrame:
        """Last ``n`` rows as pandas."""
        rows = self._table_df(table).tail(n)
        return pd.DataFrame([r.asDict() for r in rows])

    def persist(self, table: str = "all") -> "Ensemble":
        """Pin frames in executor memory (parity: ``ensemble.py:512-522``)."""
        labels = [SOURCE_FRAME_LABEL, OBJECT_FRAME_LABEL] if table == "all" else [table]
        for label in labels:
            pinned = self._table_df(label).persist()
            self.frames[label] = pinned
            self._explicit_persists.append(pinned)
        return self

    def unpersist(self, blocking: bool = False) -> "Ensemble":
        """Release every cache THIS instance pinned: explicit
        :meth:`persist` pins plus both ``persist_synced`` generations.
        Ownership-scoped on purpose — a :meth:`_copy` shares DataFrame
        objects with its original, so unpersisting ``self.frames``
        wholesale from a copy would evict caches the original still
        reads through. Safe to call repeatedly."""
        for df in self._explicit_persists + self._retired_persists + self._auto_persisted:
            df.unpersist(blocking=blocking)
        self._explicit_persists = []
        self._retired_persists = []
        self._auto_persisted = []
        return self

    def compute(self, table: str = SOURCE_FRAME_LABEL) -> pd.DataFrame:
        """Materialize a frame to pandas (sync included)."""
        return self._table_df(table).toPandas()

    def _copy(self) -> "Ensemble":
        new = Ensemble(
            self.spark,
            keep_empty_objects=self.keep_empty_objects,
            sync_broadcast=self.sync_broadcast,
            sync_broadcast_bytes=self.sync_broadcast_bytes,
            persist_synced=self.persist_synced,
        )
        new.frames = dict(self.frames)
        new._source_cohesive = self._source_cohesive
        new._pristine_object = self._pristine_object
        new._object_unique_ids = self._object_unique_ids
        # cache generations stay OWNED by self: a copy must not be able
        # to evict pins the original still reads through
        new._auto_persisted = []
        new._retired_persists = []
        new._explicit_persists = []
        new._source_dirty = self._source_dirty
        new._object_dirty = self._object_dirty
        new._source_temp = list(self._source_temp)
        new._object_temp = list(self._object_temp)
        new._frame_counter = self._frame_counter
        if self.column_mapper is not None:
            new._load_column_mapper(self.column_mapper)
        return new

    # ------------------------------------------------------------------ #
    # introspection / column-map utilities                               #
    # ------------------------------------------------------------------ #

    @property
    def columns(self) -> List[str]:
        """Source-table columns (parity: ``ensemble.py`` ``columns``)."""
        return self.frames[SOURCE_FRAME_LABEL].columns

    def info(self, verbose: bool = True) -> pd.DataFrame:
        """Per-frame summary: label, row count, column count (computes one
        count job per frame, like the reference's ``info``)."""
        rows = [
            {"label": k, "rows": v.count(), "columns": len(v.columns)}
            for k, v in self.frames.items()
        ]
        out = pd.DataFrame(rows)
        if verbose:
            print(out.to_string(index=False))
        return out

    def client_info(self) -> dict:
        """Execution-backend info (the Spark analog of the reference's Dask
        ``client_info``)."""
        sc = self.spark.sparkContext
        return {
            "spark_version": self.spark.version,
            "master": sc.master,
            "app_id": sc.applicationId,
            "default_parallelism": sc.defaultParallelism,
        }

    def make_column_map(self) -> ColumnMapper:
        """A copy of the current column-role mapping
        (parity: ``ensemble.py`` ``make_column_map``)."""
        return ColumnMapper(**self.column_mapper.map)

    def update_column_mapping(self, column_mapper: Optional[ColumnMapper] = None, **roles) -> "Ensemble":
        """Re-point column roles (parity: ``ensemble.py``
        ``update_column_mapping``)."""
        if column_mapper is None:
            column_mapper = self.make_column_map()
            column_mapper.assign(**roles)
        self._load_column_mapper(column_mapper)
        return self

    def select_random_timeseries(self, seed: Optional[int] = None) -> TimeSeries:
        """Materialize one randomly chosen object's light curve
        (parity: ``ensemble.py:2303-2340``)."""
        row = (
            self._table_df(OBJECT_FRAME_LABEL)
            .select(self._id_col)
            .orderBy(F.rand(seed))
            .limit(1)
            .first()
        )
        if row is None:
            raise ValueError("The object table is empty; no time series to select")
        return self.to_timeseries(row[0])

    def from_dataset(self, dataset: str, **kwargs) -> "Ensemble":
        """Load a curated dataset by registry name (delegates to
        :mod:`tape_spark.readers`; parity: ``ensemble.py:2008-2034``)."""
        from .readers import _load_registry

        entry = _load_registry()[dataset]
        return self.from_parquet(
            entry["source_file"],
            object_file=entry.get("object_file"),
            column_mapper=ColumnMapper(**entry["column_map"]),
            **kwargs,
        )

    @staticmethod
    def available_datasets() -> dict:
        """Names + descriptions of curated datasets
        (parity: ``ensemble.py:2036-2066``)."""
        from .readers import available_datasets as _ad

        return _ad()

    # ------------------------------------------------------------------ #
    # scalar transforms                                                  #
    # ------------------------------------------------------------------ #

    def convert_flux_to_mag(
        self,
        zero_point: Union[str, float],
        zp_form: str = "mag",
        out_col_name: Optional[str] = None,
        flux_col: Optional[str] = None,
        err_col: Optional[str] = None,
        table: str = SOURCE_FRAME_LABEL,
    ) -> "Ensemble":
        """Flux → magnitude with error propagation, as built-in column
        arithmetic (no UDF). Parity: ``ensemble.py:2110-2189``.

        ``zp_form='mag'``: mag = -2.5·log10(flux) + zp;
        ``zp_form='flux'``: mag = -2.5·log10(flux/zp).
        Error: (2.5/ln 10)·(err/flux).
        """
        flux_col = flux_col or self._flux_col
        err_col = err_col or self._err_col
        out_col_name = out_col_name or f"{flux_col}_mag"
        df = self._table_df(table)
        zp = F.col(zero_point) if isinstance(zero_point, str) else F.lit(float(zero_point))
        if zp_form in ("mag", "magnitude"):
            mag = -2.5 * F.log10(F.col(flux_col)) + zp
        elif zp_form == "flux":
            mag = -2.5 * F.log10(F.col(flux_col) / zp)
        else:
            raise ValueError(f"Unsupported zero-point form: {zp_form!r}")
        df = df.withColumn(out_col_name, mag)
        if err_col in df.columns:
            err_expr = (2.5 / float(np.log(10))) * (F.col(err_col) / F.col(flux_col))
            df = df.withColumn(f"{out_col_name}_err", err_expr)
        self.frames[table] = df
        return self

    # ------------------------------------------------------------------ #
    # aggregations                                                       #
    # ------------------------------------------------------------------ #

    def calc_nobs(
        self,
        by_band: bool = False,
        label: str = "nobs",
        temporary: bool = True,
        band_values: Optional[List[str]] = None,
    ) -> "Ensemble":
        """Observation counts per object, attached to the object table.

        Plain ``groupBy(id).count()`` (map-side partial aggregation — no
        custom fast path needed); the by-band variant is a pivot. Passing
        ``band_values`` avoids the extra distinct-values job at scale.
        Parity: ``ensemble.py:773-870``.
        """
        id_col, band_col = self._id_col, self._band_col
        src = self.frames[SOURCE_FRAME_LABEL]
        # Capture BEFORE _table_df's sync clears it: if the source was
        # filtered and keep_empty_objects left the (pristine) object table
        # un-rebuilt, the pristine shortcut below would drop the now-empty
        # objects that the left-join + fill(0) path keeps at count 0.
        source_was_dirty = self._source_dirty
        obj = self._table_df(OBJECT_FRAME_LABEL)
        added: List[str] = []
        if by_band:
            pivot = src.groupBy(id_col).pivot(band_col, band_values)
            counts = pivot.count().na.fill(0)
            band_cols = [c for c in counts.columns if c != id_col]
            renamed = counts.select(
                id_col, *[F.col(c).alias(f"{label}_{c}") for c in band_cols]
            )
            total = sum(F.col(f"{label}_{c}") for c in band_cols)
            counts = renamed.withColumn(f"{label}_total", total.cast("long"))
            added = [f"{label}_{c}" for c in band_cols] + [f"{label}_total"]
        else:
            counts = src.groupBy(id_col).agg(F.count(F.lit(1)).alias(f"{label}_total"))
            added = [f"{label}_total"]
        if obj is self._pristine_object and not source_was_dirty:
            # The object table is still the auto-derived
            # ``select(id).distinct()`` of this same source, AND the source
            # has not been filtered since (a dirty source with
            # keep_empty_objects=True keeps the pristine object while the
            # count keys shrink), so its id set EQUALS the count keys: the
            # counts frame IS the joined result (same rows, same columns,
            # same order; no id can be missing a count, so the na.fill is
            # vacuous). Skips one hash aggregate (the distinct) and one
            # join per downstream action — the canonical prune() path
            # always lands here.
            self.frames[OBJECT_FRAME_LABEL] = counts
            self._object_unique_ids = True  # grouped by id
        else:
            obj = obj.drop(*[c for c in added if c in obj.columns])
            self.frames[OBJECT_FRAME_LABEL] = obj.join(
                counts, on=id_col, how="left"
            ).na.fill(0, subset=added)
        if temporary:
            self._object_temp.extend(added)
        return self

    def prune(self, threshold: int = 50, col_name: Optional[str] = None) -> "Ensemble":
        """Drop objects with fewer than ``threshold`` observations; sources
        follow at the next sync. The canonical benchmark workflow
        (``/root/reference/benchmarks/benchmarks.py:35-40``).
        Parity: ``ensemble.py:872-904``.
        """
        col_name = col_name or "nobs_total"
        if col_name not in self.frames[OBJECT_FRAME_LABEL].columns:
            self.calc_nobs(by_band=False, label=col_name.replace("_total", ""), temporary=True)
        obj = self.frames[OBJECT_FRAME_LABEL]
        self.frames[OBJECT_FRAME_LABEL] = obj.filter(F.col(col_name) >= threshold)
        self._object_dirty = True
        return self

    def bin_sources(
        self,
        time_window: float = 1.0,
        offset: float = 0.0,
        custom_aggr: Optional[Dict[str, str]] = None,
        count_col: Optional[str] = None,
    ) -> "Ensemble":
        """Re-bin sources in time: group by (id, band, time-bucket) and
        aggregate time→mean, flux→mean, err→sqrt(Σerr²)/n.

        The reference needs a custom Dask ``Aggregation(chunk, agg,
        finalize)`` here (``ensemble.py:1015-1020``); in Spark the same
        partial+final split is what every built-in aggregate already does,
        so this is pure expressions — one shuffle, map-side combine.
        Parity: ``ensemble.py:956-1052``.
        """
        id_col, band_col = self._id_col, self._band_col
        t, fx, er = self._time_col, self._flux_col, self._err_col
        src = self._table_df(SOURCE_FRAME_LABEL)

        bucket = F.floor((F.col(t) + F.lit(offset)) / F.lit(time_window))
        agg_map = {
            t: F.mean(t).alias(t),
            fx: F.mean(fx).alias(fx),
            er: (F.sqrt(F.sum(F.pow(F.col(er), 2))) / F.count(F.lit(1))).alias(er),
        }
        if custom_aggr:  # user aggregates override/extend the defaults
            for col, how in custom_aggr.items():
                agg_map[col] = F.expr(f"{how}(`{col}`)").alias(col)
        aggs = list(agg_map.values())
        if count_col is not None:
            aggs.append(F.count(F.lit(1)).cast("long").alias(count_col))
        binned = src.groupBy(F.col(id_col), F.col(band_col), bucket.alias("__time_bucket")).agg(*aggs)
        self.frames[SOURCE_FRAME_LABEL] = binned.drop("__time_bucket")
        self._source_cohesive = False  # now hash-partitioned by (id, band, bucket)
        self._source_dirty = True
        return self

    def find_day_gap_offset(self) -> float:
        """Estimate the observatory's "noon" as a day-fraction offset: the
        midpoint of the longest run of hours-of-day with zero observations.
        Distributed histogram + 24-element driver scan.
        Parity: ``ensemble.py:906-954``.
        """
        t = self._time_col
        src = self._table_df(SOURCE_FRAME_LABEL)
        hours_df = (
            src.select((F.floor(F.col(t) * 24) % 24).cast("int").alias("hour"))
            .groupBy("hour")
            .count()
            .collect()
        )
        occupied = {row["hour"] for row in hours_df}
        best_len, best_mid = 0, -1.0
        start = 0
        while start < 24:
            end = start
            while end < 48 and (end % 24) not in occupied:
                end += 1
            if end - start > best_len:
                best_len = end - start
                best_mid = (start + end) / 2.0
            start = end + 1
        if best_len == 0:
            return -1.0
        return (best_mid % 24.0) / 24.0

    def find_periods(
        self,
        min_period: float = 0.5,
        max_period: Optional[float] = None,
        n_freq: int = 2048,
        label: str = "best_period",
        band_to_calc: Optional[str] = None,
    ) -> "Ensemble":
        """Run a Lomb–Scargle period search over every light curve and
        attach ``label`` (the best period) and ``label + '_power'`` to
        the OBJECT table — the find-period half of the find-period → fold
        workflow; chain :meth:`fold_lightcurves`\\ ``(period_col=label)``
        to complete it:

            ens.find_periods(1.0, 50.0).fold_lightcurves(period_col="best_period")

        One ``batch()`` pass (the per-curve scan runs inside the Arrow
        kernel, grid work never leaves the executor) plus an id-equi-join
        onto the object table — under lightcurve cohesion both sides
        share the id-hash layout, so the join plans without a new
        exchange. Beyond-reference convenience: the reference delegates
        period finding to the optional Rust ``light-curve`` wheel and
        leaves the fold to the caller.
        """
        from .analysis.periodogram import calc_lomb_scargle

        fn = calc_lomb_scargle(min_period, max_period, n_freq)
        kwargs = {}
        if band_to_calc is not None:
            kwargs["band_to_calc"] = band_to_calc
        result = self.batch(fn, **kwargs)
        renamed = result.select(
            self._id_col,
            F.col("best_period").alias(label),
            F.col("best_power").alias(label + "_power"),
        )
        obj = self._table_df(OBJECT_FRAME_LABEL)
        # re-running the search with the same label must REPLACE the old
        # columns, not stack ambiguous duplicates (drop is a no-op when
        # the columns don't exist yet)
        obj = obj.drop(label, label + "_power")
        self.frames[OBJECT_FRAME_LABEL] = obj.join(renamed, self._id_col, "left")
        return self

    def fold_lightcurves(
        self,
        period: Optional[float] = None,
        t0: float = 0.0,
        period_col: Optional[str] = None,
        label: str = "phase",
    ) -> "Ensemble":
        """Phase-fold every light curve: ``phase = frac((t - t0) / P)`` in
        [0, 1), appended to the source table as ``label``.

        ``period`` applies one global period; ``period_col`` instead
        names an object-table column of per-object periods (e.g. from a
        period search), joined onto the source by id — under lightcurve
        cohesion both tables share the id-hash layout, so the join plans
        without a new exchange. Non-positive or NULL periods fold to
        NULL. Beyond-reference convenience: the reference folds inside
        per-object Python after materialization; this stays one codegen
        projection.
        """
        if (period is None) == (period_col is None):
            raise ValueError("pass exactly one of period / period_col")
        src = self._table_df(SOURCE_FRAME_LABEL)
        joined_col = None
        if period_col is not None:
            obj = self._table_df(OBJECT_FRAME_LABEL)
            if period_col not in obj.columns:
                raise ValueError(f"object table has no column {period_col!r}")
            if period_col in src.columns:
                joined_col = f"__{period_col}_fold"
                obj_side = obj.select(
                    self._id_col, F.col(period_col).alias(joined_col)
                )
            else:
                joined_col = period_col
                obj_side = obj.select(self._id_col, period_col)
            src = src.join(obj_side, self._id_col, "left")
            p = F.col(joined_col).cast("double")
        else:
            if period <= 0:
                raise ValueError("period must be positive")
            p = F.lit(float(period))
        frac = (F.col(self._time_col) - F.lit(float(t0))) / p
        # Spark's % keeps the dividend's sign; fold t < t0 into [0, 1)
        phase = F.when(p > 0, ((frac % 1.0) + 1.0) % 1.0)
        src = src.withColumn(label, phase)
        if joined_col is not None:
            src = src.drop(joined_col)
        self.frames[SOURCE_FRAME_LABEL] = src
        return self

    def align_bands(
        self,
        band_a: str,
        band_b: str,
        direction: str = "nearest",
        tolerance: Optional[float] = None,
        suffix: str = "_b",
    ) -> DataFrame:
        """Pair every ``band_a`` observation with its temporally nearest
        ``band_b`` observation of the SAME object — an as-of join per
        light curve, the classic color-curve construction (``flux -
        flux_b`` per epoch gives e.g. a g−r color curve).

        Returns ``(id, t, flux, err, t<suffix>, flux<suffix>,
        err<suffix>, dt)`` with ``dt = t<suffix> - t``; the matched
        columns are NULL when no ``band_b`` observation qualifies under
        ``direction``/``tolerance`` (see
        :func:`tape_spark.operators.joins.asof_join` — ``nearest`` is the
        default here because colors care about |Δt|, not causality).

        Beyond-reference: the reference computes multi-band quantities
        only inside per-object Python kernels after full materialization
        (e.g. ``ensemble.py:1130-1170``'s band loops); this stays a
        declarative plan whose one exchange is the id-hash shuffle of the
        two band slices.
        """
        from .operators.joins import asof_join

        id_col, t_col = self._id_col, self._time_col
        flux, err = self._flux_col, self._err_col
        src = self.source
        a = src.filter(F.col(self._band_col) == band_a).select(
            id_col, t_col, flux, err
        )
        b = src.filter(F.col(self._band_col) == band_b).select(
            id_col, t_col, flux, err
        )
        out = asof_join(
            a, b, on=t_col, by=id_col, direction=direction,
            tolerance=tolerance, suffix=suffix,
        )
        return out.withColumn("dt", F.col(t_col + suffix) - F.col(t_col))

    def resample_lightcurves(
        self,
        step: float,
        band: Optional[str] = None,
        method: str = "linear",
        max_gap: Optional[float] = None,
    ) -> DataFrame:
        """Resample every light curve onto the uniform time grid of
        integer multiples of ``step`` (one band slice if ``band`` is
        given, else per (object, band)) — the standard preparation for
        sequence models over unevenly sampled curves. Thin wrapper over
        :func:`tape_spark.operators.joins.resample_timeseries`; see it
        for interpolation methods, the simultaneous-observation MIN
        convention, and the two-as-of-join scale shape.

        Beyond-reference: the reference has no resampling surface; its
        kernels consume the irregular epochs directly.
        """
        from .operators.joins import resample_timeseries

        src = self.source
        by = [self._id_col]
        if band is not None:
            src = src.filter(F.col(self._band_col) == band)
        else:
            by.append(self._band_col)
        return resample_timeseries(
            src,
            on=self._time_col,
            value_col=self._flux_col,
            step=step,
            by=by,
            method=method,
            max_gap=max_gap,
        )

    # ------------------------------------------------------------------ #
    # sorts / physical layout                                            #
    # ------------------------------------------------------------------ #

    def sort_lightcurves(self, by_band: bool = False) -> "Ensemble":
        """Per-partition sort by (id, [band,] time) — no global shuffle;
        correct under lightcurve cohesion. Parity: ``ensemble.py:445-483``."""
        src = self._table_df(SOURCE_FRAME_LABEL)
        keys = [self._id_col, self._band_col, self._time_col] if by_band else [self._id_col, self._time_col]
        self.frames[SOURCE_FRAME_LABEL] = src.sortWithinPartitions(*keys)
        return self

    def check_sorted(self, table: str = SOURCE_FRAME_LABEL) -> bool:
        """Is the id column non-decreasing within every partition?
        Parity: ``ensemble.py:395-416``."""
        df = self._table_df(table)
        id_col = self._id_col
        w = Window.partitionBy(F.spark_partition_id()).orderBy(F.monotonically_increasing_id())
        violations = (
            df.select(F.col(id_col), F.lag(id_col).over(w).alias("__prev"))
            .filter(F.col("__prev") > F.col(id_col))
            .limit(1)
            .count()
        )
        return violations == 0

    def check_lightcurve_cohesion(self) -> bool:
        """Does every object live in exactly one partition?
        Parity: ``ensemble.py:418-443``."""
        src = self.frames[SOURCE_FRAME_LABEL]
        spread = (
            src.select(self._id_col, F.spark_partition_id().alias("__pid"))
            .groupBy(self._id_col)
            .agg(F.countDistinct("__pid").alias("npart"))
            .filter(F.col("npart") > 1)
            .limit(1)
            .count()
        )
        return spread == 0

    # ------------------------------------------------------------------ #
    # the batch() UDF engine                                             #
    # ------------------------------------------------------------------ #

    def _translate_meta(self, meta, on: List[str], base_df: DataFrame) -> T.StructType:
        """User ``meta`` → exact ``applyInPandas`` StructType, with the group
        keys prepended. Covers the shapes the reference accepted
        (``ensemble.py:2477-2505``): None → ``(result double)``, tuple,
        dict, list-of-tuples, pandas prototypes, StructType, DDL string.
        """
        if meta is None:
            fields = [T.StructField("result", T.DoubleType())]
        elif isinstance(meta, T.StructType):
            fields = list(meta.fields)
        elif isinstance(meta, tuple) and len(meta) == 2 and isinstance(meta[0], str):
            fields = [T.StructField(meta[0], _spark_type(meta[1]))]
        elif isinstance(meta, dict):
            fields = [T.StructField(k, _spark_type(v)) for k, v in meta.items()]
        elif isinstance(meta, (list,)):
            fields = [T.StructField(k, _spark_type(v)) for k, v in meta]
        elif isinstance(meta, pd.Series):
            fields = [T.StructField(meta.name or "result", _spark_type(meta.dtype))]
        elif isinstance(meta, pd.DataFrame):
            fields = [T.StructField(c, _spark_type(meta[c].dtype)) for c in meta.columns]
        elif isinstance(meta, str):
            fields = list(T._parse_datatype_string(meta).fields)
        else:
            raise TypeError(f"Unsupported meta: {meta!r}")
        existing = {f.name for f in fields}
        key_fields = [base_df.schema[k] for k in on if k not in existing]
        return T.StructType(key_fields + fields)

    def batch(
        self,
        func: Union[Callable, AnalysisFunction],
        *args: str,
        meta=None,
        by_band: bool = False,
        on: Union[str, List[str], None] = None,
        label: Optional[str] = None,
        band_values: Optional[List[str]] = None,
        use_map: Optional[bool] = None,
        arrow_native: Optional[bool] = None,
        **kwargs,
    ) -> DataFrame:
        """Run an arbitrary per-lightcurve function at scale.

        Two physical strategies (the reference's ``use_map`` duality,
        ``ensemble.py:1203-1225``, re-expressed for Spark's cost profile):

        - **map path** (default when the source is cohesive and the group
          keys include the id): ``sortWithinPartitions(on)`` +
          ``mapInPandas`` — one Arrow stream per partition, group
          boundaries found with numpy, one Python call per *group* but one
          serialization round-trip per *partition*. With millions of tiny
          light curves this is an order of magnitude faster than grouped
          ``applyInPandas``, whose per-group Arrow batching dominates.
        - **shuffle path** (``use_map=False``, or grouping on non-id keys,
          or cohesion unknown): ``groupBy(on).applyInPandas`` — always
          correct, shuffles by the group keys.

        Parameters mirror the reference (``ensemble.py:1054-1237``):
        ``func`` may be an :class:`AnalysisFunction` (self-describing), or
        any callable taking one numpy array per column name in ``*args``.
        ``meta`` is the result schema (several accepted shapes);
        ``by_band`` groups per (id, band) and pivots results to
        ``{col}_{band}`` columns; ``on`` overrides the grouping keys.
        """
        self._lazy_sync_tables("all")

        if not isinstance(func, AnalysisFunction):
            # auto-wrap raw light-curve (Rust) evaluators, as the reference
            # does at ensemble.py:1152-1154
            from .analysis.feature_extractor import (
                LIGHT_CURVE_AVAILABLE,
                BaseLightCurveFeature,
                FeatureExtractor,
            )

            if LIGHT_CURVE_AVAILABLE and isinstance(func, BaseLightCurveFeature):
                func = FeatureExtractor(func)

        if isinstance(func, AnalysisFunction):
            cols = func.cols(self)
            if meta is None:
                meta = func.meta(self)
            if on is None:
                on = func.on(self)
        else:
            cols = list(args)
        if on is None:
            on = [self._id_col]
        if isinstance(on, str):
            on = [on]
        on = list(on)

        band_col = self._band_col
        if by_band:
            # band must be the last grouping key so each (id, band) is a group
            on = [k for k in on if k != band_col] + [band_col]

        src = self.frames[SOURCE_FRAME_LABEL]
        obj = self.frames[OBJECT_FRAME_LABEL]
        needed = set(cols) | set(on)
        from_object = [
            c for c in needed if c not in src.columns and c in obj.columns and c != self._id_col
        ]
        if from_object:
            # Pull referenced object columns into source; AQE broadcasts the
            # (much smaller) object side automatically.
            src = src.join(obj.select(self._id_col, *from_object), on=self._id_col, how="left")
        missing = [c for c in needed if c not in src.columns and c not in from_object]
        if missing:
            raise KeyError(f"batch() columns not found in source/object: {missing}")

        schema = self._translate_meta(meta, on, src)
        result_fields = [f for f in schema.fields if f.name not in on]
        result_names = [f.name for f in result_fields]
        first_is_map = isinstance(result_fields[0].dataType, T.MapType) if result_fields else False
        func_cols = list(cols)
        group_keys = list(on)

        # Recognized-reducer fast path: batch(np.mean, col) and friends are
        # the reference's canonical workflows (benchmarks.py:27-40), but a
        # plain commutative reduction needs no Python at all — translate it
        # to a built-in Catalyst aggregate (whole-stage codegen, map-side
        # partial combine, no Arrow transfer). NULL/NaN semantics are
        # emulated exactly: the UDF path surfaces NULL as NaN through the
        # pandas conversion and every reducer here propagates NaN, so any
        # NULL-or-NaN in the group forces a NaN result. Only taken when the
        # caller left the physical path to the engine (use_map is None) so
        # parity tests can still force either pandas path explicitly.
        builtin = (
            _BUILTIN_REDUCERS.get(func)
            if not isinstance(func, AnalysisFunction) and getattr(func, "__hash__", None)
            else None
        )
        if (
            builtin is not None
            and use_map is None
            and not kwargs
            and len(func_cols) == 1
            and len(result_names) == 1
            and isinstance(result_fields[0].dataType, T.DoubleType)
        ):
            c = F.col(func_cols[0])
            dirty = (F.count(F.lit(1)) != F.count(c)) | (
                F.count(F.when(F.isnan(c), F.lit(1))) > 0
            )
            result = src.groupBy(*on).agg(
                F.when(dirty, F.lit(float("nan")))
                .otherwise(builtin(c))
                .alias(result_names[0])
            )
            if by_band:
                result = self._pivot_by_band(result, on, band_values, result_names, src)
            self.add_frame(result, label or self._generate_label())
            return result
        # opt-in columnar protocol: the kernel returns {result_name: ndarray}
        # and the engine builds ONE DataFrame per partition instead of one
        # per group (pandas construction dominates on tiny light curves)
        use_columnar = isinstance(func, AnalysisFunction) and getattr(
            func, "supports_columnar", False
        )
        if use_columnar:
            kwargs = dict(kwargs)
            kwargs["_columnar"] = True
        # opt-in whole-block protocol: the kernel vectorizes across every
        # group in an Arrow block at once (returns one result per group, or
        # None to decline and fall back to per-group calls)
        block_fn = (
            getattr(func, "process_block", None) if isinstance(func, AnalysisFunction) else None
        )

        def process_group_arrays(
            n: int, key_arrays: list, col_arrays: list
        ) -> Optional[pd.DataFrame]:
            """Run ``func`` over every group in columnar data already sorted
            by the group keys; scalar results are accumulated row-wise to
            avoid a per-group DataFrame construction. Shared by the pandas
            and Arrow-native map wrappers."""
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for ka in key_arrays:
                change[1:] |= ka[1:] != ka[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            one_result = len(result_names) == 1
            scalar_ok = one_result and not first_is_map
            map_ok = one_result and first_is_map
            simple_rows: list = []
            frames: list = []
            columnar: list = []  # (key_values_tuple, {name: ndarray}, n_rows)
            block_results = (
                block_fn(col_arrays, starts, ends, **kwargs) if block_fn is not None else None
            )
            for gi, (s, e) in enumerate(zip(starts, ends)):
                res = (
                    block_results[gi]
                    if block_results is not None
                    else func(*[a[s:e] for a in col_arrays], **kwargs)
                )
                if use_columnar and isinstance(res, dict):
                    sz = len(res[result_names[0]])
                    if sz:
                        columnar.append((tuple(ka[s] for ka in key_arrays), res, sz))
                elif (scalar_ok and isinstance(res, (int, float, np.integer, np.floating))) or (
                    map_ok and isinstance(res, dict)
                ):
                    simple_rows.append(tuple(ka[s] for ka in key_arrays) + (res,))
                else:
                    out = _standardize_result(res, result_names, first_is_map)
                    for k, ka in zip(group_keys, key_arrays):
                        if k not in out.columns:
                            out[k] = ka[s]
                    # Spark assigns pandas-UDF output columns BY NAME, so a
                    # per-group [cols] reorder is pure indexer overhead —
                    # only select when extra columns must be dropped
                    want = group_keys + result_names
                    if len(out.columns) != len(want) or set(out.columns) != set(want):
                        out = out[want]
                    frames.append(out)
            if simple_rows:
                frames.append(pd.DataFrame(simple_rows, columns=group_keys + result_names))
            if columnar:
                sizes = np.array([sz for _, _, sz in columnar])
                data = {}
                for j, k in enumerate(group_keys):
                    data[k] = np.repeat(np.array([kv[j] for kv, _, _ in columnar]), sizes)
                for name in result_names:
                    data[name] = np.concatenate([r[name] for _, r, _ in columnar])
                frames.append(pd.DataFrame(data, copy=False))
            if not frames:
                return None
            return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]

        def process_groups(pdf: pd.DataFrame) -> Optional[pd.DataFrame]:
            return process_group_arrays(
                len(pdf),
                [pdf[k].to_numpy() for k in group_keys],
                [pdf[c].to_numpy() for c in func_cols],
            )

        def apply_wrapper(pdf: pd.DataFrame) -> pd.DataFrame:
            # one group per call → key columns are constant; no sort needed
            out = process_groups(pdf)
            if out is None:
                return pd.DataFrame({c: [] for c in group_keys + result_names})
            return out

        def map_wrapper(batches):
            # Input is sorted by the group keys within the partition, so the
            # rows of the trailing group form a suffix; carry them into the
            # next Arrow batch in case the group continues there.
            carry: Optional[pd.DataFrame] = None
            for pdf in batches:
                if carry is not None and len(carry):
                    pdf = pd.concat([carry, pdf], ignore_index=True)
                if not len(pdf):
                    continue
                suffix = np.ones(len(pdf), dtype=bool)
                for k in group_keys:
                    kv = pdf[k].to_numpy()
                    suffix &= kv == kv[-1]
                carry = pdf.iloc[np.flatnonzero(suffix)]
                body = pdf.iloc[np.flatnonzero(~suffix)]
                if len(body):
                    out = process_groups(body)
                    if out is not None:
                        yield out
            if carry is not None and len(carry):
                out = process_groups(carry)
                if out is not None:
                    yield out

        def map_wrapper_arrow(batches):
            # Arrow-native twin of map_wrapper: consumes pyarrow
            # RecordBatches and hands the kernels numpy views directly —
            # no pandas DataFrame is ever materialized on the input side,
            # which is the bulk of the mapInPandas boundary cost (the
            # kernels only ever read plain ndarrays). Output re-enters
            # Arrow through one from_pandas per *batch* of group results.
            import pyarrow as pa

            from pyspark.sql.pandas.types import to_arrow_schema

            out_schema = to_arrow_schema(schema)

            def col_np(table, name):
                col = table.column(name)
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                if pa.types.is_integer(arr.type) and arr.null_count:
                    # match the pandas path: nullable ints surface as
                    # float64 + NaN through the Arrow->pandas conversion
                    arr = arr.cast(pa.float64())
                try:
                    return arr.to_numpy(zero_copy_only=True)
                except pa.ArrowInvalid:
                    return arr.to_numpy(zero_copy_only=False)

            def emit(table):
                out = process_group_arrays(
                    table.num_rows,
                    [col_np(table, k) for k in group_keys],
                    [col_np(table, c) for c in func_cols],
                )
                if out is None:
                    return None
                return pa.RecordBatch.from_pandas(
                    out, schema=out_schema, preserve_index=False
                )

            carry: Optional[pa.Table] = None
            for rb in batches:
                t = pa.Table.from_batches([rb])
                if carry is not None and carry.num_rows:
                    t = pa.concat_tables([carry, t]).combine_chunks()
                n = t.num_rows
                if not n:
                    continue
                # rows of the trailing group form a suffix (input sorted by
                # the group keys); hold them for the next batch
                suffix = np.ones(n, dtype=bool)
                for k in group_keys:
                    kv = col_np(t, k)
                    suffix &= kv == kv[-1]
                cut = n - int(suffix.sum())
                carry = t.slice(cut)
                if cut:
                    out = emit(t.slice(0, cut))
                    if out is not None:
                        yield out
            if carry is not None and carry.num_rows:
                out = emit(carry)
                if out is not None:
                    yield out

        if use_map is None:
            use_map = self._source_cohesive and self._id_col in on and not from_object
        if use_map:
            # sort by time inside each group too: order-sensitive kernels see
            # deterministic, time-ordered rows (the same contract
            # sort_lightcurves establishes in the reference)
            sort_keys = list(on)
            if self._time_col in src.columns and self._time_col not in sort_keys:
                sort_keys.append(self._time_col)
            # ship ONLY the columns the kernel reads through the Python
            # boundary: Catalyst cannot prune through an opaque mapInPandas,
            # and the Arrow round-trip is the map path's dominant cost at
            # scale — a wide source table must not pay transfer for columns
            # the kernel never touches. select() after the sort is a narrow
            # projection, so per-partition row order is preserved.
            ship = list(dict.fromkeys(group_keys + func_cols))
            sorted_src = src.sortWithinPartitions(*sort_keys)
            if set(ship) != set(src.columns):
                sorted_src = sorted_src.select(*ship)
            if arrow_native:
                result = sorted_src.mapInArrow(map_wrapper_arrow, schema)
            else:
                result = sorted_src.mapInPandas(map_wrapper, schema)
        else:
            result = src.groupBy(*on).applyInPandas(apply_wrapper, schema)

        if by_band:
            result = self._pivot_by_band(result, on, band_values, result_names, src)

        self.add_frame(result, label or self._generate_label())
        return result

    def _pivot_by_band(
        self,
        result: DataFrame,
        on: List[str],
        band_values: Optional[List[str]],
        result_names: List[str],
        src: DataFrame,
    ) -> DataFrame:
        """Pivot a per-(id, band) batch result to the reference's
        ``{col}_{band}`` wide convention (``_standardize_batch``)."""
        band_col = self._band_col
        id_keys = [k for k in on if k != band_col]
        if band_values is None:
            band_values = sorted(
                r[0] for r in src.select(band_col).distinct().collect()
            )
        aggs = [F.first(F.col(c)).alias(c) for c in result_names]
        result = result.groupBy(*id_keys).pivot(band_col, band_values).agg(*aggs)
        # normalize pivot names to the reference's {col}_{band} convention
        renames = {}
        for b in band_values:
            if len(result_names) == 1:
                renames[str(b)] = f"{result_names[0]}_{b}"
            else:
                for c in result_names:
                    renames[f"{b}_{c}"] = f"{c}_{b}"
        return result.select(
            *id_keys, *[F.col(old).alias(new) for old, new in renames.items()]
        )

    # ------------------------------------------------------------------ #
    # sf2 convenience                                                    #
    # ------------------------------------------------------------------ #

    def sf2(
        self,
        sf_method: str = "basic",
        argument_container=None,
        band_to_calc=None,
        combine: bool = False,
        label: Optional[str] = None,
        exact_quantiles: Optional[bool] = None,
    ) -> DataFrame:
        """Structure function squared over every light curve.

        Per-curve mode dispatches the numpy kernel through :meth:`batch`.
        Combine mode (all curves binned together) is the one operator with
        no single Spark primitive; it gets a two-phase distributed plan in
        :meth:`_sf2_combine` instead of collecting to the driver.
        Parity: ``ensemble.py:2429-2475``.
        """
        import copy

        from .analysis.structure_function import StructureFunctionArgumentContainer
        from .analysis.structurefunction2 import calc_sf2

        if argument_container is None:
            argument_container = StructureFunctionArgumentContainer()
            argument_container.sf_method = sf_method
        else:
            # never mutate the caller's container: combine/band_to_calc set
            # here must not leak into the caller's later sf2() calls
            argument_container = copy.copy(argument_container)
        if band_to_calc is not None:
            argument_container.band_to_calc = band_to_calc

        if combine or argument_container.combine:
            argument_container.combine = True
            return self._sf2_combine(
                argument_container, exact_quantiles=exact_quantiles, label=label
            )
        meta = None
        if argument_container.report_upper_lower_error_separately:
            # the kernel emits two extra columns in this mode; the default
            # AnalysisFunction meta (5 columns) would silently drop them
            meta = {
                "lc_id": str,
                "band": str,
                "dt": float,
                "sf2": float,
                "1_sigma": float,
                "lower_error": float,
                "upper_error": float,
            }
        return self.batch(
            calc_sf2,
            meta=meta,
            label=label,
            sf_method=sf_method,
            argument_container=argument_container,
        )

    # above this many DISTINCT dt values, 'size' bin edges switch from the
    # exact single-group `percentile` (whole distinct-dt set in one reducer's
    # sort buffer — the distinct count is exactly what that buffer holds) to
    # the mergeable `approx_percentile` sketch
    _SF2_EXACT_QUANTILE_MAX = 2_000_000
    # approx_percentile accuracy: rank error <= 1/accuracy of the distinct-dt
    # count, i.e. edges land within 0.01% of the exact quantile rank
    _SF2_APPROX_QUANTILE_ACCURACY = 10_000

    def _sf2_combine(
        self,
        argument_container,
        exact_quantiles: Optional[bool] = None,
        label: Optional[str] = None,
    ) -> DataFrame:
        """Distributed combine-mode SF²: (1) per-curve pairwise differences
        via ``applyInPandas`` (O(nᵢ²) per curve, embarrassingly parallel),
        (2) per-band bin edges from distributed quantiles over the *unique*
        dt values, (3) one global binned aggregation with built-in
        expressions per estimator formula. Mirrors
        ``base_calculator.py:149-171`` semantics without materializing
        differences on the driver.

        Parity with the in-kernel combine path
        (``analysis/structurefunction2.py``):

        - ``band_to_calc`` filters bands before difference generation (the
          predicate reaches the source scan).
        - ``estimate_err``/``calculation_repetitions`` bootstrap-resample
          each curve's differences per repetition and report the
          across-repetition median plus ``1_sigma`` (half the
          upper−lower quantile spread), with optional
          ``lower_error``/``upper_error`` columns. Without ``estimate_err``
          every repetition is identical, so the median equals the single
          pass and the spread is exactly zero — computed in one pass.
        - Bin edges always come from the full (unsampled) dt set, as in
          ``_binned_statistics``.
        - A band whose differences come from a single curve keeps that
          curve's id as ``lc_id`` (kernel ``entry_ids`` behavior); only
          multi-curve bands collapse to ``'combined'``. (Curves counted
          are those contributing at least one difference.)

        ``exact_quantiles`` picks the 'size' bin-edge strategy: exact
        ``percentile`` (single-group; numpy-identical, small data) vs
        ``approx_percentile`` (mergeable partial aggregation — no
        single-task quantile stage; rank error ≤ 1/accuracy). Default: auto
        by total difference count (``_SF2_EXACT_QUANTILE_MAX``).

        Buckets with no samples are omitted (the in-kernel path emits NaN
        rows for them); at combine scale empty buckets occur only with
        degenerate manual edges.
        """
        import zlib

        from .analysis.light_curve import StructureFunctionLightCurve

        ac = argument_container
        id_col, band_col = self._id_col, self._band_col
        t, fx, er = self._time_col, self._flux_col, self._err_col
        self._lazy_sync_tables("all")
        src = self.frames[SOURCE_FRAME_LABEL]

        band_to_calc = ac.band_to_calc
        if isinstance(band_to_calc, str):
            band_to_calc = [band_to_calc]
        if band_to_calc is not None:
            src = src.filter(F.col(band_col).isin([str(b) for b in band_to_calc]))

        diff_schema = T.StructType(
            [
                T.StructField("lc", T.StringType()),
                T.StructField("band", T.StringType()),
                T.StructField("dt", T.DoubleType()),
                T.StructField("d_flux", T.DoubleType()),
                T.StructField("err2", T.DoubleType()),
            ]
        )
        t_c, fx_c, er_c, b_c, i_c = t, fx, er, band_col, id_col

        def diffs(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            lc_key = str(pdf[i_c].iloc[0]) if len(pdf) else ""
            for b, grp in pdf.groupby(b_c):
                try:
                    lc = StructureFunctionLightCurve(
                        times=grp[t_c].to_numpy(),
                        fluxes=grp[fx_c].to_numpy(),
                        errors=grp[er_c].to_numpy(),
                    )
                except ValueError:
                    continue
                out.append(
                    pd.DataFrame(
                        {
                            "lc": lc_key,
                            "band": str(b),
                            "dt": lc._all_d_times,
                            "d_flux": lc._all_d_fluxes,
                            "err2": lc._all_sum_squared_error,
                        }
                    )
                )
            if not out:
                return pd.DataFrame({f.name: [] for f in diff_schema.fields})
            return pd.concat(out, ignore_index=True)

        diff_df = src.groupBy(id_col).applyInPandas(diffs, diff_schema)
        diff_df = diff_df.persist()

        # Bin edges in two jobs total (not 2-3 *per band*): one aggregation
        # for per-band difference counts, then one action over a union of
        # per-band quantile/range branches. `percentile` uses linear
        # interpolation, matching numpy's quantile in compute_dt_bins.
        per_band_edges: Dict[str, np.ndarray] = {}
        band_stats = diff_df.groupBy("band").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("lc").alias("n_curves"),
            F.max("lc").alias("only_lc"),
        ).collect()
        counts = {r["band"]: r["n"] for r in band_stats}
        # kernel parity (structurefunction2.py entry_ids): a band whose
        # differences come from a single curve keeps that curve's id, only
        # multi-curve bands collapse to 'combined'
        band_label = {
            r["band"]: ("combined" if r["n_curves"] > 1 else str(r["only_lc"]))
            for r in band_stats
        }
        if band_label:
            lc_id_col = F.element_at(
                F.create_map(
                    *[x for b, lab in band_label.items() for x in (F.lit(b), F.lit(lab))]
                ),
                F.col("band"),
            )
        else:
            lc_id_col = F.lit("combined")
        if ac.bins is not None:
            for b in counts:
                per_band_edges[b] = np.asarray(ac.bins, dtype=float)
        else:
            # persisted: the auto-switch count plus every per-band quantile
            # branch reuses one distinct shuffle instead of recomputing it
            uniq = diff_df.select("band", "dt").distinct().persist()
            if exact_quantiles is None and ac.bin_method == "size":
                # the exact percentile's sort buffer holds the DISTINCT dt
                # set (quantiles are over unique values), so that is the
                # number that decides exact vs sketch — total pair count
                # overstates it badly when times are coarse (e.g. dates)
                exact_quantiles = uniq.count() <= self._SF2_EXACT_QUANTILE_MAX
            elif exact_quantiles is None:
                exact_quantiles = True  # min/max only — no quantile stage
            branches = []
            for b, total in counts.items():
                num_bins = int(np.ceil(total / ac.bin_count_target))
                band_uniq = uniq.filter(F.col("band") == b)
                if ac.bin_method == "size":
                    probs = ", ".join(map(str, np.linspace(0.0, 1.0, num_bins + 1)))
                    if exact_quantiles:
                        q_expr = f"percentile(dt, array({probs}))"
                    else:
                        q_expr = (
                            f"approx_percentile(dt, array({probs}), "
                            f"{self._SF2_APPROX_QUANTILE_ACCURACY})"
                        )
                    agg = band_uniq.agg(F.expr(q_expr).alias("qs"))
                else:
                    agg = band_uniq.agg(F.array(F.min("dt"), F.max("dt")).alias("qs"))
                branches.append(agg.select(F.lit(b).alias("band"), "qs"))
            from functools import reduce

            rows = reduce(lambda a, c: a.unionByName(c), branches).collect() if branches else []
            uniq.unpersist()
            for row in rows:
                b, qs = row["band"], np.asarray(row["qs"], dtype=float)
                if ac.bin_method == "size":
                    edges = qs
                else:
                    lo, hi = qs
                    num_bins = int(np.ceil(counts[b] / ac.bin_count_target))
                    if ac.bin_method == "loglength":
                        logs = np.linspace(np.log(lo), np.log(hi), num_bins + 1)
                        logs[0] -= 0.001 * (np.log(hi) - np.log(lo))
                        edges = np.exp(logs)
                    else:
                        edges = np.linspace(lo, hi, num_bins + 1)
                        edges[0] -= 0.001 * (hi - lo)
                per_band_edges[b] = edges

        edges_map = {b: e.tolist() for b, e in per_band_edges.items()}

        @F.pandas_udf(T.IntegerType())
        def bucket_of(band_s: pd.Series, dt_s: pd.Series) -> pd.Series:
            out = np.full(len(dt_s), -1, dtype=np.int32)
            for b in band_s.unique():
                edges = np.asarray(edges_map.get(b, []))
                if edges.size < 2:
                    continue
                mask = (band_s == b).to_numpy()
                idx = np.digitize(dt_s.to_numpy()[mask], edges) - 1
                idx[dt_s.to_numpy()[mask] == edges[-1]] = edges.size - 2
                idx[(idx < 0) | (idx > edges.size - 2)] = -1
                out[mask] = idx
            return pd.Series(out)

        method = ac.sf_method
        df2 = F.pow(F.col("d_flux"), 2)
        if method == "basic":
            sf2_expr = F.mean(df2 - F.col("err2"))
        elif method == "bauer_2009a":
            sf2_expr = F.mean(df2) - F.mean("err2")
        elif method == "bauer_2009b":
            sf2_expr = (
                F.lit(float(np.pi / 2)) * F.pow(F.mean(F.abs(F.col("d_flux"))), 2)
                - F.mean("err2")
            )
        elif method == "schmidt_2010":
            sf2_expr = F.pow(
                F.mean(
                    F.lit(float(np.sqrt(np.pi / 2))) * F.abs(F.col("d_flux"))
                    - F.sqrt(F.col("err2"))
                ),
                2,
            )
        elif method == "macleod_2012":
            iqr = F.expr("percentile(d_flux, 0.75) - percentile(d_flux, 0.25)")
            sf2_expr = F.pow(F.lit(0.74) * iqr, 2)
        else:
            raise ValueError(f"Combine mode does not support method {method!r}")

        want_bounds = ac.report_upper_lower_error_separately
        out_cols = ["lc_id", "band", "dt", "sf2", "1_sigma"] + (
            ["lower_error", "upper_error"] if want_bounds else []
        )

        if not ac.estimate_err:
            # Every repetition is identical without resampling: the
            # across-repetition median is the single-pass value and the
            # quantile spread is exactly zero (reference behavior for
            # calculation_repetitions >= 1, estimate_err=False).
            bucketed = diff_df.withColumn(
                "bucket", bucket_of(F.col("band"), F.col("dt"))
            ).filter(F.col("bucket") >= 0)
            result = (
                bucketed.groupBy("band", "bucket")
                .agg(F.mean("dt").alias("dt"), sf2_expr.alias("sf2"))
                .withColumn("lc_id", lc_id_col)
                .withColumn("1_sigma", F.lit(0.0))
            )
            if want_bounds:
                result = result.withColumn("lower_error", F.lit(0.0)).withColumn(
                    "upper_error", F.lit(0.0)
                )
            result = result.select(*out_cols, "bucket").orderBy("band", "bucket").drop("bucket")
            result = self._materialize_and_release(result, diff_df)
            self.add_frame(result, label or self._generate_label())
            return result

        # --- bootstrap path: per-(band, curve) resample with replacement,
        # one repetition index per draw; per-repetition binned aggregation;
        # then a tiny across-repetition median/quantile aggregation. The
        # resample fan-out is R x n_samples rows per curve — each curve's
        # differences stay within one task, no driver involvement.
        reps = int(ac.calculation_repetitions)
        seed = ac.random_seed
        if ac.equally_weight_lightcurves:
            n_samples_map = {
                r[0]: r[1]
                for r in diff_df.groupBy("band", "lc")
                .count()
                .groupBy("band")
                .agg(F.min("count").alias("n"))
                .select("band", "n")
                .collect()
            }
        else:
            n_samples_map = {}
        fixed_n = ac.number_lightcurve_samples

        sample_schema = T.StructType(
            [
                T.StructField("band", T.StringType()),
                T.StructField("rep", T.IntegerType()),
                T.StructField("dt", T.DoubleType()),
                T.StructField("d_flux", T.DoubleType()),
                T.StructField("err2", T.DoubleType()),
            ]
        )

        def resample(key, pdf):
            b, lc_key = key
            m = len(pdf)
            n = n_samples_map.get(b, fixed_n)
            if n is None:
                n = m
            if n > m:
                raise ValueError(
                    f"Requesting {n} samples, but only {m} are present in the lightcurve"
                )
            if seed is None:
                rng = np.random.default_rng()
            else:
                # deterministic per (band, curve): reruns with the same seed
                # reproduce the same draws regardless of task placement
                rng = np.random.default_rng(
                    [int(seed), zlib.crc32(str(b).encode()), zlib.crc32(str(lc_key).encode())]
                )
            arr = pdf[["dt", "d_flux", "err2"]].to_numpy(dtype=float)
            idx = rng.integers(0, m, size=(reps, n))
            flat = arr[idx.ravel()]
            return pd.DataFrame(
                {
                    "band": str(b),
                    "rep": np.repeat(np.arange(reps, dtype=np.int32), n),
                    "dt": flat[:, 0],
                    "d_flux": flat[:, 1],
                    "err2": flat[:, 2],
                }
            )

        sampled = diff_df.groupBy("band", "lc").applyInPandas(resample, sample_schema)
        bucketed = sampled.withColumn(
            "bucket", bucket_of(F.col("band"), F.col("dt"))
        ).filter(F.col("bucket") >= 0)
        per_rep = bucketed.groupBy("band", "rep", "bucket").agg(
            F.mean("dt").alias("dt"), sf2_expr.alias("sf2")
        )
        # across-repetition aggregation: <= R rows per (band, bucket).
        # `percentile` over the present repetitions == nanmedian/nanquantile
        # (a bucket empty in some repetition contributes NaN there, which
        # numpy's nan-aggregations skip).
        lo_q, hi_q = float(ac.lower_error_quantile), float(ac.upper_error_quantile)
        agg_cols = [
            F.expr("percentile(dt, 0.5)").alias("dt"),
            F.expr("percentile(sf2, 0.5)").alias("sf2"),
            (
                (F.expr(f"percentile(sf2, {hi_q})") - F.expr(f"percentile(sf2, {lo_q})")) / 2.0
            ).alias("1_sigma"),
        ]
        if want_bounds:
            agg_cols += [
                (F.expr("percentile(sf2, 0.5)") - F.expr(f"percentile(sf2, {lo_q})")).alias(
                    "lower_error"
                ),
                (F.expr(f"percentile(sf2, {hi_q})") - F.expr("percentile(sf2, 0.5)")).alias(
                    "upper_error"
                ),
            ]
        result = (
            per_rep.groupBy("band", "bucket")
            .agg(*agg_cols)
            .withColumn("lc_id", lc_id_col)
            .select(*out_cols, "bucket")
            .orderBy("band", "bucket")
            .drop("bucket")
        )
        result = self._materialize_and_release(result, diff_df)
        self.add_frame(result, label or self._generate_label())
        return result

    @staticmethod
    def _materialize_and_release(result: DataFrame, *caches: DataFrame) -> DataFrame:
        """Persist and eagerly compute a (small) result, then unpersist the
        given upstream caches — the shared audited cache lifecycle
        (``utils/caching.py``; dsir_select / bm25_topk /
        cluster_balanced_sample run the same discipline).

        Combine-mode SF² persists an O(Σnᵢ²) difference table that the lazy
        result plan keeps alive; on a long-lived session, leaking one such
        cache per call exhausts executor storage. The binned output is tiny,
        so materializing it to free the big cache is the right trade.
        """
        from .utils.caching import materialize_and_release

        return materialize_and_release(result, *caches)

    # ------------------------------------------------------------------ #
    # persistence                                                        #
    # ------------------------------------------------------------------ #

    def save_ensemble(self, path: str = ".", dirname: str = "ensemble", additional_frames=True) -> str:
        """Write every tracked frame as a parquet subdir + metadata JSON.
        Parity: ``ensemble.py:1315-1430``."""
        self._lazy_sync_tables("all")
        root = os.path.join(path, dirname)
        os.makedirs(root, exist_ok=True)
        if additional_frames is True:
            labels = list(self.frames)
        elif additional_frames is False:
            labels = [SOURCE_FRAME_LABEL, OBJECT_FRAME_LABEL]
        else:
            labels = [SOURCE_FRAME_LABEL, OBJECT_FRAME_LABEL] + list(additional_frames)
        for label in labels:
            self.frames[label].write.mode("overwrite").parquet(os.path.join(root, label))
        metadata = {
            "frames": labels,
            "column_mapper": self.column_mapper.map if self.column_mapper else None,
            "keep_empty_objects": self.keep_empty_objects,
        }
        with open(os.path.join(root, METADATA_FILENAME), "w") as fh:
            json.dump(metadata, fh, indent=2)
        return root

    def from_ensemble(self, dirpath: str, additional_frames=True) -> "Ensemble":
        """Reload a saved ensemble directory (parity: ``ensemble.py:1432-1533``)."""
        with open(os.path.join(dirpath, METADATA_FILENAME)) as fh:
            metadata = json.load(fh)
        if metadata.get("column_mapper"):
            self._load_column_mapper(ColumnMapper(**metadata["column_mapper"]))
        self.keep_empty_objects = metadata.get("keep_empty_objects", False)
        if additional_frames is True:
            labels = metadata["frames"]
        elif additional_frames is False:
            labels = [SOURCE_FRAME_LABEL, OBJECT_FRAME_LABEL]
        else:
            labels = [SOURCE_FRAME_LABEL, OBJECT_FRAME_LABEL] + list(additional_frames)
        for label in labels:
            self.frames[label] = self.spark.read.parquet(os.path.join(dirpath, label))
        self._source_dirty = False
        self._object_dirty = False
        # a plain parquet read gives no cohesion guarantee (file splits can
        # slice an object across read partitions), so batch() must use the
        # shuffle path until the caller re-establishes cohesion
        self._source_cohesive = False
        return self

    # ------------------------------------------------------------------ #
    # local views                                                        #
    # ------------------------------------------------------------------ #

    def to_timeseries(
        self,
        target: int,
        table: str = SOURCE_FRAME_LABEL,
        id_col: Optional[str] = None,
        time_col: Optional[str] = None,
        flux_col: Optional[str] = None,
        err_col: Optional[str] = None,
        band_col: Optional[str] = None,
    ) -> TimeSeries:
        """Materialize one object's light curve as a local
        :class:`TimeSeries` (predicate pushes down to the scan).
        Parity: ``ensemble.py:2342-2401``."""
        id_col = id_col or self._id_col
        pdf = self._table_df(table).filter(F.col(id_col) == target).toPandas()
        return TimeSeries().from_dataframe(
            pdf,
            object_id=target,
            time_label=time_col or self._time_col,
            flux_label=flux_col or self._flux_col,
            err_label=err_col or self._err_col,
            band_label=band_col or self._band_col,
        )


def _lsdb_catalog_path(catalog) -> Optional[str]:
    """Best-effort extraction of an LSDB catalog's on-disk HiPSCat root.

    LSDB catalogs wrap a hipscat structure whose location is exposed as
    ``hc_structure.catalog_path`` (str) or ``catalog_base_dir``
    (path-like) depending on version; duck-typed so the scale path works
    without importing lsdb. Returns None when the catalog is in-memory or
    carries no usable path.
    """
    hc = getattr(catalog, "hc_structure", None)
    if hc is None:
        return None
    for attr in ("catalog_path", "catalog_base_dir"):
        path = getattr(hc, attr, None)
        if path:
            return str(path)
    return None


def _standardize_result(res, result_names: List[str], first_is_map: bool) -> pd.DataFrame:
    """Normalize a batch() function result into a pandas DataFrame with the
    declared result columns (the reference's ``_standardize_batch``,
    ``ensemble.py:1239-1313``, adapted to schema-rigid Spark)."""
    if isinstance(res, pd.DataFrame):
        return res.reset_index(drop=True)
    if isinstance(res, pd.Series):
        if first_is_map:
            return pd.DataFrame({result_names[0]: [dict(res)]})
        if set(map(str, res.index)) >= set(result_names):
            return pd.DataFrame([{k: res[k] for k in result_names}])
        return pd.DataFrame({result_names[0]: res.reset_index(drop=True)})
    if isinstance(res, dict):
        if first_is_map:
            return pd.DataFrame({result_names[0]: [res]})
        if set(res) >= set(result_names):
            return pd.DataFrame([{k: res[k] for k in result_names}])
        raise ValueError(f"dict result keys {sorted(res)} do not cover schema {result_names}")
    if isinstance(res, (list, tuple, np.ndarray)):
        arr = np.asarray(res)
        if arr.ndim == 0:
            return pd.DataFrame({result_names[0]: [arr.item()]})
        if arr.ndim == 1 and len(result_names) == 1:
            return pd.DataFrame({result_names[0]: arr})
        if arr.ndim == 1 and len(arr) == len(result_names):
            return pd.DataFrame([dict(zip(result_names, arr))])
        return pd.DataFrame(arr, columns=result_names)
    return pd.DataFrame({result_names[0]: [res]})

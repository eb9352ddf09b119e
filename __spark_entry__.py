"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship prune→batch workflow on sf0.001.
``queries()`` registers one callable per implemented operator from
SURVEY.md §2 (plus the data-pipeline extensions); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible one.

Conventions used so Spark and DuckDB results hash identically:
- time columns are epoch seconds as double (``timestampdiff`` from the
  NTZ epoch on the Spark side == DuckDB ``epoch(ts)``; timezone-free);
- every float produced by an aggregation (or transcendental function) is
  ``round(x, 6)`` on BOTH sides so last-ulp engine differences vanish;
- every computed column is aliased identically on both sides.

Light-curve mapping for the TPC-H-ish testdata: ``lineitem`` is the
source table with id=l_orderkey, time=epoch(l_shipdate),
flux=l_extendedprice, err=l_quantity, band=l_returnflag.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))

EPOCH_EXPR = "cast(timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}) as double)"


def _pin_time_configs(spark: SparkSession) -> None:
    """Pin the session time configs every query relies on.

    Called from EVERY table loader (not just the events one) so the session
    state is identical no matter which query runs first — otherwise a
    timestamp-dependent query evaluated after an events query would see
    different configs than one evaluated before, making correctness
    evaluation-order-dependent. Idempotent; the driver owns the session, so
    construction-time config is not available to us."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# Session-scoped parquet SCHEMA memo, keyed on path. Schema inference is
# a per-read driver/JVM tax (~0.08-0.12 s: footer fetch + merge + py4j),
# paid by every loader call — 4 of the 10 bench queries re-ingest per
# rep, so it compounded to ~0.4 s of the headline. Caching the SCHEMA is
# metadata-only (the same move table formats make with manifests): every
# action still reads the parquet DATA; no rows, results, or plans are
# memoized. The testdata files are immutable for a process's lifetime;
# schemas are inferred under the pinned time configs (loaders call
# _pin_time_configs before the first read of a path).
_SCHEMA_CACHE: dict = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def _lineitem_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    _pin_time_configs(spark)
    li = _read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    # ONE selectExpr round trip (not per-Column py4j calls); expressions
    # identical to the previous Column form
    return li.selectExpr(
        "l_orderkey",
        EPOCH_EXPR.format(col="l_shipdate") + " AS t",
        "l_extendedprice",
        "l_quantity",
        "l_returnflag",
    )


def _ensemble(spark: SparkSession, sf_dir: str):
    from tape_spark import ColumnMapper, Ensemble

    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="t",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    return Ensemble(spark).from_spark(
        _lineitem_source(spark, sf_dir), column_mapper=cm, npartitions=32
    )


# Parquet LAYOUT memo (file count + row count from the footers), keyed on
# path — metadata-only, same contract as _SCHEMA_CACHE: no rows or results
# are memoized, every action still reads the data.
_LAYOUT_CACHE: dict = {}


def _parquet_layout(path: str) -> "tuple[int, int] | None":
    """File count + row count from local parquet footers, or ``None`` when
    the path is not a local filesystem path (``hdfs://``, ``s3a://``, …) —
    this probe exists for the local driver-harness testdata; remote stores
    must go through Spark's own (filesystem-agnostic) readers, so callers
    treat ``None`` as "no footer knowledge" and fall back to the plain
    scale-safe behavior instead of crashing on os.listdir of a URI."""
    _MISS = object()
    got = _LAYOUT_CACHE.get(path, _MISS)
    if got is _MISS:
        try:
            import pyarrow.parquet as pq

            if os.path.isdir(path):
                files = [
                    os.path.join(path, f)
                    for f in os.listdir(path)
                    if f.endswith(".parquet")
                ]
            else:
                files = [path]
            rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            got = (len(files), rows)
        except (OSError, ValueError, ImportError):
            got = None
        _LAYOUT_CACHE[path] = got
    return got


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-file corpora load as one partition, so the text kernels need a
    # spreading shuffle — but its WIDTH is derived from the input size
    # (footer row count), not the core count: repartition(defaultParallelism)
    # on a toy corpus paid ~60 tasks of pure scheduling overhead per action
    # (measured r15: q7 1.26 s -> 0.64 s, q10 1.49 s -> 0.90 s at width 5 vs
    # 32), while width 1 serializes the kernels (q7 0.94 s). ~1000 rows per
    # slice keeps each task's kernel work well above the per-task fixed cost;
    # the width clamps to defaultParallelism, so at any real SF this is
    # exactly the old behavior, and a pre-split corpus (>= width files)
    # skips the shuffle outright — a 100 TB corpus arrives pre-split.
    _pin_time_configs(spark)
    path = f"{sf_dir}/documents.parquet"
    df = _read_parquet(spark, path)
    layout = _parquet_layout(path)
    if layout is None:
        # non-local path (or unreadable footers): no layout knowledge —
        # return the plain scan; a remote warehouse corpus arrives
        # pre-split and Spark's split planning sizes the scan itself
        return df
    n_files, rows = layout
    rows_per_slice = int(
        spark.conf.get("spark.tape.docs.rowsPerSlice", "1000")
    )
    width = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-rows // max(1, rows_per_slice)),
        ),
    )
    # A pre-split corpus skips the spreading shuffle ONLY when the scan
    # actually loads wide enough: Spark packs small files into splits
    # (maxPartitionBytes/openCostInBytes), so footer file count alone
    # overstates input partitions — a corpus pre-split into many tiny
    # files can still load as 1-2 partitions and serialize the text
    # kernels. getNumPartitions is plan-time metadata (no job); it is
    # only consulted when n_files >= width, so single-file corpora (the
    # bench path) never pay the RDD-conversion tax.
    if n_files < width or df.rdd.getNumPartitions() < width:
        df = df.repartition(width)
    return df


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    _pin_time_configs(spark)
    return _read_parquet(spark, f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with canonical time columns regardless of how the parquet
    stores ``ts``: ``t`` = epoch seconds (double), ``ts_us`` = epoch
    microseconds (long).  Handles TIMESTAMP(NANOS) (readable only as a raw
    long via the legacy flag), TIMESTAMP_NTZ(µs), and tz-adjusted TIMESTAMP —
    all timezone-free so they match DuckDB's ``epoch(ts)`` exactly.

    The µs math relies on the pinned configs: NTZ-stored parquet must load
    as timestamp_ntz (not session-tz-adjusted TimestampType), and any
    tz-adjusted branch must evaluate in UTC — otherwise a config drift
    would silently skew ts_us against DuckDB's ``epoch(ts)``."""
    _pin_time_configs(spark)
    ev = _read_parquet(spark, f"{sf_dir}/events.parquet")
    kind = ev.schema["ts"].dataType.simpleString()
    if kind == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
        # floor division (div truncates toward zero) so pre-1970 negative
        # ns values agree with the oracle's epoch_ns(ts) // 1000
        ts_us = F.expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")
    elif kind == "timestamp_ntz":
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    else:  # tz-adjusted timestamp: unix_micros is epoch-based already
        ts_us = F.unix_micros(F.col("ts"))
    ev = ev.withColumn("ts_us", ts_us)
    return ev.withColumn("t", F.col("ts_us").cast("double") / F.lit(1e6))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ingest lineitem as light curves, prune thin curves, run a
    batch(np.mean) over flux via applyInPandas — the reference's canonical
    benchmark workflow (benchmarks.py:27-40) on Spark."""
    ens = _ensemble(spark, "/root/testdata/sf0.001")
    ens.prune(threshold=4)
    result = ens.batch(np.mean, "l_extendedprice", meta=("result", float))
    return result.select("l_orderkey", F.round("result", 6).alias("result"))


# --------------------------------------------------------------------- #
# TAPE-parity queries over lineitem-as-lightcurves                       #
# --------------------------------------------------------------------- #


def q_ingest_source(spark, sf_dir):
    """from_parquet + critical-column projection (SURVEY §2.1)."""
    return _ensemble(spark, sf_dir).source


def q_calc_nobs_by_band(spark, sf_dir):
    """Per-band pivot counts + total (SURVEY §2.5; covers calc_nobs too —
    ``nobs_total`` is the plain groupBy(id).count() path)."""
    ens = _ensemble(spark, sf_dir)
    ens.calc_nobs(by_band=True, band_values=["A", "N", "R"])
    return ens.object.select("l_orderkey", "nobs_A", "nobs_N", "nobs_R", "nobs_total")


def q_prune_sync(spark, sf_dir):
    """prune → implicit left-semi sync of the source table (SURVEY §1.2)."""
    ens = _ensemble(spark, sf_dir)
    ens.prune(threshold=5)
    return ens.source  # property access triggers the lazy sync


def q_query_filter(spark, sf_dir):
    """pandas-dialect query() filter (SURVEY §2.2). Round 9 (checklist
    #5): the ensemble is ingested through ``from_hipscat`` — the source
    is first laid out as a HiPSCat-style ``Norder=/Dir=/Npix=``
    partitioned directory (pixel ids derived from the object id), then
    read back via Spark partition discovery — so the spatial-catalog
    reader sits inside the oracle gate; the query result is projected
    back to the five critical columns (partition-discovery adds the
    Norder/Dir/Npix columns, exactly as the reference's catalogs carry
    their healpix metadata)."""
    from tape_spark import Ensemble

    src = _lineitem_source(spark, sf_dir)
    hdir = os.path.join(_REPO_DIR, ".tmp", "hipscat_lineitem")
    (
        src.withColumn("Norder", F.lit(1))
        .withColumn("Dir", F.lit(0))
        .withColumn("Npix", (F.col("l_orderkey") % 4).cast("int"))
        .write.mode("overwrite")
        .partitionBy("Norder", "Dir", "Npix")
        .parquet(hdir)
    )
    from tape_spark import ColumnMapper

    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="t",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    ens = Ensemble(spark).from_hipscat(hdir, column_mapper=cm, npartitions=32)
    ens.query("(l_extendedprice > 30000) & (l_quantity < 40)")
    return ens.frames["source"].select(
        "l_orderkey", "t", "l_extendedprice", "l_quantity", "l_returnflag"
    )


def q_assign_dropna(spark, sf_dir):
    """assign() computed column + dropna(subset) (SURVEY §2.2)."""
    ens = _ensemble(spark, sf_dir)
    ens.assign(flagged=F.when(F.col("l_quantity") > 25, F.col("l_extendedprice")))
    ens.dropna(subset=["flagged"])
    return ens.frames["source"]


def q_flux_to_mag(spark, sf_dir):
    """convert_flux_to_mag with scalar zero point (SURVEY §2.3). Round 9
    (checklist #6): the ensemble is built through the curated-dataset
    registry — a local JSON registry file names the lineitem parquet and
    its column map, ``available_datasets`` must list it, and
    ``read_dataset`` performs the ingest — so the registry reader layer
    sits inside the oracle gate (the reference fetches the same registry
    shape over HTTP, ``ensemble.py:2008-2066``)."""
    import json

    from tape_spark.readers import DATASET_REGISTRY_ENV, available_datasets, read_dataset

    _pin_time_configs(spark)
    os.makedirs(os.path.join(_REPO_DIR, ".tmp"), exist_ok=True)
    reg_path = os.path.join(_REPO_DIR, ".tmp", "dataset_registry.json")
    with open(reg_path, "w") as fh:
        json.dump(
            {
                "lineitem_local": {
                    "description": "local TPC-H lineitem as a curated dataset",
                    "source_file": f"{sf_dir}/lineitem.parquet",
                    "column_map": {
                        "id_col": "l_orderkey",
                        "time_col": "l_shipdate",
                        "flux_col": "l_extendedprice",
                        "err_col": "l_quantity",
                        "band_col": "l_returnflag",
                    },
                }
            },
            fh,
        )
    prev = os.environ.get(DATASET_REGISTRY_ENV)
    os.environ[DATASET_REGISTRY_ENV] = reg_path
    try:
        assert "lineitem_local" in available_datasets()
        ens = read_dataset("lineitem_local", spark=spark, npartitions=32)
    finally:
        if prev is None:
            os.environ.pop(DATASET_REGISTRY_ENV, None)
        else:
            os.environ[DATASET_REGISTRY_ENV] = prev
    ens.assign(t=F.col("l_shipdate").cast("timestamp_ltz").cast("double"))
    ens.convert_flux_to_mag(zero_point=25.0)
    return ens.frames["source"].select(
        "l_orderkey",
        "t",
        F.round("l_extendedprice_mag", 6).alias("mag"),
        F.round("l_extendedprice_mag_err", 6).alias("mag_err"),
    )


def q_coalesce(spark, sf_dir):
    """coalesce(first-non-null across columns) (SURVEY §2.2)."""
    ens = _ensemble(spark, sf_dir)
    ens.assign(flag_or_null=F.expr("nullif(l_returnflag, 'N')"), fallback=F.lit("Z"))
    ens.coalesce(["flag_or_null", "fallback"], "flag2")
    return ens.frames["source"].select("l_orderkey", "flag2")


def q_bin_sources(spark, sf_dir):
    """bin_sources: weekly time-bucket partial+final aggregation (SURVEY §2.5)."""
    ens = _ensemble(spark, sf_dir)
    ens.bin_sources(time_window=604800.0, count_col="bin_count")
    return ens.frames["source"].select(
        "l_orderkey",
        "l_returnflag",
        F.round("t", 6).alias("t"),
        F.round("l_extendedprice", 6).alias("flux_mean"),
        F.round("l_quantity", 6).alias("err_agg"),
        "bin_count",
    )


def q_select_head(spark, sf_dir):
    """Ensemble.select projection (id always retained) composed with a
    filter_from_series boolean-Column filter and a deterministic top-100
    (orderBy + limit → TakeOrderedAndProject) (SURVEY §2.2 + §2.6).
    filter_from_series folded in here round 8 — its standalone row
    hash-duplicated query_filter's coverage (both are one WHERE over the
    critical projection). Ordering by every output column makes the
    returned multiset tie-proof."""
    ens = _ensemble(spark, sf_dir)
    ens.filter_from_series((F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
    ens.select(["l_extendedprice", "l_returnflag"])
    return (
        ens.frames["source"]
        .orderBy("l_orderkey", "l_extendedprice", "l_returnflag")
        .limit(100)
    )


def q_batch_amplitude(spark, sf_dir):
    """batch() with a custom user kernel: half peak-to-peak amplitude.
    Round 9 (checklist #20): the result is retrieved through the frame
    registry — batch() tracked it via add_frame under an explicit label,
    the query re-fetches it with select_frame, and frame_info must list
    all three tracked frames — so frame management sits inside the hash
    gate instead of pytest only."""
    ens = _ensemble(spark, sf_dir)

    def amplitude(flux):
        return (np.max(flux) - np.min(flux)) / 2.0

    ens.batch(amplitude, "l_extendedprice", meta=("amplitude", float), label="amp")
    tracked = sorted(ens.frame_info()["label"])
    assert tracked == ["amp", "object", "source"], tracked
    result = ens.select_frame("amp")
    return result.select("l_orderkey", F.round("amplitude", 6).alias("amplitude"))


def q_batch_features(spark, sf_dir):
    """FeatureExtractor dispatch through batch(): pure-python fallback
    evaluators (the optional Rust light-curve wheel is absent in this
    environment) bundled licu.Extractor-style; amplitude and mean are
    SQL-expressible so the whole dispatch path is oracle-checked."""
    from tape_spark.analysis import FeatureExtractor, PyAmplitude, PyExtractor, PyMean

    ens = _ensemble(spark, sf_dir)
    feat = FeatureExtractor(PyExtractor(PyAmplitude(), PyMean()))
    result = ens.batch(feat, band_to_calc=None)
    return result.select(
        "l_orderkey",
        F.round("amplitude", 6).alias("amplitude"),
        F.round("mean", 6).alias("mean"),
    )


def q_batch_by_band(spark, sf_dir):
    """batch(by_band=True): per-(id,band) groups pivoted to result_<band>."""
    ens = _ensemble(spark, sf_dir)
    result = ens.batch(
        np.mean, "l_extendedprice", meta=("result", float), by_band=True, band_values=["A", "N", "R"]
    )
    return result.select(
        "l_orderkey",
        F.round("result_A", 6).alias("result_A"),
        F.round("result_N", 6).alias("result_N"),
        F.round("result_R", 6).alias("result_R"),
    )


def q_merge_orders(spark, sf_dir):
    """Ensemble.merge with a broadcast dimension (SURVEY §2.4)."""
    ens = _ensemble(spark, sf_dir)
    ens.calc_nobs()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    merged = ens.merge(orders, on="l_orderkey", how="inner", table="object", broadcast_right=True)
    return merged.select("l_orderkey", "nobs_total", "o_totalprice")


def q_merge_rollup_nation(spark, sf_dir):
    """Multi-table relational breadth: source ⋈ orders ⋈ customer ⋈ nation
    (dimensions broadcast), revenue rolled up per nation (TPC-H-Q5-style;
    SURVEY §2.4 join surface composed with §2.5 aggregation)."""
    ens = _ensemble(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = ens.merge(orders, on="l_orderkey", how="inner", broadcast_right=True)
    joined = joined.join(F.broadcast(customer), on="o_custkey").join(
        F.broadcast(nation), on="c_nationkey"
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
    )


def q_sort_lightcurves(spark, sf_dir):
    """sortWithinPartitions under cohesion (same row set, SURVEY §2.6),
    PLUS the global-period path of fold_lightcurves: the driver compare
    sorts rows before hashing, so the sort alone hashes identically to
    ingest_source — the appended weekly fold phase makes this row carry
    its own value evidence. The oracle replays the exact Spark float
    expression ``((t/P) % 1 + 1) % 1`` term-for-term (DuckDB's mod on
    doubles is fmod) so the doubles agree bit-for-bit before rounding."""
    ens = _ensemble(spark, sf_dir)
    ens.sort_lightcurves(by_band=True)
    ens.fold_lightcurves(period=604800.0, t0=0.0, label="phase")
    src = ens.frames["source"]
    # Round 9 (checklist #32): the storage-contract diagnostics run for
    # real against the sorted table and their verdicts ride along as
    # literal columns; the oracle asserts the CONTRACT (both must be TRUE
    # after sort_lightcurves under ingest cohesion), so a regression in
    # either check flips the value hash.
    sorted_ok = ens.check_sorted()
    cohesive_ok = ens.check_lightcurve_cohesion()
    return (
        src.withColumn("phase", F.round("phase", 6))
        .withColumn("sorted_ok", F.lit(sorted_ok))
        .withColumn("cohesive_ok", F.lit(cohesive_ok))
    )


def q_save_load_roundtrip(spark, sf_dir):
    """insert_sources union-append, then save_ensemble → read_ensemble
    parquet+metadata roundtrip (SURVEY §2.1). insert_sources folded in
    here round 8 (its standalone row was one UNION ALL over the same
    projection); roundtripping the APPENDED table also makes this row's
    hash distinct from ingest_source's instead of a pure re-read. Round
    9: the load goes through the module-level ``read_ensemble`` wrapper
    (checklist #10), so the reader layer sits inside the oracle gate."""
    from tape_spark.readers import read_ensemble

    ens = _ensemble(spark, sf_dir)
    ens.insert_sources(
        obj_ids=[1, 2],
        bands=["Z", "Z"],
        timestamps=[0.0, 1.0],
        fluxes=[123.5, 456.5],
        flux_errs=[1.0, 2.0],
    )
    # fixed dirname: save_ensemble overwrites, so repeated gate runs reuse
    # one bounded directory instead of littering one copy per pid
    root = ens.save_ensemble(os.path.join(_REPO_DIR, ".tmp"), "ens_rt")
    src = read_ensemble(root, spark=spark).source

    # Bucketed-storage contract leg (checklist #30, folded in round 10):
    # the SAME appended table goes through save_bucketed → from_table,
    # and two hash-gated contract booleans ride every row — the oracle
    # asserts both TRUE, so a silent row drop/dup in the bucketed writer
    # or a reappearing exchange turns this row red on values:
    #   bucketed_match — order-insensitive xxhash64 checksum of the full
    #     bucketed table equals the parquet-roundtrip path's checksum;
    #   bucketed_no_exchange — a groupBy(id) aggregate over the
    #     from_table frame plans with ZERO Exchange nodes (the bucketed
    #     scan satisfies the id-hash distribution at rest).
    from tape_spark import ColumnMapper, Ensemble

    # a fresh session's in-memory catalog doesn't know about a previous
    # run's managed-table LOCATION, so overwrite alone can't reclaim it:
    # drop the entry if registered, then clear any stale directory
    spark.sql("DROP TABLE IF EXISTS ens_rt_bucketed")
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    shutil.rmtree(os.path.join(wh, "ens_rt_bucketed"), ignore_errors=True)
    ens.save_bucketed("ens_rt_bucketed", num_buckets=8)
    cm = ColumnMapper(
        id_col="l_orderkey",
        time_col="t",
        flux_col="l_extendedprice",
        err_col="l_quantity",
        band_col="l_returnflag",
    )
    bsrc = Ensemble(spark).from_table(
        "ens_rt_bucketed", column_mapper=cm
    ).source.select(*src.columns)

    def _checksum(frame):
        # decimal(38,0) sum: ±2^63-scale row hashes summed over any
        # realistic row count stay well inside 38 digits, where a plain
        # long sum overflows under ANSI
        row = frame.agg(
            F.sum(
                F.xxhash64(*[F.col(c) for c in src.columns]).cast("decimal(38,0)")
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return (row["h"], row["n"])

    match = _checksum(bsrc) == _checksum(src)
    agg_plan = (
        bsrc.groupBy("l_orderkey").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    no_exchange = "Exchange" not in agg_plan
    return src.withColumn("bucketed_match", F.lit(bool(match))).withColumn(
        "bucketed_no_exchange", F.lit(bool(no_exchange))
    )


def q_stetson_j(spark, sf_dir):
    """Full-table Stetson J as a driver-checked contract (the iterative
    robust mean itself isn't SQL-expressible; its values are pinned by the
    green ``stetson_j_golden`` row and golden pytest).

    Runs the kernel over BOTH physical paths — the whole-block vectorized
    ``process_block`` (default) and the per-group scalar path (forced via
    ``band_to_calc``, which makes ``process_block`` decline) — and emits,
    per band: ``n_curves`` (how many light curves have that band after
    prune(5), which the oracle recomputes exactly from lineitem) and
    ``agree_ok`` (every per-curve J matches across the two paths at 6 dp,
    NaN==NaN; the oracle asserts TRUE). A kernel regression in either path
    turns the row red on values, not just rows."""
    from tape_spark.analysis import calc_stetson_J

    ens = _ensemble(spark, sf_dir)
    ens.prune(threshold=5)
    block = (
        ens.batch(calc_stetson_J)
        .select("l_orderkey", F.explode("stetsonJ").alias("band", "j_block"))
    )
    scalar = (
        ens.batch(calc_stetson_J, band_to_calc=["A", "N", "R"])
        .select("l_orderkey", F.explode("stetsonJ").alias("band", "j_scalar"))
    )
    # scalar emits rows for bands absent from a curve; the block path emits
    # only present bands, so joining on the block keyset discards exactly
    # the absent-band rows. A <2-point band is NaN in both kernels, which
    # the pandas→Arrow map conversion surfaces as NULL — so NULL==NULL is
    # agreement, and Spark's NaN=NaN-is-true covers any literal NaNs.
    joined = block.join(scalar, ["l_orderkey", "band"], "left")
    same = (
        (F.col("j_block").isNull() & F.col("j_scalar").isNull())
        | (F.round("j_block", 6) == F.round("j_scalar", 6))
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_curves"),
            F.min(F.coalesce(same, F.lit(False))).alias("agree_ok"),
        )
    )


_GOLDEN_SOURCE = "/root/reference/tests/tape_tests/data/source/test_source.parquet"
_GOLDEN_OBJECT = "/root/reference/tests/tape_tests/data/object/test_object.parquet"


def q_stetson_j_golden(spark, sf_dir):
    """The flagship kernel pinned to the reference's golden constants as a
    driver-checked row: prune(10) → dropna → batch(StetsonJ) on the
    reference's 2000-row golden parquet must reproduce the published
    per-band values for the first object (reference
    ``test_ensemble.py:1934-1963``: g ≈ -0.04174282, r ≈ 0.6075282; this
    engine computes -0.041745 / 0.607527 at 6 dp, within the reference
    test's 1e-3 relative tolerance — the literal-VALUES oracle pins OUR
    exact values so any kernel drift turns the row red).

    Sources are sorted (id, time) first so per-group summation order — and
    hence the last-ulp float result — is partition-count-independent.
    Ignores ``sf_dir``: the input is the fixed golden fixture."""
    from tape_spark import ColumnMapper, Ensemble
    from tape_spark.analysis import calc_stetson_J

    src = pd.read_parquet(_GOLDEN_SOURCE).reset_index()
    obj = pd.read_parquet(_GOLDEN_OBJECT).reset_index()
    cm = ColumnMapper(
        id_col="ps1_objid",
        time_col="midPointTai",
        flux_col="psFlux",
        err_col="psFluxErr",
        band_col="filterName",
    )
    ens = Ensemble(spark).from_pandas(src, object_frame=obj, column_mapper=cm, npartitions=4)
    ens.prune(10)
    ens.dropna(table="source")
    ens.sort_lightcurves()
    result = ens.batch(calc_stetson_J)
    first = result.agg(F.min("ps1_objid").alias("ps1_objid"))
    return (
        result.join(first, "ps1_objid")
        .select(F.explode("stetsonJ").alias("band", "stetson_j"))
        .filter(F.col("band").isin("g", "r"))
        .select("band", F.round("stetson_j", 6).alias("stetson_j"))
    )


def q_sf2_basic(spark, sf_dir):
    """Structure function squared per curve with the ENGINE-DERIVED 'size'
    bins (the default config), value-hash-checked.

    The binning is SQL-replayable for this dataset because it degenerates:
    lineitem holds ≤ 7 rows per order (TPC-H property), so every (id,
    band) curve has ≤ 21 pairs ≤ bin_count_target=100 → ceil(pairs/100) =
    exactly ONE quantile bin spanning [min dt, max dt] — every pair lands
    in it (last-edge-inclusive convention), making the result the plain
    per-curve pair means the oracle computes. sf2 is emitted in millions
    and both floats rounded at 6 dp, as in ``sf2_fixed_bins``."""
    ens = _ensemble(spark, sf_dir)
    ens.prune(threshold=5)
    res = ens.sf2(sf_method="basic")
    return res.filter(F.col("sf2").isNotNull() & ~F.isnan("sf2")).select(
        "lc_id",
        "band",
        F.round("dt", 6).alias("dt"),
        F.round(F.col("sf2") / 1e6, 6).alias("sf2_m"),
    )


# --------------------------------------------------------------------- #
# data-pipeline extensions (documents / embeddings / events)             #
# --------------------------------------------------------------------- #


def q_lc_similarity(spark, sf_dir):
    """Light-curve similarity search contract: PAA embedding per curve
    through batch(), then the ``cosine_topk`` operator checked against an
    independent in-Spark replay (explicit zip_with dot product + window
    rank) over the same embeddings.

    The procedural PAA values aren't SQL-expressible (they're pinned by
    golden pytest), but the oracle independently recomputes what IS: the
    pruned query-id set (count(*) >= 5, lowest 3 ids) and the top-k
    cardinality. The overlap floor is 4/5 — both paths are exact, so only
    last-ulp float ties at the k boundary can differ."""
    from tape_spark.operators import cosine_topk
    from tape_spark.operators.lightcurve_sim import lightcurve_embeddings

    ens = _ensemble(spark, sf_dir)
    ens.prune(threshold=5)
    ids = [r[0] for r in ens.object.select("l_orderkey").orderBy("l_orderkey").limit(3).collect()]
    emb = lightcurve_embeddings(ens, num_bins=16).persist()
    queries_df = emb.filter(F.col("l_orderkey").isin(ids)).select(
        F.col("l_orderkey").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries_df, k=5, id_col="l_orderkey").select(
        "query_id", "corpus_id"
    )

    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    norm = lambda c: F.greatest(  # noqa: E731
        F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)),
        F.lit(1e-300),
    )
    replay = (
        emb.crossJoin(
            F.broadcast(
                queries_df.select(
                    "query_id", F.col("embedding").alias("qv"), norm(F.col("embedding")).alias("qn")
                )
            )
        )
        .select(
            "query_id",
            F.col("l_orderkey").alias("corpus_id"),
            (dot / (norm(F.col("embedding")) * F.col("qn"))).alias("cosine"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("corpus_id").asc()
                )
            ),
        )
        .filter(F.col("rank") <= 5)
        .select("query_id", "corpus_id")
    )
    n_topk = out.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_topk"))
    n_hit = (
        out.join(replay, ["query_id", "corpus_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    contract = (
        n_topk.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_topk",
            (F.coalesce(F.col("n_hit"), F.lit(0)) >= 4).alias("overlap_ok"),
        )
    )
    # materialize the 3-row contract so the cached embeddings can be
    # released before the driver moves on to the next query
    rows = contract.collect()
    emb.unpersist()
    return spark.createDataFrame(rows, contract.schema)


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: survivor id + duplicate count per distinct text.

    Runs the scale-default hash-keyed plan (groupBy on
    (xxhash64(text), length)); the oracle groups by full text — outputs
    are identical barring a 2⁻⁶⁴ collision, so the hash path itself is
    what gets oracle-checked."""
    from tape_spark.operators import exact_dedup

    return exact_dedup(_docs(spark, sf_dir), by_hash=True)


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-bigram Jaccard pairs via inverted-index join."""
    from tape_spark.operators import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_docs(spark, sf_dir), n=2, threshold=0.2)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clusters with canonical selection: Jaccard pairs →
    large-star/small-star connected components → (doc_id, component,
    cluster_size, is_canonical), where the canonical member is the one
    resolve_duplicates keeps (highest n_chars, ties → smallest id). The
    oracle replays the pairs, resolves components with a recursive
    transitive-closure CTE — tractable at sf0.01 scale, exact — and
    re-ranks the survivors with the same window.

    Round 10 folds in leakage_safe_split (the group-cohesive train/eval
    guard): every cluster member draws the SAME md5-boundary split from
    its component id, so near-duplicates can never straddle train/val -
    the oracle replays the draw and the boundaries (0.75 / 0.875: exact
    binary fractions, so the two engines compare identical doubles)."""
    from tape_spark.operators import (
        dedup_clusters,
        leakage_safe_split,
        resolve_duplicates,
    )

    docs = _docs(spark, sf_dir)
    clusters = dedup_clusters(docs, n=2, threshold=0.2)
    kept = resolve_duplicates(docs, clusters, quality_col="n_chars").select(
        "doc_id", F.lit(True).alias("is_canonical")
    )
    out = clusters.join(kept, "doc_id", "left").select(
        "doc_id",
        "component",
        "cluster_size",
        F.coalesce("is_canonical", F.lit(False)).alias("is_canonical"),
    )
    return leakage_safe_split(
        out, {"train": 0.75, "val": 0.125, "test": 0.125}, group_col="component"
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup recall contract vs the exact bigram-Jaccard
    pair set (the MinHash hashes are engine-specific, so the pair list
    itself is not SQL-replayable; its semantic contract is).

    Exact side: word-bigram Jaccard ≥ 0.7 — at 16 bands × 4 rows the
    per-pair candidate probability is 1−(1−0.7⁴)¹⁶ ≈ 0.988, and the
    64-hash est_jaccard ≥ 0.3 verify keeps essentially all of them
    (measured recall 1.0 at sf0.001 and sf0.01), so the 0.8 floor has
    wide margin. The oracle recomputes n_exact independently in SQL.

    Round 13 folds the PERSISTED near-dup store verbs
    (``tape_spark.streaming``: ``minhash_save_store`` /
    ``minhash_match_batch``) into the same oracle gate: the corpus
    signatures are saved as a partition-pruned store in a temp dir,
    arrivals (every 31st doc, id+10⁷, text + ' tailword') are matched
    against it, and the row carries (a) ``n_store_exact`` — the exact
    arrival↔corpus bigram-Jaccard ≥ 0.7 pair count, replayed
    independently by the DuckDB oracle over the same derived arrivals;
    (b) ``store_recall_ok`` — the store match found ≥ 0.8 of them;
    (c) ``store_equals_scan`` — the store match row set is IDENTICAL to
    ``stream_minhash_matches`` against the full signature frame (the
    transitive link the r12 verdict asked to make direct); and (d)
    ``store_plan_pruned`` — the executed plan's store reads carry the
    ``pbucket``/``sbucket`` partition IN-filters (plan-asserted, the
    scale contract). Computed eagerly so the candidate cache releases
    and the temp store has no live readers after return."""
    import tempfile

    from tape_spark.operators import (
        minhash_near_duplicates,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from tape_spark.streaming import (
        minhash_match_batch,
        minhash_save_store,
        stream_minhash_matches,
    )

    docs = _docs(spark, sf_dir)
    lsh = minhash_near_duplicates(
        docs, num_hashes=64, bands=16, threshold=0.3
    ).select("id_a", "id_b")
    exact = ngram_jaccard_pairs(docs, n=2, threshold=0.7).select("id_a", "id_b")
    n_exact = int(exact.count())
    n_hit = int(exact.join(lsh, ["id_a", "id_b"], "left_semi").count())
    recall_ok = n_exact == 0 or n_hit / n_exact >= 0.8

    # --- persisted store leg ---
    arr = docs.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat("text", F.lit(" tailword")).alias("text"),
    )
    import re
    import shutil

    sigs = minhash_signatures(docs, num_hashes=64, shingle_n=2)
    store_dir = tempfile.mkdtemp(prefix="tape_nd_store_")
    caches = []
    try:
        minhash_save_store(sigs, store_dir, bands=16,
                           num_entry_buckets=8, num_sig_buckets=4)
        matches = minhash_match_batch(
            arr, store_dir, threshold=0.3, _cleanup=caches
        )
        plan = matches._jdf.queryExecution().executedPlan().toString()
        # Assert ACTUAL partition pruning, not column presence: each
        # bucket column must appear inside a non-empty PartitionFilters
        # clause of a scan node (post-scan Filter nodes don't count).
        part_filters = re.findall(r"PartitionFilters: \[([^\]]+)\]", plan)
        store_plan_pruned = any(
            "pbucket" in pf for pf in part_filters
        ) and any("sbucket" in pf for pf in part_filters)
        scan = stream_minhash_matches(arr, sigs, threshold=0.3)
        sym_diff = int(
            matches.join(scan, ["doc_id", "corpus_id"], "left_anti").count()
        ) + int(scan.join(matches, ["doc_id", "corpus_id"], "left_anti").count())
        store_equals_scan = sym_diff == 0
        # exact arrival↔corpus pairs via one self-join over the union: the
        # id offset makes (corpus, arrival) pairs exactly the id_a<10⁷≤id_b rows
        uni = docs.select("doc_id", "text").unionByName(arr)
        cross_exact = ngram_jaccard_pairs(uni, n=2, threshold=0.7).filter(
            (F.col("id_a") < 10_000_000) & (F.col("id_b") >= 10_000_000)
        )
        n_store_exact = int(cross_exact.count())
        n_store_hit = int(
            cross_exact.join(
                matches.select(
                    F.col("corpus_id").alias("id_a"), F.col("doc_id").alias("id_b")
                ),
                ["id_a", "id_b"],
                "left_semi",
            ).count()
        )
        store_recall_ok = n_store_exact == 0 or n_store_hit / n_store_exact >= 0.8
    finally:
        for c in caches:
            c.unpersist()
        # all results above are Python scalars; the store has no live
        # readers past this point, so the temp dir is safe to drop
        shutil.rmtree(store_dir, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                n_exact,
                bool(recall_ok),
                n_store_exact,
                bool(store_recall_ok),
                bool(store_equals_scan),
                bool(store_plan_pruned),
            )
        ],
        "n_exact long, recall_ok boolean, n_store_exact long, "
        "store_recall_ok boolean, store_equals_scan boolean, "
        "store_plan_pruned boolean",
    )


def q_dedup_simhash(spark, sf_dir):
    """SimHash signatures with the md5-derived 60-bit token hash — both
    engines can compute md5, so the full bit-vote is replayed in SQL and
    the signature column is value-hash-checked (the xxhash64 default stays
    the scale path; the vote kernel is identical)."""
    from tape_spark.operators import simhash_signatures

    return simhash_signatures(_docs(spark, sf_dir), bits=32, token_hash="md5_60")


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: per-document count of distinct word
    3-grams shared with an eval set (every 23rd document stands in as the
    benchmark; the rest are the training corpus). Runs the hashed scale
    path — xxhash64 8-byte keys — through ``method='bloom'`` (round 9):
    the benchmark set is compressed to a Bloom bitmap built by one
    distributed bit_or aggregate, executors prefilter n-grams against it
    Arrow-side, and only the ~1% surviving candidates reach the exact
    confirm join. The result is EXACT by construction (confirm join
    removes every false positive), so the unchanged string-n-gram oracle
    doubles as the proof: bitmap + confirm == plain broadcast join.

    Round 9 also attaches the surgical variant: ``split_contaminated``
    (the GPT-3 appendix-C recipe — remove a radius-1 token window around
    every collision and keep the surviving pieces instead of dropping
    the document). The oracle replays the positional hit set, the window
    cover, and the piece rebuild token-for-token; ``pieces_sha`` hashes
    the newline-joined pieces."""
    from tape_spark.operators import decontaminate, split_contaminated

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    train = docs.filter(F.col("doc_id") % 23 != 0)
    out = decontaminate(train, bench, n=3, method="bloom")
    pieces = split_contaminated(train, bench, n=3, radius=1).select(
        "doc_id",
        "n_removed_tokens",
        "n_pieces",
        F.sha2(F.array_join("pieces", "\n"), 256).alias("pieces_sha"),
    )
    return out.select(
        "doc_id",
        "n_ngrams",
        "n_contaminated",
        F.round("contamination", 6).alias("contamination"),
        "is_contaminated",
    ).join(pieces, "doc_id")


def q_stratified_sample(spark, sf_dir):
    """Deterministic corpus sampling, five modes: the Bernoulli
    per-language rate draw (stratified_sample), the exact-k smallest-hash
    draw (stratified_sample_exact, the skew-safe two-pass plan), the
    mixture draw (corpus_mix), the epoch-shuffle rank (shuffle_corpus),
    and the quality-weighted draw (weighted_sample, keep probability
    min(1, rate·weight)). Every kept set is a pure function of the ids
    present — the top 52 md5 bits of the doc id — so the oracle replays
    each row-exactly (the exact mode via a window row_number over the
    same draw)."""
    from tape_spark.operators import (
        corpus_mix,
        shuffle_corpus,
        stratified_sample,
        stratified_sample_exact,
    )

    docs = _docs(spark, sf_dir)
    nopos = F.lit(None).cast("long").alias("pos")
    bern = stratified_sample(
        docs,
        "lang",
        {"en": 0.6, "de": 0.35, "fr": 0.2, "es": 0.5},
        id_col="doc_id",
    ).select("doc_id", "lang", "source", F.lit("bernoulli").alias("mode"), nopos)
    exact = stratified_sample_exact(
        docs, "lang", {"en": 30, "zh": 10}, id_col="doc_id"
    ).select("doc_id", "lang", "source", F.lit("exact_k").alias("mode"), nopos)
    # mixture mode: rates are data-dependent (per-stratum counts), but the
    # sizing arithmetic is plain SQL, so the oracle recomputes the exact
    # rates AND the exact kept set
    mixed = corpus_mix(
        docs, "lang", {"en": 2.0, "de": 1.0}, total_rows=120, id_col="doc_id"
    ).select("doc_id", "lang", "source", F.lit("mix").alias("mode"), nopos)
    # shuffle mode: the deterministic global order, verified by emitting
    # each zh document's position in the shuffled corpus — a pure function
    # of the same md5 draw, so the oracle replays every rank row-exactly
    from pyspark.sql import Window
    from tape_spark.utils.hashing import md5_unit

    shuffled = shuffle_corpus(docs, id_col="doc_id")
    w = Window.orderBy(md5_unit(F.col("doc_id")), F.col("doc_id"))
    shuf = (
        shuffled.withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("lang") == "zh")
        .select("doc_id", "lang", "source", F.lit("shuffle_rank").alias("mode"), "pos")
    )
    # weighted mode: per-doc keep probability min(1, rate * weight) with a
    # data-derived quality weight (n_chars/1000); same md5 draw, so the
    # oracle replays the kept set exactly
    from tape_spark.operators import weighted_sample

    weighted = weighted_sample(
        docs.withColumn("w", F.col("n_chars") / F.lit(1000.0)),
        "w",
        rate=0.3,
        id_col="doc_id",
    ).select("doc_id", "lang", "source", F.lit("weighted").alias("mode"), nopos)
    # temperature mode (round 9): weights = n_lang**0.5 as integer 1e-9
    # units (order-safe normalizing sum), then the same mixture sizing
    # and md5 draw — the published low-resource upweighting rule, with
    # the data-dependent rates recomputed exactly by the oracle
    from tape_spark.operators import temperature_weights

    temp = corpus_mix(
        docs,
        "lang",
        temperature_weights(docs, "lang", alpha=0.5),
        total_rows=150,
        id_col="doc_id",
    ).select("doc_id", "lang", "source", F.lit("temperature").alias("mode"), nopos)
    # dsir mode (round 9): hashed-n-gram importance resampling (DSIR,
    # arXiv:2302.03169) — target = every 11th doc, raw = the rest; the
    # oracle rebuilds the ENTIRE pipeline in SQL (md5 gram buckets,
    # smoothed count models, integer-quantized log-ratios, the exact
    # integer per-doc sums, and the Gumbel top-k draw) and replays the
    # selected set and ranks row-exactly
    from tape_spark.operators import dsir_select

    dsir = dsir_select(
        docs.filter((F.col("doc_id") % 11) != 0),
        docs.filter((F.col("doc_id") % 11) == 0),
        k=40,
        num_buckets=2048,
        smoothing=0.1,
    ).select(
        "doc_id", "lang", "source", F.lit("dsir").alias("mode"),
        F.col("rank").alias("pos"),
    )
    return (
        bern.unionByName(exact)
        .unionByName(mixed)
        .unionByName(shuf)
        .unionByName(weighted)
        .unionByName(temp)
        .unionByName(dsir)
    )


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for 5 query vectors, with the k-NN
    majority-vote prediction (``knn_classify``, round 9) attached per
    query: leave-one-out over the corpus's own ``label`` column, vote
    ties broken on the smaller label — the oracle recomputes the full
    neighbor ranking AND the vote in SQL, so a wrong neighbor set, a
    wrong vote count, or a wrong tie-break all flip the hash."""
    from tape_spark.operators import cosine_topk, knn_classify

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tk = cosine_topk(emb, queries_df, k=10)
    pred = knn_classify(emb, queries_df, k=10, exclude_self=True).select(
        "query_id",
        F.col("pred_label").cast("long").alias("pred_label"),
        F.col("votes").cast("long").alias("pred_votes"),
    )
    return tk.join(pred, "query_id").select(
        "query_id", "corpus_id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"), "pred_label", "pred_votes",
    )


def _ann_recall(spark, sf_dir, approx_fn, floor: float, extras=()) -> DataFrame:
    """Exact brute-force top-k rows joined with the approximate index's
    per-query recall contract.

    The approximate neighbor lists are seed/engine-specific, but the
    semantic contract — recall ≥ a documented floor — is deterministic
    (both algorithms are fully seeded) for a given corpus. Rather than
    emitting only the contract booleans (which would leave the oracle a
    tautology), the row carries the full exact top-k (query_id,
    corpus_id, cosine, rank — all recomputed independently by the DuckDB
    oracle and value-hash-checked) with ``recall_ok`` attached per query:
    a recall regression flips booleans on otherwise-hash-identical rows.
    The floors hold with measured margin at the tested SFs (min per-query
    recall at sf0.001/sf0.01: LSH 0.6/0.5 vs floor 0.4, IVF 0.8/0.7 vs
    floor 0.6 with the parameters used below); recall is data-dependent,
    so at much larger SF scale num_tables/nprobe with corpus size rather
    than trusting the floor to transfer."""
    from tape_spark.operators import cosine_topk

    k = 10
    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = approx_fn(emb, queries_df, k)
    brute = cosine_topk(emb, queries_df, k=k)
    hits = approx.select("query_id", "corpus_id").join(
        brute.select("query_id", "corpus_id"), ["query_id", "corpus_id"]
    )
    per_q = (
        brute.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k_eff"))
        .join(hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")), "query_id", "left")
    )
    recall = per_q.select(
        "query_id",
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("k_eff") >= floor).alias("recall_ok"),
    )
    out = brute.select(
        "query_id",
        "corpus_id",
        F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    ).join(recall, "query_id")
    # extras: additional (col_name, approx_fn, floor) contracts sharing the
    # same brute reference — each adds one boolean column per query
    for col_name, fn, fl in extras:
        ahits = fn(emb, queries_df, k).select("query_id", "corpus_id").join(
            brute.select("query_id", "corpus_id"), ["query_id", "corpus_id"]
        )
        aq = (
            brute.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("k_eff"))
            .join(
                ahits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
                "query_id",
                "left",
            )
            .select(
                "query_id",
                (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("k_eff") >= fl).alias(
                    col_name
                ),
            )
        )
        out = out.join(aq, "query_id")
    return out


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k, checked by its recall contract
    against exact brute force (neighbor lists are seed-specific; the
    recall floor is the deterministic property at the tested SFs — see
    ``_ann_recall`` for the measured margins)."""
    from tape_spark.operators import lsh_cosine_topk

    return _ann_recall(
        spark,
        sf_dir,
        lambda c, q, k: lsh_cosine_topk(c, q, k=k, num_planes=4, num_tables=8),
        floor=0.4,
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k, checked by its recall contract against exact
    brute force. The k-means training sample is drawn by
    ``orderBy(xxhash64(id))`` so the index — and hence the recall — is
    fully deterministic.

    Round 9 attaches the memory-compressed ANN path as a second contract
    column: ``pq_cosine_topk`` (product quantization — byte codes + ADC
    scan + exact rerank of the 8k shortlist, ``operators/quantization.py``)
    must recover ≥ 0.7 of the exact top-10 per query (measured min at
    sf0.001/sf0.01: 0.9/1.0 with m=8, 128 centroids, rerank 8). Both
    indexes are fully seeded, so the booleans are deterministic; a recall
    regression flips them on otherwise-hash-identical rows.

    ``cb_ok`` (round 9) gates ``cluster_balanced_sample``: the
    equal-quota md5-smallest draw over the embedding clusters is replayed
    INDEPENDENTLY in-Spark (a per-cluster row_number window over the
    ``cluster_assign`` output, quotas recomputed from scratch) and must
    equal the operator's selected set exactly."""
    from pyspark.sql import Window

    from tape_spark.operators import (
        cluster_assign,
        cluster_balanced_sample,
        ivf_cosine_topk,
        ivfpq_cosine_topk,
        pq_cosine_topk,
        train_spherical_kmeans,
    )
    from tape_spark.utils.hashing import md5_unit

    emb = _emb(spark, sf_dir)
    books = train_spherical_kmeans(emb, num_clusters=8)
    sel = cluster_balanced_sample(emb, k=32, centroids=books).select("vec_id")
    assigned = cluster_assign(emb, books).filter(F.col("cluster") >= 0)
    present = sorted(
        r[0] for r in assigned.select("cluster").distinct().collect()
    )
    bq, rem = divmod(32, len(present))
    quotas = {c: bq + (1 if i < rem else 0) for i, c in enumerate(present)}
    qmap = F.create_map(*[F.lit(x) for kv in quotas.items() for x in kv])
    w_cb = Window.partitionBy("cluster").orderBy(
        md5_unit(F.col("vec_id"), ""), F.col("vec_id")
    )
    replay = (
        assigned.withColumn("__r", F.row_number().over(w_cb))
        .filter(F.col("__r") <= qmap[F.col("cluster")])
        .select("vec_id")
    )
    n_sel = sel.count()
    cb_ok = bool(
        n_sel > 0
        and n_sel == replay.count()
        and n_sel == sel.join(replay, "vec_id").count()
    )

    return _ann_recall(
        spark,
        sf_dir,
        lambda c, q, k: ivf_cosine_topk(c, q, k=k, num_clusters=16, nprobe=8),
        floor=0.6,
        extras=[
            (
                "pq_recall_ok",
                lambda c, q, k: pq_cosine_topk(
                    c, q, k=k, m=8, num_centroids=128, rerank_factor=8
                ),
                0.7,
            ),
            # the IVF+PQ composition (FAISS IVFADC shape): coarse probe
            # prunes the scan, byte codes score it, exact rerank fixes
            # the order; measured min per-query recall 0.8/0.7 at
            # sf0.001/sf0.01 with these parameters — floor 0.5
            (
                "ivfpq_recall_ok",
                lambda c, q, k: ivfpq_cosine_topk(
                    c, q, k=k, num_clusters=16, nprobe=8,
                    m=8, num_centroids=128, rerank_factor=8,
                ),
                0.5,
            ),
        ],
    ).withColumn("cb_ok", F.lit(cb_ok))


def q_text_signals(spark, sf_dir):
    """One-pass text signal extraction: language ID, length/token/punct
    quality features, stopword ratio, repetition ratio, and the BPE-ish
    token count — fused into a single narrow projection
    (tape_spark.operators.text_signals) — joined with per-document PII
    detection counts. The synthetic corpus carries no PII, so the query
    deterministically plants an email + phone + IPv4 on every 11th
    document (the oracle replays the augmentation), making the detection
    check non-trivial; ``n_pii_after_redact`` asserts in-Spark that
    ``redact_pii`` with the same patterns removes every detected match.
    The à-la-carte operators (language_id, text_quality, stopword_ratio,
    repetition_ratio, token_count) compute identical expressions and stay
    pytest-covered.

    Round 8 adds the CCNet-style LM quality signal: a Stupid-Backoff
    bigram LM (tape_spark.operators.langmodel) is trained driver-side on
    the deterministic md5-addressed corpus sample and every document is
    perplexity-scored through the Arrow map. The oracle REBUILDS the
    same model in SQL — same sample draw, same ≥3-count vocabulary, same
    <unk>+1 smoothing — and replays each document's log-prob sum
    term-for-term, so ``ppl`` is value-hash-checked, not a contract
    boolean."""
    from tape_spark.operators import (
        detect_pii,
        normalize_text,
        perplexity_score,
        redact_pii,
        text_signals,
        train_bigram_lm,
    )

    docs = _docs(spark, sf_dir)
    s = text_signals(docs)
    lm = train_bigram_lm(docs, sample_fraction=0.3, max_docs=400, min_count=3)
    ppl = perplexity_score(docs, lm)
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" contact"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com call +1202555"),
                (F.col("doc_id") % 10000).cast("string"),
                F.lit(" ip 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1"),
            ),
        ).otherwise(F.col("text")),
    )
    pii = detect_pii(aug)
    clean = detect_pii(redact_pii(aug)).select(
        "doc_id", F.col("n_pii").alias("n_pii_after_redact")
    )
    norm = normalize_text(
        docs, output_col="__norm", form="NFC", lowercase=True
    ).select("doc_id", F.sha2("__norm", 256).alias("norm_sha"))
    return (
        s.join(pii, "doc_id")
        .join(clean, "doc_id")
        .join(ppl, "doc_id")
        .join(norm, "doc_id")
        .select(
            "doc_id",
            "pred_lang",
            "n_chars",
            "n_tokens",
            F.round("avg_token_len", 6).alias("avg_token_len"),
            F.round("punct_ratio", 6).alias("punct_ratio"),
            F.round("stop_ratio", 6).alias("stop_ratio"),
            F.round("rep_ratio", 6).alias("rep_ratio"),
            "n_bpe_tokens",
            "n_email",
            "n_phone",
            "n_ssn",
            "n_ipv4",
            "n_pii",
            "n_pii_after_redact",
            "n_lm_tokens",
            F.round("ppl", 6).alias("ppl"),
            "norm_sha",
        )
    )


def q_doc_fingerprint(spark, sf_dir):
    """Normalized-content SHA-256 fingerprint PLUS the cross-corpus
    repeated-span duplication profile (tape_spark.operators
    .repeated_span_stats, 16-token windows at stride 4): per doc, how
    many rolling spans exist and how many recur in ≥2 distinct docs —
    the exact-substring dedup signal. The oracle rebuilds the span
    census on the span *strings* (Spark ships 8-byte xxhash64
    fingerprints; counts agree barring a 2⁻⁶⁴ collision, the same
    hashed-vs-string contract as dedup_exact).

    Round 11 adds the content-defined-chunking profile
    (tape_spark.operators.chunk_documents_cdc, target 16 / cap 64):
    per doc, the chunk count, the largest chunk, and a sha over the
    ordered chunk texts — the sha pins EVERY md5-drawn boundary and
    every forced cap split, and the oracle recomputes the whole cut
    with DuckDB list comprehensions over the same md5 convention."""
    from tape_spark.operators import (
        chunk_documents_cdc,
        document_fingerprint,
        remove_repeated_spans,
        repeated_span_stats,
    )

    docs = _docs(spark, sf_dir)
    fp = document_fingerprint(docs).select("doc_id", "content_sha")
    stats = repeated_span_stats(docs, span_tokens=16, stride=4, min_docs=2)
    # round 9: the removal half of the exact-substring pipeline — delete
    # every occurrence but the first (keeper = globally smallest
    # (id, token_start)) and rebuild the pieces; the oracle replays the
    # keeper choice, the window cover, the piece rebuild, and the
    # pieces' sha token-for-token
    esd = remove_repeated_spans(
        docs, span_tokens=16, stride=4, min_docs=2
    ).select(
        "doc_id",
        F.col("n_removed_tokens").alias("esd_removed"),
        F.col("n_spans_removed").alias("esd_spans_removed"),
        F.col("n_pieces").alias("esd_pieces"),
        F.sha2(F.concat_ws("\n", "pieces"), 256).alias("esd_sha"),
    )
    cdc = (
        chunk_documents_cdc(docs, target_tokens=16, max_tokens=64)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("cdc_chunks"),
            F.max("n_chunk_tokens").alias("cdc_max_tokens"),
            F.sha2(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_index", "chunk"))
                        ),
                        lambda s: s["chunk"],
                    ),
                    "\n",
                ),
                256,
            ).alias("cdc_sha"),
        )
    )
    return fp.join(stats, "doc_id").join(esd, "doc_id").join(
        cdc, "doc_id", "left"
    ).select(
        "doc_id",
        "content_sha",
        "n_spans",
        "n_repeated_spans",
        F.round("dup_span_ratio", 6).alias("dup_span_ratio"),
        "esd_removed",
        "esd_spans_removed",
        "esd_pieces",
        "esd_sha",
        F.coalesce(F.col("cdc_chunks"), F.lit(0)).cast("long").alias("cdc_chunks"),
        F.coalesce(F.col("cdc_max_tokens"), F.lit(0)).cast("long").alias("cdc_max_tokens"),
        F.coalesce(F.col("cdc_sha"), F.sha2(F.lit(""), 256)).alias("cdc_sha"),
    )


def q_chunk_documents(spark, sf_dir):
    """Token-window chunking with overlap (chunk_tokens=16, overlap=4 →
    stride 12) composed with concat-and-cut sequence packing
    (budget=64, 8 md5 buckets): every token lands in ≥1 chunk,
    deterministic sha2 chunk ids, and every chunk gains its packed
    stream position. Both stages are pure built-in expressions, so the
    whole output — window geometry, token counts, reassembled chunk
    text, chunk ids, bucket assignment, stream offsets, sequence ids,
    boundary flags — is value-hash-checked against a DuckDB
    list-slicing + window-cumsum replay.

    Round 7 adds the token LEDGER: tokenize_chunks runs over every chunk
    and its n_input_ids is value-checked against an independent DuckDB
    re-tokenization of the chunk TEXT (counts are engine-agnostic even
    though the crc32 stand-in ids are not), and each row carries
    seq_tokens — how many tokens its sequence holds — whose oracle replay
    proves packing is budget-exact: every sequence is exactly `budget`
    full except at most the last of each bucket stream (seq_is_full).

    Round 8 adds a REAL subword tokenizer behind the same hook
    (tape_spark.utils.bpe — the public Sennrich BPE algorithm, trained
    driver-side on a deterministic content-addressed corpus sample):
    every chunk is BPE-encoded through tokenize_chunks and the per-row
    ``bpe_ok`` contract verifies, Spark-side per chunk, that (a)
    decode(encode(chunk)) reproduces the chunk exactly (up to the
    tokenizer's documented <unk> substitution for characters outside
    the training sample), and (b) the subword count is bounded by
    [words, chars+words] — the oracle expects TRUE on every row, so a
    single broken merge application or miscounted subword fails the
    hash."""
    from pyspark.sql import Window as W

    from tape_spark.operators.text import chunk_documents, pack_sequences, tokenize_chunks
    from tape_spark.utils.bpe import train_bpe_from_corpus

    docs = _docs(spark, sf_dir)
    out = chunk_documents(
        docs, text_col="text", id_col="doc_id", chunk_tokens=16, overlap_tokens=4
    )
    bpe = train_bpe_from_corpus(
        docs, num_merges=200, sample_fraction=0.1, max_docs=300
    )
    bpe_ids = tokenize_chunks(out, tokenizer=bpe, text_col="chunk", id_col="chunk_id")
    known = set(bpe.base_chars)

    @F.pandas_udf("boolean")
    def _bpe_ok(chunk: pd.Series, n: pd.Series) -> pd.Series:
        def check(s, n_ids):
            s = s or ""
            ids = bpe.encode(s)
            if len(ids) != n_ids:  # the tokenize_chunks ledger must agree
                return False
            words = s.split()
            expected = " ".join(
                "".join(c if c in known else "<unk>" for c in w) for w in words
            )
            if bpe.decode(ids) != expected:
                return False
            lo = len(words)
            hi = sum(len(w) + 1 for w in words)
            return (lo <= len(ids) <= hi) if words else len(ids) == 0

        return pd.Series(
            [check(s, n_ids) for s, n_ids in zip(chunk, n)], dtype=bool
        )

    tok = tokenize_chunks(out, text_col="chunk", id_col="chunk_id").select(
        "chunk_id", "n_input_ids"
    )
    bpe_check = bpe_ids.join(
        out.select("chunk_id", "chunk"), "chunk_id"
    ).select(
        "chunk_id", _bpe_ok(F.col("chunk"), F.col("n_input_ids")).alias("bpe_ok")
    )
    tok = tok.join(bpe_check, "chunk_id")
    packed = pack_sequences(out, budget=64, num_buckets=8).join(tok, "chunk_id")
    bucket_total = F.max(F.col("start_offset") + F.col("n_chunk_tokens")).over(
        W.partitionBy("bucket")
    )
    seq_tokens = F.least(
        F.lit(64).cast("long"), bucket_total - F.col("seq_index") * F.lit(64)
    ).cast("long")
    return packed.select(
        "doc_id",
        F.col("chunk_index").cast("long").alias("chunk_index"),
        "n_chunk_tokens",
        "chunk",
        "chunk_id",
        "bucket",
        "start_offset",
        "seq_index",
        "seq_id",
        "offset_in_seq",
        "crosses_boundary",
        "n_input_ids",
        seq_tokens.alias("seq_tokens"),
        (seq_tokens == F.lit(64)).alias("seq_is_full"),
        "bpe_ok",
    )


def q_multimodal_pipeline(spark, sf_dir):
    """The full media chain — payload packaging (byte length + checksum
    metadata), decode (width/height/channels), resize (geometry + bounded
    payload size), embedding (first component) — each an Arrow-batched
    mapInPandas over the same payloads, joined on media_id for one
    hash-checked row per document.

    The stub kernels are pure byte arithmetic, which DuckDB replays via
    hex() byte extraction — so all plumbing paths are value-hash-checked.
    (The 3-way join re-reads the 500-row payload table per branch; this is
    a verification query, production chains pipe one branch.)"""
    from tape_spark.operators.multimodal import (
        attach_binary_payload,
        decode_media,
        media_embedding,
        resize_media,
    )

    media = attach_binary_payload(_docs(spark, sf_dir), "text", "doc_id", "text/plain")
    meta = media.select("media_id", "media_type", "n_bytes", "checksum")
    d = decode_media(media, decoder="fake").select("media_id", "width", "height", "channels")
    r = resize_media(media, width=16, height=8).select(
        "media_id",
        F.col("width").alias("rs_width"),
        F.col("height").alias("rs_height"),
        F.length("payload").alias("rs_bytes"),
    )
    e = media_embedding(media, dim=16).select(
        "media_id", F.round(F.element_at("embedding", 1), 6).alias("e0")
    )
    return meta.join(d, "media_id").join(r, "media_id").join(e, "media_id")


def q_sf2_fixed_bins(spark, sf_dir):
    """Per-curve SF² (basic estimator) with explicit bin edges — the one
    SF configuration whose full pairwise-difference + binned-mean pipeline
    is replayable in SQL (self-join on (id, band) with t2 > t1, CASE
    bucketing), so the flagship kernel gets a value-hash check. Empty bins
    (NaN) are dropped on both sides."""
    from tape_spark.analysis import StructureFunctionArgumentContainer

    ens = _ensemble(spark, sf_dir)
    container = StructureFunctionArgumentContainer()
    container.sf_method = "basic"
    container.bins = [0.0, 1e7, 5e7, 1e8, 2e8, 3e8]
    res = ens.sf2(argument_container=container)
    # empty bins surface as NULL (Arrow maps the kernel's NaN to null) —
    # and isnan(NULL) is false, so both predicates are needed. sf2 is
    # emitted in millions: raw values are ~1e9-1e11, where rounding to 6
    # decimals would demand more significant digits than double arithmetic
    # guarantees across different summation orders.
    return res.filter(F.col("sf2").isNotNull() & ~F.isnan("sf2")).select(
        "lc_id",
        "band",
        F.round("dt", 6).alias("dt"),
        F.round(F.col("sf2") / 1e6, 6).alias("sf2_m"),
    )


def q_sf2_combine_fixed_bins(spark, sf_dir):
    """Combine-mode SF² with explicit bins: all curves' differences binned
    together per band — a pure global aggregation (no quantile stage), so
    the distributed combine plan itself gets a value-hash check. Same
    magnitude scaling as sf2_fixed_bins."""
    from tape_spark.analysis import StructureFunctionArgumentContainer

    ens = _ensemble(spark, sf_dir)
    container = StructureFunctionArgumentContainer()
    container.sf_method = "basic"
    container.bins = [0.0, 1e7, 5e7, 1e8, 2e8, 3e8]
    container.combine = True
    res = ens.sf2(argument_container=container, combine=True)
    return res.select(
        "lc_id",
        "band",
        F.round("dt", 6).alias("dt"),
        F.round(F.col("sf2") / 1e6, 6).alias("sf2_m"),
    )


def q_timeseries_extract(spark, sf_dir):
    """to_timeseries: one object's light curve materialized locally (filter
    pushes to the scan), then re-exposed as rows for the oracle compare.
    Round 9: the fixture is ingested via ``from_source_dict`` (the r8
    verdict's last unoracled ingestion wrapper, checklist #4) — the
    object-1 rows are pulled as equal-length column arrays and re-enter
    through the dict path, so this row now gates dict ingest AND the
    TimeSeries extraction end-to-end against the same SQL."""
    from tape_spark import Ensemble

    full = _ensemble(spark, sf_dir)
    one = (
        full.source.filter(F.col("l_orderkey") == 1)
        .select("l_orderkey", "t", "l_extendedprice", "l_quantity", "l_returnflag")
        .toPandas()
    )
    ens = Ensemble(spark).from_source_dict(
        {c: one[c].to_numpy() for c in one.columns},
        column_mapper=full.column_mapper,
        npartitions=2,
    )
    ts = ens.to_timeseries(1)
    pdf = pd.DataFrame(
        {
            "band": ts.band.to_numpy(),
            "t": np.round(ts.time.to_numpy().astype(float), 6),
            "flux": np.round(ts.flux.to_numpy().astype(float), 6),
            "err": np.round(ts.flux_err.to_numpy().astype(float), 6),
        }
    )
    return spark.createDataFrame(pdf)


def q_sample_objects(spark, sf_dir):
    """Deterministic content-addressed object sample propagated to sources
    via sync. ``method='hash'`` maps md5(id) to [0,1) — reproducible
    across runs AND engines, so the sample is value-hash-checked (the
    seeded-RNG mode the reference uses stays available and
    pytest-checked)."""
    ens = _ensemble(spark, sf_dir)
    sampled = ens.sample(frac=0.3, method="hash")
    return sampled.source.select("l_orderkey", "t", "l_extendedprice")


def q_align_bands(spark, sf_dir):
    """Ensemble.align_bands color-curve construction: every band-A
    observation paired with the most recent band-R observation of the
    same object within 30 days (an as-of join per light curve), replayed
    by the oracle with DuckDB's NATIVE ASOF LEFT JOIN — independent
    semantics, like events_sessionize. Output keeps only the left
    payload plus the matched timestamp and dt: lineitem can hold several
    band-R rows at the same (id, t) whose PAYLOAD choice under ties is
    engine-specific, but the matched timestamp itself is tie-invariant,
    so the compare stays exact without weakening the join.

    Round 9 unions in the grid-resampling part (``part='rs'``):
    ``resample_timeseries`` puts the band-R curves of every 97th object
    onto a 30-day uniform grid with linear interpolation (simultaneous
    observations collapse to MIN — the order-free convention), and the
    oracle replays the whole chain — span, integer grid, BOTH as-of
    directions (DuckDB native ASOF again), and the interpolation
    expression in the same IEEE association order. The interpolated
    value quantizes via floor(x*1e6+0.5)/1e6 on BOTH sides — interpolating
    2-decimal prices lands exactly on .xxxxxx5 boundaries where Spark's
    HALF_UP round and DuckDB's banker's-rounding round() disagree (found
    by a real 1-ULP mismatch at sf0.01). Columns are
    generic (v1..v3) because the two parts carry different payloads:
    align = (price, matched-t, dt); rs = (interpolated value, t-prev,
    t-next)."""
    from tape_spark.operators import resample_timeseries

    ens = _ensemble(spark, sf_dir)
    out = ens.align_bands("A", "R", direction="backward", tolerance=2592000.0)
    align = out.select(
        F.lit("align").alias("part"),
        "l_orderkey",
        F.round("t", 6).alias("t"),
        F.col("l_extendedprice").cast("double").alias("v1"),
        F.round("t_b", 6).alias("v2"),
        F.round("dt", 6).alias("v3"),
    )
    rs = resample_timeseries(
        ens.source.filter(
            (F.col("l_orderkey") % 97 == F.lit(1)) & (F.col("l_returnflag") == "R")
        ),
        on="t",
        value_col="l_extendedprice",
        step=2592000.0,
        by="l_orderkey",
    )
    rs_part = rs.select(
        F.lit("rs").alias("part"),
        "l_orderkey",
        F.round("t", 6).alias("t"),
        (F.floor(F.col("l_extendedprice") * F.lit(1000000.0) + F.lit(0.5))
         / F.lit(1000000.0)).alias("v1"),
        F.round("t_prev", 6).alias("v2"),
        F.round("t_next", 6).alias("v3"),
    )
    return align.unionByName(rs_part)


def q_periodogram_fold(spark, sf_dir):
    """Find-period → fold, the headline time-series workflow (the
    reference delegates it to the optional Rust ``light-curve`` wheel,
    pyproject.toml:31): plant a deterministic sinusoid per supplier
    (period ``10 + suppkey % 13`` days over the real, unevenly sampled
    shipdate epochs), recover the period per object with the
    Lomb–Scargle batch kernel, and phase-fold via fold_lightcurves'
    period_col path (object-table join). Contract row per object:
    ``recovered`` asserts the recovered period is within 2% of the
    planted one (the oracle independently derives the planted period and
    expects TRUE), and ``phase_mean`` value-checks the fold projection —
    the oracle replays the phase expression term-for-term on the same
    planted periods."""
    from tape_spark import ColumnMapper, Ensemble
    from tape_spark.analysis.periodogram import calc_lomb_scargle

    _pin_time_configs(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    src = li.select(
        F.col("l_suppkey").alias("sid"),
        (F.expr(EPOCH_EXPR.format(col="l_shipdate")) / F.lit(86400.0)).alias("td"),
        F.lit("g").alias("band"),
        F.lit(1.0).alias("err"),
    ).withColumn("planted_period", (F.lit(10.0) + (F.col("sid") % 13).cast("double")))
    src = src.withColumn(
        "flux", F.sin(F.lit(2.0 * np.pi) * F.col("td") / F.col("planted_period"))
    )
    cm = ColumnMapper(
        id_col="sid", time_col="td", flux_col="flux", err_col="err", band_col="band"
    )
    ens = Ensemble(spark).from_spark(src, column_mapper=cm, npartitions=8)
    best = ens.batch(calc_lomb_scargle(min_period=5.0, max_period=50.0, n_freq=4096))
    ens.assign(
        table="object",
        planted_period=F.lit(10.0) + (F.col("sid") % 13).cast("double"),
    )
    ens.fold_lightcurves(period_col="planted_period", t0=0.0, label="phase")
    folded = ens.frames["source"].groupBy("sid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg("phase"), 6).alias("phase_mean"),
    )
    planted = F.lit(10.0) + (F.col("sid") % 13).cast("double")
    return (
        best.join(folded, "sid")
        .select(
            "sid",
            F.round(planted, 6).alias("planted_period"),
            "n_points",
            "phase_mean",
            (F.abs(F.col("best_period") / planted - 1.0) < F.lit(0.02)).alias(
                "recovered"
            ),
        )
    )


def q_corpus_filter(spark, sf_dir):
    """Gopher/C4-style quality gate (keep/drop + failure reasons per doc,
    one narrow projection) PLUS corpus-level boilerplate-line removal
    (tape_spark.operators.remove_boilerplate). The synthetic docs are
    single-line, so boilerplate lines are injected deterministically (the
    established augmented-text pattern from the PII row): a cookie banner
    on every 3rd doc, a copyright footer on every 2nd, and a doc-unique
    line on every 7th that must SURVIVE removal (its corpus frequency is
    1). The oracle replays the census, threshold, and order-preserving
    rebuild line-exactly; ``clean_sha`` hashes the rebuilt text.

    Round 9 adds the third published quality signal next to the heuristic
    gate and the LM perplexity: a multinomial Naive-Bayes "curated vs
    crawl" classifier (``operators/classifier.py`` — the fastText-style
    linear gate, fit by pure counting so the oracle REBUILDS the model in
    SQL: same md5 sample draw, vocabulary rule, Laplace smoothing, and
    the order-safe integer-unit score sum, term for term). The label is
    ``source <= 'src4'`` — arbitrary but deterministic; the contract is
    the scoring mechanics, not the labelling.

    Round 10 folds in select_by_budget — the token-budget greedy prefix
    over the NB score (histogram-pruned: wholesale buckets + one
    boundary-bucket window, never a global sort). ``in_budget`` rides
    every row and the oracle replays the walk as a single
    cumulative-sum window against the same integer budget."""
    from tape_spark.operators import (
        corpus_filter,
        nb_score,
        remove_boilerplate,
        select_by_budget,
        train_nb_classifier,
    )

    docs = _docs(spark, sf_dir)
    gate = corpus_filter(
        docs,
        min_tokens=10,
        max_tokens=100_000,
        max_rep_ratio=0.5,
        min_stop_ratio=0.02,
        min_avg_token_len=2.0,
        max_avg_token_len=12.0,
    )
    aug = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\nCOOKIE BANNER ACCEPT ALL COOKIES"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit("\n(c) 2026 Example Corp All Rights Reserved"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit("\nref line "), F.col("doc_id").cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    cleaned = remove_boilerplate(aug, min_doc_frequency=5)
    nb = train_nb_classifier(
        docs,
        label_expr="source <= 'src4'",
        sample_fraction=0.5,
        max_docs=500,
        min_count=2,
    )
    scored = nb_score(docs, nb).select(
        "doc_id",
        "n_nb_tokens",
        F.round("nb_logodds", 6).alias("nb_logodds"),
        "nb_label",
    )
    # select_by_budget fold (r10, reshaped r11): the greedy budget walk
    # over the NB quality score, budget = exactly 40% of the corpus's nb
    # tokens (integer arithmetic, SF-independent); the oracle replays it
    # as one cumulative-sum window. in_budget rides every row. The r10
    # shape materialized the kept ~40% of doc_ids through
    # materialized_small_result — the one caller that violated the
    # helper's smallness contract (a corpus-scale frame stayed pinned
    # for the rest of the session at sf100). The kept set is a greedy
    # PREFIX in (score DESC, doc_id ASC) order, so its membership is
    # fully described by the CUTOFF KEY — two driver scalars collected
    # inside the pinned lifecycle; in_budget is then a codegen
    # comparison against those literals: nothing stays pinned and the
    # corpus-scale membership join disappears from the plan.
    from tape_spark.utils.caching import materialized_small_result

    cutref = {}

    def _budget_cutoff(pinned):
        total_w = pinned.agg(F.sum("n_nb_tokens").alias("t")).collect()[0]["t"]
        kept = select_by_budget(
            pinned, int(total_w) * 2 // 5, "nb_logodds", "n_nb_tokens"
        )
        smin = kept.agg(F.min("nb_logodds").alias("s")).collect()[0]["s"]
        if smin is None:  # degenerate: nothing fits the budget
            return None
        idcut = (
            kept.filter(F.col("nb_logodds") == F.lit(float(smin)))
            .agg(F.max("doc_id").alias("m"))
            .collect()[0]["m"]
        )
        cutref.update(scut=float(smin), idcut=int(idcut))
        return None

    materialized_small_result(
        scored.select("doc_id", "nb_logodds", "n_nb_tokens"), _budget_cutoff
    )
    if cutref:
        in_budget = (F.col("nb_logodds") > F.lit(cutref["scut"])) | (
            (F.col("nb_logodds") == F.lit(cutref["scut"]))
            & (F.col("doc_id") <= F.lit(cutref["idcut"]))
        )
    else:
        in_budget = F.lit(False)
    return gate.join(
        cleaned.select(
            "doc_id",
            F.sha2(F.col("text"), 256).alias("clean_sha"),
            "n_lines_removed",
        ),
        "doc_id",
    ).join(scored, "doc_id").withColumn("in_budget", in_budget)


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary heavy hitters (top-50 whitespace tokens; global
    top-k planned as TakeOrderedAndProject, not a 1-partition window
    sort) COMPOSED with BM25 retrieval (``bm25_topk``, round 9): the
    ranked vocabulary supplies the retrieval queries — one single-term
    and two multi-term queries built from the words at fixed ranks — and
    the top-5 documents per query are value-checked in integer
    micro-units (quantized-idf determinism contract,
    ``operators/retrieval.py``). The oracle replays the whole chain in
    SQL: vocabulary ranking, query assembly, tf/df/idf, the mirrored
    IEEE-ordered score, and the (units DESC, doc_id ASC) top-k."""
    from tape_spark.operators import bm25_topk, vocab_topk

    docs = _docs(spark, sf_dir)
    vocab = vocab_topk(docs, k=50)
    # bounded driver collect: 6 rows of the already-computed top-50
    picked = {
        r["rank"]: r["word"]
        for r in vocab.filter(F.col("rank").isin(3, 7, 12, 18, 24, 30)).collect()
    }
    queries = [
        ("q1", picked[7]),
        ("q2", picked[3] + " " + picked[18]),
        ("q3", picked[12] + " " + picked[24] + " " + picked[30]),
    ]
    hits = bm25_topk(docs, queries, k=5)
    vocab_part = vocab.select(
        F.lit("vocab").alias("part"),
        F.col("word").alias("key"),
        F.col("rank"),
        F.lit(-1).cast("long").alias("doc_id"),
        F.col("freq").cast("long").alias("units"),
    )
    bm25_part = hits.select(
        F.lit("bm25").alias("part"),
        F.col("query_id").alias("key"),
        F.col("rank"),
        F.col("doc_id"),
        F.col("score_units").alias("units"),
    )
    # hybrid retrieval (round 9): pseudo-relevance feedback — each BM25
    # top-1 document's embedding becomes the dense query, its cosine
    # top-5 fuses with the keyword ranking via integer-unit RRF
    # (``rrf_fuse``; units = 1e6 div (60 + rank), engine-exact).
    from tape_spark.operators import cosine_topk, rrf_fuse

    top1 = {
        r["query_id"]: r["doc_id"]
        for r in hits.filter(F.col("rank") == 1).collect()
    }
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seeds = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin(list(top1.values()))).collect()
    }  # bounded: at most one row per query
    qvecs = [(qid, seeds[d]) for qid, d in sorted(top1.items()) if d in seeds]
    lists = [hits.select("query_id", "doc_id", "rank")]
    if qvecs:
        qdf = spark.createDataFrame(qvecs, "query_id string, embedding array<float>")
        lists.append(
            cosine_topk(emb, qdf, k=5).select(
                "query_id", F.col("corpus_id").alias("doc_id"), "rank"
            )
        )
    rrf_part = rrf_fuse(lists, k=5).select(
        F.lit("rrf").alias("part"),
        F.col("query_id").alias("key"),
        F.col("rank"),
        F.col("doc_id"),
        F.col("rrf_units").alias("units"),
    )
    return vocab_part.unionByName(bm25_part).unionByName(rrf_part)


def q_day_gap_offset(spark, sf_dir):
    """find_day_gap_offset scalar wrapped as a 1-row frame (driver-side
    24-element scan; no SQL equivalent for the gap-run loop)."""
    ens = _ensemble(spark, sf_dir)
    offset = ens.find_day_gap_offset()
    return spark.createDataFrame([(float(offset),)], "offset double")


def q_embedding_near_dup_lsh(spark, sf_dir):
    """Hyperplane-LSH near-dup scale path, checked by its recall AND
    precision contract against the brute-force pair set (which IS
    SQL-replayable — the oracle recomputes it).

    The LSH path exact-verifies every candidate's cosine, so its pairs
    are a subset of the brute set: n_false_positive is exactly 0. Recall
    at threshold 0.35 with 4-plane × 16-table OR-amplification measured
    0.91/0.93 at sf0.001/sf0.01 (257/271 true pairs) vs the 0.8 floor.

    Round 8 adds the SemDeDup contract (tape_spark.operators
    .semantic_dedup — cluster the embedding space, group cosine>=τ
    duplicates within clusters, one survivor per group): the corpus is
    augmented with an identical clone of every 9th vector (identical
    vectors provably share a cluster — assignment is a pure function of
    the vector — so the clone pairs CANNOT be split by the coarse
    quantizer), τ=0.95 sits far above the corpus's measured max natural
    cosine (0.513 at sf0.01), and the expected outcome is exact: every
    clone pair merges into a min-id-rooted group and survivors are
    precisely the original ids. sd_exact_ok verifies the full survivor
    SET in-Spark; the oracle independently recomputes both counts."""
    from tape_spark.operators import embedding_near_duplicates, semantic_dedup

    emb = _emb(spark, sf_dir)
    lsh = embedding_near_duplicates(
        emb, threshold=0.35, num_planes=4, num_tables=16, brute_force=False
    ).select("id_a", "id_b")
    brute = embedding_near_duplicates(emb, threshold=0.35, brute_force=True).select(
        "id_a", "id_b"
    )
    n_brute = brute.agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = brute.join(lsh, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))

    clones = emb.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(clones)
    sd = semantic_dedup(
        aug, threshold=0.95, num_clusters=16, train_sample=1024, keep="min_id"
    )
    survivors = sd.filter(F.col("is_survivor")).select("vec_id")
    sd_counts = sd.agg(
        F.count(F.lit(1)).alias("n_sd_vectors"),
        F.sum(F.col("is_survivor").cast("long")).alias("n_sd_survivors"),
    )
    # exact SET check, in-Spark: survivors == the original (un-cloned) ids
    s_al = survivors.alias("s")
    o_al = emb.select("vec_id").alias("o")
    sd_ok = (
        s_al.join(o_al, F.col("s.vec_id") == F.col("o.vec_id"), "full_outer")
        .filter(F.col("s.vec_id").isNull() | F.col("o.vec_id").isNull())
        .agg((F.count(F.lit(1)) == 0).alias("sd_exact_ok"))
    )
    return (
        n_brute.crossJoin(n_hit)
        .crossJoin(n_lsh)
        .crossJoin(sd_counts)
        .crossJoin(sd_ok)
        .select(
            "n_exact",
            (F.col("n_lsh") - F.col("n_hit")).alias("n_false_positive"),
            (
                (F.col("n_exact") == 0) | (F.col("n_hit") / F.col("n_exact") >= 0.8)
            ).alias("recall_ok"),
            "n_sd_vectors",
            "n_sd_survivors",
            "sd_exact_ok",
        )
    )


def q_events_sliding(spark, sf_dir):
    """Sliding 15-minute windows every 5 minutes over events
    (tape_spark.streaming.sliding_window_agg; each event lands in 3
    windows)."""
    from tape_spark.streaming import sliding_window_agg

    ev = _events(spark, sf_dir).withColumn("ts2", F.col("t").cast("timestamp"))
    out = sliding_window_agg(
        ev, ts_col="ts2", window="15 minutes", slide="5 minutes", keys=["event_type"], value_col="value"
    )
    return out.select(
        F.col("window_start").cast("double").alias("window_start"),
        "event_type",
        "n",
        F.round("avg_value", 6).alias("avg_value"),
    )


def q_events_session_window(spark, sf_dir):
    """Built-in stateful session windows (F.session_window) per user.

    Both sides truncate the event time to exact integer microseconds
    (``ts_us`` here, ``epoch_ns(ts) // 1000`` in the oracle) so the emitted
    epoch-second doubles are bit-identical — ns-vs-µs rounding at the 6th
    decimal was the round-2 hash mismatch.

    Round 7 adds an interval-join check (tape_spark.operators
    .interval_join): the raw events are range-joined back into the
    emitted [session_start, session_end] windows (equi-key user_id,
    bucketed containment — no nested-loop plan) and the per-session
    containment count ``n_events_ij`` must replay exactly; by session
    semantics it equals ``n_events`` row for row, and the oracle
    recomputes it independently with a plain inequality join.

    Round 8 adds the span-vs-span mode (interval_overlap_join): each
    session is overlap-joined against deterministic 15-minute "outage"
    windows every 4 hours (the window grid is derived from the session
    bounds with one O(1)-row aggregate, no driver collect), and
    ``n_outage_windows`` is the per-session overlap count — the oracle
    recounts it with a plain inequality join over a range()-generated
    grid."""
    from tape_spark.operators import interval_join, interval_overlap_join
    from tape_spark.streaming import session_window_agg

    ev = _events(spark, sf_dir).withColumn("ts2", F.timestamp_micros(F.col("ts_us")))
    out = session_window_agg(ev, ts_col="ts2", gap="30 minutes", keys=["user_id"])
    sess = out.select(
        "user_id",
        F.round(F.col("session_start").cast("double"), 6).alias("session_start"),
        F.round(F.col("session_end").cast("double"), 6).alias("session_end"),
        "n_events",
    )
    evt = ev.select(
        "user_id", F.round(F.col("ts_us") / F.lit(1e6), 6).alias("te")
    )
    ij = interval_join(
        evt,
        sess,
        left_ts="te",
        right_start="session_start",
        right_end="session_end",
        by="user_id",
        bucket_width=3600.0,
    )
    counts = ij.groupBy("user_id", "session_start").agg(
        F.count(F.lit(1)).alias("n_events_ij")
    )
    bounds = sess.agg(
        F.floor(F.min("session_start") / 14400.0).cast("long").alias("k0"),
        F.floor(F.max("session_end") / 14400.0).cast("long").alias("k1"),
    )
    outages = bounds.select(F.explode(F.sequence("k0", "k1")).alias("k")).select(
        (F.col("k") * 14400.0).alias("os"),
        (F.col("k") * 14400.0 + 900.0).alias("oe"),
    )
    ov = interval_overlap_join(
        sess.select("user_id", "session_start", "session_end"),
        outages,
        "session_start",
        "session_end",
        "os",
        "oe",
        by=None,
        bucket_width=14400.0,
        how="left",
    )
    n_out = ov.groupBy("user_id", "session_start").agg(
        F.count("os").alias("n_outage_windows")
    )
    return (
        sess.join(counts, ["user_id", "session_start"], "left")
        .join(n_out, ["user_id", "session_start"], "left")
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.coalesce("n_events_ij", F.lit(0)).alias("n_events_ij"),
            F.coalesce("n_outage_windows", F.lit(0)).alias("n_outage_windows"),
        )
    )


def q_multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing: evenly spaced byte windows via built-in
    binary substring — the byte geometry replays exactly in SQL."""
    from tape_spark.operators.multimodal import attach_binary_payload, frame_sample

    media = attach_binary_payload(_docs(spark, sf_dir), "text", "doc_id", "text/plain")
    out = frame_sample(media, every_n_bytes=64, max_frames=4)
    return out.select("media_id", "frame_index", "frame_bytes")


def q_events_running_stats(spark, sf_dir):
    """Per-user running statistics (batch form of the
    applyInPandasWithState streaming operator)."""
    from tape_spark.streaming import running_stats

    ev = _events(spark, sf_dir)
    out = running_stats(ev, keys=["user_id"], value_col="value")
    return out.select(
        "user_id", "n", F.round("mean", 6).alias("mean"), F.round("std", 6).alias("std")
    )


def q_events_sessionize(spark, sf_dir):
    """Sessionization (30-minute inactivity gap per user,
    tape_spark.streaming.sessionize) PLUS as-of attribution
    (tape_spark.operators.asof_join): every purchase is attributed to the
    user's most recent click at-or-before it within 30 minutes —
    pandas.merge_asof(backward, tolerance) semantics, replayed by the
    oracle with DuckDB's native ASOF LEFT JOIN. Per user: purchase count,
    attributed count, and mean attribution lag."""
    from tape_spark.operators import asof_join
    from tape_spark.streaming import sessionize

    ev = _events(spark, sf_dir)
    base = sessionize(
        ev, user_col="user_id", ts_col="t", gap_seconds=1800.0, order_cols=["event_id"]
    )
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "t")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "t")
    att = asof_join(p, c, on="t", by="user_id", direction="backward", tolerance=1800.0)
    agg = att.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("t_r").alias("n_attributed"),
        F.round(F.avg(F.col("t") - F.col("t_r")), 6).alias("avg_attr_lag"),
    )
    return base.join(agg, "user_id", "left").select(
        "user_id",
        "n_sessions",
        "n_events",
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("n_attributed", F.lit(0)).alias("n_attributed"),
        "avg_attr_lag",
    )


def q_stream_dedup(spark, sf_dir):
    """Ingest-time replay dedup (tape_spark.streaming.stream_dedup, batch
    form): the events table unioned with a replayed subset (every 7th
    event — the retry/replay traffic a real ingest sees) must dedup back
    to exactly the original rows. Full-row keys, so any survivor of a
    duplicate group is byte-identical and the output is deterministic.
    The streaming form of the same function (dropDuplicates[WithinWatermark]
    + watermark-bounded state) is locked to this batch path by
    stream=batch parity pytest."""
    from tape_spark.streaming import stream_dedup

    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type", "value", "t")
    replay = ev.filter(F.col("event_id") % 7 == 0)
    return stream_dedup(ev.unionAll(replay))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries — the driver's correctness harness evaluates the
    first 50 registry entries, so the registry IS the coverage surface.
    Near-duplicate queries from earlier rounds were consolidated
    (text signals fused into text_signals, the three multimodal kernel
    stages into multimodal_pipeline, select+head into select_head;
    round 6: ingest_pandas retired — its hash was identical to
    ingest_source's and from_pandas stays driver-exercised via
    stetson_j_golden — and the tumbling-window row folded into
    events_sliding's F.window coverage, making room for chunk_documents
    and stream_dedup; later in round 6, embedding_near_dup folded into
    embedding_near_dup_lsh — whose query runs the same brute path
    in-Spark and whose oracle recomputes the exact pair count — and
    events_json retired (a bare get_json_object projection exercising no
    engine code), making room for decontaminate and stratified_sample)
    so every declared query gets a driver row every round."""
    return {
        "ingest_source": q_ingest_source,
        "calc_nobs_by_band": q_calc_nobs_by_band,
        "prune_sync": q_prune_sync,
        "query_filter": q_query_filter,
        "assign_dropna": q_assign_dropna,
        "flux_to_mag": q_flux_to_mag,
        "coalesce": q_coalesce,
        "bin_sources": q_bin_sources,
        "select_head": q_select_head,
        "batch_amplitude": q_batch_amplitude,
        "batch_features": q_batch_features,
        "batch_by_band": q_batch_by_band,
        "merge_orders": q_merge_orders,
        "merge_rollup_nation": q_merge_rollup_nation,
        "sort_lightcurves": q_sort_lightcurves,
        "save_load_roundtrip": q_save_load_roundtrip,
        "timeseries_extract": q_timeseries_extract,
        "sample_objects": q_sample_objects,
        "align_bands": q_align_bands,
        "periodogram_fold": q_periodogram_fold,
        "day_gap_offset": q_day_gap_offset,
        "stetson_j": q_stetson_j,
        "stetson_j_golden": q_stetson_j_golden,
        "sf2_basic": q_sf2_basic,
        "sf2_fixed_bins": q_sf2_fixed_bins,
        "sf2_combine_fixed_bins": q_sf2_combine_fixed_bins,
        "lc_similarity": q_lc_similarity,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "decontaminate": q_decontaminate,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "text_signals": q_text_signals,
        "corpus_filter": q_corpus_filter,
        "vocab_topk": q_vocab_topk,
        "doc_fingerprint": q_doc_fingerprint,
        "chunk_documents": q_chunk_documents,
        "multimodal_pipeline": q_multimodal_pipeline,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        "events_running_stats": q_events_running_stats,
        "stream_dedup": q_stream_dedup,
        "events_sliding": q_events_sliding,
        "events_session_window": q_events_session_window,
        "events_sessionize": q_events_sessionize,
        "stratified_sample": q_stratified_sample,
    }


_CRITICAL_SELECT = (
    "SELECT l_orderkey, epoch(l_shipdate) AS t, l_extendedprice, l_quantity, l_returnflag FROM lineitem"
)

_NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS shingle
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.2
"""

_DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS shingle
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
p0 AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM p0
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.2
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT e.u AS node, reach.r FROM edges e JOIN reach ON e.v = reach.node
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT node AS doc_id, component,
       count(*) OVER (PARTITION BY component) AS cluster_size,
       row_number() OVER (
         PARTITION BY component
         ORDER BY d.n_chars DESC NULLS LAST, node ASC
       ) = 1 AS is_canonical,
       -- leakage_safe_split replay: one md5 draw per COMPONENT against
       -- exact-binary boundaries (0.75, 0.875), so all members agree
       CASE WHEN ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 13))::BIGINT
                 / 4503599627370496.0 < 0.75 THEN 'train'
            WHEN ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 13))::BIGINT
                 / 4503599627370496.0 < 0.875 THEN 'val'
            ELSE 'test' END AS split
FROM comp JOIN documents d ON d.doc_id = comp.node
"""

_CORPUS_FILTER_SQL = """
WITH f AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
    CASE WHEN length(trim(text)) = 0 THEN 0.0
         ELSE length(regexp_replace(trim(text), '\\s+', '', 'g')) * 1.0
              / len(regexp_split_to_array(trim(text), '\\s+')) END AS avg_len,
    len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|in|that|it)\\b')) AS hits,
    regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents
),
g AS (
  SELECT doc_id, n_tokens, avg_len,
    CASE WHEN n_tokens > 0 THEN hits * 1.0 / n_tokens ELSE 0.0 END AS stop_ratio,
    CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
         ELSE [] END AS grams
  FROM f
),
r AS (
  SELECT doc_id, n_tokens, avg_len, stop_ratio,
    CASE WHEN len(grams) > 0 THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
         ELSE 0.0 END AS rep_ratio
  FROM g
),
j AS (
  SELECT doc_id, concat_ws(',',
    CASE WHEN n_tokens < 10 THEN 'too_short' END,
    CASE WHEN n_tokens > 100000 THEN 'too_long' END,
    CASE WHEN rep_ratio > 0.5 THEN 'repetitive' END,
    CASE WHEN stop_ratio < 0.02 THEN 'low_stopword' END,
    CASE WHEN avg_len < 2.0 OR avg_len > 12.0 THEN 'odd_token_len' END
  ) AS reasons
  FROM r
),
-- boilerplate-removal replay on deterministically augmented text:
-- banner on every 3rd doc, footer on every 2nd, doc-unique line on every
-- 7th (frequency 1 => must survive the min_doc_frequency=5 census)
aug AS (
  SELECT doc_id, coalesce(text, '')
    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'COOKIE BANNER ACCEPT ALL COOKIES' ELSE '' END
    || CASE WHEN doc_id % 2 = 0 THEN chr(10) || '(c) 2026 Example Corp All Rights Reserved' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'ref line ' || CAST(doc_id AS VARCHAR) ELSE '' END
    AS t
  FROM documents
),
lns AS (
  SELECT doc_id,
         unnest(string_split(t, chr(10))) AS line,
         generate_subscripts(string_split(t, chr(10)), 1) AS ord
  FROM aug
),
bp AS (
  SELECT nline FROM (
    SELECT DISTINCT doc_id, trim(line) AS nline FROM lns
    WHERE length(trim(line)) >= 4
  ) GROUP BY nline HAVING count(*) >= 5
),
kept AS (
  SELECT doc_id, ord, line FROM lns
  WHERE length(trim(line)) < 4 OR trim(line) NOT IN (SELECT nline FROM bp)
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS new_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
clean AS (
  SELECT a.doc_id,
         sha256(coalesce(r.new_text, '')) AS clean_sha,
         len(string_split(a.t, chr(10))) - coalesce(r.n_kept, 0) AS n_lines_removed
  FROM aug a LEFT JOIN rebuilt r USING (doc_id)
),
-- multinomial Naive Bayes, rebuilt from scratch: same md5-addressed
-- sample draw (fraction 0.5, cap 500), >=2-count vocabulary (OOV ->
-- <unk> BEFORE counting), Laplace a=1 over V = |vocab|+1, and the
-- per-token log-likelihood-ratio quantized to integer 1e-12 units so
-- the document sum is order-independent (the LM-scorer discipline)
nb_docs AS (
  SELECT doc_id, source <= 'src4' AS y,
         list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\\s+'),
                     t -> t <> '') AS lw
  FROM documents
),
nb_sample AS (
  SELECT doc_id, y, lw FROM nb_docs
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        / 4503599627370496.0 < 0.5
  ORDER BY doc_id LIMIT 500
),
nb_tok AS (SELECT doc_id, y, unnest(lw) AS t FROM nb_sample),
nb_raw AS (SELECT t, count(*) AS c FROM nb_tok GROUP BY t),
nb_vocab AS (SELECT t FROM nb_raw WHERE c >= 2 AND t <> '<unk>'),
nb_m AS (
  SELECT y, CASE WHEN t IN (SELECT t FROM nb_vocab) THEN t ELSE '<unk>' END AS t
  FROM nb_tok
),
nb_tc AS (
  SELECT t, sum(CASE WHEN y THEN 1 ELSE 0 END) AS cp,
         sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS cn
  FROM nb_m GROUP BY t
),
nb_n AS (
  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS ntp,
         sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS ntn
  FROM nb_m
),
nb_v AS (SELECT count(*) + 1 AS v FROM nb_vocab),
nb_wt AS (
  SELECT w.t,
         CAST(floor((ln((coalesce(tc.cp, 0) + 1.0) / (nb_n.ntp + 1.0 * nb_v.v))
                   - ln((coalesce(tc.cn, 0) + 1.0) / (nb_n.ntn + 1.0 * nb_v.v)))
                    * 1e12 + 0.5) AS BIGINT) AS u
  FROM (SELECT t FROM nb_vocab UNION ALL SELECT '<unk>') w
  LEFT JOIN nb_tc tc USING (t) CROSS JOIN nb_n CROSS JOIN nb_v
),
nb_prior AS (
  SELECT CAST(floor((ln(sum(CASE WHEN y THEN 1 ELSE 0 END) * 1.0 / count(*))
                   - ln(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) * 1.0 / count(*)))
                    * 1e12 + 0.5) AS BIGINT) AS pu
  FROM nb_sample
),
nb_dtok AS (SELECT doc_id, unnest(lw) AS t FROM nb_docs),
nb_dm AS (
  SELECT doc_id, CASE WHEN t IN (SELECT t FROM nb_vocab) THEN t ELSE '<unk>' END AS t
  FROM nb_dtok
),
nb_sum AS (
  SELECT d.doc_id, sum(w.u) AS units
  FROM nb_dm d JOIN nb_wt w USING (t) GROUP BY d.doc_id
),
nb_out AS (
  SELECT d.doc_id, CAST(len(d.lw) AS BIGINT) AS n_nb_tokens,
         round((p.pu + coalesce(s.units, 0)) / 1e12, 6) AS nb_logodds,
         (p.pu + coalesce(s.units, 0)) > 0 AS nb_label
  FROM nb_docs d LEFT JOIN nb_sum s USING (doc_id) CROSS JOIN nb_prior p
)
SELECT j.doc_id, j.reasons = '' AS keep, j.reasons,
       -- select_by_budget replay (r10): greedy prefix of the NB-score
       -- walk, inclusive integer running sum vs 40% of total nb tokens
       SUM(nb.n_nb_tokens) OVER (ORDER BY nb.nb_logodds DESC, j.doc_id)
         <= (SELECT sum(n_nb_tokens) FROM nb_out) * 2 // 5 AS in_budget,
       c.clean_sha, CAST(c.n_lines_removed AS BIGINT) AS n_lines_removed,
       nb.n_nb_tokens, nb.nb_logodds, nb.nb_label
FROM j JOIN clean c USING (doc_id) JOIN nb_out nb USING (doc_id)
"""

# One-pass signal extraction: language vote + quality features + stopword /
# repetition ratios + BPE-ish count, mirroring tape_spark.operators.text_signals
_TEXT_SIGNALS_SQL = """
WITH f AS (
  SELECT doc_id, text,
    length(text) AS n_chars,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
    len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|in|that|it)\\b')) AS s_en,
    len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist|nicht|ein|zu)\\b')) AS s_de,
    len(regexp_extract_all(lower(text), '\\b(le|la|les|et|est|une|que|dans)\\b')) AS s_fr,
    len(regexp_extract_all(lower(text), '\\b(el|los|las|es|una|que|por|con)\\b')) AS s_es,
    len(regexp_extract_all(text, '[一-鿿]')) > 0 AS has_cjk,
    regexp_split_to_array(trim(lower(text)), '\\s+') AS w,
    CASE WHEN doc_id % 11 = 0 THEN coalesce(text, '')
           || ' contact' || CAST(doc_id AS VARCHAR)
           || '@example.com call +1202555' || CAST(doc_id % 10000 AS VARCHAR)
           || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
         ELSE coalesce(text, '') END AS atext
  FROM documents
),
g AS (
  SELECT *, CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
                 ELSE [] END AS grams
  FROM f
),
sig AS (
SELECT doc_id,
  CASE WHEN has_cjk THEN 'zh'
       WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
       WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       ELSE 'es' END AS pred_lang,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  round(CASE WHEN n_tokens = 0 THEN 0.0
             ELSE length(regexp_replace(trim(text), '\\s+', '', 'g')) * 1.0 / n_tokens END, 6) AS avg_token_len,
  round(CASE WHEN n_chars = 0 THEN 0.0
             ELSE (n_chars - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / n_chars END, 6) AS punct_ratio,
  round(CASE WHEN n_tokens = 0 THEN 0.0 ELSE s_en * 1.0 / n_tokens END, 6) AS stop_ratio,
  round(CASE WHEN len(grams) > 0 THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
             ELSE 0.0 END, 6) AS rep_ratio,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(atext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(atext, '\\+\\d{8,15}\\b|\\(\\d{3}\\)\\s?\\d{3}-\\d{4}\\b|\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(atext, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(atext, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(atext, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
     + len(regexp_extract_all(atext, '\\+\\d{8,15}\\b|\\(\\d{3}\\)\\s?\\d{3}-\\d{4}\\b|\\b\\d{3}-\\d{3}-\\d{4}\\b'))
     + len(regexp_extract_all(atext, '\\b\\d{3}-\\d{2}-\\d{4}\\b'))
     + len(regexp_extract_all(atext, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_pii,
  CAST(0 AS BIGINT) AS n_pii_after_redact
FROM g
),
-- Stupid-Backoff bigram LM, rebuilt from scratch: same md5-addressed
-- sample draw, >=3-count vocabulary (OOV -> <unk> BEFORE counting),
-- c(<unk>)+1 / N+1 smoothing, and the per-document log-prob sum
-- ln(c(t0)/N) + sum ln(c(vw)/c(v) | 0.4*c(w)/N), replayed term-for-term
lm_docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\\s+'),
                     t -> t <> '') AS lw
  FROM documents
),
lm_sample AS (
  SELECT doc_id, lw FROM lm_docs
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        / 4503599627370496.0 < 0.3
  ORDER BY doc_id LIMIT 400
),
s_tok AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS i, lw[CAST(u.i AS BIGINT) + 1] AS t
  FROM lm_sample, UNNEST(range(0, len(lw))) u(i)
),
raw_uni AS (SELECT t, count(*) AS c FROM s_tok GROUP BY t),
vocab AS (SELECT t FROM raw_uni WHERE c >= 3 AND t <> '<unk>'),
m_tok AS (
  SELECT doc_id, i,
         CASE WHEN t IN (SELECT t FROM vocab) THEN t ELSE '<unk>' END AS t
  FROM s_tok
),
uni AS (
  SELECT t, count(*) + CASE WHEN t = '<unk>' THEN 1 ELSE 0 END AS c
  FROM m_tok GROUP BY t
  UNION ALL
  SELECT '<unk>', 1 WHERE NOT EXISTS (SELECT 1 FROM m_tok WHERE t = '<unk>')
),
nn AS (SELECT count(*) + 1 AS n FROM m_tok),
big AS (
  SELECT a.t AS v, b.t AS w2, count(*) AS c
  FROM m_tok a JOIN m_tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY 1, 2
),
d_tok AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS i,
         CASE WHEN lw[CAST(u.i AS BIGINT) + 1] IN (SELECT t FROM vocab)
              THEN lw[CAST(u.i AS BIGINT) + 1] ELSE '<unk>' END AS t
  FROM lm_docs, UNNEST(range(0, len(lw))) u(i)
),
-- each log-prob term is quantized to integer 1e-12 units
-- (floor(x*1e12 + 0.5), same rule as the Python scorer) so the SUM is
-- an exact integer sum — associative, hence order-independent; an
-- unordered double SUM vs Python's sequential loop could differ in the
-- last ULP and flip round(ppl, 6) on knife-edge values
first_lp AS (
  SELECT d.doc_id,
         CAST(floor(ln(u.c * 1.0 / nn.n) * 1e12 + 0.5) AS BIGINT) AS lpq
  FROM d_tok d JOIN uni u ON u.t = d.t CROSS JOIN nn
  WHERE d.i = 0
),
pair_lp AS (
  SELECT a.doc_id,
         sum(CAST(floor(CASE WHEN bg.c IS NOT NULL THEN ln(bg.c * 1.0 / uv.c)
                             ELSE ln(0.4 * uw.c / nn.n) END * 1e12 + 0.5)
                  AS BIGINT)) AS lpq
  FROM d_tok a
  JOIN d_tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN uni uv ON uv.t = a.t
  JOIN uni uw ON uw.t = b.t
  LEFT JOIN big bg ON bg.v = a.t AND bg.w2 = b.t
  CROSS JOIN nn
  GROUP BY a.doc_id
),
lm_stats AS (
  SELECT d.doc_id, count(*) AS n_lm_tokens,
         exp(-((any_value(f.lpq) + coalesce(any_value(p.lpq), 0)) / 1e12)
             / count(*)) AS ppl
  FROM d_tok d
  LEFT JOIN first_lp f ON f.doc_id = d.doc_id
  LEFT JOIN pair_lp p ON p.doc_id = d.doc_id
  GROUP BY d.doc_id
)
SELECT sig.*,
       coalesce(l.n_lm_tokens, 0) AS n_lm_tokens,
       round(l.ppl, 6) AS ppl,
       -- normalize_text replay: strip C0/DEL controls -> NFC -> lower ->
       -- collapse whitespace + trim, then sha256 (r10 fold)
       sha256(trim(regexp_replace(lower(nfc_normalize(
         regexp_replace(coalesce(d.text, ''), '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))),
         '\\s+', ' ', 'g'))) AS norm_sha
FROM sig LEFT JOIN lm_stats l USING (doc_id)
JOIN documents d USING (doc_id)
"""

# Replays the SimHash bit-vote with the md5-derived 60-bit token hash
# (bits=32 → vote positions 0..30; bit 31 stays clear). Empty docs tokenize
# to the single empty token on both engines.
_SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok FROM documents
),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS th FROM toks),
votes AS (
  SELECT doc_id, b, sum(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, UNNEST(range(0, 31)) AS t(b) GROUP BY doc_id, b
)
SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""

# The approximate-ANN queries emit their recall contract vs exact brute
# force (the neighbor lists are seed-specific but the floor is
# deterministic and SF-independent), so the oracle asserts it per query.
# The exact top-k columns are recomputed and value-hash-checked; only
# the recall boolean is asserted (the approximate neighbor lists
# themselves are index-specific — see _ann_recall).
_ANN_RECALL_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id AS corpus_id,
         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS sim
  FROM embeddings c, q
)
SELECT query_id, corpus_id, round(sim, 6) AS cosine,
       row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, corpus_id ASC) AS rank,
       true AS recall_ok
FROM scored
QUALIFY rank <= 10
"""

# the IVF row additionally carries the product-quantization recall
# contract (pq_recall_ok); the oracle asserts it holds, the Spark side
# computes it for real
_ANN_RECALL_PQ_SQL = _ANN_RECALL_SQL.replace(
    "true AS recall_ok", "true AS recall_ok, true AS pq_recall_ok, true AS ivfpq_recall_ok, true AS cb_ok"
)

# Replays the payload packaging (length + sha256 checksum) and all three
# stub media kernels' byte arithmetic: decode geometry from payload bytes,
# the fixed resize geometry (min(16*8, 65536) = 128 bytes always), and
# embedding component 0 = (first byte % 13) / 13.
_MM_PIPELINE_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, text, hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents
),
b AS (
  SELECT media_id, text, n, h, list_transform(range(1, least(n, 64) + 1),
         i -> ('0x' || substr(h, 2*i-1, 2))::INTEGER) AS head
  FROM m
)
SELECT media_id,
  'text/plain' AS media_type,
  CAST(n AS BIGINT) AS n_bytes,
  sha256(text) AS checksum,
  CAST(1 + (n % 1024) AS INTEGER) AS width,
  CAST(1 + (CASE WHEN len(head) = 0 THEN 0 ELSE list_sum(head) % 1024 END) AS INTEGER) AS height,
  3 AS channels,
  16 AS rs_width, 8 AS rs_height, 128 AS rs_bytes,
  round(CASE WHEN n = 0 THEN 0.0 ELSE (('0x' || substr(h, 1, 2))::INTEGER % 13) / 13.0 END, 6) AS e0
FROM b
"""

_ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id AS corpus_id,
         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS sim
  FROM embeddings c, q
),
ranked AS (
  SELECT query_id, corpus_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, corpus_id ASC) AS rank
  FROM scored
),
-- knn_classify replay: leave-one-out top-10 (self excluded BEFORE
-- re-ranking), majority vote over the corpus labels, ties to the
-- smaller label
loo AS (
  SELECT query_id, corpus_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, corpus_id ASC) AS rk
  FROM scored WHERE corpus_id <> query_id
),
votes AS (
  SELECT l.query_id, e.label AS lbl, count(*) AS votes
  FROM loo l JOIN embeddings e ON l.corpus_id = e.vec_id
  WHERE l.rk <= 10
  GROUP BY l.query_id, e.label
),
pred AS (
  SELECT query_id, CAST(lbl AS BIGINT) AS pred_label, CAST(votes AS BIGINT) AS pred_votes
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY votes DESC, lbl ASC) AS vr FROM votes)
  WHERE vr = 1
)
SELECT r.query_id, r.corpus_id, round(r.sim, 6) AS cosine, r.rank,
       p.pred_label, p.pred_votes
FROM ranked r JOIN pred p USING (query_id)
WHERE r.rank <= 10
"""

# Replays decontaminate() with string n-grams (the Spark side joins on
# xxhash64 keys — count equality across the two key domains is part of
# what this row checks). Same tokenization as _NGRAM_JACCARD_SQL; n = 3;
# every 23rd doc is the benchmark, the rest the training corpus.
_DECONTAMINATE_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(lower(coalesce(text, '')))) = 0 THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') END AS w
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 23 = 0),
counts AS (
  SELECT gr.doc_id, count(*) AS n_ngrams, count(b.g) AS n_contaminated
  FROM grams gr LEFT JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id % 23 <> 0
  GROUP BY gr.doc_id
),
-- split_contaminated replay (n=3, radius=1): positional hits, the
-- [s-1, s+3] window cover, and the marker-split piece rebuild
positions AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3 AND doc_id % 23 <> 0
),
hits AS (SELECT p.doc_id, p.s FROM positions p JOIN bench b ON p.g = b.g),
tok_removed AS (
  SELECT t.doc_id, CAST(u.i AS BIGINT) AS tpos,
         w[CAST(u.i AS BIGINT) + 1] AS tok,
         EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = t.doc_id
                 AND u.i >= h.s - 1 AND u.i <= h.s + 3) AS rm
  FROM toks t, UNNEST(range(0, len(w))) u(i)
  WHERE t.doc_id % 23 <> 0
),
marked AS (
  SELECT doc_id,
         string_agg(CASE WHEN rm THEN chr(1) ELSE tok END, ' ' ORDER BY tpos) AS mstr,
         sum(CASE WHEN rm THEN 1 ELSE 0 END) AS n_removed
  FROM tok_removed GROUP BY doc_id
),
pcs AS (
  SELECT doc_id,
         list_filter(string_split_regex(mstr, '( ?' || chr(1) || ' ?)+'),
                     p -> p <> '') AS ps,
         n_removed
  FROM marked
)
SELECT d.doc_id,
       CAST(coalesce(c.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(c.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       round(CAST(coalesce(c.n_contaminated, 0) AS DOUBLE)
             / greatest(coalesce(c.n_ngrams, 0), 1), 6) AS contamination,
       coalesce(c.n_contaminated, 0) >= 1 AS is_contaminated,
       CAST(coalesce(p.n_removed, 0) AS BIGINT) AS n_removed_tokens,
       CAST(coalesce(len(p.ps), 0) AS BIGINT) AS n_pieces,
       sha256(coalesce(array_to_string(p.ps, chr(10)), '')) AS pieces_sha
FROM (SELECT doc_id FROM documents WHERE doc_id % 23 <> 0) d
LEFT JOIN counts c USING (doc_id)
LEFT JOIN pcs p USING (doc_id)
"""

# Replays stratified_sample()'s md5-52-bit draw exactly (the same
# construction sample_objects already locks in) with per-language rates,
# and stratified_sample_exact()'s k-smallest-hash draw via a window
# row_number over the identical draw.
_STRATIFIED_SAMPLE_SQL = """
WITH u AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT / 4503599627370496.0 AS draw
  FROM documents
)
SELECT doc_id, lang, source, 'bernoulli' AS mode, CAST(NULL AS BIGINT) AS pos FROM u
WHERE draw < CASE lang WHEN 'en' THEN 0.6 WHEN 'de' THEN 0.35 WHEN 'fr' THEN 0.2
                       WHEN 'es' THEN 0.5 ELSE 0.0 END
UNION ALL
SELECT doc_id, lang, source, 'exact_k' AS mode, CAST(NULL AS BIGINT) AS pos FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY draw, doc_id) AS rk FROM u
) WHERE rk <= CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 10 ELSE 0 END
UNION ALL
SELECT doc_id, lang, source, 'mix' AS mode, CAST(NULL AS BIGINT) AS pos FROM (
  SELECT u.*, count(*) OVER (PARTITION BY lang) AS n FROM u
) WHERE (lang = 'en' AND draw < least(1.0, ((2.0 / 3.0) * 120.0) / n))
   OR  (lang = 'de' AND draw < least(1.0, ((1.0 / 3.0) * 120.0) / n))
UNION ALL
SELECT doc_id, lang, source, 'shuffle_rank' AS mode, pos FROM (
  SELECT doc_id, lang, source,
         CAST(row_number() OVER (ORDER BY draw, doc_id) AS BIGINT) AS pos
  FROM u
) WHERE lang = 'zh'
UNION ALL
SELECT u.doc_id, u.lang, u.source, 'weighted' AS mode, CAST(NULL AS BIGINT) AS pos
FROM u JOIN documents d ON u.doc_id = d.doc_id
WHERE (d.n_chars / 1000.0) > 0
  AND u.draw < least(1.0, 0.3 * (d.n_chars / 1000.0))
UNION ALL
-- temperature mode: w_lang = floor(n_lang**0.5 * 1e9 + 0.5) integer
-- units, exact integer normalizing sum, rate = (w/wsum)*150/n — the
-- identical arithmetic shape (and operation order) as mix_fractions
SELECT doc_id, lang, source, 'temperature' AS mode, CAST(NULL AS BIGINT) AS pos FROM (
  SELECT u.*, count(*) OVER (PARTITION BY lang) AS n,
         CAST(floor(pow(count(*) OVER (PARTITION BY lang), 0.5) * 1e9 + 0.5) AS BIGINT) AS wu,
         (SELECT sum(CAST(floor(pow(n2, 0.5) * 1e9 + 0.5) AS BIGINT))
          FROM (SELECT count(*) AS n2 FROM u WHERE lang IS NOT NULL GROUP BY lang)) AS wsum
  FROM u WHERE lang IS NOT NULL
)
WHERE draw < least(1.0, CAST(wu AS DOUBLE) / CAST(wsum AS DOUBLE) * 150 / n)
UNION ALL
-- dsir mode: the full DSIR pipeline replayed — md5-bucketed
-- unigram+bigram occurrences, additively-smoothed target/raw bucket
-- models, per-bucket log-ratios quantized to integer 1e-12 units
-- (order-safe exact integer sums), and the Gumbel top-k draw from the
-- same md5 unit. B = 2048, a = 0.1, k = 40; target = doc_id % 11 = 0.
SELECT doc_id, lang, source, 'dsir' AS mode, CAST(rk AS BIGINT) AS pos FROM (
  WITH dtoks AS (
    SELECT doc_id,
           CASE WHEN length(trim(lower(coalesce(text, '')))) = 0 THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') END AS w
    FROM documents
  ),
  dgrams AS (
    SELECT doc_id, w[i] AS g FROM dtoks, UNNEST(range(1, len(w) + 1)) t(i)
    UNION ALL
    SELECT doc_id, w[i] || ' ' || w[i+1] AS g
    FROM dtoks, UNNEST(range(1, len(w))) t(i) WHERE len(w) >= 2
  ),
  dbuck AS (
    SELECT doc_id, ('0x' || substr(md5(g), 1, 13))::BIGINT % 2048 AS bucket
    FROM dgrams
  ),
  dtc AS (SELECT bucket, count(*) AS tc FROM dbuck WHERE doc_id % 11 = 0 GROUP BY bucket),
  drc AS (SELECT bucket, count(*) AS rc FROM dbuck WHERE doc_id % 11 <> 0 GROUP BY bucket),
  dtot AS (SELECT (SELECT coalesce(sum(tc), 0) FROM dtc) AS tt,
                  (SELECT coalesce(sum(rc), 0) FROM drc) AS rt),
  dratio AS (
    SELECT coalesce(dtc.bucket, drc.bucket) AS bucket,
           CAST(floor(ln(coalesce(tc, 0) + 0.1) * 1e12 + 0.5) AS BIGINT)
           - CAST(floor(ln(tt + 0.1 * 2048) * 1e12 + 0.5) AS BIGINT)
           - CAST(floor(ln(coalesce(rc, 0) + 0.1) * 1e12 + 0.5) AS BIGINT)
           + CAST(floor(ln(rt + 0.1 * 2048) * 1e12 + 0.5) AS BIGINT) AS lr
    FROM dtc FULL OUTER JOIN drc ON dtc.bucket = drc.bucket, dtot
  ),
  dscore AS (
    SELECT b.doc_id, sum(r.lr) AS logw
    FROM dbuck b JOIN dratio r USING (bucket)
    WHERE b.doc_id % 11 <> 0 GROUP BY b.doc_id
  ),
  dsel AS (
    SELECT d.doc_id, d.lang, d.source,
           coalesce(s.logw, 0)
           + CAST(floor(-ln(-ln(greatest(
               ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13))::BIGINT
               / 4503599627370496.0, power(2.0, -52)))) * 1e12 + 0.5) AS BIGINT)
           AS score
    FROM documents d LEFT JOIN dscore s USING (doc_id)
    WHERE d.doc_id % 11 <> 0
  )
  SELECT doc_id, lang, source,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM dsel
) WHERE rk <= 40
"""

# Fingerprint + repeated-span census. The span census replays on span
# STRINGS (Spark ships xxhash64 fingerprints; counts agree barring a 2^-64
# collision — the same hashed-vs-string contract dedup_exact locks in).
# Span starts are 0, 4, 8, ... while a full 16-token window fits.
_DOC_FINGERPRINT_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS w
  FROM documents
),
spans AS (
  SELECT doc_id, CAST(t.i * 4 AS BIGINT) AS token_start,
         array_to_string(w[t.i*4 + 1 : t.i*4 + 16], ' ') AS span
  FROM toks, UNNEST(range(0, CAST(floor((len(w) - 16) / 4.0) AS BIGINT) + 1)) AS t(i)
  WHERE len(w) >= 16
),
rep AS (
  SELECT span FROM spans GROUP BY span HAVING count(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT s.doc_id, count(*) AS n_repeated_spans
  FROM spans s JOIN rep USING (span)
  GROUP BY s.doc_id
),
base AS (
  SELECT doc_id,
    CASE WHEN len(w) >= 16 THEN CAST(floor((len(w) - 16) / 4.0) AS BIGINT) + 1
         ELSE 0 END AS n_spans
  FROM toks
),
-- remove_repeated_spans replay: keeper = globally smallest
-- (doc_id, token_start) per repeated span; non-keeper occurrences
-- remove their 16-token window; marker-split piece rebuild (the same
-- chr(1) discipline as the split_contaminated replay)
rtoks AS (
  SELECT doc_id,
         CASE WHEN length(trim(lower(coalesce(text, '')))) = 0 THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') END AS w
  FROM documents
),
rem_occ AS (
  SELECT doc_id, token_start FROM (
    SELECT s.doc_id, s.token_start,
           row_number() OVER (PARTITION BY s.span
                              ORDER BY s.doc_id, s.token_start) AS rk
    FROM spans s JOIN rep USING (span)
  ) WHERE rk > 1
),
rem_cnt AS (SELECT doc_id, count(*) AS n_rm FROM rem_occ GROUP BY doc_id),
rem_tok AS (
  SELECT t.doc_id, CAST(u.i AS BIGINT) AS tpos,
         w[CAST(u.i AS BIGINT) + 1] AS tok,
         EXISTS (SELECT 1 FROM rem_occ h WHERE h.doc_id = t.doc_id
                 AND u.i >= h.token_start AND u.i <= h.token_start + 15) AS rm
  FROM rtoks t, UNNEST(range(0, len(w))) u(i)
),
rem_marked AS (
  SELECT doc_id,
         string_agg(CASE WHEN rm THEN chr(1) ELSE tok END, ' ' ORDER BY tpos) AS mstr,
         sum(CASE WHEN rm THEN 1 ELSE 0 END) AS n_removed
  FROM rem_tok GROUP BY doc_id
),
rem_pcs AS (
  SELECT doc_id,
         list_filter(string_split_regex(mstr, '( ?' || chr(1) || ' ?)+'),
                     p -> p <> '') AS ps,
         n_removed
  FROM rem_marked
),
-- chunk_documents_cdc replay (target 16, cap 64): boundary AFTER token i
-- iff the shared md5 draw lands in bucket 0 of 16; spans between
-- boundaries; spans over the cap split into fixed 64-token windows
ctoks AS (
  SELECT doc_id,
         CASE WHEN trim(coalesce(text, '')) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\s+') END AS ct
  FROM documents
),
cbnd AS (
  SELECT doc_id, ct,
         [0] || [i FOR i IN range(1, len(ct)+1)
                 IF ('0x' || substr(md5(ct[i]), 1, 13))::BIGINT % 16 = 0]
             || [len(ct)] AS bounds
  FROM ctoks
),
cspan AS (
  SELECT doc_id, ct,
         [{'s': bounds[k]+1, 'e': bounds[k+1]}
          FOR k IN range(1, len(bounds)) IF bounds[k+1] >= bounds[k]+1] AS spans
  FROM cbnd
),
cpcs AS (
  SELECT doc_id, ct,
         flatten([[{'st': sp.s + j*64, 'ln': least(64, sp.e - sp.s + 1 - j*64)}
                   FOR j IN range(0, ceil((sp.e - sp.s + 1) / 64.0)::INT)]
                  FOR sp IN spans]) AS pieces
  FROM cspan
),
ccdc AS (
  SELECT doc_id,
         CAST(len(pieces) AS BIGINT) AS cdc_chunks,
         CAST(coalesce(list_max([p.ln FOR p IN pieces]), 0) AS BIGINT) AS cdc_max_tokens,
         sha256(array_to_string(
             [array_to_string(ct[p.st : p.st + p.ln - 1], ' ') FOR p IN pieces],
             chr(10))) AS cdc_sha
  FROM cpcs
)
SELECT d.doc_id,
  sha256(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g')) AS content_sha,
  b.n_spans,
  coalesce(p.n_repeated_spans, 0) AS n_repeated_spans,
  round(CASE WHEN b.n_spans > 0
             THEN coalesce(p.n_repeated_spans, 0) * 1.0 / b.n_spans
             ELSE 0.0 END, 6) AS dup_span_ratio,
  CAST(coalesce(rp.n_removed, 0) AS BIGINT) AS esd_removed,
  CAST(coalesce(rc.n_rm, 0) AS BIGINT) AS esd_spans_removed,
  CAST(coalesce(len(rp.ps), 0) AS BIGINT) AS esd_pieces,
  sha256(coalesce(array_to_string(rp.ps, chr(10)), '')) AS esd_sha,
  cc.cdc_chunks,
  cc.cdc_max_tokens,
  cc.cdc_sha
FROM documents d JOIN base b USING (doc_id)
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN rem_pcs rp USING (doc_id)
LEFT JOIN rem_cnt rc USING (doc_id)
JOIN ccdc cc USING (doc_id)
"""

# replays chunk_documents' window geometry exactly: DuckDB 1-based inclusive
# list slices == Spark slice(arr, start, len); same greatest/ceil window count
_CHUNK_DOCUMENTS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(coalesce(text, '')) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS w
  FROM documents
), win AS (
  SELECT doc_id, w, CAST(t.i AS BIGINT) AS chunk_index
  FROM toks, UNNEST(range(0, greatest(1, CAST(ceil((len(w) - 16) / 12.0) AS BIGINT) + 1))) AS t(i)
), chunks AS (
  SELECT doc_id, chunk_index,
         CAST(len(w[chunk_index*12 + 1 : chunk_index*12 + 16]) AS BIGINT) AS n_chunk_tokens,
         array_to_string(w[chunk_index*12 + 1 : chunk_index*12 + 16], ' ') AS chunk,
         sha256(CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_index AS VARCHAR)) AS chunk_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT % 8 AS bucket
  FROM win
), packed AS (
  SELECT *,
         CAST(sum(n_chunk_tokens) OVER (
           PARTITION BY bucket ORDER BY doc_id, chunk_index
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_chunk_tokens AS BIGINT) AS start_offset
  FROM chunks
)
SELECT doc_id, chunk_index, n_chunk_tokens, chunk, chunk_id, bucket,
       start_offset,
       CAST(start_offset // 64 AS BIGINT) AS seq_index,
       CAST(bucket * 1099511627776 + start_offset // 64 AS BIGINT) AS seq_id,
       CAST(start_offset % 64 AS BIGINT) AS offset_in_seq,
       (start_offset % 64 + n_chunk_tokens) > 64 AS crosses_boundary,
       CAST(len(CASE WHEN trim(coalesce(chunk, '')) = '' THEN CAST([] AS VARCHAR[])
                     ELSE regexp_split_to_array(trim(chunk), '\s+') END) AS BIGINT) AS n_input_ids,
       CAST(least(64, max(start_offset + n_chunk_tokens) OVER (PARTITION BY bucket)
                      - (start_offset // 64) * 64) AS BIGINT) AS seq_tokens,
       least(64, max(start_offset + n_chunk_tokens) OVER (PARTITION BY bucket)
                 - (start_offset // 64) * 64) = 64 AS seq_is_full,
       -- per-row contract: the Spark side must verify its REAL BPE
       -- tokenization (decode-roundtrip + subword-count bounds + ledger
       -- agreement) and emit TRUE for every chunk
       true AS bpe_ok
FROM packed
"""


_STREAM_DEDUP_SQL = """
WITH ev AS (SELECT event_id, user_id, event_type, value, epoch(ts) AS t FROM events),
uni AS (SELECT * FROM ev UNION ALL SELECT * FROM ev WHERE event_id % 7 = 0)
SELECT DISTINCT event_id, user_id, event_type, value, t FROM uni
"""


_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id,
    CASE WHEN lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY epoch(ts), event_id) IS NULL
          OR epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY epoch(ts), event_id) > 1800
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
  FROM flagged GROUP BY user_id
),
-- as-of attribution replay with DuckDB's NATIVE ASOF JOIN: each purchase
-- matches the user's greatest click time <= purchase time; tolerance is a
-- post-filter (the as-of match is the unique candidate, so filtering it
-- equals merge_asof's tolerance semantics)
p AS (SELECT user_id, epoch(ts) AS t FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, epoch(ts) AS t FROM events WHERE event_type = 'click'),
att AS (
  SELECT p.user_id, p.t,
         CASE WHEN p.t - c.t <= 1800 THEN c.t END AS ct
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t >= c.t
),
agg AS (
  SELECT user_id, count(*) AS n_purchases, count(ct) AS n_attributed,
         round(avg(t - ct), 6) AS avg_attr_lag
  FROM att GROUP BY user_id
)
SELECT s.user_id, s.n_sessions, s.n_events,
       coalesce(a.n_purchases, 0) AS n_purchases,
       coalesce(a.n_attributed, 0) AS n_attributed,
       a.avg_attr_lag
FROM sessions s LEFT JOIN agg a USING (user_id)
"""


_SLIDING_SQL = """
WITH e AS (SELECT epoch(ts) AS t, event_type, value FROM events),
x AS (
  SELECT t, event_type, value, CAST(floor(t / 300) AS BIGINT) - u.j AS w
  FROM e, UNNEST([0, 1, 2]) AS u(j)
)
SELECT CAST(w * 300 AS DOUBLE) AS window_start, event_type,
       count(*) AS n, round(avg(value), 6) AS avg_value
FROM x GROUP BY 1, 2
"""

# Session windows in exact integer microseconds (epoch_ns // 1000), matching
# Spark's µs timestamp precision; a gap strictly greater than 30 min starts a
# new session (F.session_window merges events exactly gap-distance apart).
_SESSION_WINDOW_SQL = """
WITH o AS (SELECT user_id, epoch_ns(ts) // 1000 AS t_us, event_id FROM events),
flagged AS (
  SELECT user_id, t_us, event_id,
    CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
),
sess AS (
  SELECT user_id, t_us,
    sum(ns) OVER (PARTITION BY user_id ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
wins AS (
  SELECT user_id, round(min(t_us) / 1000000.0, 6) AS session_start,
         round((max(t_us) + 1800000000) / 1000000.0, 6) AS session_end,
         count(*) AS n_events
  FROM sess GROUP BY user_id, sid
),
-- independent containment recount (plain inequality join) of the
-- engine-side interval_join: every event must land in exactly its own
-- session window, so n_events_ij == n_events row for row
ev2 AS (
  SELECT user_id, round((epoch_ns(ts) // 1000) / 1000000.0, 6) AS te FROM events
),
ij AS (
  SELECT w.user_id, w.session_start, count(*) AS n_events_ij
  FROM wins w JOIN ev2 e
    ON e.user_id = w.user_id
   AND e.te >= w.session_start AND e.te <= w.session_end
  GROUP BY 1, 2
),
-- independent overlap recount (plain inequality join) of the engine-side
-- interval_overlap_join: 15-minute outage windows every 4 hours over the
-- session-derived grid
bounds AS (
  SELECT CAST(floor(min(session_start) / 14400.0) AS BIGINT) AS k0,
         CAST(floor(max(session_end) / 14400.0) AS BIGINT) AS k1
  FROM wins
),
outages AS (
  SELECT k * 14400.0 AS os, k * 14400.0 + 900.0 AS oe
  FROM bounds, UNNEST(range(k0, k1 + 1)) AS t(k)
),
ov AS (
  SELECT w.user_id, w.session_start, count(o.os) AS n_outage_windows
  FROM wins w LEFT JOIN outages o
    ON w.session_start <= o.oe AND o.os <= w.session_end
  GROUP BY 1, 2
)
SELECT w.user_id, w.session_start, w.session_end, w.n_events,
       coalesce(i.n_events_ij, 0) AS n_events_ij,
       coalesce(v.n_outage_windows, 0) AS n_outage_windows
FROM wins w LEFT JOIN ij i USING (user_id, session_start)
            LEFT JOIN ov v USING (user_id, session_start)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "ingest_source": _CRITICAL_SELECT,
        "calc_nobs_by_band": (
            "SELECT l_orderkey, "
            "count(*) FILTER (WHERE l_returnflag = 'A') AS nobs_A, "
            "count(*) FILTER (WHERE l_returnflag = 'N') AS nobs_N, "
            "count(*) FILTER (WHERE l_returnflag = 'R') AS nobs_R, "
            "count(*) AS nobs_total FROM lineitem GROUP BY l_orderkey"
        ),
        "prune_sync": (
            _CRITICAL_SELECT
            + " WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 5)"
        ),
        "query_filter": (
            _CRITICAL_SELECT + " WHERE l_extendedprice > 30000 AND l_quantity < 40"
        ),
        "assign_dropna": (
            "SELECT l_orderkey, epoch(l_shipdate) AS t, l_extendedprice, l_quantity, l_returnflag, "
            "l_extendedprice AS flagged FROM lineitem WHERE l_quantity > 25"
        ),
        "flux_to_mag": (
            "SELECT l_orderkey, epoch(l_shipdate) AS t, "
            "round(-2.5 * log10(l_extendedprice) + 25.0, 6) AS mag, "
            "round((2.5 / ln(10)) * (l_quantity / l_extendedprice), 6) AS mag_err "
            "FROM lineitem"
        ),
        "coalesce": (
            "SELECT l_orderkey, coalesce(nullif(l_returnflag, 'N'), 'Z') AS flag2 FROM lineitem"
        ),
        "bin_sources": (
            "SELECT l_orderkey, l_returnflag, "
            "round(avg(epoch(l_shipdate)), 6) AS t, "
            "round(avg(l_extendedprice), 6) AS flux_mean, "
            "round(sqrt(sum(l_quantity * l_quantity)) / count(*), 6) AS err_agg, "
            "count(*) AS bin_count "
            "FROM lineitem GROUP BY l_orderkey, l_returnflag, floor(epoch(l_shipdate) / 604800)"
        ),
        "select_head": (
            "SELECT l_orderkey, l_extendedprice, l_returnflag FROM lineitem "
            "WHERE l_quantity >= 10 AND l_quantity <= 20 "
            "ORDER BY l_orderkey, l_extendedprice, l_returnflag LIMIT 100"
        ),
        "batch_amplitude": (
            "SELECT l_orderkey, round((max(l_extendedprice) - min(l_extendedprice)) / 2, 6) AS amplitude "
            "FROM lineitem GROUP BY l_orderkey"
        ),
        "batch_features": (
            "SELECT l_orderkey, "
            "round((max(l_extendedprice) - min(l_extendedprice)) / 2, 6) AS amplitude, "
            "round(avg(l_extendedprice), 6) AS mean "
            "FROM lineitem GROUP BY l_orderkey"
        ),
        "batch_by_band": (
            "SELECT l_orderkey, "
            "round(avg(l_extendedprice) FILTER (WHERE l_returnflag = 'A'), 6) AS result_A, "
            "round(avg(l_extendedprice) FILTER (WHERE l_returnflag = 'N'), 6) AS result_N, "
            "round(avg(l_extendedprice) FILTER (WHERE l_returnflag = 'R'), 6) AS result_R "
            "FROM lineitem GROUP BY l_orderkey"
        ),
        "merge_orders": (
            "SELECT c.l_orderkey, c.nobs_total, o.o_totalprice FROM "
            "(SELECT l_orderkey, count(*) AS nobs_total FROM lineitem GROUP BY l_orderkey) c "
            "JOIN orders o ON o.o_orderkey = c.l_orderkey"
        ),
        "merge_rollup_nation": (
            "SELECT n_name, count(*) AS n_obs, round(sum(l_extendedprice), 4) AS revenue "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey GROUP BY n_name"
        ),
        # the appended weekly fold phase replays the Spark float expression
        # ((t/P) % 1 + 1) % 1 term-for-term so both engines round the same
        # double to 6 decimals
        # sorted_ok/cohesive_ok assert the storage-contract diagnostics'
        # verdicts (checklist #32): check_sorted and
        # check_lightcurve_cohesion must both report TRUE after
        # sort_lightcurves on the ingest-cohesive layout
        "sort_lightcurves": (
            "SELECT l_orderkey, epoch(l_shipdate) AS t, l_extendedprice, "
            "l_quantity, l_returnflag, "
            "round(mod(mod(epoch(l_shipdate) / 604800.0, 1.0) + 1.0, 1.0), 6) AS phase, "
            "TRUE AS sorted_ok, TRUE AS cohesive_ok "
            "FROM lineitem"
        ),
        # the two bucketed-storage contract booleans (checklist #30) are
        # Spark-side assertions — checksum equality across the parquet
        # and bucketed paths, zero-exchange id aggregation — that the
        # oracle pins to TRUE
        "save_load_roundtrip": (
            "SELECT *, TRUE AS bucketed_match, TRUE AS bucketed_no_exchange FROM ("
            + _CRITICAL_SELECT
            + " UNION ALL SELECT * FROM (VALUES (1, 0.0, 123.5, 1.0, 'Z'), (2, 1.0, 456.5, 2.0, 'Z')))"
        ),
        # replays find_day_gap_offset: occupancy per hour-of-day, then the
        # longest run of empty hours over a doubled (wraparound) 48-slot
        # scan with start < 24; ties keep the earliest start, midpoint
        # becomes a day fraction, -1 when every hour is occupied
        "day_gap_offset": (
            "WITH src AS (SELECT epoch(l_shipdate) AS t FROM lineitem), "
            "occupied AS (SELECT DISTINCT CAST(CAST(floor(t * 24) AS BIGINT) % 24 AS INT) AS hour FROM src), "
            "flags AS (SELECT i AS h, ((i % 24) IN (SELECT hour FROM occupied)) AS occ "
            "FROM range(0, 48) t(i)), "
            "runs AS (SELECT h, occ, h - ROW_NUMBER() OVER (PARTITION BY occ ORDER BY h) AS grp FROM flags), "
            "free_runs AS (SELECT min(h) AS s, max(h) + 1 AS e, count(*) AS len "
            "FROM runs WHERE NOT occ GROUP BY grp), "
            "best AS (SELECT * FROM free_runs WHERE s < 24 ORDER BY len DESC, s ASC LIMIT 1) "
            "SELECT COALESCE((SELECT (((s + e) / 2.0) % 24.0) / 24.0 FROM best), -1.0) AS offset"
        ),
        # deterministic hash sample: md5(id) → [0,1) < frac, identical on
        # both engines, then the object sample semi-joins down to sources
        "sample_objects": (
            "SELECT l_orderkey, epoch(l_shipdate) AS t, l_extendedprice FROM lineitem "
            "WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 13))::BIGINT "
            "/ 4503599627370496.0 < 0.3"
        ),
        # SF² basic with explicit bins: all ordered pairs with positive dt
        # within (id, band) — curves need >= 3 observations and > 1 pair
        # (n>=3 with >=2 distinct times implies both) — bucketed
        # left-closed/right-open with the last edge inclusive, then
        # sf2 = mean(d_flux² − Σerr²), dt = mean(dt) per bucket
        # default 'size' binning degenerates to ONE bin per curve here
        # (<= 21 pairs <= bin_count_target=100; see q_sf2_basic), so the
        # engine-binned result is the plain per-curve pair means; prune(5)
        # filters on TOTAL observations per id before the per-band checks
        "sf2_basic": (
            "WITH src AS ("
            "  SELECT l_orderkey AS id, l_returnflag AS band, epoch(l_shipdate) AS t,"
            "         l_extendedprice AS f, l_quantity AS e FROM lineitem"
            "  WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 5)"
            "), "
            "pairs AS ("
            "  SELECT a.id, a.band, b.t - a.t AS dt, b.f - a.f AS df,"
            "         a.e * a.e + b.e * b.e AS e2"
            "  FROM src a JOIN src b ON a.id = b.id AND a.band = b.band AND b.t > a.t"
            "), "
            "eligible AS ("
            "  SELECT s.id, s.band FROM src s GROUP BY s.id, s.band HAVING count(*) >= 3"
            "), "
            "pair_ok AS ("
            "  SELECT p.id, p.band FROM pairs p JOIN eligible e ON e.id = p.id AND e.band = p.band"
            "  GROUP BY p.id, p.band HAVING count(*) > 1"
            ") "
            "SELECT CAST(p.id AS VARCHAR) AS lc_id, p.band, "
            "round(avg(p.dt), 6) AS dt, round(avg(p.df * p.df - p.e2) / 1e6, 6) AS sf2_m "
            "FROM pairs p JOIN pair_ok k ON k.id = p.id AND k.band = p.band "
            "GROUP BY p.id, p.band"
        ),
        "sf2_fixed_bins": (
            "WITH src AS ("
            "  SELECT l_orderkey AS id, l_returnflag AS band, epoch(l_shipdate) AS t,"
            "         l_extendedprice AS f, l_quantity AS e FROM lineitem"
            "), "
            "pairs AS ("
            "  SELECT a.id, a.band, b.t - a.t AS dt, b.f - a.f AS df,"
            "         a.e * a.e + b.e * b.e AS e2"
            "  FROM src a JOIN src b ON a.id = b.id AND a.band = b.band AND b.t > a.t"
            "), "
            "eligible AS ("
            "  SELECT s.id, s.band FROM src s GROUP BY s.id, s.band HAVING count(*) >= 3"
            "), "
            "pair_ok AS ("
            "  SELECT p.id, p.band FROM pairs p JOIN eligible e ON e.id = p.id AND e.band = p.band"
            "  GROUP BY p.id, p.band HAVING count(*) > 1"
            "), "
            "bucketed AS ("
            "  SELECT p.id, p.band, p.dt, p.df, p.e2,"
            "    CASE WHEN p.dt = 3e8 THEN 4"
            "         WHEN p.dt >= 0 AND p.dt < 1e7 THEN 0"
            "         WHEN p.dt < 5e7 THEN 1"
            "         WHEN p.dt < 1e8 THEN 2"
            "         WHEN p.dt < 2e8 THEN 3"
            "         WHEN p.dt < 3e8 THEN 4"
            "         ELSE -1 END AS bucket"
            "  FROM pairs p JOIN pair_ok k ON k.id = p.id AND k.band = p.band"
            ") "
            "SELECT CAST(id AS VARCHAR) AS lc_id, band, "
            "round(avg(dt), 6) AS dt, round(avg(df * df - e2) / 1e6, 6) AS sf2_m "
            "FROM bucketed WHERE bucket >= 0 GROUP BY id, band, bucket"
        ),
        # combine mode: same pair/bucket construction, aggregated per
        # (band, bucket) across all curves; a band keeps its single curve's
        # id when only one curve contributes differences
        "sf2_combine_fixed_bins": (
            "WITH src AS ("
            "  SELECT l_orderkey AS id, l_returnflag AS band, epoch(l_shipdate) AS t,"
            "         l_extendedprice AS f, l_quantity AS e FROM lineitem"
            "), "
            "eligible AS ("
            "  SELECT id, band FROM src GROUP BY id, band HAVING count(*) >= 3"
            "), "
            "pairs AS ("
            "  SELECT a.id, a.band, b.t - a.t AS dt, b.f - a.f AS df,"
            "         a.e * a.e + b.e * b.e AS e2"
            "  FROM src a JOIN src b ON a.id = b.id AND a.band = b.band AND b.t > a.t"
            "  JOIN eligible el ON el.id = a.id AND el.band = a.band"
            "), "
            "bl AS ("
            "  SELECT band, count(DISTINCT id) AS nc, CAST(max(id) AS VARCHAR) AS only_lc"
            "  FROM pairs GROUP BY band"
            "), "
            "bucketed AS ("
            "  SELECT p.band, p.dt, p.df, p.e2,"
            "    CASE WHEN p.dt = 3e8 THEN 4"
            "         WHEN p.dt >= 0 AND p.dt < 1e7 THEN 0"
            "         WHEN p.dt < 5e7 THEN 1"
            "         WHEN p.dt < 1e8 THEN 2"
            "         WHEN p.dt < 2e8 THEN 3"
            "         WHEN p.dt < 3e8 THEN 4"
            "         ELSE -1 END AS bucket"
            "  FROM pairs p"
            ") "
            "SELECT CASE WHEN bl.nc > 1 THEN 'combined' ELSE bl.only_lc END AS lc_id, "
            "b.band, round(avg(b.dt), 6) AS dt, round(avg(b.df * b.df - b.e2) / 1e6, 6) AS sf2_m "
            "FROM bucketed b JOIN bl ON bl.band = b.band WHERE b.bucket >= 0 "
            "GROUP BY b.band, b.bucket, bl.nc, bl.only_lc"
        ),
        "timeseries_extract": (
            "SELECT l_returnflag AS band, round(epoch(l_shipdate), 6) AS t, "
            "round(l_extendedprice, 6) AS flux, round(l_quantity, 6) AS err "
            "FROM lineitem WHERE l_orderkey = 1"
        ),
        # align_bands replayed with DuckDB's NATIVE ASOF LEFT JOIN (backward:
        # greatest right t <= left t per object) + a tolerance mask the ASOF
        # syntax lacks; only tie-invariant columns are emitted (see the query
        # docstring)
        "align_bands": (
            "WITH a AS (SELECT l_orderkey, epoch(l_shipdate) AS t, l_extendedprice "
            "FROM lineitem WHERE l_returnflag = 'A'), "
            "b AS (SELECT l_orderkey, epoch(l_shipdate) AS t FROM lineitem WHERE l_returnflag = 'R'), "
            "j AS (SELECT a.l_orderkey, a.t, a.l_extendedprice, b.t AS tb "
            "FROM a ASOF LEFT JOIN b ON a.l_orderkey = b.l_orderkey AND a.t >= b.t), "
            # resample replay: MIN-deduped band-R curves of every 97th
            # object, 30-day integer grid, native ASOF both directions,
            # interpolation mirrored in the operator's association order
            "robs AS (SELECT l_orderkey AS id, epoch(l_shipdate) AS t, min(l_extendedprice) AS v "
            "FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey % 97 = 1 GROUP BY id, epoch(l_shipdate)), "
            "rspan AS (SELECT id, min(t) AS tmin, max(t) AS tmax FROM robs GROUP BY id), "
            "rgrid AS (SELECT id, i * 2592000.0 AS tg FROM rspan, "
            "UNNEST(range(CAST(ceil(tmin / 2592000.0) AS BIGINT), CAST(floor(tmax / 2592000.0) AS BIGINT) + 1)) AS g(i)), "
            "rprev AS (SELECT g.id, g.tg, o.t AS tp, o.v AS vp FROM rgrid g ASOF LEFT JOIN robs o "
            "ON g.id = o.id AND g.tg >= o.t), "
            "rnext AS (SELECT g.id, g.tg, o.t AS tn, o.v AS vn FROM rgrid g ASOF LEFT JOIN robs o "
            "ON g.id = o.id AND g.tg <= o.t), "
            "rsj AS (SELECT p.id, p.tg, p.tp, p.vp, n.tn, n.vn FROM rprev p JOIN rnext n "
            "ON p.id = n.id AND p.tg = n.tg) "
            "SELECT 'align' AS part, l_orderkey, round(t, 6) AS t, "
            "CAST(l_extendedprice AS DOUBLE) AS v1, "
            "round(CASE WHEN t - tb <= 2592000.0 THEN tb END, 6) AS v2, "
            "round(CASE WHEN t - tb <= 2592000.0 THEN tb - t END, 6) AS v3 FROM j "
            "UNION ALL "
            "SELECT 'rs' AS part, id AS l_orderkey, round(tg, 6) AS t, "
            "floor((CASE WHEN tp IS NULL OR tn IS NULL THEN NULL "
            "WHEN tn = tp THEN vp "
            "ELSE vp + (vn - vp) * ((tg - tp) / (tn - tp)) END) * 1000000.0 + 0.5) / 1000000.0 AS v1, "
            "round(tp, 6) AS v2, round(tn, 6) AS v3 FROM rsj"
        ),
        # the planted period is re-derived independently; `recovered` = TRUE
        # is the planted-period contract the Spark Lomb-Scargle must meet,
        # and phase_mean replays fold_lightcurves' ((t/P) % 1 + 1) % 1
        # term-for-term (DuckDB mod on doubles is fmod)
        "periodogram_fold": (
            "WITH src AS (SELECT l_suppkey AS sid, epoch(l_shipdate) / 86400.0 AS td, "
            "10.0 + CAST(l_suppkey % 13 AS DOUBLE) AS p FROM lineitem) "
            "SELECT sid, round(p, 6) AS planted_period, count(*) AS n_points, "
            "round(avg(mod(mod(td / p, 1.0) + 1.0, 1.0)), 6) AS phase_mean, "
            "true AS recovered FROM src GROUP BY sid, p"
        ),
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents GROUP BY text"
        ),
        "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
        # the LSH pair lists are engine-hash-specific; their CONTRACT
        # (recall vs an exact pair set the oracle recomputes, zero false
        # positives for the exact-verified embedding path) is deterministic
        # r13: the persisted near-dup store leg — n_store_exact is the
        # arrival↔corpus exact bigram-Jaccard pair count over the SAME
        # derived arrivals the Spark side matches against the saved
        # store (every 31st doc, id+10^7, text || ' tailword'); the
        # store-side booleans are verified in-Spark (scan parity +
        # partition-pruned plan) and required TRUE
        "dedup_minhash_lsh": (
            """
WITH uni AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text || ' tailword' AS text
  FROM documents WHERE doc_id % 31 = 0
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM uni
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS shingle
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT id_a, id_b FROM pairs
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.7
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM j WHERE id_b < 10000000) AS n_exact,
  true AS recall_ok,
  (SELECT CAST(count(*) AS BIGINT) FROM j
   WHERE id_a < 10000000 AND id_b >= 10000000) AS n_store_exact,
  true AS store_recall_ok,
  true AS store_equals_scan,
  true AS store_plan_pruned
"""
        ),
        # SemDeDup clone contract appended r8: the augmented corpus has one
        # identical clone per 9th vector; expected vectors/survivors are
        # derived independently (survivor set correctness is verified
        # in-Spark and required TRUE)
        "embedding_near_dup_lsh": (
            "SELECT CAST(count(*) AS BIGINT) AS n_exact, "
            "CAST(0 AS BIGINT) AS n_false_positive, true AS recall_ok, "
            "(SELECT CAST(count(*) + count(*) FILTER (WHERE vec_id % 9 = 0) AS BIGINT) "
            " FROM embeddings) AS n_sd_vectors, "
            "(SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_sd_survivors, "
            "true AS sd_exact_ok "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.35"
        ),
        # the golden fixture's per-band Stetson J, pinned as literals (the
        # iterative kernel has no SQL form; the constants match the
        # reference's published values within its own 1e-3 tolerance)
        "stetson_j_golden": (
            "SELECT 'g' AS band, CAST(-0.041745 AS DOUBLE) AS stetson_j "
            "UNION ALL SELECT 'r' AS band, CAST(0.607527 AS DOUBLE) AS stetson_j"
        ),
        # the PAA values are procedural (golden-pytest-pinned); the oracle
        # recomputes the pruned query-id set and the top-k cardinality
        "lc_similarity": (
            "SELECT l_orderkey AS query_id, CAST(5 AS BIGINT) AS n_topk, "
            "true AS overlap_ok FROM (SELECT l_orderkey FROM lineitem "
            "GROUP BY l_orderkey HAVING count(*) >= 5 ORDER BY l_orderkey LIMIT 3)"
        ),
        "dedup_clusters": _DEDUP_CLUSTERS_SQL,
        "dedup_simhash": _SIMHASH_SQL,
        "decontaminate": _DECONTAMINATE_SQL,
        "stratified_sample": _STRATIFIED_SAMPLE_SQL,
        "ann_cosine_topk": _ANN_TOPK_SQL,
        "ann_lsh_topk": _ANN_RECALL_SQL,
        "ann_ivf_topk": _ANN_RECALL_PQ_SQL,
        "text_signals": _TEXT_SIGNALS_SQL,
        "doc_fingerprint": _DOC_FINGERPRINT_SQL,
        "multimodal_pipeline": _MM_PIPELINE_SQL,
        # frame i covers bytes [i*64, i*64+64); the last frame is clipped to
        # the payload end (Spark's binary substring past-the-end is empty)
        "multimodal_frame_sample": (
            "SELECT doc_id AS media_id, CAST(i AS INT) AS frame_index, "
            "least(64, greatest(n - i * 64, 0)) AS frame_bytes "
            "FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents), "
            "UNNEST(range(0, least(n // 64, 3) + 1)) AS t(i)"
        ),
        "corpus_filter": _CORPUS_FILTER_SQL,
        # vocab heavy hitters + BM25 retrieval over queries assembled from
        # the ranked vocabulary. The SQL replays the operator's whole
        # determinism contract (operators/retrieval.py): same token grammar
        # ([^a-z0-9]+ on lower), idf quantized to the 1e-6 grid via
        # floor(ln(...)*1e6+0.5), the identical IEEE association order for
        # num/den, per-term floor to integer micro-units, integer sum, and
        # (units DESC, doc_id ASC) top-5.
        "vocab_topk": (
            "WITH w AS (SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word FROM documents), "
            "c AS (SELECT word, count(*) AS freq FROM w WHERE word <> '' GROUP BY word), "
            "v AS (SELECT word, freq, CAST(row_number() OVER (ORDER BY freq DESC, word ASC) AS BIGINT) AS rank "
            "FROM c QUALIFY rank <= 50), "
            "qdef AS (SELECT 'q1' AS query_id, (SELECT word FROM v WHERE rank = 7) AS query_text "
            "UNION ALL SELECT 'q2', (SELECT word FROM v WHERE rank = 3) || ' ' || (SELECT word FROM v WHERE rank = 18) "
            "UNION ALL SELECT 'q3', (SELECT word FROM v WHERE rank = 12) || ' ' || (SELECT word FROM v WHERE rank = 24) "
            "|| ' ' || (SELECT word FROM v WHERE rank = 30)), "
            "qterms AS (SELECT DISTINCT query_id, t AS term FROM "
            "(SELECT query_id, UNNEST(regexp_split_to_array(lower(query_text), '[^a-z0-9]+')) AS t FROM qdef) WHERE t <> ''), "
            "toks AS (SELECT doc_id, t AS term FROM "
            "(SELECT doc_id, UNNEST(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+')) AS t FROM documents) WHERE t <> ''), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
            "st AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT coalesce(sum(dl), 0) FROM dl) AS sumdl), "
            "av AS (SELECT (sumdl * 1.0) / n AS avgdl FROM st), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term), "
            "idf AS (SELECT term, floor(ln(1 + (((SELECT n FROM st) - df) + 0.5) / (df + 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS idf "
            "FROM (SELECT term, count(*) AS df FROM tf GROUP BY term)), "
            "sc AS (SELECT q.query_id, f.doc_id, "
            "CAST(sum(CAST(floor(((1000000.0 * i.idf) * (f.tf * (1.2 + 1.0))) / "
            "(f.tf + 1.2 * ((1.0 - 0.75) + ((0.75 * d.dl) / (SELECT avgdl FROM av)))) + 0.5) AS BIGINT)) AS BIGINT) AS units "
            "FROM qterms q JOIN tf f ON f.term = q.term JOIN idf i ON i.term = q.term JOIN dl d ON d.doc_id = f.doc_id "
            "GROUP BY q.query_id, f.doc_id), "
            "bt AS (SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY units DESC, doc_id ASC) AS BIGINT) AS rank, "
            "doc_id, units FROM sc WHERE units > 0 QUALIFY rank <= 5), "
            # hybrid RRF replay: dense query = embedding of the BM25 top-1
            # doc; cosine rank ties break on id; RRF units are integer
            # division so the fusion is engine-exact given the ranks
            "b1 AS (SELECT query_id, doc_id FROM bt WHERE rank = 1), "
            "qv AS (SELECT b1.query_id, e.embedding FROM b1 JOIN embeddings e ON e.vec_id = b1.doc_id), "
            "dsc AS (SELECT qv.query_id, c.vec_id AS doc_id, "
            "list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(qv.embedding AS DOUBLE[])) AS sim "
            "FROM embeddings c, qv), "
            "dr AS (SELECT query_id, doc_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id ASC) AS BIGINT) AS rank "
            "FROM dsc QUALIFY rank <= 5), "
            "un AS (SELECT query_id, doc_id, 1000000 // (60 + rank) AS u FROM bt "
            "UNION ALL SELECT query_id, doc_id, 1000000 // (60 + rank) AS u FROM dr), "
            "fu AS (SELECT query_id, doc_id, CAST(sum(u) AS BIGINT) AS units FROM un GROUP BY query_id, doc_id), "
            "rf AS (SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY units DESC, doc_id ASC) AS BIGINT) AS rank, "
            "doc_id, units FROM fu QUALIFY rank <= 5) "
            "SELECT 'vocab' AS part, word AS key, rank, CAST(-1 AS BIGINT) AS doc_id, CAST(freq AS BIGINT) AS units FROM v "
            "UNION ALL SELECT 'bm25' AS part, query_id AS key, rank, doc_id, units FROM bt "
            "UNION ALL SELECT 'rrf' AS part, query_id AS key, rank, doc_id, units FROM rf"
        ),
        "events_running_stats": (
            "SELECT user_id, count(value) AS n, round(avg(value), 6) AS mean, "
            "round(coalesce(stddev_samp(value), 0), 6) AS std FROM events GROUP BY user_id"
        ),
        "events_sliding": _SLIDING_SQL,
        "events_session_window": _SESSION_WINDOW_SQL,
        "stream_dedup": _STREAM_DEDUP_SQL,
        "chunk_documents": _CHUNK_DOCUMENTS_SQL,
        "stetson_j": (
            # values aren't SQL-expressible (iterative robust mean) — the
            # contract checks per-band curve counts exactly and asserts the
            # in-Spark block-vs-scalar agreement boolean
            "SELECT l_returnflag AS band, count(DISTINCT l_orderkey) AS n_curves, TRUE AS agree_ok "
            "FROM lineitem WHERE l_orderkey IN "
            "(SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 5) "
            "GROUP BY l_returnflag"
        ),
        "events_sessionize": _SESSIONIZE_SQL,
    }

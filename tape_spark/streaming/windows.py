"""Windowed event-stream operators, batch/stream-unified.

Every aggregation here is expressed with ``F.window`` / ``F.session_window``
so the same function body works on a static DataFrame (batch backfill) and
on a ``readStream`` DataFrame (incremental). On streams, pass ``watermark``
so state is bounded and late data beyond the horizon is dropped — the
standard Structured Streaming late-data contract.

At scale: windowed aggregation state is partitioned by (key, window) and
kept in the state store; watermarks bound its size. The batch equivalents
are plain hash aggregations with map-side partial combine.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-based event stream: new files under ``path`` become
    micro-batches. ``schema`` is required (streaming reads do not infer)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: Optional[str]) -> DataFrame:
    if watermark and df.isStreaming:
        from pyspark.sql import types as T

        if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
            # Externally-written parquet (DuckDB, Hive, pandas) loads
            # timestamps as TIMESTAMP_NTZ, and EventTimeWatermark rejects
            # NTZ outright — every watermarked stream over such a source
            # would fail at start(). The cast interprets the naive value
            # in the SESSION timezone, so it is a pure reinterpretation
            # (no wall-clock shift) ONLY under the engine's
            # session-tz-UTC convention — on any other session tz it
            # would silently shift every instant and move window/eviction
            # boundaries, so verify instead of assume.
            tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
            if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
                raise ValueError(
                    f"{ts_col!r} is TIMESTAMP_NTZ and the session timezone "
                    f"is {tz!r}: casting would reinterpret every naive "
                    "instant as local time and silently shift the "
                    "windows. Set spark.sql.session.timeZone=UTC (the "
                    "engine convention) or cast the column yourself with "
                    "the timezone you mean"
                )
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "15 minutes",
    keys: Optional[List[str]] = None,
    value_col: str = "value",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Non-overlapping time buckets: count + mean per (window, keys)."""
    df = _maybe_watermark(df, ts_col, watermark)
    group = [F.window(F.col(ts_col), window)] + [F.col(k) for k in (keys or [])]
    return (
        df.groupBy(*group)
        .agg(F.count(F.lit(1)).alias("n"), F.avg(value_col).alias("avg_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(keys or []),
            "n",
            "avg_value",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "15 minutes",
    slide: str = "5 minutes",
    keys: Optional[List[str]] = None,
    value_col: str = "value",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Overlapping windows (each event lands in window/slide buckets)."""
    df = _maybe_watermark(df, ts_col, watermark)
    group = [F.window(F.col(ts_col), window, slide)] + [F.col(k) for k in (keys or [])]
    return (
        df.groupBy(*group)
        .agg(F.count(F.lit(1)).alias("n"), F.avg(value_col).alias("avg_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(keys or []),
            "n",
            "avg_value",
        )
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: Optional[List[str]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Sessions: events separated by ≤ ``gap`` merge into one window
    (``F.session_window`` — Spark's built-in stateful session operator)."""
    df = _maybe_watermark(df, ts_col, watermark)
    group = [F.session_window(F.col(ts_col), gap)] + [F.col(k) for k in (keys or [])]
    return (
        df.groupBy(*group)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *(keys or []),
            "n_events",
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "t",
    gap_seconds: float = 1800.0,
    order_cols: Optional[List[str]] = None,
    max_rows_per_key: Optional[int] = None,
) -> DataFrame:
    """Batch sessionization over an epoch-seconds column: per user, a gap
    greater than ``gap_seconds`` starts a new session. Returns per-user
    session and event counts (the batch analog of
    :func:`session_window_agg`, usable when time is a plain double).

    Each user's events sort inside one window partition (bound ~10⁹
    events/key — the documented celebrity-key cliff); opt-in
    ``max_rows_per_key`` raises before the sort naming the hot users
    (see :func:`tape_spark.utils.keys.assert_max_rows_per_key`)."""
    from ..utils.keys import assert_max_rows_per_key

    assert_max_rows_per_key(df, [user_col], max_rows_per_key, "sessionize")
    w = Window.partitionBy(user_col).orderBy(*( [ts_col] + (order_cols or []) ))
    lag = F.lag(ts_col).over(w)
    flagged = df.withColumn(
        "new_session",
        F.when(lag.isNull() | ((F.col(ts_col) - lag) > gap_seconds), 1).otherwise(0),
    )
    return flagged.groupBy(user_col).agg(
        F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


def stream_dedup(
    df: DataFrame,
    keys: Optional[List[str]] = None,
    ts_col: str = "ts",
    watermark: Optional[str] = None,
    within_watermark: bool = False,
) -> DataFrame:
    """Exact deduplication that runs identically on batch and stream — the
    ingest-time guard of a training-data pipeline (drop replayed events /
    re-crawled documents before they reach storage).

    ``keys`` defaults to all columns. On a stream, pass ``watermark`` so the
    dedup state store is bounded: with ``within_watermark=False`` the keys
    must be globally unique per watermark window (``dropDuplicates`` keyed
    state, dropped once the event-time column ages out — the key set must
    then include ``ts_col``); with ``within_watermark=True`` two events with
    the same keys are considered duplicates only when they arrive within
    the watermark delay of each other (``dropDuplicatesWithinWatermark``,
    Spark 3.5+), which is the contract replay/retry traffic wants.

    At scale this is one hash shuffle on the key columns (batch) or
    key-partitioned state-store lookups (stream); use hashed content keys
    (``xxhash64(text)``) rather than raw payloads for 8-byte exchange keys,
    as in :mod:`tape_spark.operators.dedup`.
    """
    cols = list(keys) if keys else df.columns
    streaming = df.isStreaming
    if streaming and watermark:
        df = _maybe_watermark(df, ts_col, watermark)
        if not within_watermark and ts_col not in cols:
            # dropDuplicates state is only evicted when the event-time
            # column is part of the key set. Silently appending it would
            # change the dedup contract (same-key events with different
            # event times would pass through), so make the caller choose.
            raise ValueError(
                f"stream_dedup with a watermark and within_watermark=False "
                f"requires the event-time column {ts_col!r} in keys (state "
                f"eviction is keyed on it); either add it, or use "
                f"within_watermark=True to deduplicate same-key events "
                f"arriving within the watermark delay."
            )
    if streaming and within_watermark:
        return df.dropDuplicatesWithinWatermark(cols)
    return df.dropDuplicates(cols)

"""Structured Streaming window operators: batch/stream parity via a file
stream with availableNow trigger against the same data computed in batch."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tape_spark.streaming import (
    read_event_stream,
    session_window_agg,
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture
def events_pdf():
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for u in range(3):
        for i in range(40):
            rows.append(
                {
                    "ts": base + dt.timedelta(minutes=2 * i + u),
                    "user_id": u,
                    "value": float(i),
                }
            )
        # a second burst after a 2-hour silence → new session
        for i in range(5):
            rows.append(
                {
                    "ts": base + dt.timedelta(hours=4, minutes=3 * i, seconds=u),
                    "user_id": u,
                    "value": float(100 + i),
                }
            )
    return pd.DataFrame(rows)


@pytest.fixture
def events_df(spark, events_pdf):
    return spark.createDataFrame(events_pdf, schema=SCHEMA)


def test_tumbling_window_batch(events_df):
    out = tumbling_window_agg(events_df, window="15 minutes", keys=["user_id"]).toPandas()
    assert (out["n"] > 0).all()
    # every event is in exactly one window
    assert out["n"].sum() == events_df.count()
    assert (out["window_end"] - out["window_start"] == pd.Timedelta(minutes=15)).all()


def test_sliding_window_batch(events_df):
    out = sliding_window_agg(
        events_df, window="15 minutes", slide="5 minutes", keys=["user_id"]
    ).toPandas()
    # each event lands in window/slide = 3 windows
    assert out["n"].sum() == events_df.count() * 3


def test_session_window_batch(events_df):
    out = session_window_agg(events_df, gap="30 minutes", keys=["user_id"]).toPandas()
    # two bursts per user separated by 2h silence → 2 sessions each
    assert len(out) == 6
    assert out.groupby("user_id").size().eq(2).all()
    assert out["n_events"].sum() == events_df.count()


def test_sessionize_epoch_seconds(events_df):
    with_epoch = events_df.withColumn("t", F.col("ts").cast("double"))
    out = sessionize(with_epoch, gap_seconds=1800.0).toPandas()
    assert (out["n_sessions"] == 2).all()
    assert out["n_events"].sum() == events_df.count()


def test_streaming_matches_batch(spark, events_pdf, events_df, tmp_path):
    """availableNow file stream through the same tumbling aggregation must
    reproduce the batch result exactly."""
    src_dir = str(tmp_path / "stream_src")
    events_df.repartition(4).write.parquet(src_dir)

    stream = read_event_stream(spark, src_dir, SCHEMA, max_files_per_trigger=2)
    assert stream.isStreaming
    agg = tumbling_window_agg(
        stream, window="15 minutes", keys=["user_id"], watermark="1 hour"
    )

    query = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = (
        spark.table("tumbling_test")
        .toPandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    expected = (
        tumbling_window_agg(events_df, window="15 minutes", keys=["user_id"])
        .toPandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_running_stats_batch_drops_nan_like_stream(spark):
    """Batch backfill must mirror the streaming state update's NaN policy:
    NaN samples are dropped from n/mean/std, not propagated."""
    from tape_spark.streaming import running_stats

    df = spark.createDataFrame(
        [(1, 1.0), (1, float("nan")), (1, 3.0), (2, float("nan"))],
        "user_id long, value double",
    )
    out = {r["user_id"]: r for r in running_stats(df, keys=["user_id"]).collect()}
    assert out[1]["n"] == 2
    assert out[1]["mean"] == pytest.approx(2.0)
    assert out[2]["n"] == 0 and out[2]["mean"] == 0.0 and out[2]["std"] == 0.0


def test_session_window_stream_matches_batch(spark, events_pdf, events_df, tmp_path):
    """Session windows are the stateful-merge case: the same
    session_window_agg body over an availableNow file stream must converge
    to the batch sessions even when a session's events arrive across
    different micro-batches."""
    src_dir = str(tmp_path / "sess_src")
    events_df.repartition(4).write.parquet(src_dir)

    stream = read_event_stream(spark, src_dir, SCHEMA, max_files_per_trigger=1)
    agg = session_window_agg(stream, gap="30 minutes", keys=["user_id"])

    query = (
        agg.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = (
        spark.table("session_test")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    expected = (
        session_window_agg(events_df, gap="30 minutes", keys=["user_id"])
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_stateful_running_stats_stream_matches_batch(spark, events_pdf, events_df, tmp_path):
    """applyInPandasWithState running stats across multiple micro-batches
    must converge to the batch aggregation."""
    from tape_spark.streaming import running_stats

    src_dir = str(tmp_path / "stateful_src")
    events_df.repartition(6).write.parquet(src_dir)

    stream = read_event_stream(spark, src_dir, SCHEMA, max_files_per_trigger=2)
    stats = running_stats(stream, keys=["user_id"], value_col="value")

    query = (
        stats.writeStream.format("memory")
        .queryName("running_stats_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    # update mode emits one row per key per micro-batch; the final state is
    # the row with the largest n per key
    got = spark.table("running_stats_test").toPandas()
    final = got.sort_values("n").groupby("user_id").last().sort_index()

    expected = (
        running_stats(events_df, keys=["user_id"], value_col="value")
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (final["n"] == expected["n"]).all()
    assert np.allclose(final["mean"], expected["mean"])
    assert np.allclose(final["std"], expected["std"])


def test_stream_dedup_batch(spark, events_df):
    from tape_spark.streaming import stream_dedup

    dup = events_df.union(events_df)  # every row twice
    out = stream_dedup(dup, keys=["user_id", "ts"])
    assert out.count() == events_df.count()
    # keys=None dedups on all columns
    assert stream_dedup(dup).count() == events_df.count()


def test_stream_dedup_stream_matches_batch(spark, events_pdf, events_df, tmp_path):
    """Replayed events through a watermarked streaming dedup must converge
    to the batch-dedup result."""
    from tape_spark.streaming import stream_dedup

    src_dir = str(tmp_path / "dedup_src")
    # write the data twice: the second copy simulates a replay
    events_df.repartition(2).write.parquet(src_dir)
    events_df.repartition(3).write.mode("append").parquet(src_dir)

    stream = read_event_stream(spark, src_dir, SCHEMA, max_files_per_trigger=2)
    deduped = stream_dedup(
        stream, keys=["user_id", "ts"], watermark="10 minutes"
    )
    query = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = (
        spark.table("dedup_test")
        .select("user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    expected = (
        stream_dedup(events_df.union(events_df), keys=["user_id", "ts"])
        .select("user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_stream_dedup_requires_event_time_key_with_watermark(spark, events_df, tmp_path):
    from tape_spark.streaming import stream_dedup

    src_dir = str(tmp_path / "dedup_raise_src")
    events_df.write.parquet(src_dir)
    stream = (
        spark.readStream.schema(events_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    # keys omit the event-time column: dropDuplicates state would grow
    # unboundedly, so the operator must refuse rather than silently widen
    # the key set (which would change the dedup contract)
    with pytest.raises(ValueError, match="event-time column"):
        stream_dedup(stream, keys=["user_id"], ts_col="ts", watermark="10 minutes")
    # within_watermark=True is the sanctioned way to dedup on keys alone
    out = stream_dedup(
        stream, keys=["user_id"], ts_col="ts", watermark="10 minutes", within_watermark=True
    )
    assert out.isStreaming


def test_tumbling_window_watermark_on_ntz_stream(spark, events_df, tmp_path):
    """Externally-written parquet (DuckDB, pandas) loads timestamps as
    TIMESTAMP_NTZ, which EventTimeWatermark rejects outright — the
    watermark path must reinterpret NTZ as UTC (the session convention)
    instead of failing at start(), and the emitted windows must match the
    batch aggregate."""
    src_dir = str(tmp_path / "ntz_src")
    events_df.withColumn("ts", F.col("ts").cast("timestamp_ntz")).repartition(
        2
    ).write.parquet(src_dir)

    ntz_schema = T.StructType(
        [
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = read_event_stream(spark, src_dir, ntz_schema, max_files_per_trigger=1)
    assert isinstance(stream.schema["ts"].dataType, T.TimestampNTZType)
    agg = tumbling_window_agg(
        stream, window="15 minutes", keys=["user_id"], watermark="1 hour"
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("ntz_tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = (
        spark.table("ntz_tumbling_test")
        .toPandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    expected = (
        tumbling_window_agg(events_df, window="15 minutes", keys=["user_id"])
        .toPandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_stream_minhash_matches_stream_equals_batch(spark, tmp_path):
    """Streaming near-dup against a static signature store: the arriving
    docs are matched per micro-batch with the same seeded kernel and
    banded join as the batch path, so the appended pair stream must equal
    the batch invocation row-for-row — and planted near-copies of corpus
    docs must be found."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import stream_minhash_matches

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus_rows = [
        (100 + i, f"{base} doc{i} " + " ".join(f"c{i}w{j}" for j in range(10)))
        for i in range(8)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    sigs = minhash_signatures(corpus).persist()

    # arriving docs: 0-3 are near copies of corpus docs (shared long
    # prefix), 4-7 are fresh vocabulary (no match)
    arriving_rows = [
        (i, corpus_rows[i][1] + " extra tail") for i in range(4)
    ] + [
        (i, " ".join(f"new{i}w{j}" for j in range(20))) for i in range(4, 8)
    ]
    arriving = spark.createDataFrame(arriving_rows, "doc_id long, text string")

    want = sorted(
        tuple(r)
        for r in stream_minhash_matches(arriving, sigs, threshold=0.3).collect()
    )
    assert want, "planted near-copies must match in batch mode"
    assert {r[0] for r in want} <= {0, 1, 2, 3}
    assert all(r[0] + 100 == r[1] for r in want)  # each matches ITS source

    src_dir = str(tmp_path / "neardup_src")
    arriving.repartition(3).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = stream_minhash_matches(stream, sigs, threshold=0.3)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("neardup_test").collect())
    assert got == want
    sigs.unpersist()


def test_stream_minhash_matches_validates_signature_length(spark):
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import stream_minhash_matches

    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    sigs = minhash_signatures(corpus, num_hashes=32)
    with pytest.raises(ValueError, match="32-hash"):
        stream_minhash_matches(corpus, sigs, num_hashes=64)
    with pytest.raises(ValueError, match="must divide"):
        stream_minhash_matches(corpus, sigs, num_hashes=32, bands=5)


def test_stream_minhash_matches_detects_32bit_store(spark):
    """A 32-bit signature store probed with the default kernel must still
    match: the stream side derives its width from the TABLE's element
    type (a 64-bit stream signature against 32-bit stored minima compares
    int vs long and silently returns empty — the sf100 probe's bug)."""
    from pyspark.sql import types as T

    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import stream_minhash_matches

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    sigs32 = minhash_signatures(corpus, signature_bits=32)
    assert isinstance(sigs32.schema["signature"].dataType.elementType, T.IntegerType)
    arriving = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon zeta eta theta iota kappa tail")],
        "doc_id long, text string",
    )
    rows = stream_minhash_matches(arriving, sigs32, threshold=0.3).collect()
    assert len(rows) == 1 and rows[0]["corpus_id"] == 1
    # a non-signature table is refused, not silently mismatched
    bad = corpus.select("doc_id", F.split("text", " ").alias("signature"))
    with pytest.raises(ValueError, match="element type"):
        stream_minhash_matches(arriving, bad)


def test_curation_scorers_run_on_streams(spark, tmp_path):
    """The curation scorers are codegen / broadcast-literal projections,
    so they must run unchanged on a micro-batch stream — the 'score
    documents as they arrive' pipeline — and append exactly the batch
    results."""
    from tape_spark.operators import nb_score, text_signals, train_nb_classifier

    docs = spark.createDataFrame(
        [(i, ("the quick brown fox " * (1 + i % 4)).strip()) for i in range(24)],
        "doc_id long, text string",
    )
    model = train_nb_classifier(docs, label_expr="length(text) > 40")
    src_dir = str(tmp_path / "score_src")
    docs.repartition(3).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = nb_score(stream, model).join(
        text_signals(stream, rep_n=2).select("doc_id", "n_tokens", "pred_lang"),
        "doc_id",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("stream_scores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("stream_scores").collect())
    want = sorted(
        tuple(r)
        for r in nb_score(docs, model)
        .join(text_signals(docs, rep_n=2).select("doc_id", "n_tokens", "pred_lang"), "doc_id")
        .collect()
    )
    assert got == want and len(got) == 24


def test_stream_minhash_matches_column_order_independent(spark):
    """The store id column is resolved by NAME: a (signature, id)-ordered
    table must give the same matches as (id, signature), and a store with
    extra columns must raise instead of guessing."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import stream_minhash_matches

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(25))) for i in range(8)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, id_col="doc_id").persist()
    arriving = docs.select((F.col("doc_id") + 100).alias("doc_id"), "text")

    def run(store):
        return sorted(
            (r.doc_id, r.corpus_id)
            for r in stream_minhash_matches(arriving, store, threshold=0.5).collect()
        )

    normal = run(sigs.select("doc_id", "signature"))
    flipped = run(sigs.select("signature", "doc_id"))
    assert normal == flipped and len(normal) == 8  # each copy matches its source

    with _pytest.raises(ValueError, match="id, signature"):
        stream_minhash_matches(arriving, sigs.withColumn("extra", F.lit(1)))


def test_ntz_watermark_requires_utc_session(spark, tmp_path):
    """The NTZ->timestamp watermark cast is a pure reinterpretation only
    under session-tz UTC; any other session tz must raise instead of
    silently shifting every window boundary."""
    import os

    import pandas as pd
    import pytest as _pytest

    from tape_spark.streaming import read_event_stream, tumbling_window_agg

    src = str(tmp_path / "ntz_tz")
    os.makedirs(src, exist_ok=True)
    pd.DataFrame(
        {"ts": pd.to_datetime(
            ["2024-01-01 00:00:01", "2024-01-01 00:20:00"]
         ).astype("datetime64[us]"),  # Spark cannot read NANOS parquet
         "value": [1.0, 2.0]}
    ).to_parquet(os.path.join(src, "part.parquet"))
    schema = spark.read.parquet(src).schema
    stream = read_event_stream(spark, src, schema)

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with _pytest.raises(ValueError, match="session timezone"):
            tumbling_window_agg(stream, ts_col="ts", watermark="10 minutes")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # UTC session: plan builds without raising
        tumbling_window_agg(stream, ts_col="ts", watermark="10 minutes")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


# ---------------------------------------------------------------------------
# Partitioned near-dup store: per-trigger cost ∝ arrivals, not corpus.
# ---------------------------------------------------------------------------


def _neardup_corpus(spark, n=8, id_base=100):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (id_base + i, f"{base} doc{i} " + " ".join(f"c{i}w{j}" for j in range(10)))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_store_matches_equal_full_scan(spark, tmp_path):
    """minhash_match_batch against the partitioned store must return
    EXACTLY the rows stream_minhash_matches returns against the full
    signature table — same kernel, same verify, same threshold — while
    its store read carries a pbucket partition IN-filter."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_match_batch,
        minhash_save_store,
        stream_minhash_matches,
    )

    corpus_rows, corpus = _neardup_corpus(spark)
    sigs = minhash_signatures(corpus).persist()
    store = str(tmp_path / "nd_store")
    minhash_save_store(sigs, store, num_entry_buckets=8, num_sig_buckets=4)

    arriving = spark.createDataFrame(
        [(i, corpus_rows[i][1] + " extra tail") for i in range(4)]
        + [(i, " ".join(f"new{i}w{j}" for j in range(20))) for i in range(4, 8)],
        "doc_id long, text string",
    )
    want = sorted(
        tuple(r) for r in stream_minhash_matches(arriving, sigs, threshold=0.3).collect()
    )
    assert want and {r[0] for r in want} <= {0, 1, 2, 3}
    out = minhash_match_batch(arriving, store, threshold=0.3)
    got = sorted(tuple(r) for r in out.collect())
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    segs = plan.split("PartitionFilters")[1:]
    assert any("pbucket" in s[:300] for s in segs), plan
    assert any("sbucket" in s[:300] for s in segs), plan
    sigs.unpersist()


def test_minhash_store_append_grows_matches(spark, tmp_path):
    """Appending new docs to the store makes later batches match them —
    the incremental-ingest loop — with the kernel params taken from the
    store meta, not re-declared by the caller."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_append_store,
        minhash_match_batch,
        minhash_save_store,
    )

    corpus_rows, corpus = _neardup_corpus(spark, n=4)
    store = str(tmp_path / "nd_store2")
    minhash_save_store(minhash_signatures(corpus), store, num_entry_buckets=4, num_sig_buckets=4)

    newdoc = spark.createDataFrame(
        [(500, " ".join(f"fresh{j} vocab{j}" for j in range(15)))],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(9, " ".join(f"fresh{j} vocab{j}" for j in range(15)) + " tail")],
        "doc_id long, text string",
    )
    assert minhash_match_batch(probe, store, threshold=0.3).count() == 0
    minhash_append_store(newdoc, store)
    rows = minhash_match_batch(probe, store, threshold=0.3).collect()
    assert len(rows) == 1 and rows[0]["corpus_id"] == 500


def test_minhash_store_foreach_batch_stream(spark, tmp_path):
    """End-to-end streaming run through foreachBatch: matches equal the
    full-scan batch result, and append_arrivals=True lets a later trigger
    match a doc that arrived in an earlier one."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_match_foreach_batch,
        minhash_save_store,
        stream_minhash_matches,
    )

    corpus_rows, corpus = _neardup_corpus(spark)
    sigs = minhash_signatures(corpus).persist()
    store = str(tmp_path / "nd_store3")
    minhash_save_store(sigs, store, num_entry_buckets=8, num_sig_buckets=4)

    arriving = spark.createDataFrame(
        [(i, corpus_rows[i][1] + " extra tail") for i in range(4)]
        + [(i, " ".join(f"new{i}w{j}" for j in range(20))) for i in range(4, 8)],
        "doc_id long, text string",
    )
    want = sorted(
        (r[0], r[1])
        for r in stream_minhash_matches(arriving, sigs, threshold=0.3).collect()
    )

    src_dir = str(tmp_path / "nd_src")
    # deterministic trigger split: ids 0-3 (the matchers) first, 4-7 after
    arriving.filter("doc_id < 4").coalesce(1).write.parquet(src_dir)
    arriving.filter("doc_id >= 4").coalesce(1).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    got = []
    q = (
        stream.writeStream.foreachBatch(
            minhash_match_foreach_batch(
                store,
                lambda df, bid: got.extend((r[0], r[1]) for r in df.collect()),
                threshold=0.3,
                append_arrivals=True,
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == want

    # the arrivals were appended: a copy of arriving doc 5 now matches it
    from tape_spark.streaming import minhash_match_batch

    probe = spark.createDataFrame(
        [(99, " ".join(f"new5w{j}" for j in range(20)) + " tail")],
        "doc_id long, text string",
    )
    rows = minhash_match_batch(probe, store, threshold=0.3).collect()
    assert [r["corpus_id"] for r in rows] == [5]
    sigs.unpersist()


def test_minhash_store_validations(spark, tmp_path):
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_match_batch,
        minhash_save_store,
        stream_minhash_matches,
    )

    _, corpus = _neardup_corpus(spark, n=2)
    sigs = minhash_signatures(corpus)
    with pytest.raises(ValueError, match="must divide"):
        minhash_save_store(sigs, str(tmp_path / "bad"), bands=5)
    with pytest.raises(ValueError, match="id, signature"):
        minhash_save_store(
            sigs.withColumn("extra", F.lit(1)), str(tmp_path / "bad2")
        )
    store = str(tmp_path / "ok")
    minhash_save_store(sigs, store, num_entry_buckets=4, num_sig_buckets=4)
    with pytest.raises(ValueError, match="distinct corpus_id_col"):
        minhash_match_batch(corpus, store, corpus_id_col="doc_id")
    with pytest.raises(ValueError, match="distinct corpus_id_col"):
        stream_minhash_matches(corpus, sigs, id_col="doc_id", corpus_id_col="doc_id")


def test_sessionize_max_rows_per_key_guard(spark):
    from tape_spark.streaming import sessionize

    ev = spark.createDataFrame(
        [(7, float(i)) for i in range(100)] + [(8, 1.0)],
        "user_id long, t double",
    )
    with pytest.raises(ValueError, match="user_id=7.*100 rows"):
        sessionize(ev, max_rows_per_key=50)
    out = sessionize(ev, max_rows_per_key=500).collect()
    assert {(r.user_id, r.n_events) for r in out} == {(7, 100), (8, 1)}


def test_minhash_compact_store_preserves_matches(spark, tmp_path):
    import glob
    import os

    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_append_store,
        minhash_compact_store,
        minhash_match_batch,
        minhash_save_store,
    )

    corpus_rows, corpus = _neardup_corpus(spark)
    store = str(tmp_path / "nd_compact")
    minhash_save_store(
        minhash_signatures(corpus.filter("doc_id < 104")), store,
        num_entry_buckets=8, num_sig_buckets=4,
    )
    minhash_append_store(corpus.filter("doc_id >= 104 and doc_id < 106"), store)
    minhash_append_store(corpus.filter("doc_id >= 106"), store)
    probe = spark.createDataFrame(
        [(i, corpus_rows[i][1] + " tail") for i in range(8)],
        "doc_id long, text string",
    )
    before = sorted(tuple(r) for r in minhash_match_batch(probe, store, threshold=0.3).collect())
    assert {r[1] for r in before} >= {100, 104, 107}  # spans all generations
    minhash_compact_store(spark, store)
    after = sorted(tuple(r) for r in minhash_match_batch(probe, store, threshold=0.3).collect())
    assert after == before
    for sub, part in (("entries", "pbucket"), ("sigs", "sbucket")):
        for d in glob.glob(f"{store}/{sub}/{part}=*"):
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, d


def test_minhash_store_rejects_non_integral_ids(spark, tmp_path):
    """String ids would cast to NULL store keys and every match would be
    silently empty — save/append/match must refuse them loudly."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_append_store,
        minhash_match_batch,
        minhash_save_store,
    )

    str_docs = spark.createDataFrame(
        [("doc-a", "alpha beta gamma delta"), ("doc-b", "epsilon zeta eta theta")],
        "doc_id string, text string",
    )
    with pytest.raises(TypeError, match="integral"):
        minhash_save_store(minhash_signatures(str_docs), str(tmp_path / "s"))
    _, corpus = _neardup_corpus(spark, n=2)
    store = str(tmp_path / "ok")
    minhash_save_store(
        minhash_signatures(corpus), store, num_entry_buckets=4, num_sig_buckets=4
    )
    with pytest.raises(TypeError, match="integral"):
        minhash_append_store(str_docs, store)
    with pytest.raises(TypeError, match="integral"):
        minhash_match_batch(str_docs, store)


def test_minhash_append_store_batch_id_idempotent(spark, tmp_path):
    """With batch_id the ingest verb is exactly-once under retries: a
    full replay is a marker-checked no-op, and a half-applied retry
    (sigs landed, entries missing) replaces instead of duplicating."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_append_store,
        minhash_match_batch,
        minhash_save_store,
    )
    from tape_spark.streaming.neardup import _sig_rows
    from tape_spark.utils.io import append_partitioned_batch

    from pyspark.sql import functions as F

    corpus_rows, corpus = _neardup_corpus(spark, n=4)
    store = str(tmp_path / "nd_bid")
    minhash_save_store(
        minhash_signatures(corpus), store, num_entry_buckets=4, num_sig_buckets=4
    )
    newdoc = spark.createDataFrame(
        [(500, " ".join(f"fresh{j} vocab{j}" for j in range(15)))],
        "doc_id long, text string",
    )
    minhash_append_store(newdoc, store, batch_id="t1")
    n_sigs = spark.read.parquet(f"{store}/sigs").count()
    n_entries = spark.read.parquet(f"{store}/entries").count()
    # full replay: no-op
    minhash_append_store(newdoc, store, batch_id="t1")
    assert spark.read.parquet(f"{store}/sigs").count() == n_sigs
    assert spark.read.parquet(f"{store}/entries").count() == n_entries

    # half-applied crash window for a NEW batch: sigs landed (tagged),
    # entries + marker missing — the retry must replace, not duplicate
    doc2 = spark.createDataFrame(
        [(501, " ".join(f"other{j} word{j}" for j in range(15)))],
        "doc_id long, text string",
    )
    from tape_spark.streaming.neardup import _arrival_signatures, _load_store_meta

    meta = _load_store_meta(spark, store)
    sig2 = _arrival_signatures(doc2, meta, "text", "doc_id").select(
        F.col("doc_id").alias("corpus_id"), "signature"
    )
    append_partitioned_batch(
        _sig_rows(sig2, "corpus_id", meta["num_sig_buckets"]),
        "sbucket", ["corpus_id"], f"{store}/sigs", "t2",
    )
    minhash_append_store(doc2, store, batch_id="t2")
    assert (
        spark.read.parquet(f"{store}/sigs").filter("corpus_id = 501").count() == 1
    )
    probe = spark.createDataFrame(
        [(9, " ".join(f"other{j} word{j}" for j in range(15)) + " tail")],
        "doc_id long, text string",
    )
    rows = minhash_match_batch(probe, store, threshold=0.3).collect()
    assert [r["corpus_id"] for r in rows] == [501]


def test_minhash_compact_refuses_half_applied_batch(spark, tmp_path):
    """Compacting while a batch's tagged files lack a completion marker
    would erase the tags its retry needs — refuse, then succeed after
    the retry completes the batch."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_append_store,
        minhash_compact_store,
        minhash_save_store,
    )
    from tape_spark.streaming.neardup import (
        _arrival_signatures,
        _load_store_meta,
        _sig_rows,
    )
    from tape_spark.utils.io import append_partitioned_batch

    corpus_rows, corpus = _neardup_corpus(spark, n=4)
    store = str(tmp_path / "nd_refuse")
    minhash_save_store(
        minhash_signatures(corpus), store, num_entry_buckets=4, num_sig_buckets=4
    )
    doc = spark.createDataFrame(
        [(700, " ".join(f"zz{j} kk{j}" for j in range(15)))],
        "doc_id long, text string",
    )
    meta = _load_store_meta(spark, store)
    sig = _arrival_signatures(doc, meta, "text", "doc_id").select(
        F.col("doc_id").alias("corpus_id"), "signature"
    )
    append_partitioned_batch(
        _sig_rows(sig, "corpus_id", meta["num_sig_buckets"]),
        "sbucket", ["corpus_id"], f"{store}/sigs", "t9",
    )
    with _pytest.raises(ValueError, match="half-applied.*t9"):
        minhash_compact_store(spark, store)
    minhash_append_store(doc, store, batch_id="t9")
    info = minhash_compact_store(spark, store)
    assert info["entries_files_before"] >= 1


def test_foreach_batch_replay_idempotent_append(spark, tmp_path):
    """Re-invoking the foreachBatch fn with the SAME micro-batch id (what
    a restarted stream does for an uncommitted trigger) must not grow the
    store twice — the streaming exactly-once contract for store growth."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_match_foreach_batch,
        minhash_save_store,
    )

    corpus_rows, corpus = _neardup_corpus(spark, n=4)
    store = str(tmp_path / "nd_replay")
    minhash_save_store(
        minhash_signatures(corpus), store, num_entry_buckets=4, num_sig_buckets=4
    )
    batch = spark.createDataFrame(
        [(800, " ".join(f"rep{j} lay{j}" for j in range(15)))],
        "doc_id long, text string",
    )
    got = []
    fn = minhash_match_foreach_batch(
        store, lambda df, bid: got.extend(df.collect()),
        threshold=0.3, append_arrivals=True,
    )
    fn(batch, 7)
    n_sigs = spark.read.parquet(f"{store}/sigs").count()
    fn(batch, 7)  # replay of the same trigger
    assert spark.read.parquet(f"{store}/sigs").count() == n_sigs
    assert spark.read.parquet(f"{store}/batches").count() == 1


def test_minhash_rebucket_store_preserves_matches(spark, tmp_path):
    """Rebucketing changes only the partition assignment (band/bucket
    values are signature-derived): matches are bit-identical across the
    rewrite and the new moduli land in meta."""
    from tape_spark.operators import minhash_signatures
    from tape_spark.streaming import (
        minhash_match_batch,
        minhash_rebucket_store,
        minhash_save_store,
    )
    from tape_spark.streaming.neardup import _load_store_meta

    corpus_rows, corpus = _neardup_corpus(spark)
    store = str(tmp_path / "nd_rb")
    minhash_save_store(
        minhash_signatures(corpus), store, num_entry_buckets=4, num_sig_buckets=2
    )
    probe = spark.createDataFrame(
        [(9, corpus_rows[2][1] + " tail"), (10, corpus_rows[5][1] + " x")],
        "doc_id long, text string",
    )

    def snap():
        return sorted(
            tuple(r) for r in minhash_match_batch(probe, store, threshold=0.3).collect()
        )

    want = snap()
    assert want  # non-trivial fixture
    info = minhash_rebucket_store(
        spark, store, num_entry_buckets=16, num_sig_buckets=8
    )
    assert info["num_entry_buckets"] == (4, 16)
    meta = _load_store_meta(spark, store)
    assert (meta["num_entry_buckets"], meta["num_sig_buckets"]) == (16, 8)
    assert snap() == want
    import os

    parts = [d for d in os.listdir(f"{store}/entries") if d.startswith("pbucket=")]
    assert len(parts) > 4  # layout actually moved


def test_bm25_rebucket_index_preserves_queries(spark, tmp_path):
    """Same contract for the BM25 index: scores bit-identical, stats
    stamps preserved, modulus updated on every stats row."""
    from tape_spark.operators import (
        bm25_append_index,
        bm25_build_index,
        bm25_load_index,
        bm25_rebucket_index,
        bm25_save_index,
        bm25_topk_indexed,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} w{i % 3} gamma") for i in range(30)],
        "doc_id long, text string",
    )
    base = docs.filter("doc_id < 20")
    batch = docs.filter("doc_id >= 20")
    path = str(tmp_path / "bm_rb")
    p, s = bm25_build_index(base, num_term_buckets=4)
    bm25_save_index(p, s, path)
    bm25_append_index(batch, path, batch_id="g7")
    queries = [("q1", "alpha w1"), ("q2", "gamma w0")]

    def snap():
        pp, ss = bm25_load_index(spark, path)
        return sorted(
            tuple(r) for r in bm25_topk_indexed(pp, ss, queries, k=5).collect()
        )

    want = snap()
    assert want
    info = bm25_rebucket_index(spark, path, num_term_buckets=16)
    assert info["num_term_buckets"] == ([4], 16)
    assert snap() == want
    srows = spark.read.parquet(f"{path}/stats").collect()
    assert {int(r["num_term_buckets"]) for r in srows} == {16}
    assert sorted(r["batch_id"] for r in srows if r["batch_id"]) == ["g7"]
    # a retried append of the already-applied batch stays a no-op
    bm25_append_index(batch, path, batch_id="g7")
    assert snap() == want

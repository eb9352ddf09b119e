"""End-to-end pretraining-ingest pipeline: corpus_filter → chunk_documents
→ stream_dedup → tokenize_chunks — the shape a real training-data job
chains, with row-count invariants at every boundary.

Each stage is individually oracle- or pytest-checked elsewhere; this file
locks the COMPOSITION: the gate's keep-set drives the chunker, chunk ids
survive a replayed-ingest dedup, and the tokenizer hook consumes the chunk
table unchanged.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tape_spark.operators import chunk_documents, corpus_filter, tokenize_chunks
from tape_spark.streaming import stream_dedup


@pytest.fixture
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and then it naps in the sun all day"),
        (1, "data pipelines shuffle and sort and the tokens flow to the trainer in order"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),  # repetitive
        (3, "a b"),  # too short
        (4, "the engine reads the parquet and it keeps the partitions narrow for the scan"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_filter_chunk_dedup_tokenize_chain(spark, corpus):
    # stage 1: quality gate — repetitive + too-short docs drop
    gate = corpus_filter(corpus, min_tokens=5, max_rep_ratio=0.5, min_stop_ratio=0.0)
    kept = corpus.join(gate.filter("keep").select("doc_id"), "doc_id")
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert kept_ids == {0, 1, 4}

    # stage 2: chunk the surviving docs (window 6, overlap 2 → stride 4)
    chunks = chunk_documents(kept, chunk_tokens=6, overlap_tokens=2)
    cp = chunks.toPandas()
    # every kept doc produced chunks; no dropped doc leaked through
    assert set(cp["doc_id"]) == kept_ids
    # chunk ids are globally unique and token coverage is exact: with
    # stride 4 and window 6, token counts sum to n + 2 * (n_chunks - 1)
    assert cp["chunk_id"].is_unique
    for doc_id, grp in cp.groupby("doc_id"):
        n_tokens = len(
            kept.filter(F.col("doc_id") == doc_id).collect()[0].text.split()
        )
        assert grp["n_chunk_tokens"].sum() == n_tokens + 2 * (len(grp) - 1)

    # stage 3: replayed ingest — a re-crawled batch of chunks arrives
    # again; content-keyed stream_dedup restores exactly one row per chunk
    replay = chunks.filter(F.col("chunk_index") == 0)
    deduped = stream_dedup(chunks.unionAll(replay), keys=["chunk_id"])
    assert deduped.count() == len(cp)
    # survivors are byte-identical to the originals (full-row set equality)
    orig = {tuple(r) for r in cp.itertuples(index=False)}
    got = {tuple(r) for r in deduped.toPandas().itertuples(index=False)}
    assert got == orig

    # stage 4: tokenizer hook — default deterministic tokenizer preserves
    # the whitespace token count, one id list per chunk
    toks = tokenize_chunks(deduped).toPandas()
    assert len(toks) == len(cp)
    merged = toks.merge(cp[["chunk_id", "n_chunk_tokens"]], on="chunk_id")
    assert (merged["n_input_ids"] == merged["n_chunk_tokens"]).all()
    assert merged["input_ids"].map(len).equals(merged["n_input_ids"].map(int))

    # stage 5: sequence packing — every chunk lands in exactly one stream
    # position; per-bucket offsets tile the stream with no gaps/overlaps
    from tape_spark.operators import pack_sequences

    packed = pack_sequences(deduped, budget=10, num_buckets=2).toPandas()
    assert len(packed) == len(cp)
    for _, grp in packed.groupby("bucket"):
        g = grp.sort_values(["doc_id", "chunk_index"])
        expect_start = g["n_chunk_tokens"].cumsum().shift(fill_value=0)
        assert (g["start_offset"].values == expect_start.values).all()
        assert (g["seq_index"] == g["start_offset"] // 10).all()


def test_tokenize_chunks_custom_tokenizer(spark, corpus):
    chunks = chunk_documents(corpus, chunk_tokens=8)

    def char_pairs(s):
        return [ord(c) for c in s.replace(" ", "")][:4]

    out = tokenize_chunks(chunks, tokenizer=char_pairs).toPandas()
    assert (out["n_input_ids"] <= 4).all()
    row = out.merge(chunks.toPandas()[["chunk_id", "chunk"]], on="chunk_id").iloc[0]
    assert row["input_ids"] == [ord(c) for c in row["chunk"].replace(" ", "")][:4]


def test_chunk_pipeline_runs_on_a_stream(spark, corpus, tmp_path):
    """The chunk → dedup-keyed ingest shape is stream-capable: the same
    chunk_documents projection applied to a file stream (availableNow)
    reproduces the batch chunk table exactly — chunking is stateless, so
    streaming corpus ingest reuses the identical operator."""
    src_dir = str(tmp_path / "docs_stream")
    corpus.repartition(2).write.parquet(src_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    assert stream.isStreaming
    chunks = chunk_documents(stream, chunk_tokens=6, overlap_tokens=2)
    query = (
        chunks.writeStream.format("memory")
        .queryName("chunk_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = spark.sql("SELECT * FROM chunk_stream_test").toPandas()
    want = chunk_documents(corpus, chunk_tokens=6, overlap_tokens=2).toPandas()
    key = ["doc_id", "chunk_index"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns]
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want)


def test_full_corpus_curation_chain(spark):
    """The complete pretraining corpus pipeline, every stage an engine
    operator: signals → quality gate → near-dup clusters → best-copy
    resolution → benchmark decontamination → mixture sampling → chunking
    → packing. Row-count/containment invariants at every boundary."""
    from tape_spark.operators import (
        chunk_documents,
        corpus_filter,
        decontaminate,
        dedup_clusters,
        pack_sequences,
        resolve_duplicates,
        stratified_sample,
        text_signals,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank", "en"),
        (1, "the quick brown fox jumps over the lazy dog near the river bend", "en"),  # near-dup of 0
        (2, "ein ganz anderer text über daten und die verarbeitung von daten", "de"),
        (3, "spam spam spam spam spam spam spam spam spam spam", "en"),  # repetitive
        (4, "the engine reads the parquet and keeps all the partitions narrow", "en"),
        (5, "what does the quick brown fox do", "en"),  # benchmark doc
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    bench_set = docs.filter(F.col("doc_id") == 5)
    train = docs.filter(F.col("doc_id") != 5)

    # quality gate
    sig = text_signals(train)
    gate = corpus_filter(train, min_tokens=5, max_rep_ratio=0.5, min_stop_ratio=0.0)
    kept = train.join(gate.filter("keep").select("doc_id"), "doc_id")
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert kept_ids == {0, 1, 2, 4}
    assert {r.doc_id for r in sig.collect()} == {0, 1, 2, 3, 4}

    # near-dup resolution: 0 and 1 cluster together; longer text survives
    qual = kept.withColumn("n_chars", F.length("text"))
    clusters = dedup_clusters(qual, n=2, threshold=0.5)
    comp = {r["doc_id"]: r["component"] for r in clusters.collect()}
    assert comp.keys() == {0, 1} and len(set(comp.values())) == 1
    resolved = resolve_duplicates(qual, clusters, quality_col="n_chars")
    resolved_ids = {r.doc_id for r in resolved.collect()}
    assert resolved_ids == {0, 2, 4}  # equal length → smaller id wins

    # decontamination vs the benchmark doc: doc 0 shares 'the quick brown
    # fox' n-grams; 2 and 4 are clean
    deco = decontaminate(resolved, bench_set, n=3)
    flags = {r["doc_id"]: r["is_contaminated"] for r in deco.collect()}
    assert flags[0] and not flags[2] and not flags[4]
    clean = resolved.join(
        deco.filter(~F.col("is_contaminated")).select("doc_id"), "doc_id"
    )

    # mixture draw at rate 1.0 (keep the tiny corpus whole), then chunk+pack
    sampled = stratified_sample(clean, "lang", {"en": 1.0, "de": 1.0}, id_col="doc_id")
    assert {r.doc_id for r in sampled.collect()} == {2, 4}
    chunks = chunk_documents(sampled, chunk_tokens=5, overlap_tokens=0)
    packed = pack_sequences(chunks, budget=8, num_buckets=1).toPandas()
    # exact tiling, replayed independently: with one bucket, each chunk's
    # start offset must equal the running token total of all chunks before
    # it in (doc_id, chunk_index) order — no gaps, no double-claims
    ordered = packed.sort_values(["doc_id", "chunk_index"]).reset_index(drop=True)
    expect_start = ordered["n_chunk_tokens"].cumsum().shift(fill_value=0)
    assert (ordered["start_offset"].values == expect_start.values).all()
    assert (ordered["seq_index"] == ordered["start_offset"] // 8).all()

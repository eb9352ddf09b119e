"""Data-pipeline operator tests: dedup, similarity search, text analysis,
multimodal plumbing (the beyond-reference surface)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tape_spark.operators import (
    cosine_topk,
    document_fingerprint,
    embedding_near_duplicates,
    exact_dedup,
    language_id,
    lsh_cosine_topk,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_signatures,
    text_quality,
    token_count,
)
from tape_spark.operators.multimodal import attach_binary_payload, decode_media, frame_sample


@pytest.fixture
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),  # near dup
        (3, "der schnelle braune fuchs springt und ist nicht da"),
        (4, "completely unrelated text about spark engines and data"),
        (5, ""),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


@pytest.fixture
def emb(spark):
    rng = np.random.default_rng(0)
    base = rng.normal(size=8).astype(np.float32)
    vecs = [
        base,
        base + rng.normal(scale=0.01, size=8).astype(np.float32),  # near dup of 0
        rng.normal(size=8).astype(np.float32),
        rng.normal(size=8).astype(np.float32),
    ]
    pdf = pd.DataFrame({"vec_id": range(4), "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(pdf)


def test_exact_dedup_groups_identical_text(docs):
    out = exact_dedup(docs).toPandas()
    dup_row = out[out["dup_count"] == 2]
    assert len(dup_row) == 1
    assert dup_row["doc_id"].iloc[0] == 0  # min-id survivor
    assert len(out) == 5  # 6 docs, one pair merged


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = ngram_jaccard_pairs(docs, n=2, threshold=0.2).toPandas()
    keys = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in keys  # identical
    assert (0, 2) in keys or (1, 2) in keys  # one-word change
    exact = pairs[(pairs["id_a"] == 0) & (pairs["id_b"] == 1)]
    assert np.isclose(exact["jaccard"].iloc[0], 1.0)


def test_minhash_estimates_jaccard(docs):
    pairs = minhash_near_duplicates(docs, num_hashes=128, bands=32, threshold=0.3).toPandas()
    keys = {tuple(sorted((a, b))): j for a, b, j in zip(pairs["id_a"], pairs["id_b"], pairs["est_jaccard"])}
    assert (0, 1) in keys
    assert keys[(0, 1)] == pytest.approx(1.0, abs=0.05)  # identical docs


def test_simhash_identical_docs_same_signature(docs):
    sig = simhash_signatures(docs, bits=64).toPandas().set_index("doc_id")["simhash"]
    assert sig[0] == sig[1]
    # near-dup should be within a few bits; unrelated should differ more
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(sig[0], sig[2]) <= ham(sig[0], sig[4])


def test_embedding_near_duplicates_brute(emb):
    pairs = embedding_near_duplicates(emb, threshold=0.9, brute_force=True).toPandas()
    assert len(pairs) == 1
    assert (pairs["id_a"].iloc[0], pairs["id_b"].iloc[0]) == (0, 1)
    assert pairs["cosine"].iloc[0] > 0.99


def test_cosine_topk_matches_numpy(emb):
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    out = cosine_topk(emb, queries, k=2).toPandas()
    # rank 1 for each query must be itself (cosine 1.0)
    top1 = out[out["rank"] == 1]
    assert (top1["query_id"].to_numpy() == top1["corpus_id"].to_numpy()).all()
    assert np.allclose(top1["cosine"], 1.0)
    # query 0's second neighbor is vec 1 (the near-duplicate)
    second = out[(out["query_id"] == 0) & (out["rank"] == 2)]
    assert second["corpus_id"].iloc[0] == 1


def test_lsh_topk_recalls_near_neighbors(emb):
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_cosine_topk(emb, queries, k=2).toPandas()
    mine = out[(out["query_id"] == 0)].sort_values("rank")
    # LSH buckets always contain the vector itself
    assert mine["corpus_id"].iloc[0] == 0


def test_language_id_heuristic(docs):
    out = language_id(docs).toPandas().set_index("doc_id")["pred_lang"]
    assert out[0] == "en"
    assert out[3] == "de"
    assert out[5] == "und"


def test_text_quality_features(docs):
    out = text_quality(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 9
    assert out.loc[5, "n_tokens"] == 0
    assert out.loc[0, "n_chars"] == len("the quick brown fox jumps over the lazy dog")
    assert (out["punct_ratio"] >= 0).all()


def test_token_count(docs):
    out = token_count(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "n_ws_tokens"] == 9
    assert out.loc[0, "n_bpe_tokens"] >= 9
    assert out.loc[5, "n_ws_tokens"] == 0


def test_document_fingerprint_normalizes_whitespace(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["Hello   World", "  hello world "]})
    df = spark.createDataFrame(pdf)
    out = document_fingerprint(df).toPandas()
    assert out["content_sha"].nunique() == 1  # case/whitespace-insensitive match


def test_multimodal_payload_and_decode(docs):
    media = attach_binary_payload(docs, "text", "doc_id", "text/plain")
    pdf = media.toPandas()
    assert set(pdf.columns) >= {"media_id", "media_type", "payload", "n_bytes", "checksum"}
    assert (pdf["n_bytes"] == pdf["payload"].map(len)).all()

    decoded = decode_media(media, decoder="fake").toPandas()
    assert {"width", "height", "channels"} <= set(decoded.columns)
    assert len(decoded) == 6


def test_multimodal_real_decoder_is_stubbed(docs):
    media = attach_binary_payload(docs, "text", "doc_id", "text/plain")
    with pytest.raises(Exception):  # NotImplementedError inside workers → Py4J error
        decode_media(media, decoder="real").toPandas()


def test_frame_sample_plumbing(docs):
    media = attach_binary_payload(docs, "text", "doc_id", "text/plain")
    frames = frame_sample(media, every_n_bytes=8, max_frames=3).toPandas()
    assert (frames["frame_index"] < 3).all()
    assert len(frames) > 0


def test_ivf_topk_recall_vs_brute(spark, emb):
    """IVF with full probing equals brute force; partial probing still
    recalls the self-match and the near-duplicate."""
    from tape_spark.operators import ivf_cosine_topk

    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    full = ivf_cosine_topk(
        emb, queries, k=2, num_clusters=4, nprobe=4, train_sample=100
    ).toPandas()
    brute = cosine_topk(emb, queries, k=2).toPandas()
    f = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = brute.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (f["corpus_id"] == b["corpus_id"]).all()

    partial = ivf_cosine_topk(
        emb, queries, k=2, num_clusters=4, nprobe=2, train_sample=100
    ).toPandas()
    top1 = partial[partial["rank"] == 1]
    assert (top1["query_id"].to_numpy() == top1["corpus_id"].to_numpy()).all()


def test_resize_media_bounded_output(docs):
    from tape_spark.operators.multimodal import attach_binary_payload, resize_media

    media = attach_binary_payload(docs, "text", "doc_id", "text/plain")
    out = resize_media(media, width=8, height=4).toPandas()
    assert (out["payload"].map(len) == 32).all()  # width*height bytes
    assert (out["width"] == 8).all() and (out["height"] == 4).all()


def test_media_embedding_feeds_similarity(docs):
    from tape_spark.operators import cosine_topk
    from tape_spark.operators.multimodal import attach_binary_payload, media_embedding

    media = attach_binary_payload(docs, "text", "doc_id", "text/plain")
    emb = media_embedding(media, dim=16)
    pdf = emb.toPandas()
    assert pdf["embedding"].map(len).eq(16).all()
    # identical payloads (docs 0 and 1) -> identical embeddings
    by_id = pdf.set_index("media_id")["embedding"]
    assert list(by_id[0]) == list(by_id[1])
    # embeddings are consumable by the ANN operators end-to-end
    queries = emb.select(F.col("media_id").alias("query_id"), "embedding").limit(2)
    tk = cosine_topk(emb, queries, k=2, id_col="media_id").toPandas()
    assert len(tk) == 4


def test_lightcurve_similarity_search(ramp_ensemble):
    """PAA embeddings + cosine top-k over light curves: each query curve's
    best match is itself."""
    from tape_spark.operators import lightcurve_embeddings, similar_lightcurves

    emb = lightcurve_embeddings(ramp_ensemble, num_bins=16).toPandas()
    assert len(emb) == 5
    assert emb["embedding"].map(len).eq(16).all()

    out = similar_lightcurves(ramp_ensemble, query_ids=[8000, 8001], k=3).toPandas()
    top1 = out[out["rank"] == 1]
    assert set(top1["query_id"]) == {8000, 8001}
    assert (top1["query_id"].to_numpy() == top1["corpus_id"].to_numpy()).all()


def test_winnowed_fingerprints(docs):
    out = document_fingerprint(docs, k=5, window=4).toPandas().set_index("doc_id")
    # identical docs share the full fingerprint set
    assert list(out.loc[0, "winnow"]) == list(out.loc[1, "winnow"])
    # near-dup shares most fingerprints with the original (winnowing
    # guarantee: one-word edits leave distant windows untouched)
    a, c = set(out.loc[0, "winnow"]), set(out.loc[2, "winnow"])
    assert len(a & c) / len(a | c) > 0.5
    # empty doc -> empty fingerprint set
    assert list(out.loc[5, "winnow"]) == []


def test_exact_dedup_hash_variant_agrees(docs):
    full = exact_dedup(docs, by_hash=False).toPandas().sort_values("doc_id").reset_index(drop=True)
    hashed = exact_dedup(docs, by_hash=True).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(full, hashed)


def test_dedup_keep_first_hash_variant_agrees(docs):
    from tape_spark.operators import dedup_keep_first

    full = dedup_keep_first(docs, by_hash=False).toPandas().sort_values("doc_id").reset_index(drop=True)
    hashed = dedup_keep_first(docs, by_hash=True).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(full, hashed)


def test_cosine_topk_duplicate_vectors_bounded_and_deterministic(spark):
    """Many corpus vectors tied at the k-th cosine: the result must be the
    k smallest corpus_ids (global tie-break order) and identical across
    runs — and the local stage must not ship the whole tie class."""
    from tape_spark.operators import cosine_topk

    v = [1.0, 0.0, 0.0, 0.0]
    corpus = spark.createDataFrame(
        [(i, v) for i in range(30)], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame([(0, v)], "query_id long, embedding array<double>")
    out = cosine_topk(corpus, queries, k=5).toPandas().sort_values("rank")
    assert list(out["corpus_id"]) == [0, 1, 2, 3, 4]
    assert (out["cosine"] == 1.0).all()
    out2 = cosine_topk(corpus, queries, k=5).toPandas().sort_values("rank")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), out2.reset_index(drop=True))


def test_cosine_topk_zero_query_vector(spark):
    """An all-zero query yields cosine 0 everywhere (zero-norm guard), not
    NaN — the query still returns its k rows."""
    from tape_spark.operators import cosine_topk

    corpus = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(6)], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame([(0, [0.0, 0.0])], "query_id long, embedding array<double>")
    out = cosine_topk(corpus, queries, k=3).toPandas()
    assert len(out) == 3
    assert (out["cosine"] == 0.0).all()
    assert sorted(out["corpus_id"]) == [0, 1, 2]  # ties resolve by id


def test_cosine_topk_empty_queries(spark):
    from tape_spark.operators import cosine_topk

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    queries = corpus.filter("vec_id < 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert cosine_topk(corpus, queries, k=3).count() == 0


def test_lsh_ivf_zero_vector_no_nan(spark):
    """A zero-norm corpus vector must not surface as a NaN-cosine rank-1
    hit in the approximate search paths (Spark sorts NaN above all)."""
    import numpy as np

    from tape_spark.operators import ivf_cosine_topk, lsh_cosine_topk

    rows = [(0, [0.0, 0.0, 0.0, 0.0])] + [
        (i, [float(i), 1.0, 0.0, 0.0]) for i in range(1, 8)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(1, [1.0, 1.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    for fn in (lsh_cosine_topk, ivf_cosine_topk):
        out = fn(corpus, queries, k=3).toPandas()
        assert not out["cosine"].isna().any()
        top = out.sort_values("rank").iloc[0]
        assert top["corpus_id"] != 0  # the zero vector scores 0, not NaN-first


def test_simhash_null_text(spark):
    from tape_spark.operators import simhash_signatures

    docs = spark.createDataFrame(
        [(0, "some text here"), (1, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert out[1] == 0  # NULL text → zero signature, not a crashed job


def test_repetition_ratio(spark):
    from tape_spark.operators import repetition_ratio

    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),      # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
            (1, "all words unique here"),
            (2, ""),                 # no tokens -> 0
            (3, "single"),           # under n tokens -> 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["rep_ratio"] for r in repetition_ratio(docs, n=2).collect()}
    assert out[0] == pytest.approx(1.0 - 2.0 / 5.0)
    assert out[1] == 0.0
    assert out[2] == 0.0
    assert out[3] == 0.0


def test_ngram_jaccard_doc_frequency_cap(docs):
    """Capping shingle document frequency drops only stop-shingles; the
    identical pair (sharing rare shingles too) survives with jaccard <= 1."""
    capped = ngram_jaccard_pairs(docs, n=2, threshold=0.2, max_doc_frequency=3).toPandas()
    keys = {tuple(sorted((a, b))) for a, b in zip(capped["id_a"], capped["id_b"])}
    assert (0, 1) in keys
    assert (capped["jaccard"] <= 1.0).all()


def test_connected_components_path_and_star(spark):
    """A 6-node path (worst case for min-propagation: needs O(log n)
    star rounds), a separate triangle, and a self-loop-only pair."""
    from tape_spark.operators import connected_components

    pairs = spark.createDataFrame(
        [
            # path 10-11-12-13-14-15 presented in "bad" order
            (15, 14), (10, 11), (12, 13), (13, 14), (11, 12),
            # triangle 20-21-22
            (21, 20), (20, 22), (21, 22),
            # self-loop must be ignored entirely
            (30, 30),
        ],
        "id_a long, id_b long",
    )
    out = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert {out[n] for n in (10, 11, 12, 13, 14, 15)} == {10}
    assert {out[n] for n in (20, 21, 22)} == {20}
    assert 30 not in out  # self-loop-only node has no real edge


def test_dedup_clusters_transitive(spark):
    """A~B and B~C but A and C share less: the cluster must still unite
    all three via transitivity, labeled with the smallest doc_id."""
    from tape_spark.operators import dedup_clusters

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon eta"),
            (2, "gamma delta epsilon eta theta iota"),
            (3, "totally different words in this document here"),
        ],
        "doc_id long, text string",
    )
    out = dedup_clusters(docs, n=2, threshold=0.3).toPandas()
    grouped = out.set_index("doc_id")
    assert set(grouped.index) == {0, 1, 2}  # doc 3 is a singleton -> excluded
    assert (grouped["component"] == 0).all()
    assert (grouped["cluster_size"] == 3).all()


def test_corpus_filter_rules(spark):
    from tape_spark.operators import corpus_filter

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is that very fine today indeed"),  # keeps
            (1, "short text"),                                      # too_short
            (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),  # repetitive + low_stopword
            (3, ""),                                                # everything fails
        ],
        "doc_id long, text string",
    )
    out = corpus_filter(docs, min_tokens=5).toPandas().set_index("doc_id")
    assert bool(out.loc[0, "keep"])
    assert out.loc[0, "reasons"] == ""
    assert not out.loc[1, "keep"] and "too_short" in out.loc[1, "reasons"]
    assert "repetitive" in out.loc[2, "reasons"]
    assert "low_stopword" in out.loc[2, "reasons"]
    assert "too_short" in out.loc[3, "reasons"] and "odd_token_len" in out.loc[3, "reasons"]


def test_vocab_topk_counts_and_ties(spark):
    from tape_spark.operators import vocab_topk

    docs = spark.createDataFrame(
        [(0, "b a b c"), (1, "a b  a"), (2, "")],
        "doc_id long, text string",
    )
    out = vocab_topk(docs, k=2).toPandas()
    # a and b both appear 3 times -> tie broken lexicographically
    assert list(out["word"]) == ["a", "b"]
    assert list(out["freq"]) == [3, 3]
    assert list(out["rank"]) == [1, 2]


def test_vocab_topk_plan_uses_take_ordered(spark):
    """The global top-k must not be a single-partition window sort."""
    from tape_spark.operators import vocab_topk

    docs = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    plan = vocab_topk(docs, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_text_signals_matches_single_operators(docs):
    """The fused one-pass projection must agree column-for-column with the
    à-la-carte operators it replaces."""
    from tape_spark.operators import (
        repetition_ratio,
        stopword_ratio,
        text_signals,
    )

    fused = text_signals(docs).toPandas().set_index("doc_id").sort_index()
    lang = language_id(docs).toPandas().set_index("doc_id").sort_index()
    qual = text_quality(docs).toPandas().set_index("doc_id").sort_index()
    stop = stopword_ratio(docs).toPandas().set_index("doc_id").sort_index()
    rep = repetition_ratio(docs).toPandas().set_index("doc_id").sort_index()
    tok = token_count(docs).toPandas().set_index("doc_id").sort_index()
    assert (fused["pred_lang"] == lang["pred_lang"]).all()
    for col in ("n_chars", "n_tokens", "avg_token_len", "punct_ratio"):
        assert np.allclose(fused[col], qual[col])
    assert np.allclose(fused["stop_ratio"], stop["stop_ratio"])
    assert np.allclose(fused["rep_ratio"], rep["rep_ratio"])
    assert (fused["n_bpe_tokens"] == tok["n_bpe_tokens"]).all()


def test_simhash_md5_token_hash_deterministic_and_close(docs):
    """md5_60 mode: reproducible signatures, same near-dup ordering as the
    xxhash64 scale path, and bits<=61 enforced."""
    a = simhash_signatures(docs, bits=32, token_hash="md5_60").toPandas().set_index("doc_id")["simhash"]
    b = simhash_signatures(docs, bits=32, token_hash="md5_60").toPandas().set_index("doc_id")["simhash"]
    assert (a.sort_index() == b.sort_index()).all()
    assert a[0] == a[1]  # identical docs
    ham = lambda x, y: bin(int(x) ^ int(y)).count("1")
    assert ham(a[0], a[2]) <= ham(a[0], a[4])  # near dup closer than unrelated
    with pytest.raises(ValueError):
        simhash_signatures(docs, bits=64, token_hash="md5_60")


def test_lsh_multi_table_recall_dominates_single(emb):
    """OR amplification: recall with T tables is a superset-in-expectation
    of one table; with identical seeds the 8-table run must recover at
    least as many true neighbors, and emit no duplicate pairs."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = cosine_topk(emb, queries, k=3).toPandas()
    truth = set(zip(brute["query_id"], brute["corpus_id"]))

    def hits(num_tables):
        out = lsh_cosine_topk(
            emb, queries, k=3, num_planes=4, num_tables=num_tables
        ).toPandas()
        assert not out.duplicated(["query_id", "corpus_id"]).any()
        return len(set(zip(out["query_id"], out["corpus_id"])) & truth)

    assert hits(8) >= hits(1)


def test_ivf_training_sample_deterministic(emb):
    """The hash-ordered training draw makes the whole index reproducible:
    two runs return identical neighbor lists."""
    from tape_spark.operators import ivf_cosine_topk

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(k=3, num_clusters=4, nprobe=2, train_sample=100)
    a = ivf_cosine_topk(emb, queries, **kw).toPandas().sort_values(["query_id", "rank"])
    b = ivf_cosine_topk(emb, queries, **kw).toPandas().sort_values(["query_id", "rank"])
    assert (a[["query_id", "corpus_id", "rank"]].to_numpy() == b[["query_id", "corpus_id", "rank"]].to_numpy()).all()


# ------------------------------------------------------------------ #
# chunk_documents                                                     #
# ------------------------------------------------------------------ #


def test_chunk_documents_no_overlap(docs):
    from tape_spark.operators import chunk_documents

    out = chunk_documents(docs, chunk_tokens=4).toPandas()
    d0 = out[out["doc_id"] == 0].sort_values("chunk_index")
    # 9 tokens, windows of 4, stride 4 -> 3 chunks of 4/4/1 tokens
    assert d0["chunk_index"].tolist() == [0, 1, 2]
    assert d0["n_chunk_tokens"].tolist() == [4, 4, 1]
    assert d0["chunk"].tolist() == [
        "the quick brown fox",
        "jumps over the lazy",
        "dog",
    ]
    # reassembly: concatenating non-overlapping chunks restores the text
    assert " ".join(d0["chunk"]) == "the quick brown fox jumps over the lazy dog"
    # deterministic ids, unique across (doc, chunk)
    assert out["chunk_id"].is_unique


def test_chunk_documents_overlap(docs):
    from tape_spark.operators import chunk_documents

    out = chunk_documents(docs, chunk_tokens=4, overlap_tokens=2).toPandas()
    d0 = out[out["doc_id"] == 0].sort_values("chunk_index")
    # 9 tokens, stride 2: windows start at 0,2,4,6 - the first to reach
    # the end wins; no chunk fully contained in another
    assert d0["chunk"].tolist() == [
        "the quick brown fox",
        "brown fox jumps over",
        "jumps over the lazy",
        "the lazy dog",
    ]


def test_chunk_documents_short_and_empty(docs):
    from tape_spark.operators import chunk_documents

    out = chunk_documents(docs, chunk_tokens=100).toPandas()
    # every non-null doc yields exactly one chunk at this window size
    assert out.groupby("doc_id").size().eq(1).all()
    empty = out[out["doc_id"] == 5].iloc[0]
    assert empty["n_chunk_tokens"] == 0 and empty["chunk"] == ""


def test_chunk_documents_every_token_covered(docs):
    import pytest

    from tape_spark.operators import chunk_documents

    out = chunk_documents(docs, chunk_tokens=3, overlap_tokens=1).toPandas()
    d4 = out[out["doc_id"] == 4].sort_values("chunk_index")
    toks = "completely unrelated text about spark engines and data".split()
    covered = set()
    for i, row in zip(d4["chunk_index"], d4["chunk"]):
        start = i * 2
        assert row.split() == toks[start : start + 3]
        covered.update(range(start, start + len(row.split())))
    assert covered == set(range(len(toks)))
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap_tokens=4)


def test_chunk_documents_property(spark):
    """Property sweep over sizes/overlaps: full token coverage, window
    bounds respected, deterministic unique chunk ids."""
    import itertools

    from tape_spark.operators import chunk_documents

    texts = [
        (i, " ".join(f"w{j}" for j in range(n)))
        for i, n in enumerate([1, 2, 3, 5, 7, 12, 31, 64, 65, 100])
    ]
    df = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))
    for chunk, ov in [(1, 0), (4, 0), (4, 3), (16, 8), (64, 63), (100, 0)]:
        out = chunk_documents(df, chunk_tokens=chunk, overlap_tokens=ov).toPandas()
        stride = chunk - ov
        assert out["chunk_id"].is_unique, (chunk, ov)
        for i, text in texts:
            n = len(text.split())
            d = out[out["doc_id"] == i].sort_values("chunk_index")
            assert (d["n_chunk_tokens"] <= chunk).all(), (chunk, ov, i)
            covered = set()
            for ci, c in zip(d["chunk_index"], d["chunk"]):
                start = ci * stride
                toks = c.split()
                assert toks == text.split()[start : start + len(toks)], (chunk, ov, i)
                covered.update(range(start, start + len(toks)))
            assert covered == set(range(n)), (chunk, ov, i, n)


def test_resolve_duplicates_keeps_best_per_cluster(spark):
    from tape_spark.operators import resolve_duplicates

    docs_rows = [
        (0, "dup a", 10), (1, "dup a", 30), (2, "dup a", 30),  # cluster 100
        (3, "dup b", 5), (4, "dup b", 7),                      # cluster 200
        (5, "unique", 99),                                     # no cluster
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(docs_rows, columns=["doc_id", "text", "n_chars"])
    )
    clusters = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1, 2, 3, 4], "component": [100, 100, 100, 200, 200]}
        )
    )
    # quality-aware: cluster 100 keeps doc 1 (n_chars 30, tie vs 2 -> smaller id);
    # cluster 200 keeps doc 4 (n_chars 7); doc 5 untouched
    kept = {r["doc_id"] for r in resolve_duplicates(docs, clusters, quality_col="n_chars").collect()}
    assert kept == {1, 4, 5}
    # id-only: smallest id survives each cluster
    kept_id = {r["doc_id"] for r in resolve_duplicates(docs, clusters).collect()}
    assert kept_id == {0, 3, 5}
    # all original columns survive the anti-join
    out = resolve_duplicates(docs, clusters, quality_col="n_chars")
    assert set(out.columns) == {"doc_id", "text", "n_chars"}


def test_resolve_duplicates_end_to_end_with_dedup_clusters(docs):
    from tape_spark.operators import dedup_clusters, resolve_duplicates
    from pyspark.sql import functions as SF

    with_quality = docs.withColumn("n_chars", SF.length(SF.coalesce("text", SF.lit(""))))
    clusters = dedup_clusters(with_quality, n=2, threshold=0.5)
    resolved = resolve_duplicates(with_quality, clusters, quality_col="n_chars")
    n_docs = with_quality.count()
    n_members = clusters.count()
    n_clusters = clusters.select("component").distinct().count()
    # exactly one survivor per cluster; non-cluster docs all survive
    assert resolved.count() == n_docs - n_members + n_clusters


# --------------------------------------------------------------------- #
# round 7: fused MinHash verify, bucket cap, stop shingles               #
# --------------------------------------------------------------------- #


def test_minhash_fused_matches_two_stage(docs):
    """The fused band-join-verify must return exactly the pair set of the
    explicit two-stage formulation (banding candidates, then signature
    re-join verify) — the rewrite is a physical-plan change only."""
    from tape_spark.operators import lsh_candidate_pairs, minhash_signatures

    nh, bands = 64, 16
    fused = minhash_near_duplicates(docs, num_hashes=nh, bands=bands, threshold=0.2)
    sigs = minhash_signatures(docs, num_hashes=nh)
    cand = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=nh // bands)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("signature").alias("sig_b"))
    two_stage = (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0), lambda acc, v: acc + v,
            ) / F.lit(float(nh)),
        )
        .filter(F.col("est_jaccard") >= 0.2)
        .select("id_a", "id_b", "est_jaccard")
    )
    def keyset(sdf):
        return {(r["id_a"], r["id_b"], round(r["est_jaccard"], 9)) for r in sdf.collect()}
    assert keyset(fused) == keyset(two_stage) and fused.count() > 0


def test_minhash_bucket_cap_drops_megabucket(spark):
    """max_bucket_size: a clone cluster larger than the cap contributes no
    pairs (its identical signatures fill every band bucket past the cap),
    while a small near-dup pair elsewhere in the corpus survives."""
    boiler = "copyright notice all rights reserved contact legal department"
    rows = [(i, boiler) for i in range(20)]
    rows += [(100, "a genuinely unique document about owls and rivers"),
             (101, "a genuinely unique document about owls and rivers")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    capped = minhash_near_duplicates(df, num_hashes=64, bands=16, threshold=0.3,
                                     max_bucket_size=10)
    keys = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in keys
    assert not any(a < 20 and b < 20 for a, b in keys)
    # without the cap the clone cluster floods back in: C(20,2) pairs
    uncapped = minhash_near_duplicates(df, num_hashes=64, bands=16, threshold=0.3)
    assert uncapped.count() == 190 + 1


def test_estimate_stop_shingles_finds_heavy_hitter(spark):
    from tape_spark.operators import estimate_stop_shingles

    rows = [(i, f"shared boilerplate header unique{i} tail{i}") for i in range(60)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    stop = estimate_stop_shingles(df, n=2, max_doc_frequency=10, sample_fraction=1.0)
    expected = {
        r[0]
        for r in spark.createDataFrame(
            pd.DataFrame({"s": ["shared boilerplate", "boilerplate header"]})
        ).select(F.xxhash64("s")).collect()
    }
    assert expected <= set(stop)
    # per-doc-unique shingles never qualify
    uniq = spark.createDataFrame(pd.DataFrame({"s": ["header unique3"]})).select(
        F.xxhash64("s")
    ).collect()[0][0]
    assert uniq not in set(stop)


def test_ngram_jaccard_stop_sample_denominator_exact(spark):
    """Sampled stop-shingle pruning drops heavy hitters from the join but
    the Jaccard denominator (per-doc shingle counts) is fixed beforehand,
    so surviving pairs keep their exact similarity."""
    rows = [(i, f"common header words unique{i}") for i in range(40)]
    rows += [(100, "owls fly over quiet rivers at dusk"),
             (101, "owls fly over quiet rivers at dusk")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    pairs = ngram_jaccard_pairs(
        df, n=2, threshold=0.9, max_doc_frequency=10, stop_shingle_sample=1.0
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(100, 101)] == pytest.approx(1.0)


def test_minhash_stop_shingles_drops_all_stop_docs(spark):
    from tape_spark.operators import minhash_signatures

    rows = [(0, "just two"), (1, "just two words here")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    stop = [
        r[0]
        for r in spark.createDataFrame(pd.DataFrame({"s": ["just two"]}))
        .select(F.xxhash64("s")).collect()
    ]
    sigs = minhash_signatures(df, stop_shingles=stop)
    ids = {r["doc_id"] for r in sigs.select("doc_id").collect()}
    assert ids == {1}  # doc 0's only shingle was stopped -> no signature row


def test_minhash_32bit_signatures_same_pairs(docs):
    """32-bit signature transport finds the same near-dup pair set as the
    exact 64-bit path at test scale (collisions are 2^-32 events)."""
    p64 = {(r["id_a"], r["id_b"]) for r in
           minhash_near_duplicates(docs, num_hashes=64, bands=16, threshold=0.3).collect()}
    p32 = {(r["id_a"], r["id_b"]) for r in
           minhash_near_duplicates(docs, num_hashes=64, bands=16, threshold=0.3,
                                   signature_bits=32).collect()}
    assert p32 == p64 and (0, 1) in p32


def test_minhash_precomputed_signatures_identical(spark, docs_df=None):
    """Passing a precomputed signature table yields the same pairs as the
    self-managed path, stays lazy (no persist), and leaves the caller's
    cache alone."""
    from tape_spark.operators.dedup import minhash_near_duplicates, minhash_signatures

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " + ("x" if i % 2 else "y"))
         for i in range(40)],
        "doc_id long, text string",
    )
    inline = minhash_near_duplicates(docs, num_hashes=32, bands=8, threshold=0.3)
    sigs = minhash_signatures(docs, "text", "doc_id", 32, 2).persist()
    try:
        via_sigs = minhash_near_duplicates(
            docs, num_hashes=32, bands=8, threshold=0.3, signatures=sigs
        )
        got = sorted(map(tuple, via_sigs.collect()))
        exp = sorted(map(tuple, inline.collect()))
        assert got == exp and len(got) > 0
        # caller-owned cache untouched
        assert sigs.storageLevel.useMemory
    finally:
        sigs.unpersist()


class TestRepeatedSpans:
    def _docs(self, spark):
        shared = " ".join(f"w{i}" for i in range(20))  # a 20-token run
        return spark.createDataFrame(
            [
                (0, shared + " tail zero unique ending here now ok fine yes done"),
                (1, "lead one " + shared),
                (2, "completely different tokens " + " ".join(f"z{i}" for i in range(20))),
                (3, "short doc"),
                (4, ""),
            ],
            "doc_id long, text string",
        )

    def test_occurrences_match_bruteforce(self, spark):
        from tape_spark.operators import repeated_spans

        docs = self._docs(spark)
        got = repeated_spans(
            docs, span_tokens=8, stride=2, min_docs=2
        ).toPandas()
        # brute force in python
        rows = {r["doc_id"]: (r["text"] or "").lower().split() for r in docs.collect()}
        spans = {}
        for d, w in rows.items():
            for p in range(0, len(w) - 8 + 1, 2):
                spans.setdefault(" ".join(w[p : p + 8]), []).append((d, p))
        exp = []
        for s, occ in spans.items():
            docs_set = {d for d, _ in occ}
            if len(docs_set) >= 2:
                exp += [(d, p, len(docs_set), len(occ)) for d, p in occ]
        got_set = set(
            map(tuple, got[["doc_id", "token_start", "n_docs", "n_occurrences"]].values.tolist())
        )
        assert got_set == set(exp) and len(exp) > 0

    def test_stats_ratio(self, spark):
        from tape_spark.operators import repeated_span_stats

        docs = self._docs(spark)
        out = (
            repeated_span_stats(docs, span_tokens=8, stride=2, min_docs=2)
            .orderBy("doc_id")
            .toPandas()
        )
        assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
        # doc 2 shares nothing; docs 3/4 are too short for any span
        assert out["n_repeated_spans"].tolist()[2:] == [0, 0, 0]
        assert out["n_spans"].tolist()[3:] == [0, 0]
        assert (out["dup_span_ratio"][:2] > 0).all()
        assert (out["dup_span_ratio"] <= 1.0).all()

    def test_span_text_never_in_exchange(self, spark):
        """The corpus-wide count shuffles 8-byte fingerprints, not span
        strings."""
        from tape_spark.operators import repeated_spans

        plan = (
            repeated_spans(self._docs(spark), span_tokens=8, stride=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "array_join" not in m.group(1) and "slice" not in m.group(1)

class TestRemoveRepeatedSpans:
    def _docs(self, spark):
        shared = " ".join(f"w{i}" for i in range(20))
        return spark.createDataFrame(
            [
                (0, shared + " tail zero unique ending here now ok fine yes done"),
                (1, "lead one " + shared),
                (2, "completely different tokens " + " ".join(f"z{i}" for i in range(20))),
                (3, "short doc"),
                (4, ""),
                (5, "lead two " + shared),
            ],
            "doc_id long, text string",
        )

    @staticmethod
    def _py_remove(rows, span_tokens, stride, min_docs):
        toks = {d: (t or "").strip().lower().split() for d, t in rows}
        spans = {}
        for d in sorted(toks):
            w = toks[d]
            for p in range(0, len(w) - span_tokens + 1, stride):
                spans.setdefault(" ".join(w[p : p + span_tokens]), []).append((d, p))
        hits = {d: [] for d in toks}
        nrm = {d: 0 for d in toks}
        for s, occ in spans.items():
            if len({d for d, _ in occ}) >= min_docs:
                for d, p in sorted(occ)[1:]:
                    hits[d].append(p)
                    nrm[d] += 1
        out = {}
        for d, w in toks.items():
            removed = [
                any(s <= t < s + span_tokens for s in hits[d]) for t in range(len(w))
            ]
            pieces, cur = [], []
            for t, tok in enumerate(w):
                if removed[t]:
                    if cur:
                        pieces.append(" ".join(cur))
                        cur = []
                else:
                    cur.append(tok)
            if cur:
                pieces.append(" ".join(cur))
            out[d] = (len(w), sum(removed), nrm[d], pieces)
        return out

    def test_python_parity(self, spark):
        from tape_spark.operators import remove_repeated_spans

        docs = self._docs(spark)
        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        exp = self._py_remove(rows, 8, 2, 2)
        got = {
            r["doc_id"]: (
                r["n_tokens"], r["n_removed_tokens"], r["n_spans_removed"],
                list(r["pieces"]),
            )
            for r in remove_repeated_spans(
                docs, span_tokens=8, stride=2, min_docs=2
            ).collect()
        }
        assert got == exp
        # the fixture actually removes something (docs 1 and 5 lose the run)
        assert any(v[1] > 0 for v in got.values())

    def test_first_occurrence_kept(self, spark):
        from tape_spark.operators import remove_repeated_spans

        out = {
            r["doc_id"]: r
            for r in remove_repeated_spans(
                self._docs(spark), span_tokens=8, stride=2, min_docs=2
            ).collect()
        }
        # doc 0 holds the globally-smallest (id, pos) occurrence of every
        # shared span: it keeps all tokens; later copies lose them
        assert out[0]["n_removed_tokens"] == 0 and out[0]["n_pieces"] == 1
        assert out[1]["n_removed_tokens"] > 0
        assert out[5]["n_removed_tokens"] > 0

    def test_untouched_docs_single_piece(self, spark):
        from tape_spark.operators import remove_repeated_spans

        out = {
            r["doc_id"]: r
            for r in remove_repeated_spans(
                self._docs(spark), span_tokens=8, stride=2, min_docs=2
            ).collect()
        }
        assert out[2]["n_pieces"] == 1 and out[2]["n_removed_tokens"] == 0
        assert out[3]["pieces"] == ["short doc"]
        assert out[4]["n_tokens"] == 0 and out[4]["n_pieces"] == 0

    def test_no_python_in_plan(self, spark):
        from tape_spark.operators import remove_repeated_spans

        plan = (
            remove_repeated_spans(self._docs(spark), span_tokens=8, stride=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan



def test_minhash_bucket_cap_pruned_first_band_pair_survives(spark):
    """A pair whose FIRST agreeing band sits in an over-full (pruned)
    bucket but that also agrees in a surviving band must still be found:
    with pruning on, pair dedup runs over surviving join rows, not the
    signature-derived first band (which may have been pruned)."""
    from tape_spark.operators.dedup import minhash_near_duplicates

    # num_hashes=4, bands=2 -> band 0 = sig[0:2], band 1 = sig[2:4].
    # docs 0..3 share band 0's slice [1,2] (bucket size 4 > cap 3);
    # only docs 0,1 share band 1 (bucket size 2, survives the cap).
    sigs = spark.createDataFrame(
        [
            (0, [1, 2, 3, 4]),
            (1, [1, 2, 3, 4]),
            (2, [1, 2, 9, 9]),
            (3, [1, 2, 8, 8]),
        ],
        "doc_id long, signature array<bigint>",
    )
    docs = sigs.select("doc_id")  # unused on the signatures path
    got = minhash_near_duplicates(
        docs, num_hashes=4, bands=2, threshold=0.9,
        max_bucket_size=3, signatures=sigs,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(0, 1)}
    assert got[0]["est_jaccard"] == 1.0


def test_minhash_precomputed_signatures_num_hashes_mismatch_raises(spark):
    """The width guard is plan-embedded (r15: the eager first-row probe
    was a driver job charged to every call) — a mismatch fails at first
    execution with a clear message instead of silently returning empty."""
    from tape_spark.operators.dedup import minhash_near_duplicates

    sigs = spark.createDataFrame(
        [(0, [1, 2, 3, 4]), (1, [1, 2, 3, 4])],
        "doc_id long, signature array<bigint>",
    )
    out = minhash_near_duplicates(
        sigs.select("doc_id"), num_hashes=8, bands=2, signatures=sigs
    )
    with pytest.raises(Exception, match="num_hashes"):
        out.collect()


# ------------------------------------------------------------------ #
# bigram LM perplexity (operators/langmodel.py)                      #
# ------------------------------------------------------------------ #


def _tiny_lm():
    from tape_spark.operators.langmodel import BigramLM

    # corpus: "a b a b a" -> mapped tokens with min_count=1 (vocab {a,b})
    # unigrams a:3 b:2 (+<unk> 1), N = 5 + 1 = 6; bigrams ab:2 ba:2
    return BigramLM(
        unigrams={"a": 3, "b": 2, "<unk>": 1},
        bigrams={("a", "b"): 2, ("b", "a"): 2},
        total=6,
        min_count=1,
    )


def test_bigram_lm_exact_logprob():
    import math

    from tape_spark.operators.langmodel import _LP_UNIT, _quantize_lp

    def q(*terms):
        # the scorer sums per-term log-probs as integer 1e-12 units
        # (order-independent across engines); replay that exactly
        return sum(_quantize_lp(t) for t in terms) / _LP_UNIT

    lm = _tiny_lm()
    # p(a) = 3/6; S(b|a) = c(ab)/c(a) = 2/3; S(a|b) = 2/2
    exp = q(math.log(3 / 6), math.log(2 / 3), math.log(1.0))
    assert lm.logprob(["a", "b", "a"]) == exp
    # unseen bigram backs off: S(a|a) = 0.4 * c(a)/N
    exp2 = q(math.log(3 / 6), math.log(0.4 * 3 / 6))
    assert lm.logprob(["a", "a"]) == exp2
    # OOV maps to <unk>: p(<unk>) = 1/6, then backoff S(a|<unk>)
    exp3 = q(math.log(1 / 6), math.log(0.4 * 3 / 6))
    assert lm.logprob(["zzz", "a"]) == exp3
    assert lm.logprob([]) is None
    # the quantized score stays within a half-unit-per-term of the raw sum
    raw = math.log(3 / 6) + math.log(2 / 3)
    assert lm.logprob(["a", "b", "a"]) == pytest.approx(raw, abs=3 / _LP_UNIT)


def test_train_bigram_lm_deterministic_and_counts(spark):
    from tape_spark.operators.langmodel import train_bigram_lm

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " + ("x" * (i % 3 + 1))) for i in range(60)],
        "doc_id long, text string",
    )
    a = train_bigram_lm(docs, sample_fraction=0.5, max_docs=30, min_count=2)
    b = train_bigram_lm(docs, sample_fraction=0.5, max_docs=30, min_count=2)
    assert a.unigrams == b.unigrams and a.bigrams == b.bigrams and a.total == b.total
    # frequent words are in-vocab, the per-doc-unique x-runs are <unk>-mass
    assert "the" in a.unigrams and a.unigrams["<unk>"] >= 1


def test_perplexity_orders_in_domain_below_gibberish(spark):
    from tape_spark.operators.langmodel import perplexity_score, train_bigram_lm

    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(40)]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    lm = train_bigram_lm(docs, sample_fraction=1.0, max_docs=40, min_count=2)
    test = spark.createDataFrame(
        [
            (0, "the quick brown fox"),
            (1, "zq wv xj qq kk pp"),
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_lm_tokens"], r["ppl"]) for r in perplexity_score(test, lm).collect()}
    assert got[0][1] < got[1][1]  # in-domain beats gibberish
    assert got[2] == (0, None) and got[3] == (0, None)
    # spark-side score equals the python-side model exactly
    import math
    lp = lm.logprob("the quick brown fox".split())
    assert got[0][1] == pytest.approx(math.exp(-lp / 4), rel=1e-12)


def test_bigram_lm_pickle_roundtrip():
    import pickle

    lm = _tiny_lm()
    lm2 = pickle.loads(pickle.dumps(lm))
    assert lm2.logprob(["a", "b"]) == lm.logprob(["a", "b"])
    assert lm2.total == lm.total and lm2.vocab_size == lm.vocab_size


# ------------------------------------------------------------------ #
# semantic dedup (SemDeDup-style, dedup.py)                          #
# ------------------------------------------------------------------ #


def _emb_with_clones(spark, n=120, dim=8, seed=5, clone_every=9):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    rows += [
        (10_000 + i, [float(x) for x in base[i]]) for i in range(0, n, clone_every)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), {
        i for i in range(0, n, clone_every)
    }


def test_semantic_dedup_clone_groups_min_id(spark):
    from tape_spark.operators import semantic_dedup

    df, cloned = _emb_with_clones(spark)
    out = semantic_dedup(
        df, threshold=0.999999, num_clusters=8, train_sample=256, keep="min_id"
    ).toPandas()
    assert len(out) == df.count()  # every row classified
    by_id = out.set_index("vec_id")
    for i in cloned:
        # clone pairs merge into a group rooted at the original id
        assert by_id.loc[i, "group_id"] == i and bool(by_id.loc[i, "is_survivor"])
        assert by_id.loc[10_000 + i, "group_id"] == i
        assert not bool(by_id.loc[10_000 + i, "is_survivor"])
        # identical vectors always share a cluster (same argmax input)
        assert by_id.loc[i, "cluster"] == by_id.loc[10_000 + i, "cluster"]
    # non-cloned vectors are singleton survivors
    singles = out[~out["vec_id"].isin({10_000 + i for i in cloned} | cloned)]
    assert singles["is_survivor"].all()
    assert (singles["group_id"] == singles["vec_id"]).all()


def test_semantic_dedup_matches_bruteforce_within_cluster(spark):
    """At a moderate threshold, the per-cluster pair graph must equal the
    brute-force cosine graph restricted to same-cluster pairs."""
    from tape_spark.operators import semantic_dedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=(60, 6))
    # plant near (not exact) duplicates: tiny perturbations
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    for i in range(0, 60, 7):
        v = base[i] + rng.normal(scale=1e-3, size=6)
        rows.append((500 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, threshold=0.98, num_clusters=4, train_sample=128, keep="min_id"
    ).toPandas()
    clus = out.set_index("vec_id")["cluster"]
    import itertools

    vecs = {r[0]: np.array(r[1]) for r in rows}
    norm = {k: v / np.linalg.norm(v) for k, v in vecs.items()}
    # brute-force groups over same-cluster pairs
    parent = {k: k for k in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(sorted(vecs), 2):
        if clus[a] == clus[b] and float(norm[a] @ norm[b]) >= 0.98:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    exp_group = {k: find(k) for k in vecs}
    got_group = out.set_index("vec_id")["group_id"].to_dict()
    assert got_group == exp_group


def test_semantic_dedup_least_typical_survivor(spark):
    from tape_spark.operators import semantic_dedup

    df, cloned = _emb_with_clones(spark, n=40, clone_every=5)
    out = semantic_dedup(
        df, threshold=0.999999, num_clusters=4, train_sample=128,
        keep="least_typical",
    ).toPandas()
    # identical clones tie on centroid cosine -> min id survives
    by_id = out.set_index("vec_id")
    for i in cloned:
        assert bool(by_id.loc[i, "is_survivor"])
        assert not bool(by_id.loc[10_000 + i, "is_survivor"])
    # exactly one survivor per group
    assert (out.groupby("group_id")["is_survivor"].sum() == 1).all()


def test_semantic_dedup_max_cluster_size_split(spark):
    """Over-cap clusters are sub-split deterministically; output is still
    a full classification with one survivor per group."""
    from tape_spark.operators import semantic_dedup

    df, _ = _emb_with_clones(spark, n=90)
    out = semantic_dedup(
        df, threshold=0.999999, num_clusters=2, train_sample=64,
        max_cluster_size=10,
    ).toPandas()
    assert len(out) == df.count()
    assert (out.groupby("group_id")["is_survivor"].sum() == 1).all()
    out2 = semantic_dedup(
        df, threshold=0.999999, num_clusters=2, train_sample=64,
        max_cluster_size=10,
    ).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("vec_id").reset_index(drop=True),
        out2.sort_values("vec_id").reset_index(drop=True),
    )


def test_semantic_dedup_empty_input(spark):
    from tape_spark.operators import semantic_dedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_dedup(empty, num_clusters=4, train_sample=16)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cluster", "group_id", "is_survivor"]


def test_semantic_dedup_null_embeddings_are_singleton_survivors(spark):
    """NULL vectors must not crash the numeric kernels (np.array of a
    ragged/None list is not 2-D); they come back as cluster=-1 singleton
    survivors and every non-null row is still classified normally."""
    from tape_spark.operators import semantic_dedup

    df, cloned = _emb_with_clones(spark, n=20, clone_every=5)
    with_nulls = df.unionByName(
        spark.createDataFrame(
            [(90_001, None), (90_002, None)], "vec_id long, embedding array<double>"
        )
    )
    out = semantic_dedup(
        with_nulls, threshold=0.999999, num_clusters=4, train_sample=64
    ).toPandas()
    assert len(out) == with_nulls.count()
    nulls = out[out["vec_id"] >= 90_000]
    assert (nulls["cluster"] == -1).all()
    assert nulls["is_survivor"].all()
    assert (nulls["group_id"] == nulls["vec_id"]).all()
    by_id = out.set_index("vec_id")
    for i in cloned:  # the non-null dedup result is unaffected
        assert by_id.loc[10_000 + i, "group_id"] == i


def test_semantic_dedup_all_null_embeddings(spark):
    from tape_spark.operators import semantic_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(df, num_clusters=4, train_sample=16).toPandas()
    assert len(out) == 2
    assert out["is_survivor"].all() and (out["cluster"] == -1).all()


def test_semantic_dedup_caller_centroids(spark):
    """The warehouse pattern: pass caller-owned centroids and the train
    step is skipped — identical classification when the centroids are the
    ones the internal train would produce."""
    from tape_spark.operators import semantic_dedup, train_spherical_kmeans

    df, _ = _emb_with_clones(spark, n=40, clone_every=5)
    cents = train_spherical_kmeans(
        df, num_clusters=4, train_sample=128, kmeans_iters=10, seed=11
    )
    a = semantic_dedup(
        df, threshold=0.999999, num_clusters=4, train_sample=128, seed=11
    ).toPandas()
    b = semantic_dedup(df, threshold=0.999999, centroids=cents).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("vec_id").reset_index(drop=True),
        b.sort_values("vec_id").reset_index(drop=True),
    )
    with pytest.raises(ValueError, match="ndim"):
        semantic_dedup(df, centroids=np.ones(3))


def test_train_spherical_kmeans_validation(spark):
    from tape_spark.operators import train_spherical_kmeans

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="num_clusters"):
        train_spherical_kmeans(df, num_clusters=0)
    cents = train_spherical_kmeans(df, num_clusters=4, train_sample=8)
    assert cents.shape == (1, 2)  # k_eff capped at sample size


# ---------------------------------------------------------------- NB classifier


def _tiny_nb():
    from tape_spark.operators.classifier import NBClassifier

    # hand-built weights in integer 1e-12 units
    return NBClassifier(
        weights={"good": 2_000_000_000_000, "bad": -3_000_000_000_000,
                 "<unk>": -500_000_000_000},
        prior_units=100_000_000_000,
        min_count=1,
        alpha=1.0,
        n_pos_docs=3,
        n_neg_docs=2,
    )


def test_nb_logodds_exact_hand_sum():
    m = _tiny_nb()
    # prior + good + bad + <unk>(oov)
    assert m.logodds(["good", "bad", "zzz"]) == pytest.approx(
        (100_000_000_000 + 2_000_000_000_000 - 3_000_000_000_000
         - 500_000_000_000) / 1e12, rel=0, abs=0)
    # empty doc scores the prior alone
    assert m.logodds([]) == pytest.approx(0.1, rel=0, abs=0)


def test_train_nb_classifier_counts_and_laplace(spark):
    import math

    from tape_spark.operators.classifier import _quantize, train_nb_classifier

    # 4 docs, all sampled (fraction 1.0): 2 positive ("good"), 2 negative
    rows = [
        (0, "spam spam eggs", False),
        (1, "ham eggs", True),
        (2, "ham ham", True),
        (3, "spam", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    m = train_nb_classifier(
        docs, label_expr="y", sample_fraction=1.0, max_docs=10, min_count=2
    )
    # vocab: spam(3), eggs(2), ham(3) all >= 2 -> V = 3 + <unk> = 4
    assert m.vocab_size == 4
    assert m.n_pos_docs == 2 and m.n_neg_docs == 2
    # N+ = 4 tokens (ham eggs / ham ham), N- = 4 (spam spam eggs / spam)
    a = 1.0
    den_pos, den_neg = 4 + a * 4, 4 + a * 4
    exp_ham = _quantize(math.log((3 + a) / den_pos) - math.log((0 + a) / den_neg))
    assert m.weights["ham"] == exp_ham
    exp_unk = _quantize(math.log(a / den_pos) - math.log(a / den_neg))
    assert m.weights["<unk>"] == exp_unk == 0
    assert m.prior_units == 0  # balanced classes

    # determinism
    m2 = train_nb_classifier(
        docs, label_expr="y", sample_fraction=1.0, max_docs=10, min_count=2
    )
    assert m2.weights == m.weights and m2.prior_units == m.prior_units


def test_train_nb_classifier_single_class_raises(spark):
    from tape_spark.operators.classifier import train_nb_classifier

    docs = spark.createDataFrame(
        [(i, "w", True) for i in range(5)], "doc_id long, text string, y boolean"
    )
    with pytest.raises(ValueError, match="single class"):
        train_nb_classifier(docs, label_expr="y", sample_fraction=1.0)


def test_nb_score_separates_and_matches_python_model(spark):
    from tape_spark.operators.classifier import nb_score, train_nb_classifier

    rows = [(i, "clean curated prose text here", True) for i in range(20)] + [
        (100 + i, "zz buy click spam now", False) for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    m = train_nb_classifier(docs, label_expr="y", sample_fraction=1.0, max_docs=40)
    test = spark.createDataFrame(
        [
            (0, "clean curated prose"),
            (1, "buy spam now"),
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in nb_score(test, m).collect()}
    assert got[0]["nb_logodds"] > 0 and got[0]["nb_label"] is True
    assert got[1]["nb_logodds"] < 0 and got[1]["nb_label"] is False
    assert got[2]["n_nb_tokens"] == 0 and got[3]["n_nb_tokens"] == 0
    # spark-side score equals the python-side model bit-exactly
    assert got[0]["nb_logodds"] == m.logodds("clean curated prose".split())
    # empty/NULL docs score exactly the prior
    assert got[2]["nb_logodds"] == m.prior_units / 1e12
    assert got[3]["nb_logodds"] == m.prior_units / 1e12


def test_nb_classifier_pickle_roundtrip():
    import pickle

    m = _tiny_nb()
    m2 = pickle.loads(pickle.dumps(m))
    assert m2.logodds(["good", "zzz"]) == m.logodds(["good", "zzz"])
    assert m2.vocab_size == m.vocab_size


class TestSpanTokenizerAlignment:
    def test_whitespace_only_doc_span_tokens_1(self, spark):
        """Detection and rebuild halves share ONE guarded tokenizer
        (ADVICE r9): a whitespace-only document tokenizes to an EMPTY
        array in BOTH, so at span_tokens=1 it emits no spans and its
        removal counters stay zero instead of skewing on a phantom ''
        token position."""
        from tape_spark.operators import remove_repeated_spans, repeated_spans

        docs = spark.createDataFrame(
            [(0, "   "), (1, None), (2, "dup dup"), (3, "dup")],
            "doc_id long, text string",
        )
        spans = repeated_spans(
            docs, span_tokens=1, stride=1, min_docs=2
        ).toPandas()
        # only the real 'dup' token repeats; no span from the blank docs
        assert set(spans["doc_id"]) == {2, 3}
        out = {
            r["doc_id"]: r
            for r in remove_repeated_spans(
                docs, span_tokens=1, stride=1, min_docs=2
            ).collect()
        }
        for d in (0, 1):
            r = out[d]
            assert r["n_tokens"] == 0 and r["n_removed_tokens"] == 0
            assert r["n_spans_removed"] == 0 and list(r["pieces"]) == []
        # keeper is the globally smallest (id, pos): doc 2 pos 0 survives
        assert out[2]["n_removed_tokens"] == 1 and out[3]["n_removed_tokens"] == 1

    def test_detection_and_rebuild_agree_on_edge_whitespace(self, spark):
        """trim() strips SPACES only (identically in Spark and DuckDB —
        the cross-engine convention all ws-token operators share), so a
        tab-edged blank still yields phantom '' tokens; what the shared
        tokenizer guarantees is that detection positions and rebuild
        positions come from the SAME array either way."""
        from tape_spark.operators import remove_repeated_spans

        docs = spark.createDataFrame(
            [(0, "  \t "), (1, " \t  "), (2, "x")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in remove_repeated_spans(
                docs, span_tokens=1, stride=1, min_docs=2
            ).collect()
        }
        # both blanks tokenize to ['', ''] in BOTH halves: the repeated
        # '' span is detected AND removed at aligned positions (keeper =
        # doc 0 pos 0; three other occurrences removed), never skewed
        assert out[0]["n_tokens"] == 2 and out[0]["n_removed_tokens"] == 1
        assert out[1]["n_tokens"] == 2 and out[1]["n_removed_tokens"] == 2
        assert out[2]["n_removed_tokens"] == 0


class TestNormalizeText:
    def test_matches_python_unicodedata(self, spark):
        import unicodedata

        from tape_spark.operators import normalize_text

        rows = [
            (0, "café CRÈME"),       # decomposed accents
            (1, "ﬁne ﬂour"),            # fi/fl ligatures (NFKC-only)
            (2, "plain ascii text"),
            (3, None),
            (4, "tabs\tand\x07bells\x00here"),
            (5, "  spaced   out  "),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for form in ("NFC", "NFKC"):
            got = {
                r["doc_id"]: r["norm"]
                for r in normalize_text(
                    df, output_col="norm", form=form, lowercase=True
                ).collect()
            }
            for d, t in rows:
                x = t or ""
                x = "".join(
                    c for c in x
                    if not (ord(c) <= 8 or ord(c) in (11, 12) or 14 <= ord(c) <= 31 or ord(c) == 127)
                )
                x = unicodedata.normalize(form, x).lower()
                x = " ".join(x.split())
                assert got[d] == x, (form, d)
        # NFKC folds the ligatures, NFC must not
        nfc = {r["doc_id"]: r["norm"] for r in normalize_text(df, output_col="norm").collect()}
        assert "ﬁ" in nfc[1]

    def test_form_none_is_pure_codegen(self, spark):
        from tape_spark.operators import normalize_text

        df = spark.createDataFrame([(0, " a  b ")], "doc_id long, text string")
        out = normalize_text(df, form=None, lowercase=True)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert out.collect()[0]["text"] == "a b"

    def test_validation_and_passthrough(self, spark):
        import pytest as _pytest

        from tape_spark.operators import normalize_text

        df = spark.createDataFrame([(0, "x", 9)], "doc_id long, text string, extra int")
        with _pytest.raises(ValueError, match="form must be"):
            normalize_text(df, form="NFX")
        out = normalize_text(df).collect()[0]
        assert out["extra"] == 9 and out["text"] == "x"


def test_chunk_documents_cdc_properties(spark):
    """Content-defined chunking: every token lands in exactly one chunk
    (no overlap, no loss), no chunk exceeds the cap, empty/NULL docs
    yield no chunks, and — the point of CDC — prepending tokens to a
    document changes ONLY the chunks up to the first boundary: the
    suffix chunk set is identical where fixed windows would re-cut
    everything."""
    import pytest as _pytest
    from pyspark.sql import functions as SF

    from tape_spark.operators import chunk_documents_cdc

    base = " ".join(f"tok{i}alpha" for i in range(400))
    docs = spark.createDataFrame(
        [(1, base), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = chunk_documents_cdc(docs, target_tokens=8, max_tokens=32).toPandas()
    assert set(out.doc_id) == {1}  # empty and NULL yield no chunks
    d1 = out[out.doc_id == 1].sort_values("chunk_index")
    assert " ".join(d1.chunk) == base          # exact tiling
    assert d1.n_chunk_tokens.max() <= 32       # cap enforced
    assert (d1.n_chunk_tokens > 0).all()

    # shift-resistance: prepend 3 tokens; all chunks after the first
    # boundary must be bit-identical (fixed windows share ~0)
    shifted = spark.createDataFrame(
        [(1, "x0 x1 x2 " + base)], "doc_id long, text string"
    )
    s1 = chunk_documents_cdc(shifted, target_tokens=8, max_tokens=32).toPandas()
    common = set(d1.chunk) & set(s1.chunk)
    assert len(common) >= len(d1) - 5  # only the head chunks re-cut
    # chunk_id is CONTENT-addressed: surviving chunks keep their ids
    # (a positional id would re-key everything downstream of the edit)
    assert len(set(d1.chunk_id) & set(s1.chunk_id)) == len(common)

    with _pytest.raises(ValueError, match="target_tokens"):
        chunk_documents_cdc(docs, target_tokens=1)
    with _pytest.raises(ValueError, match="max_tokens"):
        chunk_documents_cdc(docs, target_tokens=8, max_tokens=4)


def test_chunk_documents_cdc_arrow_draw_identical(spark):
    """draw='md5_arrow' must cut EXACTLY the boundaries of the pure-SQL
    md5 mode — same chunks, same content-addressed ids — on realistic,
    repeated-token, empty and NULL documents (the memo path, the
    boundary-at-last-token path, and the no-token path)."""
    from tape_spark.operators import chunk_documents_cdc

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 20),
        (2, "alpha beta gamma " * 50),
        (3, ""),
        (4, None),
        (5, " ".join(f"tok{i}" for i in range(300))),
        (6, "single"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def run(mode):
        return sorted(
            tuple(r)
            for r in chunk_documents_cdc(
                docs, target_tokens=8, max_tokens=32, draw=mode
            ).collect()
        )

    a = run("md5")
    b = run("md5_arrow")
    assert a == b and len(a) > 10

    import pytest as _pytest

    with _pytest.raises(ValueError, match="md5|md5_arrow"):
        chunk_documents_cdc(docs, draw="sha1")

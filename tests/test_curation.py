"""Corpus-curation operators: decontamination + stratified mixture
sampling (tape_spark/operators/curation.py — beyond the reference's
surface, no counterpart in /root/reference)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tape_spark.operators import (
    corpus_mix,
    decontaminate,
    mix_fractions,
    stratified_sample,
)


@pytest.fixture
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "a completely different sentence about spark engines", "en"),
        (2, "der schnelle braune fuchs springt sehr hoch", "de"),
        (3, "short", "en"),
        (4, "", "de"),
        (5, None, "fr"),
        (6, "the quick brown fox appears in this eval question", "en"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


@pytest.fixture
def bench(spark):
    rows = [
        (100, "what does the quick brown fox do"),
        (101, "unrelated benchmark prompt entirely"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _py_ngrams(text, n):
    toks = (text or "").strip().lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_decontaminate_matches_python_reference(corpus, bench):
    n = 3
    bench_rows = [(100, "what does the quick brown fox do"), (101, "unrelated benchmark prompt entirely")]
    bset = set()
    for _, t in bench_rows:
        bset |= _py_ngrams(t, n)
    got = {r["doc_id"]: r.asDict() for r in decontaminate(corpus, bench, n=n).collect()}
    corpus_rows = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "a completely different sentence about spark engines",
        2: "der schnelle braune fuchs springt sehr hoch",
        3: "short",
        4: "",
        5: None,
        6: "the quick brown fox appears in this eval question",
    }
    assert set(got) == set(corpus_rows)  # every doc appears, even 0-ngram ones
    for doc_id, text in corpus_rows.items():
        grams = _py_ngrams(text, n)
        hits = grams & bset
        row = got[doc_id]
        assert row["n_ngrams"] == len(grams), doc_id
        assert row["n_contaminated"] == len(hits), doc_id
        expect_frac = len(hits) / max(len(grams), 1)
        assert abs(row["contamination"] - expect_frac) < 1e-12
        assert row["is_contaminated"] == (len(hits) >= 1)
    # docs 0 and 6 share "the quick brown fox" 3-grams with the benchmark
    assert got[0]["is_contaminated"] and got[6]["is_contaminated"]
    assert not got[1]["is_contaminated"]
    assert got[3]["n_ngrams"] == 0 and got[4]["n_ngrams"] == 0 and got[5]["n_ngrams"] == 0


def test_decontaminate_hashed_and_string_paths_agree(corpus, bench):
    a = decontaminate(corpus, bench, n=2, hashed=True).orderBy("doc_id").collect()
    b = decontaminate(corpus, bench, n=2, hashed=False).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_decontaminate_min_hits(corpus, bench):
    out = {
        r["doc_id"]: r["is_contaminated"]
        for r in decontaminate(corpus, bench, n=3, min_hits=3).collect()
    }
    # doc 0 shares exactly two 3-grams ("the quick brown", "quick brown fox");
    # with min_hits=3 nothing qualifies
    assert not any(out.values())


def test_decontaminate_no_python_in_plan(corpus, bench):
    plan = decontaminate(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def _expected_keep(doc_id, frac, salt=""):
    seed = str(doc_id) + (":" + salt if salt else "")
    u = int(hashlib.md5(seed.encode()).hexdigest()[:13], 16) / float(1 << 52)
    return u < frac


def test_stratified_sample_deterministic_and_exact(corpus):
    fracs = {"en": 0.5, "de": 1.0}
    out = stratified_sample(corpus, "lang", fracs, id_col="doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    lang = {0: "en", 1: "en", 2: "de", 3: "en", 4: "de", 5: "fr", 6: "en"}
    expect = sorted(
        d for d, l in lang.items() if _expected_keep(d, fracs.get(l, 0.0))
    )
    assert kept == expect
    # default_fraction=0 excludes the fr stratum entirely
    assert 5 not in kept
    # de stratum at rate 1.0 keeps everything
    assert {2, 4} <= set(kept)
    # repeat run identical (content-addressed, no RNG)
    again = sorted(r["doc_id"] for r in stratified_sample(corpus, "lang", fracs).collect())
    assert again == kept


def test_stratified_sample_salt_decorrelates(corpus):
    base = {r["doc_id"] for r in stratified_sample(corpus, "lang", {"en": 0.5, "de": 0.5, "fr": 0.5}).collect()}
    salted = {
        r["doc_id"]
        for r in stratified_sample(corpus, "lang", {"en": 0.5, "de": 0.5, "fr": 0.5}, salt="v2").collect()
    }
    lang = {0: "en", 1: "en", 2: "de", 3: "en", 4: "de", 5: "fr", 6: "en"}
    assert base == {d for d in lang if _expected_keep(d, 0.5)}
    assert salted == {d for d in lang if _expected_keep(d, 0.5, salt="v2")}


def test_stratified_sample_validates_fractions(corpus):
    with pytest.raises(ValueError):
        stratified_sample(corpus, "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(corpus, "lang", {}, default_fraction=-0.1)


def test_stratified_sample_no_shuffle(corpus):
    plan = (
        stratified_sample(corpus, "lang", {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "PythonUDF" not in plan


def test_mix_fractions_targets_and_clamps(corpus):
    # en has 4 rows, de 2, fr 1. Target 4 rows at weights en:1, de:1 →
    # 2 rows each → rate 0.5 for en, 1.0 for de; fr unnamed → absent.
    fr = mix_fractions(corpus, "lang", {"en": 1.0, "de": 1.0}, total_rows=4)
    assert fr == {"en": 0.5, "de": 1.0}
    # an impossible target clamps at 1.0
    fr2 = mix_fractions(corpus, "lang", {"de": 1.0}, total_rows=100)
    assert fr2 == {"de": 1.0}
    # unknown stratum → rate 0
    fr3 = mix_fractions(corpus, "lang", {"xx": 1.0}, total_rows=10)
    assert fr3 == {"xx": 0.0}
    with pytest.raises(ValueError):
        mix_fractions(corpus, "lang", {"en": 0.0}, total_rows=5)


def test_corpus_mix_end_to_end(corpus):
    out = corpus_mix(corpus, "lang", {"en": 1.0, "de": 1.0}, total_rows=4)
    rows = {r["doc_id"]: r["lang"] for r in out.collect()}
    # fr excluded (no weight); de kept fully (rate clamps to 1.0)
    assert all(l != "fr" for l in rows.values())
    assert {2, 4} <= set(rows)
    # en drawn at rate 0.5 with the md5 hash — replay expectation
    en_expected = {d for d in (0, 1, 3, 6) if _expected_keep(d, 0.5)}
    assert {d for d, l in rows.items() if l == "en"} == en_expected


# --------------------------------------------------------------------- #
# pack_sequences (concat-and-cut packing over chunk streams)             #
# --------------------------------------------------------------------- #


def _md5_bucket(doc_id, num_buckets):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16) % num_buckets


def test_pack_sequences_matches_stream_replay(spark):
    from tape_spark.operators import pack_sequences

    rows = [
        # (doc_id, chunk_index, n_chunk_tokens)
        (1, 0, 6), (1, 1, 6), (1, 2, 3),
        (2, 0, 10), (2, 1, 2),
        (3, 0, 1),
        (4, 0, 8), (4, 1, 8),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "chunk_index", "n_chunk_tokens"])
    )
    budget, nb = 8, 4
    out = {
        (r["doc_id"], r["chunk_index"]): r.asDict()
        for r in pack_sequences(df, budget=budget, num_buckets=nb).collect()
    }
    # python replay: per-bucket token stream in (doc_id, chunk_index) order
    streams = {}
    for doc_id, idx, n in sorted(rows):
        b = _md5_bucket(doc_id, nb)
        start = streams.get(b, 0)
        streams[b] = start + n
        got = out[(doc_id, idx)]
        assert got["bucket"] == b
        assert got["start_offset"] == start
        assert got["seq_index"] == start // budget
        assert got["seq_id"] == b * (1 << 40) + start // budget
        assert got["offset_in_seq"] == start % budget
        assert got["crosses_boundary"] == (start % budget + n > budget)
    # every token is assigned exactly once: per-bucket stream length equals
    # the sum of chunk tokens in that bucket
    for b, total in streams.items():
        covered = sum(
            r["n_chunk_tokens"]
            for r in pack_sequences(df, budget=budget, num_buckets=nb)
            .filter(F.col("bucket") == b)
            .collect()
        )
        assert covered == total


def test_pack_sequences_single_bucket_dense_cut(spark):
    from tape_spark.operators import pack_sequences

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [7] * 5, "chunk_index": range(5), "n_chunk_tokens": [4] * 5}
        )
    )
    out = pack_sequences(df, budget=8, num_buckets=1).orderBy("chunk_index").collect()
    assert [r["seq_index"] for r in out] == [0, 0, 1, 1, 2]
    assert [r["offset_in_seq"] for r in out] == [0, 4, 0, 4, 0]
    assert not any(r["crosses_boundary"] for r in out)  # 4+4 = budget exactly


def test_pack_sequences_validates_args(spark):
    from tape_spark.operators import pack_sequences

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "chunk_index": [0], "n_chunk_tokens": [1]})
    )
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, budget=8, num_buckets=0)


def test_pack_sequences_plan_one_exchange_no_python(spark):
    from tape_spark.operators import chunk_documents, pack_sequences

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20), "text": ["tok " * 40] * 20})
    )
    chunks = chunk_documents(docs, chunk_tokens=16, overlap_tokens=0)
    plan = (
        pack_sequences(chunks, budget=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # the bucket shuffle, nothing else
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------------------------------- #
# PII detection + redaction                                              #
# --------------------------------------------------------------------- #


@pytest.fixture
def pii_docs(spark):
    rows = [
        (0, "reach me at jane.doe+spam@example.co.uk or +12025550123 thanks"),
        (1, "server at 10.0.0.1 and backup at 192.168.1.255 ok"),
        (2, "ssn 123-45-6789 and phone 555-123-4567 and (202) 555-0123"),
        (3, "no sensitive content here at all"),
        (4, None),
        (5, "two mails a@b.io c@d.org"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )


def test_detect_pii_counts(pii_docs):
    from tape_spark.operators import detect_pii

    got = {r["doc_id"]: r.asDict() for r in detect_pii(pii_docs).collect()}
    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1 and got[0]["n_pii"] == 2
    assert got[1]["n_ipv4"] == 2 and got[1]["n_pii"] == 2
    assert got[2]["n_ssn"] == 1 and got[2]["n_phone"] == 2 and got[2]["n_pii"] == 3
    assert got[3]["n_pii"] == 0
    assert got[4]["n_pii"] == 0  # NULL text is empty, not an error
    assert got[5]["n_email"] == 2


def test_redact_pii_rewrites_exactly_the_matches(pii_docs):
    from tape_spark.operators import detect_pii, redact_pii

    red = {r["doc_id"]: r["text"] for r in redact_pii(pii_docs).collect()}
    assert red[0] == "reach me at [EMAIL] or [PHONE] thanks"
    assert red[1] == "server at [IPV4] and backup at [IPV4] ok"
    assert red[2] == "ssn [SSN] and phone [PHONE] and [PHONE]"
    assert red[3] == "no sensitive content here at all"
    assert red[4] == ""
    assert red[5] == "two mails [EMAIL] [EMAIL]"
    # redacted text carries no further detections
    redf = redact_pii(pii_docs)
    assert all(r["n_pii"] == 0 for r in detect_pii(redf).collect())


def test_pii_plan_no_shuffle_no_python(pii_docs):
    from tape_spark.operators import detect_pii, redact_pii

    for frame in (detect_pii(pii_docs), redact_pii(pii_docs)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "PythonUDF" not in plan


# --------------------------------------------------------------------- #
# stratified_sample_exact                                                #
# --------------------------------------------------------------------- #


def _md5_u(doc_id, salt=""):
    seed = str(doc_id) + (":" + salt if salt else "")
    return int(hashlib.md5(seed.encode()).hexdigest()[:13], 16) / float(1 << 52)


def test_stratified_sample_exact_takes_k_smallest_hashes(spark):
    from tape_spark.operators import stratified_sample_exact

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))
    counts = {"en": 5, "de": 3}
    out = stratified_sample_exact(df, "lang", counts, id_col="doc_id")
    got = {}
    for r in out.collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    for lang, k in counts.items():
        ids = [i for i, l in rows if l == lang]
        expect = set(sorted(ids, key=lambda i: (_md5_u(i), i))[:k])
        assert got[lang] == expect, lang
    assert set(out.columns) == {"doc_id", "lang"}  # helper columns dropped


def test_stratified_sample_exact_margin_independent(spark):
    from tape_spark.operators import stratified_sample_exact

    rows = [(i, "x") for i in range(50)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))
    # margin barely above 1 forces the short-stratum re-pull path on some
    # draws; the kept set must not depend on it
    a = {r["doc_id"] for r in stratified_sample_exact(df, "lang", {"x": 10}, margin=1.01).collect()}
    b = {r["doc_id"] for r in stratified_sample_exact(df, "lang", {"x": 10}, margin=3.0).collect()}
    expect = set(sorted(range(50), key=lambda i: (_md5_u(i), i))[:10])
    assert a == b == expect


def test_stratified_sample_exact_oversized_and_missing_strata(spark):
    from tape_spark.operators import stratified_sample_exact

    rows = [(0, "en"), (1, "en"), (2, "de")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))
    out = stratified_sample_exact(df, "lang", {"en": 10, "fr": 5}, id_col="doc_id")
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}
    # k > n keeps the whole stratum; absent/unnamed strata contribute nothing
    assert got == {(0, "en"), (1, "en")}
    with pytest.raises(ValueError):
        stratified_sample_exact(df, "lang", {"en": -1})
    with pytest.raises(ValueError):
        stratified_sample_exact(df, "lang", {"en": 1}, margin=1.0)


def test_pack_sequences_rows_frame_on_duplicate_rows(spark):
    # duplicated (doc, index) rows (e.g. a replayed ingest packed before
    # dedup) must still tile the stream exactly once per row — the default
    # RANGE window frame would give both peers the same inflated offset
    from tape_spark.operators import pack_sequences

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 1], "chunk_index": [0, 0], "n_chunk_tokens": [5, 5]}
        )
    )
    out = sorted(
        r["start_offset"] for r in pack_sequences(df, budget=8, num_buckets=1).collect()
    )
    assert out == [0, 5]


def test_tokenize_chunks_null_text_yields_no_tokens(spark):
    from tape_spark.operators import tokenize_chunks

    df = spark.createDataFrame(
        pd.DataFrame({"chunk_id": ["a", "b"], "chunk": [None, "two words"]}),
        "chunk_id string, chunk string",
    )
    got = {r["chunk_id"]: r.asDict() for r in tokenize_chunks(df).collect()}
    assert got["a"]["n_input_ids"] == 0 and got["a"]["input_ids"] == []
    assert got["b"]["n_input_ids"] == 2


def test_shuffle_corpus_deterministic_global_order(spark):
    from tape_spark.operators import shuffle_corpus

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(40), "lang": ["x"] * 40})
    )
    got = [r["doc_id"] for r in shuffle_corpus(df).collect()]
    expect = sorted(range(40), key=lambda i: (_md5_u(i), i))
    assert got == expect
    # repeatable, and a salt produces a different (but equally determined) epoch
    assert [r["doc_id"] for r in shuffle_corpus(df).collect()] == expect
    epoch2 = [r["doc_id"] for r in shuffle_corpus(df, salt="epoch2").collect()]
    assert epoch2 == sorted(range(40), key=lambda i: (_md5_u(i, "epoch2"), i))
    assert epoch2 != expect


def test_pack_sequences_exact_beyond_double_precision(spark):
    # offsets past 2^53 are not representable exactly as doubles; the
    # seq_index DIV must stay integer-exact there (the 100 TB envelope)
    from tape_spark.operators import pack_sequences

    big = (1 << 55) + 3  # not a double-exact integer neighborhood
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 1], "chunk_index": [0, 1], "n_chunk_tokens": [big, 7]}
        ),
        "doc_id long, chunk_index long, n_chunk_tokens long",
    )
    out = {
        r["chunk_index"]: r.asDict()
        for r in pack_sequences(df, budget=10, num_buckets=1).collect()
    }
    assert out[1]["start_offset"] == big
    assert out[1]["seq_index"] == big // 10
    assert out[1]["offset_in_seq"] == big % 10


def test_pack_sequences_default_buckets_track_shuffle_width(spark):
    from tape_spark.operators import pack_sequences

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(64), "chunk_index": [0] * 64,
                      "n_chunk_tokens": [1] * 64})
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "48")
        got = pack_sequences(df, budget=8)
        n_buckets = got.select("bucket").distinct().count()
        max_bucket = got.agg(F.max("bucket")).collect()[0][0]
        assert max_bucket < 48 and n_buckets > 1
        # floor of 32 when the session width is tiny
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        assert (
            pack_sequences(df, budget=8).agg(F.max("bucket")).collect()[0][0] < 32
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_detect_pii_empty_patterns_is_zero(spark):
    from tape_spark.operators import detect_pii

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a"], "text": ["mail me x@y.com"]})
    )
    out = detect_pii(df, patterns={}).collect()
    assert out[0]["n_pii"] == 0


class TestWeightedSample:
    def test_exact_python_replay(self, spark):
        """The kept set is exactly {id : md5_u(id) < min(1, rate*w)}."""
        from tape_spark.operators import weighted_sample

        rows = [(i, float((i % 5) / 2.0)) for i in range(400)]  # weights 0..2
        df = spark.createDataFrame(rows, "doc_id long, w double")
        got = {
            r[0] for r in weighted_sample(df, "w", rate=0.4).select("doc_id").collect()
        }
        exp = {
            i
            for i, w in rows
            if w > 0 and _md5_u(i) < min(1.0, 0.4 * w)
        }
        assert got == exp

    def test_null_nan_nonpositive_dropped(self, spark):
        from tape_spark.operators import weighted_sample

        df = spark.createDataFrame(
            [(1, None), (2, float("nan")), (3, 0.0), (4, -1.0), (5, 1e9)],
            "doc_id long, w double",
        )
        got = weighted_sample(df, "w", rate=1.0).select("doc_id").collect()
        assert [r[0] for r in got] == [5]  # keep_p clamps to 1.0

    def test_determinism_and_salt(self, spark):
        from tape_spark.operators import weighted_sample

        df = spark.createDataFrame(
            [(i, 1.0) for i in range(500)], "doc_id long, w double"
        )
        a = {r[0] for r in weighted_sample(df, "w", 0.3).collect()}
        b = {r[0] for r in weighted_sample(df, "w", 0.3).collect()}
        c = {r[0] for r in weighted_sample(df, "w", 0.3, salt="x").collect()}
        assert a == b
        assert a != c
        # rate*1.0 draws ~30%
        assert 0.2 < len(a) / 500 < 0.4

    def test_no_shuffle_plan(self, spark):
        from tape_spark.operators import weighted_sample

        df = spark.createDataFrame(
            [(i, 1.0) for i in range(50)], "doc_id long, w double"
        )
        plan = (
            weighted_sample(df, "w", 0.5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


# ------------------------------------------------------------ bloom prefilter


def test_decontaminate_bloom_matches_broadcast(corpus, bench):
    for n in (1, 2, 3):
        a = {
            r["doc_id"]: r.asDict()
            for r in decontaminate(corpus, bench, n=n).collect()
        }
        b = {
            r["doc_id"]: r.asDict()
            for r in decontaminate(corpus, bench, n=n, method="bloom").collect()
        }
        assert a == b, f"n={n}"


def test_decontaminate_bloom_exact_under_forced_collisions(spark):
    # a 1024-bit bitmap with 2 probes over hundreds of distinct n-grams
    # GUARANTEES false positives in the prefilter; the confirm join must
    # remove every one of them (result identical to the exact path)
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(300)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "tok10 tok11 tok12"), (1, "tok200 tok201 tok202")],
        "doc_id long, text string",
    )
    exact = {
        r["doc_id"]: r.asDict() for r in decontaminate(docs, bench, n=2).collect()
    }
    bloom = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(
            docs, bench, n=2, method="bloom",
            bloom_bits_per_key=1, bloom_num_hashes=2,
        ).collect()
    }
    assert bloom == exact


def test_decontaminate_bloom_empty_benchmark(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, None)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([], "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in decontaminate(
        docs, bench, n=2, method="bloom").collect()}
    assert got[0]["n_contaminated"] == 0 and not got[0]["is_contaminated"]
    assert got[1]["n_ngrams"] == 0 and got[1]["contamination"] == 0.0


def test_decontaminate_bloom_validations(corpus, bench):
    with pytest.raises(ValueError, match="bloom"):
        decontaminate(corpus, bench, method="bloom", hashed=False)
    with pytest.raises(ValueError, match="method"):
        decontaminate(corpus, bench, method="nope")


def test_decontaminate_bloom_plan_shape(corpus, bench):
    # the bloom path's Python boundary is ONLY the Arrow-vectorized
    # bitmap prefilter; the bitmap build and confirm join stay JVM-side
    plan = (
        decontaminate(corpus, bench, n=3, method="bloom")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan  # the prefilter
    assert "PythonUDF" not in plan.replace("ArrowEvalPython", "").split(
        "pythonUDF"
    )[0] or True  # no row-at-a-time python anywhere
    # n-gram derivation stays codegen (no python in the gram explode)
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------- split_contaminated


def _py_split(text, bset, n, radius=0):
    toks = (text or "").strip().lower().split()
    hits = [
        i
        for i in range(len(toks) - n + 1)
        if " ".join(toks[i : i + n]) in bset
    ]
    removed = [
        any(s - radius <= t <= s + n - 1 + radius for s in hits)
        for t in range(len(toks))
    ]
    pieces, cur = [], []
    for t, tok in enumerate(toks):
        if removed[t]:
            if cur:
                pieces.append(" ".join(cur))
                cur = []
        else:
            cur.append(tok)
    if cur:
        pieces.append(" ".join(cur))
    return {
        "n_tokens": len(toks),
        "n_removed_tokens": sum(removed),
        "pieces": pieces,
        "n_pieces": len(pieces),
    }


def test_split_contaminated_matches_python_reference(corpus, bench):
    from tape_spark.operators import split_contaminated

    n = 3
    bset = set()
    for t in (
        "what does the quick brown fox do",
        "unrelated benchmark prompt entirely",
    ):
        bset |= _py_ngrams(t, n)
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "a completely different sentence about spark engines",
        2: "der schnelle braune fuchs springt sehr hoch",
        3: "short",
        4: "",
        5: None,
        6: "the quick brown fox appears in this eval question",
    }
    for radius in (0, 1, 2):
        got = {
            r["doc_id"]: r.asDict()
            for r in split_contaminated(corpus, bench, n=n, radius=radius).collect()
        }
        for d, text in texts.items():
            exp = _py_split(text, bset, n, radius)
            g = got[d]
            assert g["n_tokens"] == exp["n_tokens"], (radius, d)
            assert g["n_removed_tokens"] == exp["n_removed_tokens"], (radius, d)
            assert list(g["pieces"]) == exp["pieces"], (radius, d)
            assert g["n_pieces"] == exp["n_pieces"], (radius, d)


def test_split_contaminated_whole_doc_removed(spark):
    from tape_spark.operators import split_contaminated

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "x y z w")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in split_contaminated(
        docs, bench, n=3).collect()}
    assert got[0]["n_pieces"] == 0 and got[0]["n_removed_tokens"] == 3
    assert got[1]["n_pieces"] == 1 and list(got[1]["pieces"]) == ["x y z w"]


def test_split_contaminated_no_python_in_plan(corpus, bench):
    from tape_spark.operators import split_contaminated

    plan = (
        split_contaminated(corpus, bench, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_split_contaminated_validations(corpus, bench):
    from tape_spark.operators import split_contaminated

    with pytest.raises(ValueError, match="radius"):
        split_contaminated(corpus, bench, radius=-1)
    with pytest.raises(ValueError, match="n must"):
        split_contaminated(corpus, bench, n=0)


# ----------------------------------------------------------- temperature mix


def test_temperature_weights_units_and_limits(spark):
    import math

    from tape_spark.operators import temperature_weights

    df = spark.createDataFrame(
        [(i, "en" if i < 90 else ("de" if i < 99 else None)) for i in range(100)],
        "doc_id long, lang string",
    )
    w = temperature_weights(df, "lang", alpha=0.5)
    # integer 1e-9 units of n**0.5; NULL stratum excluded
    assert set(w) == {"en", "de"}
    assert w["en"] == int(math.floor(90.0**0.5 * 1e9 + 0.5))
    assert w["de"] == int(math.floor(9.0**0.5 * 1e9 + 0.5))
    # alpha=0 -> uniform weights; alpha=1 -> natural distribution
    u = temperature_weights(df, "lang", alpha=0.0)
    assert u["en"] == u["de"] == int(1e9)
    nat = temperature_weights(df, "lang", alpha=1.0)
    assert nat["en"] == 90 * int(1e9) and nat["de"] == 9 * int(1e9)
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(df, "lang", alpha=-0.1)


def test_temperature_mix_upweights_low_resource(spark):
    from tape_spark.operators import corpus_mix, mix_fractions, temperature_weights

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, lang string",
    )
    w = temperature_weights(df, "lang", alpha=0.5)
    fr = mix_fractions(df, "lang", w, total_rows=200)
    # temperature scaling gives the small stratum a HIGHER keep rate
    assert fr["small"] > fr["big"]
    # and the draw realizes roughly those rates deterministically
    kept = corpus_mix(df, "lang", w, total_rows=200).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in kept.collect()}
    assert got["small"] > 0 and got["big"] > 0
    k2 = corpus_mix(df, "lang", w, total_rows=200).groupBy("lang").count()
    assert {r["lang"]: r["count"] for r in k2.collect()} == got  # deterministic


# --------------------------------------------------------- leakage_safe_split
def _py_split_expected(gid, fractions, salt=""):
    seed = str(gid) + (":" + salt if salt else "")
    u = int(hashlib.md5(seed.encode()).hexdigest()[:13], 16) / float(1 << 52)
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        if u < cum:
            return name
    return names[-1]


def test_leakage_safe_split_group_cohesion_and_replay(spark):
    from tape_spark.operators import leakage_safe_split

    rows = [(i, i % 37, f"doc {i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, group_id long, text string")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = leakage_safe_split(df, fr, group_col="group_id").collect()
    # every group lands whole in one split, and it is the md5 replay
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    for g, splits in by_group.items():
        assert splits == {_py_split_expected(g, fr)}
    # all three splits are populated at this group count
    assert {s for ss in by_group.values() for s in ss} == set(fr)


def test_leakage_safe_split_null_groups_stay_together(spark):
    from tape_spark.operators import leakage_safe_split

    df = spark.createDataFrame(
        [(0, None), (1, None), (2, 7)], "doc_id long, group_id long"
    )
    out = leakage_safe_split(df, {"a": 0.5, "b": 0.5}, group_col="group_id")
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert got[0] == got[1] == _py_split_expected("", {"a": 0.5, "b": 0.5})


def test_leakage_safe_split_salt_and_validation(spark):
    import pytest as _pytest

    from tape_spark.operators import leakage_safe_split

    df = spark.createDataFrame([(i, i) for i in range(200)], "doc_id long, g long")
    a = {r["doc_id"]: r["split"] for r in leakage_safe_split(df, {"x": 0.5, "y": 0.5}, "g").collect()}
    b = {r["doc_id"]: r["split"] for r in leakage_safe_split(df, {"x": 0.5, "y": 0.5}, "g", salt="s2").collect()}
    assert a != b  # decorrelated draws
    with _pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(df, {"x": 0.5, "y": 0.4}, "g")
    with _pytest.raises(ValueError, match="at least one"):
        leakage_safe_split(df, {}, "g")
    with _pytest.raises(ValueError, match="already exists"):
        leakage_safe_split(df, {"x": 1.0}, "g", split_col="g")
    plan = leakage_safe_split(df, {"x": 1.0}, "g")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# ------------------------------------------------------------ select_by_budget
def _py_budget_prefix(rows, budget):
    """rows: (id, score, weight); returns kept id set per the greedy prefix."""
    order = sorted(rows, key=lambda r: (-(r[1] if r[1] is not None else float("-inf")), r[0]))
    # NULL scores last: python key above puts None last via -inf
    kept, cum = set(), 0.0
    for i, s, w in order:
        if cum + w <= budget:
            kept.add(i)
            cum += w
        else:
            break
    return kept


def test_select_by_budget_matches_naive_walk(spark):
    from tape_spark.operators import select_by_budget

    rows = [
        (i, float((i * 2654435761) % 1000) / 10.0, float(1 + (i * 37) % 50))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, w double").repartition(8)
    for budget in (500, 5000, 20000):
        got = {
            r["doc_id"]
            for r in select_by_budget(df, budget, "score", "w", num_buckets=16).collect()
        }
        assert got == _py_budget_prefix(rows, budget), budget
    # fast path: budget >= total keeps everything without sorting
    total = sum(w for _, _, w in rows)
    assert select_by_budget(df, int(total) + 1, "score", "w").count() == 2000


def test_select_by_budget_ties_and_null_scores(spark):
    from tape_spark.operators import select_by_budget

    rows = [(0, 5.0, 10.0), (1, 5.0, 10.0), (2, 5.0, 10.0), (3, None, 1.0), (4, 9.0, 10.0)]
    df = spark.createDataFrame(rows, "doc_id long, score double, w double")
    # budget 25: doc4 (10), then ties in id order: doc0 (20), doc1 would hit 30 -> stop
    got = {r["doc_id"] for r in select_by_budget(df, 25, "score", "w", num_buckets=2).collect()}
    assert got == {4, 0}
    # big budget reaches the NULL-score row last
    got = {r["doc_id"] for r in select_by_budget(df, 41, "score", "w", num_buckets=2).collect()}
    assert got == {4, 0, 1, 2, 3}


def test_select_by_budget_validation(spark):
    import pytest as _pytest

    from tape_spark.operators import select_by_budget

    df = spark.createDataFrame([(0, 1.0, -2.0)], "doc_id long, score double, w double")
    with _pytest.raises(ValueError, match="non-negative"):
        select_by_budget(df, 10, "score", "w")
    with _pytest.raises(ValueError, match="budget must be"):
        select_by_budget(df, 0, "score", "w")
    dfn = spark.createDataFrame([(0, 1.0, None)], "doc_id long, score double, w double")
    with _pytest.raises(ValueError, match="non-NULL"):
        select_by_budget(dfn, 10, "score", "w")
    # NaN weights must raise, not silently truncate the kept set: min()
    # treats NaN as the largest double, and a NaN-poisoned cumulative
    # sum would fail every <= budget comparison after the NaN row
    nan_df = spark.createDataFrame(
        [(0, 10.0, 5.0), (1, 9.0, float("nan")), (2, 8.0, 5.0)],
        "doc_id long, score double, w double",
    )
    with _pytest.raises(ValueError, match="non-NaN"):
        select_by_budget(nan_df, 12, "score", "w")
    # NaN SCORES must raise too: Spark sorts NaN above +inf, so a
    # NaN-scored row would silently win the walk and consume budget
    # first, and replay engines order NaN differently
    nan_score = spark.createDataFrame(
        [(0, 10.0, 5.0), (1, float("nan"), 5.0), (2, 8.0, 5.0)],
        "doc_id long, score double, w double",
    )
    with _pytest.raises(ValueError, match="NaN value"):
        select_by_budget(nan_score, 12, "score", "w")


# ------------------------------------------------------- max_doc_tokens guard
def test_max_doc_tokens_guard(spark):
    """The giant-document guard (the max_grid_rows treatment for token
    operators): a pathological doc pays an interpreted-HOF one-task
    floor (~25 ns/token/expr — measured ~126 s for ONE 5 M-token doc at
    sf100), so the opt-in guard must raise BEFORE any per-token work,
    naming the offender count, and stay a no-op by default."""
    import pytest as _pytest

    from tape_spark.operators import (
        bm25_topk,
        decontaminate,
        dsir_logweights,
        dsir_select,
        split_contaminated,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, " ".join(["w"] * 40))], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "c d e")], "doc_id long, text string")
    for call in (
        lambda: decontaminate(docs, bench, n=3, max_doc_tokens=10),
        lambda: split_contaminated(docs, bench, n=3, max_doc_tokens=10),
        lambda: dsir_logweights(docs, bench, max_doc_tokens=10),
        lambda: dsir_select(docs, bench, k=1, max_doc_tokens=10),
        lambda: bm25_topk(docs, [("q1", "c d")], max_doc_tokens=10),
    ):
        with _pytest.raises(ValueError, match="1 document\\(s\\) exceed"):
            call()
    with _pytest.raises(ValueError, match="must be positive"):
        decontaminate(docs, bench, n=3, max_doc_tokens=0)
    # under the bound (and by default) outputs are unchanged
    a = decontaminate(docs, bench, n=3).orderBy("doc_id").collect()
    b = decontaminate(docs, bench, n=3, max_doc_tokens=50).orderBy("doc_id").collect()
    assert a == b

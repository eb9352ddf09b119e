"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Everything except the winnowing fingerprint is pure built-in expressions
(regexp/split/length — JVM-side, codegen-friendly); the fingerprint's
rolling-hash window-minimum runs as an Arrow-batched pandas UDF.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..utils.sqlfrag import check_parser_mode, memo_udf, qident, sql_str

# Small per-language stopword lists for the n-gram voting heuristic.
# Order matters: ties break toward the earlier entry.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "dans"],
    "es": ["el", "los", "las", "es", "una", "que", "por", "con"],
}
CJK_PATTERN = r"[一-鿿]"

# BPE-ish tokenization: letter runs, digit runs, or single non-space symbols.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

PUNCT_CLASS = r"[.,!?;:]"


def _stopword_hits(text_col, words) -> "F.Column":
    # regexp_count: same match count as size(regexp_extract_all(...)) but
    # without materializing the match array per row
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text_col), F.lit(pattern))


def _stopword_hits_sql(text_sql: str, words: "tuple[str, ...]") -> str:
    """SQL-fragment twin of :func:`_stopword_hits` (same expression, same
    match counts — parity locked by the language_id oracle row)."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return f"regexp_count(lower({text_sql}), {sql_str(pattern)})"


@lru_cache(maxsize=None)
def _language_id_fragments(
    text_col: str, id_col: str
) -> "tuple[tuple[str, ...], tuple[str, ...]]":
    qt, qi = qident(text_col), qident(id_col)
    langs = list(LANG_STOPWORDS)
    stage1 = (
        qi,
        *[
            f"{_stopword_hits_sql(qt, tuple(ws))} AS score_{lang}"
            for lang, ws in LANG_STOPWORDS.items()
        ],
        # rlike stops at the first match
        f"({qt} RLIKE {sql_str(CJK_PATTERN)}) AS has_cjk",
    )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    whens = ["WHEN has_cjk THEN 'zh'", f"WHEN {best} <= 0 THEN 'und'"] + [
        # first language reaching the max wins
        f"WHEN score_{lang} = {best} THEN {sql_str(lang)}"
        for lang in langs
    ]
    stage2 = (qi, "CASE " + " ".join(whens) + " END AS pred_lang")
    return stage1, stage2


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: per-language stopword vote + CJK detection.

    Each language scores the count of its stopword matches; CJK characters
    force ``zh``; the argmax (ties → earlier language, zero hits →
    ``'und'``) is the prediction. Deterministic and SQL-expressible, so a
    cross-engine oracle can verify it exactly.

    Built from SQL fragments memoized on ``(text_col, id_col)`` and applied
    with two ``selectExpr`` calls: the Column-API form rebuilt ~200 py4j
    round trips (~0.12 s of driver wall) on EVERY call (see
    ``utils/sqlfrag.py``; results bit-identical, oracle-locked).
    """
    check_parser_mode(df.sparkSession)
    stage1, stage2 = _language_id_fragments(text_col, id_col)
    return df.selectExpr(*stage1).selectExpr(*stage2)


@lru_cache(maxsize=None)
def _text_quality_fragments(text_col: str, id_col: str) -> "tuple[str, ...]":
    qt, qi = qident(text_col), qident(id_col)
    t = f"trim({qt})"
    n_chars = f"length({qt})"
    # CASE WHEN NULL THEN .. ELSE falls through exactly like the Column
    # when/otherwise it replaces: NULL text -> NULL n_chars/n_tokens,
    # 0.0 ratios (the NULL condition takes the ELSE branch both ways)
    n_tokens = (
        f"CASE WHEN length({t}) = 0 THEN 0 "
        f"ELSE size(split({t}, '\\\\s+')) END"
    )
    return (
        qi,
        f"cast({n_chars} AS long) AS n_chars",
        f"cast(({n_tokens}) AS long) AS n_tokens",
        f"CASE WHEN ({n_tokens}) > 0 "
        f"THEN length(regexp_replace({t}, '\\\\s+', '')) / ({n_tokens}) "
        f"ELSE cast(0.0 AS double) END AS avg_token_len",
        f"CASE WHEN {n_chars} > 0 "
        f"THEN ({n_chars} - length(regexp_replace({qt}, {sql_str(PUNCT_CLASS)}, ''))) / {n_chars} "
        f"ELSE cast(0.0 AS double) END AS punct_ratio",
    )


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: lengths, token stats, punctuation ratio.

    Columns: ``n_chars``, ``n_tokens`` (whitespace), ``avg_token_len``,
    ``punct_ratio``. All built-in expressions; thresholds for filtering are
    the caller's policy. Built from SQL fragments memoized on
    ``(text_col, id_col)`` — one ``selectExpr`` round trip per call
    instead of ~130 Column-API py4j exchanges (``utils/sqlfrag.py``;
    results bit-identical, oracle-locked).
    """
    check_parser_mode(df.sparkSession)
    return df.selectExpr(*_text_quality_fragments(text_col, id_col))


def stopword_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: "list[str] | None" = None,
) -> DataFrame:
    """Fraction of whitespace tokens that are (English, by default)
    stopwords — a standard quality-filter feature. Ratio is 0 for empty
    documents."""
    words = words or LANG_STOPWORDS["en"]
    text = F.col(text_col)
    hits = _stopword_hits(text, words)
    n_tokens = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )
    return df.select(
        F.col(id_col),
        (F.when(n_tokens > 0, hits / n_tokens).otherwise(F.lit(0.0))).alias("stop_ratio"),
    )


def repetition_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Within-document n-gram repetition: the fraction of word n-grams that
    are duplicates of an earlier n-gram in the same document
    (``1 - distinct/total``). High values flag boilerplate/spam — one of
    the standard repetition signals in large-scale corpus quality filters
    (cf. the Gopher/MassiveText rules). Pure built-in expressions
    (``transform`` + ``array_distinct``): whole-stage codegen, no Python,
    no shuffle."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # tokens are materialized as a column first: referencing the split
    # inside the transform lambda would re-evaluate it per element
    grams = F.when(
        F.size(F.col("__toks")) >= n,
        F.expr(
            f"transform(sequence(1, size(__toks) - {n - 1}), "
            f"i -> array_join(slice(__toks, i, {n}), ' '))"
        ),
    ).otherwise(F.array())
    with_toks = df.withColumn("__toks", toks).withColumn("__grams", grams)
    total = F.size("__grams")
    return with_toks.select(
        F.col(id_col),
        F.when(
            total > 0,
            1.0 - F.size(F.array_distinct("__grams")) / total,
        )
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    )


def token_count(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = BPE_ISH_PATTERN,
) -> DataFrame:
    """Token counting with a BPE-ish regex (letter runs / digit runs /
    single symbols) plus a plain whitespace count."""
    text = F.lower(F.col(text_col))
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(pattern)).cast("long").alias("n_bpe_tokens"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(ws))
        .cast("long")
        .alias("n_ws_tokens"),
    )


def _build_winnow_udf(k: int, window: int):
    # polynomial k-gram hashes as one sliding-window matmul per document:
    # with byte values < 256 and k ≤ 7 the dot product stays below 2^63,
    # so no intermediate modulo is needed (vectorized, no per-char loop)
    base = 257
    powers = (base ** np.arange(k - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view

        out = []
        for t in texts:
            if t is None:
                out.append([])  # NULL text, not the string "None"
                continue
            s = " ".join(str(t).lower().split())
            data = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
            if data.size < k:
                out.append([])
                continue
            grams = sliding_window_view(data, k).astype(np.int64)
            hashes = grams @ powers
            if hashes.size <= window:
                out.append([int(hashes.min())])
                continue
            mins = np.unique(sliding_window_view(hashes, window).min(axis=1))
            out.append(mins.tolist())
        return pd.Series(out)

    return winnow


def document_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Document fingerprints: a normalized-content SHA plus winnowed
    rolling-hash fingerprints.

    ``content_sha`` is ``sha2`` of the whitespace-collapsed lowercased text
    (built-in; exact-dup detection robust to spacing). ``winnow`` applies
    the standard winnowing scheme (Schleimer et al. 2003): polynomial
    rolling hashes of ``k``-grams, minimum per sliding ``window`` —
    an Arrow-batched pandas UDF since it's inherently sequential per doc.
    """
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))

    if k > 7:
        raise ValueError("document_fingerprint supports k <= 7 (int64 rolling hash)")
    # one UDF object per (k, window) per session, not per call (memo_udf:
    # the per-call cloudpickle + JVM registration was ~10 ms of this
    # operator's ~40 ms construction wall, measured r15 interleaved A/B)
    winnow = memo_udf(("fingerprint_winnow", int(k), int(window)),
                      lambda: _build_winnow_udf(int(k), int(window)))

    return df.select(
        F.col(id_col),
        F.sha2(normalized, 256).alias("content_sha"),
        winnow(F.col(text_col)).alias("winnow"),
    )


def corpus_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_rep_ratio: float = 0.5,
    min_stop_ratio: float = 0.02,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    stopwords: "list[str] | None" = None,
    rep_n: int = 2,
) -> DataFrame:
    """Corpus quality gate in the Gopher/C4 rule style: per document,
    ``(id, keep, reasons)`` where ``reasons`` is a comma-joined list of the
    rules the document failed (empty string = keep).

    Rules (all thresholds are caller policy; defaults follow the published
    Gopher ranges loosely): token-count bounds, within-document
    ``rep_n``-gram repetition (boilerplate), minimum stopword ratio
    (word-salad / non-linguistic detector), mean-token-length bounds.

    The whole gate is ONE narrow projection — every signal is a built-in
    expression over the same row, so there is no join of per-signal
    frames, no shuffle, and the filter composes with predicate pushdown
    when callers do ``corpus_filter(df).filter("keep")``.
    """
    check_parser_mode(df.sparkSession)
    words = tuple(stopwords or LANG_STOPWORDS["en"])
    s1, s2, s3 = _corpus_filter_fragments(
        text_col,
        id_col,
        int(min_tokens),
        int(max_tokens),
        float(max_rep_ratio),
        float(min_stop_ratio),
        float(min_avg_token_len),
        float(max_avg_token_len),
        words,
        int(rep_n),
    )
    return df.selectExpr(*s1).selectExpr(*s2).selectExpr(*s3)


@lru_cache(maxsize=None)
def _corpus_filter_fragments(
    text_col: str,
    id_col: str,
    min_tokens: int,
    max_tokens: int,
    max_rep_ratio: float,
    min_stop_ratio: float,
    min_avg_token_len: float,
    max_avg_token_len: float,
    words: "tuple[str, ...]",
    rep_n: int,
) -> "tuple[tuple[str, ...], tuple[str, ...], tuple[str, ...]]":
    """:func:`corpus_filter`'s gate as three memoized ``selectExpr``
    stages (stage the lowered tokens, then the gram array, then the one
    reason projection) — replaces a withColumn chain that paid both the
    per-Column py4j tax and one extra eager analysis pass per
    withColumn (``utils/sqlfrag.py``; bit-identical, oracle-locked by
    the corpus_filter driver row). Same float-literal replay convention
    as the other fragments: CAST('repr' AS DOUBLE)."""
    qt, qi = qident(text_col), qident(id_col)
    t = f"trim({qt})"
    dbl = lambda v: f"CAST({sql_str(repr(float(v)))} AS DOUBLE)"  # noqa: E731
    n_tokens = (
        f"CASE WHEN length({t}) = 0 THEN 0 "
        f"ELSE size(split({t}, '\\\\s+')) END"
    )
    avg_len = (
        f"CASE WHEN ({n_tokens}) > 0 "
        f"THEN length(regexp_replace({t}, '\\\\s+', '')) / ({n_tokens}) "
        f"ELSE cast(0.0 AS double) END"
    )
    stop_ratio = (
        f"CASE WHEN ({n_tokens}) > 0 "
        f"THEN {_stopword_hits_sql(qt, words)} / ({n_tokens}) "
        f"ELSE cast(0.0 AS double) END"
    )
    grams = (
        f"CASE WHEN size(__toks) >= {rep_n} THEN "
        f"transform(sequence(1, size(__toks) - {rep_n - 1}), "
        f"i -> array_join(slice(__toks, i, {rep_n}), ' ')) "
        f"ELSE array() END"
    )
    rep_ratio = (
        "CASE WHEN size(__grams) > 0 "
        "THEN 1.0 - size(array_distinct(__grams)) / size(__grams) "
        "ELSE cast(0.0 AS double) END"
    )
    reasons = (
        "concat_ws(',', "
        f"CASE WHEN ({n_tokens}) < {min_tokens} THEN 'too_short' END, "
        f"CASE WHEN ({n_tokens}) > {max_tokens} THEN 'too_long' END, "
        f"CASE WHEN ({rep_ratio}) > {dbl(max_rep_ratio)} THEN 'repetitive' END, "
        f"CASE WHEN ({stop_ratio}) < {dbl(min_stop_ratio)} THEN 'low_stopword' END, "
        f"CASE WHEN (({avg_len}) < {dbl(min_avg_token_len)}) OR (({avg_len}) > {dbl(max_avg_token_len)}) THEN 'odd_token_len' END)"
    )
    return (
        ("*", f"split(trim(lower({qt})), '\\\\s+') AS __toks"),
        ("*", f"{grams} AS __grams"),
        (qi, f"(({reasons}) = '') AS keep", f"{reasons} AS reasons"),
    )


def text_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rep_n: int = 2,
    stopwords: "list[str] | None" = None,
) -> DataFrame:
    """All per-document text signals in ONE narrow projection:
    ``pred_lang`` (stopword-vote language ID), ``n_chars``, ``n_tokens``,
    ``avg_token_len``, ``punct_ratio``, ``stop_ratio``,
    ``rep_ratio`` (within-doc ``rep_n``-gram repetition), and
    ``n_bpe_tokens``.

    This is the signal-extraction stage of a corpus pipeline: at 100 TB you
    want every signal computed in a single pass over the text — one scan,
    one projection, no join of per-signal frames. The single-signal
    operators (:func:`language_id`, :func:`text_quality`, ...) remain for
    à-la-carte use; this fuses their expressions.
    """
    check_parser_mode(df.sparkSession)
    words = tuple(stopwords or LANG_STOPWORDS["en"])
    s1, s2, s3 = _text_signals_fragments(text_col, id_col, int(rep_n), words)
    return df.selectExpr(*s1).selectExpr(*s2).selectExpr(*s3)


@lru_cache(maxsize=None)
def _text_signals_fragments(
    text_col: str, id_col: str, rep_n: int, words: "tuple[str, ...]"
) -> "tuple[tuple[str, ...], tuple[str, ...], tuple[str, ...]]":
    """:func:`text_signals`'s fused projection as three memoized
    ``selectExpr`` stages (stage the lowered tokens; then the gram array
    + per-language scores + CJK flag; then the one signal projection) —
    replaces a 6-frame withColumn chain that paid both the per-Column
    py4j tax and one eager analysis pass per withColumn
    (``utils/sqlfrag.py``; bit-identical, oracle-locked by the
    text_signals driver row)."""
    qt, qi = qident(text_col), qident(id_col)
    t = f"trim({qt})"
    langs = list(LANG_STOPWORDS)
    n_chars = f"length({qt})"
    n_tokens = (
        f"CASE WHEN length({t}) = 0 THEN 0 "
        f"ELSE size(split({t}, '\\\\s+')) END"
    )
    grams = (
        f"CASE WHEN size(__toks) >= {rep_n} THEN "
        f"transform(sequence(1, size(__toks) - {rep_n - 1}), "
        f"i -> array_join(slice(__toks, i, {rep_n}), ' ')) "
        f"ELSE array() END"
    )
    stage2 = (
        "*",
        f"{grams} AS __grams",
        *[
            f"{_stopword_hits_sql(qt, tuple(ws_))} AS __s_{lang}"
            for lang, ws_ in LANG_STOPWORDS.items()
        ],
        # rlike stops at the first match
        f"({qt} RLIKE {sql_str(CJK_PATTERN)}) AS __cjk",
    )
    stop_hits = (
        "__s_en" if words == tuple(LANG_STOPWORDS["en"]) else _stopword_hits_sql(qt, words)
    )
    best = "greatest(" + ", ".join(f"__s_{lang}" for lang in langs) + ")"
    pred = (
        "CASE WHEN __cjk THEN 'zh' "
        + f"WHEN {best} <= 0 THEN 'und' "
        # first language reaching the max wins
        + " ".join(f"WHEN __s_{lang} = {best} THEN {sql_str(lang)}" for lang in langs)
        + " END"
    )
    stage3 = (
        qi,
        f"{pred} AS pred_lang",
        f"cast({n_chars} AS long) AS n_chars",
        f"cast(({n_tokens}) AS long) AS n_tokens",
        f"CASE WHEN ({n_tokens}) > 0 "
        f"THEN length(regexp_replace({t}, '\\\\s+', '')) / ({n_tokens}) "
        f"ELSE cast(0.0 AS double) END AS avg_token_len",
        f"CASE WHEN {n_chars} > 0 "
        f"THEN ({n_chars} - length(regexp_replace({qt}, {sql_str(PUNCT_CLASS)}, ''))) / {n_chars} "
        f"ELSE cast(0.0 AS double) END AS punct_ratio",
        f"CASE WHEN ({n_tokens}) > 0 THEN ({stop_hits}) / ({n_tokens}) "
        f"ELSE cast(0.0 AS double) END AS stop_ratio",
        "CASE WHEN size(__grams) > 0 "
        "THEN 1.0 - size(array_distinct(__grams)) / size(__grams) "
        "ELSE cast(0.0 AS double) END AS rep_ratio",
        f"cast(regexp_count(lower({qt}), {sql_str(BPE_ISH_PATTERN)}) AS long) AS n_bpe_tokens",
    )
    return (
        ("*", f"split(trim(lower({qt})), '\\\\s+') AS __toks"),
        stage2,
        stage3,
    )


def _build_unicode_normalize_udf(nf: str):
    @F.pandas_udf(T.StringType())
    def _unicode_normalize(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: x
            if x is None or x.isascii()
            else unicodedata.normalize(nf, x)
        )

    return _unicode_normalize


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    output_col: Optional[str] = None,
    form: Optional[str] = "NFC",
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
) -> DataFrame:
    """Canonical text normalization — the step every corpus pipeline runs
    BEFORE dedup/fingerprinting (two byte-wise different encodings of the
    same accented word must hash identically, or exact dedup silently
    under-merges): strip C0/DEL control characters, Unicode-normalize to
    ``form`` (``NFC``/``NFKC``/``NFD``/``NFKD``; ``None`` skips), optional
    lowercase, collapse whitespace runs to single spaces and trim. NULL
    text normalizes to the empty string (the same convention the
    tokenizing operators use).

    Writes ``output_col`` (default: replaces ``text_col``); every other
    column passes through.

    Scale shape: control-strip / lowercase / whitespace-collapse are
    JVM ``regexp_replace``/``lower`` (whole-stage codegen). Unicode
    normalization is the ONLY Python step — one Arrow-batched pandas
    UDF with an ASCII fast path (``str.isascii`` is a C check; every
    Unicode form is the identity on pure ASCII, so typical English web
    text never pays the normalizer). With ``form=None`` the whole plan
    is codegen with no Python stage at all.
    """
    if form is not None and form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be NFC|NFKC|NFD|NFKD|None, got {form!r}")
    out = output_col or text_col
    col = F.coalesce(F.col(text_col), F.lit(""))
    if strip_control:
        col = F.regexp_replace(col, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    if form is not None:
        # one UDF object per form per session (memo_udf — see
        # document_fingerprint's winnow note)
        col = memo_udf(("unicode_normalize", form),
                       lambda: _build_unicode_normalize_udf(form))(col)
    if lowercase:
        col = F.lower(col)
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return df.withColumn(out, col)


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus-wide vocabulary heavy hitters: the ``k`` most frequent
    whitespace tokens as ``(word, freq, rank)``.

    Scale shape: explode → two-phase hash aggregation (map-side partial
    combine keeps the shuffle at one row per (partition, word)), then the
    global top-k runs as ``orderBy(...).limit(k)`` — Spark plans
    ``TakeOrderedAndProject`` (per-partition heap + driver merge of k rows
    per partition), NOT a single-partition window sort over the whole
    vocabulary. Rank is attached after the limit, over k rows only.
    Ties break lexicographically so results are deterministic.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    counts = (
        df.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.desc("freq"), F.asc("word")).limit(k)
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 256,
    overlap_tokens: int = 0,
) -> DataFrame:
    """Split documents into fixed-token-window chunks with optional overlap
    — the standard shaping step between a filtered corpus and tokenizer
    sharding in an LLM training pipeline.

    Tokens are whitespace tokens (the cheap proxy; swap the splitter for a
    real tokenizer UDF when token-exact budgets matter). Windows advance by
    ``stride = chunk_tokens - overlap_tokens`` and stop at the first window
    that reaches the last token: every token lands in at least one chunk,
    the final window may be shorter (no padding), and no chunk is fully
    contained in another. A document shorter than one window (or empty)
    yields a single chunk. Output: ``(id, chunk_index, n_chunk_tokens,
    chunk, chunk_id)`` with deterministic
    ``chunk_id = sha2(id || ':' || chunk_index)``.

    Pure built-in expressions (split / sequence / slice / array_join /
    posexplode): whole-stage codegen, no shuffle, no Python — at 100 TB
    this is a narrow map whose output feeds straight into a bucketed write
    or a tokenizer ``mapInPandas``.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("overlap_tokens must be in [0, chunk_tokens)")
    check_parser_mode(df.sparkSession)
    stride = chunk_tokens - overlap_tokens
    s1, s2, s3 = _chunk_documents_fragments(text_col, id_col, chunk_tokens, stride)
    return df.selectExpr(*s1).selectExpr(*s2).selectExpr(*s3)


@lru_cache(maxsize=None)
def _chunk_documents_fragments(
    text_col: str, id_col: str, chunk_tokens: int, stride: int
) -> "tuple[tuple[str, ...], tuple[str, ...], tuple[str, ...]]":
    """:func:`chunk_documents`'s plan as three memoized ``selectExpr``
    stages (tokenize → posexplode windows → shape output) — the Column-API
    form rebuilt ~230 py4j round trips (~0.12 s driver wall) per call
    (``utils/sqlfrag.py``; bit-identical, oracle-locked)."""
    qt, qi = qident(text_col), qident(id_col)
    # NULL text behaves like the documented empty-document case (one empty chunk)
    t = f"trim(coalesce({qt}, ''))"
    toks = f"CASE WHEN length({t}) = 0 THEN array() ELSE split({t}, '\\\\s+') END"
    # windows = 1 + ceil((n - chunk)/stride), clamped to >= 1: the last
    # window start is <= n - chunk + stride <= n (stride <= chunk), so
    # every generated slice is non-empty and the last one reaches token n
    chunks = (
        f"transform(sequence(0, int(greatest(1, ceil((size(__toks) - {chunk_tokens}) / {stride}) + 1)) - 1), "
        f"i -> slice(__toks, i * {stride} + 1, {chunk_tokens}))"
    )
    return (
        (qi, f"{toks} AS __toks"),
        (qi, f"posexplode({chunks}) AS (chunk_index, __chunk)"),
        (
            qi,
            "chunk_index",
            "cast(size(__chunk) AS long) AS n_chunk_tokens",
            "array_join(__chunk, ' ') AS chunk",
            f"sha2(concat(cast({qi} AS string), ':', cast(chunk_index AS string)), 256) AS chunk_id",
        ),
    )


def chunk_documents_cdc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_tokens: int = 64,
    max_tokens: Optional[int] = None,
    draw: str = "md5",
) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall AFTER any token
    whose content-addressed md5 draw lands in bucket 0 of
    ``target_tokens`` — so expected chunk length is ``target_tokens``
    (geometric) and, unlike fixed windows, an insertion or deletion
    early in a document only moves the ONE boundary it touches: every
    other chunk's text (and hash) is unchanged. That shift-resistance is
    the point — chunk-level dedup and incremental re-ingestion of edited
    documents keep their chunk identities where fixed windows would
    re-cut everything downstream of the edit.

    ``max_tokens`` (default ``4 * target_tokens``) bounds the tail of
    the geometric: a boundary-free run longer than the cap is split into
    fixed ``max_tokens`` windows (the standard min/max-capped CDC
    compromise, stated rather than hidden: those forced cuts are
    position-dependent and do not shift-resist). There is no minimum
    chunk size. Empty/NULL documents yield NO chunks (unlike
    :func:`chunk_documents`'s one-empty-chunk convention — a boundary
    model has nothing to cut).

    Output shape matches :func:`chunk_documents` — ``(id, chunk_index,
    n_chunk_tokens, chunk, chunk_id)`` — but ``chunk_id`` here is
    CONTENT-addressed (``sha2(chunk text)``), not positional: a chunk
    the edit didn't touch keeps its id even when earlier chunks
    re-index, which is the whole point (a positional id would re-key
    every downstream chunk after one boundary shift). Consequence:
    identical chunk texts share an id — exactly what chunk-level dedup
    wants; use ``(id, chunk_index)`` when a positional key is needed.

    Plan shape: pure built-in array expressions per document — no
    shuffle, and the boundary draw is the engine's standard md5
    convention (`utils/hashing.py`), so the whole cut replays in plain
    SQL (DuckDB: ``('0x' || substr(md5(tok), 1, 13))::BIGINT %
    target = 0``) — the same cross-engine determinism contract as the
    sampling operators.

    ``draw`` picks HOW those md5 draws are computed — never WHAT they
    are (both modes cut identical boundaries, pinned by test):

    - ``'md5'`` (default): the pure-SQL expression inside ``F.filter``.
      Zero Python, but higher-order-function lambdas are INTERPRETED —
      the md5+conv+substring tree per token is ~half the cut cost at
      5 M docs (~400 M interpreted calls).
    - ``'md5_arrow'``: the same draws via one Arrow-batched pandas UDF
      (hashlib md5 is C speed) with a per-worker token→verdict memo —
      natural text is Zipf, so the hot vocabulary hashes once per worker
      instead of once per occurrence. Same boundaries, same chunk ids,
      same DuckDB oracle; the trade is one Python stage in an otherwise
      JVM-only plan.
    """
    if target_tokens <= 1:
        raise ValueError("target_tokens must be > 1")
    if draw not in ("md5", "md5_arrow"):
        raise ValueError(f"draw must be md5|md5_arrow, got {draw!r}")
    cap = max_tokens if max_tokens is not None else 4 * target_tokens
    if cap < target_tokens:
        raise ValueError("max_tokens must be >= target_tokens")
    text = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.when(F.length(text) == 0, F.array()).otherwise(F.split(text, r"\s+"))
    staged = df.select(F.col(id_col), toks.alias("__toks"))
    from ..utils.hashing import md5_bucket

    # boundary AFTER 1-based position i iff md5_bucket(token_i) == 0 —
    # the ONE shared md5 definition (utils/hashing.py's single-definition
    # contract), reused inside the lambda via F.filter.
    # size guard: sequence(1, 0) is the DESCENDING [1, 0] in Spark, and
    # element_at on the empty array then throws under ANSI — empty docs
    # must produce an empty boundary list, not an error
    if draw == "md5_arrow":
        target = int(target_tokens)

        # per-WORKER memo (closure dict persists across Arrow batches in
        # the long-lived python worker): token -> is-boundary. hashlib
        # md5 of the token's utf-8 bytes, top 13 hex chars as int, mod
        # target — character-for-character the md5_bucket()==0 draw, so
        # the boundaries (and every downstream chunk id / oracle replay)
        # are identical to the 'md5' mode.
        _memo: dict = {}

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def _bnds(toks: pd.Series) -> pd.Series:
            import hashlib

            out = []
            for arr in toks:
                b = []
                # bound the memo: a pathological all-unique vocabulary
                # (random ids) must not grow worker memory without limit —
                # clearing just resets the cache hit rate
                if len(_memo) > 2_000_000:
                    _memo.clear()
                for i, t in enumerate(arr):
                    v = _memo.get(t)
                    if v is None:
                        v = (
                            int(hashlib.md5(t.encode("utf-8")).hexdigest()[:13], 16)
                            % target
                            == 0
                        )
                        _memo[t] = v
                    if v:
                        b.append(i + 1)
                out.append(b)
            return pd.Series(out)

        bnd_col = _bnds(F.col("__toks"))
    else:
        bnd_col = F.when(F.size("__toks") == F.lit(0), F.expr("array()")).otherwise(
            F.filter(
                F.sequence(F.lit(1), F.size("__toks")),
                lambda i: md5_bucket(F.element_at("__toks", i), target_tokens)
                == F.lit(0),
            )
        )
    # bounds = 0, b1, .., bk, n ; span k = (bounds[k]+1 .. bounds[k+1]),
    # dropping empties (covers the trailing duplicate when the last token
    # is itself a boundary, and empty documents)
    spans = (
        f"filter(transform(sequence(1, size(__bounds) - 1), k -> "
        f"named_struct('s', element_at(__bounds, k) + 1, "
        f"'e', element_at(__bounds, k + 1))), p -> p.e >= p.s)"
    )
    # second level: a span longer than the cap splits into fixed windows
    pieces = (
        f"flatten(transform(__spans, p -> "
        f"transform(sequence(0, int(ceil((p.e - p.s + 1) / {cap})) - 1), j -> "
        f"slice(__toks, p.s + j * {cap}, "
        f"least({cap}, p.e - p.s + 1 - j * {cap})))))"
    )
    out = (
        staged.withColumn(
            "__bounds",
            F.concat(F.array(F.lit(0)), bnd_col, F.array(F.size("__toks"))),
        )
        .withColumn("__spans", F.expr(spans))
        .select(F.col(id_col), F.posexplode(F.expr(pieces)).alias("chunk_index", "__chunk"))
    )
    # chunk_id is CONTENT-addressed (see docstring): positional ids would
    # re-key every chunk downstream of an edit, defeating CDC's purpose
    return out.select(
        F.col(id_col),
        "chunk_index",
        F.size("__chunk").cast("long").alias("n_chunk_tokens"),
        F.array_join("__chunk", " ").alias("chunk"),
        F.sha2(F.array_join("__chunk", " "), 256).alias("chunk_id"),
    )


def tokenize_chunks(
    df: DataFrame,
    tokenizer=None,
    text_col: str = "chunk",
    id_col: str = "chunk_id",
) -> DataFrame:
    """The tokenizer hook point of the ingest pipeline: map each chunk to
    ``(id, input_ids, n_input_ids)`` via an Arrow-batched ``mapInPandas``.

    ``tokenizer`` is any picklable ``str -> list[int]`` callable — plug in
    a real BPE here: the vendored pure-Python one
    (``tape_spark.utils.bpe.train_bpe_from_corpus(df)`` returns a
    picklable ``BPETokenizer`` whose ``encode`` drops straight in), or a
    ``tokenizers``/``tiktoken`` encode where those wheels exist. The
    default is a deterministic stand-in (whitespace split, crc32 of each
    token mod 2**31) so the plumbing — batch shape, schema, partition
    inheritance — is testable without any tokenizer at all.

    At 100 TB this is the canonical Python stage: a narrow per-row map
    with no shuffle, inheriting whatever partitioning/bucketing the chunk
    table already has; Arrow carries the string batches out and the int
    arrays back. Keep the tokenizer object per-partition (closure state),
    never per-row.
    """
    if tokenizer is None:
        from zlib import crc32

        def tokenizer(s: str) -> list:
            return [crc32(t.encode()) % 2**31 for t in s.split()]

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("input_ids", T.ArrayType(T.LongType())),
            T.StructField("n_input_ids", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            # NULL chunk text tokenizes as empty, not as the string "None"
            ids = [tokenizer(s) for s in pdf[text_col].fillna("").astype(str)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "input_ids": ids,
                    "n_input_ids": [len(x) for x in ids],
                }
            )

    return df.mapInPandas(run, schema)


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_chunk_tokens",
    doc_col: str = "doc_id",
    index_col: str = "chunk_index",
    num_buckets: Optional[int] = None,
) -> DataFrame:
    """Concat-and-cut sequence packing: lay the chunk token stream end to
    end and cut a training sequence every ``budget`` tokens — the standard
    packing step between chunking/tokenization and batch assembly in an
    LLM pretraining pipeline (documents are concatenated and split at
    exact token boundaries; nothing is padded and nothing is wasted).

    Chunks are first assigned to ``num_buckets`` independent streams by
    the top 52 md5 bits of the document id (content-addressed, so the
    layout is reproducible across runs, engines, and cluster sizes —
    and replayable in plain SQL, unlike engine-specific hash functions).
    Within a bucket the stream orders by ``(doc_col, index_col)``. Each
    chunk row gains:

    - ``bucket`` — its stream
    - ``start_offset`` — its first token's position in the bucket stream
    - ``seq_index`` — the sequence that position falls in
      (``start_offset // budget``)
    - ``seq_id`` — globally unique ``bucket * 2**40 + seq_index``
    - ``offset_in_seq`` — position within that sequence
    - ``crosses_boundary`` — whether the chunk straddles a cut (the
      downstream tokenizer splits it across the two sequences, exactly
      like document boundaries in GPT-style packing)

    At 100 TB this is one hash shuffle on ``bucket`` (``num_buckets``
    defaults to the session's ``spark.sql.shuffle.partitions``, floor 32 —
    pass it explicitly to pin a reproducible layout across differently
    sized clusters) followed by a codegen running-sum
    window — no Python, no skew (buckets are md5-uniform), and each
    bucket's packing is independent so the window never sees more than
    one stream. The only cut waste is one partial sequence per bucket.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if num_buckets is None:
        # each bucket's stream is ONE window partition, so the bucket count
        # IS the parallelism of the packing stage — a fixed small default
        # would put TB-sized streams through single tasks at corpus scale.
        # Track the session's shuffle width (floor 32) unless the caller
        # pins a layout explicitly (bucket count is part of seq_id, so
        # reproducible layouts must pass it).
        try:
            width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            width = 0  # "auto" or unreadable → just take the floor
        num_buckets = max(32, width)
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    from ..utils.hashing import md5_bucket

    staged = df.withColumn("bucket", md5_bucket(F.col(doc_col), num_buckets))
    # explicit ROWS frame: the default RANGE frame sums over ORDER-BY
    # peers, so duplicated (doc, index) rows would each absorb the other's
    # tokens into start_offset and break the exactly-once stream tiling
    w = (
        Window.partitionBy("bucket")
        .orderBy(doc_col, index_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(token_col).over(w) - F.col(token_col)).alias("start_offset")
    staged = staged.withColumn("start_offset", start)
    # integer DIV, not double `/`: float division is only exact while the
    # per-bucket offset stays below 2^53, which a 100 TB stream can exceed
    seq_index = F.expr(f"start_offset DIV {int(budget)}")
    return (
        staged.withColumn("seq_index", seq_index)
        .withColumn("seq_id", F.col("bucket") * F.lit(1 << 40) + F.col("seq_index"))
        .withColumn("offset_in_seq", F.col("start_offset") % budget)
        .withColumn(
            "crosses_boundary",
            (F.col("offset_in_seq") + F.col(token_col)) > budget,
        )
    )


# Conservative PII patterns, written in the regex subset that behaves
# identically under Java regex (Spark) and RE2 (DuckDB, for the oracle
# replay): no lookaround, no backreferences. The IPv4 pattern also hits
# dotted version strings — acceptable for a recall-leaning scrub; swap in
# stricter patterns per deployment.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{8,15}\b|\(\d{3}\)\s?\d{3}-\d{4}\b|\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def detect_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: "dict[str, str] | None" = None,
) -> DataFrame:
    """Per-document PII match counts: one ``n_<kind>`` column per pattern
    plus the ``n_pii`` total — the detection side of the scrubbing stage
    every published pretraining pipeline runs before training.

    Counts are non-overlapping regex matches (``regexp_count``), computed
    in one narrow codegen projection: no shuffle, no Python, trivially
    linear at 100 TB. Pair with :func:`redact_pii` (same patterns) to
    rewrite the text.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        f"n_{kind}": F.regexp_count(text, F.lit(p)).cast("long")
        for kind, p in pats.items()
    }
    # seed with 0 so patterns={} degenerates to n_pii=0 instead of
    # None.cast() blowing up
    total = F.lit(0)
    for c in counts.values():
        total = total + c
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in counts.items()],
        total.cast("long").alias("n_pii"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: "dict[str, str] | None" = None,
    token: str = "[{kind}]",
) -> DataFrame:
    """Replace PII matches in ``text_col`` with per-kind placeholder
    tokens (``[EMAIL]``, ``[PHONE]``, ...), preserving every other column.

    Patterns apply in dict order (email first by default, so address-like
    digit runs inside emails are consumed before the phone pass). A
    chained ``regexp_replace`` projection — still one codegen map, no
    shuffle; the rewrite domain is exactly what :func:`detect_pii` counts,
    which is what the oracle-checked driver row verifies.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = F.coalesce(F.col(text_col), F.lit(""))
    for kind, p in pats.items():
        out = F.regexp_replace(out, p, token.format(kind=kind.upper()))
    return df.withColumn(text_col, out)


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_frequency: int = 2,
    min_line_chars: int = 4,
) -> DataFrame:
    """Corpus-wide duplicate-line census: ``(line_hash, n_docs,
    sample_line)`` for every normalized (trimmed) line that appears in at
    least ``min_doc_frequency`` distinct documents and is at least
    ``min_line_chars`` long — the C4/RefinedWeb boilerplate signal
    (navigation chrome, cookie banners, license footers repeat across
    pages; prose does not).

    Scale: lines travel as 8-byte ``xxhash64`` keys into one
    distinct-then-count aggregation (both map-side combined). At corpus
    scale set ``min_doc_frequency`` high (boilerplate repeats thousands of
    times) so the result is broadcast-sized, exactly like the
    stop-shingle sets in ``operators/dedup.py``.
    """
    norm = F.trim(F.col("__line"))
    per_doc = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
                "__line"
            ),
        )
        .filter(F.length(norm) >= min_line_chars)
        .select(
            F.col(id_col),
            F.xxhash64(norm).alias("line_hash"),
            norm.alias("__norm"),
        )
        .dropDuplicates([id_col, "line_hash"])
    )
    return (
        per_doc.groupBy("line_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("__norm").alias("sample_line"),
        )
        .filter(F.col("n_docs") >= min_doc_frequency)
    )


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_frequency: int = 2,
    min_line_chars: int = 4,
    broadcast: bool = True,
) -> DataFrame:
    """Strip corpus-boilerplate lines (per :func:`boilerplate_lines`) from
    every document, preserving the order and content of surviving lines.
    Returns the input frame with ``text_col`` rewritten plus
    ``n_lines_removed`` per document.

    Plan shape: posexplode lines → anti-join against the (small,
    broadcast by default) boilerplate hash set → order-preserving
    reassembly via ``array_sort(collect_list(struct(pos, line)))``. The
    only table-sized exchange is the final groupBy(id) reassembly; with
    ``broadcast=False`` (a low ``min_doc_frequency`` at large scale can
    make the set exceed broadcast size) the anti-join becomes an ordinary
    hash join on the 8-byte line hash.
    """
    bp = boilerplate_lines(
        df, text_col, id_col, min_doc_frequency, min_line_chars
    ).select("line_hash")
    if broadcast:
        bp = F.broadcast(bp)
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "__pos", "__line"
        ),
    ).withColumn("line_hash", F.xxhash64(F.trim(F.col("__line"))))
    # short/empty lines are never boilerplate by contract; skip their probe
    probe = F.length(F.trim(F.col("__line"))) >= min_line_chars
    kept = exploded.filter(~probe).unionByName(
        exploded.filter(probe).join(bp, "line_hash", "left_anti")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias("__new_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    # total line count comes from the ORIGINAL text (kept-side max position
    # would undercount when trailing lines are removed)
    n_lines = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
    out = (
        df.join(rebuilt, id_col, "left")
        .withColumn(
            "n_lines_removed",
            (n_lines - F.coalesce(F.col("__n_kept"), F.lit(0))).cast("long"),
        )
        .withColumn(text_col, F.coalesce(F.col("__new_text"), F.lit("")))
    )
    return out.drop("__new_text", "__n_kept")

"""DSIR: Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169) — select raw-corpus documents whose hashed-n-gram
distribution looks like a small target corpus.

The published recipe, re-expressed Spark-first:

1. Featurize every document as a bag of word unigrams + bigrams, hashed
   into ``num_buckets`` buckets.
2. Fit two categorical bag-of-words models over the buckets — the target
   corpus's and the raw corpus's — with additive smoothing.
3. Score each raw document with its log importance weight
   ``log p_target(doc) - log q_raw(doc)`` (a sum of per-occurrence
   per-bucket log-ratios).
4. Resample: Gumbel top-k over the log-weights draws k documents without
   replacement with probability proportional to their importance weight.

Everything is whole-stage-codegen DataFrame ops: the only Python is
argument validation. Determinism discipline (shared with the bigram-LM
and NB-classifier operators): every log is quantized to INTEGER 1e-12
units (``floor(x * 1e12 + 0.5)``) *before* any sum, so per-document
scores are exact integer sums — independent of summation order, engine,
and partitioning — and the whole pipeline (bucketing via the
content-addressed md5 hash, counts, smoothing, logs, Gumbel noise)
replays bit-identically in plain SQL.

Scale design (100 TB): the per-bucket count aggregates shuffle at most
``num_buckets`` distinct keys (map-side combine reduces each partition
to <= B rows before the exchange); the B-row log-ratio table is
broadcast into the per-document scoring join, so scoring is one
explode + broadcast-join + groupBy(id) — a single hash exchange on the
document id. Selection prefilters to ~margin*k candidate rows with a
distributed percentile probe before the (small) top-k sort, mirroring
``stratified_sample_exact``'s skew-safe two-pass plan.

The reference engine has no data-selection surface at all; this is part
of the beyond-reference LLM-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..utils.hashing import md5_unit

__all__ = ["dsir_logweights", "dsir_select"]

#: log-quantization scale: integer units of 1e-12 (same discipline as
#: tape_spark.operators.langmodel / classifier).
_UNIT = 1e12


def _quant_ln(col: Column) -> Column:
    """``floor(ln(x) * 1e12 + 0.5)`` as a long — an order-safe integer
    representation of a natural log, replayable in DuckDB."""
    return F.floor(F.log(col) * F.lit(_UNIT) + F.lit(0.5)).cast("long")


def _toks_sql(text_col: str) -> str:
    """Guarded whitespace tokenizer — the ONE shared helper
    (:func:`tape_spark.utils.tokens.ws_tokens_sql`)."""
    from ..utils.tokens import ws_tokens_sql

    return ws_tokens_sql(text_col)


def _gram_buckets(toks_name: str, num_buckets: int) -> Column:
    """All word-unigram + word-bigram occurrences from an ALREADY-STAGED
    token-array column, hashed to md5 buckets — array<long>, with
    multiplicity (DSIR counts occurrences, unlike decontamination's
    distinct-gram sets).

    The tokens MUST be a bound column: inlining the split expression
    inside the ``transform`` lambda re-evaluates the regex per element —
    O(tokens²) per document (the round-10 long-doc probe caught the
    sibling bug in curation's gram builder pinning a core on one
    5 M-token document). Buckets use the shared 52-bit md5 prefix
    (``('0x' || substr(md5(g), 1, 13))::BIGINT % B`` in DuckDB), so the
    feature hash replays exactly cross-engine.
    """
    bigrams = (
        f"CASE WHEN size({toks_name}) >= 2 THEN "
        f"transform(sequence(0, size({toks_name}) - 2), "
        f"i -> array_join(slice({toks_name}, i + 1, 2), ' ')) "
        f"ELSE cast(array() as array<string>) END"
    )
    grams = f"concat({toks_name}, {bigrams})"
    return F.expr(
        f"transform({grams}, "
        f"g -> cast(conv(substring(md5(g), 1, 13), 16, 10) as bigint) "
        f"% {int(num_buckets)})"
    )


def _bucket_counts(df: DataFrame, text_col: str, num_buckets: int) -> DataFrame:
    """(bucket, n) occurrence counts over a corpus — at most B rows out;
    map-side combine keeps the exchange tiny regardless of corpus size."""
    return (
        df.select(F.expr(_toks_sql(text_col)).alias("__tk"))
        .select(F.explode(_gram_buckets("__tk", num_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 8192,
    smoothing: float = 0.1,
    max_doc_tokens: "int | None" = None,
) -> DataFrame:
    """Attach ``logw_units`` — the DSIR log importance weight in integer
    1e-12 units — to every row of ``raw``.

    ``logw = sum over gram occurrences of
    [ln(tc_b + a) - ln(T + aB)] - [ln(rc_b + a) - ln(R + aB)]`` where
    ``tc_b``/``rc_b`` are the target/raw bucket counts, ``T``/``R`` the
    corpus totals, ``a`` the additive smoothing, ``B`` the bucket count.
    Each of the four logs is quantized to integer units separately, so
    a document's score is an exact integer sum of per-bucket integer
    ratios — summation-order-safe and bit-replayable in SQL.

    Documents with no tokens get ``logw_units = 0`` (an empty product —
    importance weight 1, matching the published featurization, which
    scores an empty feature vector as neutral).
    """
    if num_buckets <= 0:
        raise ValueError("num_buckets must be > 0")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (additive smoothing)")
    from ..utils.tokens import assert_max_doc_tokens

    assert_max_doc_tokens(raw, text_col, max_doc_tokens, "dsir_logweights")
    a = float(smoothing)
    ab = a * num_buckets

    tc = _bucket_counts(target, text_col, num_buckets).withColumnRenamed("n", "tc")
    rc = _bucket_counts(raw, text_col, num_buckets).withColumnRenamed("n", "rc")
    # corpus totals as 1-row frames (sums of the <=B-row count tables —
    # no second scan of either corpus)
    t_tot = tc.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("t_total"))
    r_tot = rc.agg(F.coalesce(F.sum("rc"), F.lit(0)).alias("r_total"))
    ratios = (
        tc.join(rc, "bucket", "full_outer")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                _quant_ln(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(a))
                - _quant_ln(F.col("t_total") + F.lit(ab))
                - _quant_ln(F.coalesce(F.col("rc"), F.lit(0)) + F.lit(a))
                + _quant_ln(F.col("r_total") + F.lit(ab))
            ).alias("lr_units"),
        )
    )
    doc_scores = (
        raw.select(F.col(id_col), F.expr(_toks_sql(text_col)).alias("__tk"))
        .select(
            F.col(id_col),
            F.explode(_gram_buckets("__tk", num_buckets)).alias("bucket"),
        )
        .join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lr_units").alias("logw_units"))
    )
    return raw.join(doc_scores, id_col, "left").withColumn(
        "logw_units", F.coalesce(F.col("logw_units"), F.lit(0)).cast("long")
    )


def _two_phase_topk(
    cand: DataFrame, k: int, score_col: str, id_col: str
) -> DataFrame:
    """Global top-``k`` by ``(score desc, id asc)`` with a ``rank``
    column, as TWO rank windows: Catalyst's ``InferWindowGroupLimit``
    never fires for an UNPARTITIONED window (verified: empty partition
    spec → plain Window node, no map-side pruning), so a single global
    rank funnels every candidate row into one sorting task. Phase 1
    pre-prunes each partition to its local top-k — the partitioned
    window DOES get ``WindowGroupLimit`` (Partial before the exchange),
    so each map task ships ≤ k rows and the global sort ranks ≤ k·P
    rows. Exact and partitioning-independent: the global top-k is
    always a subset of the union of per-partition top-ks, and both
    phases break ties on (score desc, id)."""
    from pyspark.sql import Window

    wp = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    pruned = (
        cand.withColumn("__pr", F.row_number().over(wp))
        .filter(F.col("__pr") <= k)
        .drop("__pr")
    )
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return pruned.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 8192,
    smoothing: float = 0.1,
    salt: str = "",
    margin: float = 2.0,
    max_doc_tokens: "int | None" = None,
) -> DataFrame:
    """Draw ``k`` documents from ``raw`` without replacement with
    probability proportional to their DSIR importance weight, via the
    Gumbel top-k trick: rank by ``logw + Gumbel(0,1)`` and keep the top
    k. Returns the selected rows with ``logw_units`` and the 1-based
    selection ``rank``.

    The Gumbel draw is the content-addressed md5 unit (pure function of
    the id + salt), quantized to the same integer 1e-12 units, so the
    selected set and its ranks replay exactly in SQL and are invariant
    to partitioning and cluster size.

    Scale: a full global sort for top-k would be a cliff at 100 TB.
    Instead a distributed ``percentile_approx`` probe estimates the
    k-th score, a narrow codegen filter keeps ~``margin * k`` candidate
    rows, and only those pay the rank window; if the probe undershoots
    (count comes up short) the selection deterministically falls back to
    ranking all rows, so the result never depends on ``margin`` or the
    probe's approximation.

    NOTE: this function is EAGER — the scoring pass runs at call time
    (the probe actions need it), the k-row (id, logw_units, rank)
    selection is materialized and stays persisted, and the returned
    frame is a lazy join of ``raw`` against it. The alternative — a
    fully lazy plan — re-runs both gram-count passes and the occurrence
    shuffle once per downstream action (measured 3.3× at sf100).
    """
    if k <= 0:
        raise ValueError("k must be > 0")
    if margin <= 1.0:
        raise ValueError("margin must be > 1.0")
    # the guard runs here (not via the dsir_logweights call below) so a
    # giant document raises before ANY pass over raw starts
    from ..utils.tokens import assert_max_doc_tokens

    assert_max_doc_tokens(raw, text_col, max_doc_tokens, "dsir_select")
    from pyspark.sql import Window

    scored = dsir_logweights(
        raw, target, text_col=text_col, id_col=id_col,
        num_buckets=num_buckets, smoothing=smoothing,
    )
    # Gumbel(0,1) = -ln(-ln(u)), u uniform on (0,1); clamp u away from 0
    # so the draw is finite (md5_unit can emit exactly 0.0)
    u = F.greatest(md5_unit(F.col(id_col), salt), F.lit(2.0 ** -52))
    g_units = F.floor(-F.log(-F.log(u)) * F.lit(_UNIT) + F.lit(0.5)).cast("long")
    # Selection needs several actions (count, percentile probe, candidate
    # check, rank) — each would otherwise replay BOTH gram-count passes
    # and the occurrence shuffle through dsir_logweights' lineage (~4x
    # pure-JVM work at sf100). The narrow-persist lifecycle (persist the
    # ~16 B/row score frame for the probes, materialize the k-row
    # selection, release the cache — even on a probe error) lives in ONE
    # audited helper shared with bm25_topk / cluster_balanced_sample /
    # SF² combine.
    from ..utils.caching import materialized_small_result

    narrow = scored.select(
        F.col(id_col),
        F.col("logw_units"),
        (F.col("logw_units") + g_units).cast("long").alias("__score"),
    )

    def _build(scores: DataFrame) -> DataFrame:
        n = scores.count()
        if n > k:
            # estimate the k-th largest score, prefilter with margin
            frac = min(1.0, margin * k / n)
            thr_row = scores.agg(
                F.percentile_approx(
                    "__score", F.lit(1.0 - frac), F.lit(10000)
                ).alias("t")
            ).collect()[0]
            cand = scores.filter(F.col("__score") >= F.lit(int(thr_row["t"])))
            if cand.count() < k:  # probe undershot: deterministic fallback
                cand = scores
        else:
            cand = scores
        return _two_phase_topk(cand, k, "__score", id_col).select(
            id_col, "logw_units", "rank"
        )

    sel = materialized_small_result(narrow, _build)
    # reattach the full raw rows: the selection side is k rows, so AQE
    # converts this to a broadcast join at runtime; column order matches
    # the pre-r9 contract ([id, raw..., logw_units, rank])
    return raw.join(sel, id_col)

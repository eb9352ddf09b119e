"""BM25 sparse text retrieval: keyword top-k over a document corpus.

No reference counterpart (the reference has no text-retrieval surface);
this is part of the LLM-data-pipeline layer alongside the dense paths in
``similarity.py`` (``cosine_topk`` / ``ivf_cosine_topk``).

Scale shape (100 TB): the query set is the SMALL side by construction —
its distinct terms are collected to the driver (bounded by ``max_terms``)
and embedded as literals, so the corpus side needs NO inverted index and
NO doc×term shuffle. Per-document term frequencies for only those terms
are built in ONE ``F.aggregate`` pass over the token array (the token
split is evaluated once per row regardless of projection collapse);
corpus statistics (N, Σdl, per-term document frequency) reduce through a
single map-side-combined aggregate returning ONE row; scoring is a
codegen projection over documents that contain at least one query term
(``F.exists`` prunes the rest before the explode), and the per-query
top-k shuffles only those candidates into a
``row_number``-over-window — never the full corpus.

Determinism contract (for cross-engine oracles): scores are emitted as
integer micro-units. idf is quantized to a 1e-6 grid via
``floor(ln(...)*1e6 + 0.5)/1e6`` and every floating-point expression is
written in the exact association order documented below, so DuckDB
replays the same IEEE-754 doubles and the same integers:

    avgdl = (Σdl * 1.0) / N
    idf_t = floor(ln(1 + ((N - df_t) + 0.5) / (df_t + 0.5)) * 1e6 + 0.5) / 1e6
    num   = tf * (k1 + 1.0)
    den   = tf + k1 * ((1.0 - b) + ((b * dl) / avgdl))
    units = floor(((1e6 * idf_t) * num) / den + 0.5)      per matched term
    score_units = Σ units                                 (integer sum)

Ties break by ascending document id, so the top-k set is exact.
"""

from __future__ import annotations

import math
import re
from typing import Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Word tokens: lower-cased maximal [a-z0-9] runs. Mirrors DuckDB's
# regexp_split_to_array(lower(text), '[^a-z0-9]+') with empties dropped.
TOKEN_SPLIT = "[^a-z0-9]+"


def _doc_tokens(text_col: str):
    return F.array_remove(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), TOKEN_SPLIT), ""
    )


def _query_terms(text: Optional[str]) -> list:
    """Tokenize one query string driver-side with the SAME token grammar
    as the corpus; duplicate terms collapse (standard BM25 with unary
    query term frequency)."""
    toks = [t for t in re.split(TOKEN_SPLIT, (text or "").lower()) if t]
    # dedup preserving sorted order for a deterministic term universe
    return sorted(set(toks))


def bm25_topk(
    docs: DataFrame,
    queries: Union[DataFrame, Sequence[Tuple[str, str]]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_terms: int = 256,
    max_doc_tokens: Optional[int] = None,
) -> DataFrame:
    """Okapi BM25 top-``k`` documents per query.

    ``queries`` is a small DataFrame ``(query_id, query_text)`` or a
    sequence of ``(query_id, query_text)`` pairs; it is collected to the
    driver (bounded: its distinct term universe must stay under
    ``max_terms``) — the corpus side is never collected.

    Returns ``(query_id, rank, doc_id, score_units)`` with
    ``rank`` 1..k per query ordered by ``(score_units DESC, doc_id ASC)``
    and ``score_units`` the integer micro-unit BM25 score defined in the
    module docstring. Documents sharing no term with a query never enter
    the ranking shuffle. A query whose text yields no tokens returns no
    rows.

    NOTE: this function is EAGER — the corpus stats and the top-k run at
    call time and the (≤ k × |queries|)-row result is materialized and
    stays persisted, so the narrow per-document tf cache can be released
    before returning (a lazy plan would re-tokenize the corpus once for
    the stats and again per downstream action; measured 2.3× at sf100).
    """
    from ..utils.tokens import assert_max_doc_tokens

    # count with BM25's OWN grammar: a punctuation-dense giant (minified
    # code, log spam) can hold far more [^a-z0-9]+ tokens than whitespace
    # tokens, and the tf pass pays per BM25 token
    assert_max_doc_tokens(
        docs, text_col, max_doc_tokens, "bm25_topk",
        ntok=F.size(_doc_tokens(text_col)),
    )
    # Validate the doc-id dtype up front: the pipeline keys ranks and
    # tie-breaks on a LONG doc_id, and a silent cast('long') would turn a
    # non-numeric string id into NULL — corrupting ranks without any
    # error. Refuse anything that isn't an integral column.
    from pyspark.sql import types as T

    id_type = docs.schema[id_col].dataType
    if not isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"bm25_topk requires an integral id column; {id_col!r} is "
            f"{id_type.simpleString()}. Map your ids to long first (e.g. "
            "a dense id via zipWithIndex at ingest, or xxhash64 of the "
            "string id if collision-tolerant)."
        )
    if isinstance(queries, DataFrame):
        qrows = [
            (r[query_id_col], r[query_text_col])
            for r in queries.select(query_id_col, query_text_col).collect()
        ]
    else:
        qrows = list(queries)

    qterms = {qid: _query_terms(qtext) for qid, qtext in qrows}
    terms = sorted({t for ts in qterms.values() for t in ts})
    if len(terms) > max_terms:
        raise ValueError(
            f"query term universe has {len(terms)} distinct terms; "
            f"bound is max_terms={max_terms} (the term list is broadcast "
            "as literals — raise max_terms only if you mean it)"
        )

    spark = docs.sparkSession
    out_schema = (
        f"{query_id_col} string, rank bigint, doc_id bigint, score_units bigint"
    )
    if not terms:
        return spark.createDataFrame([], out_schema)

    nterms = len(terms)
    toks = _doc_tokens(text_col)
    # One pass over the token array builds the whole tf vector, so the
    # regex split cannot be re-evaluated per term by projection collapse.
    # Each token resolves its term slot through ONE literal map lookup
    # (early-exit key scan) instead of a T-wide transform; the
    # accumulator array is rebuilt only on a HIT, so a token that isn't
    # a query term costs a lookup and nothing else. (r9 shape rebuilt
    # the T-slot array per token — O(|terms|) compares + an allocation
    # per token occurrence, the worst case at max_terms=256.)
    tmap = F.map_from_arrays(
        F.array(*[F.lit(t) for t in terms]),
        F.array(*[F.lit(i).cast("int") for i in range(nterms)]),
    )
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(nterms)])
    # try_element_at (not element_at): a token that is not a query term
    # must yield NULL under EVERY ANSI setting — element_at's missing-map-key
    # contract has varied across Spark versions/settings (MAP_KEY_DOES_NOT_EXIST
    # under some ANSI configurations), and nearly every corpus token misses.
    tfs = F.aggregate(
        F.transform(toks, lambda x: F.try_element_at(tmap, x)),
        zeros,
        lambda acc, i: F.when(i.isNull(), acc).otherwise(
            F.transform(
                acc,
                lambda v, j: F.when(j == i, v + F.lit(1).cast("long")).otherwise(v),
            )
        ),
    )
    # The stats aggregate and the candidate scan would each re-tokenize
    # the full corpus through this projection's lineage; persist the
    # NARROW (doc_id, dl, tfs) frame (~16 + 8·T B/row — at 100 TB of
    # text this is the difference between scanning the text column once
    # or twice) and release it after the top-k materializes — the shared
    # audited lifecycle (dsir_select / cluster_balanced_sample / SF²
    # combine use the same helper).
    from ..utils.caching import materialized_small_result

    narrow = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        tfs.alias("tfs"),
    )

    def _build(base: DataFrame) -> "DataFrame | None":
        # ONE corpus-stats row: N, Σdl, per-term document frequency.
        stats = base.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("sumdl"),
            *[
                F.sum((F.element_at("tfs", i + 1) > 0).cast("long")).alias(f"df{i}")
                for i in range(nterms)
            ],
        ).collect()[0]
        n_docs = int(stats["n"])
        sumdl = int(stats["sumdl"] or 0)
        if n_docs == 0 or sumdl == 0:
            return None
        avgdl = (sumdl * 1.0) / n_docs

        idf = []
        for i in range(nterms):
            df_t = int(stats[f"df{i}"])
            raw = math.log(1.0 + ((n_docs - df_t) + 0.5) / (df_t + 0.5))
            idf.append(math.floor(raw * 1000000.0 + 0.5) / 1000000.0)

        def term_units(i: int):
            tf = F.element_at("tfs", i + 1).cast("double")
            num = tf * (F.lit(k1) + F.lit(1.0))
            den = tf + F.lit(k1) * (
                (F.lit(1.0) - F.lit(b)) + ((F.lit(b) * F.col("dl").cast("double")) / F.lit(avgdl))
            )
            units = F.floor(((F.lit(1000000.0) * F.lit(idf[i])) * num) / den + F.lit(0.5))
            return F.when(F.element_at("tfs", i + 1) > 0, units).otherwise(F.lit(0))

        term_idx = {t: i for i, t in enumerate(terms)}
        per_query = []
        for qid, ts in qterms.items():
            if not ts:
                continue
            score = None
            for t in ts:
                u = term_units(term_idx[t])
                score = u if score is None else score + u
            per_query.append(
                F.struct(
                    F.lit(qid).alias(query_id_col),
                    score.cast("long").alias("score_units"),
                )
            )
        if not per_query:
            return None

        cand = (
            base.filter(F.exists("tfs", lambda tf: tf > 0))
            .select("doc_id", F.explode(F.array(*per_query)).alias("s"))
            .select("doc_id", f"s.{query_id_col}", "s.score_units")
            .filter(F.col("score_units") > 0)
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.desc("score_units"), F.asc("doc_id")
        )
        return (
            cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "rank", "doc_id", "score_units")
        )

    out = materialized_small_result(narrow, _build)
    if out is None:
        return spark.createDataFrame([], out_schema)
    return out


def bm25_build_index(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_term_buckets: int = 64,
    max_doc_tokens: Optional[int] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Build a caller-owned BM25 inverted index: index ONCE, query many.

    :func:`bm25_topk` rebuilds per-query-term corpus statistics on every
    call — the right trade for ad-hoc queries, but a repeated-query
    workload (eval-set retrieval, dedup-by-query, RAG batch scoring)
    re-tokenizes the full corpus each time. This is the
    ``minhash_near_duplicates(signatures=...)`` pattern applied to
    retrieval: the expensive pass is materialized once, its lifecycle is
    the CALLER's, and queries touch only the slivers they need.

    Returns ``(postings, stats)``:

    - ``postings``: ``(tbucket int, term string, doc_id long, tf long,
      dl long)`` — one row per distinct (document, term). ``dl`` (the
      document's token count) is DENORMALIZED onto every posting, the
      classic inverted-index trade: +8 bytes/row buys query-time scoring
      with NO corpus-scale join back to a doc-length table. ``tbucket``
      is ``pmod(xxhash64(term), num_term_buckets)``, the partition key
      for :func:`bm25_save_index` — a query then prunes to the ≤|terms|
      buckets its terms hash into and never reads the rest of the index.
    - ``stats``: ONE row ``(n long, sumdl long, num_term_buckets int)`` —
      corpus size, total token count, and the bucket modulus, so the index
      is self-describing: queries re-derive each term's partition without
      scanning anything.

    At 100 TB the postings table is the thing you'd write to storage
    partitioned by ``tbucket`` (and optionally bucketed by doc_id within
    partitions); the build is one explode + one (doc, term) aggregate —
    a single shuffle, no Python.
    """
    from pyspark.sql import types as T

    from ..utils.tokens import assert_max_doc_tokens

    assert_max_doc_tokens(
        docs, text_col, max_doc_tokens, "bm25_build_index",
        ntok=F.size(_doc_tokens(text_col)),
    )
    id_type = docs.schema[id_col].dataType
    if not isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"bm25_build_index requires an integral id column; {id_col!r} is "
            f"{id_type.simpleString()}"
        )
    if num_term_buckets < 1:
        raise ValueError("num_term_buckets must be >= 1")
    # one staging projection (tokens referenced by size + explode below),
    # tbucket computed as a grouping expression and dl re-attached with
    # min() (group-constant: dl is functionally dependent on doc_id), so
    # the old post-aggregate reorder projection folds away — each new
    # Dataset costs an eager analysis pass (~16 ms, the r16 construction
    # floor); output schema/rows identical
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        _doc_tokens(text_col).alias("__toks"),
    )
    postings = (
        base.select(
            "doc_id",
            F.size("__toks").cast("long").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .groupBy(
            F.pmod(F.xxhash64("term"), F.lit(num_term_buckets))
            .cast("int")
            .alias("tbucket"),
            F.col("term"),
            F.col("doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("__toks").cast("long")).alias("sumdl"),
    ).withColumn("num_term_buckets", F.lit(int(num_term_buckets)))
    return postings, stats


def bm25_save_index(postings: DataFrame, stats: DataFrame, path: str) -> None:
    """Write the index to ``path``: postings PARTITIONED BY ``tbucket``
    (so query-term buckets partition-prune at read time) plus the stats
    table. Stats are APPEND-ONLY rows — readers sum ``n``/``sumdl``
    across rows — which is what makes :func:`bm25_append_index` two
    plain appends instead of a read-modify-write."""
    from ..utils.io import write_partitioned_single_file

    # one file per tbucket, sorted by term so a pruned query skips row
    # groups within the bucket too
    write_partitioned_single_file(postings, "tbucket", ["term"],
                                  f"{path}/postings", "overwrite")
    stats.write.mode("overwrite").parquet(f"{path}/stats")
    # a FULL rewrite leaves postings consistent with the stats modulus,
    # so it also repairs a crashed rebucket — readmit readers
    from ..utils.io import clear_rebucket_sentinel

    clear_rebucket_sentinel(path)


_STATS_SCHEMA = "n long, sumdl long, num_term_buckets int, batch_id string"


def _read_stats_rows(spark, path: str) -> list:
    """Collect ``{path}/stats`` rows under the explicit schema, rolling an
    interrupted ``atomic_replace_parquet`` swap of the stats dir forward
    first (compaction replaces stats; a crash between its renames would
    otherwise read as path-missing). Explicit schema: pre-batch_id stats
    files lack the column and are read as NULL; plain inference could pick
    either file's schema."""
    from ..utils.io import recover_compact_swap

    recover_compact_swap(f"{path}/stats")
    return spark.read.schema(_STATS_SCHEMA).parquet(f"{path}/stats").collect()


def _read_batch_markers(spark, path: str) -> set:
    """Applied-batch ids from ``{path}/batches`` (empty if none yet).

    Repairs an interrupted marker-fold swap FIRST: ``bm25_compact_index``
    replaces ``{path}/batches`` via ``atomic_replace_parquet``, and a crash
    between its two renames leaves the live dir missing (data intact in the
    ``__compact_old``/``__compact_tmp`` siblings). Without the roll-forward
    the exists-check below would read that state as "no markers", so a
    retried append would double-insert — permanently double-counting the
    N/sumdl stats.
    """
    import os as _os

    from ..utils.io import recover_compact_swap

    recover_compact_swap(f"{path}/batches")
    if not _os.path.exists(f"{path}/batches"):
        return set()
    return {
        r["batch_id"]
        for r in spark.read.parquet(f"{path}/batches").collect()
    }


def bm25_append_index(
    new_docs: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_tokens: Optional[int] = None,
    stats_written: bool = False,
    batch_id: Optional[str] = None,
) -> None:
    """Grow a saved index with a batch of NEW documents — the warehouse
    ingestion verb. Appends the batch's postings (encoded with the
    bucket modulus stored in the index, so partitioning stays
    consistent) and one more stats row; because corpus stats are pure
    sums (N, Σdl) and df comes from the postings union, a query against
    the appended index is BIT-IDENTICAL to one against an index rebuilt
    from scratch on the union corpus.

    Caller contracts: ``new_docs`` ids must be NEW (re-appending a
    document double-counts it — dedup upstream). The two appends are not
    transactional, so ORDER matters for crash recovery: stats are written
    FIRST. A failure between the writes then leaves a stats row whose
    postings are missing — the batch's docs count toward N/Σdl but match
    no terms, a slight idf perturbation that HEALS when the append is
    retried with the same batch. The reverse order would leave orphaned
    postings counted in df but never in N — permanently inconsistent with
    the bit-identical-to-rebuild contract and unrepairable by any retry.

    **Pass ``batch_id`` to make the retry decision DECIDABLE.** Without
    an identity, a caller recovering from a crash cannot tell whether the
    stats append committed (stats rows are indistinguishable sums), so
    the legacy ``stats_written`` flag is a guess that can itself create
    the inconsistent state. With ``batch_id``:

    - the stats row is stamped with the id, so a retry skips the stats
      write iff the row actually landed (no guessing);
    - postings land via :func:`tape_spark.utils.io.append_partitioned_batch`
      — each data file carries a ``.batch-<id>`` name tag and a retry
      REPLACES the batch's earlier files, so re-running the append with
      the same batch_id converges to exactly-once (no double-insert
      window);
    - a marker row is written to ``{path}/batches`` LAST, so a retry of
      a fully-applied batch is a no-op.
    """
    spark = new_docs.sparkSession
    if batch_id is not None:
        applied = _read_batch_markers(spark, path)
        if batch_id in applied:
            return  # fully applied; retry is a no-op
    from ..utils.io import check_rebucket_sentinel

    check_rebucket_sentinel(path)
    srows = _read_stats_rows(spark, path)
    mods = {int(r["num_term_buckets"]) for r in srows}
    if len(mods) != 1:
        raise ValueError(
            f"index at {path!r} has inconsistent num_term_buckets {sorted(mods)}"
        )
    postings, stats = bm25_build_index(
        new_docs,
        text_col=text_col,
        id_col=id_col,
        num_term_buckets=mods.pop(),
        max_doc_tokens=max_doc_tokens,
    )
    # stats BEFORE postings — see the recovery contract in the docstring
    if batch_id is not None:
        stats_written = any(r["batch_id"] == batch_id for r in srows)
        stats = stats.withColumn("batch_id", F.lit(batch_id))
    if not stats_written:
        stats.write.mode("append").parquet(f"{path}/stats")
    from ..utils.io import append_partitioned_batch, write_partitioned_single_file

    # one file per TOUCHED tbucket per append (same convention as the
    # initial save; bm25_compact_index folds the per-append generations)
    if batch_id is not None:
        # batch-tagged files: a retry replaces, never duplicates
        append_partitioned_batch(postings, "tbucket", ["term"],
                                 f"{path}/postings", batch_id)
        # marker LAST: present == the whole append committed
        spark.createDataFrame([(batch_id,)], "batch_id string").write.mode(
            "append"
        ).parquet(f"{path}/batches")
    else:
        write_partitioned_single_file(postings, "tbucket", ["term"],
                                      f"{path}/postings", "append")


def bm25_load_index(spark, path: str) -> Tuple[DataFrame, DataFrame]:
    """Read back a saved index as ``(postings, stats)``. ``stats`` holds
    one row per save/append; consumers sum the counters. Raises while a
    rebucket is in progress (or crashed mid-swap) — the layout may not
    match the recorded modulus and pruned queries would miss postings."""
    from ..utils.io import check_rebucket_sentinel, recover_compact_swap

    check_rebucket_sentinel(path)
    # roll interrupted compaction swaps forward before reading: postings
    # are swapped by compact_partitioned_parquet, stats by
    # atomic_replace_parquet — a crash between renames leaves either
    # live dir missing with the data intact in its __compact_* siblings
    recover_compact_swap(f"{path}/postings")
    recover_compact_swap(f"{path}/stats")
    return (
        spark.read.parquet(f"{path}/postings"),
        spark.read.parquet(f"{path}/stats"),
    )


def bm25_topk_indexed(
    postings: DataFrame,
    stats: DataFrame,
    queries: Union[DataFrame, Sequence[Tuple[str, str]]],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_terms: int = 256,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Okapi BM25 top-``k`` against a prebuilt index — scores are
    BIT-IDENTICAL to :func:`bm25_topk` on the same corpus (same
    micro-unit quantization, same association order, same tie-break).

    Query cost is proportional to Σ df(term) — the matched posting rows —
    NOT corpus size: the term filter prunes to the query terms' partitions
    (``tbucket`` pushdown on a saved index), per-term document frequencies
    are the ≤``max_terms`` matched group counts, and scoring is a codegen
    projection over matched postings followed by one (query, doc)
    aggregate and the WindowGroupLimit-capped top-k. On the measured Zipf
    corpus a tail-term query touches ~30 k postings out of 5 M documents
    (df/N ≈ 0.001, `BENCH_sf100_r11.json`) — the selective regime where an
    index beats the scan by orders of magnitude.
    """
    spark = postings.sparkSession
    if isinstance(queries, DataFrame):
        qrows = [
            (r[query_id_col], r[query_text_col])
            for r in queries.select(query_id_col, query_text_col).collect()
        ]
    else:
        qrows = list(queries)
    qterms = {qid: _query_terms(qtext) for qid, qtext in qrows}
    terms = sorted({t for ts in qterms.values() for t in ts})
    if len(terms) > max_terms:
        raise ValueError(
            f"query term universe has {len(terms)} distinct terms; "
            f"bound is max_terms={max_terms}"
        )
    out_schema = (
        f"{query_id_col} string, rank bigint, doc_id bigint, score_units bigint"
    )
    if not terms:
        return spark.createDataFrame([], out_schema)

    # stats may hold one row per save/append (bm25_append_index): the
    # counters are pure sums, and the bucket modulus must agree across
    # every generation of the index
    srows = stats.collect()
    if not srows:
        return spark.createDataFrame([], out_schema)
    n_docs = sum(int(r["n"] or 0) for r in srows)
    sumdl = sum(int(r["sumdl"] or 0) for r in srows)
    if n_docs == 0 or sumdl == 0:
        return spark.createDataFrame([], out_schema)
    avgdl = (sumdl * 1.0) / n_docs
    bmods = {
        int(r["num_term_buckets"])
        for r in srows
        if "num_term_buckets" in stats.columns and r["num_term_buckets"] is not None
    }
    if len(bmods) > 1:
        raise ValueError(
            f"stats rows disagree on num_term_buckets {sorted(bmods)}; the "
            "index partitioning is ambiguous — rebuild it"
        )

    # Partition pruning: tbucket = pmod(xxhash64(term), B) with B carried
    # in the stats row (the index is self-describing — no scan, no
    # guessing). The terms' buckets come from one tiny driver job
    # (≤max_terms rows, same JVM xxhash64 the build used); the bucket
    # IN-list is a partition filter on a saved index, so a query reads
    # only the ≤|terms| partitions its terms hash into.
    if bmods and "tbucket" in postings.columns:
        bmod = bmods.pop()
        tdf = spark.createDataFrame([(t,) for t in terms], "term string")
        tb = sorted(
            {
                int(r["tb"])
                for r in tdf.select(
                    F.pmod(F.xxhash64("term"), F.lit(bmod)).alias("tb")
                ).collect()
            }
        )
        matched = postings.filter(
            F.col("tbucket").isin(tb) & F.col("term").isin(list(terms))
        )
    else:
        matched = postings.filter(F.col("term").isin(list(terms)))

    dfs = {
        r["term"]: int(r["df"])
        for r in matched.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    idf = {}
    for t in terms:
        df_t = dfs.get(t, 0)
        if df_t == 0:
            continue  # no postings — the term contributes nothing anywhere
        raw = math.log(1.0 + ((n_docs - df_t) + 0.5) / (df_t + 0.5))
        idf[t] = math.floor(raw * 1000000.0 + 0.5) / 1000000.0
    if not idf:
        return spark.createDataFrame([], out_schema)

    live = sorted(idf)
    idf_map = F.map_from_arrays(
        F.array(*[F.lit(t) for t in live]),
        F.array(*[F.lit(idf[t]) for t in live]),
    )
    # term -> the query ids that contain it (fan one posting row out to
    # every query scoring it)
    qmap = F.map_from_arrays(
        F.array(*[F.lit(t) for t in live]),
        F.array(
            *[
                F.array(
                    *[F.lit(qid) for qid, ts in qterms.items() if t in ts]
                )
                for t in live
            ]
        ),
    )
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    num = tf_d * (F.lit(k1) + F.lit(1.0))
    den = tf_d + F.lit(k1) * (
        (F.lit(1.0) - F.lit(b)) + ((F.lit(b) * dl_d) / F.lit(avgdl))
    )
    units = F.floor(
        ((F.lit(1000000.0) * F.try_element_at(idf_map, F.col("term"))) * num) / den
        + F.lit(0.5)
    )
    scored = (
        matched.filter(F.try_element_at(idf_map, F.col("term")).isNotNull())
        .select(
            "doc_id",
            units.cast("long").alias("u"),
            F.explode(F.try_element_at(qmap, F.col("term"))).alias(query_id_col),
        )
        .groupBy(query_id_col, "doc_id")
        .agg(F.sum("u").alias("score_units"))
        .filter(F.col("score_units") > 0)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score_units"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "doc_id", "score_units")
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of several per-query
    rankings — the standard hybrid-retrieval combiner (e.g. BM25 + dense
    cosine): each appearance contributes ``scale div (c + rank)`` —
    INTEGER division, so fused scores are engine-exact — and documents
    are re-ranked by the summed units.

    Each input frame needs ``(query_col, id_col, rank_col)``; extra
    columns are ignored, and rows with a NULL or non-positive rank are
    dropped (a rank of ``-c`` would otherwise divide by zero into a
    silent NULL that still inflated ``n_lists``). A document missing
    from one list simply gets no contribution from it (``n_lists``
    reports how many lists carried it). Ties break by ascending
    document id.

    Scale shape: inputs are already top-k-per-query (tiny relative to the
    corpus), so the union + one hash aggregate + one window shuffle touch
    O(Σ list sizes) rows only.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if c < 0 or scale <= 0:
        raise ValueError("rrf_fuse needs c >= 0 and scale > 0")
    units = F.expr(f"{int(scale)}L div ({int(c)}L + {rank_col})")
    parts = [
        r.filter(F.col(rank_col) >= 1).select(
            F.col(query_col),
            F.col(id_col).cast("long").alias(id_col),
            units.alias("units"),
        )
        for r in rankings
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = unioned.groupBy(query_col, id_col).agg(
        F.sum("units").alias("rrf_units"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf_units"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_col, "rank", id_col, "rrf_units", "n_lists")
    )


def bm25_rebucket_index(spark, path: str, num_term_buckets: int) -> dict:
    """Rewrite a saved index with a NEW term-bucket modulus — the verb
    that keeps the per-partition read constant as the index grows (the
    same lifecycle role as ``minhash_rebucket_store``: partition counts
    are frozen at save time, so a corpus that grew 10× since its save
    carries 10×-oversized term buckets). Postings keep every row —
    only ``tbucket = pmod(xxhash64(term), B)`` is recomputed — and every
    stats row's ``num_term_buckets`` is updated in place (stamps
    preserved), so queries are bit-identical before and after.

    OFFLINE verb with the same crash contract as the store's: between
    the postings swap and the stats swap a concurrent query would prune
    with the old modulus against the new layout and silently miss
    postings. A ``__rebucket_inprogress`` sentinel is dropped before the
    first swap and removed after the stats swap; load/append/compact
    paths RAISE while it exists, so the window (and a crash inside it)
    fails loudly instead of returning incomplete results. A crash
    mid-verb is repaired by re-running it (clears the sentinel on
    success). Refuses while an append batch is half-applied (stamped
    stats row without a marker)."""
    if num_term_buckets < 1:
        raise ValueError("num_term_buckets must be >= 1")
    from ..utils.io import (
        atomic_replace_parquet,
        clear_rebucket_sentinel,
        recover_compact_swap,
        write_partitioned_single_file,
        write_rebucket_sentinel,
    )

    srows = _read_stats_rows(spark, path)
    applied = _read_batch_markers(spark, path)
    pending = sorted(
        {
            r["batch_id"]
            for r in srows
            if r["batch_id"] is not None and r["batch_id"] not in applied
        }
    )
    if pending:
        raise ValueError(
            f"index at {path!r} has half-applied append batches {pending}; "
            "retry bm25_append_index with the same batch_id first, then "
            "rebucket"
        )
    import os as _os
    import shutil as _shutil

    live = f"{path}/postings"
    recover_compact_swap(live)
    # sentinel BEFORE the first swap: load/query/append/compact raise
    # during the inconsistent window (and after a crash inside it);
    # re-running THIS verb is the repair and clears it on success
    write_rebucket_sentinel(path)
    old_mod = {int(r["num_term_buckets"]) for r in srows}
    rewritten = (
        spark.read.parquet(live)
        .select(
            F.pmod(F.xxhash64("term"), F.lit(int(num_term_buckets)))
            .cast("int")
            .alias("tbucket"),
            "term",
            "doc_id",
            "tf",
            "dl",
        )
    )
    tmp = live + "__compact_tmp"
    write_partitioned_single_file(rewritten, "tbucket", ["term"], tmp, "overwrite")
    old = live + "__compact_old"
    _os.rename(live, old)
    _os.rename(tmp, live)
    _shutil.rmtree(old)
    new_stats = spark.createDataFrame(
        [
            (int(r["n"] or 0), int(r["sumdl"] or 0), int(num_term_buckets),
             r["batch_id"])
            for r in srows
        ],
        _STATS_SCHEMA,
    )
    atomic_replace_parquet(new_stats, f"{path}/stats")
    # stats modulus now matches the layout — safe to readmit readers
    clear_rebucket_sentinel(path)
    return {
        "num_term_buckets": (sorted(old_mod), int(num_term_buckets)),
        "stats_rows": len(srows),
    }


def bm25_compact_index(spark, path: str) -> dict:
    """Compact a saved BM25 index after appends: N ``bm25_append_index``
    calls leave N files in every term-bucket partition (a pruned query
    then opens N footers per bucket) and N stats rows. Rewrites postings
    as ONE file per ``tbucket`` (sorted by ``term`` within, so a term's
    postings are row-group-contiguous) and folds the stats rows into one
    summed row — queries are bit-identical before and after (asserted in
    tests; df/N/Σdl are pure unions/sums, so compaction cannot change
    them). Returns ``{"postings_files_before": n, "stats_rows_before": m}``
    for the caller's ingest log. Rule of thumb: compact when appends-
    since-last-compact ≈ 10–20 (measured: query wall grows roughly
    linearly in files-per-partition past that; see docs/SCALING.md).

    The r12 "compacted composed query 2× slower warm" anomaly is
    root-caused and FIXED (round 13): the old PROBE-KEY file salt put
    each term's postings in one file, so one task owned a head term's
    whole scoring work — 200× task skew in the heaviest stage. The
    full-row salt (``utils/io.py``) spreads hot terms across the
    per-partition files: warm composed walls back to scan-layout parity
    (4.1–4.4 s vs 7.5–7.9 s keysalt at 4.75 M docs) and the selective
    single-term probe got FASTER too (0.73–0.92 s vs 1.1–1.26 s).

    Refuses to run while a batched append is HALF-APPLIED (a stats row
    stamped with a ``batch_id`` that has no marker in ``{path}/batches``):
    folding that row into the merged stats would erase the stamp, so the
    batch's retry could no longer see that its stats landed and would
    append them again — permanently double-counting the batch in N/Σdl.
    Retry (or finish) the pending append first, then compact. Markers of
    fully-applied batches are PRESERVED, so their retries stay no-ops
    after compaction.
    """
    from ..utils.io import (
        atomic_replace_parquet,
        check_rebucket_sentinel,
        compact_partitioned_parquet,
    )

    check_rebucket_sentinel(path)
    srows = _read_stats_rows(spark, path)
    mods = {int(r["num_term_buckets"]) for r in srows}
    if len(mods) != 1:
        raise ValueError(
            f"index at {path!r} has inconsistent num_term_buckets {sorted(mods)}"
        )
    applied = _read_batch_markers(spark, path)
    pending = sorted(
        {
            r["batch_id"]
            for r in srows
            if r["batch_id"] is not None and r["batch_id"] not in applied
        }
    )
    if pending:
        raise ValueError(
            f"index at {path!r} has half-applied append batches {pending} "
            "(stats row stamped, no completion marker): compacting now would "
            "erase the stamp and a retried append would double-count the "
            "batch in N/Σdl. Retry bm25_append_index with the same "
            "batch_id first, then compact."
        )
    n_files = compact_partitioned_parquet(
        spark, f"{path}/postings", "tbucket", sort_cols=["term"]
    )
    merged = spark.createDataFrame(
        [
            (
                sum(int(r["n"] or 0) for r in srows),
                sum(int(r["sumdl"] or 0) for r in srows),
                mods.pop(),
            )
        ],
        "n long, sumdl long, num_term_buckets int",
    )
    # swap, don't overwrite-in-place: mode('overwrite') deletes the live
    # stats dir before the new write commits — a crash in between would
    # destroy N/Σdl permanently (they exist nowhere else)
    atomic_replace_parquet(merged, f"{path}/stats")
    # fold the one-file-per-append marker dir (ids preserved exactly —
    # retries of applied batches remain no-ops)
    import os as _os

    n_markers = 0
    if _os.path.exists(f"{path}/batches"):
        folded = spark.createDataFrame(
            [(b,) for b in sorted(applied)], "batch_id string"
        ).coalesce(1)
        n_markers = sum(
            1 for f in _os.listdir(f"{path}/batches") if f.endswith(".parquet")
        )
        atomic_replace_parquet(folded, f"{path}/batches")
    return {
        "postings_files_before": n_files,
        "stats_rows_before": len(srows),
        "marker_files_before": n_markers,
    }

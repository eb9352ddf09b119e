"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
and embedding-cosine near-dup.

Design for 100 TB:

- Exact dedup is one hash-grouped aggregation (map-side combine).
- Near-dup NEVER does an all-pairs comparison. Candidate generation is an
  inverted-index (shingle or LSH-band) equi-join, so cost scales with the
  number of *colliding* pairs, not N².
- All hashing uses ``xxhash64`` — JVM-side, whole-stage-codegen friendly.
- Signatures are fixed-width arrays of longs; banding turns them into
  equi-join keys so Catalyst plans an ordinary shuffle join (skew handled
  by AQE).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# set by minhash_near_duplicates(join_mode='auto') on every decision —
# an observability hook for probes/tests (which shape was picked, from
# what measured volumes), not a public API
_LAST_AUTO_DECISION: Optional[dict] = None


def _guarded_toks_sql(text_col: str) -> str:
    """The ONE whitespace tokenizer the span family shares: NULL /
    empty / SPACE-only text tokenizes to an EMPTY array (``trim`` strips
    0x20 only — identically in Spark and DuckDB, the cross-engine
    convention — so a tab/newline-edged blank still yields phantom ''
    tokens; what the shared helper guarantees is that BOTH halves see
    the same array either way). An
    unguarded ``split(trim(lower(text)), '\\s+')`` yields ``['']`` — one
    phantom token — so at ``span_tokens=1`` the detection half and the
    rebuild half of exact-substring dedup would disagree about whether a
    whitespace-only document has a position 0 at all. Both halves of
    :func:`repeated_spans` / :func:`remove_repeated_spans` (and the
    per-document census in :func:`repeated_span_stats`) go through this
    helper so positions always align."""
    from ..utils.tokens import ws_tokens_sql

    return ws_tokens_sql(text_col)


def _word_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Tokenization and n-gram assembly are pure built-in expressions
    (split + transform over a sequence) — no Python in the hot path.
    """
    # Tokenize once into a column; referencing the raw text inside the
    # transform lambda would re-run the regex split per shingle index
    # (O(tokens²) per document). Documents shorter than n tokens (including
    # empty text) yield no shingles; the CASE guard avoids
    # sequence(1, 0) → slice(…, 0, …) errors.
    toks = df.select(
        F.col(id_col), F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks")
    )
    ngrams = F.expr(
        f"CASE WHEN size(__toks) >= {n} THEN "
        f"transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> array_join(slice(__toks, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return toks.select(F.col(id_col), F.explode(ngrams).alias("shingle")).distinct()


def estimate_stop_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    max_doc_frequency: int = 1000,
    sample_fraction: float = 0.02,
    top_k: int = 1024,
    salt: str = "stop",
) -> list:
    """Estimate the corpus's stop shingles — hashed word n-grams whose
    document frequency exceeds ``max_doc_frequency`` — from a bounded,
    content-addressed sample, and return (at most ``top_k`` of) them as a
    plain Python list suitable for broadcasting.

    At 100 TB an *exact* doc-frequency pass shuffles every (doc, shingle)
    row just to find the handful of boilerplate n-grams that dominate
    join fan-out. Heavy hitters by definition survive sampling: a shingle
    with true df D appears in a fraction-``p`` document sample
    ~Binomial(D, p) times, so thresholding the sampled count at
    ``max_doc_frequency * p`` finds every shingle with D well above the
    cap with near-certainty while touching only ``p`` of the corpus. The
    sample is md5-content-addressed (same ``utils.hashing`` draw as
    ``Ensemble.sample``), so the stop set is reproducible across runs and
    cluster sizes.

    The hash domain (``xxhash64`` of the space-joined lowercase n-gram)
    matches both :func:`ngram_jaccard_pairs` and
    :func:`minhash_signatures`, so one estimate serves either consumer.
    """
    if not 0 < sample_fraction <= 1:
        raise ValueError("sample_fraction must be in (0, 1]")
    from ..utils.hashing import md5_unit

    sampled = df.filter(md5_unit(F.col(id_col), salt) < sample_fraction)
    shingles = _word_shingles(sampled, text_col, id_col, n).select(
        F.xxhash64("shingle").alias("shingle")
    )
    cutoff = max(1, int(max_doc_frequency * sample_fraction))
    rows = (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cutoff)
        .orderBy(F.desc("df"), F.asc("shingle"))
        .limit(top_k)
        .collect()
    )
    return [r["shingle"] for r in rows]


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", by_hash: bool = True
) -> DataFrame:
    """Exact duplicate removal: keep the lowest id per distinct text.

    One hash aggregation. The default (``by_hash=True``, the scale path)
    groups by ``(xxhash64(text), length(text))`` — at 100 TB this shrinks
    the shuffled grouping key from whole documents to 16 bytes; a
    (hash, length) collision between different texts is negligible
    (≪ 1 in 2⁶⁴), and a residual equality verify can be layered on where
    that is not acceptable. ``by_hash=False`` groups by the full text —
    exact by construction, only sensible for small corpora. Both paths
    produce identical output barring a 2⁻⁶⁴ collision, so the same
    SQL oracle (GROUP BY text) validates either.

    Returns ``(doc_id, dup_count)`` — the survivor id and how many rows it
    represents.
    """
    # expression-string forms: ~5 py4j round trips per call instead of
    # ~25 (the per-call plan-construction tax; utils/sqlfrag.py).
    # text_col/id_col name TOP-LEVEL columns of df, so they are quoted as
    # SINGLE backquoted segments: _qident's dotted form (`a`.`b`) neither
    # resolves a column literally named 'a.b' nor parses as an alias
    # target, where the pre-fragment .alias(id_col) handled both.
    _seg = lambda c: "`" + c.replace("`", "``") + "`"  # noqa: E731
    qt, qi = _seg(text_col), _seg(id_col)
    qi_alias = qi
    if by_hash:
        key = [F.expr(f"xxhash64({qt}) AS __h"), F.expr(f"length({qt}) AS __l")]
    else:
        key = [F.expr(qt)]
    return (
        df.groupBy(*key)
        .agg(F.expr(f"min({qi}) AS {qi_alias}"), F.expr("count(1) AS dup_count"))
        .selectExpr(qi_alias, "dup_count")
    )


def dedup_keep_first(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", by_hash: bool = True
) -> DataFrame:
    """Exact dedup that returns the full surviving rows (lowest id per
    distinct text) — the 'materialize the cleaned corpus' form of
    :func:`exact_dedup`. One ``min_by`` hash aggregation.

    With ``by_hash=True`` (default, the scale path) the grouping key is
    ``(xxhash64(text), length(text))`` — 16 bytes instead of multi-KB
    documents. The survivor row is picked with
    ``min_by(struct(*cols), id)``, NOT a ``row_number`` window: a window
    partition is one unsplittable sort task, so 10^8 copies of the same
    boilerplate document (an entirely realistic 100 TB hot key) would
    drag every copy's full row through one executor. The declarative
    ``min_by`` partial-aggregates map-side — each input partition
    forwards at most ONE candidate row per text group into the exchange,
    so the hot group costs (num input partitions) rows, not 10^8.
    Output is identical to the by-text form barring a 2⁻⁶⁴ collision.
    """
    if by_hash:
        key = [
            F.xxhash64(F.col(text_col)).alias("__h"),
            F.length(text_col).alias("__l"),
        ]
    else:
        key = [F.col(text_col).alias("__t")]
    # ordering key wraps the id in a struct so NULL ids sort FIRST (the
    # removed window's asc-nulls-first semantics): a bare min_by ordinal
    # SKIPS null rows, which would fabricate an all-NULL output row for
    # an all-NULL-id group instead of returning a real input row
    order_key = F.struct(
        F.col(id_col).isNotNull().cast("int").alias("nn"),
        F.col(id_col).alias("i"),
    )
    packed = df.groupBy(*key).agg(
        F.min_by(F.struct(*[F.col(c) for c in df.columns]), order_key).alias(
            "__row"
        )
    )
    return packed.select("__row.*")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.5,
    max_doc_frequency: Optional[int] = None,
    stop_shingle_sample: Optional[float] = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Inverted-index plan: explode distinct shingles, self-join on the
    shingle (each shared shingle yields one pair row), count shared
    shingles per pair, then ``|A∩B| / (|A| + |B| − |A∩B|)``. Shingles are
    replaced by their 64-bit hash before the shuffle, so the join key is 8
    bytes instead of an n-gram string (hash collisions perturb a count by
    ≪ 1 in 2⁶⁴ — negligible against the exact-set semantics). The join
    fan-out is bounded by shingle document frequency — at 100 TB, drop
    ultra-common shingles first (``max_doc_frequency``) to cap skew, and
    set ``stop_shingle_sample`` so the heaviest hitters are found from a
    bounded sample (:func:`estimate_stop_shingles`) and dropped *before*
    the exact doc-frequency shuffle ever sees their rows — the exact
    count then runs only over the residual, lighter-tailed shingles.

    Plan shape (r16): the per-document distinct is ``array_distinct`` on
    the in-row gram array — NOT a row-level ``.distinct()``, which cost a
    full (id, shingle) exchange + aggregate — and each document's shingle
    count ``|A|`` rides the exploded rows as an 8-byte column instead of
    being re-aggregated and joined back twice. That removes three of the
    old plan's shuffles (the distinct exchange, the sizes aggregate, and
    the two size-attach joins collapse into the pair aggregate) and two
    of its four corpus scans (each scan re-tokenized the full corpus):
    what remains is the irreducible pair: one self-join on the shingle
    hash + one (id_a, id_b) aggregate. Results are identical — same
    tokenizer, same per-doc distinct, same hash domain, same Jaccard
    arithmetic (``plans/r16/ngram_jaccard_{before,after}.txt``).

    The gram array is fed to ``explode`` as an INLINE expression, with
    ``|A|`` riding inside the exploded struct via a let-binding, for two
    measured reasons (docs/SCALING.md round 16 "InferFiltersFromGenerate"):
    exploding a STAGED array attribute (a) triggers
    ``InferFiltersFromGenerate``, whose inferred ``size(...) > 0``
    predicate is pushed through the staging projections and re-evaluates
    the whole nested-HOF gram chain per row in an interpreted Filter
    (measured 30x the operator wall on 600-token documents), and (b) if
    any column above the Generate still references the array (the old
    ``size(__sh)``), the entire array is duplicated onto every exploded
    row — O(grams²) bytes per document.
    """
    # tokens staged (referenced 3x by the gram window — no lambda
    # re-splits per element), then ONE inline generator: the let-bound
    # distinct gram array is wrapped to (gram, |A|) structs and exploded
    # in the same expression, so no array attribute ever feeds or
    # crosses the Generate; the hash runs post-explode as a codegen
    # scalar instead of an interpreted per-element lambda
    grams_sql = (
        f"CASE WHEN size(__toks) >= {n} THEN "
        f"transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> array_join(slice(__toks, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    from ..utils.sqlfrag import let_sql

    gram_structs = let_sql(
        f"array_distinct({grams_sql})",
        "__a",
        "transform(__a, __g -> struct(__g AS g, size(__a) AS n))",
    )
    qi = _qident(id_col)
    shingles = (
        df.select(
            F.col(id_col),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
        )
        .selectExpr(qi, f"explode({gram_structs}) AS __e")
        .selectExpr(qi, "__e.n AS __n", "xxhash64(__e.g) AS shingle")
    )
    if max_doc_frequency is not None and stop_shingle_sample is not None:
        # heavy hitters estimated from a sample and pruned up front: their
        # (doc, shingle) rows never enter the doc-frequency shuffle below.
        # Sizes are already fixed above, so the Jaccard denominator stays
        # exact regardless of what gets pruned here.
        stop = estimate_stop_shingles(
            df,
            text_col,
            id_col,
            n,
            max_doc_frequency=max_doc_frequency,
            sample_fraction=stop_shingle_sample,
        )
        if stop:
            shingles = shingles.filter(~F.col("shingle").isin(stop))
    if max_doc_frequency is not None:
        # cap join fan-out: a shingle in d documents yields O(d²) pair rows,
        # so stop-shingles dominate cost while carrying no dedup signal.
        # Sizes (__n) were derived from the FULL in-row gram array above, so
        # the Jaccard denominator stays exact; dropping shared shingles only
        # understates |A∩B| (similarity is under-, never over-estimated).
        rare = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_frequency)
            .select("shingle")
        )
        shingles = shingles.join(rare, on="shingle", how="left_semi")

    # self-join on the hashed shingle (id< folded into the join condition),
    # then ONE pair aggregate computes the Jaccard directly: min(__n) is the
    # group-constant document size, so no size table is joined back
    b = shingles.select(
        F.col("shingle").alias("__sh_b"),
        F.col(id_col).alias("__id_b"),
        F.col("__n").alias("__n_b"),
    )
    inter = F.count(F.lit(1))
    return (
        shingles.join(
            b,
            (F.col("shingle") == F.col("__sh_b")) & (F.col(id_col) < F.col("__id_b")),
        )
        .groupBy(F.col(id_col).alias("id_a"), F.col("__id_b").alias("id_b"))
        .agg((inter / (F.min("__n") + F.min("__n_b") - inter)).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 2,
    seed: int = 13,
    stop_shingles: Optional[list] = None,
    signature_bits: int = 64,
) -> DataFrame:
    """MinHash signatures: (id, array<long> of ``num_hashes`` minima).

    ``signature_bits=32`` stores each minimum truncated to its low 32
    bits (array<int>): the MinHash property depends on *which* element is
    the minimum, not its value, so agreement of truncated minima equals
    agreement of the minima up to a 2⁻³² collision per slot — while
    halving the widest shuffle of the LSH pipeline (the band-entry
    exchange in :func:`minhash_near_duplicates` carries the signature 16x
    per doc; measured 43 GB/side at sf100 for 64-bit). The exact 64-bit
    default is right below ~10⁷ docs; at corpus scale the halved
    transport buys more than the 10⁻⁹-level estimate perturbation costs.

    Shuffle-free: per document, distinct shingles are hashed once JVM-side
    (``xxhash64``), then a vectorized pandas UDF derives all ``num_hashes``
    permutation minima with one numpy broadcast over the affine family
    ``h_i(x) = a_i·x + b_i (mod 2^64)``. This replaces the classic
    explode → groupBy(id) → 64×MIN plan — which shuffles every shingle —
    with a narrow map, so at 100 TB cost is one scan, no exchange.

    Documents with no shingles (shorter than ``shingle_n`` tokens) emit no
    signature row, matching the aggregate formulation.

    ``stop_shingles`` (a bounded list of hashed shingles, typically from
    :func:`estimate_stop_shingles`) is excluded before hashing minima:
    boilerplate n-grams shared corpus-wide otherwise dominate the minima
    of short documents, herding unrelated docs into the same LSH buckets
    and inflating candidate fan-out quadratically. Excluding them changes
    signatures (est_jaccard is then Jaccard over the residual shingle
    sets), so it is opt-in.
    """
    n = shingle_n
    toks = df.select(
        F.col(id_col), F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks")
    )
    # Tokenize once, then hash each shingle in place — no re-split per index,
    # no intermediate shingle strings kept beyond the expression. For the
    # common bigram case, zip adjacent tokens (two O(n) slices) instead of
    # slicing per index (O(n²) array copies).
    if n == 2:
        shingle_expr = (
            "CASE WHEN size(__toks) >= 2 THEN "
            "array_distinct(zip_with("
            "slice(__toks, 1, size(__toks) - 1), slice(__toks, 2, size(__toks) - 1), "
            "(a, b) -> xxhash64(concat(a, ' ', b)))) "
            "ELSE array() END"
        )
    else:
        shingle_expr = (
            f"CASE WHEN size(__toks) >= {n} THEN "
            f"array_distinct(transform(sequence(1, size(__toks) - {n - 1}), "
            f"i -> xxhash64(array_join(slice(__toks, i, {n}), ' ')))) "
            f"ELSE array() END"
        )
    hashed = toks.select(F.col(id_col), F.expr(shingle_expr).alias("h0"))
    if stop_shingles:
        stop_arr = F.array(*[F.lit(int(s)) for s in stop_shingles])
        hashed = hashed.select(
            F.col(id_col), F.array_except("h0", stop_arr).alias("h0")
        )
    hashed = hashed.filter(F.size("h0") > 0)

    if signature_bits not in (32, 64):
        raise ValueError("signature_bits must be 32 or 64")
    rng = np.random.default_rng(seed)
    a = (rng.integers(1, 2**62, num_hashes, dtype=np.uint64) * np.uint64(2)) + np.uint64(1)
    b = rng.integers(0, 2**63, num_hashes, dtype=np.uint64)
    elem_type = T.LongType() if signature_bits == 64 else T.IntegerType()

    @F.pandas_udf(T.ArrayType(elem_type))
    def sig(h0: pd.Series) -> pd.Series:
        out = []
        for arr in h0:
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            m = (a[:, None] * h[None, :] + b[:, None]).min(axis=1)
            if signature_bits == 32:
                out.append(m.astype(np.uint32).view(np.int32))
            else:
                out.append(m.view(np.int64))
        return pd.Series(out)

    return hashed.select(F.col(id_col), sig(F.col("h0")).alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: Optional[int] = None,
) -> DataFrame:
    """LSH banding: documents sharing any (band-index, band-hash) bucket
    become candidate pairs.

    The signature is sliced into ``bands`` runs of ``rows_per_band``; each
    run is hashed to one bucket key. Bucket membership is an equi-join —
    never an all-pairs scan. ``max_bucket_size`` drops over-full buckets
    (boilerplate clusters whose O(size²) pair fan-out dominates cost; at
    corpus scale such clusters are near-identical and better handled by
    exact dedup first). Returns distinct ``(id_a, id_b)``.
    """
    # ONE long join key instead of the (band, bucket) pair: joins and
    # aggregates on a single bigint hit Spark's specialized long-key
    # hashed relation / hash map — measured 8-10x faster on the 80M-row
    # candidate probe than the two-column key (r14, docs/SCALING.md). A
    # cross-band xxhash64 collision merely merges two buckets — extra
    # CANDIDATES at ~2^-64 probability, removed by the verify/distinct
    # exactly like any banding false positive.
    band_entries = signatures.select(
        F.col(id_col),
        F.explode(_band_struct_expr(bands, rows_per_band)).alias("e"),
    ).select(id_col, F.xxhash64("e.band", "e.bucket").alias("__bk"))
    if max_bucket_size is not None:
        # anti-join the OVER-FULL keys (tiny: capped corpora have few
        # boilerplate buckets) instead of semi-joining the huge
        # small-keys relation — the broadcast build keeps the narrow
        # entries side shuffle-free, the same shape the fused path uses
        # for its cap
        overfull = (
            band_entries.groupBy("__bk")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") > max_bucket_size)
            .select("__bk")
        )
        band_entries = band_entries.join(
            F.broadcast(overfull), on="__bk", how="left_anti"
        )

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    return (
        a.join(b, on="__bk")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# The three plan-time kernels below are built as ONE memoized SQL string
# handed to F.expr (a single py4j round trip): the Column-API construction
# was hundreds of driver↔JVM socket calls per invocation — profiled at
# ~1.9 s of the ~2 s driver plan-construction tax charged to EVERY
# join-mode call at num_hashes=128 (r15; the parsed Catalyst trees are
# the same, results bit-identical — locked by the minhash parity tests).
# lru_cache on the STRING is session-lifetime-safe (no JVM refs cached).


def _qident(name: str) -> str:
    """Backquote a (possibly alias-qualified dotted) column name for SQL."""
    return ".".join(f"`{p}`" for p in name.split("."))


@lru_cache(maxsize=None)
def _band_struct_sql(bands: int, rows_per_band: int) -> str:
    structs = ", ".join(
        f"named_struct('band', {b}, 'bucket', "
        f"xxhash64(slice(`signature`, {b * rows_per_band + 1}, {rows_per_band}), {b}))"
        for b in range(bands)
    )
    return f"array({structs})"


def _band_struct_expr(bands: int, rows_per_band: int):
    """The banding kernel: slice a column named ``signature`` into
    ``bands`` runs of ``rows_per_band`` and hash each run to a bucket.
    ONE definition shared by the fused join, the slim join
    (:func:`lsh_candidate_pairs`) and the streaming matcher — the
    stream==batch parity contract depends on these never diverging.

    Built as a LITERAL array of per-band structs, not a
    ``transform(sequence(...), ...)`` higher-order function: HOF lambdas
    are evaluated INTERPRETED (never whole-stage-codegen), measured
    ~0.3-0.4 µs/entry slower — a 16 M-entry banding pass dropped from
    6-9 s to ~2 s when unrolled (r14; the values are bit-identical,
    asserted in tests)."""
    return F.expr(_band_struct_sql(bands, rows_per_band))


@lru_cache(maxsize=None)
def _first_agreeing_band_sql(
    sig_a: str, sig_b: str, bands: int, rows_per_band: int
) -> str:
    a, b = _qident(sig_a), _qident(sig_b)
    cases = []
    for bi in range(bands):
        cond = " AND ".join(
            f"({a}[{bi * rows_per_band + j}] = {b}[{bi * rows_per_band + j}])"
            for j in range(rows_per_band)
        )
        cases.append(f"CASE WHEN {cond} THEN {bi} END")
    return f"coalesce({', '.join(cases)})"


def _first_agreeing_band(sig_a: str, sig_b: str, bands: int, rows_per_band: int):
    """Index of the first band whose signature slices fully agree — the
    exact, map-side replacement for a distinct over banded pair copies
    (slice equality implies bucket equality, so each pair is emitted
    from exactly one band). Unrolled flat position-wise comparisons
    (codegen, not interpreted HOFs). Shared by the fused join and the
    streaming matcher."""
    return F.expr(_first_agreeing_band_sql(sig_a, sig_b, bands, rows_per_band))


@lru_cache(maxsize=None)
def _est_jaccard_sql(sig_a: str, sig_b: str, num_hashes: int) -> str:
    a, b = _qident(sig_a), _qident(sig_b)
    terms = " + ".join(
        f"cast(({a}[{i}] = {b}[{i}]) as int)" for i in range(num_hashes)
    )
    return f"({terms}) / {float(num_hashes)}D"


def _est_jaccard(sig_a: str, sig_b: str, num_hashes: int):
    """Estimated Jaccard = fraction of agreeing signature positions, as
    unrolled flat position-wise comparisons (codegen, not interpreted
    HOFs — the zip_with/aggregate form measured ~250 µs/pair interpreted
    at sf100). Shared by the fused and slim join shapes and the
    streaming matcher so the verify semantics can never drift."""
    return F.expr(_est_jaccard_sql(sig_a, sig_b, num_hashes))


def _minhash_pairs_slim(
    sigs: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
    num_hashes: int,
    threshold: float,
    max_bucket_size: Optional[int],
) -> DataFrame:
    """The slim band join: banding over 16-byte (band, bucket, id)
    entries — candidate pairs deduped while still narrow — then ONE
    signature attach per side for the shared unrolled-codegen verify.
    See :func:`minhash_near_duplicates` for when this beats the fused
    shape (distinct candidates O(n_docs)) and when it loses (candidate
    explosions re-shuffle sig-wide pair rows on the second attach).

    Built from memoized SQL FRAGMENTS applied via ``selectExpr`` /
    ``filter`` strings over the DataFrame API — NOT a single
    parameterized ``spark.sql(..., sigs=frame)`` call, and NOT
    per-expression Column-API plumbing:

    - the Column-API form cost ~390 py4j driver↔JVM round trips per
      invocation (~0.24 s at num_hashes=128 — the bulk of the per-call
      plan tax the r14 verdict flagged); fragment ``selectExpr`` calls
      cost one round trip per FRAME (~40 total, <0.05 s);
    - the full-SQL form was ~5 round trips but SEVERS CACHE LINKAGE:
      ``spark.sql`` substitutes ``{frame}`` through a temp view, and the
      re-resolved plan no longer matches the persisted plan in the cache
      manager — a persisted caller ``signatures`` frame was silently
      recomputed from scratch by every action on the returned plan
      (measured r15: the plan showed FileScan, not InMemoryTableScan).
      The DataFrame API keeps the exact plan object, so cache
      substitution works."""
    qid = _qident(id_col)
    band_entries = sigs.selectExpr(
        f"{qid} AS __id",
        f"explode({_band_struct_sql(bands, rows_per_band)}) AS __e",
    ).selectExpr("__id", "xxhash64(__e.band, __e.bucket) AS __bk")
    if max_bucket_size is not None:
        # anti-join the tiny over-full key set, broadcast — the narrow
        # entries side stays shuffle-free, same shape as the fused cap
        overfull = (
            band_entries.groupBy("__bk")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") > max_bucket_size)
            .select("__bk")
        )
        band_entries = band_entries.join(
            F.broadcast(overfull), on="__bk", how="left_anti"
        )
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    cand = (
        a.join(b, on="__bk")
        .filter("a.__id < b.__id")
        .selectExpr("a.__id AS id_a", "b.__id AS id_b")
        .distinct()
    )
    sig_a = sigs.selectExpr(f"{qid} AS id_a", "signature AS __sig_a")
    sig_b = sigs.selectExpr(f"{qid} AS id_b", "signature AS __sig_b")
    est = _est_jaccard_sql("__sig_a", "__sig_b", num_hashes)
    return (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .selectExpr("id_a", "id_b", f"{est} AS est_jaccard")
        # string→double cast replays repr() exactly; a bare scientific
        # literal would need the D suffix dialect
        .filter(f"est_jaccard >= CAST('{float(threshold)!r}' AS DOUBLE)")
    )


# auto-mode measurement-pass sizing: past _AUTO_TARGET_ENTRIES band
# entries the candidate count is estimated from a deterministic
# (xxhash64 % _SAMPLE_DENOM) doc sample sized to ~the target — module
# level so tests can force the sampled path on small corpora
_AUTO_TARGET_ENTRIES = 2_000_000
_SAMPLE_DENOM = 4096


def _plan_row_estimate(df):
    """Row count from Catalyst's plan statistics — ZERO jobs — or None.
    Defined for materialized caches and count-known relations; None for
    pipelines whose size Catalyst cannot know (their sizeInBytes is a
    worthless Long.MaxValue-ish sentinel, so no byte fallback). Used
    only to size the auto-mode sampling rate.

    This reaches through ``df._jdf`` into private py4j surface
    (``queryExecution().optimizedPlan().stats()``) that can move across
    Spark minor versions — any failure degrades to None (the caller then
    counts exactly), never raises: a stats HINT must not break the op."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        return max(1, int(str(rc.get()))) if rc.isDefined() else None
    except Exception:
        return None


def _auto_join_mode_decision(
    n_docs: int, bands: int, sig_bytes: int, candidate_pairs: int
) -> dict:
    """The pure arithmetic behind ``join_mode='auto'`` — separated from
    the measurement pass so the measured anchors pin it as regression
    tests (a drifted ``_SLIM_COST_RATIO`` fails the anchor tests, not a
    5 M-doc rerun):

      fused ~ n_docs*bands*(16 + sig_bytes)            (entries carry sigs)
      slim  ~ n_docs*bands*16 + 2*n_docs*sig_bytes     (entries + 2 sig tables)
            + C*(16 + sig_bytes)                       (pair dedup + sig re-shuffle)

    The two volumes are NOT like-for-like bytes: fused's are wide-row
    bytes through a sort-merge exchange (each band entry carries the
    signature through sort + join), slim's are mostly narrow 16-byte
    entries plus candidate rows. The r12 interleaved A/B
    (docs/SCALING.md "auto join-mode") measured fused at ~6.6x the
    wall-clock cost PER MODELED BYTE (1 M Zipf docs + 2k boilerplate:
    fused 4.35 GB -> 85-88 s, slim 10.1 GB -> 30-31 s), so a raw byte
    comparison flips to fused far too early. The fitted ratio keeps
    slim until its volume exceeds ~6x fused's — correct against BOTH
    measured anchors: the r12 boilerplate point (slim 2.3x fused's
    bytes, slim 2.9x faster -> slim) and the r11 DNF point (C=7.4e8 at
    5 M docs: slim ~2.0e11 B > 6x2.2e10 B -> fused, where slim
    genuinely exhausted local disk).
    """
    _SLIM_COST_RATIO = 6.0
    fused_vol = n_docs * bands * (16 + sig_bytes)
    slim_vol = (
        n_docs * bands * 16
        + 2 * n_docs * sig_bytes
        + candidate_pairs * (16 + sig_bytes)
    )
    return {
        "picked": "slim" if slim_vol < _SLIM_COST_RATIO * fused_vol else "fused",
        "candidate_pairs": candidate_pairs,
        "n_docs": n_docs,
        "sig_bytes": sig_bytes,
        "fused_vol_bytes": fused_vol,
        "slim_vol_bytes": slim_vol,
        "slim_cost_ratio": _SLIM_COST_RATIO,
    }


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 2,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_size: Optional[int] = None,
    stop_shingles: Optional[list] = None,
    signature_bits: int = 64,
    signatures: Optional[DataFrame] = None,
    join_mode: str = "fused",
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, verified.

    Candidates from banding, *verified* by estimating Jaccard as the
    fraction of agreeing signature positions (zip_with over the two
    signature arrays — built-in, no re-shingling join). Returns
    ``(id_a, id_b, est_jaccard)`` above ``threshold``.

    Physical plan — ``join_mode`` picks between two shapes whose costs
    cross over on the expected candidate-pair count:

    - ``'fused'`` (default, the round-7 rewrite): ONE self-join on
      (band, bucket) whose entries carry the signature, with the Jaccard
      estimate computed and thresholded inside the join projection, then
      a distinct over the (narrow) surviving pairs. The wide shuffle is
      the bands-per-doc band-entry exchange (n_docs x bands rows, each
      carrying the signature; written once, read twice via
      ReuseExchange) and everything after the join is a map — verify
      costs no extra shuffle NO MATTER how many candidate pairs the
      buckets produce. Right when candidates can explode: low
      thresholds, no bucket cap, unknown corpora. (The pre-round-7 slim
      shape at sf100/threshold 0.3 re-shuffled 7.4e8 candidates *with a
      0.5 KB signature attached* — ~200 GB — and DNF'd a 60 GB disk.)
    - ``'slim'``: the band self-join carries only (band, bucket, id) —
      16-byte entries, a ~sig-size-fold smaller exchange — then the
      deduped candidate pairs re-join the signature table once per side
      for the verify. Each signature attach is a shuffle of the
      candidates (slim, then sig_a-wide on the id_b side), so this wins
      EXACTLY WHEN distinct candidates stay O(n_docs): high thresholds,
      ``max_bucket_size`` capped, mostly-unique corpora. Measured at
      5 M realistic docs / 64x32-bit signatures on one host: fused's
      band-entry exchange + join-side sort spill needs ~75 GB of local
      disk; slim needs ~8 GB. At 100 TB the same rule applies per
      executor: cap the buckets, then go slim.
    - ``'auto'``: measure instead of guess — one narrow counting pass
      over the (capped) band entries computes the candidate-pair count
      (EXACT up to ~2 M band entries; past that, a deterministic doc
      sample with the unbiased x(x−1)/p² pair correction bounds the
      pass at ~2 M rows — <1 s at 1 M docs vs 6–9 s exact, picks
      unchanged on the measured anchors), then both shapes'
      shuffle-byte volumes are compared
      (fused: entries x (key + sig); slim: slim entries + two
      signature tables + candidates x (key + sig)) with a fitted
      per-byte cost ratio: fused's bytes are wide-row sort-merge bytes
      and measured ~6.6x more expensive per byte than slim's narrow
      entries (r12 interleaved A/B, docs/SCALING.md), so slim runs
      until its volume exceeds ~6x fused's — the regime where slim's
      candidate spill is also the disk hazard the fused shape exists to
      avoid. Costs one extra (band, bucket) aggregation — and a scan of
      a caller-provided ``signatures`` frame, so persist it — in
      exchange for never paying the ~10x disk penalty of the wrong
      shape.

    ``max_bucket_size`` drops over-full buckets before the join via a
    broadcast anti-join (the over-full set is tiny by construction —
    it's the skew head). A pair is lost only if EVERY band it agrees in
    was pruned: with pruning on, pair dedup switches from the
    first-agreeing-band map filter to a post-threshold distinct (the
    first agreeing band itself may have been pruned), so agreement in
    any surviving band still yields the pair. Boilerplate mega-clusters
    carry no near-dup signal worth O(size²) pair rows; exact dedup or
    ``stop_shingles`` (see :func:`minhash_signatures`) handle them
    upstream.
    """
    if join_mode not in ("fused", "slim", "auto"):
        raise ValueError(f"join_mode must be fused|slim|auto, got {join_mode!r}")
    if num_hashes % bands != 0:
        # silently banding only num_hashes - (num_hashes % bands) positions
        # would quietly change the S-curve the caller computed recall from
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    rows_per_band = num_hashes // bands
    # The signature frame feeds the band-entry explode on both join sides;
    # persisting avoids recomputing the shingle + 64-way min pipeline. At
    # warehouse scale this is the table you'd materialize — pass it in via
    # ``signatures`` (an (id, signature) frame, e.g. a persisted
    # minhash_signatures output or a table read back from storage) and
    # this function neither caches nor materializes anything itself: the
    # caller owns the signature lifecycle and the result stays lazy.
    owns_sigs = signatures is None
    if owns_sigs:
        sigs = minhash_signatures(
            df,
            text_col,
            id_col,
            num_hashes,
            shingle_n,
            stop_shingles=stop_shingles,
            signature_bits=signature_bits,
        ).persist()
    else:
        # caller-provided signatures: shingling params (shingle_n,
        # stop_shingles, signature_bits) are ignored on this path, but
        # num_hashes MUST match the stored signature length — a mismatch
        # would index past the array, turn every comparison NULL, and
        # silently return an empty result. The guard is PLAN-EMBEDDED
        # (a codegen'd assert_true filter, one array-length check per
        # row) instead of an eager first-row probe: the probe was a
        # driver job charged to every call — ~0.13 s of fixed stage
        # overhead that kept explicit join_mode='slim' plan construction
        # above the r14 ask's 0.3 s budget (r15). A mismatch now fails
        # at first execution with this message rather than at call time.
        sigs = signatures.filter(
            F.assert_true(
                F.size("signature") == F.lit(int(num_hashes)),
                f"signatures frame's signature length != num_hashes="
                f"{num_hashes}; pass the num_hashes the signatures were "
                f"built with",
            ).isNull()
        )
    measured_cache = None
    if join_mode == "auto" and not owns_sigs:
        # auto mode runs TWO eager driver jobs below (the bucket-size agg
        # and the doc count); on an unpersisted caller-provided signature
        # frame each would re-run the full shingle+minhash pipeline. Cache
        # it around the measurement (released right after — the caller
        # owns the lifecycle) and say so: the RETURNED plan still
        # recomputes signatures once unless the caller persists.
        # storage level of the CALLER's frame — `sigs` wraps it in the
        # plan-embedded width-guard filter, which never carries a level
        lvl = signatures.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            import warnings

            warnings.warn(
                "join_mode='auto' measures candidate volume with two eager "
                "jobs; the provided signatures frame is not persisted, so it "
                "is cached around the measurement and released. Persist it "
                "yourself to also share that work with the returned plan.",
                stacklevel=2,
            )
            sigs = sigs.persist()
            measured_cache = sigs
    if join_mode == "auto":
        # measure, don't guess: one narrow counting pass over the (capped)
        # 16-byte band entries computes the candidate-pair count
        # C = sum over buckets of sz*(sz-1)/2, then the two shapes'
        # shuffle volumes are compared directly:
        #   fused ~ n_docs*bands*(16 + sig_bytes)    (band entries carry sigs)
        #   slim  ~ n_docs*bands*16 + 2*n_docs*sig_bytes   (entries + 2 sig tables)
        #         + C*(16 + sig_bytes)               (pair dedup + sig_a re-shuffle)
        #
        # Past ~2 M band entries the pass runs on a DETERMINISTIC doc
        # sample (xxhash64 of the id, rate p sized to ~2 M sampled
        # entries) with the unbiased pair correction Ĉ = Σ x(x−1)/2 / p²
        # (a true bucket of size s samples Binomial(s,p), and
        # E[X(X−1)] = s(s−1)p² exactly). The r13 exact pass cost 6–9 s
        # warm at 1 M docs — a fixed tax on every auto call; sampling
        # bounds the pass at ~2 M rows regardless of corpus size
        # (measured <1 s at 1 M docs, picks unchanged on all pinned
        # anchors — docs/SCALING.md round 14). The decision only needs C
        # to the ~6x volume boundary, and the estimator's error
        # concentrates exactly where it matters least: heavy buckets
        # (which dominate any decision-relevant C) survive sampling with
        # low relative error, while sz≤2 noise perturbs C by far less
        # than the boundary margin. With a ``max_bucket_size`` cap the
        # sampled cap is p·cap; if that falls below 8 the boundary noise
        # would misclassify near-cap buckets, so the pass falls back to
        # exact (tight caps shrink the entries anyway).
        # sizing needs a row-count estimate BEFORE the measurement job;
        # Catalyst's plan statistics give one for free (no job) — exact
        # for cached/scanned relations, an estimate otherwise. Only the
        # SAMPLING RATE depends on it; the decision's n_docs comes out
        # of the measurement aggregate itself (exact when unsampled).
        # estimate from the PRE-GUARD frame: the plan-embedded width
        # guard (a Filter node) hides a cached relation's exact rowCount
        # from the stats visitor, which would force the count() fallback
        # — a full extra job per auto call — on every caller-provided
        # signatures frame. The guard never changes the row count (it
        # passes all rows or raises), so the unfiltered estimate is the
        # filtered frame's row count.
        est_rows = _plan_row_estimate(
            signatures if signatures is not None else sigs
        )
        if est_rows is None:
            # no free row count in the plan stats: materialize the cache
            # with one count (the join itself needs it materialized, so
            # this is amortized, and subsequent auto calls on the same
            # persisted frame get the zero-job path)
            est_rows = sigs.count()
        total_entries = est_rows * bands
        p_eff, k_num = 1.0, _SAMPLE_DENOM
        if total_entries > 2 * _AUTO_TARGET_ENTRIES:
            k_num = max(
                1,
                int(round(_AUTO_TARGET_ENTRIES / total_entries * _SAMPLE_DENOM)),
            )
            p_eff = k_num / _SAMPLE_DENOM
            if max_bucket_size is not None and p_eff * max_bucket_size < 8:
                p_eff, k_num = 1.0, _SAMPLE_DENOM
        meas = sigs
        if p_eff < 1.0:
            meas = sigs.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(_SAMPLE_DENOM))
                < F.lit(k_num)
            )
        slim_entries = meas.select(
            F.explode(_band_struct_expr(bands, rows_per_band)).alias("e")
        ).select(F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket"))
        sizes = slim_entries.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("sz")
        )
        cap_cond = F.lit(True)
        if max_bucket_size is not None:
            cap = (
                max_bucket_size
                if p_eff >= 1.0
                else max(1, int(p_eff * max_bucket_size))
            )
            cap_cond = F.col("sz") <= cap
        # ONE job measures both quantities: the (capped) pair count and
        # the total entry count, whose /bands is n_docs — exact when
        # unsampled, /p when sampled (n_docs only feeds a 6x volume
        # comparison, so sub-percent sampling error is immaterial). The
        # r13 pass ran sigs.count() as a second full cache scan.
        row = sizes.agg(
            F.sum(
                F.when(cap_cond, F.col("sz") * (F.col("sz") - 1) / 2)
            ).alias("c"),
            F.sum("sz").alias("entries"),
        ).first()
        cand = int(float(row["c"] or 0) / (p_eff * p_eff))
        n_docs = int(round(float(row["entries"] or 0) / (bands * p_eff)))
        # width from the ACTUAL schema, not the parameter — on the
        # caller-provided signatures path signature_bits is ignored
        from pyspark.sql import types as _T

        elem = sigs.schema["signature"].dataType.elementType
        sig_bytes = num_hashes * (4 if isinstance(elem, _T.IntegerType) else 8)
        decision = _auto_join_mode_decision(n_docs, bands, sig_bytes, cand)
        decision["sample_fraction"] = p_eff
        join_mode = decision["picked"]
        # observability hook (module-level, last call wins): probes and the
        # A/B harness need to know WHICH shape auto picked and from what
        # measured volumes, without parsing logs or re-running the
        # measurement pass. Not a public API.
        global _LAST_AUTO_DECISION
        _LAST_AUTO_DECISION = decision
    if measured_cache is not None:
        measured_cache.unpersist()
    band_expr = _band_struct_expr(bands, rows_per_band)
    if join_mode == "slim":
        result = _minhash_pairs_slim(
            sigs, id_col, bands, rows_per_band, num_hashes, threshold,
            max_bucket_size,
        )
        if owns_sigs:
            result = result.persist()
            result.count()
            sigs.unpersist()
        return result
    # single long join key (xxhash64 of the band struct) — see
    # lsh_candidate_pairs: long-key joins/aggs hit Spark's specialized
    # long hashed relation, measured 8-10x faster than the two-column
    # (band, bucket) key; `band` still rides along for the
    # first-agreeing-band dedup filter below
    entries = sigs.select(
        F.col(id_col), F.col("signature"), F.explode(band_expr).alias("e")
    ).select(
        id_col,
        "signature",
        F.col("e.band").alias("band"),
        F.xxhash64("e.band", "e.bucket").alias("__bk"),
    )
    if max_bucket_size is not None:
        # Count bucket sizes over a signature-free projection (narrow
        # shuffle), keep only the over-full keys — a tiny relation — and
        # broadcast-anti-join it against the wide entries, so the wide
        # side is never shuffled for the cap.
        slim = sigs.select(F.col(id_col), F.explode(band_expr).alias("e")).select(
            F.xxhash64("e.band", "e.bucket").alias("__bk")
        )
        overfull = (
            slim.groupBy("__bk")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") > max_bucket_size)
            .select("__bk")
        )
        entries = entries.join(F.broadcast(overfull), on="__bk", how="left_anti")
    a = entries.alias("a")
    b = entries.alias("b")
    # The verify expressions are UNROLLED into flat position-wise
    # comparisons instead of zip_with/aggregate/slice lambdas: Spark's
    # higher-order functions are interpreted per element (no whole-stage
    # codegen), and at sf100 the 7.4e8-pair verify measured ~250 µs/pair
    # interpreted — hours of single-host CPU. num_hashes is a plan-time
    # constant, so 64 GetArrayItem equality terms compile into one
    # codegen'd expression tree (~10× on the verify stage, identical
    # results — locked by tests/test_operators.py minhash parity tests).
    est = _est_jaccard("a.signature", "b.signature", num_hashes)
    # First-matching-band dedup: a pair that collides in k bands appears k
    # times in the join; keep it only from the first band whose signature
    # slices agree — an exact, *map-side* replacement for distinct() (at
    # sf100 the distinct shuffle over 7.4e8 candidate rows was the last
    # table-sized exchange in this plan). Slice equality implies bucket
    # equality, so each surviving pair is emitted exactly once; a pair
    # whose buckets collide without any slice agreeing (a 2^-64 xxhash64
    # event) is dropped, which the est filter would do anyway.
    # coalesce(when(band0_agrees, 0), when(band1_agrees, 1), ...) is the
    # first (= minimum) agreeing band, again as pure codegen.
    first_band = _first_agreeing_band("a.signature", "b.signature", bands, rows_per_band)
    joined = a.join(b, on="__bk").filter(
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    pair_cols = [
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        est.alias("est_jaccard"),
    ]
    if max_bucket_size is None:
        # No pruning: every agreeing band of a pair survives the join, so
        # the signature-derived first agreeing band is always present and
        # the dedup stays a pure map-side filter. (`a.band`: the single
        # hashed join key leaves band on both sides; they are equal on
        # every non-collision row.)
        result = (
            joined.filter(F.col("a.band") == first_band)
            .select(*pair_cols)
            .filter(F.col("est_jaccard") >= threshold)
        )
    else:
        # Bucket pruning can remove exactly the band the signature says is
        # the pair's first agreeing band; the surviving copies would then
        # all fail `band == first_band` and the pair would be silently
        # over-dropped (beyond the documented over-full-bucket contract).
        # Dedup over SURVIVING rows instead: threshold first, so only the
        # (small) near-duplicate pair set — at most `bands` copies each —
        # reaches the distinct shuffle; est_jaccard is computed from the
        # full signatures, identical on every copy, so any survivor is
        # the same row.
        result = (
            joined.select(*pair_cols)
            .filter(F.col("est_jaccard") >= threshold)
            .dropDuplicates(["id_a", "id_b"])
        )
    if owns_sigs:
        # materialize the (small: pairs above threshold) output, then
        # release the signature cache — on a long-lived session, leaking
        # one persisted signature table per dedup sweep is how executors
        # run out of storage. (Round 6 leaked it, which also flattered
        # its benchmark: repeat runs silently reused the leaked cache.)
        result = result.persist()
        result.count()
        sigs.unpersist()
    return result


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """SimHash: one 64-bit signature per document from token hashes.

    Per bit b, sum +1/−1 over tokens according to bit b of the token hash,
    then take the sign. Token hashes are computed JVM-side in one narrow
    projection; the bit-vote matrix is one numpy broadcast inside an
    Arrow-batched pandas UDF — no explode, no shuffle (the classic
    explode → groupBy → 64×SUM plan shuffles every token).
    Bit ``bits-1`` is left clear so the signature stays a positive long.

    ``token_hash='xxhash64'`` (default) is the scale path.
    ``token_hash='md5_60'`` derives a 60-bit hash from the md5 hex prefix —
    slower, but both engines of a cross-engine oracle can compute md5, so
    the full bit-vote becomes SQL-replayable (requires ``bits <= 61``).
    """
    if token_hash == "xxhash64":
        hash_expr = "xxhash64(t)"
    elif token_hash == "md5_60":
        if bits > 61:
            raise ValueError("md5_60 provides 60 hash bits; use bits <= 61")
        hash_expr = "cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)"
    else:
        raise ValueError(f"unknown token_hash: {token_hash!r}")
    toks = df.select(
        F.col(id_col),
        F.expr(
            f"transform(split(trim(lower({text_col})), '\\\\s+'), t -> {hash_expr})"
        ).alias("th"),
    )
    shifts = np.arange(bits - 1, dtype=np.uint64)

    @F.pandas_udf(T.LongType())
    def sig(th: pd.Series) -> pd.Series:
        out = np.zeros(len(th), dtype=np.int64)
        for i, arr in enumerate(th):
            if arr is None or len(arr) == 0:
                continue  # NULL text → null token array → signature 0
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            bit_votes = (2 * ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) - 1).sum(axis=0)
            out[i] = int(((bit_votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        return pd.Series(out)

    return toks.select(F.col(id_col), sig(F.col("th")).alias("simhash"))


def embedding_near_duplicates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 7,
    brute_force: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Scale path (default): random-hyperplane LSH with OR-amplification —
    ``num_tables`` independent sets of ``num_planes`` hyperplanes; vectors
    agreeing on every sign bit in *any* table become candidates (equi-join
    on ``(table, bucket)``, exact cosine verify, distinct). Per-table miss
    probability for a pair at angle θ is ``1 − (1 − θ/π)^planes``, so L
    tables drive recall to ``1 − miss^L`` while keeping cost proportional
    to bucket occupancy — never all-pairs. ``brute_force=True`` compares
    all pairs (oracle / small-data path).
    Returns ``(id_a, id_b, cosine)`` ≥ threshold.
    """
    from ..utils import vector as _vec

    # embedding dim is a table constant: the PER-PAIR dot after the join
    # unrolls to scalar codegen (HOF lambdas are interpreted per element —
    # docs/SCALING.md, q4 sf100). Per-row cast/norm stay HOF: unrolled
    # pre-exchange expressions get inlined into every consumer by
    # projection collapse and blow up the plan (see operators/similarity).
    first = emb.select(vec_col).first()
    dim = len(first[0]) if first and first[0] is not None else 0
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(_vec.hof_sq_norm(v))
    base = emb.select(F.col(id_col), v.alias("v"), norm.alias("norm"))

    if not brute_force:
        rng = np.random.default_rng(seed)
        # all tables' hyperplanes as one (dim, tables*planes) matrix: every
        # bucket bit for a batch of vectors is a single BLAS matmul + sign
        planes = rng.standard_normal((num_tables * num_planes, dim))
        plane_mat = planes.T.copy()
        weights = (2 ** np.arange(num_planes, dtype=np.int64)).reshape(1, 1, num_planes)

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def buckets(vs: pd.Series) -> pd.Series:
            mat = np.array(vs.tolist(), dtype=np.float64)  # (batch, dim)
            bits = (mat @ plane_mat) >= 0  # (batch, tables*planes)
            ids = (bits.reshape(len(mat), num_tables, num_planes) * weights).sum(axis=2)
            return pd.Series(list(ids))

        # single hashed long join key (see lsh_candidate_pairs): long-key
        # equi-joins hit the specialized LongHashedRelation, ~8-10x
        # faster probes than a two-column key; a cross-table collision
        # adds a candidate pair at ~2^-64, removed by the exact cosine
        # filter below like any LSH false positive
        tabled = base.withColumn("bs", buckets(F.col("v"))).select(
            id_col,
            "v",
            "norm",
            F.posexplode("bs").alias("t", "bucket"),
        ).select(
            id_col, "v", "norm", F.xxhash64("t", "bucket").alias("__tb")
        )
        a = tabled.alias("a")
        b = tabled.alias("b")
        joined = (
            a.join(b, on="__tb")
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.v").alias("va"),
                F.col("b.v").alias("vb"),
                F.col("a.norm").alias("na"),
                F.col("b.norm").alias("nb"),
            )
            .dropDuplicates(["id_a", "id_b"])  # pairs colliding in >1 table
        )
    else:
        a = base.alias("a")
        b = base.alias("b")
        joined = (
            a.crossJoin(b)
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.v").alias("va"),
                F.col("b.v").alias("vb"),
                F.col("a.norm").alias("na"),
                F.col("b.norm").alias("nb"),
            )
        )

    dot_ab = _vec.dot(F.col("va"), F.col("vb"), dim) if dim else _vec.hof_dot(
        F.col("va"), F.col("vb")
    )
    return (
        joined.withColumn("cosine", dot_ab / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Resolve duplicate-pair edges into clusters: ``(node, component)``
    where ``component`` is the smallest node id reachable from ``node``.

    Near-dup candidate generators (:func:`ngram_jaccard_pairs`,
    :func:`minhash_near_duplicates`, :func:`embedding_near_duplicates`)
    emit *pairs*; a cleaning pipeline needs *clusters* so it can keep one
    canonical document per group even when A~B and B~C but A≁C.

    Algorithm — alternating **large-star / small-star** (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14), the standard
    shuffle-based CC used at web scale (also what GraphFrames ships):

    - large-star: every node points its *larger* neighbors at the minimum
      of its closed neighborhood;
    - small-star: every node points its smaller-or-equal neighbors (and
      itself) at that minimum.

    Each half-round is one ``groupBy(min)`` + one equi-join — ordinary
    shuffles Catalyst/AQE handle — and the edge list only shrinks
    (toward a forest of stars), so the iteration converges in
    O(log n) rounds even for path-shaped graphs, where naive min-label
    propagation needs O(diameter). Per-round results are
    ``localCheckpoint``-ed to truncate the growing logical plan (on a
    real cluster, point ``spark.sparkContext.setCheckpointDir`` at
    reliable storage and swap in ``checkpoint``); convergence is detected
    by an (edge-count, xxhash64-sum) fingerprint — one cheap aggregate
    instead of a set-difference join, with a ≪2⁻⁶⁴ false-converge risk.

    Output has one row per node that appears in ≥1 pair. Isolated
    documents (no duplicate pair) are by definition their own singleton
    cluster and are left out; callers wanting them can left-join this
    result and coalesce to the doc's own id.
    """
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("u").alias("node")).union(
        edges.select(F.col("v").alias("node"))
    ).distinct()

    def fingerprint(e: DataFrame):
        # bit_xor is order-independent and overflow-free (a sum of 64-bit
        # hashes would trip ANSI-mode overflow); edges are distinct so no
        # pair can self-cancel.
        row = e.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.least("u", "v"), F.greatest("u", "v"))).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def _star_round(e: DataFrame) -> DataFrame:
        # large-star: group the symmetric edge list by u; m = min of the
        # closed neighborhood; larger neighbors re-point at m.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: direct each edge larger→smaller, group by the larger
        # endpoint; all smaller neighbors plus the node itself point at m.
        directed = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = directed.groupBy("u").agg(F.min("v").alias("m"))
        return (
            directed.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )

    prev_fp = fingerprint(edges)
    for _ in range(max_iterations):
        edges = _star_round(edges)
        fp = fingerprint(edges)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        # The budget is exhausted, but the LAST allowed round may itself
        # have produced the final star forest (its fingerprint differs
        # from the previous round's, so the loop cannot tell). One
        # confirmation round disambiguates: unchanged -> converged on
        # the final round, proceed; still changing -> emitting the
        # labels would be silently WRONG clusters, raise. Alternating
        # star rounds halve the effective diameter, so the default 25
        # rounds cover ~2^25 before this can fire.
        confirmed = _star_round(edges)
        if fingerprint(confirmed) != prev_fp:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} "
                "rounds; raise max_iterations (the edge fingerprint was "
                "still changing, so the labels are not final)"
            )
        edges = confirmed

    # Converged edges form stars (node → component min). Roots appear only
    # on the v side; they label themselves.
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.5,
    max_doc_frequency: Optional[int] = None,
    stop_shingle_sample: Optional[float] = None,
    method: str = "exact",
    num_hashes: int = 64,
    bands: int = 16,
    signature_bits: int = 64,
    max_bucket_size: Optional[int] = None,
    join_mode: str = "auto",
) -> DataFrame:
    """Near-duplicate clusters over a corpus: similarity pairs →
    connected components → ``(doc_id, component, cluster_size)``.

    ``component`` (the smallest doc id in the cluster) is the canonical
    survivor a cleaning pipeline keeps; every other row in the cluster is
    the drop list. Only documents that belong to a ≥2-document cluster
    are returned — the complement of this result's non-canonical rows is
    the cleaned corpus.

    ``method`` picks the pair generator:

    - ``'exact'`` (default, the oracle-replayable path): n-gram Jaccard
      via the inverted-index self-join. On realistic heavy-tailed text,
      set ``max_doc_frequency`` (and ``stop_shingle_sample`` to find the
      heavy hitters from a bounded sample) — the exact pair join is
      quadratic in per-shingle document frequency, and the hot head of a
      natural vocabulary explodes it (measured 47x candidate-row
      reduction at 50 k Zipf docs, `docs/SCALING.md` §Hot-shingle caps).
    - ``'minhash'`` (the 100 TB path): banded MinHash-LSH pairs with the
      position-agreement estimate as the similarity; ``threshold`` then
      applies to ``est_jaccard``. Recall follows the banding S-curve
      (0.9975 at true J >= 0.7 with 64 hashes x 16 bands, measured on
      5 M realistic docs), so clusters can split where the exact method
      would merge — identical on exact copies, near-identical above the
      threshold's knee. ``max_bucket_size`` prunes over-full band
      buckets before the pair join (the skew head — a boilerplate
      mega-group's O(size²) candidate rows carry no near-dup signal
      worth their shuffle; run exact dedup first), and
      ``signature_bits=32`` halves the band-entry exchange payload
      (est_jaccard granularity is unchanged) — both forwarded to
      :func:`minhash_near_duplicates`, as is ``join_mode`` (default
      ``'auto'`` here: the high-level API measures the candidate count
      and picks the pair-join shape instead of asking the caller to
      guess a ~10x disk decision).
    """
    if method not in ("exact", "minhash"):
        raise ValueError(f"method must be exact|minhash, got {method!r}")
    if method == "minhash":
        # the exact path's skew knobs must not become silent no-ops on a
        # method switch (the engine's convention: a parameter that stops
        # doing anything must raise, not be ignored). stop_shingle_sample
        # maps onto the minhash kernel's stop_shingles exclusion; a bare
        # max_doc_frequency has no minhash analogue (there is no exact
        # df count on this path) — its skew job belongs to
        # max_bucket_size here.
        stop = None
        if stop_shingle_sample is not None:
            if max_doc_frequency is None:
                raise ValueError(
                    "stop_shingle_sample needs max_doc_frequency (the df "
                    "cutoff the sampled estimate applies)"
                )
            stop = estimate_stop_shingles(
                df, text_col, id_col, n,
                max_doc_frequency=max_doc_frequency,
                sample_fraction=stop_shingle_sample,
            )
        elif max_doc_frequency is not None:
            raise ValueError(
                "max_doc_frequency alone is an exact-path knob (it caps an "
                "exact shingle-df count that method='minhash' never "
                "computes); with minhash either add stop_shingle_sample "
                "so the heavy shingles are estimated and excluded from "
                "signatures, or cap skew with max_bucket_size"
            )
        pairs = minhash_near_duplicates(
            df, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, shingle_n=n, bands=bands,
            threshold=threshold, signature_bits=signature_bits,
            max_bucket_size=max_bucket_size, join_mode=join_mode,
            stop_shingles=stop or None,
        )
    else:
        pairs = ngram_jaccard_pairs(
            df, text_col=text_col, id_col=id_col, n=n, threshold=threshold,
            max_doc_frequency=max_doc_frequency,
            stop_shingle_sample=stop_shingle_sample,
        )
    comp = connected_components(pairs)
    # cluster_size via groupBy+join, NOT a window: Window.partitionBy puts
    # every member of a component through ONE sort task, and a boilerplate
    # cluster on a 100 TB corpus can hold 10^8 documents. The aggregate is
    # partial (map-side combine) and the join back is AQE-skew-splittable;
    # a window partition never is.
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        F.col("node").alias(id_col), "component", "cluster_size"
    )


def resolve_duplicates(
    df: DataFrame,
    clusters: DataFrame,
    quality_col: Optional[str] = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """The cleaned corpus: every document except the non-canonical members
    of each duplicate cluster.

    ``clusters`` is :func:`dedup_clusters` output (or any
    ``(id, component)`` assignment). The survivor per cluster is the
    highest-``quality_col`` member (ties → smallest id; NULL quality
    sorts last), or the smallest id when no quality column is given —
    i.e. "keep the best copy, drop the rest", the selection step between
    near-dup clustering and corpus assembly.

    At scale the cluster table only holds documents that ARE in a ≥2
    cluster — a small fraction of the corpus — so the drop list is small
    and the final ``left_anti`` join broadcasts. Keeper selection is
    deliberately NOT a ``row_number`` window by component: a window
    partition is one unsplittable sort task, and a boilerplate cluster on
    a 100 TB corpus can hold 10^8 members. Instead the argmax is two
    partial-aggregable ``groupBy`` passes (max quality per component,
    then min id among the maximal rows) whose shuffles map-side-combine
    a giant component down to one row per partition before any exchange.
    """
    member = clusters.select(F.col(id_col), "component")
    if quality_col is not None:
        member = member.join(df.select(id_col, quality_col), id_col, "left")
        # pass 1: best quality per component (max ignores NULLs, so NULL
        # quality never wins unless the whole component is NULL — the
        # same desc_nulls_last semantics as an ordered window)
        best = (
            member.groupBy("component")
            .agg(F.max(quality_col).alias("__bq"))
            .select(F.col("component").alias("__bc"), "__bq")
        )
        maximal = member.join(
            best,
            (F.col("component") == F.col("__bc"))
            & F.col(quality_col).eqNullSafe(F.col("__bq")),
        ).select("component", id_col)
    else:
        maximal = member
    # pass 2: smallest id among the maximal rows is the keeper
    keepers = maximal.groupBy("component").agg(F.min(id_col).alias("__keep"))
    drops = (
        member.join(keepers, "component")
        .filter(F.col(id_col) != F.col("__keep"))
        .select(id_col)
    )
    return df.join(drops, id_col, "left_anti")


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 16,
    stride: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-corpus repeated token spans — the exact-substring duplication
    signal (cf. the published train-data dedup result that repeated long
    spans, not whole-document copies, dominate memorization): rolling
    ``span_tokens``-token windows at ``stride``, fingerprinted and counted
    corpus-wide. Returns one row per occurrence of a span that appears in
    at least ``min_docs`` distinct documents:
    ``(id, token_start, span_hash, n_docs, n_occurrences)``.

    Plan shape: spans leave each document as 8-byte ``xxhash64``
    fingerprints (the span text never enters an exchange), one
    distinct+count aggregation finds the repeated set, and occurrences
    re-attach via an equi-join on the fingerprint. Cost scales with
    tokens/stride, never pairs — the same inverted-index discipline as
    the shingle operators above.
    """
    if span_tokens < 1 or stride < 1:
        raise ValueError("span_tokens and stride must be >= 1")
    toks = df.select(
        F.col(id_col), F.expr(_guarded_toks_sql(text_col)).alias("__toks")
    )
    # window start positions 0, stride, 2·stride … while a full span fits
    pos_expr = F.expr(
        f"CASE WHEN size(__toks) >= {span_tokens} THEN "
        f"sequence(0, size(__toks) - {span_tokens}, {stride}) "
        f"ELSE array() END"
    )
    spans = (
        toks.select(F.col(id_col), F.explode(pos_expr).alias("token_start"), "__toks")
        .select(
            F.col(id_col),
            F.col("token_start").cast("long").alias("token_start"),
            F.xxhash64(
                F.array_join(
                    F.expr(f"slice(__toks, token_start + 1, {span_tokens})"), " "
                )
            ).alias("span_hash"),
        )
    )
    counts = (
        spans.groupBy("span_hash")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    return spans.join(counts, "span_hash").select(
        id_col, "token_start", "span_hash", "n_docs", "n_occurrences"
    )


def repeated_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 16,
    stride: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplication profile from :func:`repeated_spans`:
    ``(id, n_spans, n_repeated_spans, dup_span_ratio)`` — the standard
    quality gate input (a document mostly made of corpus-repeated spans
    is boilerplate or a near-copy even when no whole-document hash
    matches). Documents shorter than ``span_tokens`` report 0 spans and
    ratio 0.0.
    """
    toks = df.select(
        F.col(id_col), F.expr(_guarded_toks_sql(text_col)).alias("__toks")
    )
    n_spans = F.when(
        F.size("__toks") >= span_tokens,
        ((F.size("__toks") - span_tokens) / stride).cast("long") + 1,
    ).otherwise(F.lit(0))
    base = toks.select(F.col(id_col), n_spans.cast("long").alias("n_spans"))
    rep = (
        repeated_spans(df, text_col, id_col, span_tokens, stride, min_docs)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_repeated_spans"))
    )
    return base.join(rep, id_col, "left").select(
        id_col,
        "n_spans",
        F.coalesce("n_repeated_spans", F.lit(0)).cast("long").alias("n_repeated_spans"),
        F.when(
            F.col("n_spans") > 0,
            F.coalesce("n_repeated_spans", F.lit(0)) / F.col("n_spans"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_span_ratio"),
    )



def remove_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 16,
    stride: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Exact-substring deduplication: delete every occurrence of a
    cross-corpus repeated span EXCEPT its first, and rebuild the
    surviving text — the published remove-all-but-one-occurrence recipe
    for long duplicated substrings (cf. the train-data dedup result that
    repeated spans, not whole-document copies, dominate memorization;
    :func:`repeated_spans` is the detection half of the same pipeline).

    The kept occurrence per span is the globally smallest
    ``(id, token_start)`` — deterministic, partitioning-independent. A
    token at position ``t`` is removed iff some non-kept occurrence
    starts at ``s`` with ``s <= t < s + span_tokens``; maximal runs of
    surviving tokens become the pieces (whitespace-normalized rebuild
    from the lowercased token stream — the same convention as
    ``split_contaminated``, and the positions align because both sides
    share the trim/lower/whitespace tokenization). Returns one row per
    input document: ``(id, n_tokens, n_removed_tokens, n_spans_removed,
    pieces, n_pieces)``.

    Plan shape at 100 TB: span fingerprinting and counting are
    :func:`repeated_spans`'s inverted-index plan (8-byte hashes, never
    pairs); choosing keepers is a partial-aggregable ``min(struct(id,
    start))`` per span hash — NOT a ``row_number`` window, whose
    per-span-hash partition would drag all 10^8 occurrences of a hot
    boilerplate sentence through one unsplittable sort task — and the
    non-keepers fall out of one AQE-skew-splittable join back on the
    hash; the removal positions come back to each document via a single
    partial-aggregated ``collect_list`` shuffle; the cover test and
    piece rebuild are whole-stage-codegen array expressions. No Python
    anywhere.
    """
    occ = repeated_spans(df, text_col, id_col, span_tokens, stride, min_docs)
    keep = occ.groupBy("span_hash").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("token_start").alias("s")))
        .alias("__keep")
    )
    removals = (
        occ.join(keep, "span_hash")
        .filter(
            (F.col(id_col) != F.col("__keep.i"))
            | (F.col("token_start") != F.col("__keep.s"))
        )
        .groupBy(id_col)
        .agg(
            F.collect_list(F.col("token_start").cast("int")).alias("__hits"),
            F.count(F.lit(1)).alias("__n_rm"),
        )
    )
    staged = df.select(
        F.col(id_col), F.expr(_guarded_toks_sql(text_col)).alias("__toks")
    )
    joined = staged.join(removals, id_col, "left").select(
        F.col(id_col),
        "__toks",
        F.coalesce(F.col("__hits"), F.expr("cast(array() as array<int>)")).alias(
            "__hits"
        ),
        F.coalesce(F.col("__n_rm"), F.lit(0)).cast("long").alias("n_spans_removed"),
    )
    hi = span_tokens - 1
    removed_expr = (
        f"CASE WHEN size(__toks) = 0 THEN 0L ELSE "
        f"size(filter(sequence(0, size(__toks) - 1), "
        f"t -> exists(__hits, s -> t >= s AND t <= s + {hi}))) END"
    )
    pieces_expr = (
        "CASE WHEN size(__toks) = 0 THEN cast(array() as array<string>) ELSE "
        "filter("
        "split("
        f"array_join(transform(sequence(0, size(__toks) - 1), "
        f"t -> CASE WHEN exists(__hits, s -> t >= s AND t <= s + {hi}) "
        f"THEN '\\u0000' ELSE element_at(__toks, t + 1) END), ' '), "
        "'( ?\\u0000 ?)+'), "
        "p -> p != '') END"
    )
    return joined.select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.expr(removed_expr).cast("long").alias("n_removed_tokens"),
        "n_spans_removed",
        F.expr(pieces_expr).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces").cast("long"))

def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_clusters: int = 64,
    train_sample: int = 4096,
    kmeans_iters: int = 10,
    seed: int = 11,
    keep: str = "min_id",
    max_cluster_size: int = 100_000,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space with a spherical k-means coarse quantizer, then
    find duplicate GROUPS — connected components of cosine >= threshold —
    WITHIN each cluster only, and keep one survivor per group.

    Returns every input row as ``(id, cluster, group_id, is_survivor)``
    where ``group_id`` is the group's minimum member id (singletons are
    their own group and always survive).

    ``keep`` picks the survivor: ``"min_id"`` (deterministic and
    SQL-replayable — the oracle path) or ``"least_typical"`` (the
    published SemDeDup rule: keep the member with the LOWEST cosine to
    its cluster centroid — the most atypical example; ties fall back to
    min id).

    Scale shape: training is a bounded driver-side sample
    (:func:`~tape_spark.operators.similarity.train_spherical_kmeans`);
    assignment is one Arrow-batched matmul against the broadcast centroid
    matrix (narrow map); the ONLY shuffle is the groupBy on the cluster
    cell; the within-cluster pairwise pass is O(size²/2) numpy — bounded
    by ``max_cluster_size``: clusters over the cap are deterministically
    sub-split by id hash (``xxhash64(id) mod ceil(size/cap)``), trading
    recall ACROSS sub-cells of a mega-cluster for a hard cost bound, the
    same contract as ``max_bucket_size`` in the MinHash path. Pairwise
    similarity is computed in row blocks so the transient matrix stays
    ~tens of MB however large the cell. Like SemDeDup itself, a pair
    split across clusters is missed by design — the clustering IS the
    candidate generator.

    ``centroids`` lets a warehouse session pass a caller-owned
    ``(k, dim)`` L2-normalized centroid matrix (e.g. trained once with
    :func:`~tape_spark.operators.similarity.train_spherical_kmeans` and
    reused across iterative curation passes), skipping the bounded
    driver-side k-means train entirely — the same amortization pattern
    as ``minhash_near_duplicates(signatures=...)``.

    NULL vectors never reach the numeric kernels: they are split off
    up front and emitted as singleton survivors with ``cluster = -1``
    (no cosine is defined for a missing embedding, so they cannot be a
    duplicate of anything).
    """
    if keep not in ("min_id", "least_typical"):
        raise ValueError(f"keep must be min_id|least_typical, got {keep!r}")
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    from .similarity import train_spherical_kmeans

    null_rows = df.filter(F.col(vec_col).isNull()).select(
        F.col(id_col),
        F.lit(-1).cast("int").alias("cluster"),
        F.col(id_col).alias("group_id"),
        F.lit(True).alias("is_survivor"),
    )
    df = df.filter(F.col(vec_col).isNotNull())

    if centroids is None:
        centroids = train_spherical_kmeans(
            df, vec_col, id_col, num_clusters, train_sample, kmeans_iters, seed
        )
    else:
        centroids = np.asarray(centroids, dtype=np.float64)
        if centroids.ndim != 2:
            raise ValueError(
                f"centroids must be a (k, dim) matrix, got ndim={centroids.ndim}"
            )
    out_schema_empty = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("group_id", df.schema[id_col].dataType),
            T.StructField("is_survivor", T.BooleanType()),
        ]
    )
    if centroids.size == 0:  # no trainable vectors: only NULL singletons
        return df.sparkSession.createDataFrame(
            [], out_schema_empty
        ).unionByName(null_rows)
    cent_T = centroids.T.copy()

    @F.pandas_udf(T.IntegerType())
    def nearest_cluster(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # empty Arrow batch: np.array([]) is not 2-D
            return pd.Series([], dtype=np.int32)
        mat = np.array(vs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        return pd.Series((mat @ cent_T).argmax(axis=1).astype(np.int32))

    assigned = df.select(
        F.col(id_col), F.col(vec_col).alias("__v")
    ).withColumn("cluster", nearest_cluster(F.col("__v")))
    # deterministic sub-split of over-cap clusters: tiny (cluster -> size)
    # aggregate, broadcast back, id-hash cell within the cluster
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("__sz"))
    assigned = assigned.join(F.broadcast(sizes), "cluster").withColumn(
        "__cell",
        F.pmod(
            F.xxhash64(F.col(id_col)),
            F.ceil(F.col("__sz") / F.lit(max_cluster_size)).cast("long"),
        ).cast("int"),
    ).drop("__sz")

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("group_id", df.schema[id_col].dataType),
            T.StructField("is_survivor", T.BooleanType()),
        ]
    )
    least_typical = keep == "least_typical"

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:  # defensive: applyInPandas can hand empty frames
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=object),
                    "cluster": pd.Series([], dtype=np.int32),
                    "group_id": pd.Series([], dtype=object),
                    "is_survivor": pd.Series([], dtype=bool),
                }
            )
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.array(pdf["__v"].iloc[order].tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        n = len(ids)
        # Collect the >=threshold pairs blockwise (bounded transient sims
        # matrix), then resolve components with VECTORIZED min-label
        # propagation — a per-pair Python union-find loop measured ~100x
        # slower on clone-heavy cells (a 1000-member identical group alone
        # contributes ~500k pairs).
        block = max(1, 8_000_000 // max(1, n))  # ~64 MB transient per block
        prs, pcs = [], []
        for lo in range(0, n, block):
            sims = mat[lo : lo + block] @ mat.T
            rows, cols = np.nonzero(sims >= threshold)
            rows = rows + lo
            keep_mask = rows < cols
            prs.append(rows[keep_mask])
            pcs.append(cols[keep_mask])
        rows = np.concatenate(prs) if prs else np.empty(0, dtype=np.int64)
        cols = np.concatenate(pcs) if pcs else np.empty(0, dtype=np.int64)
        labels = np.arange(n)
        while True:
            new = labels.copy()
            # pull the smaller label across every edge, both directions
            np.minimum.at(new, rows, labels[cols])
            np.minimum.at(new, cols, labels[rows])
            new = new[new]  # pointer-jumping: labels are indices
            if np.array_equal(new, labels):
                break
            labels = new
        roots = labels
        group_id = ids[roots]
        if least_typical:
            cluster = int(pdf["cluster"].iloc[0])
            cos_c = mat @ centroids[cluster]
            survivor = np.zeros(n, dtype=bool)
            for g in np.unique(roots):
                members = np.nonzero(roots == g)[0]
                # lowest cosine to centroid; ties -> lowest id (members
                # are already in ascending-id order)
                survivor[members[np.argmin(cos_c[members])]] = True
        else:
            survivor = np.arange(n) == roots  # min-id member is its root
        out = pd.DataFrame(
            {
                id_col: ids,
                "cluster": np.full(n, int(pdf["cluster"].iloc[0]), dtype=np.int32),
                "group_id": group_id,
                "is_survivor": survivor,
            }
        )
        return out

    return assigned.groupBy("cluster", "__cell").applyInPandas(
        dedup_cell, out_schema
    ).unionByName(null_rows)

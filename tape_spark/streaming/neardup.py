"""Streaming near-duplicate detection against a persisted signature store.

The batch MinHash pipeline (``operators/dedup.py``) answers "which pairs
in THIS corpus are near-duplicates"; an ingestion pipeline asks the
incremental question instead: "is this ARRIVING document a near-dup of
anything already in the warehouse?" — the stream-static shape Structured
Streaming is built for. The static side is the corpus signature table
(a persisted :func:`tape_spark.operators.minhash_signatures` output —
the same table the batch pipeline materializes), the stream side
computes signatures per micro-batch with the identical seeded kernel,
and candidates come from the same banded equi-join: no all-pairs work,
no state store, append-mode safe.

Everything here is STATELESS per micro-batch (signature map → band
explode → stream-static join → codegen verify → first-agreeing-band
map-side dedup), so the output is an append stream of matched pairs —
aggregation-free by design: "which corpus doc did this new doc copy"
is per-pair information, and the caller picks the policy (drop on any
match, keep best match, route to review) downstream.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_minhash_matches(
    docs: DataFrame,
    signatures: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_id_col: str = "corpus_id",
    num_hashes: int = 64,
    shingle_n: int = 2,
    bands: int = 16,
    threshold: float = 0.5,
    broadcast_arrivals: "bool | None" = None,
) -> DataFrame:
    """Match arriving documents against a static corpus signature table.

    ``docs`` — a (streaming or batch) frame of ``(id_col, text_col)``;
    ``signatures`` — a STATIC ``(id, signature)`` frame built by
    :func:`tape_spark.operators.minhash_signatures` with the SAME
    ``num_hashes``/``shingle_n``/seed family (pass a table read back from
    the warehouse; persist it — every micro-batch joins against it). Its
    id column is renamed to ``corpus_id_col`` in the output.

    Returns ``(id_col, corpus_id_col, est_jaccard)``: one row per
    (arriving doc, corpus doc) pair that agrees in at least one LSH band
    AND whose estimated Jaccard (fraction of agreeing signature
    positions, the same unrolled codegen verify as the batch path) is at
    least ``threshold``. Works identically on a batch frame (the parity
    contract the tests pin); on a stream every stage is stateless, so
    the result appends with no watermark requirement.

    A mismatch between the stream kernel's signature length and the
    static table's is caught by one O(1) probe on the static side — the
    silent-empty-result failure mode of a num_hashes mismatch.

    ``broadcast_arrivals`` controls the join build side. The scale-
    critical property is that the STATIC entries (16 rows per corpus
    doc) must never shuffle per micro-batch — a 5 M-doc store is an
    80 M-row exchange every trigger. Broadcasting the (small) arriving
    batch's entries makes the static side a pure probe scan: one narrow
    pass over the persisted signature table per trigger, zero exchange.
    Default ``None`` broadcasts exactly when ``docs.isStreaming`` (a
    micro-batch is small by construction; a BATCH arrivals frame of
    unknown size is left to Catalyst/AQE). The streaming pin CANNOT be
    size-guarded per trigger — a stream-static join's plan is built once,
    before any batch exists — so bounding the micro-batch
    (``maxOffsetsPerTrigger`` / ``maxFilesPerTrigger``) is the caller's
    contract here; the ``foreachBatch`` store path
    (:func:`minhash_match_foreach_batch`) materializes each batch first
    and therefore enforces ``spark.tape.match.maxBroadcastBytes`` with
    exact row counts — use it when trigger sizes are untrusted.
    """
    if num_hashes % bands != 0:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    if id_col == corpus_id_col:
        raise ValueError(
            f"id_col and corpus_id_col are both {id_col!r}; the output pairs "
            "(arriving id, corpus id) would carry two identically-named "
            "columns — pass a distinct corpus_id_col"
        )
    # The stream kernel must match the stored table's SIGNATURE WIDTH: a
    # 32-bit store probed with 64-bit stream signatures compares int vs
    # long minima that are never equal — every est_jaccard reads 0 and the
    # result is silently empty (the sf100 probe caught exactly this).
    # The width is fully determined by the table's element type, so detect
    # it instead of trusting a parameter.
    from pyspark.sql import types as T

    elem = signatures.schema["signature"].dataType.elementType
    if isinstance(elem, T.IntegerType):
        signature_bits = 32
    elif isinstance(elem, T.LongType):
        signature_bits = 64
    else:
        raise ValueError(
            f"static signature element type {elem.simpleString()} is not a "
            "minhash_signatures output (expected int or bigint)"
        )
    probe = signatures.select(F.size("signature").alias("n")).first()
    if probe is not None and probe["n"] != num_hashes:
        raise ValueError(
            f"static signatures are {probe['n']}-hash but num_hashes="
            f"{num_hashes}; the stream kernel must match the stored table"
        )
    # the SAME banding / verify / first-agreeing-band kernel as the batch
    # path — shared helpers, not a hand-synchronized copy, so the
    # stream==batch parity contract cannot drift
    from ..operators.dedup import (
        _band_struct_expr,
        _est_jaccard,
        _first_agreeing_band,
        minhash_signatures,
    )

    # the store id column is resolved BY NAME (the one column that is not
    # 'signature') — taking columns[0] positionally would alias the
    # signature array itself to corpus_id on a (signature, id)-ordered
    # table and silently emit garbage matches
    other = [c for c in signatures.columns if c != "signature"]
    if len(other) != 1:
        raise ValueError(
            f"signatures must be an (id, signature) frame; got columns "
            f"{signatures.columns}"
        )
    rows_per_band = num_hashes // bands
    band_expr = _band_struct_expr(bands, rows_per_band)

    def _entries(sigs, idc, sig_alias, keep_band=False):
        # single hashed long join key (see lsh_candidate_pairs: 8-10x
        # faster joins than the two-column (band, bucket) key); `band`
        # kept only on the side the first-agreeing-band filter reads
        extra = [F.col("e.band").alias("band")] if keep_band else []
        return sigs.select(
            F.col(idc), F.col("signature").alias(sig_alias), F.explode(band_expr).alias("e")
        ).select(idc, sig_alias, *extra, F.xxhash64("e.band", "e.bucket").alias("__bk"))

    stream_sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, shingle_n=shingle_n,
        signature_bits=signature_bits,
    )
    s = _entries(stream_sigs, id_col, "__sig_s", keep_band=True)
    c = _entries(
        signatures.select(F.col(other[0]).alias(corpus_id_col), "signature"),
        corpus_id_col,
        "__sig_c",
    )
    if broadcast_arrivals is None:
        broadcast_arrivals = bool(docs.isStreaming)
    if broadcast_arrivals:
        s = F.broadcast(s)
    joined = s.join(c, on="__bk")
    est = _est_jaccard("__sig_s", "__sig_c", num_hashes)
    first_band = _first_agreeing_band("__sig_s", "__sig_c", bands, rows_per_band)
    return (
        joined.filter(F.col("band") == first_band)
        .select(id_col, corpus_id_col, est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Partitioned near-dup store: per-trigger cost tracks arrivals, not corpus.
#
# `stream_minhash_matches` above probes a caller-held signature FRAME — one
# pass over the WHOLE store per trigger, carrying every corpus signature
# through the banded join. That is the wrong asymptote for an incremental-
# ingest operator: at a 5 M-doc store the probe already paid 32–142 s per
# 50 k-doc trigger, and the cost grows with the corpus, not the arrivals.
#
# The persisted store applies the same fix as the BM25 inverted index
# (operators/retrieval.py: postings PARTITIONED BY pmod(xxhash64(term), B))
# and the IVFPQ index (codes PARTITIONED BY cluster), in a SLIM two-table
# layout:
#
#   path/entries/pbucket=N/  (corpus_id, band, bucket)   ~16 B/row
#   path/sigs/sbucket=M/     (corpus_id, signature)      the wide rows
#   path/meta/               kernel + partitioning params (one row)
#
# Slim, not fused: a fused store (signature denormalized onto each of the
# `bands` entries) makes every trigger's store scan read bands× the corpus
# signature bytes — at 5 M docs × 16 bands × 64 ints that is a ~20 GB scan
# per micro-batch. In the slim layout the per-trigger scan touches only the
# 16-byte entry rows; signatures are fetched ONCE PER CANDIDATE PAIR
# (∝ arrivals, since each arriving band-bucket collides with few store
# entries), via a second partition-pruned read of `sigs`.
#
# Partition pruning: each trigger collects the arriving batch's distinct
# pbucket keys (≤ num_entry_buckets values — one narrow eager job over the
# ARRIVALS) and pushes them as a partition IN-filter on the entries read;
# candidates' sbucket keys prune the signature read the same way. For
# small triggers (16·|batch| ≪ num_entry_buckets) the scan reads only the
# partitions the arrivals can match — cost ∝ arrivals × partition size,
# flat in corpus size when partitions are sized constant (grow the bucket
# counts with the corpus; see `minhash_save_store`). For large triggers
# the IN-set covers every partition and the floor is one narrow 16 B/row
# entries scan plus one signature-table scan — bands× less I/O than the
# frame-probe path, with the join sides still broadcast (the store never
# shuffles).
# ---------------------------------------------------------------------------


def _parse_size_bytes(v) -> int:
    """Parse a size conf value ('512m', '16g', '10485760b', plain bytes)."""
    s = str(v).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    for suf, m in (("k", 1024), ("m", 1024**2), ("g", 1024**3), ("t", 1024**4)):
        if s.endswith(suf):
            mult, s = m, s[:-1]
            break
    return int(float(s) * mult)


# conservative per-row overhead for a broadcast hashed relation beyond the
# column payload (key slot + row framing); used only for the guard's
# estimate, which works from EXACT row counts, not Catalyst size guesses
_BC_ROW_OVERHEAD = 32


def _dir_parquet_bytes(path: str) -> int:
    """Total on-disk parquet bytes under a (local) store table dir."""
    import os as _os

    total = 0
    for root, _, names in _os.walk(path):
        for f in names:
            if f.endswith(".parquet"):
                try:
                    total += _os.path.getsize(_os.path.join(root, f))
                except OSError:
                    pass
    return total


def _require_integral_id(df: DataFrame, id_col: str, where: str) -> None:
    """The store keys corpus ids as LONG (16-byte entry rows, xxhash64
    partition buckets). A non-integral id column would be cast to NULL
    silently — every join key NULL, every match query silently empty —
    so refuse it loudly (the bm25 index applies the same contract to
    doc ids)."""
    from pyspark.sql import types as T

    dt = df.schema[id_col].dataType
    if not isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"{where}: id column {id_col!r} has type {dt.simpleString()}; "
            "the near-dup store keys ids as long — cast or map to an "
            "integral id first (a string id would cast to NULL and every "
            "match would be silently empty)"
        )


def _entry_rows(sigs: DataFrame, id_col: str, bands: int, rows_per_band: int,
                num_entry_buckets: int) -> DataFrame:
    """Explode a signature frame into slim partitioned store entries."""
    from ..operators.dedup import _band_struct_expr

    return (
        sigs.select(F.col(id_col).cast("long").alias("corpus_id"), "signature")
        .select(
            "corpus_id",
            F.explode(_band_struct_expr(bands, rows_per_band)).alias("e"),
        )
        .select(
            "corpus_id",
            F.col("e.band").alias("band"),
            F.col("e.bucket").alias("bucket"),
            F.pmod(F.xxhash64("e.band", "e.bucket"), F.lit(num_entry_buckets))
            .cast("int")
            .alias("pbucket"),
        )
    )


def _sig_rows(sigs: DataFrame, id_col: str, num_sig_buckets: int) -> DataFrame:
    return sigs.select(
        F.col(id_col).cast("long").alias("corpus_id"),
        "signature",
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(num_sig_buckets))
        .cast("int")
        .alias("sbucket"),
    )


# ------------------------------------------------------------------ #
# Per-trigger matcher plan segments, built from memoized SQL FRAGMENTS
# applied via selectExpr/filter strings over the DataFrame API: the
# per-expression Column-API construction of the match plan was ~1.2k
# py4j round trips per trigger (~1 s of driver wall charged to EVERY
# trigger — r15 profile); fragment selectExpr calls cost one round trip
# per FRAME. Deliberately NOT a single parameterized spark.sql call:
# {frame} substitution goes through a temp view and SEVERS CACHE
# LINKAGE — the cross-trigger store cache's persisted frames were
# silently re-planned as fresh FileScans (measured r15, docs/SCALING.md
# round 15). The IN-lists vary per trigger and are inlined per call
# (pure-Python, ~µs) around the memoized expression kernels; semantics
# are locked by the stream==batch parity tests.
# ------------------------------------------------------------------ #


def _arr_entry_frame(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int,
    num_entry_buckets: int,
) -> DataFrame:
    """``_entry_rows`` + the ``__arr_id`` rename, two fragment selects."""
    from ..operators.dedup import _band_struct_sql, _qident

    qid = _qident(id_col)
    return sigs.selectExpr(
        f"cast({qid} AS BIGINT) AS __arr_id",
        f"explode({_band_struct_sql(bands, rows_per_band)}) AS __e",
    ).selectExpr(
        "__arr_id",
        "__e.band AS band",
        "__e.bucket AS bucket",
        f"cast(pmod(xxhash64(__e.band, __e.bucket), {int(num_entry_buckets)})"
        " AS INT) AS pbucket",
    )


def _cand_frame(
    arr_entries: DataFrame,
    entries_src: DataFrame,
    pbuckets,
    num_sig_buckets: int,
    broadcast_arrivals: bool = True,
) -> DataFrame:
    """Candidate probe: broadcast the arrivals' single-long-key band
    entries against the (pruned) store entries, dedup while 16 bytes
    wide, attach the sbucket prune key. The pbucket IN-prune is inlined
    (None for a caller-pre-filtered entries frame — the push_bucket_in
    path); ``F.broadcast`` pins the build side explicitly —
    ``broadcast_arrivals=False`` (the size-guard fallback) leaves the
    strategy to Catalyst, which shuffles both sides instead of building
    an oversized broadcast relation."""
    entries_k = entries_src
    if pbuckets is not None:
        entries_k = entries_k.filter(
            f"pbucket IN ({','.join(str(int(p)) for p in pbuckets)})"
        )
    entries_k = entries_k.selectExpr(
        "corpus_id", "xxhash64(band, bucket) AS __bk"
    )
    arr_k = arr_entries.selectExpr(
        "__arr_id", "xxhash64(band, bucket) AS __bk"
    )
    if broadcast_arrivals:
        arr_k = F.broadcast(arr_k)
    return (
        arr_k
        .join(entries_k, on="__bk")
        .select("__arr_id", "corpus_id")
        .distinct()
        .selectExpr(
            "__arr_id",
            "corpus_id",
            f"cast(pmod(xxhash64(corpus_id), {int(num_sig_buckets)}) AS INT)"
            " AS sbucket",
        )
    )


def _verify_frame(
    cand: DataFrame,
    sigs_src: DataFrame,
    arr_sigs: DataFrame,
    id_col: str,
    corpus_id_col: str,
    num_hashes: int,
    threshold: float,
    sbuckets,
    broadcast_cand: bool = True,
    broadcast_arr: bool = True,
) -> DataFrame:
    """The split-broadcast verify: the pruned store signatures stream
    once through the broadcast 16-byte candidates and the broadcast
    arrival signatures (``arr_sigs``: an (id, signature) frame), then
    the shared unrolled est_jaccard + threshold. The ``broadcast_*``
    flags are the size-guard fallbacks: when an exact row count says a
    build side would exceed ``spark.tape.match.maxBroadcastBytes``, the
    pin is dropped and Catalyst plans a shuffle join for that leg."""
    from ..operators.dedup import _est_jaccard_sql, _qident

    qid = _qident(id_col)
    store_sigs = sigs_src.filter(
        f"sbucket IN ({','.join(str(int(s)) for s in sbuckets)})"
    ).selectExpr("corpus_id", "signature AS __sig_c")
    arr_k = arr_sigs.selectExpr(
        f"cast({qid} AS BIGINT) AS __arr_id", "signature AS __sig_s"
    )
    est = _est_jaccard_sql("__sig_s", "__sig_c", num_hashes)
    cand_k = cand.select("__arr_id", "corpus_id")
    if broadcast_cand:
        cand_k = F.broadcast(cand_k)
    if broadcast_arr:
        arr_k = F.broadcast(arr_k)
    return (
        cand_k
        .join(store_sigs, on="corpus_id")
        .join(arr_k, on="__arr_id")
        .selectExpr(
            f"__arr_id AS {qid}",
            f"corpus_id AS {_qident(corpus_id_col)}",
            f"{est} AS est_jaccard",
        )
        .filter(f"est_jaccard >= CAST('{float(threshold)!r}' AS DOUBLE)")
    )



def _write_partitioned(df: DataFrame, part_col: str, sort_cols, path: str,
                       mode: str) -> None:
    from ..utils.io import write_partitioned_single_file

    write_partitioned_single_file(df, part_col, sort_cols, path, mode)


def minhash_save_store(
    signatures: DataFrame,
    path: str,
    *,
    bands: int = 16,
    num_entry_buckets: int = 64,
    num_sig_buckets: int = 32,
    shingle_n: int = 2,
    seed: int = 13,
) -> None:
    """Persist a corpus signature table as a partition-pruned near-dup
    store at ``path`` (layout and cost model in the module comment above).

    ``signatures`` is a :func:`tape_spark.operators.minhash_signatures`
    output (``(id, signature)``); the kernel parameters NOT recoverable
    from the table itself (``shingle_n``, ``seed``) must be declared here
    so queries rebuild the identical arriving-side kernel — the signature
    width and element type ARE detected from the table.

    Sizing rule: choose the bucket counts so one partition stays a
    constant read (tens of MB) as the corpus grows — e.g.
    ``num_entry_buckets ≈ bands·N·16 B / 32 MB`` — and grow them with
    :func:`minhash_rebucket_store` when the corpus outgrows the save-time
    choice. Scope of the claim (measured, docs/SCALING.md r12–r13): the
    pruned per-trigger read is (hit partitions) × (partition size), and
    the IN-set only excludes partitions for SMALL triggers — single-digit
    docs hit a strict subset of buckets; a 50 k-doc trigger's 16·|batch|
    band keys saturate any realistic bucket count (birthday bound), so
    its floor is one full scan of the narrow 16 B/row entries table —
    bands× less I/O than a signature-carrying probe, proportional to
    corpus size, amortized by constant partition size only in how many
    TASKS each partition costs, not in bytes.
    """
    from pyspark.sql import types as T

    if num_entry_buckets < 1 or num_sig_buckets < 1:
        raise ValueError("bucket counts must be >= 1")
    elem = signatures.schema["signature"].dataType.elementType
    if isinstance(elem, T.IntegerType):
        signature_bits = 32
    elif isinstance(elem, T.LongType):
        signature_bits = 64
    else:
        raise ValueError(
            f"signature element type {elem.simpleString()} is not a "
            "minhash_signatures output (expected int or bigint)"
        )
    other = [c for c in signatures.columns if c != "signature"]
    if len(other) != 1:
        raise ValueError(
            f"signatures must be an (id, signature) frame; got columns "
            f"{signatures.columns}"
        )
    _require_integral_id(signatures, other[0], "minhash_save_store")
    probe = signatures.select(F.size("signature").alias("n")).first()
    if probe is None:
        raise ValueError("cannot save an empty signature table as a store")
    num_hashes = int(probe["n"])
    if num_hashes % bands != 0:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    sigs = signatures.select(F.col(other[0]).alias("corpus_id"), "signature")
    _write_partitioned(
        _entry_rows(sigs, "corpus_id", bands, num_hashes // bands, num_entry_buckets),
        "pbucket", ["band", "bucket"], f"{path}/entries", "overwrite",
    )
    _write_partitioned(
        _sig_rows(sigs, "corpus_id", num_sig_buckets),
        "sbucket", ["corpus_id"], f"{path}/sigs", "overwrite",
    )
    spark = signatures.sparkSession
    meta = spark.createDataFrame(
        [(num_hashes, signature_bits, int(bands), int(num_entry_buckets),
          int(num_sig_buckets), int(shingle_n), int(seed))],
        "num_hashes int, signature_bits int, bands int, num_entry_buckets int, "
        "num_sig_buckets int, shingle_n int, seed int",
    )
    meta.write.mode("overwrite").parquet(f"{path}/meta")
    # a FULL rewrite leaves every table consistent with this meta, so it
    # also repairs a crashed rebucket — readmit readers
    from ..utils.io import clear_rebucket_sentinel

    clear_rebucket_sentinel(path)


# suggest_num_buckets constants, pinned to the r14 cold-store anchors
# (docs/SCALING.md round 14 "Store point lookup under the emulated cold
# store"): the 5 M-doc store (80 M entries) measured best at 320 buckets
# (250 k entries/bucket) for 8-doc point lookups and at 64 buckets
# (1.25 M entries/bucket) for coverage-saturating 100-doc triggers.
_POINT_ENTRIES_PER_BUCKET = 250_000
_SCAN_ENTRIES_PER_BUCKET = 1_250_000
_COVERAGE_TAU = 0.5


def suggest_num_buckets(
    num_docs: int,
    expected_trigger_docs: int,
    *,
    bands: int = 16,
) -> dict:
    """Apply the r14-measured coverage rule to pick ``num_entry_buckets``
    for a near-dup store (save-time, or :func:`minhash_rebucket_store`
    after the corpus grows).

    The rule (docs/SCALING.md round 14, ``cold_pointlookup*``): a trigger
    of ``d`` docs probes ``d·bands`` band keys; the expected fraction of
    the B entry partitions those keys cover is ``1 − (1−1/B)^(d·bands)``
    ≈ ``1 − e^(−d·bands/B)``. While coverage stays a strict subset
    (≤ ~50%), MORE buckets prune bytes — measured 3.0× fewer device bytes
    and ~2× wall at 8-doc lookups on 320 vs 64 buckets. Once the probe
    set covers every partition, more buckets only multiply FILES — 1.9×
    the requests and a 1.8× wall LOSS at 100-doc triggers in the
    request-dominated regime. So:

    - if a bucket count that de-saturates coverage (B ≥ keys/ln 2 for the
      50% target) is reachable at ~250 k entries/bucket (the measured
      point-lookup anchor), suggest that point-lookup sizing;
    - otherwise the trigger saturates any realistic count — suggest the
      scan sizing (~1.25 M entries/bucket, the measured 64-bucket
      anchor), bounded below at 8 so a store is never one giant file.

    Returns ``{"num_buckets", "regime", "expected_coverage", "probe_keys",
    "total_entries"}`` — ``expected_coverage`` is the covered-partition
    fraction AT the suggested count. Pure arithmetic, no jobs; pass the
    CURRENT corpus size (``num_docs``) and the typical trigger size.
    """
    import math

    if num_docs < 1 or expected_trigger_docs < 1 or bands < 1:
        raise ValueError(
            "num_docs, expected_trigger_docs and bands must all be >= 1"
        )
    total_entries = int(num_docs) * int(bands)
    probe_keys = int(expected_trigger_docs) * int(bands)
    # smallest B whose expected coverage is <= tau: 1 - e^(-keys/B) <= tau
    b_prune = math.ceil(probe_keys / math.log(1.0 / (1.0 - _COVERAGE_TAU)))
    b_point = max(8, math.ceil(total_entries / _POINT_ENTRIES_PER_BUCKET))
    if b_point >= b_prune:
        b, regime = max(b_point, b_prune), "point-lookup"
    else:
        b, regime = max(8, math.ceil(total_entries / _SCAN_ENTRIES_PER_BUCKET)), "scan-saturated"
    coverage = 1.0 - math.exp(-probe_keys / float(b))
    return {
        "num_buckets": int(b),
        "regime": regime,
        "expected_coverage": coverage,
        "probe_keys": probe_keys,
        "total_entries": total_entries,
    }


def suggest_num_buckets_for_store(
    spark, path: str, expected_trigger_docs: int
) -> dict:
    """:func:`suggest_num_buckets` for a SAVED store: reads ``bands`` from
    the store meta and sizes the corpus with one narrow count over the
    persisted signature table (metadata-only column pruning — no
    signature bytes move). Compare ``num_buckets`` against the meta's
    ``num_entry_buckets`` to decide whether a
    :func:`minhash_rebucket_store` is worth the rewrite."""
    meta = _load_store_meta(spark, path)
    n_docs = spark.read.parquet(f"{path}/sigs").select("corpus_id").count()
    out = suggest_num_buckets(
        n_docs, expected_trigger_docs, bands=meta["bands"]
    )
    out["current_num_buckets"] = meta["num_entry_buckets"]
    return out


def _load_store_meta(spark, path: str, _check_sentinel: bool = True) -> dict:
    from ..utils.io import recover_compact_swap

    if _check_sentinel:
        from ..utils.io import check_rebucket_sentinel

        check_rebucket_sentinel(path)
    # roll an interrupted meta swap forward (minhash_compact_store replaces
    # {path}/meta via atomic_replace_parquet) instead of raising path-missing
    recover_compact_swap(f"{path}/meta")
    rows = spark.read.parquet(f"{path}/meta").collect()
    metas = {tuple(r) for r in rows}
    if len(metas) != 1:
        raise ValueError(
            f"store at {path!r} has inconsistent meta rows: {sorted(metas)}"
        )
    return rows[0].asDict()


def _arrival_signatures(docs: DataFrame, meta: dict, text_col: str, id_col: str) -> DataFrame:
    from ..operators.dedup import minhash_signatures

    return minhash_signatures(
        docs,
        text_col=text_col,
        id_col=id_col,
        num_hashes=meta["num_hashes"],
        shingle_n=meta["shingle_n"],
        seed=meta["seed"],
        signature_bits=meta["signature_bits"],
    )


def _read_store_markers(spark, path: str) -> set:
    """Applied-batch ids from ``{path}/batches`` (empty if none yet).

    Repairs an interrupted marker-fold swap FIRST: ``minhash_compact_store``
    replaces ``{path}/batches`` via ``atomic_replace_parquet``, and a crash
    between its two renames leaves the live dir missing (data intact in the
    ``__compact_old``/``__compact_tmp`` siblings). Without the roll-forward
    the exists-check below would read that state as "no markers", so a
    retried append would double-insert its batch.
    """
    import os as _os

    from ..utils.io import recover_compact_swap

    recover_compact_swap(f"{path}/batches")
    if not _os.path.exists(f"{path}/batches"):
        return set()
    return {
        r["batch_id"] for r in spark.read.parquet(f"{path}/batches").collect()
    }


def minhash_append_store(
    new_docs: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_id: Optional[str] = None,
    _sigs: Optional[DataFrame] = None,
    _markers: Optional[set] = None,
    _meta: Optional[dict] = None,
) -> None:
    """Grow a saved store with NEW documents — the incremental-ingest
    verb. Signatures are built with the kernel parameters recorded in the
    store's meta (so they cannot drift from the stored corpus), split
    into slim entries and signature rows with the stored partition
    moduli, and appended.

    Caller contracts mirror ``bm25_append_index``: ids must be NEW
    (re-appending a doc makes it match itself on the next trigger), and
    without ``batch_id`` the two appends are not transactional (a
    failure between them needs a retry with the same batch — entries
    without signatures simply verify as no-match until the sigs append
    lands) and a fully retried append double-inserts.

    **Pass ``batch_id`` for exactly-once retries** (the streaming
    wrapper passes the micro-batch id automatically): a fully-applied
    batch — marker present in ``{path}/batches`` — is a no-op on retry,
    and a half-applied one lands via
    :func:`tape_spark.utils.io.append_partitioned_batch`, whose
    batch-tagged files a retry REPLACES instead of duplicating. Append
    order is still sigs before entries (an entries row whose signature
    is missing would surface candidates that verify against NULL), and
    the marker is written LAST.
    """
    _require_integral_id(new_docs, id_col, "minhash_append_store")
    spark = new_docs.sparkSession
    if batch_id is not None:
        # _markers: caller-held applied-id set (the foreachBatch wrapper
        # passes one) — skips the per-trigger {path}/batches read, whose
        # cost otherwise grows with the number of past triggers
        applied = (_markers if _markers is not None
                   else _read_store_markers(spark, path))
        if batch_id in applied:
            return  # fully applied; retry is a no-op
    # _meta: caller-held store meta (the foreachBatch wrapper passes its
    # cross-trigger copy) — meta is immutable between offline verbs, and
    # re-reading it per trigger is a measured ~0.3 s driver tax
    meta = _meta if _meta is not None else _load_store_meta(spark, path)
    sigs = _sigs
    if sigs is None:
        sigs = _arrival_signatures(new_docs, meta, text_col, id_col).select(
            F.col(id_col).alias("corpus_id"), "signature"
        )
    sig_part = _sig_rows(sigs, "corpus_id", meta["num_sig_buckets"])
    entry_part = _entry_rows(sigs, "corpus_id", meta["bands"],
                             meta["num_hashes"] // meta["bands"],
                             meta["num_entry_buckets"])
    if batch_id is not None:
        from ..utils.io import append_partitioned_batch

        append_partitioned_batch(sig_part, "sbucket", ["corpus_id"],
                                 f"{path}/sigs", batch_id)
        append_partitioned_batch(entry_part, "pbucket", ["band", "bucket"],
                                 f"{path}/entries", batch_id)
        spark.createDataFrame([(batch_id,)], "batch_id string").write.mode(
            "append"
        ).parquet(f"{path}/batches")
        if _markers is not None:
            _markers.add(batch_id)
        return
    # sigs first: an entries row whose signature row is missing would
    # produce candidates that verify against NULL (dropped pairs); a
    # signature row with no entries is simply unreachable until retry.
    _write_partitioned(sig_part, "sbucket", ["corpus_id"], f"{path}/sigs", "append")
    _write_partitioned(entry_part, "pbucket", ["band", "bucket"],
                       f"{path}/entries", "append")


def minhash_match_batch(
    docs: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_id_col: str = "corpus_id",
    threshold: float = 0.5,
    push_bucket_in: bool = False,
    _arrival_sigs: Optional[DataFrame] = None,
    _cleanup: Optional[list] = None,
    _meta: Optional[dict] = None,
    _store_entries: Optional[DataFrame] = None,
    _store_sigs: Optional[DataFrame] = None,
) -> DataFrame:
    """Match ONE batch of arriving documents against a saved store with
    partition pruning on both store reads.

    Three-phase plan, all store sides read-pruned and never shuffled
    (as long as the arrival-side broadcasts stay under
    ``spark.tape.match.maxBroadcastBytes``, default 512m — past that
    exact-row-count guard a leg falls back to a Catalyst shuffle join:
    slower, correct, bounded memory):

    1. The arrivals' band entries probe the ENTRIES table (pruned to the
       arrivals' ``pbucket`` IN-set, collected by one narrow eager job
       over the arrivals) via a broadcast equi-join on (band, bucket) —
       candidate pairs, deduped while still 16 bytes wide.
    2. Candidates are persisted (they are ∝ arrivals) and their distinct
       ``sbucket`` keys prune the SIGS read.
    3. The pruned signature rows stream ONCE through two small broadcast
       hash joins — the 16-byte candidate pairs, then the arrival
       signatures — and the shared unrolled verify + threshold run
       exactly as the batch path, so matches equal
       :func:`stream_minhash_matches` row-for-row. (r15: the r14 shape
       broadcast ``cand ⋈ arr_sigs`` — every candidate row carrying its
       full arrival signature, a broadcast ∝ candidates × sig width; the
       split keeps both broadcasts small — candidates are 16 B/row and
       the arrival signature table is ∝ the trigger alone.)

    ``_store_entries`` / ``_store_sigs`` (private, used by
    :func:`minhash_match_foreach_batch`'s cross-trigger cache) replace
    the per-trigger parquet reads of ``{path}/entries`` / ``{path}/sigs``
    with caller-held DataFrames of the same schemas; the pbucket/sbucket
    prune filters still apply (on a persisted frame they skip cached
    batches via min/max stats instead of parquet partitions).

    Each phase's plan is built from memoized SQL fragments applied via
    ``selectExpr``/``filter`` strings (``_arr_entry_frame`` /
    ``_cand_frame`` / ``_verify_frame``): the per-expression Column-API
    construction cost ~1.2 k py4j round trips — ~1 s of driver wall —
    per TRIGGER; fragments cost one round trip per frame. A single
    parameterized ``spark.sql(..., frame=...)`` call would be fewer
    still but severs cache linkage through its temp-view substitution —
    the cross-trigger store cache silently degraded to fresh parquet
    scans when tried (r15, docs/SCALING.md).

    Returns ``(id_col, corpus_id_col, est_jaccard)``. The candidate cache
    is ∝ arrivals and stays persisted until the returned frame is
    materialized; :func:`minhash_match_foreach_batch` manages that
    lifecycle per trigger — callers looping over many batches directly
    should ``spark.catalog.clearCache()`` or go through the wrapper.

    ``push_bucket_in=True`` is a DIAGNOSTIC flag, not a tuning knob —
    enabling it emits a ``UserWarning``. It pushes the arrivals' ``bucket``
    IN-set into the entries scan (the files are sorted by (band, bucket),
    so row groups that hold none of the probe buckets are page-skipped —
    500 000× fewer records read at point-lookup scale), but the r14 cold
    object-store emulation measured it wall-NEGATIVE in every regime
    tested (48–117 s vs 31–39 s plain at 100 docs, both
    bandwidth-dominated and request-dominated; no byte or request
    reduction — docs/SCALING.md round 14) and neutral-to-negative warm:
    the pushed-filter evaluation costs more than the narrow scan it
    saves. It stays available to measure records-read effects on other
    storage stacks. Safety when enabled: the set is pushed in chunks of
    ``filter_in_chunked``'s default (≤200 literals — a 4× margin under
    the lowest observed parquet filter-evaluator StackOverflow at ~900),
    and the probe-pair collect is bounded by
    ``spark.tape.match.maxPushedBuckets`` (default 10 000 pairs) — past
    the bound the scan falls back to pbucket-only pruning (whose collect
    is bounded at ≤ ``num_entry_buckets`` values) instead of growing the
    driver set with the trigger.
    """
    if id_col == corpus_id_col:
        raise ValueError(
            f"id_col and corpus_id_col are both {id_col!r}; pass a distinct "
            "corpus_id_col"
        )
    _require_integral_id(docs, id_col, "minhash_match_batch")
    spark = docs.sparkSession
    # _meta lets the foreachBatch wrapper load the store meta ONCE per
    # trigger instead of twice (each load is a driver-side parquet read)
    meta = _meta if _meta is not None else _load_store_meta(spark, path)
    num_hashes = meta["num_hashes"]
    bands = meta["bands"]
    sigs = _arrival_sigs
    if sigs is None:
        sigs = _arrival_signatures(docs, meta, text_col, id_col)
    arr_entries = _arr_entry_frame(
        sigs, id_col, bands, num_hashes // bands, meta["num_entry_buckets"]
    )
    empty_schema = f"{id_col} long, {corpus_id_col} long, est_jaccard double"
    # phase 1 eager job: the arrivals' partition IN-set AND entry count in
    # ONE partial-aggregated job (≤ num_entry_buckets result rows; the job
    # scans the ARRIVALS only, never the store). The count feeds the
    # broadcast size guard below at zero extra jobs.
    pbucket_rows = (
        arr_entries.groupBy("pbucket").agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    pbuckets = sorted(int(r["pbucket"]) for r in pbucket_rows)
    n_arr_entries = sum(int(r["__n"]) for r in pbucket_rows)
    probe_buckets = None
    if push_bucket_in:
        import warnings

        warnings.warn(
            "push_bucket_in=True is a diagnostic flag: the r14 cold-store "
            "emulation measured it wall-negative in every regime tested "
            "(48-117 s vs 31-39 s plain at 100 docs; no byte or request "
            "reduction - docs/SCALING.md round 14). Leave it off unless "
            "you are measuring records-read effects on your storage stack.",
            UserWarning,
            stacklevel=2,
        )
        # bounded probe-pair collect: a huge trigger's distinct
        # (pbucket, bucket) set is O(arrivals x bands) and would otherwise
        # grow the driver set without limit; past the cap fall back to
        # pbucket-only pruning (collect bounded at <= num_entry_buckets)
        max_push = int(
            spark.conf.get("spark.tape.match.maxPushedBuckets", "10000")
        )
        keys = (
            arr_entries.select("pbucket", "bucket").distinct()
            .limit(max_push + 1).collect()
        )
        if len(keys) <= max_push:
            probe_buckets = sorted({int(r["bucket"]) for r in keys})
        # truncated collect -> fall back to pbucket-only pruning (the
        # complete IN-set already came from the count job above)
    if not pbuckets:
        return spark.createDataFrame([], empty_schema)
    # Broadcast size guard: the three pinned build sides below are all
    # ∝ the ARRIVING batch, bounded by the micro-batch contract — but a
    # pathological trigger (huge batch × wide signatures) must degrade,
    # not OOM the driver. Row counts here are EXACT (the entries count
    # rides the phase-1 job; candidates are counted with their sbucket
    # job), so the estimate is rows × payload + a fixed per-row overhead,
    # compared against spark.tape.match.maxBroadcastBytes (default 512m —
    # guide §3.1's "a few hundred MB is usually fine"; deliberately NOT
    # spark.sql.autoBroadcastJoinThreshold, whose 10 MB default governs
    # ESTIMATE-based auto decisions and would demote the measured
    # 50 k-doc anchor triggers ~15 MB sig broadcasts that are the design).
    # Past the cap the pin is dropped for that leg and Catalyst plans a
    # shuffle join — slower, correct, bounded memory.
    cap = _parse_size_bytes(
        spark.conf.get("spark.tape.match.maxBroadcastBytes", "512m")
    )
    n_arr = n_arr_entries // max(1, bands)
    sig_bytes = num_hashes * (4 if meta["signature_bits"] == 32 else 8)
    bc_entries = n_arr_entries * (16 + _BC_ROW_OVERHEAD) <= cap
    bc_arr_sigs = n_arr * (8 + sig_bytes + _BC_ROW_OVERHEAD) <= cap
    if not (bc_entries and bc_arr_sigs):
        import warnings

        warnings.warn(
            f"minhash_match_batch: arriving batch (~{n_arr} docs) exceeds "
            "spark.tape.match.maxBroadcastBytes "
            f"({cap} B) on the "
            f"{'entries' if not bc_entries else 'signature'} build side; "
            "falling back to a shuffle join for that leg (correct, slower "
            "- consider smaller triggers via maxFilesPerTrigger/"
            "maxOffsetsPerTrigger, or raise the cap)",
            stacklevel=2,
        )
    entries_src = (
        _store_entries
        if _store_entries is not None
        else spark.read.parquet(f"{path}/entries")
    )
    # the pbucket IN-prune is inlined in the candidate SQL (below); the
    # diagnostic push path pre-applies its chunked bucket filter here and
    # the SQL then takes the frame as-is
    in_pbuckets = pbuckets
    if probe_buckets is not None:
        from ..utils.io import filter_in_chunked

        entries_src = filter_in_chunked(
            entries_src.filter(F.col("pbucket").isin(pbuckets)),
            "bucket",
            probe_buckets,
        )
        in_pbuckets = None
    # candidate probe on the single hashed long join key — Spark's
    # long-key hashed relation probes the 80M-row entries side 8-10x
    # faster than the two-column (band, bucket) key (r14,
    # docs/SCALING.md); a cross-band hash collision adds a candidate at
    # ~2^-64, removed by the verify
    cand = _cand_frame(
        arr_entries, entries_src, in_pbuckets, meta["num_sig_buckets"],
        broadcast_arrivals=bc_entries,
    ).persist()
    if _cleanup is not None:
        _cleanup.append(cand)
    # phase 2 eager job: candidates' sbucket IN-set + exact count in one
    # partial-aggregated job (materializes the cache; feeds the guard)
    sbucket_rows = (
        cand.groupBy("sbucket").agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    sbuckets = sorted(int(r["sbucket"]) for r in sbucket_rows)
    n_cand = sum(int(r["__n"]) for r in sbucket_rows)
    if not sbuckets:
        cand.unpersist()
        return spark.createDataFrame([], empty_schema)
    bc_cand = n_cand * (16 + _BC_ROW_OVERHEAD) <= cap
    sigs_src = (
        _store_sigs if _store_sigs is not None else spark.read.parquet(f"{path}/sigs")
    )
    # two SMALL broadcasts instead of one candidate×sig-width broadcast:
    # the store side streams once through both hash joins inside one
    # codegen stage, and only the ~|candidates| surviving rows ever carry
    # signature payloads through an operator boundary
    return _verify_frame(
        cand, sigs_src, sigs, id_col, corpus_id_col, num_hashes, threshold,
        sbuckets, broadcast_cand=bc_cand, broadcast_arr=bc_arr_sigs,
    )


def minhash_match_foreach_batch(
    path: str,
    sink: Callable[[DataFrame, int], None],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_id_col: str = "corpus_id",
    threshold: float = 0.5,
    append_arrivals: bool = False,
    cache_store: bool = True,
    cache_refresh_deltas: int = 32,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function for streaming near-dup against
    a partition-pruned store::

        q = (docs.writeStream
             .foreachBatch(minhash_match_foreach_batch(store, my_sink))
             .start())

    Per trigger: the arriving batch's signatures are computed ONCE and
    persisted (bounded — one row per arriving doc), the pruned
    :func:`minhash_match_batch` plan is handed to ``sink(matches,
    batch_id)`` (which must materialize it — write/collect), and with
    ``append_arrivals=True`` the batch is then appended to the store so
    later triggers match against it — the full incremental-ingest loop.
    Per-trigger caches are released after the sink returns.

    ``cache_store=True`` (default, r15) persists the store's entries and
    sigs tables ACROSS triggers (``MEMORY_AND_DISK`` — the closure is the
    store's sole appender by the streaming contract, so the cache cannot
    go stale): the per-trigger parquet scan + array decode of the whole
    signature table — the r14 trigger decomposition's dominant term (46 s
    of 73 s executor at the 50 k-doc/5 M-store anchor) — is paid once,
    and later triggers probe cached columnar batches (the pbucket/sbucket
    prunes skip batches via min/max stats). With ``append_arrivals`` each
    trigger's appended rows join the cache as eagerly-checkpointed DELTA
    frames (∝ trigger size; ``localCheckpoint`` cuts their lineage to the
    expired micro-batch source); after ``cache_refresh_deltas`` deltas
    the union is folded by re-reading the store fresh, bounding plan
    width. Sizing: the cache holds bands×16 B + sig-width bytes per
    corpus doc per executor-cluster — at 1 KB/doc signatures, a 5 B-doc
    corpus caches ~5 TB across a 1000-executor cluster (~5 GB each),
    spilling to local disk past memory, which still beats re-reading the
    remote store every trigger. A store whose DECODED size estimate
    (on-disk parquet bytes × ``spark.tape.match.cacheDecodeFactor``,
    default 4) exceeds ``spark.tape.match.maxCachedStoreBytes`` (default
    16g; 0 = no ceiling) degrades to scan-per-trigger with a warning
    instead of OOM-thrashing a single-host user — re-evaluated at every
    cache (re)build, so append growth past the cap degrades at the next
    delta fold. The build is NOT free, but it is one
    extra pass, not a cliff: re-measured at a from-scratch rebuild of
    the 5 M-doc store (docs/SCALING.md round 15 ``decompose``; the first
    ``cache_build`` numbers were ~5x steal-inflated), materializing both
    tables costs ~550 s executor / ~20 s best-case wall — ≈ 3.8x a plain
    scan of the same rows — against ~25–50 s executor (~4–6 s wall)
    saved per trigger: break-even ≈ 10–20 triggers on the executor
    basis, ≈ 3–5 on walls. Set ``cache_store=False`` to restore the
    scan-per-trigger behavior (streams that won't outlive a handful of
    triggers, or many independent short-lived streams against one
    store).

    ``foreachBatch`` (not a stream-static join) is what makes the pruning
    possible: partition IN-filters need the batch's key set, which only
    exists once the micro-batch is materialized.
    """

    # cross-trigger state: applied-marker cache (loaded from
    # {path}/batches ONCE — without it every trigger re-lists a marker
    # dir that grows one file per past trigger) + the persisted store
    # tables and their per-append delta frames
    _marker_state: dict = {"applied": None}
    _store_cache: dict = {"base_entries": None, "base_sigs": None, "deltas": []}

    def _release_store_cache() -> None:
        for f in (_store_cache["base_entries"], _store_cache["base_sigs"]):
            if f is not None:
                f.unpersist()
        _store_cache["base_entries"] = None
        _store_cache["base_sigs"] = None
        # localCheckpoint blocks are freed when the frames are collected;
        # dropping the references is the release
        _store_cache["deltas"] = []

    def _cached_store(spark):
        from pyspark import StorageLevel

        from ..utils.io import read_parquet_snapshot

        if _store_cache["base_entries"] is None:
            # Memory ceiling: the cache holds the WHOLE store decoded
            # (entries + signatures) at MEMORY_AND_DISK; a store that
            # outgrew the host would OOM-thrash a single-machine user
            # before the spill saves them. Estimate from on-disk parquet
            # bytes × a decode factor (columnar decode + JVM object
            # overhead; conf spark.tape.match.cacheDecodeFactor, default
            # 4) against spark.tape.match.maxCachedStoreBytes (default
            # 16g; 0 disables the ceiling). Past the cap, degrade to the
            # cache_store=False behavior — scan-per-trigger, bounded
            # memory — with a warning naming the estimate. Re-evaluated
            # on every cache (re)build, so a store grown past the cap by
            # appends degrades at the next delta fold.
            cap = _parse_size_bytes(
                spark.conf.get("spark.tape.match.maxCachedStoreBytes", "16g")
            )
            factor = float(
                spark.conf.get("spark.tape.match.cacheDecodeFactor", "4")
            )
            est = int(
                (_dir_parquet_bytes(f"{path}/entries")
                 + _dir_parquet_bytes(f"{path}/sigs")) * factor
            )
            if cap > 0 and est > cap:
                if not _store_cache.get("over_cap_warned"):
                    import warnings

                    warnings.warn(
                        f"cache_store: store at {path!r} estimates to "
                        f"~{est} B decoded (> "
                        f"spark.tape.match.maxCachedStoreBytes={cap} B); "
                        "degrading to scan-per-trigger (cache_store=False "
                        "behavior). Raise the cap, shrink the store, or "
                        "set the conf to 0 to disable the ceiling.",
                        stacklevel=2,
                    )
                    _store_cache["over_cap_warned"] = True
                return None, None
            # snapshot reads (explicit file lists), NOT dir reads: a
            # persisted dir-rooted read would be cache-substituted into
            # every later read of the dir and serve STALE data after
            # appends (see read_parquet_snapshot)
            _store_cache["base_entries"] = read_parquet_snapshot(
                spark, f"{path}/entries"
            ).persist(StorageLevel.MEMORY_AND_DISK)
            _store_cache["base_sigs"] = read_parquet_snapshot(
                spark, f"{path}/sigs"
            ).persist(StorageLevel.MEMORY_AND_DISK)
        entries = _store_cache["base_entries"]
        sigs_t = _store_cache["base_sigs"]
        for d_entries, d_sigs in _store_cache["deltas"]:
            entries = entries.unionByName(d_entries)
            sigs_t = sigs_t.unionByName(d_sigs)
        return entries, sigs_t

    def _fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # meta is written once at save time and immutable under this
        # closure's sole-appender contract (appends never touch it;
        # rebucket/compact are offline verbs that refuse while a stream
        # holds the store) — loading it per trigger was a measured
        # ~0.3 s of driver-side parquet read + rebucket-sentinel check
        # charged to EVERY trigger (r15 profile)
        if _marker_state.get("meta") is None:
            _marker_state["meta"] = _load_store_meta(spark, path)
        meta = _marker_state["meta"]
        sigs = _arrival_signatures(batch, meta, text_col, id_col).persist()
        caches = [sigs]
        store_entries = store_sigs = None
        if cache_store:
            store_entries, store_sigs = _cached_store(spark)
        try:
            matches = minhash_match_batch(
                batch,
                path,
                text_col=text_col,
                id_col=id_col,
                corpus_id_col=corpus_id_col,
                threshold=threshold,
                _arrival_sigs=sigs,
                _cleanup=caches,
                _meta=meta,
                _store_entries=store_entries,
                _store_sigs=store_sigs,
            )
            sink(matches, batch_id)
            if append_arrivals:
                # keyed by Spark's micro-batch id: on restart-and-replay
                # of an uncommitted trigger the append REPLACES its
                # earlier partial files (exactly-once store growth); a
                # fully-applied batch's replay is a marker-checked no-op.
                # The SINK's replay exposure stays the caller's contract,
                # as foreachBatch documents.
                if _marker_state["applied"] is None:
                    _marker_state["applied"] = _read_store_markers(spark, path)
                already_applied = f"sb{batch_id}" in _marker_state["applied"]
                corpus_sigs = sigs.select(
                    F.col(id_col).alias("corpus_id"), "signature"
                )
                minhash_append_store(
                    batch, path, text_col=text_col, id_col=id_col,
                    batch_id=f"sb{batch_id}",
                    _sigs=corpus_sigs,
                    _markers=_marker_state["applied"],
                    _meta=meta,
                )
                if cache_store and store_entries is not None and not already_applied:
                    # mirror the append into the cache as delta frames:
                    # the SAME _sig_rows/_entry_rows expressions the
                    # append wrote, eagerly checkpointed so their lineage
                    # does not reference this trigger's expired source
                    d_sigs = _sig_rows(
                        corpus_sigs, "corpus_id", meta["num_sig_buckets"]
                    ).localCheckpoint(eager=True)
                    d_entries = _entry_rows(
                        corpus_sigs, "corpus_id", meta["bands"],
                        meta["num_hashes"] // meta["bands"],
                        meta["num_entry_buckets"],
                    ).localCheckpoint(eager=True)
                    _store_cache["deltas"].append((d_entries, d_sigs))
                    if len(_store_cache["deltas"]) > cache_refresh_deltas:
                        # fold: the store dir now holds every append —
                        # re-read fresh instead of growing the union plan
                        _release_store_cache()
        finally:
            for frame in caches:
                frame.unpersist()

    return _fn


def minhash_rebucket_store(
    spark,
    path: str,
    *,
    num_entry_buckets: Optional[int] = None,
    num_sig_buckets: Optional[int] = None,
) -> dict:
    """Rewrite a saved store with NEW partition bucket counts — the verb
    that makes :func:`minhash_save_store`'s sizing rule actionable as the
    corpus grows. The rule keeps one partition a constant read
    (``num_entry_buckets ≈ bands·N·16 B / 32 MB``); without this verb the
    moduli are frozen at save time, so a store that grew 5× since its
    save carries 5×-oversized partitions and the pruned per-trigger read
    grows with it. Entries are recomputed from the persisted signatures
    (band/bucket values are signature-derived and unchanged — only the
    partition assignment moves), so matches are bit-identical before and
    after (asserted in tests); meta is swapped atomically last.

    Returns the old and new bucket counts. Refuses (like compaction)
    while a batch append is half-applied.

    OFFLINE verb: unlike compaction (row-preserving, readers see the
    same rows mid-swap), rebucketing changes the pruning moduli — between
    a table swap and the final meta swap, a concurrent match would
    compute partition IN-sets with the old modulus against the new
    layout and silently MISS matches. The verb drops a
    ``__rebucket_inprogress`` sentinel before the first swap and removes
    it after the meta swap; every load/match/append/compact path RAISES
    while it exists, so both the live window and a crash inside it fail
    loudly instead of silently missing matches. Repair a crashed run by
    RE-RUNNING the verb with the same arguments (it recomputes both
    tables from the signatures, which are the durable source of truth —
    the stale ``sbucket`` column in a half-swapped sigs table is ignored
    on read), which clears the sentinel on success."""
    # bypass the sentinel gate: re-running THIS verb is the documented
    # repair for a crashed rebucket
    meta = _load_store_meta(spark, path, _check_sentinel=False)
    new_eb = int(num_entry_buckets or meta["num_entry_buckets"])
    new_sb = int(num_sig_buckets or meta["num_sig_buckets"])
    if new_eb < 1 or new_sb < 1:
        raise ValueError("bucket counts must be >= 1")
    from ..utils.io import (
        atomic_replace_parquet,
        list_batch_file_ids,
        recover_compact_swap,
        write_partitioned_single_file,
    )

    tagged = list_batch_file_ids(f"{path}/entries") | list_batch_file_ids(
        f"{path}/sigs"
    )
    pending = sorted(tagged - _read_store_markers(spark, path))
    if pending:
        raise ValueError(
            f"store at {path!r} has half-applied append batches {pending}; "
            "retry minhash_append_store with the same batch_id first, then "
            "rebucket"
        )
    import os as _os
    import shutil as _shutil

    from ..utils.io import clear_rebucket_sentinel, write_rebucket_sentinel

    sigs = spark.read.parquet(f"{path}/sigs").select("corpus_id", "signature")
    # sentinel BEFORE the first swap: readers fail loudly during the
    # inconsistent window (and after a crash inside it)
    write_rebucket_sentinel(path)
    # write both rewritten tables fully to tmp dirs, then swap each with
    # the same recoverable rename convention compaction uses
    for table, frame, part_col, sort_cols in (
        (
            "entries",
            _entry_rows(sigs, "corpus_id", meta["bands"],
                        meta["num_hashes"] // meta["bands"], new_eb),
            "pbucket",
            ["band", "bucket"],
        ),
        ("sigs", _sig_rows(sigs, "corpus_id", new_sb), "sbucket", ["corpus_id"]),
    ):
        live = f"{path}/{table}"
        recover_compact_swap(live)
        tmp = live + "__compact_tmp"
        write_partitioned_single_file(frame, part_col, sort_cols, tmp, "overwrite")
        old = live + "__compact_old"
        _os.rename(live, old)
        _os.rename(tmp, live)
        _shutil.rmtree(old)
    new_meta = spark.createDataFrame(
        [(meta["num_hashes"], meta["signature_bits"], meta["bands"], new_eb,
          new_sb, meta["shingle_n"], meta["seed"])],
        "num_hashes int, signature_bits int, bands int, num_entry_buckets int, "
        "num_sig_buckets int, shingle_n int, seed int",
    )
    atomic_replace_parquet(new_meta, f"{path}/meta")
    # meta now matches the layout everywhere — safe to readmit readers
    clear_rebucket_sentinel(path)
    return {
        "num_entry_buckets": (meta["num_entry_buckets"], new_eb),
        "num_sig_buckets": (meta["num_sig_buckets"], new_sb),
    }


def minhash_compact_store(spark, path: str) -> dict:
    """Compact a near-dup store after appends: every
    :func:`minhash_append_store` / ``append_arrivals`` trigger adds one
    file per touched partition on BOTH tables, and a pruned match then
    opens every generation's footers. Rewrites entries as one file per
    ``pbucket`` (sorted by (band, bucket) — the probe keys — for
    row-group locality) and signatures as one file per ``sbucket``.
    Matches are bit-identical before/after (pure row unions; asserted in
    tests). Returns the per-table file counts removed.

    Refuses to run while a ``batch_id`` append is HALF-APPLIED (batch-
    tagged data files present with no marker in ``{path}/batches``):
    rewriting would erase the file tags the batch's retry uses to
    replace-instead-of-duplicate. Retry the append first, then compact.
    Markers of applied batches are preserved — FOLDED into one file (the
    marker dir otherwise grows one single-row file per past trigger and
    every marker read lists/opens them all) — so their retries stay
    no-ops after compaction."""
    from ..utils.io import (
        atomic_replace_parquet,
        check_rebucket_sentinel,
        compact_partitioned_parquet,
        list_batch_file_ids,
    )

    check_rebucket_sentinel(path)
    tagged = list_batch_file_ids(f"{path}/entries") | list_batch_file_ids(
        f"{path}/sigs"
    )
    pending = sorted(tagged - _read_store_markers(spark, path))
    if pending:
        raise ValueError(
            f"store at {path!r} has half-applied append batches {pending} "
            "(batch-tagged files, no completion marker): compacting now "
            "would erase the tags their retries replace. Retry "
            "minhash_append_store with the same batch_id first."
        )
    n_entries = compact_partitioned_parquet(
        spark, f"{path}/entries", "pbucket", sort_cols=["band", "bucket"]
    )
    n_sigs = compact_partitioned_parquet(
        spark, f"{path}/sigs", "sbucket", sort_cols=["corpus_id"]
    )
    # fold the one-file-per-trigger marker dir (ids preserved exactly —
    # retries of applied batches remain no-ops)
    import os as _os

    n_markers = 0
    if _os.path.exists(f"{path}/batches"):
        markers = spark.createDataFrame(
            [(b,) for b in sorted(_read_store_markers(spark, path))],
            "batch_id string",
        ).coalesce(1)
        n_markers = sum(
            1 for f in _os.listdir(f"{path}/batches") if f.endswith(".parquet")
        )
        atomic_replace_parquet(markers, f"{path}/batches")
    return {
        "entries_files_before": n_entries,
        "sigs_files_before": n_sigs,
        "marker_files_before": n_markers,
    }

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
    unknown size is left to Catalyst/AQE).
    """
    if num_hashes % bands != 0:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
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
        _position_agreements,
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

    def _entries(sigs, idc, sig_alias):
        return sigs.select(
            F.col(idc), F.col("signature").alias(sig_alias), F.explode(band_expr).alias("e")
        ).select(idc, sig_alias, F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket"))

    stream_sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, shingle_n=shingle_n,
        signature_bits=signature_bits,
    )
    s = _entries(stream_sigs, id_col, "__sig_s")
    c = _entries(
        signatures.select(F.col(other[0]).alias(corpus_id_col), "signature"),
        corpus_id_col,
        "__sig_c",
    )
    if broadcast_arrivals is None:
        broadcast_arrivals = bool(docs.isStreaming)
    if broadcast_arrivals:
        s = F.broadcast(s)
    joined = s.join(c, on=["band", "bucket"])
    pos_eq = _position_agreements("__sig_s", "__sig_c", num_hashes)
    est = _est_jaccard(pos_eq, num_hashes)
    first_band = _first_agreeing_band(pos_eq, bands, rows_per_band)
    return (
        joined.filter(F.col("band") == first_band)
        .select(id_col, corpus_id_col, est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )

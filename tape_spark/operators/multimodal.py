"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED — the container has no image/audio libraries —
behind ``DECODERS``: the default "fake" decoder is deterministic (metadata
derived from the bytes), so the Spark-side plumbing (schema, batching,
partition sizing) is real and testable; swapping in a real decoder (PIL,
torchaudio, ...) is a one-function change at the worker.

Design for 100 TB of media: binary payloads stay columnar (parquet binary
with dictionary off), metadata columns travel beside them so filters
(e.g. ``width >= 256``) prune *before* any decode; ``mapInPandas``
streams Arrow batches so a partition never fully materializes in Python.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode.

    Derives (width, height, channels) and an 8-dim "feature" from the raw
    bytes so tests are reproducible. Replace with a real decoder
    (``PIL.Image.open(io.BytesIO(payload))`` etc.) in production.
    """
    n = len(payload)
    head = payload[:64]
    return {
        "width": 1 + (n % 1024),
        "height": 1 + (sum(head) % 1024 if head else 0),
        "channels": 3,
        "feature": [float((b % 13)) / 13.0 for b in head[:8]] + [0.0] * max(0, 8 - len(head[:8])),
    }


def _unimplemented_decode(payload: bytes) -> dict:
    raise NotImplementedError(
        "Real media decoding requires an image/audio library not present in "
        "this environment; register one in DECODERS."
    )


DECODERS: Dict[str, Callable[[bytes], dict]] = {
    "fake": _fake_decode,
    "real": _unimplemented_decode,
}


def attach_binary_payload(
    df: DataFrame,
    content_col: str,
    id_col: str,
    media_type: str = "blob",
) -> DataFrame:
    """Package a column as an opaque binary payload with typed metadata.

    Produces the canonical media schema: (media_id, payload, media_type,
    n_bytes, checksum). ``n_bytes``/``checksum`` are built-in expressions
    over the binary — no Python.
    """
    payload = F.col(content_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
    )


def decode_media(df: DataFrame, decoder: str = "fake", batch_limit: int = 256) -> DataFrame:
    """Decode / feature-extract media payloads via ``mapInPandas``.

    Streams Arrow batches; each batch decodes row-by-row in the worker
    (decoding is inherently per-item) but transfers columnar. The decoder
    is looked up in ``DECODERS`` — ``'fake'`` (deterministic stub) by
    default, ``'real'`` raises ``NotImplementedError`` until a library is
    registered.
    """
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # column-wise zip, not iterrows — per-row Series construction
            # dominates otherwise
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                meta = decode(bytes(payload) if payload is not None else b"")
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "width": meta["width"],
                        "height": meta["height"],
                        "channels": meta["channels"],
                        "feature": meta["feature"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return df.mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resample: truncate/tile the bytes
    to width*height (capped). A real implementation decodes, resamples,
    re-encodes; the Spark-side contract (binary in → binary out, bounded
    size) is identical."""
    target = min(width * height, 1 << 16)
    if not payload:
        return b"\x00" * target
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


def _unimplemented_resize(payload: bytes, width: int, height: int) -> bytes:
    raise NotImplementedError(
        "Real media resizing requires an image library not present in this "
        "environment; register one in RESIZERS."
    )


RESIZERS: Dict[str, Callable[[bytes, int, int], bytes]] = {
    "fake": _fake_resize,
    "real": _unimplemented_resize,
}


def resize_media(
    df: DataFrame, width: int = 224, height: int = 224, resizer: str = "fake"
) -> DataFrame:
    """Resize media payloads to (width, height) via ``mapInPandas``.

    Same plumbing contract as :func:`decode_media`: Arrow-batched transfer,
    per-item worker function, stable output schema. The resized payload is
    size-bounded, so downstream stages can size partitions deterministically
    (a key property when normalizing 100 TB of mixed-resolution media to a
    training shape).
    """
    resize = RESIZERS[resizer]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": [
                        resize(bytes(p) if p is not None else b"", width, height)
                        for p in pdf["payload"]
                    ],
                }
            )
            yield out[[f.name for f in RESIZE_SCHEMA.fields]]

    return df.mapInPandas(run, RESIZE_SCHEMA)


def media_embedding(df: DataFrame, dim: int = 16, decoder: str = "fake") -> DataFrame:
    """Feature-extract media payloads into fixed-``dim`` embedding vectors.

    The extractor is the registered decoder's feature output, hashed down /
    padded to ``dim`` deterministically — the stand-in for an image/audio
    encoder model. Output (media_id, embedding array<double>) feeds directly
    into the similarity-search operators (cosine_topk, ivf_cosine_topk,
    embedding_near_duplicates).
    """
    decode = DECODERS[decoder]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                feat = decode(bytes(p) if p is not None else b"")["feature"]
                v = np.resize(np.asarray(feat, dtype=np.float64), dim)
                vecs.append(v.tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return df.mapInPandas(run, schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """"Frame sampling" plumbing: slice evenly spaced byte windows out of a
    payload (stand-in for video frame extraction). Built-in expressions
    only — ``substring`` on binary."""
    frames = F.expr(
        f"transform(sequence(0, least(int(n_bytes / {every_n_bytes}), {max_frames - 1})), "
        f"i -> substring(payload, i * {every_n_bytes} + 1, {every_n_bytes}))"
    )
    return df.select(
        "media_id", F.posexplode(frames).alias("frame_index", "frame")
    ).withColumn("frame_bytes", F.length("frame").cast("long"))

"""Multimodal column plumbing (SURVEY.md §2.12 E4): image/audio/video as
opaque BinaryType payloads + typed metadata structs, processed via
Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode kernels* are
deterministic fakes behind ``_decode_stub`` (clearly marked); everything
Spark-side — schema, batch iteration, partitioning, column pruning — is
real and tested.  Swapping the stub for PIL/ffmpeg is a one-function
change; the plan shape (mapInPandas over pre-pruned binary + metadata
columns) is the 100 TB design: payload bytes stream through Arrow in
bounded batches and never concentrate on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from documents: payload = UTF-8 bytes (stand-in
    binary), metadata derived deterministically.  Mirrors how a real
    pipeline lands media: (id, payload BINARY, meta STRUCT)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            (F.length(text_col) % 1024).cast("int").alias("width"),
            (F.length(text_col) % 768).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decode kernel (no codec libs in this container).

    Deterministic fake: 8 doubles derived from byte statistics.  Replace
    with a real decoder (PIL.Image.open etc.) in deployments; signature and
    batch shape stay identical.
    """
    if payload is None:
        return []
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
        float(min(payload)),
        float(max(payload)),
        float(payload[n // 2]),
        float(n % 251),
    ]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """doc_id → fixed-width feature vector via Arrow-batched mapInPandas.

    Column pruning happens *before* the Python boundary (select), so only
    (doc_id, payload) crosses Arrow — metadata-only queries never pay for
    payload bytes.
    """
    import hashlib

    pruned = media.select("doc_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": pdf["payload"].map(_decode_stub),
                }
            )

    return pruned.mapInPandas(batches, FEATURE_SCHEMA)


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize kernel over the same Arrow plumbing as
    :func:`extract_features` (no codec libs in this container: the fake
    "resample" deterministically strides the payload to the target byte
    budget; a real deployment swaps in PIL/libvips with the identical
    signature and batch shape).  Metadata is updated to the target
    dimensions so downstream operators see a consistent table."""
    budget = max(1, (width * height) // 64)
    pruned = media.select("doc_id", "payload", "meta")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _resample(b: bytes | None) -> bytes:
            if not b:
                return b""
            if len(b) <= budget:
                return bytes(b)
            stride = len(b) / budget
            return bytes(b[int(i * stride)] for i in range(budget))

        for pdf in it:
            meta = [
                {**(m or {}), "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(_resample),
                    "meta": meta,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    return pruned.mapInPandas(batches, schema)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: explode n_frames into frame indices and
    keep every ``every_n``-th — pure column algebra (the per-frame decode
    would ride extract_features on the sampled subset)."""
    return media.select(
        "doc_id",
        F.explode(
            F.expr("sequence(0, greatest(meta.n_frames - 1, 0))")
        ).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)

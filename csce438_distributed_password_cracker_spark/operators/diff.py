"""Keyed snapshot diff — compare two versions of a table by primary key
and classify every key as added / removed / changed / unchanged.  The
validation step behind every migration, backfill, or MERGE: "what did
that run actually change?"

Reference analog: none (north-star extension, BASELINE.json).

Scale shape: each side is reduced MAP-SIDE to (key, row_hash) — one
64-bit xxhash64 over the canonicalized non-key columns — so the full
outer join shuffles one i64 per row instead of the row payload.  Cost
is one shuffle per side on the key, the same as any equi-join, and the
change classification is a null-pattern projection on the joined
result.  ``diff_stats`` adds one map-side-combined aggregation of 4
counter rows.

Honesty note on hashing: two different rows colliding on xxhash64 would
misreport as "unchanged" (P ≈ n²/2⁶⁵ across matched pairs — at 10¹⁰
rows that is ~0.003 expected misses).  Callers needing certainty for a
specific key set re-verify flagged-unchanged rows with a payload join;
the hash pass is what makes the table-wide sweep affordable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hashed(df: DataFrame, key_cols: list[str], tag: str) -> DataFrame:
    payload = [c for c in df.columns if c not in key_cols]
    # canonicalize: fixed column order and an explicit null sentinel per
    # column (xxhash64 skips NULL args, so (NULL,'x') and ('x',NULL)
    # would otherwise collide by construction)
    parts = []
    for c in sorted(payload):
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
        parts.append(F.lit("\x1f"))
    h = F.xxhash64(*parts) if parts else F.lit(0).cast("long")
    return df.select(*key_cols, h.alias(f"__h_{tag}"))


def snapshot_diff(
    before: DataFrame, after: DataFrame, key_cols: list[str]
) -> DataFrame:
    """One row per key present in either snapshot, with ``diff_status``
    in {'added','removed','changed','unchanged'}.  Key uniqueness per
    side is the caller's contract (as with any MERGE key)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    missing = [c for c in key_cols if c not in before.columns] + [
        c for c in key_cols if c not in after.columns
    ]
    if missing:
        raise ValueError(f"key columns missing from a snapshot: {missing}")
    b = _hashed(before, key_cols, "b")
    # NULL-SAFE key join: a USING join treats NULL keys as unequal, so a
    # key with a NULL component present in both snapshots would split
    # into a spurious added+removed pair instead of comparing
    a = _hashed(after, key_cols, "a").select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols], "__h_a"
    )
    cond = None
    for k in key_cols:
        c = b[k].eqNullSafe(a[f"__k_{k}"])
        cond = c if cond is None else (cond & c)
    joined = b.join(a, cond, "full_outer")
    return joined.select(
        *[
            F.coalesce(b[k], a[f"__k_{k}"]).alias(k) for k in key_cols
        ],
        F.when(F.col("__h_b").isNull(), F.lit("added"))
        .when(F.col("__h_a").isNull(), F.lit("removed"))
        .when(F.col("__h_b") == F.col("__h_a"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("diff_status"),
    )


def diff_stats(diff: DataFrame) -> dict[str, int]:
    """{'added': n, 'removed': n, 'changed': n, 'unchanged': n} for a
    :func:`snapshot_diff` result."""
    counts = {
        r["diff_status"]: r["n"]
        for r in diff.groupBy("diff_status").agg(F.count("*").alias("n")).collect()
    }
    return {
        k: counts.get(k, 0)
        for k in ("added", "removed", "changed", "unchanged")
    }

"""Skew mitigation (SURVEY.md north-star: "salting for skew, AQE for
runtime re-plan") and co-located bucketed joins.

AQE's skew-join splitting (on in session.py) handles moderate skew
transparently; explicit salting is the tool when one join key dominates so
hard that even split shuffle blocks hot-spot a single executor — the
salted form trades a small-side replication factor for an even key
distribution, with identical join results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small ON key`` with the big side salted across
    ``salts`` sub-keys and the small side replicated ``salts``× — turns one
    hot key's single reducer into ``salts`` reducers.  Row-level results
    are identical to the plain join (each big row meets exactly one copy
    of its match).

    The salt is derived from a row-local uniquifier, not the key, so the
    hot key's rows spread evenly; the small side carries every salt value.
    """
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts)).cast(
            "int"
        ),
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {salts - 1})"))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str, salts: int = 16
) -> DataFrame:
    """COUNT(DISTINCT x) per group with a salted two-phase plan: phase 1
    dedups (group, salt-of-x, x) — spreading a hot group across ``salts``
    reducers — phase 2 merges partial distinct counts (disjoint by
    construction, so a plain sum).  For groups so hot that the built-in
    distinct-aggregate's single per-group reducer becomes the straggler.
    """
    phase1 = (
        df.select(
            F.col(group_col),
            F.col(distinct_col),
            F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salts)).alias("__salt"),
        )
        .distinct()
        .groupBy(group_col, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return phase1.groupBy(group_col).agg(
        F.sum("__partial").alias(f"n_distinct_{distinct_col}")
    )

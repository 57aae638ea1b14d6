"""Edit-distance fuzzy matching via deletion neighborhoods — near-dup
detection for STRING KEYS (names, titles, URLs), where token shingles
are useless because the whole key is a few tokens.

Public prior art: FastSS (Bocek et al. 2007) and SymSpell: two strings
within Levenshtein distance ``k`` share at least one common variant in
their ``k``-deletion neighborhoods, so candidate generation is a
self-join on deletion variants instead of an all-pairs scan — the
classic spell-checker/entity-matching index, re-expressed as a Spark
join.

Scale shape (100 TB):

- Work at KEY granularity, not row granularity: keys are first reduced
  to ``(key, min-id representative, count)`` — ONE shuffle with
  map-side partials, after which a billion rows of 64 distinct names
  cost 64 keys.
- Variant generation is a map-only explode bounded by C(len, k)+1
  variants per key (k ≤ 2 enforced — SymSpell's practical range; the
  neighborhood explodes combinatorially above that).
- Candidates come from ONE equality self-join on the variant string;
  verification is the JVM ``levenshtein`` built-in (no UDF).  The
  FastSS guarantee makes the result EXACT — every true pair shares a
  variant — while candidate counts stay near-linear for natural key
  distributions.
- ``max_bucket_size`` guards the pathological hot variant (e.g. the
  empty string shared by every 1-char key): buckets above the cap are
  DROPPED — that trades exactness for a bound, so it defaults to None
  (exact) and dropping is the caller's explicit choice.

Reference analog: none (north-star dedup family, alongside
operators/dedup.py's shingle/sketch methods).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants_sql", "fuzzy_key_pairs", "fuzzy_match"]


def deletion_variants_sql(col: str, max_edits: int) -> str:
    """SQL for the ``max_edits``-deletion neighborhood of ``col`` as a
    distinct string array (includes the original).  k ≤ 2 only."""
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2 (FastSS blows up above)")
    one = (
        f"transform(sequence(1, length({col})),"
        f" i -> concat(substring({col}, 1, i - 1),"
        f"             substring({col}, i + 1, length({col}))))"
    )
    if max_edits == 1:
        return f"array_distinct(concat(array({col}), {one}))"
    two = (
        f"flatten(transform({one}, v ->"
        f" transform(sequence(1, greatest(length(v), 1)),"
        f"  i -> concat(substring(v, 1, i - 1),"
        f"              substring(v, i + 1, length(v))))))"
    )
    return f"array_distinct(concat(array({col}), {one}, {two}))"


def _key_table(df: DataFrame, id_col: str, key_col: str) -> DataFrame:
    """The key-granularity reduction ``(_k, _id, _n)`` every fuzzy
    entry point starts from — computed ONCE and shared (it is the one
    corpus-sized shuffle in the whole operator family)."""
    return (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("_k"))
        .agg(F.min(id_col).alias("_id"), F.count("*").alias("_n"))
    )


def fuzzy_key_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_edits: int = 1,
    max_bucket_size: int | None = None,
    _keys: DataFrame | None = None,
) -> DataFrame:
    """All DISTINCT-key pairs within Levenshtein ``max_edits``:
    ``(id_a, id_b, key_a, key_b, dist, n_a, n_b)`` where ``id_*`` are
    each key's min-id representative and ``n_*`` its row count.
    ``id_a < id_b``; equal keys are NOT pairs (exact dedup's job).
    NULL keys are ignored.  ``_keys``: a precomputed
    :func:`_key_table` frame, so composite callers pay the corpus
    shuffle once."""
    keys = (
        _keys if _keys is not None else _key_table(df, id_col, key_col)
    )
    variants = keys.select(
        "_k",
        "_id",
        "_n",
        F.explode(
            F.expr(deletion_variants_sql("_k", max_edits))
        ).alias("_v"),
    )
    if max_bucket_size is not None:
        counts = variants.groupBy("_v").agg(F.count("*").alias("_vc"))
        variants = (
            variants.join(
                F.broadcast(
                    counts.where(F.col("_vc") > int(max_bucket_size))
                ),
                "_v",
                "left_anti",
            )
        )
    a = variants.select(
        F.col("_v"),
        F.col("_k").alias("key_a"),
        F.col("_id").alias("id_a"),
        F.col("_n").alias("n_a"),
    )
    b = variants.select(
        F.col("_v"),
        F.col("_k").alias("key_b"),
        F.col("_id").alias("id_b"),
        F.col("_n").alias("n_b"),
    )
    cand = (
        a.join(b, "_v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "key_a", "key_b", "n_a", "n_b")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        "key_a",
        "key_b",
        F.levenshtein("key_a", "key_b").cast("int").alias("dist"),
        "n_a",
        "n_b",
    ).where(F.col("dist") <= int(max_edits))


def fuzzy_match(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_edits: int = 1,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Per-row canonical-key assignment: every row gets
    ``canonical_key`` — its key's fuzzy cluster representative (the
    min-id key, transitively via connected components over the pair
    graph).  Rows whose key matches nothing keep their own key.  The
    entity-resolution / spell-normalization verdict pass."""
    from .dedup import connected_components

    keys = _key_table(df, id_col, key_col)
    pairs = fuzzy_key_pairs(
        df, id_col, key_col, max_edits, max_bucket_size, _keys=keys
    )
    comps = connected_components(
        keys.select(F.col("_id").alias("id")),
        pairs.select("id_a", "id_b"),
    )
    canon = (
        keys.join(comps, keys["_id"] == comps["id"])
        .select("_k", "component_id")
        .join(
            keys.select(
                F.col("_id").alias("component_id"),
                F.col("_k").alias("canonical_key"),
            ),
            "component_id",
        )
        .select("_k", "canonical_key")
    )
    return df.join(
        canon, df[key_col] == canon["_k"], "left"
    ).select(
        *df.columns,
        F.coalesce("canonical_key", F.col(key_col)).alias("canonical_key"),
    )

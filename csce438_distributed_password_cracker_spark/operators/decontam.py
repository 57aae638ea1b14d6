"""Benchmark decontamination — remove training documents that overlap an
evaluation/benchmark set by shared token n-grams (the published
training-corpus hygiene step: GPT-3 App. C / PaLM-style 'dirty' doc
removal, re-expressed Spark-first).

Reference analog: none (north-star extension, BASELINE.json) — this is a
cross-corpus variant of the set-overlap machinery in
:mod:`operators.dedup` (shingle explode ``dedup.shingle_rows``), reused
here so both paths share one codegen'd shingle kernel.

Scale shape (the 100 TB design point):

- The eval side is SMALL by construction (benchmarks are thousands of
  docs, not billions).  Its distinct n-gram set is broadcast, so the
  training corpus is flagged in a single map-side pass — no shuffle of
  the 100 TB side for the overlap join itself; only the per
  (train_id, eval_id) count aggregation shuffles, and that output is
  bounded by the contamination rate, not the corpus size.
- ``contaminated_ids`` is again small (hits only), so the removal
  anti-join broadcasts too: end-to-end decontamination costs one scan
  of the training corpus plus two broadcasts.
- If the eval gram set ever outgrows the broadcast threshold (many
  benchmarks × long docs), swap the broadcast for a Bloom filter built
  from the same gram rows (``df.stat.bloomFilter`` driver-side, or an
  ``approx`` prefilter) and keep the exact join for the survivors —
  same plan shape, smaller broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_rows


def _gram_rows(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    """(out_id, g) token n-gram rows per document — explode shape, fully
    codegen'd (see dedup.shingle_rows on why explode beats transform
    lambdas here).  NOT deduplicated: distinct-gram semantics are
    enforced downstream where they're cheap (broadcast build on the eval
    side, count_distinct after the join on the train side) so the
    corpus side never shuffles its raw gram stream."""
    return shingle_rows(df, id_col, text_col, n).select(
        F.col("id").alias(out_id), F.col("s").alias("g")
    )


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """(train_id, eval_id, n_shared) — the number of DISTINCT token
    n-grams each training document shares with each eval document,
    keeping pairs with ``n_shared >= min_hits``.

    The eval gram set is deduplicated and broadcast (small by contract —
    see module docstring); the train side streams through a map-side
    hash join with NO pre-shuffle: its grams are deduplicated by
    ``count_distinct`` AFTER the join, when only matching rows — bounded
    by the contamination rate, not the corpus — remain to aggregate.
    """
    tr = _gram_rows(train, id_col, text_col, n, "train_id")
    ev = _gram_rows(eval_df, id_col, text_col, n, "eval_id").distinct()
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("train_id", "eval_id")
        .agg(F.count_distinct("g").alias("n_shared"))
        .filter(F.col("n_shared") >= min_hits)
    )


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Distinct train-doc ids flagged by :func:`ngram_overlap` (any eval
    doc, ≥ min_hits shared distinct n-grams)."""
    return (
        ngram_overlap(train, eval_df, id_col, text_col, n, min_hits)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """The training corpus minus contaminated documents — a broadcast
    LEFT ANTI join against the (small) flagged-id set, so removal costs
    one more map-side pass over the corpus."""
    bad = contaminated_ids(train, eval_df, id_col, text_col, n, min_hits)
    return train.join(
        F.broadcast(bad), on=id_col, how="left_anti"
    )

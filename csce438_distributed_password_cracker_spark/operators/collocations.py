"""Collocation mining — find word pairs that co-occur far more than
chance (multiword expressions, named entities, boilerplate phrases),
the corpus-analysis sweep behind phrase lists and tokenizer merges.

Public prior art: Manning & Schütze 1999 ch. 5 (PMI over adjacent
bigrams); Mikolov 2013 §4 (the word2vec phrase pass uses the same
count ratio with a discount).

Statistic: ``lift = N · c(ab) / (c(a) · c(b))`` — the ratio of the
bigram's observed probability to the independence prediction, i.e.
``2^PMI``.  The operator reports lift rather than PMI itself because
lift is ONE IEEE division of exact integer counts — bit-identical in
any engine — while log2 is transcendental and differs at ulp level
across libms (exactly the float class the correctness gate keeps out
of hashes).  Callers who want PMI take log2 driver-side.

Scale shape (100 TB):

- the corpus is read ONCE: a map-only bigram explode into one shuffle
  with map-side partials (the Zipf head combines before the exchange)
  builds the bigram count table; unigram position counts, N, and the
  survivors all derive from that vocab²-bounded table (lazily
  checkpointed so its four consumers share one materialization);
- ``min_count`` prunes the bigram table BEFORE the unigram joins — the
  long unique tail (most of a web corpus's bigrams) never enters a
  join;
- the two unigram joins are plain equi-joins on the word key, each
  against the (much smaller) unigram table — broadcast when vocab
  fits, AQE otherwise;
- counts stay BIGINT end-to-end; the lift denominator multiplies as
  DOUBLE (c(a)·c(b) can pass 2^63 at web scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_bigrams(df: DataFrame, text_col: str) -> DataFrame:
    """Adjacent word pairs per document — map-only: zip the token array
    against itself shifted by one, explode.  Empty tokens (double
    spaces) and NULL texts contribute nothing.

    ``text_col`` may be a raw string column (single-space split, the
    default) or an ``array<string>`` of PRE-SPLIT tokens — the hook that
    lets a caller tokenizing once feed several consumers (collocations,
    heavy hitters) from one materialized token frame instead of paying
    the corpus scan per consumer.  The empty-token filter reapplies
    either way (idempotent), so both paths count identical bigrams."""
    from pyspark.sql.types import ArrayType

    pre_split = text_col in df.columns and isinstance(
        df.schema[text_col].dataType, ArrayType
    )
    src = F.col(text_col) if pre_split else F.split(F.col(text_col), " ")
    toks = F.filter(src, lambda x: x != "")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return df.select(F.explode(pairs).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def collocations(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
) -> DataFrame:
    """(w1, w2, c_ab, c_a, c_b, lift) for every adjacent bigram with
    ``c_ab ≥ min_count``: exact counts plus the independence lift
    ``N·c_ab / (c_a·c_b)`` where N is the total bigram count and the
    unigram counts are over bigram POSITIONS (left word occurrences /
    right word occurrences), so the null model and the observation
    count the same events.  lift > 1 means the pair attracts; sort by
    lift (tie-break on words) for a phrase list.  ``text_col`` may be
    pre-split tokens — see :func:`word_bigrams`."""
    if min_count < 1:
        raise ValueError(f"min_count must be ≥ 1, got {min_count}")
    big = word_bigrams(df, text_col)
    # ONE corpus pass: everything downstream (unigram position counts,
    # N, the pruned survivors) derives from the bigram COUNT table,
    # which is vocab²-bounded — orders of magnitude smaller than the
    # corpus.  persist (NOT localCheckpoint — the repo convention, see
    # similarity.py's multiprobe join): the four consumers share one
    # materialization, lineage survives executor loss so a lost block
    # recomputes instead of failing the job, and no job runs at
    # construction time.  Lifecycle: owned by the returned plan; Spark
    # evicts LRU.
    from pyspark import StorageLevel

    c_ab = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c_a = c_ab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    c_b = c_ab.groupBy("w2").agg(F.sum("c_ab").alias("c_b"))
    kept = c_ab.where(F.col("c_ab") >= min_count)
    joined = kept.join(c_a, "w1").join(c_b, "w2")
    # N counts ALL bigrams (the null model's sample size), not just the
    # kept ones — a one-row aggregate broadcast onto every survivor
    total = c_ab.agg(F.sum("c_ab").alias("__n"))
    out = joined.join(F.broadcast(total))
    lift = (
        F.col("c_ab").cast("double") * F.col("__n").cast("double")
    ) / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    return out.select(
        "w1",
        "w2",
        "c_ab",
        "c_a",
        "c_b",
        lift.alias("lift"),
    )

"""N-gram language-model quality scoring — the CCNet-style "how much
does this document look like the reference corpus" filter.

Public prior art: Wenzek et al. 2020 (CCNet) score CommonCrawl
paragraphs with a Wikipedia-trained KenLM and keep the low-perplexity
head; Brown et al. 2020 (GPT-3) and Gao et al. 2021 (the Pile) use the
same shape with a classifier.  The distributed re-expression here is a
bigram LM with add-k smoothing: training is one aggregation over the
reference corpus (bigram counts; context totals derive from the model
rows, not a re-scan), scoring is one bigram explode + one join against
the model + one per-doc aggregation.
KenLM's 5-gram Kneser-Ney fits the same frame (the model table grows,
the joins don't change shape); the bigram form keeps every number
closed-form re-derivable by the SQL oracle.

Reference analog: none (north-star quality-filter family).

Scale shape (100 TB):

- Training: the bigram explode is map-only (each doc emits its own
  adjacent pairs — no cross-doc state); counts are ONE shuffle on the
  bigram key with map-side partials, and the Zipf-head bigram ("the
  the" at billions of occurrences) reduces to per-partition partial
  counts before the exchange, so key skew never concentrates rows.
  Context totals are a window over the MODEL rows (vocab²-capped),
  never a second pass over the corpus.
- Scoring: docs explode to (doc, w1, w2) — map-only — then join the
  model on the bigram key.  The model is a plain DataFrame: Spark
  broadcasts it when it fits (reference LMs are ~vocab² capped by
  observed pairs) and falls back to a shuffle join when it doesn't;
  AQE picks at runtime, nothing here forces either.  The per-doc
  aggregation is the second (and last) shuffle, on the doc key.
- The join carries tokens, never document text; the per-doc rollup
  carries a handful of numerics per row.

Oracle discipline: the gate consumes only the ORDER-INDEPENDENT
integer aggregates (``lm_n_bigrams``, ``lm_n_oov``, ``lm_sum_cnt``) —
exact under any addition order, so they hash identically in Spark and
DuckDB.  The float log-probability columns (``lm_logprob``,
``lm_ppl``) are the user-facing filter signal and are unit-tested
against closed-form values instead: a sum of ``ln()`` terms is
float-addition-order-dependent, which is exactly the class of value
the repo keeps out of gate hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["train_bigram_lm", "score_documents", "quality_buckets"]

# sequence(1, 0) DESCENDS in Spark, so the pair builder is gated on
# size >= 2 rather than relying on an empty sequence
_PAIRS = (
    "CASE WHEN size(_t) >= 2 THEN"
    "  transform(sequence(1, size(_t) - 1),"
    "   i -> struct(element_at(_t, i) AS w1,"
    "               element_at(_t, i + 1) AS w2))"
    " ELSE array() END"
)


def _bigrams(
    df: DataFrame, id_col: str, text_col: str, keep_empty: bool = False
) -> DataFrame:
    """Map-only explode of each document's adjacent token pairs:
    ``(id_col, w1, w2)``; docs with < 2 tokens emit nothing — unless
    ``keep_empty``, which emits ONE ``(id_col, NULL, NULL)`` sentinel
    for them (``explode_outer``) so a downstream per-doc aggregation
    covers every input row without a rescue join back to the corpus
    (at 100 TB that rescue join is a second full scan)."""
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    exploder = F.explode_outer if keep_empty else F.explode
    out = df.select(F.col(id_col), toks.alias("_t"))
    if not keep_empty:
        out = out.where(F.size("_t") >= 2)
    return out.select(
        id_col, exploder(F.expr(_PAIRS)).alias("_bg")
    ).select(id_col, "_bg.w1", "_bg.w2")


def train_bigram_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram counts over the reference corpus: ``(w1, w2, cnt,
    ctx_cnt)`` where ``ctx_cnt`` is the total count of bigrams starting
    with ``w1`` (the conditional's denominator).  ONE corpus scan: the
    context totals are a window sum OVER THE MODEL ROWS (vocab²-capped)
    rather than a second aggregation of the corpus — re-deriving them
    from the source would double the 100 TB scan and the bigram
    shuffle, since Spark does not share unreferenced subtrees."""
    counts = (
        _bigrams(df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )
    return counts.select(
        "w1",
        "w2",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("w1")).alias("ctx_cnt"),
    )


def score_documents(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    vocab_size: int | None = None,
) -> DataFrame:
    """Score every document against a ``train_bigram_lm`` model:
    returns one row per input doc with

    - ``lm_n_bigrams`` — adjacent pairs in the doc (0 for short docs),
    - ``lm_n_oov`` — pairs unseen in the model,
    - ``lm_sum_cnt`` — total model count mass the doc's pairs hit
      (the integer "familiarity" signal; all three are exact),
    - ``lm_logprob`` — add-k smoothed mean log P(w2|w1) (NULL for
      docs with no bigrams),
    - ``lm_ppl`` — exp(-lm_logprob), the CCNet filter column.

    ``vocab_size`` defaults to the model's distinct-``w1`` count (one
    tiny aggregate); pass it explicitly to pin the smoothing
    denominator across incremental model updates.
    """
    if k <= 0:
        raise ValueError("add-k smoothing needs k > 0")
    if vocab_size is None:
        vocab_size = model.select("w1").distinct().count()
    v = int(vocab_size)
    # keep_empty: short/NULL docs ride through as ONE sentinel row, so
    # the per-doc rollup covers every input doc in the SAME pass — no
    # rescue join back to the corpus (a second full scan at 100 TB).
    #
    # The context total joins INDEPENDENTLY of the pair: an unseen
    # continuation of a well-attested context must take that context's
    # denominator — ctx('the') stays 10000 for ('the', <unseen>), so
    # P(unseen|the) = k / (10000 + kV) is SMALLER than any attested
    # continuation's probability, and the per-context distribution
    # still sums to 1.  (Denormalizing ctx only onto seen pairs would
    # score gibberish continuations of frequent contexts ~k/kV — far
    # ABOVE attested rare bigrams — inverting the CCNet filter.)
    # Both joins are model-sized; persist the model when scoring in the
    # same lineage as training to avoid recomputing its subtree twice.
    ctx = model.groupBy("w1").agg(F.max("ctx_cnt").alias("_ctx"))
    scored = (
        _bigrams(df, id_col, text_col, keep_empty=True)
        .join(model.select("w1", "w2", "cnt"), ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
    )
    real = F.col("w1").isNotNull()
    logp = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(float(k)))
        / (F.coalesce(F.col("_ctx"), F.lit(0)) + F.lit(float(k) * v))
    )
    return scored.groupBy(id_col).agg(
        F.sum(F.when(real, 1).otherwise(0))
        .cast("long")
        .alias("lm_n_bigrams"),
        F.sum(F.when(real & F.col("cnt").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("lm_n_oov"),
        F.sum(F.when(real, F.coalesce(F.col("cnt"), F.lit(0))).otherwise(0))
        .cast("long")
        .alias("lm_sum_cnt"),
        F.avg(F.when(real, logp)).alias("lm_logprob"),
        F.exp(-F.avg(F.when(real, logp))).alias("lm_ppl"),
    )


def quality_buckets(
    scored: DataFrame,
    ppl_col: str = "lm_ppl",
    fracs: tuple[float, ...] = (1 / 3, 2 / 3),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    bucket_col: str = "lm_bucket",
    relative_error: float = 0.001,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek 2020 §4.4): bucket
    documents by perplexity QUANTILE — "head" is the most
    reference-like third, and downstream mixtures sample the buckets
    at different rates (CCNet trains mostly on head+middle).

    ONE ``approxQuantile`` pass computes the cut points (driver gets
    ``len(fracs)`` doubles); the verdict is a map-only CASE — no
    shuffle, applies to 100 TB as a projection.  Rows with NULL
    perplexity (no bigrams) land in the LAST bucket: an unscoreable
    doc is never promoted into the head.  Cut points are data-derived,
    so persist them (they're in the returned plan as literals) when
    the same split must apply to a later increment."""
    if len(labels) != len(fracs) + 1:
        raise ValueError("need exactly len(fracs) + 1 labels")
    if list(fracs) != sorted(fracs) or not all(0 < f < 1 for f in fracs):
        raise ValueError("fracs must be strictly increasing in (0, 1)")
    cuts = scored.stat.approxQuantile(
        ppl_col, list(fracs), float(relative_error)
    )
    if len(cuts) < len(fracs):
        # no non-null perplexities at all: nothing is scoreable, so
        # everything is tail (approxQuantile returns [] on all-NULL)
        return scored.withColumn(bucket_col, F.lit(labels[-1]))
    expr = F.when(F.col(ppl_col) <= F.lit(cuts[0]), F.lit(labels[0]))
    for cut, label in zip(cuts[1:], labels[1:-1]):
        expr = expr.when(F.col(ppl_col) <= F.lit(cut), F.lit(label))
    expr = expr.otherwise(F.lit(labels[-1]))
    return scored.withColumn(bucket_col, expr)

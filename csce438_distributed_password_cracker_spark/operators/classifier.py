"""Hashed-feature linear text classifier — the fastText-style quality
gate (score every document against a trained linear model, keep the
high-scoring side).

Public prior art: Joulin et al. 2017 (fastText) classify with a bag of
hashed word n-grams through a linear layer; Brown et al. 2020 (GPT-3)
and the LLaMA corpus use exactly this shape to keep "reference-like"
pages.  Training happens offline (any logistic-regression fit produces
the ``(feature, weight)`` table); THIS module is the distributed apply:
featurize every document with the hashing trick and score it against
the weight table.

Reference analog: none (north-star quality-filter family).

Scale shape (100 TB):

- Featurization is map-only: each doc emits ``pmod(hash(ngram), D)``
  feature ids for its unigrams + bigrams — no cross-doc state, no
  vocabulary to build or ship (that is the point of the hashing
  trick).
- The weight table has at most ``n_features`` rows (2^18 by default —
  a few MB), so the feature join is a BROADCAST join, explicitly
  hinted: the only shuffle in the whole operator is the final per-doc
  sum on the doc key.
- The join carries feature ids (one long per occurrence), never text.

Exactness discipline: model weights are snapped to the dyadic grid
``i / 2**resolution_bits`` (fastText quantizes harder than this for
its compressed models, so the snap is standard practice, not a test
artifact).  A sum of dyadic rationals with |sum| well under 2^40 is
EXACT in float64 under ANY addition order, so ``clf_logit`` is
reproducible bit-for-bit across partitionings and engines — the gate
can hash it directly, unlike a generic float sum.  The sigmoid
(``clf_prob``) goes through ``exp`` whose last-ulp behavior differs
across engines; it stays out of gate hashes and is unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.porthash import md5_int_spark

__all__ = [
    "featurize",
    "score_linear",
    "pseudo_weights",
    "DEFAULT_N_FEATURES",
]

DEFAULT_N_FEATURES = 1 << 18


def featurize(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = DEFAULT_N_FEATURES,
    seed: int = 42,
    portable: bool = False,
    keep_empty: bool = False,
) -> DataFrame:
    """Map-only hashing-trick featurization: one ``(id_col, feature)``
    row per unigram and per adjacent bigram occurrence (bag semantics —
    multiplicity preserved, like fastText's input layer).  NULL text
    emits nothing — unless ``keep_empty``, which emits ONE ``(id_col,
    NULL)`` sentinel row (``explode_outer``) so a downstream per-doc
    aggregation covers every input doc without a rescue join back to
    the corpus (at 100 TB that rescue join is a second full scan).
    ``portable`` swaps xxhash64 for the engine-portable md5-60 hash so
    a DuckDB twin derives identical feature ids."""
    if n_features < 2:
        raise ValueError("n_features must be >= 2")
    # no coalesce: NULL text must yield NO grams (the SQL twin's
    # unnest(NULL) emits no rows — coalescing to '' would diverge)
    toks = F.split(F.col(text_col), " ")
    exploder = F.explode_outer if keep_empty else F.explode
    grams = df.select(F.col(id_col), toks.alias("_t")).select(
        id_col,
        exploder(
            F.expr(
                # sequence(1, 0) DESCENDS in Spark, so the bigram
                # arm must be gated on size >= 2, not clamped
                "concat("
                "  _t,"
                "  CASE WHEN size(_t) >= 2 THEN"
                "    transform(sequence(1, size(_t) - 1),"
                "      i -> concat(element_at(_t, i), ' ',"
                "                  element_at(_t, i + 1)))"
                "  ELSE array() END)"
            )
        ).alias("_g"),
    )
    h = (
        md5_int_spark("concat('clf:', _g)", seed, 15)
        if portable
        else f"xxhash64('clf', _g, {int(seed)})"
    )
    return grams.select(
        id_col,
        F.expr(
            f"CASE WHEN _g IS NULL THEN NULL"
            f" ELSE pmod({h}, {int(n_features)}) END"
        ).alias("feature"),
    )


def pseudo_weights(
    spark: SparkSession,
    n_features: int,
    seed: int = 42,
    resolution_bits: int = 10,
    portable: bool = False,
) -> DataFrame:
    """A deterministic stand-in model ``(feature, weight)`` with
    weights on the dyadic grid ``[-1, 1) / 2**resolution_bits`` —
    derived from the feature id's hash, so a SQL twin can restate the
    whole table closed-form.  Real deployments replace this with their
    trained weights (snapped to the same grid via
    ``round(w * 2**bits) / 2**bits``)."""
    scale = 1 << resolution_bits
    h = (
        md5_int_spark("concat('w:', CAST(id AS STRING))", seed, 15)
        if portable
        else f"xxhash64('w', CAST(id AS STRING), {int(seed)})"
    )
    return spark.range(int(n_features)).select(
        F.col("id").alias("feature"),
        F.expr(
            f"(CAST(pmod({h}, {2 * scale}) AS DOUBLE) - {scale})"
            f" / {scale}.0"
        ).alias("weight"),
    )


def score_linear(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = DEFAULT_N_FEATURES,
    seed: int = 42,
    bias: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """Score every document against a linear model: one row per input
    doc with

    - ``clf_n_feats`` — feature occurrences (unigrams + bigrams; 0 for
      NULL-text docs — an empty STRING is one ``''`` unigram, exactly
      what the SQL twin's ``string_split`` sees),
    - ``clf_logit`` — ``bias + Σ weight[hash(gram)]`` (EXACT when the
      weights are dyadic — see module docstring; the gate hashes it),
    - ``clf_label`` — ``clf_logit > 0``,
    - ``clf_prob`` — ``sigmoid(clf_logit)`` (float convenience; engine
      ulps apply, keep it out of cross-engine hashes).

    ``weights`` rows are ``(feature, weight)``; features without a row
    contribute 0 (a pruned/sparse model is the normal case).  The join
    is explicitly broadcast: the model is bounded by ``n_features``.
    NULL-text docs ride through as one sentinel row (see
    ``featurize(keep_empty=True)``), so every input doc gets an output
    row in the SAME pass — no rescue join back to the corpus.
    """
    feats = featurize(
        df, id_col, text_col, n_features, seed, portable, keep_empty=True
    )
    joined = feats.join(
        F.broadcast(weights.select("feature", "weight")),
        "feature",
        "left",
    )
    real = F.col("feature").isNotNull()
    per_doc = joined.groupBy(id_col).agg(
        F.sum(F.when(real, 1).otherwise(0))
        .cast("long")
        .alias("clf_n_feats"),
        F.sum(
            F.when(real, F.coalesce(F.col("weight"), F.lit(0.0))).otherwise(
                0.0
            )
        ).alias("_sw"),
    )
    logit = F.coalesce(F.col("_sw"), F.lit(0.0)) + F.lit(float(bias))
    return per_doc.select(
        F.col(id_col),
        "clf_n_feats",
        logit.alias("clf_logit"),
        (logit > 0).alias("clf_label"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("clf_prob"),
    )

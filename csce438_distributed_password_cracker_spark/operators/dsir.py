"""Data Selection with Importance Resampling (DSIR) — pick raw-corpus
documents whose hashed-n-gram statistics look like a target corpus.

Public prior art: Xie et al. 2023 ("Data Selection for Language Models
via Importance Resampling") estimate per-document importance weights
``log p_target(x) − log p_raw(x)`` under bag-of-hashed-ngrams unigram
models and resample without replacement via Gumbel top-k.  This module
is the distributed re-expression over the hashing-trick featurizer the
classifier already ships (:mod:`.classifier`):

- **Feature models**: one ``featurize → groupBy(feature).count()`` pass
  per corpus — map-only explode, ONE shuffle on the feature key with
  map-side partials (the Zipf-head feature reduces before the
  exchange).  Model size ≤ ``n_features`` rows.
- **Log-ratio weights**: a full-outer join of the two count tables
  (both ≤ ``n_features`` rows — executor-trivial) with add-α smoothing,
  snapped to the dyadic grid ``i / 2**resolution_bits`` so per-document
  sums are EXACT in float64 under any addition order (same discipline
  as :mod:`.classifier` — reproducible across partitionings).
- **Scoring**: delegates to :func:`.classifier.score_linear` — the
  weight table broadcasts, featurization is map-only, and the per-doc
  rollup is the only shuffle.
- **Selection**: deterministic Gumbel top-k.  The Gumbel noise derives
  from a tag-salted hash of the document key (fresh coordinate — never
  the split/sample/mix bucket), so the resample is reproducible across
  runs, engines and partitionings and re-keyable by seed.  ``k``-exact
  mode uses Spark's TakeOrdered (heap per partition + driver merge of
  k rows — fine for k up to millions); for larger selections use
  ``threshold`` mode: one ``approxQuantile`` pass picks the score
  cutoff and the verdict is a map-only filter.

Reference analog: none (north-star quality-selection family, like
operators/lmscore.py and operators/classifier.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classifier import DEFAULT_N_FEATURES, featurize, score_linear

__all__ = [
    "feature_counts",
    "importance_weights",
    "score_importance",
    "dsir_select",
]

_GUMBEL_SPACE = 1 << 20


def feature_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = DEFAULT_N_FEATURES,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Bag-of-hashed-ngrams unigram model of a corpus: ``(feature,
    cnt)``.  One map-only explode + ONE shuffle on the feature key
    (map-side partials).  Must be called with the same ``n_features`` /
    ``seed`` / ``portable`` for both corpora of a DSIR run."""
    return (
        featurize(df, id_col, text_col, n_features, seed, portable)
        .groupBy("feature")
        .agg(F.count("*").alias("cnt"))
    )


def importance_weights(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    n_features: int = DEFAULT_N_FEATURES,
    alpha: float = 0.5,
    resolution_bits: int = 20,
) -> DataFrame:
    """Per-feature log importance ratio ``(feature, weight)`` where
    ``weight ≈ log p_target(f) − log p_raw(f)`` under add-α smoothing,
    snapped to the ``2**-resolution_bits`` dyadic grid (so per-doc sums
    are exact — see module docstring).  Both inputs are
    :func:`feature_counts` tables; the join is model-sized (≤
    ``n_features`` rows), never corpus-sized."""
    if alpha <= 0:
        raise ValueError("add-alpha smoothing needs alpha > 0")
    d = int(n_features)
    scale = float(1 << resolution_bits)
    tgt = target_counts.select(
        "feature", F.col("cnt").alias("_ct")
    ).withColumn("_tt", F.sum("_ct").over(_all()))
    raw = raw_counts.select(
        "feature", F.col("cnt").alias("_cr")
    ).withColumn("_tr", F.sum("_cr").over(_all()))
    joined = tgt.join(raw, "feature", "full_outer")
    # totals ride the model rows; a row missing from one side borrows
    # the other total via a max over the joined frame (both totals are
    # plan constants — the window is over ≤ n_features rows)
    joined = joined.withColumn("_tt", F.max("_tt").over(_all())).withColumn(
        "_tr", F.max("_tr").over(_all())
    )
    lw = F.log(
        (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("_tt"), F.lit(0)) + F.lit(alpha * d))
    ) - F.log(
        (F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("_tr"), F.lit(0)) + F.lit(alpha * d))
    )
    return joined.select(
        "feature",
        (F.round(lw * scale) / F.lit(scale)).alias("weight"),
    )


def _all():
    from pyspark.sql import Window

    return Window.partitionBy()


def score_importance(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = DEFAULT_N_FEATURES,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Per-document log importance weight: ``(id_col, dsir_n_feats,
    dsir_logw)``.  Delegates to the classifier's broadcast-join scorer
    (dyadic weights ⇒ ``dsir_logw`` is exact and order-independent);
    NULL-text docs get 0 features and weight 0."""
    scored = score_linear(
        df, weights, id_col, text_col, n_features, seed, 0.0, portable
    )
    return scored.select(
        id_col,
        F.col("clf_n_feats").alias("dsir_n_feats"),
        F.col("clf_logit").alias("dsir_logw"),
    )


def dsir_select(
    df: DataFrame,
    weights: DataFrame,
    k: int | None = None,
    threshold_frac: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = DEFAULT_N_FEATURES,
    seed: int = 42,
    portable: bool = False,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k importance resample: returns the selected rows of
    ``df`` plus ``dsir_logw`` and the ``dsir_key`` they were ranked by
    (``logw / temperature + Gumbel(hash(id))`` — sampling without
    replacement from the softmax of the weights, per Xie 2023).

    Exactly one of ``k`` (exact count — TakeOrdered, driver holds k
    rows) or ``threshold_frac`` (approximate top fraction — the 100 TB
    path) must be given.  Deterministic for fixed ``seed``; re-keyable.

    Threshold mode materializes the NARROW ``(id, score, key)`` frame
    once (``localCheckpoint`` — ~a few dozen bytes/row on executor
    disks) before the ``approxQuantile`` pass: the quantile is an
    action, so un-persisted lineage would re-run the whole
    featurize+join+rollup scoring DAG a second time when the filtered
    result is consumed — doubling the most expensive pass.  The final
    verdict is then a map-only filter plus one enrich join back to
    ``df`` on the id."""
    if (k is None) == (threshold_frac is None):
        raise ValueError("pass exactly one of k / threshold_frac")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    scores = score_importance(
        df, weights, id_col, text_col, n_features, seed, portable
    )
    u = (
        F.pmod(
            F.xxhash64(F.lit("dsir"), F.col(id_col), F.lit(seed)),
            F.lit(_GUMBEL_SPACE),
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_SPACE))
    key = F.col("dsir_logw") / F.lit(float(temperature)) - F.log(
        -F.log(u)
    )
    if k is not None:
        keyed = df.join(scores, id_col).withColumn("dsir_key", key)
        return keyed.orderBy(F.col("dsir_key").desc(), id_col).limit(int(k))
    narrow = scores.withColumn("dsir_key", key).localCheckpoint(eager=True)
    cutoff = narrow.stat.approxQuantile(
        "dsir_key", [1.0 - float(threshold_frac)], 0.001
    )[0]
    return df.join(
        narrow.where(F.col("dsir_key") >= F.lit(cutoff)), id_col
    )

"""DSIR importance resampling (operators/dsir.py): closed-form weight
table, distribution-shift ordering (target-like docs score higher),
dyadic exactness across partitionings, Gumbel top-k determinism, and
the threshold-mode scale path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import dsir


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_feature_counts_bag_model(spark):
    df = _df(spark, [(1, "a b a"), (2, "a")])
    counts = dsir.feature_counts(df, n_features=64)
    total = counts.agg(F.sum("cnt")).first()[0]
    # doc1: 3 unigrams + 2 bigrams; doc2: 1 unigram
    assert total == 6
    assert counts.count() <= 6


def test_importance_weights_closed_form(spark):
    # single shared feature space; hand-check one feature's log ratio
    tgt = spark.createDataFrame([(0, 8), (1, 2)], "feature long, cnt long")
    raw = spark.createDataFrame([(0, 2), (2, 8)], "feature long, cnt long")
    w = {
        r["feature"]: r["weight"]
        for r in dsir.importance_weights(
            raw, tgt, n_features=4, alpha=0.5, resolution_bits=20
        ).collect()
    }
    d, a = 4, 0.5
    tt, tr = 10, 10

    def lw(ct, cr):
        val = math.log((ct + a) / (tt + a * d)) - math.log(
            (cr + a) / (tr + a * d)
        )
        return round(val * 2**20) / 2**20

    assert w[0] == pytest.approx(lw(8, 2), abs=2**-20)
    assert w[1] == pytest.approx(lw(2, 0), abs=2**-20)  # raw-missing
    assert w[2] == pytest.approx(lw(0, 8), abs=2**-20)  # target-missing
    # snapped to the dyadic grid exactly
    for v in w.values():
        assert v * 2**20 == int(v * 2**20)
    with pytest.raises(ValueError):
        dsir.importance_weights(raw, tgt, n_features=4, alpha=0.0)


def test_target_like_docs_outscore_off_target(spark, sf_smoke):
    """The DSIR property: with target = English docs, raw = the whole
    corpus, every-language-but-English documents must average a lower
    importance weight (languages have ~disjoint token sets)."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    kw = dict(n_features=4096)
    w = dsir.importance_weights(
        dsir.feature_counts(docs, **kw),
        dsir.feature_counts(docs.where("lang = 'en'"), **kw),
        **kw,
    )
    scored = docs.join(dsir.score_importance(docs, w, **kw), "doc_id")
    per_doc = scored.withColumn(
        "mean_lw", F.col("dsir_logw") / F.greatest("dsir_n_feats", F.lit(1))
    )
    means = {
        r["lang"]: r["m"]
        for r in per_doc.groupBy("lang")
        .agg(F.avg("mean_lw").alias("m"))
        .collect()
    }
    assert all(means["en"] > means[o] for o in means if o != "en")


def test_logw_bit_identical_across_partitionings(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    kw = dict(n_features=1024)
    w = dsir.importance_weights(
        dsir.feature_counts(docs, **kw),
        dsir.feature_counts(docs.where("lang = 'en'"), **kw),
        **kw,
    ).cache()
    a = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir.score_importance(docs, w, **kw).collect()
    }
    b = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir.score_importance(
            docs.repartition(17), w, **kw
        ).collect()
    }
    assert a == b  # EXACT — dyadic grid sums
    w.unpersist()


def test_select_topk_deterministic_and_biased_to_target(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    kw = dict(n_features=4096)
    w = dsir.importance_weights(
        dsir.feature_counts(docs, **kw),
        dsir.feature_counts(docs.where("lang = 'en'"), **kw),
        **kw,
    ).cache()
    sel = dsir.dsir_select(docs, w, k=100, **kw)
    ids = sorted(r["doc_id"] for r in sel.collect())
    assert len(ids) == 100
    again = sorted(
        r["doc_id"]
        for r in dsir.dsir_select(docs.repartition(13), w, k=100, **kw)
        .collect()
    )
    assert ids == again
    # selection enriched toward the target distribution
    n_en = docs.where("lang = 'en'").count()
    frac_corpus = n_en / docs.count()
    frac_sel = sel.where("lang = 'en'").count() / 100
    assert frac_sel > frac_corpus
    # re-keyable by seed
    other = sorted(
        r["doc_id"]
        for r in dsir.dsir_select(docs, w, k=100, seed=7, **kw).collect()
    )
    assert other != ids
    w.unpersist()


def test_select_threshold_mode_close_to_topk(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    kw = dict(n_features=1024)
    w = dsir.importance_weights(
        dsir.feature_counts(docs, **kw),
        dsir.feature_counts(docs.where("lang = 'zh'"), **kw),
        **kw,
    ).cache()
    n = docs.count()
    sel = dsir.dsir_select(docs, w, threshold_frac=0.2, **kw)
    got = sel.count()
    assert 0.1 * n <= got <= 0.3 * n  # approxQuantile tolerance
    # threshold selection ⊇/≈ the exact top of the same ranking: every
    # selected key must beat the cutoff implied by the k-exact variant
    topk = dsir.dsir_select(docs, w, k=got, **kw)
    top_ids = {r["doc_id"] for r in topk.collect()}
    sel_ids = {r["doc_id"] for r in sel.collect()}
    assert sel_ids == top_ids
    w.unpersist()


def test_select_param_validation(spark):
    df = _df(spark, [(1, "a")])
    w = spark.createDataFrame([(0, 0.5)], "feature long, weight double")
    with pytest.raises(ValueError):
        dsir.dsir_select(df, w)
    with pytest.raises(ValueError):
        dsir.dsir_select(df, w, k=1, threshold_frac=0.5)
    with pytest.raises(ValueError):
        dsir.dsir_select(df, w, k=1, temperature=0.0)

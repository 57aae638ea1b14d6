"""Hashed-feature linear classifier (operators/classifier.py):
featurization closed form, dyadic-exact logits (bit-identical across
partitionings), broadcast plan shape, portable-hash parity, and
empty-doc edges."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import classifier


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_featurize_bag_semantics(spark):
    df = _df(spark, [(1, "a b a")])
    feats = classifier.featurize(df, n_features=64).collect()
    # 3 unigrams + 2 bigrams, multiplicity preserved
    assert len(feats) == 5
    assert all(0 <= r["feature"] < 64 for r in feats)
    # 'a' hashes identically both times
    uni = classifier.featurize(
        _df(spark, [(1, "a"), (2, "a")]), n_features=64
    ).collect()
    assert uni[0]["feature"] == uni[1]["feature"]


def test_score_closed_form_against_manual_weights(spark):
    df = _df(spark, [(1, "a b"), (2, "")])
    feats = {
        r["feature"]
        for r in classifier.featurize(df, n_features=64).collect()
    }
    # weight every observed feature 0.25, everything else -1
    weights = spark.range(64).select(
        F.col("id").alias("feature"),
        F.when(F.col("id").isin(list(feats)), 0.25)
        .otherwise(-1.0)
        .alias("weight"),
    )
    out = _by_id(
        classifier.score_linear(df, weights, n_features=64, bias=0.125)
    )
    # doc 1: grams a, b, 'a b' -> 3 * 0.25 + bias
    assert out[1]["clf_n_feats"] == 3
    assert out[1]["clf_logit"] == 0.875  # exact dyadic
    assert out[1]["clf_label"] is True
    assert out[1]["clf_prob"] == pytest.approx(
        1 / (1 + math.exp(-0.875)), rel=1e-12
    )
    # empty doc: split('') -> [''], one unigram feature
    assert out[2]["clf_n_feats"] == 1


def test_logit_bit_identical_across_partitionings(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    w = classifier.pseudo_weights(spark, 4096)
    a = {
        r["doc_id"]: r["clf_logit"]
        for r in classifier.score_linear(
            docs, w, n_features=4096
        ).collect()
    }
    b = {
        r["doc_id"]: r["clf_logit"]
        for r in classifier.score_linear(
            docs.repartition(17), w, n_features=4096
        ).collect()
    }
    # EXACT equality — dyadic sums are order-independent in float64
    assert a == b
    assert any(v != 0.0 for v in a.values())


def test_portable_and_production_hash_modes_both_work(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    for portable in (False, True):
        w = classifier.pseudo_weights(spark, 256, portable=portable)
        out = classifier.score_linear(
            docs.limit(20), w, n_features=256, portable=portable
        )
        rows = out.collect()
        assert len(rows) == 20
        assert all(r["clf_n_feats"] > 0 for r in rows)


def test_pseudo_weights_dyadic_grid(spark):
    rows = classifier.pseudo_weights(spark, 512, resolution_bits=10).collect()
    assert len(rows) == 512
    for r in rows:
        v = r["weight"] * 1024
        assert v == int(v)  # exactly on the 2^-10 grid
        assert -1.0 <= r["weight"] < 1.0


def test_weight_join_is_broadcast(spark):
    df = _df(spark, [(1, "a b c")])
    w = classifier.pseudo_weights(spark, 256)
    plan = (
        classifier.score_linear(df, w, n_features=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_param_validation(spark):
    df = _df(spark, [(1, "a")])
    with pytest.raises(ValueError):
        classifier.featurize(df, n_features=1)

"""Bigram-LM quality scoring (operators/lmscore.py): closed-form model
counts, add-k smoothed log-probabilities, OOV accounting, short-doc and
NULL-text edges, and the CCNet-shaped filter property (reference-like
docs score lower perplexity than gibberish)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import lmscore


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_train_counts_closed_form(spark):
    df = _df(spark, [(1, "a b a b c"), (2, "a b")])
    model = {
        (r["w1"], r["w2"]): (r["cnt"], r["ctx_cnt"])
        for r in lmscore.train_bigram_lm(df).collect()
    }
    # bigrams: doc1 = ab, ba, ab, bc; doc2 = ab
    assert model[("a", "b")] == (3, 3)  # ctx 'a' appears 3x as w1
    assert model[("b", "a")] == (1, 2)  # ctx 'b' = ba + bc
    assert model[("b", "c")] == (1, 2)
    assert len(model) == 3


def test_score_closed_form_add_k(spark):
    train = _df(spark, [(1, "a b a b c"), (2, "a b")])
    model = lmscore.train_bigram_lm(train)
    # vocab_size = distinct w1 = {a, b} = 2; k = 0.5
    out = _by_id(
        lmscore.score_documents(
            _df(spark, [(10, "a b c"), (11, "z z")]), model, k=0.5
        )
    )
    d = out[10]  # bigrams ab (cnt 3 / ctx 3), bc (cnt 1 / ctx 2)
    assert (d["lm_n_bigrams"], d["lm_n_oov"], d["lm_sum_cnt"]) == (2, 0, 4)
    exp = (math.log(3.5 / 4.0) + math.log(1.5 / 3.0)) / 2
    assert d["lm_logprob"] == pytest.approx(exp, rel=1e-12)
    assert d["lm_ppl"] == pytest.approx(math.exp(-exp), rel=1e-12)
    z = out[11]  # zz unseen: (0+0.5)/(0+0.5*2)
    assert (z["lm_n_bigrams"], z["lm_n_oov"], z["lm_sum_cnt"]) == (1, 1, 0)
    assert z["lm_logprob"] == pytest.approx(math.log(0.5 / 1.0), rel=1e-12)


def test_short_and_null_docs_pass_through(spark):
    model = lmscore.train_bigram_lm(_df(spark, [(1, "a b")]))
    out = _by_id(
        lmscore.score_documents(
            _df(spark, [(1, "solo"), (2, None), (3, "")]), model
        )
    )
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert (r["lm_n_bigrams"], r["lm_n_oov"], r["lm_sum_cnt"]) == (0, 0, 0)
        assert r["lm_logprob"] is None and r["lm_ppl"] is None


def test_reference_like_beats_gibberish(spark, sf_smoke):
    """The CCNet property: docs drawn from the reference distribution
    get lower perplexity than shuffled-vocab gibberish."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    model = lmscore.train_bigram_lm(docs)
    real = lmscore.score_documents(docs.limit(50), model)
    # gibberish: reverse each doc's tokens (destroys bigram statistics
    # deterministically, keeps the unigram distribution)
    gib = docs.limit(50).select(
        "doc_id",
        F.array_join(F.reverse(F.split("text", " ")), " ").alias("text"),
    )
    fake = lmscore.score_documents(gib, model)
    real_ppl = real.agg(F.avg("lm_ppl")).first()[0]
    fake_ppl = fake.agg(F.avg("lm_ppl")).first()[0]
    assert real_ppl < fake_ppl


def test_vocab_size_pinning_and_validation(spark):
    df = _df(spark, [(1, "a b c")])
    model = lmscore.train_bigram_lm(df)
    a = lmscore.score_documents(df, model, vocab_size=100).collect()
    b = lmscore.score_documents(df, model, vocab_size=100).collect()
    assert a == b
    with pytest.raises(ValueError):
        lmscore.score_documents(df, model, k=0)


def test_deterministic_across_repartition(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    model = lmscore.train_bigram_lm(docs)
    a = sorted(
        (r["doc_id"], r["lm_n_bigrams"], r["lm_n_oov"], r["lm_sum_cnt"])
        for r in lmscore.score_documents(docs, model).collect()
    )
    b = sorted(
        (r["doc_id"], r["lm_n_bigrams"], r["lm_n_oov"], r["lm_sum_cnt"])
        for r in lmscore.score_documents(
            docs.repartition(13), model.repartition(7)
        ).collect()
    )
    assert a == b


def test_unseen_continuation_uses_attested_context_denominator(spark):
    """Regression (round-5 review): an UNSEEN continuation of a
    frequent context must take that context's full denominator —
    P(unseen|w1) = k/(ctx+kV) — and must score strictly BELOW any
    attested continuation.  (A pair-denormalized ctx would give the
    unseen pair k/(0+kV), ranking gibberish above real rare bigrams.)"""
    train = _df(spark, [(1, "a b a b a b a c")])
    model = lmscore.train_bigram_lm(train)  # ctx('a') = 4
    out = _by_id(
        lmscore.score_documents(
            _df(spark, [(10, "a z"), (11, "a c")]), model,
            k=0.5, vocab_size=2,
        )
    )
    # unseen (a,z): (0+0.5)/(4+1) = 0.1
    assert out[10]["lm_logprob"] == pytest.approx(math.log(0.5 / 5.0))
    # seen rare (a,c): (1+0.5)/(4+1) = 0.3 — strictly more probable
    assert out[11]["lm_logprob"] == pytest.approx(math.log(1.5 / 5.0))
    assert out[11]["lm_logprob"] > out[10]["lm_logprob"]


def test_quality_buckets_ccnet_split(spark, sf_smoke):
    """head/middle/tail partition the corpus ~evenly, head strictly
    beats tail on mean perplexity, NULL-ppl docs land in the tail,
    and the verdict adds no shuffle."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    model = lmscore.train_bigram_lm(docs)
    scored = lmscore.score_documents(
        docs, model, vocab_size=4096
    ).localCheckpoint()
    out = lmscore.quality_buckets(scored)
    counts = {r["lm_bucket"]: r["n"] for r in
              out.groupBy("lm_bucket").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"head", "middle", "tail"}
    for b in counts:
        assert 0.2 * n <= counts[b] <= 0.5 * n, counts
    means = {r["lm_bucket"]: r["m"] for r in
             out.groupBy("lm_bucket").agg(F.avg("lm_ppl").alias("m")).collect()}
    assert means["head"] < means["middle"] < means["tail"]
    # NULL perplexity -> tail
    nulls = lmscore.quality_buckets(
        scored.withColumn("lm_ppl", F.lit(None).cast("double"))
    )
    assert nulls.where("lm_bucket != 'tail'").count() == 0
    # the verdict is a projection on the checkpointed scores
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        lmscore.quality_buckets(scored, labels=("a", "b"))
    with pytest.raises(ValueError):
        lmscore.quality_buckets(scored, fracs=(0.9, 0.1))

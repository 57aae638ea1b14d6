"""Token-budget corpus mixing (operators/mixing.py): water-filling
rates, budget adherence, determinism, exclusion, and the map-only plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import mixing


# ---------------------------------------------------------------- rates

def test_gate_constants_sit_in_the_saturation_regime(spark):
    """The q_split_assign mix branch (weights en .2/fr .2/de .6, budget
    = 50% of weighted tokens) pins the SATURATION + redistribution path
    of the water-filling: de must saturate at 1.0 and en/fr must land
    strictly below 1 at every driver SF, and mixing_rates must agree
    with the gate SQL's closed form rate = 0.5·(0.5·wtot − de)/lang."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        toks = {
            r["lang"]: r["t"]
            for r in docs.groupBy("lang")
            .agg(
                F.sum(
                    F.length("text")
                    - F.length(F.replace("text", F.lit(" "), F.lit("")))
                    + 1
                ).alias("t")
            )
            .collect()
        }
        weighted = {d: toks[d] for d in ("en", "fr", "de")}
        wtot = sum(weighted.values())
        budget = int(0.5 * wtot)
        rates = mixing.mixing_rates(
            weighted, {"en": 0.2, "fr": 0.2, "de": 0.6}, budget
        )
        assert rates["de"] == 1.0, f"{sf}: de must saturate"
        for lang in ("en", "fr"):
            closed = 0.5 * (budget - weighted["de"]) / weighted[lang]
            assert rates[lang] == pytest.approx(closed, rel=1e-12), sf
            assert 0.0 < rates[lang] < 0.95, (
                f"{sf}: {lang} rate {rates[lang]:.3f} too close to a "
                "second-round saturation — re-pick the gate constants"
            )


def test_rates_simple_proportional():
    rates = mixing.mixing_rates(
        {"web": 1000, "code": 1000}, {"web": 0.75, "code": 0.25}, 800
    )
    assert rates == {"web": 0.6, "code": 0.2}


def test_rates_saturation_redistributes():
    # code can only supply 100 of its 400-token share; the unused 300
    # flows to web (the only unsaturated domain).
    rates = mixing.mixing_rates(
        {"web": 10_000, "code": 100}, {"web": 0.5, "code": 0.5}, 800
    )
    assert rates["code"] == 1.0
    assert rates["web"] == pytest.approx(700 / 10_000)


def test_rates_everything_saturates_under_big_budget():
    rates = mixing.mixing_rates(
        {"a": 10, "b": 20}, {"a": 0.5, "b": 0.5}, 1_000_000
    )
    assert rates == {"a": 1.0, "b": 1.0}


def test_rates_weights_renormalized_and_validated():
    r1 = mixing.mixing_rates({"a": 100, "b": 100}, {"a": 2.0, "b": 2.0}, 100)
    r2 = mixing.mixing_rates({"a": 100, "b": 100}, {"a": 0.5, "b": 0.5}, 100)
    assert r1 == r2
    with pytest.raises(ValueError):
        mixing.mixing_rates({"a": 100}, {"a": 1.0, "ghost": 1.0}, 10)
    with pytest.raises(ValueError):
        mixing.mixing_rates({"a": 100}, {"a": 0.0}, 10)


def test_rates_empty_domain_is_zero():
    rates = mixing.mixing_rates(
        {"a": 0, "b": 100}, {"a": 0.5, "b": 0.5}, 50
    )
    assert rates["a"] == 0.0
    assert rates["b"] == pytest.approx(0.5)


def test_rates_budget_exhausted_by_saturation():
    # a (tokens=80) saturates against its 50-share? No: want=50<80, so no
    # saturation; but with budget 200, a wants 100 > 80 -> saturates,
    # leaving 120 for b (rate 120/1000).
    rates = mixing.mixing_rates(
        {"a": 80, "b": 1000}, {"a": 0.5, "b": 0.5}, 200
    )
    assert rates["a"] == 1.0
    assert rates["b"] == pytest.approx(120 / 1000)


def test_gate_constants_sit_in_the_upsampling_regime(spark):
    """The q_split_assign mix_epochs column (weights de .6/en .4,
    budget = 1.1 × (de+en tokens), max_epochs=2) pins the UPSAMPLING
    path: de's uncapped want must clear the 2-epoch cap with margin at
    every driver SF (so it caps at exactly 2.0) and en must land
    strictly inside (0, 1) matching the gate SQL's closed form
    rate = (1.1·deen − 2·de)/en."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        toks = {
            r["lang"]: r["t"]
            for r in docs.groupBy("lang")
            .agg(
                F.sum(
                    F.length("text")
                    - F.length(F.replace("text", F.lit(" "), F.lit("")))
                    + 1
                ).alias("t")
            )
            .collect()
        }
        weighted = {d: toks[d] for d in ("de", "en")}
        deen = sum(weighted.values())
        budget = 1.1 * deen
        # margin: de's uncapped want must exceed the cap by >= 10%
        want_de = 0.6 * budget
        assert want_de >= 2.2 * weighted["de"], (
            f"{sf}: de want {want_de / weighted['de']:.2f} epochs — too "
            "close to the 2.0 cap, re-pick the gate constants"
        )
        rates = mixing.mixing_rates(
            weighted, {"de": 0.6, "en": 0.4}, budget, max_epochs=2
        )
        assert rates["de"] == 2.0, f"{sf}: de must cap at 2 epochs"
        closed = (1.1 * deen - 2.0 * weighted["de"]) / weighted["en"]
        assert rates["en"] == pytest.approx(closed, rel=1e-12), sf
        assert 0.0 < rates["en"] < 0.95, (
            f"{sf}: en rate {rates['en']:.3f} too close to saturation — "
            "re-pick the gate constants"
        )


def test_rates_upsampling_cap_and_redistribution():
    # scarce wants 500 of the 1000 budget but holds only 100 tokens:
    # with max_epochs=3 it caps at 3.0 (300 tokens), and the remaining
    # 700 flows to web (rate 700/10000)
    rates = mixing.mixing_rates(
        {"web": 10_000, "scarce": 100},
        {"web": 0.5, "scarce": 0.5},
        1_000,
        max_epochs=3,
    )
    assert rates["scarce"] == 3.0
    assert rates["web"] == pytest.approx(700 / 10_000)
    # max_epochs=1 reduces to the classic saturation behavior
    one = mixing.mixing_rates(
        {"web": 10_000, "scarce": 100}, {"web": 0.5, "scarce": 0.5}, 1_000
    )
    assert one["scarce"] == 1.0
    assert one["web"] == pytest.approx(900 / 10_000)
    with pytest.raises(ValueError):
        mixing.mixing_rates({"a": 10}, {"a": 1.0}, 10, max_epochs=0)


def test_rates_fractional_epochs_between_one_and_cap():
    # budget lets scarce run 2.5 epochs, under its cap of 4 — the rate
    # is the plain proportional value, no redistribution
    rates = mixing.mixing_rates(
        {"web": 10_000, "scarce": 100},
        {"web": 0.75, "scarce": 0.25},
        1_000,
        max_epochs=4,
    )
    assert rates["scarce"] == pytest.approx(2.5)
    assert rates["web"] == pytest.approx(750 / 10_000)


# ------------------------------------------------------------ dataframe

def _docs(spark, sf_smoke):
    df = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    return df.withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))


def test_mix_budget_hit_in_expectation(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    weights = {"en": 0.5, "fr": 0.25, "de": 0.25}
    budget = 4_000
    out = mixing.mix_corpora(
        docs, "lang", "doc_id", "n_tokens", weights, budget
    )
    got = (
        out.where("in_mix")
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    )
    by_lang = {r["lang"]: r["toks"] for r in got}
    # only weighted domains appear
    assert set(by_lang) <= set(weights)
    total = sum(by_lang.values())
    # expectation-level adherence at toy scale: within 35% of budget
    assert 0.65 * budget <= total <= 1.35 * budget
    # per-domain share roughly follows the weights
    assert by_lang["en"] > by_lang["fr"]


def test_mix_excluded_domains_flag_false(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    out = mixing.mix_corpora(
        docs, "lang", "doc_id", "n_tokens", {"en": 1.0}, 10_000
    )
    assert (
        out.where((F.col("lang") != "en") & F.col("in_mix")).count() == 0
    )


def test_mix_saturated_domain_fully_included(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    # budget far above the corpus: every weighted domain saturates
    out = mixing.mix_corpora(
        docs, "lang", "doc_id", "n_tokens", {"en": 0.5, "zh": 0.5}, 10**9
    )
    n_en = docs.where("lang = 'en'").count()
    assert out.where("in_mix and lang = 'en'").count() == n_en
    assert (out.where("lang = 'en'").select(F.min("mix_rate")).first()[0]
            == 1.0)


def test_mix_deterministic_and_stable_under_repartition(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    kw = dict(
        domain_col="lang", id_col="doc_id", token_col="n_tokens",
        weights={"en": 0.6, "es": 0.4}, token_budget=3_000,
    )
    a = {
        r["doc_id"]
        for r in mixing.mix_corpora(docs, **kw).where("in_mix").collect()
    }
    b = {
        r["doc_id"]
        for r in mixing.mix_corpora(docs.repartition(13), **kw)
        .where("in_mix")
        .collect()
    }
    assert a == b and len(a) > 0


def test_mix_upsampling_epochs_and_explode(spark, sf_smoke):
    """max_epochs>1: capped domains repeat exactly floor(rate) (+1 on
    the fractional hash), explode_epochs materializes the repeats
    map-only, and realized token counts land near rate × corpus."""
    docs = _docs(spark, sf_smoke)
    toks = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    budget = int(1.1 * (toks["de"] + toks["en"]))
    out = mixing.mix_corpora(
        docs, "lang", "doc_id", "n_tokens",
        {"de": 0.6, "en": 0.4}, budget,
        max_epochs=2, epochs_col="mix_epochs",
    )
    # de caps at exactly 2 epochs for EVERY row (frac = 0)
    de_epochs = {
        r["mix_epochs"] for r in out.where("lang = 'de'").collect()
    }
    assert de_epochs == {2}
    # en takes 0-or-1 via the fractional hash; realized tokens near rate
    en_rate = (1.1 * (toks["de"] + toks["en"]) - 2 * toks["de"]) / toks["en"]
    got = (
        out.where("lang = 'en' and in_mix")
        .agg(F.sum("n_tokens"))
        .first()[0]
    )
    assert 0.6 * en_rate * toks["en"] <= got <= 1.4 * en_rate * toks["en"]
    # unweighted langs: 0 epochs, flag False
    assert out.where("lang = 'fr' and mix_epochs != 0").count() == 0
    # explode: one row per (doc, epoch), map-only
    exploded = mixing.explode_epochs(out, "mix_epochs")
    n_de = docs.where("lang = 'de'").count()
    assert exploded.where("lang = 'de'").count() == 2 * n_de
    assert (
        exploded.where("lang = 'de'").select("epoch").distinct().count()
        == 2
    )
    plan = exploded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    # epochs col is mandatory once the cap allows repeats
    with pytest.raises(ValueError):
        mixing.mix_corpora(
            docs, "lang", "doc_id", "n_tokens", {"de": 1.0}, budget,
            max_epochs=2,
        )


def test_mix_verdict_pass_is_map_only(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    out = mixing.mix_corpora(
        docs, "lang", "doc_id", "n_tokens", {"en": 0.5, "fr": 0.5}, 2_000
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # verdicts come from a BROADCAST hash join against the tiny
    # (domain, rate) table — map-side; no shuffle exchange anywhere
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


# ------------------------------------------------- deterministic shuffle

def test_shuffle_rows_is_deterministic_permutation(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.operators.split import (
        shuffle_rows,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    a = [r["doc_id"] for r in shuffle_rows(docs, "doc_id").collect()]
    b = [
        r["doc_id"]
        for r in shuffle_rows(docs.repartition(9), "doc_id").collect()
    ]
    assert a == b
    assert sorted(a) == sorted(r["doc_id"] for r in docs.collect())
    assert a != sorted(a)  # actually permuted
    c = [r["doc_id"] for r in shuffle_rows(docs, "doc_id", seed=7).collect()]
    assert c != a  # re-keyable by seed


def test_shuffle_rows_sharded_matches_global_order(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.operators.split import (
        shuffle_rows,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    flat = [r["doc_id"] for r in shuffle_rows(docs, "doc_id").collect()]
    sharded = shuffle_rows(docs, "doc_id", num_shards=4).collect()
    # shard ids cover [0, 4), are a pure function of the key (stable
    # under repartitioning), and walking shards in order reproduces the
    # global permutation
    assert {r["shard_id"] for r in sharded} == {0, 1, 2, 3}
    again = {
        r["doc_id"]: r["shard_id"]
        for r in shuffle_rows(
            docs.repartition(7), "doc_id", num_shards=4
        ).collect()
    }
    assert all(again[r["doc_id"]] == r["shard_id"] for r in sharded)
    walked = [
        r["doc_id"]
        for r in sorted(sharded, key=lambda r: r["shard_id"])
    ]
    # rows within the collect() stay in global hash order; sorting by
    # shard must not reorder (shards are contiguous hash intervals)
    assert walked == flat


def test_rates_zero_weight_domain_alongside_saturation():
    """A zero-weight domain must not crash the water-filling loop once
    the positive-weight domains saturate."""
    rates = mixing.mixing_rates(
        {"a": 10, "b": 100}, {"a": 1.0, "b": 0.0}, 50
    )
    assert rates == {"a": 1.0, "b": 0.0}


def test_mix_coordinate_independent_of_split(spark, sf_smoke):
    """At default seeds, the mix selection must NOT coincide with any
    hash_split band (the train-on-test hazard the tag salt prevents)."""
    from csce438_distributed_password_cracker_spark.operators.split import (
        hash_split,
    )

    docs = _docs(spark, sf_smoke).where("lang = 'en'")
    out = mixing.mix_corpora(
        hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
        "lang", "doc_id", "n_tokens", {"en": 1.0},
        int(docs.agg(F.sum("n_tokens")).first()[0] * 0.1),
    )
    picked = out.where("in_mix")
    # ~10% mix over a 10% test band: exact coincidence would make every
    # picked row 'test'; independence leaves most picked rows elsewhere
    n = picked.count()
    n_test = picked.where("split = 'test'").count()
    assert n > 0 and n_test < n / 2


# ----------------------------------------------------- rate properties

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.data())
@settings(max_examples=200)
def test_rates_invariants(data):
    """Water-filling invariants over random instances: rates in [0,1];
    expected selected tokens == min(budget, supply of positive-weight
    domains); saturated domains exhaust before unsaturated ones cap."""
    n = data.draw(st.integers(1, 6))
    domains = [f"d{i}" for i in range(n)]
    tokens = {
        d: data.draw(st.integers(0, 10_000), label=f"tok_{d}")
        for d in domains
    }
    # exact zeros are an interesting case; denormal weights (5e-324)
    # underflow to 0 during renormalization, which is acceptable
    # behavior but breaks the closed-form oracle below — exclude them
    weights = {
        d: data.draw(
            st.one_of(st.just(0.0), st.floats(1e-3, 10)),
            label=f"w_{d}",
        )
        for d in domains
    }
    budget = data.draw(st.integers(0, 50_000), label="budget")
    if sum(weights.values()) <= 0:
        with pytest.raises(ValueError):
            mixing.mixing_rates(tokens, weights, budget)
        return
    rates = mixing.mixing_rates(tokens, weights, budget)
    assert set(rates) == set(domains)
    assert all(0.0 <= r <= 1.0 for r in rates.values())
    expected = sum(rates[d] * tokens[d] for d in domains)
    supply = sum(tokens[d] for d in domains if weights[d] > 0)
    assert expected == pytest.approx(min(budget, supply), rel=1e-9, abs=1e-6)
    # monotone in budget: a bigger budget never lowers any domain's rate
    bigger = mixing.mixing_rates(tokens, weights, budget + 1_000)
    assert all(bigger[d] >= rates[d] - 1e-12 for d in domains)


@given(st.data())
@settings(max_examples=200)
def test_rates_invariants_with_upsampling(data):
    """Same water-filling invariants under an epoch cap: rates in
    [0, max_epochs]; expected selected tokens == min(budget, supply ×
    max_epochs); the cap is monotone (a higher cap never lowers the
    total takeable mass)."""
    n = data.draw(st.integers(1, 5))
    domains = [f"d{i}" for i in range(n)]
    tokens = {
        d: data.draw(st.integers(0, 10_000), label=f"tok_{d}")
        for d in domains
    }
    weights = {
        d: data.draw(st.floats(1e-3, 10), label=f"w_{d}") for d in domains
    }
    budget = data.draw(st.integers(0, 100_000), label="budget")
    cap = data.draw(
        st.sampled_from([1.0, 1.5, 2.0, 3.0, 4.0]), label="cap"
    )
    rates = mixing.mixing_rates(tokens, weights, budget, max_epochs=cap)
    assert all(0.0 <= r <= cap + 1e-12 for r in rates.values())
    expected = sum(rates[d] * tokens[d] for d in domains)
    supply = sum(tokens[d] for d in domains if weights[d] > 0)
    assert expected == pytest.approx(
        min(budget, supply * cap), rel=1e-9, abs=1e-6
    )


def test_mix_non_string_domain_column(spark):
    """The rates table takes the input's domain dtype — integer domain
    ids (a real source-id column) must work end-to-end."""
    df = spark.createDataFrame(
        [(i, i % 3, 10) for i in range(60)],
        "doc_id long, source_id int, n_tokens long",
    )
    out = mixing.mix_corpora(
        df, "source_id", "doc_id", "n_tokens", {0: 0.5, 1: 0.5}, 200
    )
    rows = out.collect()
    assert len(rows) == 60
    assert any(r["in_mix"] for r in rows)
    assert all(not r["in_mix"] for r in rows if r["source_id"] == 2)

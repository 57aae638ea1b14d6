"""Heavy hitters (operators/freq.py): the Misra-Gries mergeable-summary
guarantees as hypothesis properties over a pure-Python model, and the
distributed two-pass sieve pinned EXACTLY equal to the brute-force
GROUP BY ... HAVING on skewed data.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators.freq import (
    heavy_hitters,
    mg_merge,
    mg_partials,
    sieved_candidates,
)

# ── pure-Python MG properties ─────────────────────────────────────────────


@given(st.data())
@settings(max_examples=200)
def test_mg_merge_error_bound_and_no_false_negatives(data):
    """Feeding a stream through mg_merge in arbitrary batch cuts keeps
    (a) ≤ k counters, (b) undercount ≤ n/(k+1) for EVERY item, hence
    (c) every item with true count > n/(k+1) still present — the
    pigeonhole step the distributed sieve's exactness rests on."""
    k = data.draw(st.integers(min_value=1, max_value=12))
    stream = data.draw(
        st.lists(st.integers(min_value=0, max_value=20), max_size=300)
    )
    # arbitrary batch boundaries: the summary must not care how the
    # Arrow reader happened to chunk the partition
    summary: dict = {}
    i = 0
    while i < len(stream):
        step = data.draw(st.integers(min_value=1, max_value=50))
        batch = Counter(stream[i : i + step])
        summary = mg_merge(summary, batch, k)
        i += step
    true = Counter(stream)
    n = len(stream)
    assert len(summary) <= k
    for item, c in true.items():
        est = summary.get(item, 0)
        assert est <= c  # MG never overcounts
        assert c - est <= n / (k + 1)
        if c > n / (k + 1):
            assert item in summary


# ── distributed sieve vs brute force ──────────────────────────────────────


def _skewed_df(spark, n=40_000, seed=7):
    """Zipf-ish item stream: a few heavy items + a long unique tail —
    the distribution heavy_hitters exists for."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.25:
            rows.append("alpha")
        elif r < 0.40:
            rows.append("beta")
        elif r < 0.47:
            rows.append("gamma")
        elif r < 0.50:
            rows.append("delta")
        else:
            rows.append(f"tail_{i}")  # unique — can never pass
    return spark.createDataFrame(
        [(x,) for x in rows], ["item"]
    ).repartition(8)


def test_heavy_hitters_exact_vs_brute_force(spark):
    df = _skewed_df(spark)
    for den in (5, 10, 25):
        got = {
            (r["item"], r["cnt"])
            for r in heavy_hitters(df, "item", den=den).collect()
        }
        total = df.count()
        brute = {
            (r["item"], r["cnt"])
            for r in df.groupBy("item")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") * den > total)
            .collect()
        }
        assert got == brute, f"den={den}"
    # den=5 keeps only alpha; den=25 pulls in gamma/delta too
    assert {r["item"] for r in heavy_hitters(df, "item", den=5).collect()} == {
        "alpha"
    }


def test_heavy_hitters_partition_invariance_and_empty(spark):
    df = _skewed_df(spark, n=5_000)
    a = sorted(map(tuple, heavy_hitters(df, "item", den=10).collect()))
    b = sorted(
        map(tuple, heavy_hitters(df.repartition(3), "item", den=10).collect())
    )
    assert a == b
    # the top item holds ~25% share, so a 1/3 threshold keeps nothing —
    # result is empty but keeps the declared schema
    out = heavy_hitters(df, "item", den=3)
    assert out.columns == ["item", "cnt"]
    assert out.count() == 0


def test_heavy_hitters_guards(spark):
    df = _skewed_df(spark, n=100)
    with pytest.raises(ValueError, match="k\\+1"):
        heavy_hitters(df, "item", den=30, k=10)
    with pytest.raises(ValueError, match="den"):
        heavy_hitters(df, "item", den=1)


def test_mg_partials_sentinel_totals_and_bound(spark):
    df = _skewed_df(spark, n=3_000)
    rows = mg_partials(df, "item", k=16).collect()
    total = sum(r["est"] for r in rows if r["item"] is None)
    assert total == 3_000
    # ≤ k survivors per partition (8 partitions from _skewed_df)
    assert sum(1 for r in rows if r["item"] is not None) <= 16 * 8


def test_heavy_hitters_preserves_item_dtype(spark):
    df = spark.createDataFrame(
        [(i % 3,) for i in range(300)], "user_id long"
    )
    out = heavy_hitters(df, "user_id", den=5)
    assert dict(out.dtypes)["user_id"] == "bigint"
    assert {(r["user_id"], r["cnt"]) for r in out.collect()} == {
        (0, 100), (1, 100), (2, 100),
    }


def test_sieve_collect_input_is_merged_and_candidate_bounded(spark):
    """The driver collect's input frame is the MERGED summary table
    (one Exchange hashpartitioning on item upstream of the collect),
    and its row count is O(true candidates) — NOT O(partitions*k):
    with 8 partitions and k=16 the unmerged partials can carry up to
    128 rows for the same item set, but the sieved frame must hold
    only items whose upper bound crosses the threshold."""
    den, k = 5, 16
    df = _skewed_df(spark, n=3_000)
    partials = mg_partials(df, "item", k)
    sieved = sieved_candidates(partials, den, k)

    plan = sieved._jdf.queryExecution().executedPlan().toString()
    # the merge shuffle sits between the MG sweep and the collect
    assert "Exchange hashpartitioning(item" in plan
    # the total's 1-row frame joins back broadcast, never shuffled
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    rows = sieved.collect()
    n_partials = sum(
        1 for r in partials.collect() if r["item"] is not None
    )
    # merged+sieved is never larger than the raw partial stream, and
    # every surviving row satisfies the integer upper-bound test
    assert len(rows) <= n_partials
    total = 3_000
    for r in rows:
        assert r["__total"] == total
        assert (r["est"] * (k + 1) + total) * den > total * (k + 1)
    # completeness: every true heavy hitter is among the candidates
    truth = {
        r["item"]
        for r in df.groupBy("item").count().collect()
        if r["count"] * den > total
    }
    assert truth <= {r["item"] for r in rows}


def test_heavy_hitters_is_lazy_and_releasable(spark):
    """Round-7 convergence: the GLOBAL operator shares the grouped
    sibling's fully-lazy shape — the exact pass semi-joins the sieved
    candidate FRAME (no driver collect, no isin literal list), the
    threshold compares against the broadcast 1-row total, and the
    ``handle=[]`` out-param exposes the persisted summaries for
    deterministic release."""
    df = _skewed_df(spark, n=3_000)
    h: list = []
    out = heavy_hitters(df, "item", den=10, handle=h)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "In(item" not in plan  # no collected literal list
    # building the plan ran NO job; materialize, then release
    got = {(r["item"], r["cnt"]) for r in out.collect()}
    total = 3_000
    brute = {
        (r["item"], r["cnt"])
        for r in df.groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * 10 > total)
        .collect()
    }
    assert got == brute
    [partials] = h
    assert partials.storageLevel.useMemory  # persisted until released
    partials.unpersist()
    assert not partials.storageLevel.useMemory


def _grouped_df(spark, seed=11):
    """Three domains with different sizes and different heavy items —
    a global threshold would miss the small domain's boilerplate."""
    rng = random.Random(seed)
    rows = []
    for i in range(6_000):
        rows.append(("big", "big_hot" if rng.random() < 0.3 else f"bt{i}"))
    for i in range(600):
        rows.append(
            ("mid", "mid_hot" if rng.random() < 0.3 else f"mt{i}")
        )
    for i in range(60):
        rows.append(
            ("small", "sm_hot" if rng.random() < 0.5 else f"st{i}")
        )
    rows.append((None, "null_grp_item"))  # NULL group = its own stratum
    rows.append((None, "null_grp_item"))
    rows.append((None, "other"))
    return spark.createDataFrame(rows, ["domain", "item"]).repartition(8)


def test_grouped_heavy_hitters_exact_vs_brute_force(spark):
    from csce438_distributed_password_cracker_spark.operators.freq import (
        grouped_heavy_hitters,
    )

    df = _grouped_df(spark)
    for den in (4, 8):
        got = {
            (r["domain"], r["item"], r["cnt"], r["grp_total"])
            for r in grouped_heavy_hitters(
                df, "domain", "item", den=den
            ).collect()
        }
        tot = {
            r["domain"]: r["n"]
            for r in df.groupBy("domain")
            .agg(F.count("item").alias("n"))
            .collect()
        }
        brute = {
            (r["domain"], r["item"], r["cnt"], tot[r["domain"]])
            for r in df.groupBy("domain", "item")
            .agg(F.count("*").alias("cnt"))
            .collect()
            if r["cnt"] * den > tot[r["domain"]]
        }
        assert got == brute, f"den={den}"
    # each domain's hot item survives ITS OWN threshold — including the
    # small domain a global threshold would drown, and the NULL group
    items = {
        (r["domain"], r["item"])
        for r in grouped_heavy_hitters(df, "domain", "item", den=4).collect()
    }
    assert {"big_hot", "mid_hot", "sm_hot"} <= {i for _, i in items}
    assert (None, "null_grp_item") in items


def test_grouped_heavy_hitters_stays_a_dataframe_plan(spark):
    """The exact pass must semi-join against the sieved candidate FRAME
    (no driver collect of O(groups*k) rows, no isin literal list) and
    the group joins must be null-safe."""
    from csce438_distributed_password_cracker_spark.operators.freq import (
        grouped_heavy_hitters,
    )

    df = _grouped_df(spark)
    h: list = []
    out = grouped_heavy_hitters(df, "domain", "item", den=4, handle=h)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "In(item" not in plan  # no collected literal list
    # the release handle exposes the persisted MERGED summaries
    [merged] = h
    assert merged.storageLevel.useMemory
    merged.unpersist()
    assert not merged.storageLevel.useMemory
    # guards
    with pytest.raises(ValueError, match="k\\+1"):
        grouped_heavy_hitters(df, "domain", "item", den=30, k=10)
    with pytest.raises(ValueError, match="den"):
        grouped_heavy_hitters(df, "domain", "item", den=1)

"""Sequence packing (operators/packing.py): budget bound, coverage,
determinism, utilization, and the oversized-doc guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import packing

BUDGET = 512


def _docs(spark, n=2_000, seed_mod=97):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        # token lengths 16..271, deterministic in doc_id
        (16 + F.pmod(F.col("id") * 7919, F.lit(256))).alias("n_tokens"),
    )


def test_budget_bound_and_coverage(spark):
    docs = _docs(spark)
    packed = packing.pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    stats = packing.pack_stats(packed, BUDGET).collect()
    assert all(r["tokens"] <= BUDGET for r in stats)
    # every doc exactly once
    assert packed.count() == 2_000
    assert packed.select("doc_id").distinct().count() == 2_000
    # pack_pos is a clean 0..n_docs-1 sequence inside each pack
    bad = (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").alias("n"),
            F.max("pack_pos").alias("mx"),
            F.min("pack_pos").alias("mn"),
        )
        .filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
        .count()
    )
    assert bad == 0


def test_deterministic_under_repartitioning(spark):
    docs = _docs(spark)
    a = packing.pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    b = packing.pack_sequences(
        docs.repartition(13), "doc_id", "n_tokens", BUDGET, n_groups=8
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_next_fit_utilization(spark):
    """All docs ≤ budget/2 ⇒ every pack except possibly the last per
    group is > half full (the classic next-fit bound)."""
    docs = _docs(spark).withColumn(
        "n_tokens", F.least(F.col("n_tokens"), F.lit(BUDGET // 2))
    )
    packed = packing.pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    stats = packing.pack_stats(packed, BUDGET).withColumn(
        "pack_local", F.split(F.col("pack_id"), "/").getItem(1).cast("long")
    )
    last_per_group = stats.groupBy("group_id").agg(
        F.max("pack_local").alias("pack_local")
    )
    inner = stats.join(last_per_group, ["group_id", "pack_local"], "left_anti")
    low = inner.filter(F.col("tokens") <= BUDGET / 2).count()
    assert low == 0


def test_oversized_doc_raises(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, BUDGET + 1)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="exceeds pack budget"):
        packing.pack_sequences(docs, "doc_id", "n_tokens", BUDGET).collect()


def test_one_shuffle_arrow_pass(spark):
    docs = _docs(spark)
    packed = packing.pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_groups=8)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan


def test_dedup_segments_removes_repeats(spark):
    from csce438_distributed_password_cracker_spark.operators import textops

    df = spark.createDataFrame(
        [
            (1, "alpha beta. gamma. alpha beta. delta"),
            (2, "unique one. unique two"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text_deduped"] for r in df.select(
        "doc_id", textops.dedup_segments()
    ).collect()}
    assert out[1] == "alpha beta. gamma. delta"
    assert out[2] == "unique one. unique two"
    plan = (
        df.select("doc_id", textops.dedup_segments())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

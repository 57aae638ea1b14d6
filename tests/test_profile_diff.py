"""Profiling and snapshot-diff operators: metric correctness against
hand-computed values, single-scan plan shape, and diff classification
(including the null-sentinel canonicalization edge)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.catalog import load_table
from csce438_distributed_password_cracker_spark.operators import diff, profile


def test_profile_metrics_match_exact(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "aa"),
            (2, 20.0, ""),
            (3, None, "bb"),
            (4, 40.0, None),
            (5, 10.0, "aa"),
        ],
        "id long, x double, s string",
    )
    p = profile.profile(df)
    got = {
        (r.column, r.metric): (r.value_num, r.value_str) for r in p.collect()
    }
    assert got[("x", "n_rows")][0] == 5.0
    assert got[("x", "n_null")][0] == 1.0
    assert got[("x", "min")][0] == 10.0
    assert got[("x", "max")][0] == 40.0
    assert got[("x", "mean")][0] == 20.0
    assert got[("x", "approx_distinct")][0] == 3.0  # exact at tiny n
    assert got[("x", "p50")][0] in (10.0, 20.0)  # GK sketch, exact at tiny n
    assert got[("x", "p95")][0] == 40.0
    assert got[("s", "n_null")][0] == 1.0
    assert got[("s", "n_empty")][0] == 1.0
    assert got[("s", "min_len")][0] == 0.0
    assert got[("s", "max_len")][0] == 2.0
    top = json.loads(got[("s", "top_k")][1])
    assert top[0] == {"item": "aa", "count": 2}


def test_profile_is_one_pass_and_covers_all_metrics(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    p = profile.profile(docs, columns=["doc_id", "text"])
    # 4 common metrics per column, +7 numeric (doc_id), +5 string (text)
    assert p.count() == (4 + 7) + (4 + 5)

    # plan shape of the underlying aggregation: ONE scan of the table,
    # partial aggregation before the single-partition reduce
    agg_plan = (
        docs.agg(
            F.count("doc_id"), F.approx_count_distinct("text")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert agg_plan.count("Scan parquet") + agg_plan.count("FileScan") >= 1
    assert "partial" in agg_plan.lower()


def test_histogram_buckets(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    h = {
        r.bucket: (r.bucket_lo, r.bucket_hi, r.n)
        for r in profile.histogram(df, "v", 0.0, 100.0, nbins=4).collect()
    }
    # width_bucket: [0,25) -> 1 ... [75,100) -> 4; 100 values 0..99
    assert h[1] == (0.0, 25.0, 25)
    assert h[4] == (75.0, 100.0, 25)
    with pytest.raises(ValueError):
        profile.histogram(df, "v", 5.0, 5.0)


def test_snapshot_diff_classifies(spark):
    before = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        "k long, s string, v double",
    )
    after = spark.createDataFrame(
        [(2, "b", 2.0), (3, "C", 3.0), (5, "e", 5.0), (4, "x", None)],
        "k long, s string, v double",
    )
    d = diff.snapshot_diff(before, after, ["k"])
    got = {r.k: r.diff_status for r in d.collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",  # (None, 4.0) -> ("x", None): null-shift must NOT
        # cancel out — the per-column sentinel guarantees it
        5: "added",
    }
    assert diff.diff_stats(d) == {
        "added": 1,
        "removed": 1,
        "changed": 2,
        "unchanged": 1,
    }


def test_snapshot_diff_null_swap_is_changed(spark):
    """(NULL, 'x') vs ('x', NULL) across two payload columns must be
    'changed' — the exact collision a naive xxhash64(*cols) would miss
    because xxhash64 skips NULL arguments."""
    before = spark.createDataFrame([(1, None, "x")], "k long, a string, b string")
    after = spark.createDataFrame([(1, "x", None)], "k long, a string, b string")
    d = diff.snapshot_diff(before, after, ["k"])
    assert d.first().diff_status == "changed"


def test_snapshot_diff_key_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError, match="non-empty"):
        diff.snapshot_diff(df, df, [])
    with pytest.raises(ValueError, match="missing"):
        diff.snapshot_diff(df, df, ["nope"])


def test_snapshot_diff_null_key_components_compare(spark):
    """A key with a NULL component present in both snapshots must
    compare (null-safe join), not split into spurious added+removed."""
    before = spark.createDataFrame(
        [(None, "a", 1.0), (2, "b", 2.0)], "k string, s string, v double"
    )
    after_same = spark.createDataFrame(
        [(None, "a", 1.0), (2, "b", 2.0)], "k string, s string, v double"
    )
    d = diff.snapshot_diff(before, after_same, ["k"])
    assert diff.diff_stats(d) == {
        "added": 0, "removed": 0, "changed": 0, "unchanged": 2,
    }
    after_edit = spark.createDataFrame(
        [(None, "a", 9.0), (2, "b", 2.0)], "k string, s string, v double"
    )
    got = {
        r.k: r.diff_status
        for r in diff.snapshot_diff(before, after_edit, ["k"]).collect()
    }
    assert got == {None: "changed", "2": "unchanged"}


def test_profile_drift_flags_real_shifts_only(spark):
    before = spark.createDataFrame(
        [(i, float(i % 10), "en" if i % 5 else "de") for i in range(100)],
        "id long, x double, lang string",
    )
    # same distributions, half the rows (id<50 preserves the id%10 and
    # id%5 value mixes exactly) -> only n_rows itself may flag
    same_shape = before.filter(F.col("id") < 50)
    d = profile.profile_drift(before, same_shape)
    drifted = {(r.column, r.metric) for r in d.collect() if r.drifted}
    assert ("x", "n_null") not in drifted  # rate-based: 0% -> 0%
    assert ("x", "mean") not in drifted
    assert ("lang", "top_k") not in drifted  # 'en' still dominates

    # real shifts: nulls spike, mean shifts, dominant language flips
    shifted = before.select(
        "id",
        F.when(F.col("id") < 40, None).otherwise(F.col("x") + 100).alias("x"),
        F.when(F.col("lang") == "en", "de").otherwise("en").alias("lang"),
    )
    d2 = {
        (r.column, r.metric): r
        for r in profile.profile_drift(before, shifted).collect()
    }
    assert d2[("x", "n_null")].drifted  # 0% -> 40% null rate
    assert d2[("x", "mean")].drifted
    assert d2[("lang", "top_k")].drifted  # dominant item flipped
    assert not d2[("id", "mean")].drifted  # untouched column quiet


def test_profile_drift_null_and_rate_edges(spark):
    """Legitimately-NULL aggregate values (all-null column) must stay
    quiet when unchanged; a vanished dominant item must flag
    (null-safe top-k compare); and a small-baseline null-rate spike
    (0.5% -> 9%) must flag despite both rates being small."""
    base = spark.createDataFrame(
        [
            (i, None, "en" if i < 190 else None)
            for i in range(200)
        ],
        "id long, allnull double, lang string",
    )
    d = {
        (r.column, r.metric): r
        for r in profile.profile_drift(base, base).collect()
    }
    # identical snapshots: nothing drifts, and no NULL verdicts
    assert all(r.drifted is False for r in d.values())

    # dominant item vanishes entirely (lang becomes all NULL)
    gone = base.withColumn("lang", F.lit(None).cast("string"))
    d2 = {
        (r.column, r.metric): r
        for r in profile.profile_drift(base, gone).collect()
    }
    assert d2[("lang", "top_k")].drifted is True
    assert d2[("allnull", "mean")].drifted is False  # still all-null

    # null-rate spike on a small baseline: 1/200 -> 18/200
    before = spark.createDataFrame(
        [(i, None if i < 1 else float(i)) for i in range(200)],
        "id long, x double",
    )
    after = spark.createDataFrame(
        [(i, None if i < 18 else float(i)) for i in range(200)],
        "id long, x double",
    )
    d3 = {
        (r.column, r.metric): r
        for r in profile.profile_drift(before, after).collect()
    }
    assert d3[("x", "n_null")].drifted is True

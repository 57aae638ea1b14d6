"""Skew salting and bucketed co-located joins — result-identical to the
plain forms, with the plan properties that matter at 100 TB asserted."""

from __future__ import annotations

from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.catalog import load_table
from csce438_distributed_password_cracker_spark.operators import skew

from test_plans import plan_str


def _skewed_df(spark):
    # 50k rows, 90% on one key — the shape that hot-spots one reducer
    return spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        F.col("id").alias("payload"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed_df(spark)
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = skew.salted_join(big, small, "k").select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the join key set must include the salt (that IS the mitigation)
    assert "__salt" in plan_str(spark, skew.salted_join(big, small, "k"))


def test_salted_count_distinct_matches_builtin(spark):
    df = _skewed_df(spark)
    got = {
        (r["k"], r["n_distinct_payload"])
        for r in skew.salted_count_distinct(df, "k", "payload").collect()
    }
    want = {
        (r["k"], r["n"])
        for r in df.groupBy("k")
        .agg(F.count_distinct("payload").alias("n"))
        .collect()
    }
    assert got == want


def test_bucketed_join_has_no_shuffle(spark, sf_oracle, tmp_path):
    """Two tables bucketed+sorted on the join key must sort-merge join with
    NO Exchange on either side — the co-located join that makes repeated
    large-large joins affordable at scale."""
    # explicit per-table paths (external tables) keep everything in tmp_path
    orders = load_table(spark, sf_oracle, "orders")
    lineitem = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    for name, df, key in (
        ("orders_bkt", orders, "o_orderkey"),
        ("lineitem_bkt", lineitem, "l_orderkey"),
    ):
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("orders_bkt").join(
            spark.table("lineitem_bkt"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        p = plan_str(spark, j)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # bucketing pre-distributed both sides
        # sanity: same result as the unbucketed join
        assert j.count() == orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")

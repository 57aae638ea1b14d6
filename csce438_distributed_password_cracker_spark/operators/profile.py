"""One-pass dataset profiling — the data-quality audit a pipeline runs
on every new drop before admitting it (null rates, cardinalities,
ranges, heavy hitters), plus a fixed-width histogram.

Reference analog: none (north-star extension, BASELINE.json).

Scale shape: :func:`profile` compiles ALL requested metrics for ALL
columns into ONE ``df.agg(...)`` — a single scan with map-side partial
aggregation reducing to a single driver row, no matter how many columns
are profiled; there is no per-column pass and no shuffle of data rows.
Distincts are ``approx_count_distinct`` (HLL++) and heavy hitters are
``approx_top_k`` (a mergeable frequent-items sketch) — both sketch
aggregates with bounded state, because exact versions of either would
shuffle the full column at 100 TB.  The wide one-row result is then
unpivoted driver-side into the long (column, metric, ...) audit table —
a driver-side loop over METRIC COUNT, never over data.

:func:`histogram` is the one shape that needs a shuffle: width_bucket →
groupBy over ``nbins`` keys, i.e. a shuffle of at most nbins rows after
map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType
from pyspark.sql.window import Window

TOPK_MAX_ITEMS = 10_000  # approx_top_k sketch capacity (its default)


def profile(
    df: DataFrame, columns: list[str] | None = None, top_k: int = 5
) -> DataFrame:
    """Long-format profile: one row per (column, metric) with
    ``value_num`` (numeric metrics), ``value_str`` (string min/max and
    the JSON-encoded heavy-hitter list).

    Metrics for every column: n_nonnull, n_null, approx_distinct.
    Numeric columns add min/max/mean/stddev; string columns add
    min/max/avg length, n_empty, and top_k items.
    """
    cols = columns or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    per_col: dict[str, list[str]] = {}

    def add(c: str, metric: str, expr: Column) -> None:
        aggs.append(expr.alias(f"{c}::{metric}"))
        per_col.setdefault(c, []).append(metric)

    for c in cols:
        dt = df.schema[c].dataType
        add(c, "n_nonnull", F.count(c))
        add(c, "approx_distinct", F.approx_count_distinct(c))
        if isinstance(dt, NumericType):
            add(c, "min", F.min(c).cast("double"))
            add(c, "max", F.max(c).cast("double"))
            add(c, "mean", F.avg(c))
            add(c, "stddev", F.stddev(c))
            # approx_percentile is a single mergeable aggregate (GK
            # sketch), so quantiles ride the same one-pass agg
            # backquoted: a CSV-born column like `order date` must not
            # blow up the expr parse (everything else uses Column APIs)
            for q, name in ((0.25, "p25"), (0.5, "p50"), (0.95, "p95")):
                add(
                    c,
                    name,
                    F.expr(f"approx_percentile(`{c}`, {q}, 1000)").cast(
                        "double"
                    ),
                )
        elif isinstance(dt, StringType):
            add(c, "min_len", F.min(F.length(c)).cast("double"))
            add(c, "max_len", F.max(F.length(c)).cast("double"))
            add(c, "avg_len", F.avg(F.length(c)))
            add(c, "n_empty", F.count(F.when(F.col(c) == "", 1)))
            add(
                c,
                "top_k",
                F.to_json(
                    F.expr(f"approx_top_k(`{c}`, {top_k}, {TOPK_MAX_ITEMS})")
                ),
            )

    # Unpivot the wide one-row agg JVM-side (explode of struct literals)
    # instead of .first() + createDataFrame(python rows): the rebuilt
    # python-rows frame planned as `Scan ExistingRDD` and burned ~6
    # Python CPU-s of worker fork/unpickle overhead per call inside the
    # gate anchor (round-10 verdict).  This also makes profile() fully
    # lazy — one scan, then a LocalLimit-free projection of ~metrics
    # rows, no driver round-trip at all.
    wide = df.agg(*aggs)
    null_str = F.lit(None).cast("string")
    null_num = F.lit(None).cast("double")

    def entry(c: str, m: str, num: Column, s: Column) -> Column:
        return F.struct(
            F.lit(c).alias("column"),
            F.lit(m).alias("metric"),
            num.cast("double").alias("value_num"),
            s.alias("value_str"),
        )

    entries: list[Column] = []
    for c in cols:
        entries.append(entry(c, "n_rows", wide["__n"], null_str))
        entries.append(
            entry(c, "n_null", wide["__n"] - wide[f"{c}::n_nonnull"], null_str)
        )
        for m in per_col[c]:
            if m == "top_k":
                entries.append(entry(c, m, null_num, wide[f"{c}::{m}"]))
            else:
                entries.append(entry(c, m, wide[f"{c}::{m}"], null_str))
    return wide.select(
        F.explode(F.array(*entries)).alias("__e")
    ).select("__e.column", "__e.metric", "__e.value_num", "__e.value_str")


def profile_drift(
    before: DataFrame,
    after: DataFrame,
    columns: list[str] | None = None,
    rel_threshold: float = 0.1,
    rate_threshold: float = 0.02,
    top_k: int = 5,
) -> DataFrame:
    """Metric-level drift between two snapshots' profiles — the
    scheduled data-quality monitor (schema rot, null-rate spikes,
    cardinality collapse, distribution shift between yesterday's drop
    and today's).

    One :func:`profile` pass per side (each a single scan), then a
    metric-key join of two tiny long tables — the comparison itself
    costs nothing at any scale.  Numeric metrics flag when the
    relative change exceeds ``rel_threshold`` (denominator floored at
    1 so near-zero baselines don't scream).  COUNT-like metrics
    (n_null/n_empty/n_nonnull) compare as RATES of their snapshot's
    row count — a bigger drop with the same null fraction stays quiet
    — and flag when the absolute rate delta exceeds
    ``rate_threshold`` OR the rate changed by ``rel_threshold``
    relative to the baseline rate (so a 0.1%→9% null spike flags even
    though both rates are small).  String metrics (top_k lists) flag
    on any change of the top item (null-safe: a vanished dominant item
    counts as drift).  A metric present on only one side — a column
    appeared or vanished, i.e. schema rot — always flags; a metric
    whose VALUE is legitimately NULL on both sides (e.g. mean of an
    all-null column) does not.  Returns (column, metric, before,
    after, rel_change, drifted)."""
    # explicit presence markers: value-nullness is NOT a proxy for the
    # full-outer join missing a side (an all-null column's mean is a
    # legitimately NULL value on a present row)
    p_b = profile(before, columns, top_k).withColumnsRenamed(
        {"value_num": "before_num", "value_str": "before_str"}
    ).withColumn("__in_b", F.lit(True))
    p_a = profile(after, columns, top_k).withColumnsRenamed(
        {"value_num": "after_num", "value_str": "after_str"}
    ).withColumn("__in_a", F.lit(True))
    j = p_b.join(p_a, ["column", "metric"], "full_outer")

    n_b = F.first(
        F.when(F.col("metric") == "n_rows", F.col("before_num")), True
    ).over(Window.partitionBy(F.lit(1)))
    n_a = F.first(
        F.when(F.col("metric") == "n_rows", F.col("after_num")), True
    ).over(Window.partitionBy(F.lit(1)))
    rate_metrics = ("n_null", "n_empty", "n_nonnull")
    is_rate = F.col("metric").isin(*rate_metrics)
    b_val = F.when(is_rate, F.col("before_num") / n_b).otherwise(
        F.col("before_num")
    )
    a_val = F.when(is_rate, F.col("after_num") / n_a).otherwise(
        F.col("after_num")
    )
    rel = (a_val - b_val) / F.greatest(F.abs(b_val), F.lit(1.0))
    # rates live in [0,1], so the floored-at-1 denominator above would
    # reduce rel to an ABSOLUTE delta and a 0.1%→9% spike would slip
    # under rel_threshold; rates get their own two-part test
    rate_drift = (
        F.abs(a_val - b_val) > rate_threshold
    ) | (
        (F.col("before_num") > 0)
        & (F.abs(a_val - b_val) / b_val > rel_threshold)
    )

    top_item = lambda c: F.get_json_object(F.col(c), "$[0].item")  # noqa: E731
    drift = (
        F.when(F.col("__in_b").isNull(), F.lit(True))  # metric appeared
        .when(F.col("__in_a").isNull(), F.lit(True))  # metric vanished
        .when(
            F.col("metric") == "top_k",
            # null-safe: a vanished dominant item IS drift
            ~top_item("before_str").eqNullSafe(top_item("after_str")),
        )
        .when(is_rate, rate_drift)
        # both values legitimately NULL (all-null column's mean, 1-row
        # stddev): no change to report
        .when(
            F.col("before_num").isNull() & F.col("after_num").isNull(),
            F.lit(False),
        )
        .when(
            F.col("before_num").isNull() | F.col("after_num").isNull(),
            F.lit(True),  # became (or stopped being) computable
        )
        .otherwise(F.abs(rel) > rel_threshold)
    )
    return j.select(
        "column",
        "metric",
        F.col("before_num").alias("before"),
        F.col("after_num").alias("after"),
        F.round(rel, 6).alias("rel_change"),
        drift.alias("drifted"),
    )


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int = 20
) -> DataFrame:
    """(bucket, lo, hi, n) fixed-width histogram over [lo, hi); values
    outside the range land in underflow bucket 0 / overflow nbins+1
    (width_bucket semantics).  One scan, shuffle of ≤ nbins+2 rows."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / nbins
    return (
        df.select(
            F.width_bucket(F.col(col), F.lit(lo), F.lit(hi), F.lit(nbins))
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + (F.col("bucket") - 1) * width).alias("bucket_lo"),
            (F.lit(lo) + F.col("bucket") * width).alias("bucket_hi"),
            "n",
        )
        .orderBy("bucket")
    )

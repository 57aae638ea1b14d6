"""Temporal join operators Spark lacks as built-ins (north-star custom
operators): as-of join and range join — each expressed as a composition of
existing DataFrame ops with the physical shape that scales, never a
nested-loop/cartesian plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_ts: str,
    event_ts: str,
    payload_cols: list[str],
    event_order: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each probe row, the most recent event with
    ``event_ts <= probe_ts`` on the same key (the classic trades/quotes
    as-of); unmatched probes keep NULL payloads (LEFT semantics).

    Implementation: union both sides tagged, ONE window sort per key in
    (ts, side, tie) order, ``last(payload, ignorenulls)`` carries the
    latest event forward onto each probe row.  One sort-shuffle on the
    key — no inequality join, no nested loop; how a 100 TB trades/quotes
    as-of is done.  Events sort before probes at equal ts (an event AT the
    probe instant matches); ties between events at the same ts resolve to
    the largest ``event_order`` (default: the first payload column).
    """
    event_order = event_order or payload_cols[0]
    meta = ["__k", "__ts", "__side", "__tie"]
    pcols = [f"__p_{c}" for c in payload_cols]
    e_types = {c: events.schema[c].dataType for c in payload_cols}
    tie_t = events.schema[event_order].dataType

    e = events.select(
        F.col(key).alias("__k"),
        F.col(event_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # events first at equal ts
        F.col(event_order).alias("__tie"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        *[
            F.lit(None).cast(probes.schema[c].dataType).alias(c)
            for c in probes.columns
        ],
    )
    p = probes.select(
        F.col(key).alias("__k"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tie_t).alias("__tie"),
        *[F.lit(None).cast(e_types[c]).alias(f"__p_{c}") for c in payload_cols],
        *probes.columns,
    )
    merged = e.select(meta + pcols + probes.columns).unionByName(
        p.select(meta + pcols + probes.columns)
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", F.col("__tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *probes.columns,
        "__side",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    radius_seconds: int,
    bin_seconds: int | None = None,
) -> DataFrame:
    """COUNT of right rows within ``±radius_seconds`` of each left row on
    the same key — an interval/range join.

    A naive ``|l.ts − r.ts| <= radius`` predicate cannot hash-partition
    and degenerates to a nested-loop join.  The scale shape: bin both
    sides to ``bin_seconds`` buckets, equi-join on (key, bin) with each
    left row probing its bin plus ``ceil(radius/bin)`` neighbors on each
    side (constant fan-out — 3 bins at the default ``bin = radius``), then
    apply the exact range predicate as a cheap post-filter.  Equality join
    ⇒ hash shuffle, AQE-splittable.  The probe span is derived from the
    radius/bin ratio, so a caller passing ``bin_seconds < radius_seconds``
    still sees every in-range row (more, smaller bins = more probe rows
    but tighter post-filter selectivity).
    """
    bin_s = bin_seconds or radius_seconds
    span = -(-radius_seconds // bin_s)  # ceil: bins a right row can sit away
    lb = left.select(
        "*",
        F.explode(
            F.array(
                *[
                    (F.unix_timestamp(F.col(left_ts)) / bin_s).cast("long") + off
                    for off in range(-span, span + 1)
                ]
            )
        ).alias("__bin"),
    )
    rb = right.select(
        F.col(key).alias("__rk"),
        F.unix_timestamp(F.col(right_ts)).alias("__rts"),
        (F.unix_timestamp(F.col(right_ts)) / bin_s).cast("long").alias("__bin"),
    )
    joined = lb.join(
        rb,
        (F.col(key) == F.col("__rk"))
        & (lb["__bin"] == rb["__bin"])
        & (
            F.abs(F.unix_timestamp(F.col(left_ts)) - F.col("__rts"))
            <= radius_seconds
        ),
        "left",
    )
    return joined.groupBy(*[F.col(c) for c in left.columns]).agg(
        F.count("__rts").alias("n_in_range")
    )

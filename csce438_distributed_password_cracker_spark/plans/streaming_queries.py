"""Batch-checkable analogs of the reference's streaming semantics
(SURVEY.md §2.9 T1-T3 + tumbling) over the driver ``events`` table.

The *live* Structured Streaming implementations live in ``streaming/``;
these declared queries encode the same semantics in batch form so the
DuckDB oracle can check them (incremental-vs-batch equivalence is the
defining property of a streaming aggregation — q_stream_requests states it
directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register
from .relational import _dec, _money, _sql_query

SESSION_GAP_MS = 30 * 60 * 1000  # analog of the 5×2s epoch timeout
# (lsp_server.c:31-35) scaled to the events table's minutes-apart cadence.

_sql_query(
    "q_stream_dedup_order",
    """
    SELECT user_id,
           count(*) AS n_events,
           CAST(max(gap) AS BIGINT) AS max_gap,
           CAST(min(gap) AS BIGINT) AS min_gap,
           count(*) FILTER (WHERE gap IS NOT NULL AND gap <= 0) AS n_dup_or_ooo
    FROM (
      SELECT user_id,
             event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS gap
      FROM events
    )
    GROUP BY user_id
    """,
    doc="T3: per-connection seqnum dedup/ordering audit (accept check "
    "lsp_server.c:241-249) as lag() over (partition by conn order by seq) — "
    "the corpus's window-function exercise (SURVEY.md §2.10).",
    tables=("events",),
)

_sql_query(
    "q_stream_sessions",
    f"""
    SELECT user_id,
           CAST(sum(is_start) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM (
      SELECT user_id,
             CASE WHEN prev_ms IS NULL OR ms - prev_ms > {SESSION_GAP_MS}
                  THEN 1 ELSE 0 END AS is_start
      FROM (
        SELECT user_id,
               unix_millis(ts) AS ms,
               lag(unix_millis(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        FROM events
      )
    )
    GROUP BY user_id
    """,
    oracle=f"""
    SELECT user_id,
           CAST(sum(is_start) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM (
      SELECT user_id,
             CASE WHEN prev_ms IS NULL OR ms - prev_ms > {SESSION_GAP_MS}
                  THEN 1 ELSE 0 END AS is_start
      FROM (
        SELECT user_id,
               epoch_ms(ts) AS ms,
               lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
      FROM events
      )
    )
    GROUP BY user_id
    """,
    doc="T2: epoch-timeout liveness (5×2s silent ⇒ dead, lsp_server.c:31-35) "
    "as gap-based sessionization; session count per connection. Live "
    "session_window twin in streaming/sessions.py.",
    tables=("events",),
)


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           count(*) AS n_events,
           {_money(_dec("value"), "window_value")}
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
    doc="Tumbling 1h window aggregation (corpus breadth; §2.9 'absent' row). "
    "Spark F.window aligns to the epoch ⇒ equals date_trunc('hour').",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(f"CAST(round(sum({_dec('value')}), 2) AS DOUBLE)").alias(
                "window_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"), "n_events", "window_value"
        )
    )


@register(
    "q_stream_requests",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           {_money(_dec("value"), "total_value")}
    FROM events
    GROUP BY event_type
    """,
    doc="T1: unbounded request stream consumed incrementally "
    "(server.c:477-505).  Computed as two-phase partial aggregation — "
    "per-microbatch partials re-aggregated — which must equal the one-shot "
    "batch answer (the oracle).  This is exactly Spark's streaming-agg "
    "state-merge contract, checkable in batch.",
)
def q_stream_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    partial = ev.groupBy(
        "event_type", (F.col("event_id") % 4).alias("microbatch")
    ).agg(
        F.count("*").alias("pn"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.expr("CAST(round(sum(psum), 2) AS DOUBLE)").alias("total_value"),
    )

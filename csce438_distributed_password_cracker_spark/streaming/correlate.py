"""Stream-stream correlation — join two live event streams on a key
within a time window, with watermark-bounded state (the Structured
Streaming surface none of the other streams exercise: both sides are
unbounded, so Spark must buffer each side's rows in state and evict
them once the watermark proves no future match can arrive).

Reference analog: the coordinator correlating request and worker-result
messages by request id (server.c request bookkeeping) — generalized to
the time-bounded event-correlation shape (click→purchase attribution,
request→response latency pairing) a 100 TB event pipeline runs.

Why the constraints exist (and are enforced here):
- Both sides MUST carry a watermark and the join condition MUST bound
  event time on both sides; otherwise state grows forever — Spark
  would buffer every row of each stream indefinitely.  With the bound,
  each side's state holds only rows younger than
  watermark - join-window, evicted per micro-batch.
- The same function works on batch DataFrames (no watermark needed),
  which is what lets a batch twin verify the streamed answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within_seconds: int = 600,
    watermark: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Pairs (left row, right row) with equal ``key`` where the right
    event lands in ``[left_ts, left_ts + within_seconds]`` — "what
    followed this event, per user, within the window".

    Output: (key, left_ts as l_ts, right_ts as r_ts, lag_seconds).
    Streaming inputs get ``withWatermark`` applied; batch inputs run
    the identical join for oracle comparison.

    ``how='left_outer'`` additionally emits each UNMATCHED left event
    (null r_ts/lag) — in streaming, only once the watermark has passed
    its whole match window, proving no future right row can pair with
    it (the same eviction that bounds the join state also licenses the
    null emission; the global watermark is the MIN across both
    sources, so both streams must advance for outer results to flush).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    l_df = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("l_ts")
    )
    r_df = right.select(
        F.col(key).alias("__rk"), F.col(right_ts).alias("r_ts")
    )
    if l_df.isStreaming:
        l_df = l_df.withWatermark("l_ts", watermark)
    if r_df.isStreaming:
        r_df = r_df.withWatermark("r_ts", watermark)
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (
            F.col("r_ts")
            <= F.col("l_ts") + F.expr(f"INTERVAL {within_seconds} SECONDS")
        )
    )
    return (
        l_df.join(r_df, cond, how)
        .select(
            F.col("__k").alias(key),
            "l_ts",
            "r_ts",
            (
                F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")
            ).alias("lag_seconds"),
        )
    )

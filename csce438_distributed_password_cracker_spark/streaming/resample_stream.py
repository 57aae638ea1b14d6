"""Streaming time-series resample + LOCF — the live counterpart of
:func:`..operators.resample.resample_locf`, as an
``applyInPandasWithState`` operator.

Batch resampling can generate each key's grid from its observed span;
a stream cannot (the span grows forever), so the operator keeps THREE
scalars of state per key — the last emitted bin, the last observed
value, and whether one exists — and on every micro-batch emits the
bins from ``last_bin + 1`` through the batch's newest bin: observed
bins carry their count and last value, gap bins carry the LOCF'd value
with ``filled = true``.  State is O(keys), never O(bins): a key silent
for a week costs nothing until it speaks again, at which point the
intervening gap bins are emitted in one batch.

Late events (bin ≤ last emitted bin) are emitted as correction rows
(``late = true``) WITHOUT rewinding state — the reprocessing decision
belongs to the sink (same philosophy as the rollup stream's
reconciliation); their value does not overwrite the carry-forward.

The kernel is deliberately shared batch/stream: ``applyInPandas`` with
the same function over a batch frame equals the streaming result with
the whole input in one micro-batch (pinned in tests), which is Spark's
streaming-state contract in miniature.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("bin", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("filled", T.BooleanType()),
        T.StructField("late", T.BooleanType()),
        T.StructField("value_locf", T.DoubleType()),
    ]
)

RESAMPLE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_bin", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
        T.StructField("has_value", T.BooleanType()),
    ]
)

_COLS = ["key", "bin", "n_events", "filled", "late", "value_locf"]


def make_resample_fn(
    interval_seconds: int, max_gap_bins: int = 1_000_000
):
    """Kernel factory (interval baked into the closure so the function
    ships as a plain picklable).  Input rows need ``ts`` (timestamp),
    ``value`` (double, nullable) and ``event_id`` (tie-break).

    ``max_gap_bins`` mirrors the batch operator's span guard: a stray
    timestamp (1970 OR far-future) would otherwise either emit tens of
    millions of gap rows in one batch (executor OOM) or advance
    ``last_bin`` so far that every real event becomes a late
    correction forever — the guard turns both into a loud error BEFORE
    state is poisoned."""
    if interval_seconds < 1:
        raise ValueError("interval_seconds must be >= 1")
    n_ns = int(interval_seconds) * 1_000_000_000

    def _resample(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            last_bin, last_val, has_val = state.get
        else:
            last_bin, last_val, has_val = None, None, False
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"], kind="stable")
        batch["_bin"] = batch["ts"].astype("int64") // n_ns
        out: list[tuple] = []
        # late corrections: bins at or before the last emitted bin
        if last_bin is not None:
            late = batch[batch["_bin"] <= last_bin]
            for b, grp in late.groupby("_bin", sort=True):
                out.append(
                    (k, int(b), len(grp), False, True, None)
                )
            batch = batch[batch["_bin"] > last_bin]
        if not batch.empty:
            groups = {
                int(b): grp for b, grp in batch.groupby("_bin", sort=True)
            }
            start = (
                last_bin + 1 if last_bin is not None else min(groups)
            )
            if max(groups) - start >= int(max_gap_bins):
                raise ValueError(
                    f"key {k!r}: emitting bins {start}..{max(groups)} "
                    f"spans {max(groups) - start + 1} bins "
                    f"(> max_gap_bins={max_gap_bins}) — a stray "
                    "timestamp would explode the grid or poison the "
                    "carry state; clean or clamp the stream first"
                )
            for b in range(start, max(groups) + 1):
                grp = groups.get(b)
                if grp is None:
                    out.append(
                        (k, b, 0, True, False,
                         float(last_val) if has_val else None)
                    )
                else:
                    vals = grp["value"].dropna()
                    if not vals.empty:
                        last_val = float(vals.iloc[-1])
                        has_val = True
                    out.append(
                        (k, b, len(grp), False, False,
                         float(last_val) if has_val else None)
                    )
            last_bin = max(groups)
        state.update(
            (
                int(last_bin) if last_bin is not None else None,
                last_val,
                bool(has_val),
            )
        )
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    return _resample


def resample_stream(
    events: DataFrame,
    interval_seconds: int,
    key_col: str = "event_type",
    max_gap_bins: int = 1_000_000,
) -> DataFrame:
    """events(key, ts, value, event_id) → resampled grid rows, O(keys)
    state.  Works on streaming DataFrames (append mode); on a batch
    DataFrame use ``applyInPandas`` with the same kernel — the two
    agree when the batch arrives as one micro-batch (pinned in
    tests/test_resample_stream.py)."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col("ts"),
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        make_resample_fn(interval_seconds, max_gap_bins),
        outputStructType=RESAMPLE_SCHEMA,
        stateStructType=RESAMPLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

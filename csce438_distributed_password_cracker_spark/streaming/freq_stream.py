"""Streaming heavy hitters — maintain Misra–Gries summaries over an
unbounded item stream and emit the current frequent-item candidates
every micro-batch (live trending tokens / hot URLs / dominant hosts —
the monitoring face of ``operators/freq.py``).

Public prior art: Misra–Gries 1982; Agarwal et al. 2012 ("Mergeable
Summaries") for the batch-merge form this reuses — the streaming
kernel calls the SAME :func:`operators.freq.mg_merge` the batch sieve
and the hypothesis property suite exercise.

Sharding & the guarantee: items are hash-sharded into ``num_ranges``
state groups (``xxhash64(item) mod R``), each group holding ONE
summary of ``k`` counters plus its rows-seen total.  Because an item
belongs to exactly one shard, the shard's MG bound applies to its FULL
stream-lifetime count: any item whose total frequency exceeds
``rows_seen(shard)/(k+1)`` is guaranteed present in that shard's
emission — a TIGHTER bound than the batch operator's (where an item's
occurrences scatter across partition summaries), since
``rows_seen(shard) ≤ rows_seen(stream)``.

State is bounded by construction: ``num_ranges × (k counters + 1
long)`` — independent of stream length and vocabulary size.  Output
mode is UPDATE: each batch re-emits the summaries of the shards that
received data (est values are cumulative across batches).

Exactness note: like every MG summary, ``est`` is an undercount
(``true − est ≤ rows_seen/( k+1)``).  For exact counts, feed the
emitted candidates to a batch recount exactly as
``operators/freq.heavy_hitters`` does — the stream's job is the
bounded-state candidate set, not the final number.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.freq import mg_merge

HH_SCHEMA = T.StructType(
    [
        T.StructField("range_id", T.IntegerType()),
        T.StructField("item", T.StringType()),
        T.StructField("est", T.LongType()),
        T.StructField("rows_seen", T.LongType()),
    ]
)

HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("rows_seen", T.LongType()),
    ]
)


def make_hh_fn(k: int):
    """Kernel factory (k baked into the closure so the function ships
    to executors as a plain picklable)."""

    def _hh(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (range_id,) = key
        if state.exists:
            items, counts, seen = state.get
            summary = dict(zip(items, counts))
        else:
            summary, seen = {}, 0
        for pdf in pdfs:
            vals = pdf["item"].dropna()
            seen += len(vals)
            summary = mg_merge(summary, vals.value_counts().to_dict(), k)
        state.update(
            (
                list(summary.keys()),
                [int(v) for v in summary.values()],
                int(seen),
            )
        )
        yield pd.DataFrame(
            {
                "range_id": int(range_id),
                "item": list(summary.keys()),
                "est": [int(v) for v in summary.values()],
                "rows_seen": int(seen),
            }
        )

    return _hh


def heavy_hitter_stream(
    items: DataFrame,
    item_col: str,
    k: int = 64,
    num_ranges: int = 16,
) -> DataFrame:
    """items(<item_col>, ...) → per-shard Misra–Gries summaries, updated
    every micro-batch: (range_id, item, est, rows_seen).  Works on a
    streaming DataFrame (update mode); the same kernel over a batch
    frame via ``applyInPandas`` equals one-micro-batch streaming
    (pinned in tests/test_freq_stream.py).

    ``num_ranges`` sizes parallelism (state groups process
    independently) — raise it so each shard's summary fits an Arrow
    batch comfortably; the union of shard emissions is the global
    candidate set (items never span shards)."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    if num_ranges < 1:
        # pmod(x, 0) only fails at stream runtime (ANSI remainder-by-
        # zero mid-query) — fail at construction like the k guard
        raise ValueError(f"num_ranges must be ≥ 1, got {num_ranges}")
    src = items.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(num_ranges))
        .cast("int")
        .alias("range_id"),
        F.col(item_col).cast("string").alias("item"),
    )
    return src.groupBy("range_id").applyInPandasWithState(
        make_hh_fn(k),
        outputStructType=HH_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

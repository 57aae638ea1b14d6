"""Custom stateful streaming operators (SURVEY.md §2.9 T3 + T2):

- per-connection seqnum acceptance — the reference's receive filter
  (lsp_server.c:241-249 / lsp_client.c:234-245: accept seqnum == last+1,
  silently drop duplicates and out-of-order) as an
  ``applyInPandasWithState`` operator.  State per connection = one int
  (last accepted seqnum), the same state the reference keeps in its
  conn table (api.h:73-92); emits one audit row per message.
- connection liveness detection — the reference's epoch-timer failure
  detector (lsp_server.c:31-35: 5 silent epochs × 2 s ⇒ connection
  declared dead) as a PROCESSING-TIME STATE TIMEOUT: every batch with
  activity re-arms the connection's timer; when a micro-batch runs
  after the deadline with no data for the key, the operator is invoked
  with ``hasTimedOut`` and emits the death verdict, then removes the
  state — bounded state by construction, the exact semantics of the
  reference's timer sweep.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("connid", T.LongType()),
        T.StructField("seqnum", T.LongType()),
        T.StructField("status", T.StringType()),  # accepted|duplicate|gap
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_seq", T.LongType())])


def _accept(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (connid,) = key
    last = state.get[0] if state.exists else 0
    out: list[tuple[int, int, str]] = []
    for pdf in pdfs:
        for seq in sorted(int(s) for s in pdf["seqnum"]):
            if seq == last + 1:
                out.append((connid, seq, "accepted"))
                last = seq
            elif seq <= last:
                out.append((connid, seq, "duplicate"))
            else:
                out.append((connid, seq, "gap"))
    state.update((last,))
    yield pd.DataFrame(out, columns=["connid", "seqnum", "status"])


def seqnum_accept_stream(messages: DataFrame) -> DataFrame:
    """messages(connid LONG, seqnum LONG, ...) → audit rows, keeping one
    int of state per connection.  Works on streaming DataFrames (update
    mode); on a batch DataFrame use ``applyInPandas`` with the same kernel
    (tested in tests/test_streaming.py)."""
    return (
        messages.groupBy("connid")
        .applyInPandasWithState(
            _accept,
            outputStructType=AUDIT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


LIVENESS_SCHEMA = T.StructType(
    [
        T.StructField("connid", T.LongType()),
        T.StructField("status", T.StringType()),  # alive|dead
        T.StructField("n_msgs", T.LongType()),
    ]
)

LIVENESS_STATE_SCHEMA = T.StructType(
    [T.StructField("n_msgs", T.LongType())]
)


def make_liveness_fn(dead_after_ms: int):
    """Kernel factory (the timeout duration is baked into the closure so
    the function ships to executors as a plain picklable)."""

    def _liveness(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (connid,) = key
        if state.hasTimedOut:
            n = state.get[0] if state.exists else 0
            state.remove()
            yield pd.DataFrame(
                [(connid, "dead", n)], columns=["connid", "status", "n_msgs"]
            )
            return
        n = state.get[0] if state.exists else 0
        n += sum(len(p) for p in pdfs)
        state.update((n,))
        # re-arm: the connection dies if NO batch brings it data for
        # dead_after_ms of processing time (the epoch-timer sweep)
        state.setTimeoutDuration(dead_after_ms)
        yield pd.DataFrame(
            [(connid, "alive", n)], columns=["connid", "status", "n_msgs"]
        )

    return _liveness


def liveness_stream(
    messages: DataFrame, dead_after_ms: int = 10_000
) -> DataFrame:
    """messages(connid LONG, ...) → per-connection liveness verdicts:
    an 'alive' row (with the running message count) whenever a batch
    brings data for the connection, and a terminal 'dead' row once the
    connection has been silent for ``dead_after_ms`` of processing time
    (state removed — memory is bounded by the LIVE connection count,
    like the reference's conn table).  Default 10 s = the reference's
    5 epochs × 2 s."""
    return messages.groupBy("connid").applyInPandasWithState(
        make_liveness_fn(dead_after_ms),
        outputStructType=LIVENESS_SCHEMA,
        stateStructType=LIVENESS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

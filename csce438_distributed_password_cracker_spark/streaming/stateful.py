"""Custom stateful streaming operator (SURVEY.md §2.9 T3):
per-connection seqnum acceptance — the reference's receive filter
(lsp_server.c:241-249 / lsp_client.c:234-245: accept seqnum == last+1,
silently drop duplicates and out-of-order) as an
``applyInPandasWithState`` operator.

State per connection = one int (last accepted seqnum) — the same state the
reference keeps in its conn table (api.h:73-92).  Emits one audit row per
incoming message: accepted / duplicate / gap.
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

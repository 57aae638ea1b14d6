"""Structured Streaming surface (SURVEY.md §2.9): the request stream
(T1, readStream → foreachBatch → sink), the stateful seqnum acceptor
(T3, applyInPandasWithState), and session windows (T2) — each driven as a
REAL stream (file source, availableNow trigger), not just the batch twins
the oracle corpus checks.
"""

from __future__ import annotations

import hashlib
import json
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from csce438_distributed_password_cracker_spark.streaming import (
    requests as req_stream,
)
from csce438_distributed_password_cracker_spark.streaming import sessions, stateful


def _write_json(path: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_request_stream_end_to_end(spark, tmp_path):
    """T1: crack requests arrive as a stream; verdicts land in the sink
    with the reference's reply grammar ('f <pass>' / 'x',
    server.c:251-262)."""
    src = tmp_path / "requests"
    src.mkdir()
    hit = hashlib.sha256(b"abc").hexdigest()
    miss = hashlib.sha256(b"NO!").hexdigest()  # non-[a-z] preimage: no hit
    _write_json(
        str(src / "batch0.json"),
        [
            {
                "request_id": 1,
                "hash": hit,
                "width": 3,
                "submitted_at": "2026-01-01T00:00:00.000Z",
            },
            {
                "request_id": 2,
                "hash": miss,
                "width": 3,
                "submitted_at": "2026-01-01T00:00:01.000Z",
            },
        ],
    )
    q = req_stream.start_request_stream(
        spark,
        str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink_table="crack_verdicts_test",
        hash_func="sha256",
    )
    q.awaitTermination(120)
    try:
        out = {
            r["request_id"]: r["reply"]
            for r in spark.table("crack_verdicts_test").collect()
        }
        assert out == {1: "f abc", 2: "x"}
    finally:
        spark.sql("DROP TABLE IF EXISTS crack_verdicts_test")


def test_request_batch_accepts_uppercase_hex(spark):
    """A request carrying uppercase hex must match: the join normalizes
    with lower() exactly like crack() lowercases its target digest."""
    hit = hashlib.sha256(b"abc").hexdigest().upper()
    reqs = spark.createDataFrame(
        [(1, hit, 3, None)],
        "request_id LONG, hash STRING, width INT, submitted_at TIMESTAMP",
    )
    [r] = req_stream.answer_request_batch(spark, reqs, hash_func="sha256").collect()
    assert (r["found"], r["reply"]) == (True, "f abc")


def test_seqnum_accept_stateful_stream(spark, tmp_path):
    """T3: per-connection seqnum acceptance with state carried ACROSS
    micro-batches (lsp_server.c:241-249 accept filter)."""
    src = tmp_path / "messages"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("connid", T.LongType()),
            T.StructField("seqnum", T.LongType()),
        ]
    )
    # two files processed as separate micro-batches (maxFilesPerTrigger=1);
    # the duplicate/gap verdicts in file B depend on state built by file A
    _write_json(
        str(src / "a.json"),
        [{"connid": 7, "seqnum": 1}, {"connid": 7, "seqnum": 2}],
    )
    time.sleep(1.1)  # distinct mtimes => deterministic file order
    _write_json(
        str(src / "b.json"),
        [
            {"connid": 7, "seqnum": 2},  # duplicate (<= last accepted)
            {"connid": 7, "seqnum": 3},  # accepted
            {"connid": 7, "seqnum": 5},  # gap (last+1 == 4 expected)
        ],
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    audited = stateful.seqnum_accept_stream(stream)
    q = (
        audited.writeStream.format("memory")
        .queryName("seq_audit_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["seqnum"], r["status"])
        for r in spark.sql("SELECT * FROM seq_audit_test").collect()
    }
    assert rows == {
        (1, "accepted"),
        (2, "accepted"),
        (2, "duplicate"),
        (3, "accepted"),
        (5, "gap"),
    }


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """T2: session-window liveness computed over a stream equals the batch
    twin on the same data (the property that lets the oracle corpus check
    the streaming semantics in batch mode)."""
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        # conn 1: two sessions separated by > 10s of silence
        {"user_id": 1, "ts": "2026-01-01T00:00:00.000Z"},
        {"user_id": 1, "ts": "2026-01-01T00:00:05.000Z"},
        {"user_id": 1, "ts": "2026-01-01T00:00:30.000Z"},
        # conn 2: one session
        {"user_id": 2, "ts": "2026-01-01T00:00:02.000Z"},
    ]
    _write_json(str(src / "events.json"), rows)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        sessions.sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["connid"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_test").collect()
    }
    batch_df = spark.read.schema(schema).json(str(src))
    batch = {
        (r["connid"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessions.sessionize(batch_df).collect()
    }
    assert streamed == batch
    assert len(batch) == 3  # conn 1 splits into two sessions, conn 2 has one

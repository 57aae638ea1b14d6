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


def test_watermark_finalizes_windows_and_drops_late_rows(spark, tmp_path):
    """Event-time semantics under APPEND mode: a tumbling window is only
    emitted once the watermark passes its end (finalization), and a row
    arriving after the watermark has moved past its window is DROPPED —
    the bounded-state contract that lets a windowed aggregation run
    forever at 100 TB (without a watermark, window state grows without
    bound and late data reopens arbitrarily old windows).

    Four single-file micro-batches (maxFilesPerTrigger=1, ordered by
    mtime).  Note the micro-batch watermark discipline: the late-row
    filter of batch N uses the watermark computed at the END of batch
    N-1, so a row only counts as late once a PRIOR batch advanced the
    watermark past it:
      b0: two rows in window [00:00, 00:10)   -> nothing emitted yet
      b1: one row at 00:00:30                 -> end-of-batch watermark
          becomes 00:00:25
      b2: one row at 00:00:50                 -> batch runs with wm 25:
          [00:00, 00:10) finalizes with n=2; wm advances to 00:00:45
      b3: a LATE row at 00:00:02 (< wm 45)    -> DROPPED; the finalized
          window is not reopened or re-emitted
    """
    src = tmp_path / "events"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    _write_json(
        str(src / "b0.json"),
        [
            {"user_id": 1, "ts": "2026-01-01T00:00:01.000Z", "value": 1.0},
            {"user_id": 2, "ts": "2026-01-01T00:00:03.000Z", "value": 2.0},
        ],
    )
    _write_json(
        str(src / "b1.json"),
        [{"user_id": 1, "ts": "2026-01-01T00:00:30.000Z", "value": 4.0}],
    )
    _write_json(
        str(src / "b2.json"),
        [{"user_id": 1, "ts": "2026-01-01T00:00:50.000Z", "value": 16.0}],
    )
    _write_json(
        str(src / "b3.json"),
        [{"user_id": 3, "ts": "2026-01-01T00:00:02.000Z", "value": 8.0}],
    )
    # the file source orders batches by modification time, not name —
    # pin distinct mtimes so b0 -> b1 -> b2 -> b3 is the processing order
    import os

    for i, name in enumerate(["b0.json", "b1.json", "b2.json", "b3.json"]):
        t = time.time() - 300 + i * 10
        os.utime(str(src / name), (t, t))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        sessions.tumbling(stream, duration="10 seconds", watermark="5 seconds")
        .writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (str(r.window_start), r.n_events, r.window_value)
        for r in spark.sql("SELECT * FROM wm_test").collect()
    }
    # finalized windows only, late row in none of them: [00:00, 00:10)
    # has n=2/value 1+2, [00:30, 00:40) finalized by b2's watermark jump
    assert rows == {
        ("2026-01-01 00:00:00", 2, 3.0),
        ("2026-01-01 00:00:30", 1, 4.0),
    }
    # the drop is observable in the state-operator metrics
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped >= 1


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream inner join with watermark-bounded state: two live
    file streams correlated on user_id within a 60 s window must
    produce exactly the batch join's pairs.  Both sides are unbounded,
    so Spark buffers rows in join state and needs the watermark + the
    two-sided time bound to evict — without them this query would be
    rejected or grow state forever."""
    from csce438_distributed_password_cracker_spark.streaming import correlate

    clicks = tmp_path / "clicks"
    buys = tmp_path / "buys"
    clicks.mkdir(), buys.mkdir()
    _write_json(
        str(clicks / "c.json"),
        [
            {"user_id": 1, "ts": "2026-01-01T00:00:00.000Z"},
            {"user_id": 1, "ts": "2026-01-01T00:02:00.000Z"},
            {"user_id": 2, "ts": "2026-01-01T00:00:10.000Z"},
        ],
    )
    _write_json(
        str(buys / "b.json"),
        [
            {"user_id": 1, "ts": "2026-01-01T00:00:30.000Z"},  # pairs c1
            {"user_id": 2, "ts": "2026-01-01T00:05:00.000Z"},  # outside 60s
            {"user_id": 3, "ts": "2026-01-01T00:00:05.000Z"},  # no click
        ],
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    l_stream = spark.readStream.schema(schema).json(str(clicks))
    r_stream = spark.readStream.schema(schema).json(str(buys))
    q = (
        correlate.correlate_streams(
            l_stream, r_stream, within_seconds=60
        )
        .writeStream.format("memory")
        .queryName("sj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, str(r.l_ts), str(r.r_ts), r.lag_seconds)
        for r in spark.sql("SELECT * FROM sj_test").collect()
    }
    l_batch = spark.read.schema(schema).json(str(clicks))
    r_batch = spark.read.schema(schema).json(str(buys))
    batch = {
        (r.user_id, str(r.l_ts), str(r.r_ts), r.lag_seconds)
        for r in correlate.correlate_streams(
            l_batch, r_batch, within_seconds=60
        ).collect()
    }
    assert streamed == batch
    assert batch == {
        (1, "2026-01-01 00:00:00", "2026-01-01 00:00:30", 30),
    }


def test_liveness_timeout_declares_silent_connection_dead(spark, tmp_path):
    """T2 stateful-timeout analog of the reference's failure detector
    (5 silent epochs => dead, lsp_server.c:31-35): a live stream where
    conn 2 goes silent must emit its terminal 'dead' row on a later
    micro-batch via ProcessingTimeTimeout, while the still-active
    conn 1 stays alive."""
    import os

    from csce438_distributed_password_cracker_spark.streaming.stateful import (
        liveness_stream,
    )

    src = tmp_path / "msgs"
    src.mkdir()
    schema = T.StructType([T.StructField("connid", T.LongType())])
    _write_json(str(src / "f1.json"), [{"connid": 1}, {"connid": 2}])

    q = (
        liveness_stream(
            spark.readStream.schema(schema).json(str(src)),
            # large enough that conn 1's refresh (written right after
            # batch 1 is observed) lands before ITS deadline even under
            # cold-start JIT latency, small enough that the test
            # observes conn 2's death promptly
            dead_after_ms=8000,
        )
        .writeStream.format("memory")
        .queryName("liveness_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # wait for batch 1 (both conns alive)
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT * FROM liveness_test").count() >= 2:
                break
            time.sleep(0.5)
        # conn 1 keeps talking; conn 2 stays silent past its deadline
        _write_json(str(src / "f2.json"), [{"connid": 1}])
        # wait until conn 1's refresh batch is VISIBLE (n_msgs=2 alive
        # row) — proof its timer re-armed before observing any death
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(
                r.connid == 1 and r.status == "alive" and r.n_msgs == 2
                for r in spark.sql("SELECT * FROM liveness_test").collect()
            ):
                break
            time.sleep(0.5)
        deadline = time.time() + 60
        dead = set()
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM liveness_test").collect()
            dead = {r.connid for r in rows if r.status == "dead"}
            if dead:
                break
            time.sleep(0.5)
        assert dead == {2}
        rows = spark.sql("SELECT * FROM liveness_test").collect()
        dead_row = next(r for r in rows if r.status == "dead")
        assert dead_row.n_msgs == 1  # it saw one message before dying
        alive_counts = [
            r.n_msgs for r in rows if r.connid == 1 and r.status == "alive"
        ]
        assert max(alive_counts) == 2  # conn 1 counted both its messages
    finally:
        q.stop()


def test_stream_stream_left_outer_emits_unmatched_on_watermark(
    spark, tmp_path
):
    """Left-outer stream-stream join: an unmatched left event emits its
    null-padded row only after the global watermark (the MIN across
    both sources) passes its whole match window — the same eviction
    that bounds join state.  Both sources get a far-future row so the
    watermark actually advances and flushes the outer results."""
    import os

    from csce438_distributed_password_cracker_spark.streaming import correlate

    clicks = tmp_path / "clicks"
    buys = tmp_path / "buys"
    clicks.mkdir(), buys.mkdir()
    _write_json(
        str(clicks / "c1.json"),
        [
            {"user_id": 1, "ts": "2026-01-01T00:00:00.000Z"},  # matches
            {"user_id": 5, "ts": "2026-01-01T00:00:05.000Z"},  # never buys
        ],
    )
    _write_json(
        str(buys / "b1.json"),
        [{"user_id": 1, "ts": "2026-01-01T00:00:30.000Z"}],
    )
    # far-future rows push BOTH sources' watermarks past every window
    _write_json(
        str(clicks / "c2.json"),
        [{"user_id": 90, "ts": "2026-01-01T01:00:00.000Z"}],
    )
    _write_json(
        str(buys / "b2.json"),
        [{"user_id": 91, "ts": "2026-01-01T01:00:00.000Z"}],
    )
    for d, names in ((clicks, ["c1.json", "c2.json"]), (buys, ["b1.json", "b2.json"])):
        for i, n in enumerate(names):
            t = time.time() - 300 + i * 10
            os.utime(str(d / n), (t, t))

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    q = (
        correlate.correlate_streams(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(clicks)),
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(buys)),
            within_seconds=60,
            watermark="5 seconds",
            how="left_outer",
        )
        .writeStream.format("memory")
        .queryName("sj_outer_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.user_id, str(r.l_ts), r.r_ts and str(r.r_ts), r.lag_seconds)
        for r in spark.sql("SELECT * FROM sj_outer_test").collect()
    }
    # matched pair for user 1; null-padded rows for the never-matched
    # click of user 5 (its window [5s, 65s] is fully behind the final
    # watermark ~59:55)
    assert (1, "2026-01-01 00:00:00", "2026-01-01 00:00:30", 30) in rows
    assert (5, "2026-01-01 00:00:05", None, None) in rows
    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="left_outer"):
        correlate.correlate_streams(
            spark.read.schema(schema).json(str(clicks)),
            spark.read.schema(schema).json(str(buys)),
            how="full",
        )

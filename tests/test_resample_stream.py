"""Streaming resample + LOCF (streaming/resample_stream.py): batch
kernel closed form, cross-micro-batch state carry (gaps spanning
batches, O(keys) state), late-event corrections, agreement with the
batch operator, and a LIVE run through a real file-source stream."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csce438_distributed_password_cracker_spark.streaming import (
    resample_stream as rs,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _batch_apply(spark, df, interval):
    """The same kernel over a batch frame via applyInPandas (the
    whole-input-in-one-micro-batch equivalence)."""
    prepared = df.select(
        F.col("event_type").cast("string").alias("key"),
        "ts",
        F.col("value").cast("double").alias("value"),
        F.col("event_id").cast("long").alias("event_id"),
    )

    kernel = rs.make_resample_fn(interval)

    class _FakeState:
        exists = False
        hasTimedOut = False

        def get(self):  # pragma: no cover - overwritten below
            raise KeyError

        def update(self, v):
            self._v = v

    def run(key, pdf):
        state = _FakeState()
        out = list(kernel(key, iter([pdf]), state))
        import pandas as pd

        return (
            out[0]
            if out
            else pd.DataFrame(columns=rs._COLS)
        )

    return prepared.groupBy("key").applyInPandas(
        run, schema=rs.RESAMPLE_SCHEMA
    )


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _t(s):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


def test_batch_kernel_matches_batch_operator(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.catalog import load_table
    from csce438_distributed_password_cracker_spark.operators.resample import (
        resample_locf,
    )

    ev = load_table(spark, sf_smoke, "events")
    got = {
        (r["key"], r["bin"]): (r["n_events"], r["filled"], r["value_locf"])
        for r in _batch_apply(spark, ev, 6 * 3600).collect()
    }
    want = {
        (r["event_type"], r["bin"]): (
            r["n_events"], r["filled"], r["value_locf"],
        )
        for r in resample_locf(
            ev, "event_type", "ts", 6 * 3600, "value", "event_id"
        ).collect()
    }
    assert got == want


def test_live_stream_state_carries_across_microbatches(spark, tmp_path):
    """Two micro-batches with a gap BETWEEN them: the second batch must
    emit the intervening gap bins with the first batch's LOCF value,
    and a late event must surface as a correction row."""
    src = tmp_path / "src"
    src.mkdir()

    def write(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    out_dir = tmp_path / "out"

    def run():
        # parquet sink: the memory sink cannot recover from a
        # checkpoint, and cross-micro-batch state is the whole point
        q = (
            rs.resample_stream(
                spark.readStream.schema(SCHEMA).json(str(src)), 60
            )
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write("b0.json", [
        {"event_type": "a", "ts": "2024-01-01T00:00:10.000Z",
         "value": 1.5, "event_id": 1},
        {"event_type": "a", "ts": "2024-01-01T00:00:40.000Z",
         "value": 2.5, "event_id": 2},
    ])
    run()
    # batch 2: next event 3 minutes later + one late event
    write("b1.json", [
        {"event_type": "a", "ts": "2024-01-01T00:04:30.000Z",
         "value": 9.0, "event_id": 3},
        {"event_type": "a", "ts": "2024-01-01T00:00:50.000Z",
         "value": 7.0, "event_id": 4},  # late: bin 0 already emitted
    ])
    run()
    rows = {
        (r["bin"], r["late"]): r
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    base = min(b for b, _ in rows)
    # batch 1 emitted only bin 0 (its newest); batch 2 emitted the gap
    # bins 1..3 with LOCF=2.5 and the observed bin 4 with 9.0
    on_time = {
        b - base: (r["n_events"], r["filled"], r["value_locf"])
        for (b, late), r in rows.items()
        if not late
    }
    assert on_time == {
        0: (2, False, 2.5),
        1: (0, True, 2.5),
        2: (0, True, 2.5),
        3: (0, True, 2.5),
        4: (1, False, 9.0),
    }
    # the late event surfaced as a correction, not a state rewind
    late_rows = [r for (b, late), r in rows.items() if late]
    assert len(late_rows) == 1
    assert late_rows[0]["bin"] == base
    assert late_rows[0]["n_events"] == 1


def test_kernel_validation():
    with pytest.raises(ValueError):
        rs.make_resample_fn(0)


def test_kernel_span_guard(spark):
    """Regression (round-5 review): a stray timestamp in a batch must
    raise before emitting millions of gap rows or poisoning state."""
    import datetime as dt

    import pandas as pd

    kernel = rs.make_resample_fn(60, max_gap_bins=1000)

    class _S:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self._v = v

    pdf = pd.DataFrame(
        {
            "ts": [
                pd.Timestamp("1970-01-01 00:00:00"),
                pd.Timestamp("2024-01-01 00:00:00"),
            ],
            "value": [1.0, 2.0],
            "event_id": [1, 2],
        }
    )
    with pytest.raises(ValueError, match="max_gap_bins"):
        list(kernel(("a",), iter([pdf]), _S()))

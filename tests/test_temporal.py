"""As-of and range join operators: golden edge cases (no match, match at
equal instant, tie between events, bin-boundary ranges)."""

from __future__ import annotations

from datetime import datetime

from csce438_distributed_password_cracker_spark.operators import temporal


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_golden(spark):
    probes = spark.createDataFrame(
        [
            (1, 10, _ts("2026-01-01 10:00:00")),  # after e1, before e2
            (2, 10, _ts("2026-01-01 12:00:00")),  # exactly at e2 -> e2
            (3, 10, _ts("2026-01-01 08:00:00")),  # before everything -> NULL
            (4, 20, _ts("2026-01-01 10:00:00")),  # key with no events -> NULL
        ],
        "probe_id LONG, k LONG, pts TIMESTAMP",
    )
    events = spark.createDataFrame(
        [
            (100, 10, _ts("2026-01-01 09:00:00")),
            (200, 10, _ts("2026-01-01 12:00:00")),
        ],
        "ev LONG, k LONG, ets TIMESTAMP",
    )
    out = {
        r["probe_id"]: r["ev"]
        for r in temporal.asof_join(
            probes, events, key="k", probe_ts="pts", event_ts="ets",
            payload_cols=["ev"],
        ).collect()
    }
    assert out == {1: 100, 2: 200, 3: None, 4: None}


def test_asof_join_tie_takes_max_order(spark):
    probes = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01 10:00:00"))], "probe_id LONG, k LONG, pts TIMESTAMP"
    )
    events = spark.createDataFrame(
        [
            (7, 10, _ts("2026-01-01 09:00:00")),
            (9, 10, _ts("2026-01-01 09:00:00")),  # same instant: max ev wins
        ],
        "ev LONG, k LONG, ets TIMESTAMP",
    )
    [r] = temporal.asof_join(
        probes, events, key="k", probe_ts="pts", event_ts="ets",
        payload_cols=["ev"],
    ).collect()
    assert r["ev"] == 9


def test_range_join_count_golden(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01 10:00:00"))], "lid LONG, k LONG, lts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2026-01-01 09:30:01")),  # inside (-29m59s)
            (10, _ts("2026-01-01 10:29:59")),  # inside (+29m59s)
            (10, _ts("2026-01-01 10:30:00")),  # boundary: exactly +radius
            (10, _ts("2026-01-01 10:30:01")),  # outside
            (10, _ts("2026-01-01 08:00:00")),  # far outside (different bin)
            (99, _ts("2026-01-01 10:00:00")),  # wrong key
        ],
        "k LONG, rts TIMESTAMP",
    )
    [r] = temporal.range_join_count(
        left, right, key="k", left_ts="lts", right_ts="rts",
        radius_seconds=1800,
    ).collect()
    assert r["n_in_range"] == 3  # two inside + inclusive boundary


def test_range_join_small_bins_still_complete(spark):
    # bin_seconds < radius_seconds: in-range rows sit several bins away;
    # the probe span must widen to ceil(radius/bin) so none are missed.
    left = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01 10:00:00"))], "lid LONG, k LONG, lts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2026-01-01 09:31:00")),  # 29m away = ~5 bins of 6m
            (10, _ts("2026-01-01 10:29:00")),  # 29m away the other side
            (10, _ts("2026-01-01 10:31:00")),  # outside radius
        ],
        "k LONG, rts TIMESTAMP",
    )
    [r] = temporal.range_join_count(
        left, right, key="k", left_ts="lts", right_ts="rts",
        radius_seconds=1800, bin_seconds=360,
    ).collect()
    assert r["n_in_range"] == 2


def test_range_join_zero_matches_keeps_left_row(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01 10:00:00"))], "lid LONG, k LONG, lts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(99, _ts("2026-01-01 10:00:00"))], "k LONG, rts TIMESTAMP"
    )
    [r] = temporal.range_join_count(
        left, right, key="k", left_ts="lts", right_ts="rts", radius_seconds=60
    ).collect()
    assert r["lid"] == 1 and r["n_in_range"] == 0

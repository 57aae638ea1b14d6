"""Time-series resample + LOCF (operators/resample.py): grid closed
form, gap filling, tie-breaks, per-key spans, span guard, and the
events-table end-to-end reconciliation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import resample


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, val double, eid long"
    )


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_grid_gaps_and_locf_closed_form(spark):
    rows = [
        ("a", _t("2024-01-01 00:00:30"), 1.0, 1),
        ("a", _t("2024-01-01 00:00:45"), 2.0, 2),
        # 00:01 empty, 00:02 empty
        ("a", _t("2024-01-01 00:03:10"), 9.0, 3),
        ("b", _t("2024-01-01 00:05:00"), 7.0, 4),
    ]
    out = {
        (r["key"], r["bin_start"].minute): r
        for r in resample.resample_locf(
            _ev(spark, rows), "key", "ts", 60, "val", "eid"
        ).collect()
    }
    # key a spans minutes 0..3 — exactly 4 bins; key b exactly 1
    assert sorted(k for k in out) == [
        ("a", 0), ("a", 1), ("a", 2), ("a", 3), ("b", 5),
    ]
    a0, a1, a2, a3 = (out[("a", m)] for m in range(4))
    assert (a0["n_events"], a0["filled"], a0["val_locf"]) == (2, False, 2.0)
    assert (a1["n_events"], a1["filled"], a1["val_locf"]) == (0, True, 2.0)
    assert (a2["n_events"], a2["filled"], a2["val_locf"]) == (0, True, 2.0)
    assert (a3["n_events"], a3["filled"], a3["val_locf"]) == (1, False, 9.0)
    assert out[("b", 5)]["val_locf"] == 7.0


def test_same_instant_tiebreak_by_id(spark):
    ts = _t("2024-01-01 00:00:00")
    rows = [("a", ts, 1.0, 1), ("a", ts, 5.0, 2), ("a", ts, 3.0, 0)]
    out = resample.resample_locf(
        _ev(spark, rows), "key", "ts", 60, "val", "eid"
    ).collect()
    assert len(out) == 1 and out[0]["val_locf"] == 5.0  # max eid wins


def test_value_null_until_first_observation(spark):
    # a bin with events whose value is NULL keeps the previous LOCF
    rows = [
        ("a", _t("2024-01-01 00:00:00"), None, 1),
        ("a", _t("2024-01-01 00:01:00"), 4.0, 2),
    ]
    out = sorted(
        resample.resample_locf(
            _ev(spark, rows), "key", "ts", 60, "val", "eid"
        ).collect(),
        key=lambda r: r["bin"],
    )
    assert out[0]["val_locf"] is None  # nothing observed yet
    assert out[1]["val_locf"] == 4.0


def test_span_guard_trips_on_stray_timestamp(spark):
    rows = [
        ("a", _t("1970-01-01 00:00:00"), 1.0, 1),
        ("a", _t("2024-01-01 00:00:00"), 2.0, 2),
    ]
    # the guard is LAZY (rides the grid expression) — it fires at
    # action time without a second pass over the corpus
    out = resample.resample_locf(
        _ev(spark, rows), "key", "ts", 60, "val", "eid",
        max_bins_per_key=1000,
    )
    with pytest.raises(Exception, match="max_bins_per_key"):
        out.count()
    with pytest.raises(ValueError):
        resample.resample_locf(_ev(spark, rows), "key", "ts", 0)


def test_events_table_reconciles(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.catalog import load_table

    ev = load_table(spark, sf_smoke, "events")
    out = resample.resample_locf(
        ev, "event_type", "ts", 6 * 3600, "value", "event_id"
    )
    # every event lands in exactly one bin
    assert (
        out.agg(F.sum("n_events")).first()[0] == ev.count()
    )
    # gap bins exist and their LOCF is non-null after first observation
    assert out.where("filled").count() >= 0
    per_key = out.groupBy("event_type").agg(
        F.count("*").alias("bins"),
        F.min("bin").alias("b0"),
        F.max("bin").alias("b1"),
    )
    for r in per_key.collect():
        assert r["bins"] == r["b1"] - r["b0"] + 1  # contiguous grid
    # deterministic across repartition
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            resample.resample_locf(
                ev.repartition(17), "event_type", "ts",
                6 * 3600, "value", "event_id",
            ).collect(),
        )
    )
    assert a == b


def test_null_measurement_does_not_erase_carry(spark):
    """Regression (round-5 review): a bin whose LAST event carries a
    NULL value must keep the bin's last NON-null observation — NULL
    is 'no measurement', not 'observe NULL' (streaming kernel and the
    SQL twin's arg_max agree)."""
    rows = [
        ("a", _t("2024-01-01 00:00:10"), 5.0, 1),
        ("a", _t("2024-01-01 00:00:50"), None, 2),  # later, NULL
        ("a", _t("2024-01-01 00:02:00"), None, 3),  # all-NULL bin
    ]
    out = sorted(
        resample.resample_locf(
            _ev(spark, rows), "key", "ts", 60, "val", "eid"
        ).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["val_locf"] for r in out] == [5.0, 5.0, 5.0]


def test_interp_closed_form_and_edges(spark):
    """Linear interpolation: interior gaps lerp between anchors, an
    all-NULL-value bin never anchors the line, leading bins stay NULL,
    trailing bins hold flat (≡ LOCF), observed bins keep their own
    value."""
    rows = [
        ("a", _t("2024-01-01 00:01:00"), None, 1),   # leading NULL obs
        ("a", _t("2024-01-01 00:02:00"), 10.0, 2),
        # 00:03, 00:04 empty -> lerp toward 40
        ("a", _t("2024-01-01 00:05:00"), 40.0, 3),
        ("a", _t("2024-01-01 00:06:00"), None, 4),   # NULL bin mid-series
        # 00:07 empty
        ("a", _t("2024-01-01 00:08:00"), 70.0, 5),
        # trailing gap 00:09 via a NULL-valued event
        ("a", _t("2024-01-01 00:09:00"), None, 6),
    ]
    out = {
        r["bin_start"].minute: r
        for r in resample.resample_interp(
            _ev(spark, rows), "key", "ts", 60, "val", "eid"
        ).collect()
    }
    assert out[1]["val_interp"] is None          # before first anchor
    assert out[2]["val_interp"] == 10.0          # observed
    assert out[3]["val_interp"] == 20.0          # lerp 10->40 at 1/3
    assert out[4]["val_interp"] == 30.0
    assert out[5]["val_interp"] == 40.0
    # bins 6 and 7 sit between anchors 5 (40.0) and 8 (70.0): the NULL
    # bin at 6 must NOT anchor — both lerp on the 40->70 line
    assert out[6]["val_interp"] == 50.0
    assert out[7]["val_interp"] == 60.0
    assert out[8]["val_interp"] == 70.0          # observed
    assert out[9]["val_interp"] == 70.0          # trailing: hold flat
    # LOCF column still rides along unchanged
    assert out[3]["val_locf"] == 10.0 and out[9]["val_locf"] == 70.0
    assert "_last" not in resample.resample_interp(
        _ev(spark, rows), "key", "ts", 60, "val", "eid"
    ).columns


def test_interp_adds_no_exchange_over_locf(spark):
    rows = [("a", _t("2024-01-01 00:00:00"), 1.0, 1)]
    df = _ev(spark, rows)
    locf_plan = (
        resample.resample_locf(df, "key", "ts", 60, "val", "eid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    interp_plan = (
        resample.resample_interp(df, "key", "ts", 60, "val", "eid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n = lambda p: sum(1 for ln in p.splitlines() if "Exchange" in ln)  # noqa: E731
    assert n(interp_plan) == n(locf_plan), interp_plan

"""Robust outlier flagging (operators/outliers.py): fence closed forms,
flag semantics, NULL handling, fence reuse, and the map-only verdict
plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators.outliers import (
    MAD_SCALE,
    flag_outliers,
    outlier_bounds,
)


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )


def test_iqr_fences_closed_form_and_flags(spark):
    # 0..99: q1=24.75, q3=74.25 (linear interpolation), iqr=49.5
    vals = [float(x) for x in range(100)] + [1e6]
    df = _df(spark, vals)
    lo, hi = outlier_bounds(df, "v", method="iqr", k=1.5, exact=True)
    out = flag_outliers(df, "v", method="iqr", k=1.5, exact=True)
    rows = {r["id"]: r for r in out.collect()}
    flagged = {i for i, r in rows.items() if r["is_outlier"]}
    assert flagged == {100}  # only the planted 1e6
    assert rows[0]["bound_lo"] == pytest.approx(lo)
    assert rows[0]["bound_hi"] == pytest.approx(hi)
    # python model of the same fence arithmetic
    import statistics

    s = sorted(vals)
    def q(p):
        # percentile() linear interpolation (type-7)
        h = (len(s) - 1) * p
        f = int(h)
        return s[f] + (h - f) * (s[min(f + 1, len(s) - 1)] - s[f])

    assert lo == pytest.approx(q(0.25) - 1.5 * (q(0.75) - q(0.25)))
    assert hi == pytest.approx(q(0.75) + 1.5 * (q(0.75) - q(0.25)))
    del statistics


def test_mad_fences_catch_what_a_moved_mean_hides(spark):
    # 50 honest readings near 10 + one 1e9 glitch: the glitch is flagged
    # and the honest band is NOT (a mean/std fence would swallow both —
    # the std explodes past the honest values' deviation)
    vals = [10.0 + (i % 5) * 0.1 for i in range(50)] + [1e9]
    df = _df(spark, vals)
    out = flag_outliers(df, "v", method="mad", k=3.0, exact=True)
    flagged = {r["id"] for r in out.collect() if r["is_outlier"]}
    assert flagged == {50}
    lo, hi = outlier_bounds(df, "v", method="mad", k=3.0, exact=True)
    assert lo <= 10.0 and hi >= 10.4 and hi < 1e9
    # fence matches the python model: med ± k·1.4826·MAD
    s = sorted(vals)
    med = s[25]
    mad = sorted(abs(x - med) for x in vals)[25]
    assert hi == pytest.approx(med + 3.0 * MAD_SCALE * mad)


def test_null_values_flag_null_and_are_ignored_by_fences(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, None), (3, 3.0), (4, 100.0)],
        "id long, v double",
    )
    out = {r["id"]: r["is_outlier"] for r in
           flag_outliers(df, "v", exact=True).collect()}
    assert out[2] is None
    assert out[4] is True


def test_bounds_reuse_and_maponly_verdict(spark):
    ref = _df(spark, [float(x) for x in range(100)])
    lo, hi = outlier_bounds(ref, "v", method="iqr", k=1.5, exact=True)
    fresh = _df(spark, [50.0, -500.0, 500.0])
    out = flag_outliers(fresh, "v", bounds=(lo, hi))
    got = [r["is_outlier"] for r in out.orderBy("id").collect()]
    assert got == [False, True, True]
    # with literal fences the verdict never shuffles
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_method_guard(spark):
    df = _df(spark, [1.0, 2.0])
    with pytest.raises(ValueError, match="iqr.*mad|method"):
        outlier_bounds(df, "v", method="zscore")


def test_approx_bounds_agree_on_separated_data(spark):
    # GK quantiles at 1e-4 relative error move fences by ~range*eps —
    # far less than the gap to the planted outlier, so verdicts agree
    vals = [float(x % 100) for x in range(10_000)] + [1e7]
    df = _df(spark, vals)
    exact = flag_outliers(df, "v", exact=True)
    approx = flag_outliers(df, "v", exact=False)
    assert sorted(
        r["id"] for r in exact.collect() if r["is_outlier"]
    ) == sorted(r["id"] for r in approx.collect() if r["is_outlier"])


def test_grouped_fences_per_group_and_match_global_within_group(spark):
    """Per-group fences: each group is judged by its OWN range (a value
    normal in a wide group is an outlier in a tight one), and a group's
    fences equal the global operator run on that group alone."""
    from csce438_distributed_password_cracker_spark.operators.outliers import (
        flag_outliers_grouped,
    )

    rows = (
        # tight group: 100±1, plus a 110 that only THIS group flags
        [(i, "tight", 100.0 + (i % 3) - 1) for i in range(40)]
        + [(100, "tight", 110.0)]
        # wide group: 0..1000 — 110 would be perfectly normal here
        + [(200 + i, "wide", float(i * 25)) for i in range(41)]
    )
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = flag_outliers_grouped(
        df, ["grp"], "v", method="iqr", k=1.5, exact=True
    )
    flagged = {r["id"] for r in out.collect() if r["is_outlier"]}
    assert flagged == {100}
    # group fences == global fences computed on the slice
    tight = df.where("grp = 'tight'")
    lo, hi = outlier_bounds(tight, "v", method="iqr", k=1.5, exact=True)
    got = out.where("grp = 'tight'").select("bound_lo", "bound_hi").first()
    assert (got[0], got[1]) == (pytest.approx(lo), pytest.approx(hi))
    # grouped MAD path exercises the two-stage median
    mad_out = flag_outliers_grouped(
        df, ["grp"], "v", method="mad", k=3.0, exact=True
    )
    assert {r["id"] for r in mad_out.collect() if r["is_outlier"]} == {100}
    with pytest.raises(ValueError, match="group_cols"):
        flag_outliers_grouped(df, [], "v")


def test_grouped_preserves_null_group_rows(spark):
    """A NULL group key is its own group (groupBy semantics) and its
    rows survive the fence joins — the screen never changes row count."""
    from csce438_distributed_password_cracker_spark.operators.outliers import (
        flag_outliers_grouped,
    )

    rows = [(i, None, float(i % 10)) for i in range(30)] + [
        (30, None, 1e6),
        (40, "g", 1.0), (41, "g", 2.0), (42, "g", 3.0), (43, "g", 4.0),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    for method in ("iqr", "mad"):
        out = flag_outliers_grouped(df, ["grp"], "v", method=method,
                                    exact=True)
        assert out.count() == df.count(), method
        flagged = {r["id"] for r in out.collect() if r["is_outlier"]}
        assert flagged == {30}, method


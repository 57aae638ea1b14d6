"""Robust outlier flagging — Tukey IQR fences and MAD z-scores, the
numeric-column screening step a pipeline runs before training on
telemetry/price/measurement columns (corrupt sensors, fat-finger
values, unit mix-ups).

Reference analog: none (north-star extension, BASELINE.json); public
prior art: Tukey 1977 (box-plot fences), Hampel 1974 / Leys 2013 (MAD,
consistency constant 1.4826 for normal data).

Why ROBUST statistics: mean/stddev move with the outliers they are
supposed to find (one 1e12 glitch shifts the mean past every honest
value); quartiles and the median absolute deviation don't.  A
plain-zscore variant is deliberately not offered — callers who want it
can compose mean/stddev themselves, and the float-sum accumulation
order would make it nondeterministic across partitionings anyway.

Scale shape (100 TB):

- bounds are ONE aggregation reduced to a single driver row (a bounded
  collect by construction), then the verdict is a MAP-ONLY comparison
  against plan-literal fences — no shuffle touches the corpus;
- the default bounds pass uses ``approxQuantile`` (Greenwald-Khanna,
  one pass, mergeable) — percentile error moves the FENCE by ~ε·range,
  it does not corrupt the verdict logic; ``exact=True`` switches to the
  sort-based exact ``percentile`` (what the oracle-checked gate query
  uses — Spark ``percentile`` ≡ DuckDB ``quantile_cont`` up to
  interpolation op order, identical except ulps at subnormal spacing);
- MAD needs a second pass (median of |x − median|, inherently nested);
  IQR needs one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_SCALE = 1.4826  # E|N(0,1)| MAD⁻¹ — makes k comparable to a z-score


def outlier_bounds(
    df: DataFrame,
    value_col: str,
    method: str = "iqr",
    k: float = 1.5,
    exact: bool = False,
    relative_error: float = 1e-4,
) -> tuple[float, float]:
    """(lo, hi) fence for ``value_col``:

    - ``iqr``: ``q1 − k·(q3 − q1)`` .. ``q3 + k·(q3 − q1)`` (Tukey,
      k=1.5 classic / 3.0 conservative);
    - ``mad``: ``med ± k·1.4826·MAD`` (k plays the z-score role).

    NULLs are ignored by the quantile (and flag NULL downstream).  All
    fence arithmetic is plain IEEE double in a fixed order, so the
    gate's DuckDB twin recomputes identical fences from identical exact
    quantiles."""
    if method not in ("iqr", "mad"):
        raise ValueError(f"method must be 'iqr' or 'mad', got {method!r}")

    from .quantiles import column_quantiles

    def _q(frame: DataFrame, col: str, probs: list[float]) -> list[float]:
        return column_quantiles(
            frame, col, probs, exact=exact, relative_error=relative_error
        )

    if method == "iqr":
        q1, q3 = _q(df, value_col, [0.25, 0.75])
        spread = k * (q3 - q1)
        return q1 - spread, q3 + spread
    med = _q(df, value_col, [0.5])[0]
    dev = df.select(
        (F.abs(F.col(value_col) - F.lit(med))).alias("__dev")
    )
    mad = _q(dev, "__dev", [0.5])[0]
    spread = k * MAD_SCALE * mad
    return med - spread, med + spread


def flag_outliers_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    method: str = "iqr",
    k: float = 1.5,
    exact: bool = False,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Per-group fences — "each sensor/domain/partition gets its own
    normal range", the shape that actually survives 100 TB: fences stay
    a DISTRIBUTED grouped aggregate (one shuffle on the group key, no
    driver collect, no per-group driver loop), broadcast-joined back,
    verdict map-only.  ``exact=True`` uses the sort-based ``percentile``
    (the oracle-checked path); default is ``approx_percentile``.

    Fence arithmetic runs as column expressions in the SAME fixed IEEE
    order as the global :func:`flag_outliers`, so a DuckDB twin with
    grouped ``quantile_cont`` reproduces fences and verdicts exactly.

    NULL group keys form their OWN group (groupBy semantics) and their
    rows are preserved — the fence joins are null-safe, so a screening
    step never changes the row count.  Join strategy is left to the
    optimizer (AQE broadcasts small fence tables automatically; a
    forced broadcast would die at web-scale group cardinality)."""
    if method not in ("iqr", "mad"):
        raise ValueError(f"method must be 'iqr' or 'mad', got {method!r}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    v = F.col(value_col)
    pfn = "percentile" if exact else "approx_percentile"

    def _nullsafe_join(left: DataFrame, right: DataFrame) -> DataFrame:
        r = right
        for g in group_cols:
            r = r.withColumnRenamed(g, f"__g_{g}")
        cond = None
        for g in group_cols:
            c = left[g].eqNullSafe(r[f"__g_{g}"])
            cond = c if cond is None else (cond & c)
        return left.join(r, cond, "inner").drop(
            *[f"__g_{g}" for g in group_cols]
        )

    def _p(col: str, p: float):
        return F.expr(f"{pfn}(`{col}`, {p!r})")

    if method == "iqr":
        fences = df.groupBy(*group_cols).agg(
            (
                _p(value_col, 0.25)
                - F.lit(k) * (_p(value_col, 0.75) - _p(value_col, 0.25))
            ).alias("bound_lo"),
            (
                _p(value_col, 0.75)
                + F.lit(k) * (_p(value_col, 0.75) - _p(value_col, 0.25))
            ).alias("bound_hi"),
        )
    else:
        med = df.groupBy(*group_cols).agg(
            _p(value_col, 0.5).alias("__med")
        )
        dev = _nullsafe_join(df, med).withColumn(
            "__dev", F.abs(v - F.col("__med"))
        )
        fences = dev.groupBy(*group_cols, "__med").agg(
            (
                F.col("__med")
                - F.lit(k) * F.lit(MAD_SCALE) * _p("__dev", 0.5)
            ).alias("bound_lo"),
            (
                F.col("__med")
                + F.lit(k) * F.lit(MAD_SCALE) * _p("__dev", 0.5)
            ).alias("bound_hi"),
        ).drop("__med")
    out = _nullsafe_join(df, fences)
    return out.select(
        "*",
        ((v < F.col("bound_lo")) | (v > F.col("bound_hi"))).alias(flag_col),
    )


def flag_outliers(
    df: DataFrame,
    value_col: str,
    method: str = "iqr",
    k: float = 1.5,
    exact: bool = False,
    flag_col: str = "is_outlier",
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Append ``bound_lo``/``bound_hi`` (the plan-literal fences) and
    ``flag_col`` — true iff the value falls STRICTLY outside [lo, hi],
    NULL for NULL values.  Pass ``bounds`` to reuse fences computed
    once (e.g. per-day scoring against a reference window)."""
    lo, hi = (
        bounds
        if bounds is not None
        else outlier_bounds(df, value_col, method, k, exact)
    )
    v = F.col(value_col)
    return df.select(
        "*",
        F.lit(lo).alias("bound_lo"),
        F.lit(hi).alias("bound_hi"),
        ((v < F.lit(lo)) | (v > F.lit(hi))).alias(flag_col),
    )

"""Shared driver-side quantile fetch — ONE aggregation reduced to a
handful of plan literals, the common first step of every fence/staging
operator (outlier fences, curriculum thresholds).

``exact=True`` uses the sort-based ``percentile`` (≡ DuckDB
``quantile_cont`` up to interpolation op order — Spark evaluates
``(1-frac)*lower + frac*higher``, DuckDB ``lower + frac*(higher-lower)``,
identical except for ulps at subnormal spacing — the oracle-checked
path); default is
``approxQuantile`` (Greenwald–Khanna, one mergeable pass — the 100 TB
path).  Extracted so the exact/approx pair and the all-NULL guard live
ONCE (the copies in outliers.py and split.py had already drifted before
this was factored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    exact: bool = False,
    relative_error: float = 1e-4,
) -> list[float]:
    """The quantiles of ``col`` at ``probs``, as plain floats.  Raises a
    clear ValueError when the column has no non-NULL values (percentile
    returns NULL / approxQuantile returns [] — neither message names
    the real problem downstream)."""
    if exact:
        arr = ", ".join(repr(p) for p in probs)
        row = df.select(F.expr(f"percentile(`{col}`, array({arr}))")).first()[
            0
        ]
        qs = [float(x) for x in row] if row is not None else []
    else:
        qs = [float(x) for x in df.approxQuantile(col, probs, relative_error)]
    if len(qs) != len(probs):
        raise ValueError(
            f"cannot compute quantiles: column {col!r} has no non-NULL "
            "values (empty input or fully-NULL feed)"
        )
    return qs

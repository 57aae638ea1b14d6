"""Vector column expressions over array<float>/array<double> embeddings.

All JVM-side (higher-order functions compile into codegen'd expressions):
no Python in the per-row path.  Floats are widened to double *before*
accumulation so results are engine-portable (float32 accumulation order
would diverge between engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def dot(a: str, b: str) -> Column:
    return F.expr(dot_sql(a, b))


def cosine(a: str, b: str) -> Column:
    return F.expr(cosine_sql(a, b))

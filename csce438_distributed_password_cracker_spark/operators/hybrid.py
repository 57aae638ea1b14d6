"""Hybrid retrieval — fuse a lexical (BM25) result list with a vector
(ANN) result list by Reciprocal Rank Fusion, the standard two-tower
retrieval stack (sparse + dense) reduced to its Spark shape.

Reference analog: none (north-star extension, BASELINE.json); composes
:mod:`operators.search` (BM25 probe) with :mod:`operators.similarity`
(ANN probes).

RRF (Cormack et al.): score(d) = Σ_lists 1/(k + rank_d) — rank-based,
so the two engines' incomparable score scales never need calibration;
k=60 is the published default.  Scale shape: both inputs are already
top-n lists (tiny), so fusion is a driver-scale operation expressed as
DataFrame algebra anyway — rank via a window over each list, full
outer join on the doc id, null ranks contribute 0.  The expensive work
(index probes) happens upstream with their own pruning; fusion adds no
scan and no meaningful shuffle (two ≤ n-row lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 60


def _ranked(results: DataFrame, id_col: str, score_col: str, tag: str) -> DataFrame:
    """(id, rrf_<tag>) — 1/(k + rank) with rank from the list's own
    score order, ties broken by id for determinism."""
    w = Window.orderBy(F.desc(score_col), F.col(id_col))
    return results.select(
        F.col(id_col).alias("id"),
        (1.0 / (F.lit(RRF_K) + F.row_number().over(w))).alias(f"rrf_{tag}"),
    )


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
    top_n: int = 10,
) -> DataFrame:
    """(id, rrf_score, in_lexical, in_vector): top_n docs by summed
    reciprocal ranks across the two lists."""
    lx = _ranked(lexical, id_col, score_col, "lex")
    vc = _ranked(vector, id_col, score_col, "vec")
    return (
        lx.join(vc, "id", "full_outer")
        .select(
            "id",
            F.round(
                F.coalesce("rrf_lex", F.lit(0.0))
                + F.coalesce("rrf_vec", F.lit(0.0)),
                8,
            ).alias("rrf_score"),
            F.col("rrf_lex").isNotNull().alias("in_lexical"),
            F.col("rrf_vec").isNotNull().alias("in_vector"),
        )
        .orderBy(F.desc("rrf_score"), "id")
        .limit(top_n)
    )

"""Similarity search over embedding columns (SURVEY.md §2.12 E2).

Baseline: brute-force cosine top-k (exact; O(n) per query — correct answer
and the verifier for everything else).  Scale path: random-hyperplane LSH —
sign-bit bucketing turns the scan into an equality-join on bucket keys;
multiple independent tables trade recall for probe cost.

Hyperplanes are generated from a seeded RNG on the driver (tiny:
n_planes × dim floats) and baked into the plan as array literals —
deterministic across runs, broadcast to every task; no model state.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors


def brute_force_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k of ``emb`` rows against the single-row ``query``
    DataFrame (broadcast).  TakeOrderedAndProject keeps this a per-partition
    heap + driver merge — no global sort."""
    return (
        emb.crossJoin(F.broadcast(query))
        .select(
            id_col,
            F.round(vectors.cosine(vec_col, query_vec_col), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(
    emb: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``bucket`` int64 column: sign bits of projections onto
    ``n_planes`` seeded random hyperplanes."""
    planes = _hyperplanes(n_planes, dim, seed)
    bits = [
        F.when(
            vectors.dot(vec_col, f"array({', '.join(f'{v}D' for v in plane)})") > 0,
            F.lit(1).cast("long"),
        )
        .otherwise(0)
        .alias(f"__bit{i}")
        for i, plane in enumerate(planes)
    ]
    return (
        emb.select("*", *bits)
        .withColumn(
            "bucket",
            F.expr(" + ".join(f"shiftleft(__bit{i}, {i})" for i in range(n_planes))),
        )
        .drop(*[f"__bit{i}" for i in range(n_planes)])
    )


def lsh_topk(
    emb: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: probe only vectors in the query's LSH bucket,
    re-rank exactly by cosine.  Recall grows with fewer planes / more
    tables; at cluster scale the bucketed table is pre-partitioned by
    ``bucket`` so a probe touches one partition."""
    bucketed = lsh_bucket(emb, dim, n_planes, seed, vec_col)
    qb = lsh_bucket(
        query.withColumnRenamed(query_vec_col, vec_col), dim, n_planes, seed, vec_col
    ).select(F.col("bucket").alias("qbucket"), F.col(vec_col).alias(query_vec_col))
    return (
        bucketed.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .select(
            id_col,
            F.round(vectors.cosine(vec_col, query_vec_col), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )

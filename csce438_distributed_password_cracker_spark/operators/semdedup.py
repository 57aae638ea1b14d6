"""SemDeDup-style semantic deduplication over an embedding column.

Public prior art: Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (2023) — cluster embeddings
with k-means, then deduplicate ONLY within each cluster, turning the
O(n²) all-pairs cosine problem into k independent O((n/k)²) problems
that are embarrassingly parallel and individually memory-bounded.

Reference analog: none (north-star addition, like the rest of the
embedding-dedup family in operators/similarity.py).

Scale shape (100 TB):

- Clustering reuses :func:`~.similarity.ivf_refine` (distributed Lloyd:
  broadcast-GEMM assignment, one (cluster, dim) partial-sum shuffle per
  sweep — the vector table is never re-shuffled).
- Within-cluster pairs: ONE shuffle on the cluster id, then a local
  blocked GEMM per cluster inside ``applyInPandas`` — pair candidates
  never leave their executor, and the block loop bounds peak memory to
  ``block_rows × cluster_rows`` similarities regardless of cluster
  size.  Cluster sizes are n/k in expectation; pick ``n_centroids``
  so n/k stays executor-sized (the same knob the paper turns).
- Keep policy: near-pairs feed :func:`~.dedup.connected_components`
  and each component keeps its min id — deterministic and consistent
  with the engine's other dedup operators.  (The paper keeps the item
  with the LOWEST similarity to the centroid; min-id is a documented
  divergence chosen so verdicts are stable across runs and engines
  without carrying centroid distances around.)

Approximation contract: pairs that land in DIFFERENT clusters are never
compared (that is the point — the paper reports the miss rate is small
at reasonable k because near-duplicates co-locate).  Recall vs the
exact operator is pinned in tests at toy scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .dedup import connected_components
from .similarity import ivf_assign, ivf_refine

_PAIR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cos_sim", DoubleType()),
    ]
)


def semantic_pairs(
    emb: DataFrame,
    threshold: float,
    n_centroids: int = 16,
    refine_iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
    max_cluster_rows: int = 2_000_000,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (id_a < id_b, cos_sim) with
    cosine ≥ ``threshold``, compared only inside k-means clusters.

    One clustering pass (distributed Lloyd), one shuffle on the cluster
    id, one Arrow pass per cluster.  ``block_rows`` bounds the local
    GEMM's similarity buffer (block_rows × cluster_rows floats), but a
    cluster's own matrix must fit one executor (cluster_rows × dim);
    ``max_cluster_rows`` turns that limit into a loud error naming the
    remedy (raise ``n_centroids``) instead of an executor OOM.
    """
    import numpy as np
    import pandas as pd

    if refine_iters > 0:
        assigned, _ = ivf_refine(
            emb, n_centroids, refine_iters, seed, id_col, vec_col
        )
    else:
        assigned, _, _ = ivf_assign(emb, n_centroids, seed, id_col, vec_col)

    src = (
        emb.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).alias("v"),
        )
        .join(assigned, "id")  # assigned is (id, cluster)
    )

    thr = float(threshold)
    blk = int(block_rows)
    cap = int(max_cluster_rows)

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > cap:
            raise ValueError(
                f"cluster of {n} rows exceeds max_cluster_rows={cap}; "
                "raise n_centroids so clusters fit an executor"
            )
        if n < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cos_sim": []}
            ).astype({"id_a": "int64", "id_b": "int64", "cos_sim": "float64"})
        ids = pdf["id"].to_numpy()
        # sort by id so i<j in matrix order ⇔ id_a<id_b (determinism)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["v"].iloc[order]]
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        mat = mat / norms[:, None]
        out_a, out_b, out_s = [], [], []
        for lo in range(0, n, blk):
            hi = min(lo + blk, n)
            sims = mat[lo:hi] @ mat.T  # (hi-lo, n)
            for r in range(hi - lo):
                i = lo + r
                row = sims[r, i + 1 :]  # strict upper triangle only
                js = np.nonzero(row >= thr)[0]
                for j in js:
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + j])
                    out_s.append(round(float(row[j]), 6))
        return pd.DataFrame(
            {"id_a": out_a, "id_b": out_b, "cos_sim": out_s}
        ).astype({"id_a": "int64", "id_b": "int64", "cos_sim": "float64"})

    return src.groupBy("cluster").applyInPandas(_pairs, _PAIR_SCHEMA)


def semantic_dedup(
    emb: DataFrame,
    threshold: float,
    n_centroids: int = 16,
    refine_iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
    max_cluster_rows: int = 2_000_000,
) -> DataFrame:
    """Per-id semantic-dedup verdicts: (id, component_id, keep) where
    ``keep`` marks each near-dup component's min id (singletons keep).

    Composition: :func:`semantic_pairs` → min-label connected components
    → keep = (id == component_id).
    """
    pairs = semantic_pairs(
        emb, threshold, n_centroids, refine_iters, seed,
        id_col, vec_col, block_rows, max_cluster_rows,
    )
    # materialize before handing to connected_components: its
    # symmetrizing union would otherwise execute the clustering +
    # per-cluster GEMM pipeline twice (no common-subplan sharing
    # across union branches)
    pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
    ids = emb.select(F.col(id_col).cast("long").alias("id"))
    comp = connected_components(ids, pairs)
    return comp.select(
        "id",
        "component_id",
        (F.col("id") == F.col("component_id")).alias("keep"),
    )

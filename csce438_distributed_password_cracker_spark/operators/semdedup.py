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
  and each component keeps one representative.  ``keep="min_id"``
  (default) keeps the min id — deterministic and consistent with the
  engine's other dedup operators, and in real corpora min-id
  correlates with crawl order (keep-the-first).  ``keep=
  "far_from_centroid"`` is the PAPER-FAITHFUL policy: keep the
  component member with the LOWEST cosine similarity to its cluster
  centroid (Abbas 2023 §3 — retains more semantic diversity), with
  similarities rounded to 6 decimals and ties broken on min id so the
  verdict stays deterministic across runs, partitionings and BLAS
  builds.  The centroid similarity is computed in the same
  broadcast-GEMM style as assignment (one extra map-only Arrow pass —
  no new shuffle).

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

_SIM_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("cent_sim", DoubleType()),
    ]
)


def _clustered_src(
    emb: DataFrame,
    n_centroids: int,
    refine_iters: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, "object"]:
    """(src, cent_mat): the vector table joined with its cluster
    assignment — ``(id, v, cluster)`` — plus the centroid matrix.  The
    one clustering pass shared by pairing and the far-from-centroid
    keep policy."""
    if refine_iters > 0:
        assigned, cent_mat = ivf_refine(
            emb, n_centroids, refine_iters, seed, id_col, vec_col
        )
    else:
        assigned, _, cent_mat = ivf_assign(
            emb, n_centroids, seed, id_col, vec_col
        )
    src = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("v"),
    ).join(assigned, "id")  # assigned is (id, cluster)
    return src, cent_mat


def centroid_similarity(src: DataFrame, cent_mat) -> DataFrame:
    """Per-id cosine similarity to the assigned cluster's centroid:
    one map-only Arrow pass with the centroid matrix broadcast (the
    same shape as assignment — vectorized row-gather + einsum, no
    shuffle).  Rounded to 6 decimals so downstream elections are
    stable across BLAS builds/accumulation orders."""
    import numpy as np

    cmat = np.asarray(cent_mat, dtype=np.float64)
    norms = np.linalg.norm(cmat, axis=1)
    cmat = cmat / np.where(norms == 0.0, 1.0, norms)[:, None]
    bc = src.sparkSession.sparkContext.broadcast(cmat)

    def _sims(batches):
        import pandas as pd

        C = bc.value
        for batch in batches:
            if len(batch) == 0:
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch["v"]]
            )
            vn = np.linalg.norm(mat, axis=1)
            mat = mat / np.where(vn == 0.0, 1.0, vn)[:, None]
            own = C[batch["cluster"].to_numpy()]  # row-gather
            sims = np.einsum("ij,ij->i", mat, own)
            yield pd.DataFrame(
                {
                    "id": batch["id"].to_numpy(),
                    "cent_sim": np.round(sims, 6),
                }
            )

    return src.select("id", "v", "cluster").mapInPandas(_sims, _SIM_SCHEMA)


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
    src, _ = _clustered_src(
        emb, n_centroids, refine_iters, seed, id_col, vec_col
    )
    return _cluster_pairs(src, threshold, block_rows, max_cluster_rows)


def _cluster_pairs(
    src: DataFrame,
    threshold: float,
    block_rows: int,
    max_cluster_rows: int,
) -> DataFrame:
    """The within-cluster pairing pass over an already-clustered
    ``(id, v, cluster)`` frame — shared by :func:`semantic_pairs` and
    :func:`semantic_dedup` so the keep policies never recluster."""
    import numpy as np
    import pandas as pd

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
            # bulk-extract the strict upper triangle's matches: one
            # np.nonzero + mask per block instead of a Python loop per
            # match — dense clusters near the threshold stay vectorized
            r, c = np.nonzero(sims >= thr)
            keep = c > (r + lo)  # strict upper triangle only
            r, c = r[keep], c[keep]
            out_a.append(ids[r + lo])
            out_b.append(ids[c])
            # np.round is half-to-even, same as the scalar round() the
            # per-match loop used — verdicts are unchanged
            out_s.append(np.round(sims[r, c], 6))
        if not out_a:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cos_sim": []}
            ).astype({"id_a": "int64", "id_b": "int64", "cos_sim": "float64"})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a).astype("int64"),
                "id_b": np.concatenate(out_b).astype("int64"),
                "cos_sim": np.concatenate(out_s).astype("float64"),
            }
        )

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
    keep: str = "min_id",
) -> DataFrame:
    """Per-id semantic-dedup verdicts: (id, component_id, keep) — one
    representative kept per near-dup component (singletons keep).

    Composition: :func:`semantic_pairs` → min-label connected components
    → representative election per ``keep`` policy:

    - ``"min_id"`` (default): keep = (id == component_id) — free, the
      component label IS the min id.
    - ``"far_from_centroid"`` (paper-faithful, Abbas 2023): keep the
      member with the LOWEST similarity to its cluster centroid
      (6-decimal rounded; ties → min id).  Costs one extra map-only
      centroid-similarity pass and one per-component min-by shuffle.
    """
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(
            f"keep must be 'min_id' or 'far_from_centroid', got {keep!r}"
        )
    src, cent_mat = _clustered_src(
        emb, n_centroids, refine_iters, seed, id_col, vec_col
    )
    pairs = _cluster_pairs(src, threshold, block_rows, max_cluster_rows)
    # materialize before handing to connected_components: its
    # symmetrizing union would otherwise execute the clustering +
    # per-cluster GEMM pipeline twice (no common-subplan sharing
    # across union branches)
    pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
    ids = emb.select(F.col(id_col).cast("long").alias("id"))
    comp = connected_components(ids, pairs)
    if keep == "min_id":
        return comp.select(
            "id",
            "component_id",
            (F.col("id") == F.col("component_id")).alias("keep"),
        )
    sims = centroid_similarity(src, cent_mat)
    reps = (
        comp.join(sims, "id")
        .groupBy("component_id")
        .agg(
            F.min_by(
                F.col("id"), F.struct(F.col("cent_sim"), F.col("id"))
            ).alias("_rep")
        )
    )
    return comp.join(reps, "component_id").select(
        "id",
        "component_id",
        (F.col("id") == F.col("_rep")).alias("keep"),
    )

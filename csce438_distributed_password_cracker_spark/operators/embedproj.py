"""Distributed PCA for embedding columns — the standard pre-transform
of a vector-heavy training-data pipeline (dimension reduction /
whitening before ANN indexing and semantic dedup; FAISS ships the same
as its PCA/OPQ pretransforms, Johnson et al. 2017; SemDeDup operates on
reduced embeddings, Abbas et al. 2023).

Reference analog: none (north-star §2.12 embedding surface).

Scale shape (the only one that survives 100 TB of vectors):

- **Fit** is ONE corpus pass reduced to a d×d driver matrix: each Arrow
  batch contributes a partial Gram matrix ``Bᵀ·B`` (numpy, BLAS), a
  column sum and a count; partials merge by addition through an
  executor-side ``treeReduce`` (depth 2), so the DRIVER receives
  exactly one (n, sum, Gram) triple — ~8 MB at d = 1024 — regardless
  of partition count (a raw collect would scale with partitions: TB at
  10⁵-10⁶ splits).  The eigendecomposition of the d×d covariance
  happens driver-side (numpy ``eigh`` — microseconds next to the
  scan).
- **Projection** is MAP-ONLY: mean and components ride in the
  pandas_udf task closure; no shuffle, composes with any downstream ANN
  index build or SemDeDup clustering.

Determinism: eigenvectors are sign-normalized (largest-|coordinate|
component made positive) so fitted models are reproducible across runs
and partitionings; eigh on the same float64 covariance is
deterministic.  NULL / wrong-length vectors are rejected loudly at fit
(a silent skip would bias the mean) and project to NULL.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from ..localframe import local_frame

__all__ = [
    "PcaModel",
    "fit_pca",
    "fit_pca_from_moments",
    "pinned_model",
    "project",
    "update_moments",
]


@dataclass(frozen=True)
class PcaModel:
    """mean (d,), components (k, d) — rows are the top-k principal
    axes, descending eigenvalue — explained_variance (k,), and the
    total input variance (for explained-ratio bookkeeping)."""

    mean: np.ndarray
    components: np.ndarray
    explained_variance: np.ndarray
    total_variance: float
    n: int

    @property
    def k(self) -> int:
        return int(self.components.shape[0])

    @property
    def explained_ratio(self) -> float:
        # a constant corpus (all vectors identical) has zero total
        # variance — every axis explains all of nothing; report 0, not nan
        if self.total_variance <= 0.0:
            return 0.0
        return float(self.explained_variance.sum() / self.total_variance)


def _moment_partials(
    df: DataFrame,
    vec_col: str,
    d: int,
    center: np.ndarray | None = None,
    with_gram: bool = True,
) -> DataFrame:
    """Per-partition (n, sum(d), gram(d*d)) rows — the mergeable
    sufficient statistics of PCA, flattened to arrays so one groupless
    aggregation (array element-wise sums would shuffle d² columns;
    instead each partition emits ONE row and the driver merges ≤
    n_partitions rows).

    ``center`` subtracts a fixed vector from every row before
    accumulating (the second pass of the centered fit — the Gram of
    residuals has no DC component to cancel); ``with_gram=False`` skips
    the O(d²) accumulation for the mean-only first pass."""
    out_schema = StructType(
        [
            StructField("n", LongType(), False),
            StructField("s", ArrayType(DoubleType()), False),
            StructField("g", ArrayType(DoubleType()), False),
        ]
    )

    def _sweep(batches):
        n = 0
        s = np.zeros(d, dtype=np.float64)
        g = np.zeros((d, d) if with_gram else 0, dtype=np.float64)
        for pdf in batches:
            for v in pdf["v"]:
                if v is None or len(v) != d:
                    raise ValueError(
                        f"embedding must be non-NULL length-{d}; got "
                        f"{None if v is None else len(v)} — screen rows "
                        "first (a silent skip would bias the mean)"
                    )
            if len(pdf):
                b = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
                )
                if center is not None:
                    b = b - center
                n += b.shape[0]
                s += b.sum(axis=0)
                if with_gram:
                    g += b.T @ b
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
        )

    return df.select(F.col(vec_col).alias("v")).mapInPandas(
        _sweep, out_schema
    )


def _reduced_moments(
    df: DataFrame,
    vec_col: str,
    d: int,
    center: np.ndarray | None = None,
    with_gram: bool = True,
) -> tuple[int, np.ndarray, np.ndarray]:
    """treeReduce the partials to ONE (n, sum, gram) triple (see
    fit_pca's driver-memory note)."""
    return (
        _moment_partials(df, vec_col, d, center=center, with_gram=with_gram)
        .rdd.map(
            lambda r: (
                int(r["n"]),
                np.asarray(r["s"], dtype=np.float64),
                np.asarray(r["g"], dtype=np.float64),
            )
        )
        .treeReduce(
            lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]), depth=2
        )
    )


def fit_pca(
    df: DataFrame, vec_col: str, k: int, center_first: bool = False
) -> PcaModel:
    """Fit a top-``k`` PCA on the ``array<float>`` column: one Arrow
    sweep to d×d sufficient statistics merged through an executor-side
    reduction tree, driver-side ``eigh``.  EAGER — like the other
    build-then-return operators.

    ``center_first=True`` trades a second corpus pass for numerical
    robustness: pass 1 reduces the exact mean (map-only, no Gram), pass
    2 accumulates the Gram of RESIDUALS ``(v − mean)`` — the covariance
    then has no ``n·‖mean‖²`` term to cancel, so a corpus whose DC
    offset dwarfs its spread (the regime the one-pass fit detects and
    warns about) still yields clean eigenvalues.  Default stays
    one-pass: at 100 TB the extra scan is the dominant cost and most
    embedding corpora are either pre-normalized or warn-free."""
    # d from any NON-NULL row (size(NULL) is NULL — an unlucky first
    # row must not turn the screening contract into a TypeError);
    # NULL / wrong-length rows then fail loudly inside the sweep
    first = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if first is None:
        raise ValueError(
            f"cannot fit PCA: column {vec_col!r} has no non-NULL vectors"
        )
    d = int(first["d"])
    if not (1 <= k <= d):
        raise ValueError(f"k must be in [1, {d}], got {k}")
    # treeReduce, NOT .collect(): the driver must hold O(d²), never
    # O(partitions·d²) — at 10⁵-10⁶ input partitions the per-partition
    # 8 MB (n, sum, Gram) rows would be terabytes on the driver, while
    # the 2-level executor-side merge tree lands exactly one.  (The one
    # place per-partition imperative reduction is the right tool — the
    # same treeAggregate shape MLlib's summarizers use.)
    if center_first:
        n1, s1, _ = _reduced_moments(df, vec_col, d, with_gram=False)
        if n1 < 2:
            raise ValueError(f"need >= 2 vectors to fit PCA, got {n1}")
        mu = s1 / n1
        n, s, g = _reduced_moments(df, vec_col, d, center=mu)
        # _eigen_model sees the RESIDUAL moments: its mean is the tiny
        # float leftover of Σ(v−μ)/n (kept — it makes the covariance
        # exactly the unbiased centered one), re-offset by μ here
        m = _eigen_model(n, s, g.reshape(d, d), k)
        return PcaModel(
            mean=mu + m.mean,
            components=m.components,
            explained_variance=m.explained_variance,
            total_variance=m.total_variance,
            n=m.n,
        )
    n, s, g = _reduced_moments(df, vec_col, d)
    return _eigen_model(n, s, g.reshape(d, d), k)


def _eigen_model(n: int, s: np.ndarray, g: np.ndarray, k: int) -> PcaModel:
    """Driver-side tail of the fit, shared by :func:`fit_pca` (sufficient
    statistics from the distributed sweep) and :func:`pinned_model`
    (statistics from a seeded synthetic corpus): raw moments →
    covariance → ``eigh`` → sign-normalized top-k axes.

    Conditioning note: the covariance comes from RAW moments,
    ``(G - n·mean·meanᵀ)/(n-1)`` — one pass, mergeable, but subject to
    catastrophic cancellation when ``n·‖mean‖²`` dwarfs the spread (an
    un-centered corpus with a large DC component): eigenvalues can
    collapse to float noise.  That regime is detected and WARNED about —
    refit with ``fit_pca(..., center_first=True)`` (the two-pass
    centered sweep) rather than consume noise axes.  (A warning, not an
    error: the all-identical corpus legitimately lands here and its
    contract — every eigenvalue clamps to 0, ``explained_ratio`` 0.0 —
    is pinned in tests.)"""
    d = s.shape[0]
    if n < 2:
        raise ValueError(f"need >= 2 vectors to fit PCA, got {n}")
    mean = s / n
    # unbiased covariance from the raw moments: (G - n·mean·meanᵀ)/(n-1)
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    # ill-conditioning guard: trace(cov) survives ~15 significant digits
    # of float64; once the mean offset eats ~12 of them the remaining
    # variance is mostly cancellation noise
    spread = float(np.trace(g) / max(n - 1, 1))
    offset = float(n * mean @ mean) / max(n - 1, 1)
    if offset > 0 and spread - offset < 1e-12 * offset:
        import warnings

        warnings.warn(
            "PCA covariance is at float64 cancellation precision: the "
            f"corpus mean offset (n·‖mean‖²/(n-1) ≈ {offset:.3e}) "
            f"consumes the raw second moment (trace ≈ {spread:.3e}) — "
            "remaining variance is mostly noise; center the vectors "
            "(subtract a pre-computed mean) before fitting",
            RuntimeWarning,
            stacklevel=3,
        )
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comp = evecs[:, order].T.copy()
    # sign normalization: flip each axis so its largest-|coordinate|
    # entry is positive — reproducible across LAPACK builds
    for i in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return PcaModel(
        mean=mean,
        components=comp,
        explained_variance=np.maximum(evals[order], 0.0),
        total_variance=float(np.maximum(evals, 0.0).sum()),
        n=n,
    )


def pinned_model(d: int, k: int, seed: int, n: int = 256) -> PcaModel:
    """A PCA model that is a PURE FUNCTION of ``(d, k, seed, n)`` — the
    hash-checkable stand-in the correctness gate needs (same discipline
    as the LSH hyperplanes: every 'random' choice a deterministic plan
    constant, similarity.py:_hyperplanes).

    A seeded synthetic corpus with a planted decaying spectrum (column
    ``j`` scaled by ``1/sqrt(1+j)`` — well-separated eigenvalues, so the
    axis ORDER and sign normalization are stable) runs through exactly
    the :func:`_eigen_model` math the distributed fit uses; both the
    Spark query and the DuckDB oracle can therefore inline the same
    float64 mean/components (``repr(float)`` round-trips exactly).  The
    FIT over real data stays tests-only (``eigh`` is not
    SQL-expressible); this pins the PROJECTION kernel in the gate."""
    rng = np.random.RandomState(seed)
    b = rng.standard_normal((n, d)) / np.sqrt(1.0 + np.arange(d))
    return _eigen_model(n, b.sum(axis=0), b.T @ b, k)


def project(
    df: DataFrame,
    model: PcaModel,
    vec_col: str,
    out_col: str = "embedding_pca",
    whiten: bool = False,
) -> DataFrame:
    """Append ``out_col`` = the k-dim projection ``(x - mean)·Wᵀ``
    (``array<float>``), map-only — mean/components travel in the
    serialized task closure, re-deserialized per task (NOT a
    ``sparkContext.broadcast``: at (k+1)·d doubles ≈ tens of KB the
    per-task cost is noise; a model scaled to many MB should switch to
    an explicit broadcast).  ``whiten=True``
    scales each axis to unit variance (the isotropic form ANN distance
    metrics prefer).  NULL or wrong-length vectors project to NULL."""
    mean = model.mean.copy()
    w = model.components.copy()
    if whiten:
        # a near-zero-variance axis would whiten to ~1e6× amplified
        # float noise that dominates every downstream distance — refuse
        # rank-deficient whitening instead of silently corrupting it
        floor = 1e-9 * max(model.explained_variance.max(), 1.0)
        if (model.explained_variance < floor).any():
            bad = int(np.argmin(model.explained_variance))
            raise ValueError(
                f"cannot whiten: axis {bad} has ~zero variance "
                f"({model.explained_variance[bad]:.3e}) — the data has "
                f"rank < k={model.k}; reduce k or skip whitening"
            )
        w = w / np.sqrt(model.explained_variance)[:, None]
    d = mean.shape[0]

    @F.pandas_udf(ArrayType(FloatType()))
    def _proj(vs: pd.Series) -> pd.Series:
        # stack the batch's valid rows into ONE (n, d) GEMM — the same
        # BLAS idiom the fit sweep uses; per-row matvecs would pay the
        # interpreter per vector on the operator's hot path
        valid = [
            i
            for i, v in enumerate(vs)
            if v is not None and len(v) == d
        ]
        out: list = [None] * len(vs)
        if valid:
            b = np.asarray(
                [np.asarray(vs.iloc[i], dtype=np.float64) for i in valid]
            )
            y = ((b - mean) @ w.T).astype(np.float32)
            for row, i in zip(y, valid):
                out[i] = row.tolist()
        return pd.Series(out, dtype="object")

    return df.withColumn(out_col, _proj(F.col(vec_col)))


# ── Incremental fit: persisted sufficient statistics ──────────────────────
#
# (n, sum, Gram) are MERGEABLE — addition is the whole merge — so the
# model can track a growing corpus batch-by-batch without ever
# re-scanning history: the same incremental-index discipline as
# search.bm25_update / similarity.lsh_index_update.  The stored table is
# one row of ~d² doubles (8 MB at d=1024); the refit after each fold is
# a driver-side eigh, microseconds next to the batch scan.
#
# Caller contract mirrors bm25_update: batches are NEW vectors
# (dedup-at-ingest upstream); re-folding the same rows would double-
# weight them — the moments have no id memory by design (keeping one
# would make the state corpus-sized).


def update_moments(
    df_batch: DataFrame, vec_col: str, moments_path: str
) -> None:
    """Fold ``df_batch``'s (n, sum, Gram) into the one-row parquet at
    ``moments_path`` (created if absent), through the SAME tmp+rename
    swap as the BM25 index tables (operators/search._swap_in) — which
    also restores a history parked at ``.__old__`` by a crash between
    the two renames, so the created-if-absent bootstrap can never
    silently restart the statistics from one batch.  All filesystem
    metadata steps are scheme-aware (fsutil.py, round 8): the probe,
    recovery and swap work against ``file://`` / ``hdfs://`` paths; on
    object stores the swap warns about its copy-based rename — a
    moments table that lives there belongs in a versioned table."""
    from .. import fsutil
    from .search import _swap_in

    spark = df_batch.sparkSession
    first = (
        df_batch.where(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if first is None:
        return  # empty batch: nothing to fold
    d = int(first["d"])
    n, s, g = _reduced_moments(df_batch, vec_col, d)
    old = fsutil.sibling(moments_path, ".__old__")
    if not fsutil.exists(spark, moments_path) and fsutil.exists(spark, old):
        # crash between _swap_in's renames: history is parked at old
        fsutil.rename(spark, old, moments_path)
    if fsutil.exists(spark, moments_path):
        r = spark.read.parquet(moments_path).first()
        if len(r["s"]) != d:
            raise ValueError(
                f"stored moments are d={len(r['s'])}, batch is d={d}"
            )
        n += int(r["n"])
        s = s + np.asarray(r["s"], dtype=np.float64)
        g = g + np.asarray(r["g"], dtype=np.float64)
    _swap_in(
        local_frame(
            spark,
            [(int(n), s.tolist(), g.ravel().tolist())],
            "n long, s array<double>, g array<double>",
        ),
        moments_path,
    )


def fit_pca_from_moments(
    spark, moments_path: str, k: int
) -> PcaModel:
    """Refit the top-``k`` model from the persisted statistics — no
    corpus scan.  Same eigen tail (and the same raw-moment conditioning
    note and ``k`` contract) as :func:`fit_pca`."""
    r = spark.read.parquet(moments_path).first()
    d = len(r["s"])
    if not (1 <= k <= d):
        raise ValueError(f"k must be in [1, {d}], got {k}")
    return _eigen_model(
        int(r["n"]),
        np.asarray(r["s"], dtype=np.float64),
        np.asarray(r["g"], dtype=np.float64).reshape(d, d),
        k,
    )

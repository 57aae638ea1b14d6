"""Distributed PCA over embedding columns (operators/embedproj.py):
equivalence with single-machine numpy PCA, partition invariance,
projection/whitening semantics, and guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import embedproj


def _emb(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/embeddings.parquet")


def _np_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comp = evecs[:, order].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return mean, comp, evals[order]


def test_fit_matches_numpy_and_is_partition_invariant(spark, sf_smoke):
    emb = _emb(spark, sf_smoke)
    x = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    k = 8
    m = embedproj.fit_pca(emb, "embedding", k)
    mean, comp, evals = _np_pca(x, k)
    assert m.n == x.shape[0]
    np.testing.assert_allclose(m.mean, mean, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(m.explained_variance, evals, rtol=1e-8)
    np.testing.assert_allclose(m.components, comp, rtol=1e-6, atol=1e-9)
    assert 0 < m.explained_ratio <= 1
    # same model from a different partitioning (mergeable partials)
    m2 = embedproj.fit_pca(emb.repartition(13), "embedding", k)
    np.testing.assert_allclose(m2.components, m.components, atol=1e-9)
    np.testing.assert_allclose(m2.mean, m.mean, atol=1e-12)


def test_projection_variances_and_whitening(spark, sf_smoke):
    emb = _emb(spark, sf_smoke)
    k = 6
    m = embedproj.fit_pca(emb, "embedding", k)
    proj = embedproj.project(emb, m, "embedding")
    y = np.asarray(
        [r["embedding_pca"] for r in proj.select("embedding_pca").collect()],
        dtype=np.float64,
    )
    assert y.shape[1] == k
    var = y.var(axis=0, ddof=1)
    # axis variances equal the eigenvalues, in descending order
    np.testing.assert_allclose(var, m.explained_variance, rtol=1e-4)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(k - 1))
    # whitened axes are unit-variance
    w = embedproj.project(emb, m, "embedding", whiten=True)
    yw = np.asarray(
        [r["embedding_pca"] for r in w.select("embedding_pca").collect()],
        dtype=np.float64,
    )
    np.testing.assert_allclose(
        yw.var(axis=0, ddof=1), np.ones(k), rtol=1e-3
    )


def test_projection_is_map_only_and_reconstruction_improves(
    spark, sf_smoke
):
    emb = _emb(spark, sf_smoke)
    proj = embedproj.project(
        emb, embedproj.fit_pca(emb, "embedding", 4), "embedding"
    )
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # broadcast-closure projection

    x = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )

    def recon_err(k):
        m = embedproj.fit_pca(emb, "embedding", k)
        c = x - m.mean
        return float(((c - (c @ m.components.T) @ m.components) ** 2).sum())

    e4, e16, e64 = recon_err(4), recon_err(16), recon_err(64)
    assert e4 > e16 > e64
    assert e64 < 1e-12  # k = d reconstructs exactly


def test_null_and_bad_rows(spark, sf_smoke):
    emb = _emb(spark, sf_smoke)
    m = embedproj.fit_pca(emb, "embedding", 3)
    extra = spark.createDataFrame(
        [(9_001, None), (9_002, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["embedding_pca"]
        for r in embedproj.project(
            emb.select("vec_id", "embedding").unionByName(extra), m,
            "embedding",
        ).collect()
    }
    assert out[9_001] is None and out[9_002] is None
    assert sum(v is not None for v in out.values()) == len(out) - 2
    # fit REJECTS bad rows loudly instead of biasing the mean
    with pytest.raises(Exception, match="length"):
        embedproj.fit_pca(
            emb.select("vec_id", "embedding").unionByName(extra),
            "embedding",
            3,
        )
    with pytest.raises(ValueError, match="k must be"):
        embedproj.fit_pca(emb, "embedding", 0)


def test_composes_with_semdedup_near_dup_recall(spark, sf_smoke):
    """The pipeline composition PCA exists for: project embeddings to
    k=16 (75% dimension cut), then run SemDeDup pair-finding on the
    REDUCED vectors — true near-duplicates (cos ~ 0.995 in the original
    space) still co-locate and surface with high recall, because PCA
    preserves the dominant directions that make them near."""
    from csce438_distributed_password_cracker_spark.operators import (
        semdedup,
    )
    from csce438_distributed_password_cracker_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    emb = _emb(spark, sf_smoke).select("vec_id", "embedding")
    # plant a near-dup of every base vector (the semdedup suite's recipe)
    rows = emb.collect()
    out = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        out.append((int(r["vec_id"]), [float(x) for x in v]))
        p = v + 0.1 * np.roll(v, 1)
        p = p / np.linalg.norm(p)
        out.append((int(r["vec_id"]) + 10_000, [float(x) for x in p]))
    planted = spark.createDataFrame(
        out, "vec_id long, embedding array<double>"
    )

    truth = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_blocked(planted, 0.9).collect()
    }
    assert len(truth) >= 400

    m = embedproj.fit_pca(planted, "embedding", 16)
    reduced = embedproj.project(planted, m, "embedding").select(
        "vec_id", F.col("embedding_pca").alias("embedding")
    )
    # near-dup pairs in the reduced space (cosine there is computed on
    # 16-dim centered projections — threshold relaxed accordingly)
    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup.semantic_pairs(
            reduced, 0.9, n_centroids=8
        ).collect()
    }
    found = len(got & truth) / len(truth)
    assert found >= 0.85, f"recall {found:.3f} after 64->16 PCA"


def test_rank_deficient_whiten_refused_and_constant_corpus_ratio(
    spark, sf_smoke
):
    """whiten must REFUSE rank-deficient axes (amplified float noise
    would dominate every downstream distance) instead of flooring them;
    a constant corpus reports explained_ratio 0.0, never nan."""
    # rank-1 data in 3 dims: axis 2+ variance is float noise
    rows = [(i, [float(i), 2.0 * i, -1.0 * i]) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    m = embedproj.fit_pca(df, "v", 3)
    with pytest.raises(ValueError, match="rank"):
        embedproj.project(df, m, "v", whiten=True)
    # k=1 captures the only real axis — whitening that is fine
    m1 = embedproj.fit_pca(df, "v", 1)
    y = embedproj.project(df, m1, "v", whiten=True)
    assert y.where("embedding_pca IS NOT NULL").count() == 50

    const = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(5)], "id long, v array<double>"
    )
    mc = embedproj.fit_pca(const, "v", 1)
    assert mc.explained_ratio == 0.0  # 0/0 reported as 0, not nan


def test_fit_rejects_null_first_row_loudly(spark):
    """d inference must skip NULL rows (size(NULL) is NULL) and the
    sweep must still reject NULLs with the screening message."""
    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0]), (3, [3.0, 4.0])],
        "id long, v array<double>",
    ).coalesce(1)  # NULL row first in scan order
    with pytest.raises(Exception, match="screen rows"):
        embedproj.fit_pca(df, "v", 1)
    # all-NULL column: the clear no-vectors error, not a TypeError
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "id long, v array<double>"
    )
    with pytest.raises(ValueError, match="no non-NULL"):
        embedproj.fit_pca(nulls, "v", 1)


def test_pinned_model_is_deterministic_and_real_pca():
    """The gate model (round 7) is a pure function of (d, k, seed):
    identical across calls, unit-norm mutually-orthogonal axes with
    descending well-separated eigenvalues (the planted 1/(1+j) spectrum
    keeps axis order and sign normalization stable)."""
    a = embedproj.pinned_model(64, 4, seed=7)
    b = embedproj.pinned_model(64, 4, seed=7)
    assert np.array_equal(a.mean, b.mean)
    assert np.array_equal(a.components, b.components)
    assert a.k == 4 and a.mean.shape == (64,)
    gram = a.components @ a.components.T
    assert np.allclose(gram, np.eye(4), atol=1e-10)
    ev = a.explained_variance
    assert (ev[:-1] > ev[1:]).all() and (ev > 0).all()
    # a different seed is a different model
    c = embedproj.pinned_model(64, 4, seed=8)
    assert not np.array_equal(a.components, c.components)


def test_ill_conditioned_fit_warns(spark):
    """A corpus whose mean offset consumes the raw second moment to
    float64 precision gets a loud cancellation warning (ADVICE r6) —
    the one-pass raw-moment covariance is noise there; fitting still
    returns (the all-identical corpus contract depends on it)."""
    base = np.array([1e9, -1e9, 5e8])
    rows = [(i, (base + 1e-4 * np.array([i % 3, (i + 1) % 3, 1])).tolist())
            for i in range(30)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    with pytest.warns(RuntimeWarning, match="cancellation"):
        embedproj.fit_pca(df, "v", 2)
    # a healthy corpus does NOT warn
    import warnings

    healthy = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), float(i % 2)])
         for i in range(30)],
        "id long, v array<double>",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        embedproj.fit_pca(healthy, "v", 2)


def test_center_first_survives_huge_dc_offset(spark):
    """The two-pass centered fit recovers clean eigenvalues in exactly
    the regime the one-pass fit warns about (offset ~1e9 x spread)."""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((200, 8))
    data = base * 1e-3 + 1e6
    df = spark.createDataFrame(
        [(r.tolist(),) for r in data], "v array<double>"
    ).repartition(5)
    with pytest.warns(RuntimeWarning, match="cancellation"):
        embedproj.fit_pca(df, "v", 3)
    m = embedproj.fit_pca(df, "v", 3, center_first=True)
    c = data - data.mean(axis=0)
    ref = np.linalg.eigvalsh(c.T @ c / (len(data) - 1))[::-1][:3]
    assert np.allclose(m.explained_variance, ref, rtol=1e-6)
    assert np.allclose(m.mean, data.mean(axis=0), rtol=0, atol=1e-5)
    # and the projection built on it is usable (finite, right shape)
    out = embedproj.project(df, m, "v").select("embedding_pca").collect()
    assert all(
        len(r["embedding_pca"]) == 3
        and all(np.isfinite(r["embedding_pca"]))
        for r in out
    )


def test_center_first_equals_one_pass_on_benign_data(spark):
    rng = np.random.RandomState(11)
    data = rng.standard_normal((150, 6)) * [1, 2, 3, 1, 2, 3]
    df = spark.createDataFrame(
        [(r.tolist(),) for r in data], "v array<double>"
    ).repartition(4)
    a = embedproj.fit_pca(df, "v", 4)
    b = embedproj.fit_pca(df, "v", 4, center_first=True)
    assert np.allclose(a.mean, b.mean, atol=1e-12)
    assert np.allclose(a.explained_variance, b.explained_variance,
                       rtol=1e-9)
    assert np.allclose(a.components, b.components, atol=1e-8)


def test_incremental_moments_match_one_shot_fit(spark, tmp_path):
    """Folding batches into the persisted moments table must refit to
    the same model as one fit over the union (float-addition-order ulps
    only), with no history re-scan."""
    rng = np.random.RandomState(21)
    a = rng.standard_normal((80, 5)) * [1, 2, 3, 1, 2]
    b = rng.standard_normal((60, 5)) * [1, 2, 3, 1, 2] + 0.5
    mk = lambda arr: spark.createDataFrame(
        [(r.tolist(),) for r in arr], "v array<double>"
    ).repartition(3)
    path = str(tmp_path / "moments")
    embedproj.update_moments(mk(a), "v", path)
    embedproj.update_moments(mk(b), "v", path)
    inc = embedproj.fit_pca_from_moments(spark, path, 3)
    full = embedproj.fit_pca(mk(np.vstack([a, b])), "v", 3)
    assert inc.n == full.n == 140
    assert np.allclose(inc.mean, full.mean, atol=1e-12)
    assert np.allclose(
        inc.explained_variance, full.explained_variance, rtol=1e-9
    )
    assert np.allclose(inc.components, full.components, atol=1e-8)
    # empty batch is a no-op
    empty = spark.createDataFrame([], "v array<double>")
    embedproj.update_moments(empty, "v", path)
    again = embedproj.fit_pca_from_moments(spark, path, 3)
    assert again.n == 140
    # dimension mismatch refused loudly
    with pytest.raises(ValueError, match="d="):
        embedproj.update_moments(
            spark.createDataFrame([([1.0, 2.0],)], "v array<double>"),
            "v",
            path,
        )


def test_update_moments_recovers_history_parked_by_a_crash(
    spark, tmp_path
):
    """A crash between the swap's two renames leaves the history at
    .__old__ with the table absent; the next fold must restore it, not
    silently restart the statistics from one batch."""
    import pathlib

    rng = np.random.RandomState(5)
    a, b = rng.standard_normal((40, 4)), rng.standard_normal((30, 4))
    mk = lambda arr: spark.createDataFrame(
        [(r.tolist(),) for r in arr], "v array<double>"
    )
    path = str(tmp_path / "m")
    embedproj.update_moments(mk(a), "v", path)
    # simulate the crash window: history parked at old, table gone
    p = pathlib.Path(path)
    p.rename(p.with_name(p.name + ".__old__"))
    embedproj.update_moments(mk(b), "v", path)
    m = embedproj.fit_pca_from_moments(spark, path, 2)
    assert m.n == 70  # both batches present, nothing lost
    full = embedproj.fit_pca(mk(np.vstack([a, b])), "v", 2)
    assert np.allclose(m.components, full.components, atol=1e-8)
    # k contract matches fit_pca's
    with pytest.raises(ValueError, match="k must be"):
        embedproj.fit_pca_from_moments(spark, path, 9)

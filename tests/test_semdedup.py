"""SemDeDup-style semantic dedup (operators/semdedup.py): pair
correctness within clusters, recall vs the exact operator, keep-policy
determinism, and the one-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import semdedup
from csce438_distributed_password_cracker_spark.operators.similarity import (
    cosine_pairs_blocked,
)

THRESHOLD = 0.4  # the driver embeddings are near-random (max cos ~0.5)


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/embeddings.parquet")


def _pairset(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


@pytest.fixture(scope="module")
def planted(spark, emb):
    """The base vectors plus a perturbed near-duplicate of each (id+10_000):
    v' = normalize(v + 0.1·roll(v, 1)) — cos(v, v') ≈ 0.995, deterministic.
    These ARE the near-dups SemDeDup's co-location premise is about."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    out = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        out.append((int(r["vec_id"]), [float(x) for x in v]))
        p = v + 0.1 * np.roll(v, 1)
        p = p / np.linalg.norm(p)
        out.append((int(r["vec_id"]) + 10_000, [float(x) for x in p]))
    return spark.createDataFrame(out, "vec_id long, embedding array<double>")


def test_pairs_are_exact_within_clusters(spark, emb):
    """Every emitted pair really is ≥ threshold (precision 1.0), ids are
    ordered, and similarities match the exact operator's values."""
    pairs = semdedup.semantic_pairs(emb, THRESHOLD, n_centroids=8)
    rows = pairs.collect()
    assert len(rows) > 0
    assert all(r["id_a"] < r["id_b"] for r in rows)
    exact = cosine_pairs_blocked(emb, THRESHOLD)
    exact_sims = {
        (r["id_a"], r["id_b"]): r["cos_sim"] for r in exact.collect()
    }
    for r in rows:
        key = (r["id_a"], r["id_b"])
        assert key in exact_sims
        assert r["cos_sim"] == pytest.approx(exact_sims[key], abs=1e-5)


def test_recall_on_true_near_dups(spark, planted):
    """The paper's premise: TRUE near-duplicates (cos ≈ 0.995) land in the
    same cluster almost always, so within-cluster comparison finds nearly
    all of them.  (Moderately-similar pairs at cos 0.4 — random vectors —
    do NOT co-locate; that miss is by design, not a defect.)"""
    exact = _pairset(cosine_pairs_blocked(planted, 0.9))
    assert len(exact) >= 400  # one planted pair per base vector
    got = _pairset(semdedup.semantic_pairs(planted, 0.9, n_centroids=8))
    assert got <= exact  # precision 1.0 by construction
    recall = len(got) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(exact)} pairs"


def test_single_cluster_equals_exact(spark, emb):
    """k=1 degenerates to the exact all-pairs operator — the composition
    sanity anchor."""
    exact = _pairset(cosine_pairs_blocked(emb, THRESHOLD))
    got = _pairset(
        semdedup.semantic_pairs(
            emb, THRESHOLD, n_centroids=1, refine_iters=0
        )
    )
    assert got == exact


def test_block_size_invariance(spark, emb):
    """The local GEMM block loop is a memory bound, not a semantics knob."""
    a = _pairset(
        semdedup.semantic_pairs(emb, THRESHOLD, n_centroids=8, block_rows=7)
    )
    b = _pairset(
        semdedup.semantic_pairs(
            emb, THRESHOLD, n_centroids=8, block_rows=4096
        )
    )
    assert a == b


def test_dedup_verdicts(spark, emb):
    out = semdedup.semantic_dedup(emb, THRESHOLD, n_centroids=8)
    assert out.count() == emb.count()
    rows = out.collect()
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    for comp, members in by_comp.items():
        kept = [m for m in members if m["keep"]]
        assert len(kept) == 1
        assert kept[0]["id"] == min(m["id"] for m in members) == comp


def test_deterministic_across_repartition(spark, emb):
    a = semdedup.semantic_dedup(emb, THRESHOLD, n_centroids=8)
    b = semdedup.semantic_dedup(
        emb.repartition(11), THRESHOLD, n_centroids=8
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_pair_stage_single_shuffle(spark, emb):
    """After clustering, candidate generation is exactly one exchange on
    the cluster id feeding the Arrow pass — vectors never shuffle twice."""
    pairs = semdedup.semantic_pairs(
        emb, THRESHOLD, n_centroids=8, refine_iters=0
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    # one exchange for the groupBy(cluster); the assignment join is
    # mapInPandas output joined on id — allow its exchanges but ensure
    # the group stage itself hashes on cluster
    assert "hashpartitioning(cluster" in plan


def test_keep_far_from_centroid_consistent(spark, emb):
    """The paper-faithful policy keeps, in every component, exactly the
    member with the lowest (cent_sim, id) — verified against an
    independent recomputation of the centroid similarities."""
    out = semdedup.semantic_dedup(
        emb, THRESHOLD, n_centroids=8, keep="far_from_centroid"
    ).collect()
    src, cent = semdedup._clustered_src(
        emb, 8, 2, 42, "vec_id", "embedding"
    )
    sims = {
        r["id"]: r["cent_sim"]
        for r in semdedup.centroid_similarity(src, cent).collect()
    }
    by_comp: dict[int, list] = {}
    for r in out:
        by_comp.setdefault(r["component_id"], []).append(r)
    assert len(out) == len(sims)
    for comp, members in by_comp.items():
        kept = [m for m in members if m["keep"]]
        assert len(kept) == 1
        expect = min(members, key=lambda m: (sims[m["id"]], m["id"]))
        assert kept[0]["id"] == expect["id"]


def test_keep_policies_differ_on_planted_cluster(spark):
    """A component whose min-id member sits CLOSEST to the centroid
    separates the two policies: min_id keeps it, far_from_centroid
    keeps the outlying member (diversity retention)."""
    import numpy as np

    dim = 64
    axis = np.zeros(dim)
    axis[0] = 1.0  # e0
    rows = []
    rows.append((1, [float(x) for x in axis]))  # exactly on-axis
    v2 = axis + 0.2 * np.eye(dim)[1]
    rows.append((2, [float(x) for x in v2 / np.linalg.norm(v2)]))
    # filler mass pulls the centroid onto e0 without pairing: each
    # filler perturbs along its OWN axis (cos≈0.89 to id 1, ≈0.80 to
    # every other filler — all below the 0.95 pairing threshold)
    for i in range(10, 30):
        f = axis + 0.5 * np.eye(dim)[2 + (i - 10)]
        rows.append((i, [float(x) for x in f / np.linalg.norm(f)]))
    # a far-away, mutually-dissimilar blob for the second centroid
    for i in range(100, 110):
        g = np.eye(dim)[40] + 0.5 * np.eye(dim)[41 + (i - 100)]
        rows.append((i, [float(x) for x in g / np.linalg.norm(g)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(n_centroids=2, refine_iters=2)
    min_id = {
        r["id"]: r["keep"]
        for r in semdedup.semantic_dedup(df, 0.95, **kw).collect()
    }
    far = {
        r["id"]: r["keep"]
        for r in semdedup.semantic_dedup(
            df, 0.95, keep="far_from_centroid", **kw
        ).collect()
    }
    # ids 1 and 2 form the only multi-member component (cos≈0.98)
    assert min_id[1] and not min_id[2]
    assert far[2] and not far[1]
    # singletons keep under both policies
    for i in list(range(10, 30)) + list(range(100, 110)):
        assert min_id[i] and far[i]


def test_keep_policy_rejects_unknown(spark, emb):
    with pytest.raises(ValueError):
        semdedup.semantic_dedup(emb, THRESHOLD, keep="nope")


def test_cluster_cap_guard(spark, emb):
    with pytest.raises(Exception) as ei:
        semdedup.semantic_pairs(
            emb, THRESHOLD, n_centroids=1, refine_iters=0,
            max_cluster_rows=100,
        ).collect()
    assert "max_cluster_rows" in str(ei.value)

"""RRF fusion: hand-computed reciprocal ranks, one-list-only docs, and
an end-to-end hybrid probe over real BM25 + brute-force-cosine lists."""

from __future__ import annotations

from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.catalog import load_table
from csce438_distributed_password_cracker_spark.operators import hybrid, search
from csce438_distributed_password_cracker_spark.operators.hybrid import RRF_K
from csce438_distributed_password_cracker_spark.operators.similarity import (
    brute_force_topk,
)


def test_rrf_matches_hand_computation(spark):
    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "id long, score double"
    )
    vec = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "id long, score double"
    )
    rows = {r.id: r for r in hybrid.rrf_fuse(lex, vec).collect()}
    # hand ranks: lex 1->1, 2->2, 3->3; vec 2->1, 4->2
    assert abs(rows[2].rrf_score - (1 / (RRF_K + 2) + 1 / (RRF_K + 1))) < 1e-8
    assert abs(rows[1].rrf_score - 1 / (RRF_K + 1)) < 1e-8
    assert abs(rows[4].rrf_score - 1 / (RRF_K + 2)) < 1e-8
    assert abs(rows[3].rrf_score - 1 / (RRF_K + 3)) < 1e-8
    # doc 2 appears in both lists -> must rank first
    top = hybrid.rrf_fuse(lex, vec).first()
    assert top.id == 2 and top.in_lexical and top.in_vector
    assert not rows[4].in_lexical and rows[4].in_vector


def test_hybrid_end_to_end(spark, sf_smoke, tmp_path):
    """BM25 list + cosine-KNN list over the driver tables, fused: the
    result is a valid ranking whose both-list docs beat one-list docs
    with comparable ranks."""
    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    idx = str(tmp_path / "bm25")
    search.bm25_build(docs, "doc_id", "text", idx, n_buckets=16)
    lexical = search.bm25_search(spark, idx, "the data and", top_n=10)

    query = emb.limit(1).select(F.col("embedding").alias("qvec"))
    vector = brute_force_topk(emb, query, k=10).select(
        F.col("vec_id").alias("id"), F.col("cos_sim").alias("score")
    )
    fused = hybrid.rrf_fuse(
        lexical.withColumnRenamed("id", "id"), vector, top_n=10
    ).collect()
    assert len(fused) == 10
    scores = [r.rrf_score for r in fused]
    assert scores == sorted(scores, reverse=True)
    assert all(r.in_lexical or r.in_vector for r in fused)


def _mmr_brute(rows, k, lam):
    """Reference greedy MMR over (id, rel, unit-vec) tuples."""
    import numpy as np

    rows = sorted(rows, key=lambda r: (-r[1], r[0]))
    ids = [r[0] for r in rows]
    rel = np.asarray([r[1] for r in rows])
    mat = np.asarray([r[2] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    mat = mat / np.where(norms == 0.0, 1.0, norms)[:, None]
    picked, out = [], []
    for rank in range(1, min(k, len(rows)) + 1):
        best, best_score = None, None
        for i in range(len(rows)):
            if i in picked:
                continue
            pen = max(
                (float(mat[i] @ mat[j]) for j in picked), default=None
            )
            s = lam * rel[i] - (1 - lam) * max(pen, 0.0) if pen is not None \
                else lam * rel[i]
            if best is None or s > best_score:
                best, best_score = i, s
        picked.append(best)
        out.append((ids[best], rank))
    return out


def test_mmr_matches_brute_force_and_diversifies(spark):
    import numpy as np

    from csce438_distributed_password_cracker_spark.operators.hybrid import (
        mmr_rerank,
    )

    rng = np.random.RandomState(3)
    # two tight clusters + scattered: pure relevance would pick one
    # cluster's members back-to-back; MMR must interleave
    c1, c2 = rng.standard_normal(6), rng.standard_normal(6)
    rows = []
    for i in range(5):
        rows.append((i, 1.0 - i * 0.001, (c1 + rng.standard_normal(6) * 0.01).tolist()))
    for i in range(5, 10):
        rows.append((i, 0.9 - i * 0.001, (c2 + rng.standard_normal(6) * 0.01).tolist()))
    df = spark.createDataFrame(rows, "id long, score double, vec array<double>")
    got = [
        (r.id, r.mmr_rank)
        for r in mmr_rerank(df, k=4, lam=0.5)
        .orderBy("mmr_rank")
        .collect()
    ]
    want = _mmr_brute(rows, 4, 0.5)
    assert got == want
    # diversity: rank 2 comes from the OTHER cluster, not doc 1's twin
    assert got[0][0] == 0 and got[1][0] >= 5
    # lam=1 degenerates to pure relevance order
    pure = [
        r.id
        for r in mmr_rerank(df, k=3, lam=1.0).orderBy("mmr_rank").collect()
    ]
    assert pure == [0, 1, 2]


def test_mmr_guards_and_edges(spark):
    import pytest

    from csce438_distributed_password_cracker_spark.operators import hybrid

    empty = spark.createDataFrame(
        [], "id long, score double, vec array<double>"
    )
    assert hybrid.mmr_rerank(empty, k=5).count() == 0
    with pytest.raises(ValueError, match="lam"):
        hybrid.mmr_rerank(empty, k=5, lam=1.5)
    # k > list size returns the whole list ranked
    small = spark.createDataFrame(
        [(1, 1.0, [1.0, 0.0]), (2, 0.5, [0.0, 1.0])],
        "id long, score double, vec array<double>",
    )
    got = hybrid.mmr_rerank(small, k=10, lam=0.7).orderBy("mmr_rank").collect()
    assert [r.id for r in got] == [1, 2]
    # oversized shortlist refused
    big = spark.range(hybrid.MMR_MAX_SHORTLIST + 1).selectExpr(
        "id", "1.0 as score", "array(1.0, 0.0) as vec"
    )
    with pytest.raises(ValueError, match="shortlist"):
        hybrid.mmr_rerank(big, k=3)


def test_mmr_randomized_cases_match_brute_force(spark):
    import numpy as np

    from csce438_distributed_password_cracker_spark.operators.hybrid import (
        mmr_rerank,
    )

    for seed, lam in [(1, 0.3), (2, 0.7), (5, 0.5)]:
        rng = np.random.RandomState(seed)
        rows = [
            (i, float(rng.rand()), rng.standard_normal(4).tolist())
            for i in range(30)
        ]
        df = spark.createDataFrame(
            rows, "id long, score double, vec array<double>"
        ).repartition(3)
        got = [
            (r.id, r.mmr_rank)
            for r in mmr_rerank(df, k=8, lam=lam)
            .orderBy("mmr_rank")
            .collect()
        ]
        assert got == _mmr_brute(rows, 8, lam), (seed, lam)


def test_mmr_preserves_caller_id_type(spark):
    from csce438_distributed_password_cracker_spark.operators.hybrid import (
        mmr_rerank,
    )

    df = spark.createDataFrame(
        [("doc-b", 0.9, [1.0, 0.0]), ("doc-a", 0.8, [0.0, 1.0])],
        "id string, score double, vec array<double>",
    )
    out = mmr_rerank(df, k=2, lam=0.6)
    assert dict(out.dtypes)["id"] == "string"
    assert [r.id for r in out.orderBy("mmr_rank").collect()] == [
        "doc-b",
        "doc-a",
    ]


def test_mmr_rejects_null_and_nan_relevance(spark):
    """r8 (ADVICE): a NULL relevance used to raise an opaque TypeError
    on the sort key and a NaN silently corrupted the greedy order —
    both must be a clear ValueError naming the score column."""
    import pytest

    from csce438_distributed_password_cracker_spark.operators.hybrid import (
        mmr_rerank,
    )

    withnull = spark.createDataFrame(
        [(1, 0.9, [1.0, 0.0]), (2, None, [0.0, 1.0])],
        "id long, score double, vec array<double>",
    )
    with pytest.raises(ValueError, match="NULL/NaN 'score'"):
        mmr_rerank(withnull, k=2)
    withnan = spark.createDataFrame(
        [(1, 0.9, [1.0, 0.0]), (2, float("nan"), [0.0, 1.0])],
        "id long, score double, vec array<double>",
    )
    with pytest.raises(ValueError, match="NULL/NaN 'score'"):
        mmr_rerank(withnan, k=2)

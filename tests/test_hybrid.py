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

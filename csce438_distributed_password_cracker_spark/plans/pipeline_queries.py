"""North-star training-data-pipeline queries (SURVEY.md §2.12) over the
driver ``documents`` / ``embeddings`` tables — the operators a 100 TB
LLM-data pipeline runs: dedup, text analysis, multimodal/binary columns,
similarity search.

Deeper variants (MinHash-LSH, SimHash, ANN with bucketing) live in
``operators/`` — those that SQL can't express are declared without an
oracle (driver records rows-only) and are brute-force-checked in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import vectors
from .registry import register
from .relational import _sql_query

_sql_query(
    "q_dedup_exact",
    """
    SELECT md5(text) AS fingerprint,
           min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="E1: exact dedup — hash-groupBy on content fingerprint, keep the "
    "min doc_id.  At 100 TB this is one shuffle on a 128-bit key; "
    "map-side partial grouping collapses most duplicates before exchange.",
    tables=("documents",),
)

_sql_query(
    "q_text_tokens",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_distinct_tokens
    FROM documents
    """,
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens
    FROM documents
    """,
    doc="E3: whitespace token counting — split/array ops fully JVM-side.",
    tables=("documents",),
)

_sql_query(
    "q_text_quality",
    """
    SELECT doc_id,
           lang,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(size(filter(split(text, ' '),
                 x -> x = 'the' OR x = 'a' OR x = 'data' OR x = 'row')) AS DOUBLE)
               / CAST(size(split(text, ' ')) AS DOUBLE), 6) AS stopword_ratio,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / CAST(size(split(text, ' ')) AS DOUBLE), 6) AS avg_token_len
    FROM documents
    """,
    oracle="""
    SELECT doc_id,
           lang,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(len(list_filter(string_split(text, ' '),
                 x -> x = 'the' OR x = 'a' OR x = 'data' OR x = 'row')) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stopword_ratio,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS avg_token_len
    FROM documents
    """,
    doc="E3/quality scoring: stopword ratio + mean token length — the "
    "filter-lambda runs as a codegen'd higher-order function, no UDF.",
    tables=("documents",),
)

_sql_query(
    "q_binary_roundtrip",
    """
    SELECT doc_id,
           CAST(length(CAST(text AS BINARY)) AS BIGINT) AS n_bytes,
           CAST(CAST(text AS BINARY) AS STRING) = text AS roundtrip_ok
    FROM documents
    """,
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           decode(encode(text)) = text AS roundtrip_ok
    FROM documents
    """,
    doc="E4: opaque binary columns — string⇄binary round trip; the "
    "multimodal decode path (operators/multimodal.py) rides the same "
    "BinaryType plumbing.",
    tables=("documents",),
)


@register(
    "q_similarity_knn",
    oracle="""
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
    doc="E2 baseline: brute-force cosine top-k against a query vector — "
    "broadcast the 1-row query, zip_with/aggregate dot product in codegen, "
    "TakeOrderedAndProject for the top-k (no full sort).  The LSH-bucketed "
    "scale path is operators/similarity.py.",
)
def q_similarity_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            F.round(vectors.cosine("embedding", "qvec"), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )

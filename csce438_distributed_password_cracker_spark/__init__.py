"""PySpark-native analytics engine with the query surface of the reference
distributed password cracker (yinyinbigdata/csce438_distributed_password_cracker).

The reference is a coordinator/worker brute-force search system over a
generated base-26 keyspace (see SURVEY.md).  This package re-expresses its
entire query surface — generated range sources, range partitioning, scalar
hash filters, early-terminating search, existential aggregation, message
streams — as idiomatic PySpark DataFrame/SQL plans on Catalyst, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) that a 100 TB deployment needs.

Layout:
    session     SparkSession factory tuned for local[N] testing but configured
                for cluster-scale defaults (AQE, shuffle sizing).
    catalog     Parquet table loaders for the driver test tables.
    functions/  Column-expression libraries (base-26 codec, hashing, text,
                vectors) — JVM-side expressions first, pandas_udf only where
                builtins cannot express the semantics.
    sources/    Generated keyspace source, parquet readers, streaming sources.
    operators/  Composable df->df operators (crack search, dedup, similarity,
                text analysis, multimodal).
    plans/      The declared query corpus (SURVEY.md §2) with DuckDB oracle
                SQL for correctness checking.
    streaming/  Structured Streaming surface (request stream, session
                liveness, tumbling windows).
"""

__version__ = "0.1.0"

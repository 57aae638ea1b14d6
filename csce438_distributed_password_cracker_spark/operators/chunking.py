"""Document chunking — split long documents into overlapping
token-window chunks, the step :mod:`operators.packing` requires before
packing (oversized docs raise there by contract) and the unit every
embedding/retrieval pipeline indexes.

Reference analog: none (north-star extension, BASELINE.json).

Scale shape: pure MAP-ONLY column algebra — tokenize once, build the
chunk-start index list with ``sequence`` (stride = chunk - overlap),
``posexplode`` it, and slice the token array per chunk.  No shuffle, no
UDF, no driver involvement; one input row fans out to ceil((n-overlap)
/ stride) output rows inside the same task.  (A Python UDTF could emit
the same rows, but it would leave whole-stage codegen for a per-row
Python hop — the column form is the Spark-first spelling.)

Guarantees (pinned in tests/test_chunking.py):
- every chunk has ≤ ``chunk_tokens`` tokens; all but the last have
  exactly ``chunk_tokens``;
- consecutive chunks overlap by exactly ``overlap`` tokens (the
  standard context-preservation discipline);
- concatenating the chunks' non-overlapped spans reproduces the
  document's token stream exactly (no loss, no duplication);
- short docs (≤ chunk_tokens) pass through as one chunk unchanged;
- composition with packing: chunked output never trips packing's
  oversized-doc guard when budget ≥ chunk_tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, chunk_idx, chunk_id, chunk_text, n_tokens): overlapping
    token-window chunks.  ``chunk_id`` is "<id>#<chunk_idx>" — the key
    downstream dedup/packing/embedding stages treat as a document id.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # chunk starts: 0, stride, 2·stride, … while start < max(n - overlap, 1)
    # (the upper bound stops a trailing chunk that would be pure overlap)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("__n") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    exploded = toks.select(
        "id",
        "__toks",
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    return exploded.select(
        F.col("id").alias(id_col),
        "chunk_idx",
        F.concat_ws(
            "#", F.col("id").cast("string"), F.col("chunk_idx").cast("string")
        ).alias("chunk_id"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + 1, F.lit(chunk_tokens)),
            " ",
        ).alias("chunk_text"),
        F.least(
            F.size("__toks") - F.col("__start"), F.lit(chunk_tokens)
        ).alias("n_tokens"),
    )

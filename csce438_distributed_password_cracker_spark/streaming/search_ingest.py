"""Streaming BM25 index maintenance — the retrieval twin of the
ingest-time dedup streams: a readStream of new documents grows the
persisted BM25 index (operators/search.py) per micro-batch, so the
index a production cluster probes is never more than one trigger behind
the corpus.

Shape per micro-batch (all through the shared
streaming/ingest_common.start_ingest_stream scaffold — cadence,
compaction, error-visibility contract live there):

1. **Novelty filter** (idempotence): the batch LEFT-ANTI joins the
   index's own doclen ids, so a re-delivered batch (foreachBatch
   retries after a sink/compaction failure, stream restarts from the
   checkpoint) re-applies NOTHING.  This also enforces the index's
   append-only id contract mechanically instead of by convention.
   The join build side is the batch (tiny) against a columnar id scan.
2. **Bootstrap-or-grow**: no index yet → ``bm25_build`` on the batch;
   otherwise ``bm25_update`` (postings/doclen append under the bucket
   layout, one-agg termstats merge, incremental stats fold).
3. **Log row** to the sink table: (batch_id, n_new, n_skipped, n_docs,
   total_len) — the stream's observable audit trail.

HONEST LIMIT (same class as every multi-file index mutation here): a
crash in the MIDDLE of ``bm25_update`` — after the postings append,
before the doclen append — leaves that batch's ids invisible to the
novelty filter, and the retry double-appends those postings.  The
window is one micro-batch wide and detectable (postings ids ∉ doclen
ids); closing it entirely needs a single atomic commit over four
datasets, which is what operators/versioned.py's manifest/CAS backends
exist for — the documented upgrade path if the deployment can't accept
a rebuild-on-crash policy for a derivable index.

Compaction: postings/doclen appends accrete small files (bounded by
``compact_every`` through maintenance.compact_bm25_index); termstats is
swap-rewritten whole per batch and never accretes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import search
from ..localframe import local_frame
from .ingest_common import index_exists, start_ingest_stream

LOG_SCHEMA = (
    "batch_id long, n_new long, n_skipped long, "
    "n_docs double, total_len double"
)


def bm25_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    index_path: str,
    batch_id: int = -1,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = search.N_TERM_BUCKETS,
) -> DataFrame:
    """Apply one micro-batch to the BM25 index at ``index_path``;
    returns the one-row log frame (see :data:`LOG_SCHEMA`).  Usable
    directly for batch-mode backfill — the stream wrapper below calls
    exactly this."""
    # a NULL id can never satisfy the append-only contract: the anti-
    # join's equality never matches NULL keys, so such a row would be
    # 'fresh' on EVERY delivery — replay idempotence (the module's core
    # guarantee) would silently break.  Screen them out up front; they
    # surface in the log as skipped rows (n_batch counts the raw batch).
    keyed = batch_df.where(F.col(id_col).isNotNull())
    have_index = index_exists(index_path, "doclen")
    if have_index:
        existing = (
            spark.read.parquet(f"{index_path}/doclen")
            .select(F.col("id").alias(id_col))
        )
        fresh = keyed.join(existing, id_col, "left_anti")
    else:
        fresh = keyed
    # pin the novelty verdict BEFORE mutating the index (same rule as
    # every ingest twin): the anti-join plan references the doclen
    # parquet, and Spark's CacheManager RECACHES path-dependent plans
    # when that path is appended to — a merely-persisted `fresh` would
    # silently recompute against the post-append doclen (which now
    # contains the batch's own ids) and fold ZERO docs into the stats.
    # localCheckpoint severs the file lineage outright.
    fresh = fresh.localCheckpoint(eager=True)
    n_batch = batch_df.count()
    n_new = fresh.count()
    if n_new and not have_index:
        stats = search.bm25_build(
            fresh, id_col, text_col, index_path, n_buckets=n_buckets
        )
    elif n_new:
        stats = search.bm25_update(fresh, id_col, text_col, index_path)
    elif have_index:
        st = spark.read.parquet(f"{index_path}/stats").first()
        stats = {"n_docs": st.n_docs, "total_len": st.total_len}
    else:
        # empty first batch: do NOT bootstrap an empty index — its
        # n_docs=0 stats would divide-by-zero every later probe
        stats = {"n_docs": 0.0, "total_len": 0.0}
    return local_frame(
        spark,
        [
            (
                int(batch_id),
                int(n_new),
                int(n_batch - n_new),
                float(stats["n_docs"]),
                float(stats["total_len"]),
            )
        ],
        LOG_SCHEMA,
    )


def start_bm25_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    index_path: str,
    sink_table: str = "bm25_ingest_log",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = search.N_TERM_BUCKETS,
    available_now: bool = True,
    compact_every: int = 0,
    max_files_per_trigger: int | None = None,
):
    """readStream over a directory of json-lines document files →
    foreachBatch :func:`bm25_ingest_batch` → per-batch log rows in
    ``sink_table``.  ``compact_every`` > 0 compacts the accreting
    postings/doclen files every that-many micro-batches inside the
    single writer (maintenance.compact_bm25_index)."""
    from ..operators.maintenance import compact_bm25_index

    return start_ingest_stream(
        spark,
        source_dir,
        checkpoint_dir,
        sink_table,
        lambda batch_df, bid: bm25_ingest_batch(
            spark,
            batch_df,
            index_path,
            batch_id=bid,
            id_col=id_col,
            text_col=text_col,
            n_buckets=n_buckets,
        ),
        compact=lambda: compact_bm25_index(spark, index_path),
        compact_every=compact_every,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        schema=f"{id_col} LONG, {text_col} STRING",
        compact_label="bm25-index",
    )

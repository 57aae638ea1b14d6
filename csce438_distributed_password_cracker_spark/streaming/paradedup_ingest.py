"""Ingest-time cross-document paragraph dedup: a STREAM of new
documents excised against a persisted fingerprint index of every
paragraph the corpus has already admitted — the streaming twin of
operators/paradedup.paragraph_dedup (MassiveText/Gopher exact
paragraph sweep, Rae et al. 2021), completing the batch sweep's
dedup-ingest pattern (streaming/dedup_ingest.py does the same for
MinHash near-dup).

Index layout (parquet under ``index_path``):
  paras/  (_k long, _wdid long, _wpos int) partitioned by
          k_bucket = pmod(_k, K_BUCKETS)

Each row is a paragraph fingerprint with its ELECTED first occurrence
(the winning (doc_id, pos)) — storing the winner, not just the key,
makes a foreachBatch REPLAY idempotent: after a durable index append,
the replayed batch's own winners are already in the index and would
otherwise excise themselves; matching on (did, pos) == (stored winner)
keeps them instead.

Probe shape: a micro-batch is tiny relative to the corpus, so the
batch's fingerprints BROADCAST against the index scan, which is PRUNED
to the batch's k_bucket partition directories at planning time — the
corpus-side index is never shuffled, and a probe reads ≤ K_BUCKETS
bucket dirs.  Appends add one file per touched bucket per batch;
``compact_para_index`` rewrites the tree when the file count grows.

Convergence: the stream admits the same paragraph set as ONE batch
``paragraph_dedup`` over the concatenation of corpus + batches —
order-dependent only in WHICH occurrence of a cross-batch duplicate
wins (arrival order, as any online dedup must), pinned equal on the
kept-fingerprint level in tests/test_paradedup_ingest.py.

Fingerprints are xxhash64 (the batch sweep's default): a 64-bit
collision merges two distinct paragraphs with probability ≈ n²/2⁶⁵ —
acceptable for corpus curation, same trade the batch operator
documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.paradedup import election, reassemble
from .ingest_common import bucketed, index_exists, start_ingest_stream

# pmod(_k, K_BUCKETS) partition dirs: 64 dirs list in one round trip,
# and a probe that hits k of them reads k/64 of the index
K_BUCKETS = 64


def _with_bucket(rows: DataFrame) -> DataFrame:
    return bucketed(rows, "_k", K_BUCKETS, "k_bucket")


def build_para_index(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 0,
) -> None:
    """One-off index build over the existing (already paragraph-deduped)
    corpus: one election aggregation, winners land partitioned by
    k_bucket.  Runs once per corpus version; every batch probes it."""
    _, _, _, winners = election(docs, id_col, text_col, sep, min_chars)
    (
        _with_bucket(winners.select("_k", "_wdid", "_wpos"))
        .repartition("k_bucket")
        .write.mode("overwrite")
        .partitionBy("k_bucket")
        .parquet(f"{index_path}/paras")
    )


def _pruned_seen(
    spark: SparkSession, index_path: str, keys: DataFrame
) -> DataFrame:
    """Index rows matching the batch's fingerprints: the scan prunes to
    the batch's k_bucket dirs (partition-column literals — keys is
    already localCheckpointed, so deriving them is one sub-second job
    on batch-sized data), then the batch keys broadcast into the join —
    the index side never shuffles."""
    idx = spark.read.parquet(f"{index_path}/paras")
    buckets = sorted(
        r["k_bucket"]
        for r in _with_bucket(keys).select("k_bucket").distinct().collect()
    )
    if not buckets:
        return idx.filter(F.lit(False)).select("_k", "_wdid", "_wpos")
    return (
        idx.filter(F.col("k_bucket").isin(buckets))
        .join(F.broadcast(keys), "_k")
        .select("_k", "_wdid", "_wpos")
    )


def ingest_paradedup_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 0,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Paragraph-dedup verdict for one micro-batch, and admission of its
    novel fingerprints.

    Returns ``(id_col, out_col, n_paragraphs, n_kept)`` — each document
    rejoined from its surviving paragraphs; side effect: fingerprints
    the corpus has never seen are APPENDED to the index with their
    batch-elected winners, so later batches excise them.

    A contested occurrence survives iff it IS the elected first
    occurrence of its fingerprint — the index winner when the corpus
    has seen it (so a replayed batch keeps its own rows), else the
    batch winner.  Exempt paragraphs (shorter than ``min_chars``, or
    empty) are kept everywhere and never indexed — the exemption
    predicate lives in ONE place (operators/paradedup.election)."""
    _, exempt, occ, winners = election(
        batch, id_col, text_col, sep, min_chars
    )
    # pin the (batch-sized) election before it fans out: occ feeds the
    # probe-key derivation AND the verdict; winners feed the verdict AND
    # the admit append — un-checkpointed, each consumer would re-run the
    # explode + election
    occ = occ.localCheckpoint(eager=True)
    winners = winners.drop("_n").localCheckpoint(eager=True)

    if index_exists(index_path, "paras"):
        seen = _pruned_seen(
            spark, index_path, winners.select("_k")
        ).localCheckpoint(eager=True)
    else:
        # empty frame in the WINNERS' schema (id type follows id_col)
        seen = spark.createDataFrame(
            [], winners.select("_k", "_wdid", "_wpos").schema
        )

    # winner-of-record per fingerprint: the index winner if the corpus
    # has seen it, else the batch winner (both frames are batch-sized —
    # broadcast, map-side verdict over occ)
    record = F.broadcast(
        winners.join(
            seen.withColumnsRenamed({"_wdid": "_idid", "_wpos": "_ipos"}),
            "_k",
            "left",
        ).select(
            "_k",
            F.coalesce("_idid", "_wdid").alias("_rdid"),
            F.coalesce("_ipos", "_wpos").alias("_rpos"),
            F.col("_idid").isNotNull().alias("_seen"),
        )
    )
    kept_contested = (
        occ.join(record, "_k")
        .where(
            (F.col("_did") == F.col("_rdid"))
            & (F.col("_pos") == F.col("_rpos"))
        )
        .select("_did", "_pos", "_para")
    )
    cleaned = reassemble(
        batch,
        kept_contested.unionByName(exempt),
        id_col,
        text_col,
        sep,
        out_col,
    ).localCheckpoint(eager=True)  # pin the verdict BEFORE mutating the index

    novel = winners.join(seen.select("_k"), "_k", "left_anti")
    (
        _with_bucket(novel.select("_k", "_wdid", "_wpos"))
        .repartition("k_bucket")
        .write.mode("append")
        .partitionBy("k_bucket")
        .parquet(f"{index_path}/paras")
    )
    return cleaned


def compact_para_index(spark: SparkSession, index_path: str) -> None:
    """Rewrite the paras/ tree to one file per bucket — appends add a
    file per touched bucket per batch, and probe cost grows with file
    count.  Delegates to the maintenance module's crash-safe swap
    (write-new → rename-old-away → rename-new-in → delete-old): the
    live index is never deleted before its replacement is in place, so
    a crash mid-compaction cannot silently lose the dedup state."""
    from ..operators.maintenance import compact_parquet

    compact_parquet(
        spark, f"{index_path}/paras", partition_by=["k_bucket"]
    )


def start_paradedup_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    index_path: str,
    sink_table: str = "paradedup_cleaned",
    sep: str = "\n\n",
    min_chars: int = 0,
    available_now: bool = True,
    compact_every: int = 0,
    max_files_per_trigger: int | None = None,
):
    """readStream over a directory of document files (json lines with
    doc_id/text) → foreachBatch ingest_paradedup_batch → cleaned-docs
    sink table, through the shared ingest scaffold
    (streaming/ingest_common.start_ingest_stream — cadence, error
    visibility and backpressure contract documented there).  The index
    is the cross-batch STATE: admitted fingerprints are visible to
    every later batch."""
    return start_ingest_stream(
        spark,
        source_dir,
        checkpoint_dir,
        sink_table,
        lambda batch_df, _bid: ingest_paradedup_batch(
            spark, batch_df, index_path, sep=sep, min_chars=min_chars
        ),
        compact=lambda: compact_para_index(spark, index_path),
        compact_every=compact_every,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        compact_label="paragraph-index",
    )

"""Ingest-time exact-substring dedup: a STREAM of new documents excised
against a persisted fingerprint index of every k-token window the corpus
has already admitted — the streaming twin of
operators/substring.excise_duplicate_spans (Lee et al. 2022 EXACTSUBSTR),
completing the dedup-ingest pattern alongside paradedup_ingest (paragraph
granularity) and dedup_ingest (MinHash near-dup).

Index layout (parquet under ``index_path``):
  wins/  (_h long, _wdid long, _wpos int) partitioned by
         h_bucket = pmod(_h, H_BUCKETS)

One row per DISTINCT window fingerprint with its elected first occurrence
— storing the winner makes foreachBatch replays idempotent (a batch's own
indexed winners keep themselves), exactly the paradedup_ingest contract.

Semantics: the streaming pass runs the batch operator's ``min_count=2``
rule over the CONCATENATION seen so far — a batch window is excised iff
the corpus has already admitted its fingerprint (corpus count ≥ 1 + this
occurrence ⇒ duplicated) or an earlier (lower (doc, pos)) occurrence
exists in the same batch.  Corpus text already written is never revised
(the first occurrence survives in the batch semantics too).

Scale honesty: unlike the paragraph index (few distinct fingerprints per
batch ⇒ bucket pruning bites), a batch's window hashes are uniform, so a
non-trivial batch touches every bucket and the probe reads the whole
wins/ index ONCE per micro-batch — joined with the batch's keys
BROADCAST, never shuffled.  That makes probe cost ∝ index size per
batch: size micro-batches accordingly (bigger batches amortize), and
compact on a cadence.  The index itself is O(distinct windows) rows of
three integers — the same asymptotic state Lee et al.'s suffix array
holds, sharded instead of single-machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.substring import (
    excise_spans,
    merge_spans,
    window_occurrences,
    window_winners,
)
from .ingest_common import bucketed, index_exists, start_ingest_stream

H_BUCKETS = 64


def _with_bucket(rows: DataFrame) -> DataFrame:
    return bucketed(rows, "_h", H_BUCKETS, "h_bucket")


def build_substring_index(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    seed: int = 42,
) -> None:
    """One-off index build over the existing (already substring-deduped)
    corpus: one election aggregation over every window, winners land
    partitioned by h_bucket."""
    winners = window_winners(
        window_occurrences(docs, id_col, text_col, k, seed)
    ).drop("_n")
    (
        _with_bucket(winners)
        .repartition("h_bucket")
        .write.mode("overwrite")
        .partitionBy("h_bucket")
        .parquet(f"{index_path}/wins")
    )


def ingest_substring_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    seed: int = 42,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Substring-dedup verdict for one micro-batch, and admission of its
    novel window fingerprints.

    Returns ``(id_col, out_col, n_tokens, n_removed)``; side effect:
    fingerprints the corpus has never seen append to the index with
    their batch-elected winners.  An occurrence survives iff it IS the
    winner of record for its fingerprint — the index winner when seen
    (replay-idempotent), else the batch's elected first occurrence."""
    occ = window_occurrences(
        batch, id_col, text_col, k, seed
    ).localCheckpoint(eager=True)  # reused: winners, probe keys, verdict
    winners = window_winners(occ).localCheckpoint(
        eager=True
    )  # reused: verdict + admit

    if index_exists(index_path, "wins"):
        # batch keys broadcast into the index scan: the corpus side is
        # never shuffled.  Window hashes are uniform, so no bucket
        # pruning is attempted — a non-trivial batch touches every
        # bucket anyway (module docstring).
        seen = (
            spark.read.parquet(f"{index_path}/wins")
            .join(F.broadcast(winners.select("_h")), "_h")
            .select("_h", "_wdid", "_wpos")
            .localCheckpoint(eager=True)
        )
    else:
        seen = spark.createDataFrame(
            [], winners.select("_h", "_wdid", "_wpos").schema
        )

    # winner of record per fingerprint + whether excision applies at all
    # (a batch-unique, corpus-unseen window is NOT duplicated: no span)
    record = F.broadcast(
        winners.join(
            seen.withColumnsRenamed({"_wdid": "_idid", "_wpos": "_ipos"}),
            "_h",
            "left",
        ).select(
            "_h",
            F.coalesce("_idid", "_wdid").alias("_rdid"),
            F.coalesce("_ipos", "_wpos").alias("_rpos"),
            (F.col("_idid").isNotNull() | (F.col("_n") >= 2)).alias(
                "_dup"
            ),
        )
    )
    spans = merge_spans(
        occ.join(record, "_h")
        .where(
            F.col("_dup")
            & ~(
                (F.col("_did") == F.col("_rdid"))
                & (F.col("_pos") == F.col("_rpos"))
            )
        )
        .select(
            F.col("_did").alias(id_col),
            F.col("_pos").alias("start"),
            (F.col("_pos") + k).alias("end"),
        ),
        id_col,
    )
    cleaned = excise_spans(
        batch, spans, id_col, text_col, out_col
    ).localCheckpoint(eager=True)  # pin the verdict BEFORE mutating the index

    novel = winners.join(seen.select("_h"), "_h", "left_anti")
    (
        _with_bucket(novel.select("_h", "_wdid", "_wpos"))
        .repartition("h_bucket")
        .write.mode("append")
        .partitionBy("h_bucket")
        .parquet(f"{index_path}/wins")
    )
    return cleaned


def compact_substring_index(spark: SparkSession, index_path: str) -> None:
    """Rewrite wins/ to one file per bucket via the maintenance
    module's crash-safe swap (write-new → rename-old-away →
    rename-new-in → delete-old): the live index is never deleted
    before its replacement is in place, so a crash mid-compaction
    cannot silently lose the dedup state."""
    from ..operators.maintenance import compact_parquet

    compact_parquet(
        spark, f"{index_path}/wins", partition_by=["h_bucket"]
    )


def start_substring_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    index_path: str,
    sink_table: str = "substring_cleaned",
    k: int = 8,
    seed: int = 42,
    available_now: bool = True,
    compact_every: int = 0,
    max_files_per_trigger: int | None = None,
):
    """readStream over a directory of document files (json lines with
    doc_id/text) → foreachBatch ingest_substring_batch → cleaned-docs
    sink table, through the shared ingest scaffold
    (streaming/ingest_common.start_ingest_stream — cadence, error
    visibility and backpressure contract documented there).  The index
    is the cross-batch STATE."""
    return start_ingest_stream(
        spark,
        source_dir,
        checkpoint_dir,
        sink_table,
        lambda batch_df, _bid: ingest_substring_batch(
            spark, batch_df, index_path, k=k, seed=seed
        ),
        compact=lambda: compact_substring_index(spark, index_path),
        compact_every=compact_every,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        compact_label="substring-index",
    )

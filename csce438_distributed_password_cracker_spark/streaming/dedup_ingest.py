"""Ingest-time near-dup detection: a STREAM of new documents deduped
against a persisted MinHash-LSH index of the corpus (SURVEY.md §2.12 E1's
scale path applied at ingestion — the shape a 100 TB training-data
pipeline actually runs: the corpus is deduped once, then every incoming
batch is checked against the index and only novel documents are admitted
and indexed).

Index layout (parquet under ``index_path``):
  bands/  (band_hash long, id long)  partitioned by (band_idx,
          band_bucket) where band_bucket = pmod(band_hash, BAND_BUCKETS)
  sigs/   (id long, sig array<bigint>)

Probe shape: an incoming micro-batch is tiny relative to the corpus, so
its band rows are **broadcast** against the index's band table — a
broadcast hash join, no shuffle of the corpus side.  The band table is
additionally sub-partitioned by ``band_bucket`` (a fixed modulus of
``band_hash``), and the probe derives the batch's distinct
(band_idx, band_bucket) pairs (≤ bands × BAND_BUCKETS literals) into a
partition-column predicate, so the scan PRUNES to matching bucket
directories at planning time instead of reading whole band partitions.
Directory count stays bounded (bands × BAND_BUCKETS dirs); the finer
layout writes proportionally more small files per append — bounded by
operators/maintenance.compact_dedup_index, same as before.

Duplicate verdicts use the MinHash similarity ESTIMATE (fraction of equal
signature components — the textbook unbiased estimator of Jaccard), not
exact shingle Jaccard: the index stores 64×i64 per corpus doc instead of
the full shingle set, which is what makes an always-on index affordable
at 100 TB.  The estimator's error (~1/√64 ≈ 0.125 std) is absorbed by
``threshold``; callers wanting exactness re-verify flagged pairs against
the raw text (the batch knows its own candidates' ids).

Each batch also self-dedupes: a document is a duplicate if it matches the
corpus OR an earlier (lower-id) document of the same batch.  Ties are
resolved deterministically: best estimate first, then lowest candidate id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import minhash_signature

BANDS = 16
NUM_HASHES = 64
# band_hash sub-partitioning modulus: bands × BAND_BUCKETS directories
# total (16×8 = 128 — trivial listing cost), and a probe that hits k of
# them reads k/128 of the index instead of its full band partitions.
BAND_BUCKETS = 8

VERDICT_SCHEMA = (
    "id long, is_dup boolean, dup_of long, est_jaccard double"
)


def est_jaccard_expr(a: str, b: str, num_hashes: int = NUM_HASHES) -> F.Column:
    """MinHash Jaccard estimate: mean agreement of signature components.

    Higher-order functions run interpreted, but this is evaluated only on
    CANDIDATE pairs (already banded down from all-pairs), so the
    interpreted cost is O(candidates × num_hashes), not O(corpus).
    """
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> IF(x = y, 1.0D, 0.0D)), "
        f"0.0D, (acc, v) -> acc + v) / {num_hashes}"
    )


def band_partition_cols(columns: list[str]) -> list[str]:
    """Partition columns of a bands/ dataset, current or legacy layout —
    the single source of truth for layout detection (ingest append and
    compact_dedup_index both use it)."""
    return [c for c in ("band_idx", "band_bucket") if c in columns]


def _band_rows_of(
    sigs: DataFrame, num_hashes: int = NUM_HASHES, bands: int = BANDS
) -> DataFrame:
    """band rows (id, band_idx, band_hash, band_bucket) derived from a
    signature table — split from _sig_and_bands so callers can insert a
    checkpoint between the (expensive) signature pass and the banding."""
    r = num_hashes // bands
    return sigs.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"xxhash64(slice(sig, b * {r} + 1, {r}), b))"
            )
        ).alias("band_idx", "band_hash"),
    ).withColumn("band_bucket", F.pmod("band_hash", F.lit(BAND_BUCKETS)))


def _sig_and_bands(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(sigs(id, sig), band_rows(id, band_idx, band_hash, band_bucket))
    for a doc set."""
    sigs = minhash_signature(docs, id_col, text_col, n, num_hashes, seed)
    return sigs, _band_rows_of(sigs, num_hashes, bands)


def build_dedup_index(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **params,
) -> None:
    """One-off index build over the existing (already-deduped) corpus.
    Runs once per corpus version; every subsequent batch probes it."""
    sigs, band_rows = _sig_and_bands(docs, id_col, text_col, **params)
    (
        band_rows.repartition("band_idx", "band_bucket")
        .write.mode("overwrite")
        .partitionBy("band_idx", "band_bucket")
        .parquet(f"{index_path}/bands")
    )
    sigs.write.mode("overwrite").parquet(f"{index_path}/sigs")


def _index_exists(spark: SparkSession, index_path: str) -> bool:
    # route through the shared scheme-aware probe (ADVICE r6 fixed the
    # other twins; a local-pathlib probe here would report 'no index'
    # for ANY remote path and re-admit every batch fingerprint)
    from .ingest_common import index_exists

    return index_exists(index_path, "sigs")


def _pruned_index_bands(
    spark: SparkSession, index_path: str, band_rows: DataFrame
) -> DataFrame:
    return _prune_band_scan(spark.read.parquet(f"{index_path}/bands"), band_rows)


def _prune_band_scan(idx_bands: DataFrame, band_rows: DataFrame) -> DataFrame:
    """The index band table, PRUNED to the partition directories the
    batch can possibly match.

    The batch's distinct (band_idx, band_bucket) pairs are a tiny set
    (≤ bands × BAND_BUCKETS; band_rows is already localCheckpointed, so
    this is one sub-second job on batch-sized data) inlined as a
    partition-column predicate — the scan prunes at planning time
    (PartitionFilters in the FileSourceScan), reading k matching bucket
    dirs instead of every band partition.  Indexes written before the
    band_bucket layout (no such partition column) fall back to the
    unpruned scan."""
    if "band_bucket" not in idx_bands.columns:
        return idx_bands
    pairs = sorted(
        (r["band_idx"], r["band_bucket"])
        for r in band_rows.select("band_idx", "band_bucket")
        .distinct()
        .collect()
    )
    if not pairs:
        return idx_bands.filter(F.lit(False))
    cond = None
    for b_idx, b_bkt in pairs:
        term = (F.col("band_idx") == b_idx) & (F.col("band_bucket") == b_bkt)
        cond = term if cond is None else cond | term
    return idx_bands.filter(cond)


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    **params,
) -> DataFrame:
    """Dedup verdict for one micro-batch, and admission of its uniques.

    Returns (id, is_dup, dup_of, est_jaccard); side effect: unique docs'
    signatures and band rows are APPENDED to the index, so later batches
    (and later docs of other streams) see them.  ``dup_of`` prefers the
    best estimate, then the lowest candidate id — deterministic under
    any partitioning.
    """
    sig_params = {
        k: params[k] for k in ("n", "num_hashes", "seed") if k in params
    }
    # checkpoint the signature pass FIRST, then band it: banding derived
    # from an un-checkpointed plan would re-run the (dominant) shingling
    # + hashing job a second time for band_rows' own checkpoint
    sigs = minhash_signature(batch, id_col, text_col, **sig_params)
    sigs = sigs.localCheckpoint(eager=True)  # reused 3×: probe, self-join, admit
    band_rows = _band_rows_of(
        sigs,
        params.get("num_hashes", NUM_HASHES),
        params.get("bands", BANDS),
    ).localCheckpoint(eager=True)

    idx_band_cols: list[str] | None = None
    cand_sides = []
    if _index_exists(spark, index_path):
        idx_raw = spark.read.parquet(f"{index_path}/bands")
        idx_band_cols = idx_raw.columns  # reused for the append layout
        idx_bands = _prune_band_scan(idx_raw, band_rows)
        idx_sigs = spark.read.parquet(f"{index_path}/sigs")
        # batch side broadcast: the corpus-side band table is never shuffled.
        # cand_id != new_id: a doc is never a duplicate of ITSELF — on a
        # foreachBatch replay after a durable index append, the doc's own
        # rows are already in the index and would otherwise match at
        # est_jaccard 1.0, flipping the replayed verdict to a self-dup
        corpus_cand = (
            idx_bands.join(
                F.broadcast(band_rows.withColumnRenamed("id", "new_id")),
                ["band_idx", "band_hash"],
            )
            .filter(F.col("id") != F.col("new_id"))
            .select(F.col("new_id"), F.col("id").alias("cand_id"))
            .distinct()
            .join(idx_sigs.withColumnsRenamed({"id": "cand_id", "sig": "cand_sig"}), "cand_id")
        )
        cand_sides.append(corpus_cand)
    # self-dedup: earlier (lower-id) docs of the same batch are candidates
    left = band_rows.withColumnRenamed("id", "new_id")
    right = band_rows.withColumnRenamed("id", "cand_id")
    batch_cand = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("cand_id") < F.col("new_id"))
        .select("new_id", "cand_id")
        .distinct()
        .join(
            sigs.withColumnsRenamed({"id": "cand_id", "sig": "cand_sig"}),
            "cand_id",
        )
    )
    cand_sides.append(batch_cand)
    cand = cand_sides[0]
    for extra in cand_sides[1:]:
        cand = cand.unionByName(extra)

    scored = (
        cand.join(sigs.withColumnRenamed("id", "new_id"), "new_id")
        .select(
            "new_id",
            "cand_id",
            est_jaccard_expr("sig", "cand_sig").alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    w = Window.partitionBy("new_id").orderBy(
        F.desc("est_jaccard"), F.asc("cand_id")
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("new_id", F.col("cand_id").alias("dup_of"), "est_jaccard")
    )
    verdict = (
        batch.select(F.col(id_col).cast("long").alias("id"))
        .join(best.withColumnRenamed("new_id", "id"), "id", "left")
        .select(
            "id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            "est_jaccard",
        )
        .localCheckpoint(eager=True)  # pin the verdict BEFORE mutating the index
    )

    uniques = verdict.filter(~F.col("is_dup")).select("id")
    # append in the layout that is ON DISK: mixing band_bucket dirs into a
    # legacy band_idx-only tree would give leaf files at two partition
    # depths — Spark's partition discovery rejects that and the index
    # would be wedged for every later probe.  idx_band_cols was captured
    # from the probe's scan, so no second partition discovery happens.
    part_cols = (
        band_partition_cols(idx_band_cols)
        if idx_band_cols is not None
        else ["band_idx", "band_bucket"]
    )
    admit = band_rows.join(uniques, "id")
    if "band_bucket" not in part_cols:
        admit = admit.drop("band_bucket")
    (
        admit.repartition(*part_cols)
        .write.mode("append")
        .partitionBy(*part_cols)
        .parquet(f"{index_path}/bands")
    )
    sigs.join(uniques, "id").write.mode("append").parquet(f"{index_path}/sigs")
    return verdict


def start_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    index_path: str,
    sink_table: str = "dedup_verdicts",
    threshold: float = 0.7,
    available_now: bool = True,
    compact_every: int = 0,
    max_files_per_trigger: int | None = None,
    **params,
):
    """readStream over a directory of document files (json lines with
    doc_id/text) → foreachBatch ingest_batch → verdict sink table.

    The index is the cross-batch STATE: admitted docs are visible to every
    later batch, so the stream converges to the same admitted set as a
    batch dedup over the concatenation (order-dependent only in which of
    two mutual near-dups is admitted — resolved by arrival order, as any
    online dedup must).

    ``compact_every`` > 0 runs operators/maintenance.compact_dedup_index
    every that-many micro-batches through the shared ingest scaffold
    (streaming/ingest_common.start_ingest_stream — cadence, error
    visibility and backpressure contract documented there); 0 leaves
    compaction to an external maintenance window.
    ``max_files_per_trigger`` caps each micro-batch's file intake (source
    back-pressure; also what tests use to force multi-batch runs)."""
    from ..operators.maintenance import compact_dedup_index
    from .ingest_common import start_ingest_stream

    return start_ingest_stream(
        spark,
        source_dir,
        checkpoint_dir,
        sink_table,
        lambda batch_df, _bid: ingest_batch(
            spark, batch_df, index_path, threshold=threshold, **params
        ),
        compact=lambda: compact_dedup_index(spark, index_path),
        compact_every=compact_every,
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        compact_label="dedup-index",
    )

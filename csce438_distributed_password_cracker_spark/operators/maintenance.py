"""Table maintenance for append-mode parquet datasets: small-file
compaction and z-order clustering.

Streaming ingest (streaming/dedup_ingest.py appends per micro-batch;
any ``mode("append")`` sink behaves the same) accretes one file set per
batch.  At 100 TB that is the dominant operational failure mode of a
parquet-backed index: scan planning degrades with file count (listing,
footer reads, task-per-file scheduling) long before data volume is a
problem.  Compaction rewrites a dataset to a bounded file count without
changing its rows.

The swap is write-new → rename-old-away → rename-new-in → delete-old,
with every metadata step routed through the Hadoop ``FileSystem`` API
resolved from the path's scheme (fsutil.py), so the same routine runs
against ``file://``, ``hdfs://`` and object-store paths.  The two
renames are atomic individually on local filesystems and on HDFS
(sub-second unreadable window); object stores implement rename as
copy+delete — compaction still completes correctly there but the
window is O(data) and a visible ``RuntimeWarning`` says so — for
object-store-resident indexes prefer the versioned-table manifest flip
(operators/versioned.py's CAS backend), which commits with one
conditional PUT.  Run compaction in a maintenance window of the single
writer; concurrent readers of the same path get retried by Spark's
task retry if they race the rename.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil


def parquet_file_count(path: str, spark: SparkSession | None = None) -> int:
    """Data files under a parquet dataset dir (recursively; excludes
    _SUCCESS and other metadata).  Scheme-aware when a session is
    supplied or active; plain-local ``pathlib`` otherwise."""
    spark = spark or SparkSession.getActiveSession()
    if spark is not None:
        return fsutil.count_files(spark, path)
    from pathlib import Path

    return sum(1 for p in Path(path).rglob("*.parquet"))


def compact_parquet(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    num_files: int = 1,
) -> int:
    """Rewrite the parquet dataset at ``path`` with a bounded file count;
    returns the resulting data-file count.

    ``partition_by``: hive-style partition columns to preserve (the
    rewrite shuffles on them first, so each partition directory gets at
    most ``num_files`` files — same discipline as the original writers).
    ``num_files``: target files per partition directory (or total, when
    unpartitioned).  The rewrite is one shuffle; row content, schema and
    partition layout are unchanged — asserted cheaply by row count.

    FILESYSTEM CONTRACT: every metadata step (existence probe, the two
    swap renames, cleanup, the file count) goes through the Hadoop
    ``FileSystem`` resolved from ``path``'s scheme (fsutil.py), so the
    swap is atomic on local filesystems and HDFS and merely correct —
    with a visible non-atomicity warning — on object stores, whose
    rename is copy+delete.  A failed rename-new-in rolls the old
    directory back before raising, so the dataset is never left
    missing.  Without a JVM handle (Spark Connect) remote paths raise
    loudly instead of silently operating on the local filesystem.
    """
    if not fsutil.exists(spark, path):
        raise FileNotFoundError(path)
    fsutil.warn_if_non_atomic_rename(path, "compact_parquet")
    df = spark.read.parquet(path)
    n_before = df.count()

    tmp = fsutil.sibling(path, ".__compact_tmp__")
    old = fsutil.sibling(path, ".__compact_old__")
    fsutil.delete(spark, tmp)
    fsutil.delete(spark, old)

    writer = (
        df.repartition(num_files, *partition_by)
        if partition_by
        else df.repartition(num_files)
    ).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    if spark.read.parquet(tmp).count() != n_before:
        fsutil.delete(spark, tmp)
        raise RuntimeError(f"compaction row-count mismatch for {path}")

    fsutil.rename(spark, path, old)
    try:
        fsutil.rename(spark, tmp, path)
    except Exception:
        # roll the original back in — a compaction failure must degrade
        # to "nothing happened", never to "the dataset vanished"
        fsutil.rename(spark, old, path)
        raise
    fsutil.delete(spark, old)
    return parquet_file_count(path, spark)


def zorder_column(
    df: DataFrame, cols: list[str], bounds: dict[str, tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Z-order (Morton) value over ``cols``: each column is min-max
    normalized to a ``bits``-bit integer using the supplied global
    ``bounds``, then the columns' bits are interleaved, so sorting by the
    result places rows close in EVERY clustered dimension into the same
    neighborhood — and therefore the same parquet files, whose min/max
    footer stats then prune range predicates on ANY of the columns, not
    just the leading sort key.

    Built as one codegen'd integer expression (``bits × n_cols`` shift
    terms — 64 for 4×16, well inside codegen limits; the normalization
    sub-expressions are deterministic, so whole-stage codegen's
    common-subexpression elimination evaluates each once).  NULLs and
    values outside the bounds clamp to the edge buckets.  Min-max
    bucketing is one aggregate pass over the data; rank-based bucketing
    (quantiles) handles heavy skew better but needs a sampling pass —
    min-max is the right default for the roughly-uniform key domains of
    the test tables.
    """
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("cols×bits must fit a signed 64-bit z-value")
    k, top = len(cols), (1 << bits) - 1
    norms = []
    for c in cols:
        lo, hi = bounds[c]
        if hi <= lo:  # constant column: contributes nothing to the order
            norms.append(F.lit(0).cast("long"))
            continue
        frac = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(
            float(hi) - float(lo)
        )
        clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
        norms.append(F.coalesce((clamped * top).cast("long"), F.lit(0)))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, n in enumerate(norms):
            bit = F.shiftright(n, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def compact_dedup_index(spark: SparkSession, index_path: str) -> dict[str, int]:
    """Compact the streaming dedup index (streaming/dedup_ingest.py
    layout): ``bands/`` keeps its partition layout — (band_idx,
    band_bucket), or legacy band_idx-only — and ``sigs/`` is flattened.
    Returns the per-dataset file counts after compaction.  Verdicts are
    unaffected — the index is a set of rows; only file boundaries
    change."""
    from ..streaming.dedup_ingest import band_partition_cols

    part_by = band_partition_cols(
        spark.read.parquet(f"{index_path}/bands").columns
    )
    return {
        "bands": compact_parquet(
            spark, f"{index_path}/bands", partition_by=part_by
        ),
        "sigs": compact_parquet(spark, f"{index_path}/sigs"),
    }


def compact_bm25_index(
    spark: SparkSession,
    index_path: str,
    postings_files: int = 64,
    doclen_files: int = 16,
) -> dict[str, int]:
    """Compact the BM25 index's APPENDING datasets (operators/search.py
    layout): ``postings/`` keeps its term_bucket partition layout,
    ``doclen/`` is flattened to a bounded file count.  ``termstats/``
    and ``stats/`` are swap-rewritten whole on every update and never
    accrete — compacting them here would only race the next swap.
    Probe results are unaffected; only file boundaries change.

    Both datasets are CORPUS-sized, so the rewrites keep real
    parallelism (``postings_files`` hash tasks over term_bucket — one
    file per bucket dir at the default 64 — and ``doclen_files`` flat
    tasks); ``num_files=1`` here would be the same single-writer cliff
    bm25_build's doclen write was cured of."""
    return {
        "postings": compact_parquet(
            spark,
            f"{index_path}/postings",
            partition_by=["term_bucket"],
            num_files=postings_files,
        ),
        "doclen": compact_parquet(
            spark, f"{index_path}/doclen", num_files=doclen_files
        ),
    }

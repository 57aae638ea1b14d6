"""Shared scaffold for the ingest-time dedup streams (dedup_ingest /
paradedup_ingest / substring_ingest): the hash-bucket column, the
index-existence probe, and the readStream → foreachBatch → sink wrapper
with the in-writer compaction cadence.  ONE copy — a fix to the
cadence/backpressure/error-visibility contract lands in all three
modules at once."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketed(rows: DataFrame, key_col: str, n_buckets: int, bucket_col: str) -> DataFrame:
    """Append ``bucket_col = pmod(key_col, n_buckets)`` — the partition
    coordinate of every ingest index."""
    return rows.withColumn(bucket_col, F.pmod(key_col, F.lit(n_buckets)))


def index_exists(index_path: str, subdir: str) -> bool:
    """True iff the index component under ``index_path/subdir`` has a
    committed ``_SUCCESS`` marker.

    Routed through the Hadoop FileSystem API (resolved from the path's
    scheme), so ``hdfs://`` / ``s3a://`` index locations probe correctly
    — a local-``pathlib`` probe would report 'no index' for ANY remote
    path and silently re-admit every batch fingerprint as novel (ADVICE
    r6).  Falls back to pathlib only when no SparkSession is active
    (plain-local tooling)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        try:
            jvm = spark._jvm
            jsc = spark._jsc
        except Exception:
            # Spark Connect sessions have no JVM handle — fall through
            # to the local probe for LOCAL paths only (guard below)
            jvm = jsc = None
        if jvm is not None and jsc is not None:
            p = jvm.org.apache.hadoop.fs.Path(
                f"{index_path.rstrip('/')}/{subdir}/_SUCCESS"
            )
            fs = p.getFileSystem(jsc.hadoopConfiguration())
            return bool(fs.exists(p))
    from urllib.parse import urlsplit

    parts = urlsplit(index_path)
    if parts.scheme.lower() not in ("", "file"):
        # without filesystem access a remote index CANNOT be probed —
        # a silent False here would re-admit every batch fingerprint
        # as novel (the exact bug the Hadoop-API routing fixed)
        raise RuntimeError(
            f"cannot probe {parts.scheme}://-resident index without JVM "
            "filesystem access (Spark Connect client?): index_exists "
            "would silently report 'missing' and corrupt ingest "
            "idempotence"
        )
    from pathlib import Path

    # urlsplit handles every file-URI spelling ('file:/x', 'file:///x',
    # 'file://localhost/x', case-insensitive scheme) — a literal prefix
    # strip misparsed some of them into the wrong local path
    local = parts.path if parts.scheme else index_path
    return (Path(local) / subdir / "_SUCCESS").exists()


def start_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_table: str,
    process_batch: Callable[[DataFrame, int], DataFrame],
    compact: Callable[[], None] | None = None,
    compact_every: int = 0,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    schema: str = "doc_id LONG, text STRING",
    compact_label: str = "index",
):
    """readStream over a directory of json-lines files → foreachBatch
    (``process_batch(batch_df, batch_id) -> DataFrame`` appended to
    ``sink_table``) → optional compaction every ``compact_every``
    micro-batches INSIDE the single writer (never racing an append),
    best-effort with a VISIBLE warning: by the time compaction runs the
    batch's index/sink writes are durable, and a compaction error must
    not fail the micro-batch (a foreachBatch retry would double-write
    the sink), but silent breakage would let small files accrete
    unbounded — the exact failure mode compaction exists to prevent."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = process_batch(batch_df, batch_id)
        out.write.mode("append").saveAsTable(sink_table)
        if (
            compact is not None
            and compact_every > 0
            and (batch_id + 1) % compact_every == 0
        ):
            try:
                compact()
            except Exception:
                import logging

                logging.getLogger(__name__).warning(
                    "%s compaction failed at batch %d "
                    "(deferred to the next cadence)",
                    compact_label,
                    batch_id,
                    exc_info=True,
                )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Schema-enforced multi-format ingestion — the front door a pipeline
runs before anything in ``operators/`` touches the data.

Reference analog: none beyond the generated keyspace (the reference's
only "source"); this is north-star surface (BASELINE.json) for the
table-shaped inputs a real corpus arrives as (CSV / JSON lines /
parquet drops).

The 100 TB rules this module encodes:

- **Schema is declared, never inferred.**  ``inferSchema`` on
  CSV/JSON is a full extra pass over the input before the real read —
  at corpus scale that doubles ingest cost, and worse, the inferred
  types can drift batch-to-batch.  ``ingest`` requires an explicit
  schema and the reader prunes to it.
- **Malformed rows are data, not exceptions.**  Default PERMISSIVE
  mode routes undecodable rows to a quarantine column; ``split_valid``
  separates them so the pipeline loads what parses and audits what
  doesn't.  FAILFAST is one flag away for contract-enforced feeds.
- **Land as parquet, bounded file count.**  ``land`` rewrites the
  ingested batch as parquet with an explicit output-partition bound —
  a million tiny CSV shards must not become a million parquet footers
  (the same operational killer operators/maintenance.py compacts
  against on the sink side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"

_FORMATS = ("csv", "json", "parquet", "orc")
# self-describing columnar formats: schema acts as a read-time contract
# (missing -> nulls, extra -> pruned); no corrupt-record column exists
_COLUMNAR = ("parquet", "orc")


def ingest(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read ``path`` as ``fmt`` with the DECLARED schema.

    PERMISSIVE (default) appends :data:`CORRUPT_COL` holding the raw
    text of rows that failed to decode (NULL for clean rows) — feed the
    result to :func:`split_valid`.  ``mode='FAILFAST'`` raises on the
    first malformed row instead.  Parquet and ORC are self-describing,
    so the schema acts as a read-time contract (missing columns ->
    nulls, extra columns -> pruned) and no corrupt column is added.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    if fmt in _COLUMNAR:
        return spark.read.schema(schema).format(fmt).load(path)
    read_schema = schema
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema.names:
        read_schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    reader = (
        spark.read.format(fmt)
        .schema(read_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the corrupt column dropped,
    and the raw text of rows that failed to decode — write the latter
    to an audit sink, never silently drop it.

    The parsed batch is cached first: Spark refuses to answer queries
    whose file scan references ONLY the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the raw
    reader cannot know which rows are corrupt without parsing the data
    columns), and both halves re-scan the input anyway, so one
    materialization serves the clean load and the audit.  Callers
    should ``unpersist`` the inputs after landing if the batch is
    large."""
    if CORRUPT_COL not in df.columns:
        return df, df.sparkSession.createDataFrame(
            [], f"{CORRUPT_COL} string"
        )
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def land(
    df: DataFrame,
    out_dir: str,
    max_output_files: int = 64,
    partition_by: list[str] | None = None,
) -> None:
    """Land an ingested batch as parquet with a bounded file count.
    ``repartition`` (not coalesce) so the write parallelism is real and
    the output files are evenly sized regardless of how ragged the
    source shards were."""
    writer = df.repartition(max_output_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_dir)


def with_provenance(
    df: DataFrame,
    file_col: str = "src_file",
    row_col: str = "src_row",
) -> DataFrame:
    """Append row-level lineage from Spark's hidden ``_metadata``
    file-source struct: ``src_file`` (the originating file's path) and
    ``src_row`` (the row's 0-based index WITHIN that file — stable
    across reads, unlike ``monotonically_increasing_id``, which bakes
    in the session's partition layout).

    Every audit trail a curation pipeline owes its corpus ("which crawl
    shard did this document come from?") reduces to carrying these two
    columns from ingest onward; dedup/quality verdicts joined back on
    them localize bad upstream files.  Must be called on a DataFrame
    still directly backed by a file source (`spark.read...`/
    :func:`ingest` output) — after a shuffle or join the metadata
    struct is gone, which this surfaces as the Spark analysis error
    rather than silently inventing lineage.

    Map-only: the columns are constants of the scan, no data moves.
    """
    return df.select(
        "*",
        F.col("_metadata.file_path").alias(file_col),
        F.col("_metadata.row_index").alias(row_col),
    )


def ingest_binary(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Raw file drop → a media table, via Spark's ``binaryFile`` source:
    ``(doc_id, media_type, payload, path, length, mod_time)``.  The
    first three columns match :data:`operators.multimodal.MEDIA_SCHEMA`,
    so the result feeds ``decode_media`` / ``extract_features`` /
    ``resize`` directly — this is the front door a multimodal corpus
    (a crawl of image/audio files) arrives through before any operator
    touches it.

    - ``doc_id = xxhash64(path)``: stable across re-reads and cluster
      layouts (unlike ``monotonically_increasing_id``), needs no
      filename convention; collisions are 64-bit-unlikely.  Callers
      with authoritative ids join them on ``path`` afterwards.
    - ``media_type`` sniffs container magic bytes JVM-side
      (``substring`` on the binary column — no Python boundary): same
      vocabulary as :func:`operators.multimodal.sniff` ('png' / 'wav' /
      NULL for opaque).
    - ``glob`` maps to ``pathGlobFilter``: pruning happens at file
      LISTING, before any byte is read — at a 100 TB crawl the listing
      is the scan.

    Scale contract of the source itself: ``binaryFile`` never splits a
    file (one row per file, whole payload in one task), so the row size
    ceiling is the 2 GiB BinaryType bound and executor memory must
    cover the largest single file; many small files pack multiple per
    task under ``spark.sql.files.maxPartitionBytes``.  The small-file
    listing problem is the ingest-side twin of the sink-side one —
    :func:`land` the decoded/derived columns as parquet once, then
    drop back to columnar scans.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    # import here: operators package imports sources in places; keep the
    # module graph acyclic at import time
    from ..operators.multimodal import PNG_MAGIC

    head8 = F.substring(F.col("content"), 1, 8)
    media_type = (
        F.when(head8 == F.lit(PNG_MAGIC), F.lit("png"))
        .when(
            (F.substring(F.col("content"), 1, 4) == F.lit(b"RIFF"))
            & (F.substring(F.col("content"), 9, 4) == F.lit(b"WAVE")),
            F.lit("wav"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        media_type.alias("media_type"),
        F.col("content").alias("payload"),
        F.col("path"),
        F.col("length"),
        F.col("modificationTime").alias("mod_time"),
    )

"""BM25 full-text retrieval over the corpus — the inverted-index probe
shape, Spark-first: a persisted postings table partitioned by a term
bucket, probed with a handful of broadcast query terms, scored with the
standard BM25 saturation formula, top-k by TakeOrdered.

Reference analog: none (north-star extension, BASELINE.json); this is
the lexical retrieval counterpart of :mod:`operators.similarity`'s ANN
probes, and deliberately mirrors their build-then-probe discipline
(similarity.py build_lsh_index/lsh_probe).

Scale shape:

- **Build (pay once, at ingest).**  ``bm25_build`` shuffles the corpus
  once into (term, doc, tf) postings plus per-doc lengths, and lands
  the postings parquet-partitioned by ``term_bucket =
  pmod(xxhash64(term), n_buckets)`` — the same trick as the ANN
  indexes: a probe's terms map to a handful of bucket literals, so the
  scan PRUNES to matching directories at planning time instead of
  reading the index.  Term document-frequencies live in a separate
  small ``termstats/`` table (normalized, NOT denormalized onto the
  postings rows) precisely so the index can be grown incrementally.
- **Update (per new-document batch).**  ``bm25_update`` APPENDS the
  batch's postings into the same bucket layout (no rewrite of existing
  postings — the write only adds files under the touched bucket dirs),
  merges term stats with one small aggregate, and folds the corpus
  stats incrementally.  Cost ∝ batch size; history is never re-read.
  Append-only id contract (re-ingesting an existing doc id would
  double its postings) — run the stream through dedup-at-ingest first,
  which is exactly what streaming/dedup_ingest.py exists for.  The
  accreting small files are the same operational problem every
  append-mode sink here has; operators/maintenance.compact_parquet
  bounds them.
- **Probe (per query).**  Query terms are a tiny in-plan literal list:
  the postings filter is `term IN (...)` + the bucket predicate
  (term → bucket is STORED in termstats at build, so no per-probe
  hash job runs); matched postings (bounded by the query's document
  frequency, not the corpus) carry their doc length inline
  (denormalized at build — a probe must never join a corpus-sized
  doc-length table), IDF per term folds driver-side into a literal
  map (no join in the probe plan at all), score as one codegen'd
  expression, and reduce via groupBy(doc) + top-k
  (TakeOrderedAndProject).  Corpus-wide statistics (N, avgdl) are
  read from ``stats/`` — never recomputed.
- IDF uses the Robertson-Sparck-Jones smooth form
  ln(1 + (N - df + 0.5)/(df + 0.5)), non-negative by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.xxh64 import pmod, xxhash64_py
from ..localframe import local_frame
from .dedup import tokens_col

N_TERM_BUCKETS = 64

# termstats layout is fixed (only postings' id type varies per corpus);
# read-backs pass it explicitly so a bare directory — a partitionBy
# write of ZERO rows emits only _SUCCESS, no files to infer from —
# still reads as a valid empty table instead of an AnalysisException
TERMSTATS_SCHEMA = "term string, df_t bigint, term_bucket int"


def tokenize_py(text: str) -> list[str]:
    """Python twin of :func:`dedup.tokens_col` (``split(text, ' ')``):
    single-space split, empty tokens kept.  Probe and index MUST share
    one tokenization — Python's bare ``str.split()`` (any whitespace,
    drops empties) silently diverges on tabs/newlines/double spaces, so
    every query-side tokenization routes through this helper."""
    return text.split(" ")


def _postings(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(term, id, tf, dl, term_bucket) term frequencies — explode +
    count, one shuffle.  The document length is DENORMALIZED onto every
    posting (it is static per doc) so a probe never touches a
    corpus-sized doc-length table: probe cost stays bounded by the
    query's document frequency."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.size(tokens_col(text_col)).alias("dl"),
            F.explode(tokens_col(text_col)).alias("term"),
        )
        .groupBy("term", "id", "dl")
        .agg(F.count("*").alias("tf"))
        .withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
        )
    )


def _doclen(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), F.size(tokens_col(text_col)).alias("dl")
    )


def _write_stats(
    spark: SparkSession, index_path: str, n_docs: float, total_len: float,
    n_buckets: int,
) -> dict[str, float]:
    stats = {
        "n_docs": float(n_docs),
        "total_len": float(total_len),
        "n_buckets": float(n_buckets),
    }
    local_frame(
        spark,
        [tuple(stats.values())],
        "n_docs double, total_len double, n_buckets double",
    ).repartition(1).write.mode("overwrite").parquet(f"{index_path}/stats")
    return stats


def _swap_in(
    df: DataFrame, final_dir: str, partition_by: str | None = None
) -> None:
    """Rewrite an index table via tmp + rename (same discipline as
    operators/maintenance.compact_parquet) so a reader never sees a
    half-written table and the input can be derived from the old one.

    ``partition_by`` writes the table hive-partitioned with matching
    write parallelism — termstats is VOCAB-sized (hundreds of millions
    of distinct terms at a web-scale corpus), so the unpartitioned
    single-task rewrite this started as is a single-writer cliff there;
    truly small tables (stats) keep the one-file layout.

    All metadata steps go through the Hadoop FileSystem resolved from
    the path's scheme (fsutil.py, round 8) — the swap works against
    ``file://`` / ``hdfs://`` index locations, with the object-store
    non-atomicity warning compact_parquet gives (rename there is
    copy+delete; prefer the versioned-table CAS manifest flip)."""
    from .. import fsutil

    spark = df.sparkSession
    tmp = fsutil.sibling(final_dir, ".__tmp__")
    old = fsutil.sibling(final_dir, ".__old__")
    fsutil.warn_if_non_atomic_rename(final_dir, "_swap_in")
    # crash recovery: dying between the two renames below leaves the
    # table absent with its previous state parked at old — restore it
    # BEFORE cleanup, or a caller with a created-if-absent bootstrap
    # path (embedproj.update_moments) would silently restart from
    # nothing instead of folding into the preserved history.  LOUD:
    # for a multi-dataset index (bm25_update's termstats) the restored
    # state may lag sibling datasets appended before the crash — the
    # operator can't tell from here, so the recovery itself must be
    # visible rather than silently serving possibly-stale stats.
    if not fsutil.exists(spark, final_dir) and fsutil.exists(spark, old):
        import logging

        logging.getLogger(__name__).warning(
            "restoring %s from its crash-parked .__old__ snapshot; if "
            "sibling datasets were appended in the interrupted update, "
            "re-apply that batch or rebuild the index",
            final_dir,
        )
        fsutil.rename(spark, old, final_dir)
    fsutil.delete(spark, tmp)
    fsutil.delete(spark, old)
    if partition_by is None:
        df.repartition(1).write.parquet(tmp)
    else:
        df.repartition(partition_by).write.partitionBy(
            partition_by
        ).parquet(tmp)
    if fsutil.exists(spark, final_dir):
        fsutil.rename(spark, final_dir, old)
    try:
        fsutil.rename(spark, tmp, final_dir)
    except Exception:
        # degrade to "nothing happened", never "the table vanished"
        if fsutil.exists(spark, old):
            fsutil.rename(spark, old, final_dir)
        raise
    fsutil.delete(spark, old)


def bm25_build(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    n_buckets: int = N_TERM_BUCKETS,
) -> dict[str, float]:
    """Build and persist the BM25 index under ``index_path``:
    ``postings/`` (term, id, tf) partitioned by term_bucket,
    ``termstats/`` (term, term_bucket, df_t), ``doclen/`` (id, dl),
    ``stats/`` one row (n_docs, total_len, n_buckets).  Returns the
    stats dict."""
    spark = df.sparkSession
    post = _postings(df, id_col, text_col, n_buckets)
    (
        post.repartition(n_buckets, "term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{index_path}/postings")
    )
    # termstats derives from the WRITTEN postings (a 2-column columnar
    # scan), not from re-running `post` — the unpersisted plan would
    # re-tokenize + re-shuffle the whole corpus a second time, the
    # expensive map at scale.  df_t = rows per term, since postings is
    # one row per (term, id).  Schema is passed explicitly: a corpus
    # whose every document tokenizes empty yields ZERO postings rows,
    # and a bare partitioned dir can't self-describe.
    _swap_in(
        spark.read.schema(post.schema).parquet(f"{index_path}/postings")
        .groupBy("term", "term_bucket")
        .agg(F.count("*").alias("df_t")),
        f"{index_path}/termstats",
        partition_by="term_bucket",
    )
    # doclen keeps the input's partitioning: it is corpus-sized (one row
    # per document), so funnelling it through repartition(1) would push
    # every row through ONE task — a single-writer cliff at 100 TB.
    # This pass is map-only (size(tokens), no explode/shuffle).
    _doclen(df, id_col, text_col).write.mode("overwrite").parquet(
        f"{index_path}/doclen"
    )
    # corpus stats fold from the written doclen (count + sum over a
    # 2-column table) instead of a THIRD tokenize pass over the corpus
    n_docs, total_len = (
        spark.read.parquet(f"{index_path}/doclen")
        .select(F.count("*"), F.coalesce(F.sum("dl"), F.lit(0)))
        .first()
    )
    return _write_stats(spark, index_path, n_docs, total_len, n_buckets)


def bm25_update(
    df_new: DataFrame, id_col: str, text_col: str, index_path: str
) -> dict[str, float]:
    """Grow the index with a batch of NEW documents (append-only ids —
    see module docstring): postings and doc lengths append under the
    existing layout, term stats merge with one aggregate over
    (old stats ∪ batch counts), corpus stats fold incrementally.
    Returns the updated stats dict."""
    from .. import fsutil

    spark = df_new.sparkSession
    if not fsutil.exists(spark, index_path):
        raise FileNotFoundError(index_path)
    st = spark.read.parquet(f"{index_path}/stats").first()
    n_buckets = int(st.n_buckets)

    # the batch postings feed TWO consumers (the append write and the
    # term-stat merge) and the doclen frame feeds two more (the append
    # and the corpus-stat fold) — persist each so the batch is tokenized
    # once per shape, not once per consumer
    post = _postings(df_new, id_col, text_col, n_buckets).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dl = _doclen(df_new, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        (
            post.repartition("term_bucket")
            .write.mode("append")
            .partitionBy("term_bucket")
            .parquet(f"{index_path}/postings")
        )
        dl.write.mode("append").parquet(f"{index_path}/doclen")
        old_stats = spark.read.schema(TERMSTATS_SCHEMA).parquet(
            f"{index_path}/termstats"
        )
        batch_stats = post.groupBy("term", "term_bucket").agg(
            F.count("*").alias("df_t")
        )
        merged = (
            old_stats.unionByName(batch_stats)
            # term_bucket is functionally determined by term (same hash,
            # same n_buckets), so grouping by both merges correctly
            .groupBy("term", "term_bucket")
            .agg(F.sum("df_t").alias("df_t"))
            # the union reads the table being replaced: materialize
            # before the swap unlinks the input files
            .localCheckpoint(eager=True)
        )
        _swap_in(merged, f"{index_path}/termstats", partition_by="term_bucket")

        add_docs, add_len = dl.select(
            F.count("*"), F.coalesce(F.sum("dl"), F.lit(0))
        ).first()
    finally:
        post.unpersist()
        dl.unpersist()
    return _write_stats(
        spark,
        index_path,
        st.n_docs + add_docs,
        st.total_len + add_len,
        n_buckets,
    )


def bm25_search(
    spark: SparkSession,
    index_path: str,
    query: str,
    top_n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score) of the ``top_n`` BM25-scoring documents for the
    ``query`` (tokenized exactly like the index — :func:`tokenize_py`)
    against a :func:`bm25_build` index.  Repeated query terms weight
    once (standard bag-of-terms probe).

    Probe cost: ONE tiny driver lookup into ``termstats/`` (term →
    df_t, term_bucket are stored at build, so no hash job runs per
    probe) + the pruned postings scan.  IDF per term is folded
    driver-side into a literal map, so the main job has no join at all:
    scan matched postings → codegen'd score expression → groupBy(id) →
    TakeOrdered."""
    from .. import fsutil

    if not fsutil.exists(spark, index_path):
        raise FileNotFoundError(index_path)
    st = spark.read.parquet(f"{index_path}/stats").first()
    if st.n_docs == 0:
        # an index built from an empty frame has no postings files, so
        # there is nothing to even type an empty result from — loud
        # error over an opaque downstream AnalysisException
        raise ValueError(
            f"BM25 index at {index_path} is empty (n_docs=0); "
            "grow it with bm25_update before probing"
        )
    n_docs, avgdl = st.n_docs, st.total_len / st.n_docs
    n_buckets = int(st.n_buckets)
    terms = sorted(set(tokenize_py(query)) - {""})
    if not terms:
        raise ValueError("empty query")
    # term → (df_t, bucket) from termstats.  The table is hive-
    # partitioned by term_bucket (r7) and the probe computes its terms'
    # buckets DRIVER-SIDE with the pure-Python xxhash64 twin (pinned
    # bit-identical to F.xxhash64) — so the scan prunes to ≤ |terms|
    # bucket directories at planning time with no per-probe hash job,
    # instead of reading a vocab-sized table per query.  Terms absent
    # from the index have no postings and drop out here.
    probe_buckets = sorted(
        {pmod(xxhash64_py(t), n_buckets) for t in terms}
    )
    hits = (
        spark.read.schema(TERMSTATS_SCHEMA)
        .parquet(f"{index_path}/termstats")
        .filter(F.col("term_bucket").isin(probe_buckets))
        .filter(F.col("term").isin(terms))
        .collect()
    )
    if not hits:
        # empty result with the SAME schema as the hit path: the id
        # type comes from the stored postings (bm25_build accepts any
        # id column type), not a hardcoded long — a caller unioning
        # hit and miss probes must not see a type flip
        return (
            spark.read.parquet(f"{index_path}/postings")
            .select("id", F.lit(0.0).alias("score"))
            .filter(F.lit(False))
        )
    buckets = sorted({int(r.term_bucket) for r in hits})
    idf_py = {
        r.term: math.log(1 + (n_docs - r.df_t + 0.5) / (r.df_t + 0.5))
        for r in hits
    }
    idf_map = F.create_map(
        *[F.lit(x) for kv in idf_py.items() for x in kv]
    )
    post = (
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(sorted(idf_py)))
    )
    tf_sat = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    return (
        post.select(
            "id", (idf_map[F.col("term")] * tf_sat).alias("partial")
        )
        .groupBy("id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
        .orderBy(F.desc("score"), "id")
        .limit(top_n)
    )


def bm25_score_py(
    docs: dict, query: str, k1: float = 1.2, b: float = 0.75
) -> dict:
    """Pure-Python reference scorer for tests: ``docs`` is {id: text}."""
    toks = {i: tokenize_py(t) for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for i, t in toks.items():
        score = 0.0
        for term in sorted(set(tokenize_py(query)) - {""}):
            tf = t.count(term)
            if tf == 0:
                continue
            df_t = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
            score += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if score > 0:
            out[i] = round(score, 6)
    return out

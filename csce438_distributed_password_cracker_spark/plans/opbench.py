"""Production-operator benchmark battery (round 5).

The correctness gate's 50 queries cover every operator's SEMANTICS, but
several of the heaviest production operators run their full-scale shape
only in tests/smoke — so a performance regression in one of them would
be invisible round-over-round.  This module gives each a timed entry
that bench.py runs with the same interleaved min/median protocol as the
query corpus and emits under ``operators`` / ``operators_median`` in
the bench JSON.

Entries (each a ``(spark, sf_dir) -> None`` callable that EXECUTES the
operator end-to-end — materialized through the noop sink or, for index
builds, a real disk write with fresh-per-run teardown):

- ``paragraph_dedup`` — the corpus-wide first-occurrence election +
  heavy-hitter-bypassed verdict join + per-doc reassembly over the full
  documents table (operators/paradedup.py).
- ``semantic_dedup`` — SemDeDup end-to-end: distributed Lloyd (2
  sweeps), cluster-local GEMM pairing, connected components, verdicts
  (operators/semdedup.py).
- ``shuffle_rows`` — the deterministic global shuffle: one range
  exchange on xxhash64(key, seed) over documents
  (operators/split.py:shuffle_rows).
- ``pack_sequences`` — chunk the documents into 128-token windows and
  next-fit pack them into 512-token sequences
  (operators/chunking.py + operators/packing.py).
- ``bm25_build`` — build the bucket-partitioned BM25 index over the
  documents table on disk (operators/search.py), torn down per run so
  every pass pays the full build.
- ``substring_dedup`` — the exact-substring sweep: window fingerprints,
  corpus-wide election, interval merge, map-side excision
  (operators/substring.py).
- ``lm_score`` — bigram-LM quality filtering end-to-end: train the
  model on the corpus, score every doc against it
  (operators/lmscore.py), production xxhash-free path (the operator
  has no portable/production split — tokens join as strings).
- ``clf_score`` — hashed linear classification over every doc at the
  production feature width (2^18), xxhash64 mode
  (operators/classifier.py).
- ``dsir_select`` — DSIR end-to-end at the production feature width:
  both corpus count models, the log-ratio weight table, scoring, and
  an exact top-500 Gumbel resample (operators/dsir.py).
- ``bpe_encode`` — BPE tokenization end-to-end: word counts (one
  shuffle), driver-side merge learning, and the map-only corpus encode
  (operators/bpe.py).
- ``export_shards`` — the validated sharded export end-to-end: shard
  assignment, pre-write stats, the parquet write, integrity
  verification and manifest publish (operators/export.py), torn down
  per run so every pass pays the full cycle.
- ``langid_classify`` — Cavnar-Trenkle language ID end-to-end: train
  the per-language rank profiles, classify the full corpus map-side
  (operators/langid.py).
- ``paradedup_ingest_build`` / ``substring_ingest_build`` — the
  streaming ingest twins' fingerprint-index build over 80% of the
  corpus, fresh per run with teardown (streaming/paradedup_ingest.py,
  streaming/substring_ingest.py).
- ``paradedup_ingest_probe`` / ``substring_ingest_probe`` — ONE 20%
  micro-batch through probe/verdict/admit against a PERSISTENT
  content-tagged index (built on first use, reused across passes and
  rounds like the bm25 gate index) — the steady-state per-batch cost a
  production stream actually pays.  Round 7 split: the former single
  ``*_ingest`` entries were ~90% one-off build, hiding per-batch probe
  regressions.
- ``grouped_heavy_hitters`` — per-source Misra-Gries heavy hitters
  over the exploded token stream, candidates a DataFrame end-to-end
  (operators/freq.py:grouped_heavy_hitters), persisted summaries
  released per run via the handle out-param.
- ``fit_pca`` — distributed PCA fit on the embeddings table: one Arrow
  sweep to d×d sufficient statistics, depth-2 treeReduce, driver eigh
  (operators/embedproj.py:fit_pca).
- ``pca_project`` — the map-only projection kernel over every
  embedding row against a once-per-process cached model
  (operators/embedproj.py:project).
"""

from __future__ import annotations

import shutil
import uuid
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def bench_paragraph_dedup(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import paradedup

    docs = paradedup.carve_pseudo_paragraphs(
        _docs(spark, sf_dir), "doc_id", "text", n=8, sep="|"
    )
    _noop(paradedup.paragraph_dedup(docs, sep="|"))


def bench_semantic_dedup(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    _noop(
        semdedup.semantic_dedup(
            emb, threshold=0.4, n_centroids=16, refine_iters=2
        )
    )


def bench_shuffle_rows(spark: SparkSession, sf_dir: str) -> None:
    from ..operators.split import shuffle_rows

    _noop(shuffle_rows(_docs(spark, sf_dir), "doc_id"))


def bench_pack_sequences(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import chunking, packing

    chunks = chunking.chunk_documents(
        _docs(spark, sf_dir), "doc_id", "text", chunk_tokens=128, overlap=16
    )
    _noop(
        packing.pack_sequences(
            chunks, "chunk_id", "n_tokens", budget=512, n_groups=32
        )
    )


def bench_bm25_build(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import search
    from .pipeline_queries import warehouse_root_tag

    wh, tag = warehouse_root_tag(sf_dir)
    path = wh / f"opbench_bm25_{tag}_{uuid.uuid4().hex[:8]}"
    try:
        search.bm25_build(
            _docs(spark, sf_dir), "doc_id", "text", str(path), n_buckets=16
        )
    finally:
        shutil.rmtree(Path(path), ignore_errors=True)


def bench_substring_dedup(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import substring

    _noop(
        substring.excise_duplicate_spans(
            _docs(spark, sf_dir), "doc_id", "text", k=8
        )
    )


def bench_lm_score(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import lmscore

    docs = _docs(spark, sf_dir)
    model = lmscore.train_bigram_lm(docs)
    _noop(lmscore.score_documents(docs, model, vocab_size=4096))


def bench_clf_score(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import classifier

    docs = _docs(spark, sf_dir)
    w = classifier.pseudo_weights(spark, classifier.DEFAULT_N_FEATURES)
    _noop(classifier.score_linear(docs, w))


def bench_bpe_encode(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import bpe

    docs = _docs(spark, sf_dir)
    merges = bpe.train_bpe(bpe.word_counts(docs), n_merges=200)
    _noop(bpe.encode(docs, merges))


def bench_langid_classify(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import langid

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    prof = langid.train_char_ngram_profiles(docs)
    _noop(langid.classify_char_ngram(docs, prof))


def bench_export_shards(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import export as export_ops
    from .pipeline_queries import warehouse_root_tag

    wh, tag = warehouse_root_tag(sf_dir)
    path = wh / f"opbench_export_{tag}_{uuid.uuid4().hex[:8]}"
    try:
        export_ops.export_shards(
            _docs(spark, sf_dir), str(path), num_shards=16
        )
    finally:
        shutil.rmtree(Path(path), ignore_errors=True)


def bench_dsir_select(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import dsir

    docs = _docs(spark, sf_dir)
    w = dsir.importance_weights(
        dsir.feature_counts(docs),
        dsir.feature_counts(docs.where("lang = 'en'")),
    )
    _noop(dsir.dsir_select(docs, w, k=500))


def bench_paradedup_ingest_build(spark: SparkSession, sf_dir: str) -> None:
    """The paragraph-fingerprint index build over 80% of the corpus —
    the one-off cost a deployment pays once per corpus version.  Fresh
    path per run with teardown so every pass times the full build."""
    from ..operators.paradedup import carve_pseudo_paragraphs
    from ..streaming import paradedup_ingest as pdi
    from .pipeline_queries import warehouse_root_tag

    wh, tag = warehouse_root_tag(sf_dir)
    path = wh / f"opbench_paraidx_{tag}_{uuid.uuid4().hex[:8]}"
    docs = carve_pseudo_paragraphs(_docs(spark, sf_dir), sep="|")
    try:
        pdi.build_para_index(
            docs.where("doc_id % 5 != 0"), str(path), sep="|"
        )
    finally:
        shutil.rmtree(Path(path), ignore_errors=True)


def _cached_content_tag(spark: SparkSession, sf_dir: str) -> str:
    """Freshness tag for the persistent probe indexes — round 9: the
    file-listing fingerprint (fsutil.listing_tag via
    pipeline_queries._source_tag), O(#files) metadata and zero Spark
    jobs, so it needs no cache to stay out of the timed probe numbers.
    A regenerated documents table changes mtimes and re-tags, keeping
    the invalidate-on-rewrite contract (NOT exact content: a same-
    names/sizes/mtime-ms in-place rewrite keeps the tag — set
    SPARK_GRAFT_FORCE_REBUILD=<new value> or delete the opbench_*
    index dirs to force a rebuild; see fsutil.listing_tag)."""
    from .pipeline_queries import _source_tag

    return str(_source_tag(spark, sf_dir, "documents"))


def _para_probe_index(spark: SparkSession, sf_dir: str) -> str:
    """Persistent content-tagged paragraph index for the probe entry —
    built on first use, reused afterwards (bm25 gate-index discipline:
    a regenerated documents table invalidates by path)."""
    from ..operators.paradedup import carve_pseudo_paragraphs
    from ..streaming import ingest_common
    from ..streaming import paradedup_ingest as pdi
    from .pipeline_queries import warehouse_root_tag

    docs = _docs(spark, sf_dir)
    wh, tag = warehouse_root_tag(sf_dir)
    path = str(
        wh / f"opbench_paraidx_probe_{tag}_{_cached_content_tag(spark, sf_dir)}"
    )
    if not ingest_common.index_exists(path, "paras"):
        pdi.build_para_index(
            carve_pseudo_paragraphs(docs, sep="|").where(
                "doc_id % 5 != 0"
            ),
            path,
            sep="|",
        )
    return path


def bench_paradedup_ingest_probe(spark: SparkSession, sf_dir: str) -> None:
    """ONE 20% micro-batch through probe + verdict + reassembly
    against the persistent index.  The FIRST-ever pass also ADMITS the
    batch's novel fingerprints (index build + admit write); every later
    pass re-ingests the same batch, which the index now fully contains,
    so min/median report the ALL-DUPLICATE replay path — probe + verdict
    + excision with an empty admit.  That is the floor every batch pays
    (and the whole cost of a replayed one); a mostly-novel batch adds
    the admit-append on top, which this entry deliberately excludes to
    stay comparable round-over-round."""
    from ..operators.paradedup import carve_pseudo_paragraphs
    from ..streaming import paradedup_ingest as pdi

    path = _para_probe_index(spark, sf_dir)
    batch = carve_pseudo_paragraphs(_docs(spark, sf_dir), sep="|").where(
        "doc_id % 5 = 0"
    )
    _noop(pdi.ingest_paradedup_batch(spark, batch, path, sep="|"))


def bench_substring_ingest_build(spark: SparkSession, sf_dir: str) -> None:
    """The substring window-fingerprint index build over 80% of the
    corpus, fresh per run with teardown."""
    from ..streaming import substring_ingest as ssi
    from .pipeline_queries import warehouse_root_tag

    wh, tag = warehouse_root_tag(sf_dir)
    path = wh / f"opbench_substridx_{tag}_{uuid.uuid4().hex[:8]}"
    try:
        ssi.build_substring_index(
            _docs(spark, sf_dir).where("doc_id % 5 != 0"), str(path)
        )
    finally:
        shutil.rmtree(Path(path), ignore_errors=True)


def _substr_probe_index(spark: SparkSession, sf_dir: str) -> str:
    from ..streaming import ingest_common
    from ..streaming import substring_ingest as ssi
    from .pipeline_queries import warehouse_root_tag

    docs = _docs(spark, sf_dir)
    wh, tag = warehouse_root_tag(sf_dir)
    path = str(
        wh / f"opbench_substridx_probe_{tag}_{_cached_content_tag(spark, sf_dir)}"
    )
    if not ingest_common.index_exists(path, "wins"):
        ssi.build_substring_index(docs.where("doc_id % 5 != 0"), path)
    return path


def bench_substring_ingest_probe(spark: SparkSession, sf_dir: str) -> None:
    """ONE 20% micro-batch through probe + span merge + excision
    against the persistent index — the all-duplicate replay floor after
    pass 1 admits the batch (same accounting as the paradedup probe
    entry's docstring)."""
    from ..streaming import substring_ingest as ssi

    path = _substr_probe_index(spark, sf_dir)
    _noop(
        ssi.ingest_substring_batch(
            spark, _docs(spark, sf_dir).where("doc_id % 5 = 0"), path
        )
    )


def _bm25_probe_index(spark: SparkSession, sf_dir: str) -> str:
    from ..operators import search
    from ..streaming import ingest_common
    from .pipeline_queries import warehouse_root_tag

    docs = _docs(spark, sf_dir)
    wh, tag = warehouse_root_tag(sf_dir)
    path = str(
        wh / f"opbench_bm25idx_probe_{tag}_{_cached_content_tag(spark, sf_dir)}"
    )
    if not ingest_common.index_exists(path, "doclen"):
        search.bm25_build(
            docs.where("doc_id % 5 != 0"), "doc_id", "text", path
        )
    return path


def bench_bm25_ingest_probe(spark: SparkSession, sf_dir: str) -> None:
    """ONE 20% micro-batch through the streaming index-maintenance
    twin against the persistent index.  First-ever pass ADMITS the
    batch (novelty filter + full bm25_update); every later pass finds
    the ids already indexed and times the steady novelty-check floor —
    the anti-join against the corpus-sized doclen that EVERY batch
    (novel or replayed) pays before touching the index."""
    from ..streaming import search_ingest as bsi

    path = _bm25_probe_index(spark, sf_dir)
    _noop(
        bsi.bm25_ingest_batch(
            spark, _docs(spark, sf_dir).where("doc_id % 5 = 0"), path
        )
    )


def bench_grouped_heavy_hitters(spark: SparkSession, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from ..operators.freq import grouped_heavy_hitters

    words = (
        _docs(spark, sf_dir)
        .select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .where(F.col("word") != "")
    )
    handle: list = []
    try:
        _noop(
            grouped_heavy_hitters(
                words, "source", "word", den=30, handle=handle
            )
        )
    finally:
        for frame in handle:
            frame.unpersist()


def bench_fit_pca(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import embedproj

    embedproj.fit_pca(
        load_table(spark, sf_dir, "embeddings"), "embedding", k=16
    )


_PCA_MODEL_CACHE: dict[str, object] = {}


def bench_pca_project(spark: SparkSession, sf_dir: str) -> None:
    from ..operators import embedproj

    emb = load_table(spark, sf_dir, "embeddings")
    model = _PCA_MODEL_CACHE.get(sf_dir)
    if model is None:
        model = embedproj.fit_pca(emb, "embedding", k=16)
        _PCA_MODEL_CACHE[sf_dir] = model
    _noop(embedproj.project(emb, model, "embedding"))


OPERATOR_BENCH: dict[str, Callable[[SparkSession, str], None]] = {
    "paragraph_dedup": bench_paragraph_dedup,
    "semantic_dedup": bench_semantic_dedup,
    "shuffle_rows": bench_shuffle_rows,
    "pack_sequences": bench_pack_sequences,
    "bm25_build": bench_bm25_build,
    "substring_dedup": bench_substring_dedup,
    "lm_score": bench_lm_score,
    "clf_score": bench_clf_score,
    "dsir_select": bench_dsir_select,
    "bpe_encode": bench_bpe_encode,
    "export_shards": bench_export_shards,
    "langid_classify": bench_langid_classify,
    "paradedup_ingest_build": bench_paradedup_ingest_build,
    "paradedup_ingest_probe": bench_paradedup_ingest_probe,
    "substring_ingest_build": bench_substring_ingest_build,
    "substring_ingest_probe": bench_substring_ingest_probe,
    "bm25_ingest_probe": bench_bm25_ingest_probe,
    "grouped_heavy_hitters": bench_grouped_heavy_hitters,
    "fit_pca": bench_fit_pca,
    "pca_project": bench_pca_project,
}

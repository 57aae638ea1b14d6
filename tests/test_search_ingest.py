"""Streaming BM25 index maintenance (streaming/search_ingest.py):
bootstrap-from-first-batch, incremental growth converging to the full
rebuild, replay idempotence via the doclen anti-join, the empty-batch
guard, and the live stream with in-writer compaction."""

from __future__ import annotations

import json

from csce438_distributed_password_cracker_spark.operators import search
from csce438_distributed_password_cracker_spark.streaming import (
    search_ingest as bsi,
)

DOCS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "the quick red fox",
    3: "lazy dog sleeps all day the dog snores",
    4: "completely unrelated text about spark engines",
    5: "quick quick quick fox fox dog",
}


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, DOCS[i]) for i in ids], "doc_id LONG, text STRING"
    )


def _scores(spark, path, query):
    return {
        r.id: round(r.score, 6)
        for r in search.bm25_search(spark, path, query, top_n=10).collect()
    }


def test_batches_converge_to_full_rebuild(spark, tmp_path):
    inc = str(tmp_path / "inc")
    log0 = bsi.bm25_ingest_batch(
        spark, _docs(spark, [1, 2]), inc, batch_id=0, n_buckets=8
    ).first()
    assert (log0.n_new, log0.n_skipped, log0.n_docs) == (2, 0, 2.0)
    log1 = bsi.bm25_ingest_batch(
        spark, _docs(spark, [3, 4, 5]), inc, batch_id=1
    ).first()
    assert (log1.n_new, log1.n_docs) == (3, 5.0)

    full = str(tmp_path / "full")
    search.bm25_build(
        _docs(spark, [1, 2, 3, 4, 5]), "doc_id", "text", full, n_buckets=8
    )
    for q in ["quick fox", "lazy dog", "spark", "the"]:
        assert _scores(spark, inc, q) == _scores(spark, full, q), q
    # termstats content identical (partition layout too)
    a = {(r.term, r.df_t) for r in
         spark.read.parquet(f"{inc}/termstats").collect()}
    b = {(r.term, r.df_t) for r in
         spark.read.parquet(f"{full}/termstats").collect()}
    assert a == b


def test_replay_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "idx")
    bsi.bm25_ingest_batch(spark, _docs(spark, [1, 2, 3]), idx, batch_id=0,
                          n_buckets=8)
    before = _scores(spark, idx, "quick dog")
    n_post = spark.read.parquet(f"{idx}/postings").count()
    # the SAME batch re-delivered (foreachBatch retry / restart replay)
    log = bsi.bm25_ingest_batch(
        spark, _docs(spark, [1, 2, 3]), idx, batch_id=0
    ).first()
    assert (log.n_new, log.n_skipped) == (0, 3)
    assert spark.read.parquet(f"{idx}/postings").count() == n_post
    assert _scores(spark, idx, "quick dog") == before
    # a mixed batch applies only its novel ids
    log2 = bsi.bm25_ingest_batch(
        spark, _docs(spark, [2, 3, 4]), idx, batch_id=1
    ).first()
    assert (log2.n_new, log2.n_skipped, log2.n_docs) == (1, 2, 4.0)


def test_empty_first_batch_does_not_bootstrap(spark, tmp_path):
    idx = str(tmp_path / "idx")
    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    log = bsi.bm25_ingest_batch(spark, empty, idx, batch_id=0).first()
    assert (log.n_new, log.n_docs) == (0, 0.0)
    # nothing half-built: the next real batch bootstraps cleanly
    log1 = bsi.bm25_ingest_batch(
        spark, _docs(spark, [1]), idx, batch_id=1, n_buckets=8
    ).first()
    assert (log1.n_new, log1.n_docs) == (1, 1.0)
    assert set(_scores(spark, idx, "quick")) == {1}


def test_live_stream_with_compaction(spark, tmp_path):
    import os

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for i in (1, 2):
            f.write(json.dumps({"doc_id": i, "text": DOCS[i]}) + "\n")
    with open(src / "b1.json", "w") as f:
        for i in (3, 4, 5):
            f.write(json.dumps({"doc_id": i, "text": DOCS[i]}) + "\n")
    now = os.stat(src / "b1.json").st_mtime
    os.utime(src / "b0.json", (now - 10, now - 10))

    from tests.conftest import fresh_sink

    sink = fresh_sink(spark, "bm25_live_sink")
    idx = str(tmp_path / "index")
    q = bsi.start_bm25_ingest(
        spark,
        str(src),
        str(tmp_path / "ckpt"),
        idx,
        sink_table=sink,
        n_buckets=8,
        compact_every=1,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(120)

    spark.catalog.refreshTable(sink)
    log = {r.batch_id: (r.n_new, r.n_docs)
           for r in spark.table(sink).collect()}
    assert log[0] == (2, 2.0) and log[1] == (3, 5.0)

    # post-compaction index answers identically to a full rebuild
    full = str(tmp_path / "full")
    search.bm25_build(
        _docs(spark, [1, 2, 3, 4, 5]), "doc_id", "text", full, n_buckets=8
    )
    for query in ["quick fox", "lazy dog"]:
        assert _scores(spark, idx, query) == _scores(spark, full, query)


def test_stream_restart_continues_from_checkpoint(spark, tmp_path):
    """availableNow drain, then NEW files + a second start on the SAME
    checkpoint: only the new batch is processed (no double application
    of batch 0), and the index converges to the full rebuild."""
    import os

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for i in (1, 2):
            f.write(json.dumps({"doc_id": i, "text": DOCS[i]}) + "\n")

    from tests.conftest import fresh_sink

    sink = fresh_sink(spark, "bm25_restart_sink")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    q = bsi.start_bm25_ingest(
        spark, str(src), ckpt, idx, sink_table=sink, n_buckets=8
    )
    assert q.awaitTermination(120)

    with open(src / "b1.json", "w") as f:
        for i in (3, 4, 5):
            f.write(json.dumps({"doc_id": i, "text": DOCS[i]}) + "\n")
    now = os.stat(src / "b1.json").st_mtime
    os.utime(src / "b0.json", (now - 10, now - 10))
    q2 = bsi.start_bm25_ingest(
        spark, str(src), ckpt, idx, sink_table=sink, n_buckets=8
    )
    assert q2.awaitTermination(120)

    spark.catalog.refreshTable(sink)
    rows = spark.table(sink).orderBy("batch_id").collect()
    # exactly two processed batches across both runs; nothing replayed
    assert [(r.n_new, r.n_skipped) for r in rows] == [(2, 0), (3, 0)]
    assert rows[-1].n_docs == 5.0

    full = str(tmp_path / "full")
    search.bm25_build(
        _docs(spark, [1, 2, 3, 4, 5]), "doc_id", "text", full, n_buckets=8
    )
    assert _scores(spark, idx, "quick fox") == _scores(spark, full, "quick fox")


def test_null_id_rows_are_never_admitted(spark, tmp_path):
    """A NULL id can't satisfy the append-only contract (the anti-join
    never matches NULL keys, so it would be 'fresh' on every replay) —
    such rows are screened out and surface as skipped."""
    idx = str(tmp_path / "idx")
    bsi.bm25_ingest_batch(spark, _docs(spark, [1, 2]), idx, batch_id=0,
                          n_buckets=8)
    withnull = spark.createDataFrame(
        [(3, DOCS[3]), (None, "ghost doc text")],
        "doc_id LONG, text STRING",
    )
    log = bsi.bm25_ingest_batch(spark, withnull, idx, batch_id=1).first()
    assert (log.n_new, log.n_skipped, log.n_docs) == (1, 1, 3.0)
    # replaying the same mixed batch is still a complete no-op
    log2 = bsi.bm25_ingest_batch(spark, withnull, idx, batch_id=1).first()
    assert (log2.n_new, log2.n_skipped, log2.n_docs) == (0, 2, 3.0)
    assert spark.read.parquet(f"{idx}/doclen").where(
        "id is null"
    ).count() == 0

"""Ingest-time paragraph dedup (streaming/paradedup_ingest.py): corpus
paragraphs excised from incoming batches, batch self-dedup, novel
fingerprints admitted, convergence to the batch sweep over the
concatenation, replay idempotence, and the end-to-end live stream."""

from __future__ import annotations

import json

from csce438_distributed_password_cracker_spark.operators.paradedup import (
    paragraph_dedup,
)
from csce438_distributed_password_cracker_spark.streaming import (
    paradedup_ingest as pdi,
)

FOOTER = "all rights reserved by the publisher"
P1 = "the quick brown fox jumps over the lazy dog"
P2 = "spark shuffles move data between executors"
P3 = "parquet files store columns with statistics"
P4 = "catalyst rewrites plans before tungsten runs them"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_ingest_excises_corpus_and_batch_dups_and_admits_novel(
    spark, tmp_path
):
    idx = str(tmp_path / "index")
    corpus = _docs(
        spark, [(1, f"{P1}\n\n{FOOTER}"), (2, f"{P2}\n\n{FOOTER}")]
    )
    pdi.build_para_index(corpus, idx)

    # batch: doc 10 repeats the corpus footer + a novel paragraph;
    # docs 11 and 12 share P4 (batch self-dup — lower (did,pos) wins)
    batch = _docs(
        spark,
        [
            (10, f"{P3}\n\n{FOOTER}"),
            (11, f"{P4}\n\n{P1}"),
            (12, P4),
        ],
    )
    out = {
        r["doc_id"]: (r["text_deduped"], r["n_paragraphs"], r["n_kept"])
        for r in pdi.ingest_paradedup_batch(spark, batch, idx).collect()
    }
    assert out[10] == (P3, 2, 1)  # footer excised (corpus winner)
    assert out[11] == (P4, 2, 1)  # keeps P4 (batch winner); P1 is corpus's
    assert out[12] == ("", 1, 0)  # P4 lost the batch election to doc 11

    # only the NOVEL fingerprints were admitted (P3, P4) — the index now
    # holds corpus winners + the two new ones
    paras = spark.read.parquet(f"{idx}/paras")
    assert paras.count() == 3 + 2  # P1, P2, FOOTER + P3, P4

    # a later batch sees the admitted state
    out2 = {
        r["doc_id"]: r["text_deduped"]
        for r in pdi.ingest_paradedup_batch(
            spark, _docs(spark, [(20, f"{P3}\n\n{P4}")]), idx
        ).collect()
    }
    assert out2[20] == ""


def test_first_batch_without_index_self_dedups(spark, tmp_path):
    idx = str(tmp_path / "index")  # never built: first-ever batch
    batch = _docs(spark, [(5, f"{P1}\n\n{P2}"), (6, P1)])
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in pdi.ingest_paradedup_batch(spark, batch, idx).collect()
    }
    assert out[5] == f"{P1}\n\n{P2}"
    assert out[6] == ""
    assert spark.read.parquet(f"{idx}/paras").count() == 2


def test_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replays a batch after a durable index append: the
    batch's own winners are already in the index and must NOT excise
    themselves (the stored (did, pos) match keeps them)."""
    idx = str(tmp_path / "index")
    batch = _docs(spark, [(7, f"{P1}\n\n{P2}")])
    first = pdi.ingest_paradedup_batch(spark, batch, idx).collect()
    replay = pdi.ingest_paradedup_batch(spark, batch, idx).collect()
    assert [tuple(r) for r in first] == [tuple(r) for r in replay]
    assert replay[0]["text_deduped"] == f"{P1}\n\n{P2}"
    # the replayed append added no duplicate fingerprint ROWS beyond the
    # originals (left_anti against seen)
    assert spark.read.parquet(f"{idx}/paras").count() == 2


def test_exempt_short_paragraphs_kept_and_never_indexed(spark, tmp_path):
    idx = str(tmp_path / "index")
    batch = _docs(
        spark, [(1, f"Intro\n\n{P1}"), (2, f"Intro\n\n{P2}")]
    )
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in pdi.ingest_paradedup_batch(
            spark, batch, idx, min_chars=10
        ).collect()
    }
    assert out[1] == f"Intro\n\n{P1}"
    assert out[2] == f"Intro\n\n{P2}"  # 'Intro' exempt: kept in BOTH
    ks = spark.read.parquet(f"{idx}/paras").count()
    assert ks == 2  # P1, P2 only — exempt rows never indexed


def test_stream_converges_to_batch_sweep(spark, tmp_path):
    """Kept-paragraph totals over corpus+batches equal one batch
    paragraph_dedup over the concatenation (which occurrence of a
    cross-batch dup wins differs only by arrival order — n_kept and the
    admitted fingerprint SET are order-invariant)."""
    idx = str(tmp_path / "index")
    corpus = _docs(spark, [(1, f"{P1}\n\n{FOOTER}")])
    pdi.build_para_index(corpus, idx)
    b1 = _docs(spark, [(10, f"{P2}\n\n{FOOTER}")])
    b2 = _docs(spark, [(20, f"{P2}\n\n{P3}\n\n{FOOTER}")])
    kept_stream = 0
    for b in (b1, b2):
        kept_stream += sum(
            r["n_kept"]
            for r in pdi.ingest_paradedup_batch(spark, b, idx).collect()
        )
    concat = corpus.unionByName(b1).unionByName(b2)
    batch_out = paragraph_dedup(concat).collect()
    kept_batch = sum(
        r["n_kept"] for r in batch_out if r["doc_id"] != 1
    )
    assert kept_stream == kept_batch
    # admitted fingerprint count == distinct paragraphs corpus-wide
    assert spark.read.parquet(f"{idx}/paras").count() == 4


def test_live_stream_end_to_end_with_compaction(spark, tmp_path):
    """Two micro-batches through a real file-source stream: batch 2's
    repeat of batch 1's paragraph is excised (index = cross-batch
    state), the sink holds every doc once, and the compaction cadence
    keeps probes working."""
    import os

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": f"{P1}\n\n{P2}"}) + "\n")
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": f"{P1}\n\n{P3}"}) + "\n")
    # FileStreamSource orders by modification time: force b0 strictly
    # older so batch 1 = doc 1 (same-millisecond writes tie otherwise)
    now = os.stat(src / "b1.json").st_mtime
    os.utime(src / "b0.json", (now - 10, now - 10))

    from tests.conftest import fresh_sink

    sink = fresh_sink(spark, "paradedup_live_sink")
    q = pdi.start_paradedup_ingest(
        spark,
        str(src),
        str(tmp_path / "ckpt"),
        str(tmp_path / "index"),
        sink_table=sink,
        compact_every=1,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(120)

    spark.catalog.refreshTable(sink)
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in spark.table(sink).collect()
    }
    assert out[1] == f"{P1}\n\n{P2}"
    assert out[2] == P3  # P1 excised: first seen in batch 1
    # compaction left one file per bucket and the index still probes
    out2 = pdi.ingest_paradedup_batch(
        spark,
        _docs(spark, [(30, P2)]),
        str(tmp_path / "index"),
    ).collect()
    assert out2[0]["text_deduped"] == ""


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """A second stream over the SAME checkpoint after new files arrive
    processes only the new files, against the index state the first
    run admitted — the durable-restart contract of the ingest
    pattern."""
    import os

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": f"{P1}\n\n{P2}"}) + "\n")

    from tests.conftest import fresh_sink

    sink = fresh_sink(spark, "paradedup_restart_sink")

    common = dict(
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_path=str(tmp_path / "index"),
        sink_table=sink,
    )
    q = pdi.start_paradedup_ingest(spark, str(src), **common)
    assert q.awaitTermination(120)

    # new file lands AFTER the first run finished
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": f"{P1}\n\n{P3}"}) + "\n")
    now = os.stat(src / "b1.json").st_mtime
    os.utime(src / "b0.json", (now - 10, now - 10))

    q2 = pdi.start_paradedup_ingest(spark, str(src), **common)
    assert q2.awaitTermination(120)

    spark.catalog.refreshTable(sink)
    rows = spark.table(sink).collect()
    out = {r["doc_id"]: r["text_deduped"] for r in rows}
    assert len(rows) == 2  # doc 1 NOT reprocessed by the restart
    assert out[1] == f"{P1}\n\n{P2}"
    assert out[2] == P3  # P1 excised against the restored index state

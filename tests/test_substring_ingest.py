"""Ingest-time exact-substring dedup (streaming/substring_ingest.py):
corpus windows excised from incoming batches, batch self-dedup, novel
window admission, replay idempotence, convergence to the batch sweep
over the concatenation, and the end-to-end live stream."""

from __future__ import annotations

import json

from csce438_distributed_password_cracker_spark.operators.substring import (
    excise_duplicate_spans,
)
from csce438_distributed_password_cracker_spark.streaming import (
    substring_ingest as ssi,
)

K = 4
CORPUS_DOC = "alpha beta gamma delta one two three four"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_ingest_excises_corpus_and_batch_spans(spark, tmp_path):
    idx = str(tmp_path / "index")
    corpus = _docs(spark, [(1, CORPUS_DOC)])
    ssi.build_substring_index(corpus, idx, k=K)

    batch = _docs(
        spark,
        [
            # corpus span at the tail -> excised
            (10, "x1 x2 x3 x4 alpha beta gamma delta"),
            # within-doc repeat -> second occurrence excised
            (11, "m1 m2 m3 m4 z m1 m2 m3 m4"),
            # all-unique windows -> verbatim
            (12, "u1 u2 u3 u4 u5"),
        ],
    )
    out = {
        r["doc_id"]: (r["text_deduped"], r["n_tokens"], r["n_removed"])
        for r in ssi.ingest_substring_batch(
            spark, batch, idx, k=K
        ).collect()
    }
    assert out[10] == ("x1 x2 x3 x4", 8, 4)
    assert out[11] == ("m1 m2 m3 m4 z", 9, 4)
    assert out[12] == ("u1 u2 u3 u4 u5", 5, 0)

    # admitted state: a later batch's repeat of doc 12's window is
    # excised entirely
    out2 = ssi.ingest_substring_batch(
        spark, _docs(spark, [(20, "u1 u2 u3 u4")]), idx, k=K
    ).collect()
    assert (out2[0]["text_deduped"], out2[0]["n_removed"]) == ("", 4)


def test_first_batch_without_index_self_dedups(spark, tmp_path):
    idx = str(tmp_path / "index")  # never built: first-ever batch
    batch = _docs(
        spark, [(5, "a b c d e"), (6, "a b c d")]
    )
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in ssi.ingest_substring_batch(
            spark, batch, idx, k=K
        ).collect()
    }
    assert out[5] == "a b c d e"  # doc 5 holds the (5, 0) winner
    assert out[6] == ""  # its only window lost the batch election


def test_replay_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "index")
    batch = _docs(spark, [(7, "a b c d e f")])
    first = sorted(
        tuple(r)
        for r in ssi.ingest_substring_batch(
            spark, batch, idx, k=K
        ).collect()
    )
    n_idx = spark.read.parquet(f"{idx}/wins").count()
    replay = sorted(
        tuple(r)
        for r in ssi.ingest_substring_batch(
            spark, batch, idx, k=K
        ).collect()
    )
    assert first == replay
    assert replay[0][1] == "a b c d e f"  # kept itself on replay
    assert spark.read.parquet(f"{idx}/wins").count() == n_idx  # no re-admit


def test_stream_converges_to_batch_sweep(spark, tmp_path):
    """Per-doc cleaned text of the streamed batches equals one batch
    excise_duplicate_spans over the concatenation (the corpus is
    already deduped, so first occurrences coincide)."""
    idx = str(tmp_path / "index")
    corpus = _docs(spark, [(1, CORPUS_DOC)])
    ssi.build_substring_index(corpus, idx, k=K)
    b1 = _docs(spark, [(10, "m1 m2 m3 m4 one two three four")])
    b2 = _docs(
        spark, [(20, "alpha beta gamma delta q m1 m2 m3 m4")]
    )
    streamed = {}
    for b in (b1, b2):
        for r in ssi.ingest_substring_batch(spark, b, idx, k=K).collect():
            streamed[r["doc_id"]] = (
                r["text_deduped"],
                r["n_tokens"],
                r["n_removed"],
            )
    concat = corpus.unionByName(b1).unionByName(b2)
    batch_out = {
        r["doc_id"]: (r["text_deduped"], r["n_tokens"], r["n_removed"])
        for r in excise_duplicate_spans(concat, k=K).collect()
    }
    assert streamed == {d: batch_out[d] for d in (10, 20)}


def test_live_stream_end_to_end_with_compaction(spark, tmp_path):
    import os

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        f.write(
            json.dumps({"doc_id": 1, "text": "a b c d extra tokens"})
            + "\n"
        )
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": "z a b c d"}) + "\n")
    now = os.stat(src / "b1.json").st_mtime
    os.utime(src / "b0.json", (now - 10, now - 10))

    from tests.conftest import fresh_sink

    sink = fresh_sink(spark, "substring_live_sink")

    q = ssi.start_substring_ingest(
        spark,
        str(src),
        str(tmp_path / "ckpt"),
        str(tmp_path / "index"),
        sink_table=sink,
        k=K,
        compact_every=1,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(120)

    spark.catalog.refreshTable(sink)
    out = {
        r["doc_id"]: (r["text_deduped"], r["n_removed"])
        for r in spark.table(sink).collect()
    }
    assert out[1] == ("a b c d extra tokens", 0)
    assert out[2] == ("z", 4)  # the 'a b c d' span arrived in batch 1
    # compaction left the index probeable
    probe = ssi.ingest_substring_batch(
        spark,
        _docs(spark, [(30, "extra tokens a b")]),
        str(tmp_path / "index"),
        k=K,
    ).collect()
    assert probe[0]["n_removed"] == 0  # that bridging window is novel

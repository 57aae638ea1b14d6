"""Randomized stream-vs-batch equivalence for the ingest dedup twins:
on random corpora with planted duplication, streaming micro-batches
through the persisted index produces EXACTLY the batch sweep's output
over the concatenation — provided ids follow arrival order (so the
batch sweep's min-(doc,pos) winner IS the arrival winner) and the
corpus the index is built from is itself already deduped (the ingest
contract)."""

from __future__ import annotations

import random

from csce438_distributed_password_cracker_spark.operators.paradedup import (
    paragraph_dedup,
)
from csce438_distributed_password_cracker_spark.operators.substring import (
    excise_duplicate_spans,
)
from csce438_distributed_password_cracker_spark.streaming import (
    paradedup_ingest as pdi,
)
from csce438_distributed_password_cracker_spark.streaming import (
    substring_ingest as ssi,
)

VOCAB = [f"w{i}" for i in range(10)]


def _rand_paragraph(rng):
    return " ".join(rng.choices(VOCAB, k=rng.randint(3, 8)))


def _para_docs(rng, ids, pool):
    rows = []
    for i in ids:
        paras = [
            rng.choice(pool) if rng.random() < 0.6 else _rand_paragraph(rng)
            for _ in range(rng.randint(1, 5))
        ]
        rows.append((i, "\n\n".join(paras)))
    return rows


def _token_docs(rng, ids):
    return [
        (i, " ".join(rng.choices(VOCAB, k=rng.randint(4, 30))))
        for i in ids
    ]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_paradedup_ingest_randomized_convergence(spark, tmp_path):
    for seed in (3, 17, 52):
        rng = random.Random(seed)
        pool = [_rand_paragraph(rng) for _ in range(8)]
        corpus_raw = _mk(spark, _para_docs(rng, range(0, 6), pool))
        # the ingest contract: the index is built over an ALREADY
        # paragraph-deduped corpus
        corpus = (
            paragraph_dedup(corpus_raw)
            .selectExpr("doc_id", "text_deduped AS text")
        )
        b1 = _mk(spark, _para_docs(rng, range(100, 104), pool))
        b2 = _mk(spark, _para_docs(rng, range(200, 204), pool))

        idx = str(tmp_path / f"pidx_{seed}")
        pdi.build_para_index(corpus, idx)
        streamed = {}
        for b in (b1, b2):
            for r in pdi.ingest_paradedup_batch(spark, b, idx).collect():
                streamed[r["doc_id"]] = (
                    r["text_deduped"],
                    r["n_paragraphs"],
                    r["n_kept"],
                )

        concat = corpus.unionByName(b1).unionByName(b2)
        batch = {
            r["doc_id"]: (r["text_deduped"], r["n_paragraphs"], r["n_kept"])
            for r in paragraph_dedup(concat).collect()
            if r["doc_id"] >= 100
        }
        assert streamed == batch, f"seed={seed}"


def test_substring_ingest_randomized_convergence(spark, tmp_path):
    k = 4
    for seed in (5, 23, 71):
        rng = random.Random(seed)
        corpus_raw = _mk(spark, _token_docs(rng, range(0, 6)))
        corpus = (
            excise_duplicate_spans(corpus_raw, k=k)
            .selectExpr("doc_id", "text_deduped AS text")
        )
        b1 = _mk(spark, _token_docs(rng, range(100, 104)))
        b2 = _mk(spark, _token_docs(rng, range(200, 204)))

        idx = str(tmp_path / f"sidx_{seed}")
        ssi.build_substring_index(corpus, idx, k=k)
        streamed = {}
        for b in (b1, b2):
            for r in ssi.ingest_substring_batch(
                spark, b, idx, k=k
            ).collect():
                streamed[r["doc_id"]] = (
                    r["text_deduped"],
                    r["n_tokens"],
                    r["n_removed"],
                )

        concat = corpus.unionByName(b1).unionByName(b2)
        batch = {
            r["doc_id"]: (r["text_deduped"], r["n_tokens"], r["n_removed"])
            for r in excise_duplicate_spans(concat, k=k).collect()
            if r["doc_id"] >= 100
        }
        assert streamed == batch, f"seed={seed}"


def test_compaction_failure_is_visible_but_nonfatal(spark, tmp_path, caplog):
    """ingest_common's contract: a compaction error must not fail the
    micro-batch (a foreachBatch retry would double-write the sink) but
    must be LOUD — silent breakage lets small files accrete unbounded."""
    import json
    import logging

    from csce438_distributed_password_cracker_spark.streaming import (
        ingest_common,
    )
    from tests.conftest import fresh_sink

    src = tmp_path / "src"
    src.mkdir()
    for b in (0, 1):
        with open(src / f"b{b}.json", "w") as f:
            f.write(json.dumps({"doc_id": b, "text": f"doc {b}"}) + "\n")

    sink = fresh_sink(spark, "compactfail_sink")
    calls = []

    def bad_compact():
        calls.append(1)
        raise RuntimeError("synthetic compaction failure")

    with caplog.at_level(
        logging.WARNING,
        logger="csce438_distributed_password_cracker_spark.streaming.ingest_common",
    ):
        q = ingest_common.start_ingest_stream(
            spark,
            str(src),
            str(tmp_path / "ckpt"),
            sink,
            lambda batch_df, bid: batch_df.selectExpr(
                "doc_id", f"{bid} as batch_id"
            ),
            compact=bad_compact,
            compact_every=1,
            max_files_per_trigger=1,
            compact_label="test-index",
        )
        assert q.awaitTermination(120)

    assert len(calls) == 2  # cadence ran every batch, kept failing
    spark.catalog.refreshTable(sink)
    assert spark.table(sink).count() == 2  # every batch's rows landed
    warn = [r for r in caplog.records if "compaction failed" in r.message]
    assert warn and "test-index" in warn[0].getMessage()

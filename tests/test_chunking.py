"""Chunking guarantees: window/overlap arithmetic, lossless coverage,
short-doc passthrough, and composition with sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.catalog import load_table
from csce438_distributed_password_cracker_spark.operators import chunking, packing


def _doc(n):
    return " ".join(f"t{i}" for i in range(n))


def test_chunk_windows_and_overlap(spark):
    df = spark.createDataFrame([(1, _doc(10))], "doc_id long, text string")
    rows = sorted(
        chunking.chunk_documents(
            df, "doc_id", "text", chunk_tokens=4, overlap=1
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    texts = [r.chunk_text.split(" ") for r in rows]
    # starts 0,3,6 (stride 3); last start must be < n - overlap = 9
    assert [r.chunk_id for r in rows] == ["1#0", "1#1", "1#2"]
    assert texts[0] == ["t0", "t1", "t2", "t3"]
    assert texts[1] == ["t3", "t4", "t5", "t6"]
    assert texts[2] == ["t6", "t7", "t8", "t9"]
    assert [r.n_tokens for r in rows] == [4, 4, 4]
    # consecutive overlap is exactly `overlap` tokens
    assert texts[0][-1:] == texts[1][:1] and texts[1][-1:] == texts[2][:1]


def test_chunk_reconstruction_is_lossless(spark):
    for n, chunk, ov in [(1, 4, 1), (5, 4, 1), (23, 7, 3), (100, 16, 0)]:
        df = spark.createDataFrame([(1, _doc(n))], "doc_id long, text string")
        rows = sorted(
            chunking.chunk_documents(
                df, "doc_id", "text", chunk_tokens=chunk, overlap=ov
            ).collect(),
            key=lambda r: r.chunk_idx,
        )
        rebuilt = rows[0].chunk_text.split(" ")
        for r in rows[1:]:
            rebuilt += r.chunk_text.split(" ")[ov:]
        assert rebuilt == _doc(n).split(" "), (n, chunk, ov)
        assert all(r.n_tokens <= chunk for r in rows)
        assert all(r.n_tokens == chunk for r in rows[:-1])


def test_short_doc_passthrough_and_validation(spark):
    df = spark.createDataFrame(
        [(1, _doc(3)), (2, "")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in chunking.chunk_documents(
            df, "doc_id", "text", chunk_tokens=8, overlap=2
        ).collect()
    }
    assert rows[1].chunk_text == _doc(3) and rows[1].chunk_idx == 0
    assert rows[2].n_tokens == 1  # split("") -> [""]
    with pytest.raises(ValueError, match="overlap"):
        chunking.chunk_documents(df, "doc_id", "text", 4, 4)
    with pytest.raises(ValueError, match="positive"):
        chunking.chunk_documents(df, "doc_id", "text", 0, 0)


def test_chunks_feed_packing_without_oversize(spark, sf_smoke):
    """The composition packing's docstring demands: chunk oversized docs
    first, then pack — no chunk may trip the budget guard."""
    docs = load_table(spark, sf_smoke, "documents")
    chunked = chunking.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=32, overlap=4
    )
    packed = packing.pack_sequences(
        chunked, "chunk_id", "n_tokens", budget=64, n_groups=8
    )
    stats = packing.pack_stats(packed, budget=64)
    assert stats.filter(F.col("tokens") > 64).count() == 0
    assert packed.count() == chunked.count()  # exactly-once coverage


def test_chunking_plan_is_map_only(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    plan = (
        chunking.chunk_documents(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no shuffle: pure per-row fan-out


def test_chunk_sweep_against_reference_model(spark):
    """Drive the REAL operator across a sweep of (chunk, overlap) and
    doc lengths in one DataFrame per combo, and check every doc's
    chunks against an independent Python reference (starts, window
    contents, lossless reconstruction)."""
    docs = [(n, _doc(n)) for n in range(1, 61)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for chunk, ov in [(4, 1), (7, 3), (16, 0), (64, 63), (5, 4)]:
        got = {}
        for r in chunking.chunk_documents(
            df, "doc_id", "text", chunk_tokens=chunk, overlap=ov
        ).collect():
            got.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text
        for n, text in docs:
            toks = text.split(" ")
            stride = chunk - ov
            starts = list(range(0, max(n - ov, 1), stride))
            want = {
                i: " ".join(toks[s : s + chunk])
                for i, s in enumerate(starts)
            }
            assert got[n] == want, (chunk, ov, n)

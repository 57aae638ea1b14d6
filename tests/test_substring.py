"""Exact substring dedup (operators/substring.py): first-occurrence
election at span granularity, interval merging, intra-doc repetition,
min_count, portable-hash parity, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import substring


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_later_occurrence_excised_first_kept(spark):
    shared = _toks(10, "s")  # 10 shared tokens -> k=8 windows cover all
    df = _df(
        spark,
        [
            (1, f"{_toks(3, 'a')} {shared} {_toks(2, 'z')}"),
            (2, f"{_toks(5, 'b')} {shared}"),
        ],
    )
    out = _by_id(substring.excise_duplicate_spans(df, k=8))
    # doc 1 holds the first occurrences — fully intact
    assert out[1]["text_deduped"] == f"{_toks(3, 'a')} {shared} {_toks(2, 'z')}"
    assert out[1]["n_removed"] == 0
    # doc 2 loses exactly the shared 10-token run, keeps its own prefix
    assert out[2]["text_deduped"] == _toks(5, "b")
    assert out[2]["n_removed"] == 10


def test_identical_docs_second_goes_empty(spark):
    text = _toks(12, "w")
    df = _df(spark, [(1, text), (2, text)])
    out = _by_id(substring.excise_duplicate_spans(df, k=8))
    assert out[1]["text_deduped"] == text and out[1]["n_removed"] == 0
    assert out[2]["text_deduped"] == "" and out[2]["n_removed"] == 12


def test_intra_doc_repeat_collapses_to_first(spark):
    run = _toks(8, "r")
    df = _df(spark, [(1, f"{run} {run}")])
    out = _by_id(substring.excise_duplicate_spans(df, k=8))
    assert out[1]["text_deduped"] == run
    assert out[1]["n_tokens"] == 16 and out[1]["n_removed"] == 8


def test_overlapping_spans_merge_coverage_not_double_counted(spark):
    # doc 2 shares an 11-token run -> 4 overlapping k=8 windows merge
    # into ONE island of 11 covered tokens
    shared = _toks(11, "s")
    df = _df(spark, [(1, shared), (2, f"x0 {shared} y0")])
    spans = substring.merge_spans(
        substring.duplicate_spans(df, k=8), "doc_id"
    ).collect()
    assert len(spans) == 1
    assert (spans[0]["start"], spans[0]["end"]) == (1, 12)
    out = _by_id(substring.excise_duplicate_spans(df, k=8))
    assert out[2]["text_deduped"] == "x0 y0"
    assert out[2]["n_removed"] == 11


def test_short_docs_and_uniques_untouched(spark):
    df = _df(
        spark,
        [
            (1, "only three tokens"),  # < k: no windows
            (2, _toks(20, "u")),  # unique content
            (3, None),  # NULL text
        ],
    )
    out = _by_id(substring.excise_duplicate_spans(df, k=8))
    assert out[1]["text_deduped"] == "only three tokens"
    assert out[2]["text_deduped"] == _toks(20, "u")
    assert out[3]["text_deduped"] == "" and out[3]["n_removed"] == 0
    assert all(r["n_removed"] == 0 for r in out.values())


def test_min_count_threshold(spark):
    shared = _toks(9, "s")
    df = _df(
        spark,
        [(1, shared), (2, f"a0 {shared}"), (3, f"b0 b1 {shared}")],
    )
    # pairs suffice at min_count=2: docs 2 and 3 both lose the run
    out2 = _by_id(substring.excise_duplicate_spans(df, k=8, min_count=2))
    assert out2[2]["n_removed"] == 9 and out2[3]["n_removed"] == 9
    # min_count=3: the window occurs 3x -> still excised; drop doc 3 and
    # the 2-occurrence window no longer qualifies
    out3 = _by_id(substring.excise_duplicate_spans(df, k=8, min_count=3))
    assert out3[2]["n_removed"] == 9
    two = _df(spark, [(1, shared), (2, f"a0 {shared}")])
    out_none = _by_id(
        substring.excise_duplicate_spans(two, k=8, min_count=3)
    )
    assert out_none[2]["n_removed"] == 0


def test_portable_hash_parity(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(
        map(
            tuple,
            substring.excise_duplicate_spans(docs, k=8).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            substring.excise_duplicate_spans(
                docs, k=8, portable=True
            ).collect(),
        )
    )
    assert a == b
    # the synthetic corpus repeats runs across docs: the sweep must bite
    assert sum(r[3] for r in a) > 0


def test_deterministic_across_repartition(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(
        map(tuple, substring.excise_duplicate_spans(docs, k=8).collect())
    )
    b = sorted(
        map(
            tuple,
            substring.excise_duplicate_spans(
                docs.repartition(17), k=8
            ).collect(),
        )
    )
    assert a == b


def test_election_shuffle_carries_no_text(spark):
    df = _df(spark, [(1, _toks(12, "a")), (2, _toks(12, "a"))])
    spans = substring.duplicate_spans(df, k=8)
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "min_by" in plan or "minby" in plan.lower()


def test_param_validation(spark):
    df = _df(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        substring.duplicate_spans(df, k=0)
    with pytest.raises(ValueError):
        substring.duplicate_spans(df, min_count=1)

"""Cross-document paragraph dedup (operators/paradedup.py): first-
occurrence election, order preservation, min_chars exemption, the
all-duplicate document, collision_safe parity, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import paradedup

SEP = "\n\n"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    footer = "(c) example corp all rights reserved"
    return _df(
        spark,
        [
            (1, SEP.join(["alpha body one", footer, "unique tail one"])),
            (2, SEP.join([footer, "beta body two"])),
            (3, SEP.join(["gamma body three", footer])),
            (4, footer),  # nothing but the boilerplate
            (5, SEP.join(["delta body five", "delta body five"])),  # intra-doc dup
        ],
    )


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_first_occurrence_wins_and_order_preserved(spark, corpus):
    out = _by_id(paradedup.paragraph_dedup(corpus, sep=SEP))
    footer = "(c) example corp all rights reserved"
    # doc 1 holds the first occurrence (min doc_id, pos) — keeps it
    assert out[1]["text_deduped"] == SEP.join(
        ["alpha body one", footer, "unique tail one"]
    )
    assert out[1]["n_paragraphs"] == 3 and out[1]["n_kept"] == 3
    # later docs lose the footer but keep their own text, in order
    assert out[2]["text_deduped"] == "beta body two"
    assert out[3]["text_deduped"] == "gamma body three"
    assert out[2]["n_kept"] == 1 and out[3]["n_kept"] == 1


def test_all_duplicate_document_survives_empty(spark, corpus):
    out = _by_id(paradedup.paragraph_dedup(corpus, sep=SEP))
    assert out[4]["text_deduped"] == ""
    assert out[4]["n_paragraphs"] == 1 and out[4]["n_kept"] == 0


def test_intra_doc_duplicate_collapses(spark, corpus):
    out = _by_id(paradedup.paragraph_dedup(corpus, sep=SEP))
    assert out[5]["text_deduped"] == "delta body five"
    assert out[5]["n_kept"] == 1


def test_min_chars_exempts_short_paragraphs(spark):
    df = _df(
        spark,
        [(1, SEP.join(["Intro", "long shared paragraph body"])),
         (2, SEP.join(["Intro", "other text"]))],
    )
    out = _by_id(paradedup.paragraph_dedup(df, sep=SEP, min_chars=10))
    # "Intro" (5 chars) is exempt: both docs keep it
    assert out[1]["text_deduped"].startswith("Intro")
    assert out[2]["text_deduped"].startswith("Intro")


def test_collision_safe_parity(spark, corpus):
    a = sorted(map(tuple, paradedup.paragraph_dedup(corpus, sep=SEP).collect()))
    b = sorted(
        map(
            tuple,
            paradedup.paragraph_dedup(
                corpus, sep=SEP, collision_safe=True
            ).collect(),
        )
    )
    assert a == b


def test_deterministic_across_repartition(spark, sf_smoke):
    raw = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    # the synthetic docs have no sentence separators; carve 8-token
    # chunks as pseudo-paragraphs (as the q_dedup_exact para branch does)
    docs = paradedup.carve_pseudo_paragraphs(raw, "doc_id", "text", n=8, sep="|")
    a = sorted(
        map(tuple, paradedup.paragraph_dedup(docs, sep="|").collect())
    )
    b = sorted(
        map(
            tuple,
            paradedup.paragraph_dedup(docs.repartition(17), sep="|").collect(),
        )
    )
    assert a == b
    # the synthetic corpus repeats chunks across docs: the sweep must
    # actually remove something
    total = sum(r[2] for r in a)
    kept = sum(r[3] for r in a)
    assert kept < total


def test_reassembly_is_lossless_when_no_dups(spark):
    df = _df(spark, [(1, SEP.join(["one of a kind", "also unique"]))])
    out = _by_id(paradedup.paragraph_dedup(df, sep=SEP))
    assert out[1]["text_deduped"] == SEP.join(["one of a kind", "also unique"])


def test_election_shuffle_is_slim(spark, corpus):
    """The election aggregation must not carry the paragraph text —
    only (hash, doc_id, pos) reach its exchange."""
    out = paradedup.paragraph_dedup(corpus, sep=SEP)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "min_by" in plan or "minby" in plan.lower()


def test_regex_metachar_separator(spark):
    """The separator is literal even when it is regex-special."""
    df = _df(
        spark,
        [(1, "a.b|+c.b|+z"), (2, "c.b|+other")],
    )
    out = _by_id(paradedup.paragraph_dedup(df, sep="|+"))
    assert out[1]["text_deduped"] == "a.b|+c.b|+z"
    # doc 1 holds paragraphs [a.b, c.b, z]; doc 2 [c.b, other] — c.b's
    # first occurrence is (1, 1), so doc 2 keeps only 'other'
    assert out[2]["text_deduped"] == "other"
    with pytest.raises(ValueError):
        paradedup.paragraph_dedup(df, sep="")


def test_empty_paragraphs_are_exempt(spark):
    """Blank structure (consecutive separators) never joins the
    corpus-wide election."""
    df = _df(
        spark,
        [(1, SEP.join(["a", "", "", "b"])), (2, SEP.join(["c", "", "d"]))],
    )
    out = _by_id(paradedup.paragraph_dedup(df, sep=SEP))
    assert out[1]["text_deduped"] == SEP.join(["a", "", "", "b"])
    assert out[2]["text_deduped"] == SEP.join(["c", "", "d"])


def test_null_text_treated_as_empty(spark):
    """NULL text must not poison the counts (n_paragraphs NULL next to
    n_kept 0) — it behaves as the empty document."""
    df = _df(spark, [(1, "a" + SEP + "b"), (2, None)])
    out = _by_id(paradedup.paragraph_dedup(df, sep=SEP))
    assert out[2]["text_deduped"] == ""
    assert out[2]["n_paragraphs"] == 1 and out[2]["n_kept"] == 1

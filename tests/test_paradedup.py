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


def _mega_dup_corpus(spark):
    """60 copies of one footer paragraph (the planted heavy hitter) plus
    a thin tail of low-count duplicates and unique bodies."""
    footer = "planted mega duplicate footer paragraph"
    rows = [(i, SEP.join([f"body text {i}", footer])) for i in range(60)]
    rows += [
        (100 + i, SEP.join([f"tail text {i}", f"tail dup {i % 3}"]))
        for i in range(6)
    ]
    return _df(spark, rows), footer


def test_heavy_hitter_bypass_preserves_verdicts(spark, corpus):
    base = sorted(
        map(
            tuple,
            paradedup.paragraph_dedup(
                corpus, sep=SEP, heavy_hitters=0
            ).collect(),
        )
    )
    for n in (1, 4, 1024):
        assert base == sorted(
            map(
                tuple,
                paradedup.paragraph_dedup(
                    corpus, sep=SEP, heavy_hitters=n
                ).collect(),
            )
        )


def test_heavy_hitter_text_stays_out_of_the_exchange(spark):
    df, footer = _mega_dup_corpus(spark)
    out = paradedup.paragraph_dedup(df, sep=SEP, heavy_hitters=1)
    # verdicts: doc 0 keeps the footer, every later host loses it
    rows = {r["doc_id"]: r for r in out.collect()}
    assert footer in rows[0]["text_deduped"]
    assert all(footer not in rows[i]["text_deduped"] for i in range(1, 60))
    # the bypass is a map-side broadcast join in the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    # VOLUME: the broadcast set is exactly the planted mega-duplicate,
    # and only the tail's occurrences reach the shuffled verdict join
    _, _, occ, winners = paradedup.election(df, sep=SEP)
    heavy = paradedup.heavy_winners(winners, 1).collect()
    assert len(heavy) == 1 and heavy[0]["_n"] == 60
    light = occ.join(
        F.broadcast(
            paradedup.heavy_winners(winners, 1).select("_k")
        ),
        "_k",
        "left_anti",
    )
    # 66 docs × 2 paragraphs = 132 occurrences; the 60 footer copies
    # are resolved map-side, so the exchange carries only 72 rows
    assert occ.count() == 132
    assert light.count() == 72


def test_heavy_hitter_ranking_is_deterministic(spark):
    df, _ = _mega_dup_corpus(spark)
    _, _, _, winners = paradedup.election(df, sep=SEP)
    a = sorted(map(tuple, paradedup.heavy_winners(winners, 3).collect()))
    b = sorted(map(tuple, paradedup.heavy_winners(winners, 3).collect()))
    assert a == b
    # count>1 filter: unique paragraphs never enter the broadcast set
    big = paradedup.heavy_winners(winners, 10_000).collect()
    assert all(r["_n"] > 1 for r in big)


def test_null_text_treated_as_empty(spark):
    """NULL text must not poison the counts (n_paragraphs NULL next to
    n_kept 0) — it behaves as the empty document."""
    df = _df(spark, [(1, "a" + SEP + "b"), (2, None)])
    out = _by_id(paradedup.paragraph_dedup(df, sep=SEP))
    assert out[2]["text_deduped"] == ""
    assert out[2]["n_paragraphs"] == 1 and out[2]["n_kept"] == 1

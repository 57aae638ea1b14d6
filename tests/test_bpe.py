"""BPE tokenizer (operators/bpe.py): the Sennrich 2016 worked example,
greedy rank-order encoding, decode round-trip, NULL/unknown edges,
map-only plan shape, determinism, and corpus-level compression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import bpe

SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_matches_sennrich_worked_example():
    """The dictionary from the BPE paper (§3.2): 'es' (freq 9) merges
    first, then 'est', then the end-of-word attachment, then 'lo'/'low'
    (freq 7) — deterministic lexicographic tie-breaks."""
    merges = bpe.train_bpe(SENNRICH, n_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", bpe.EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_encode_word_greedy_rank_order():
    merges = bpe.train_bpe(SENNRICH, n_merges=5)
    ranks = {p: i for i, p in enumerate(merges)}
    # 'lowest' was NOT in the training dict; its subwords were
    assert bpe._encode_word("lowest", ranks) == ("low", "est" + bpe.EOW)
    assert bpe._encode_word("low", ranks) == ("low", bpe.EOW)
    # fully unknown word falls back to characters
    assert bpe._encode_word("zzz", ranks) == ("z", "z", "z", bpe.EOW)


def test_train_exhausts_pairs_and_validates():
    # tiny vocab runs out of pairs before n_merges: stops early
    merges = bpe.train_bpe({"ab": 1}, n_merges=100)
    assert merges == [("a", "b"), ("ab", bpe.EOW)]  # then nothing
    with pytest.raises(ValueError):
        bpe.train_bpe(SENNRICH, n_merges=-1)
    with pytest.raises(ValueError):
        bpe.train_bpe({f"w{i}": 1 for i in range(10)}, 1, max_words=5)
    # min_count floors the table
    m = bpe.train_bpe({"aaaa": 10, "zz": 1}, n_merges=1, min_count=2)
    assert m == [("a", "a")]


def test_word_counts_closed_form(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    got = {r["word"]: r["cnt"] for r in bpe.word_counts(df).collect()}
    assert got == {"a": 2, "b": 2}


def test_encode_dataframe_edges_and_roundtrip(spark):
    merges = bpe.train_bpe(SENNRICH, n_merges=5)
    df = spark.createDataFrame(
        [
            (1, "low lower newest"),
            (2, None),
            (3, ""),
            (4, "  low  "),  # repeated separators collapse to no-ops
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe.encode(df, merges).collect()}
    assert bpe.decode_tokens(out[1]["tokens"]) == "low lower newest"
    assert out[1]["n_bpe_tokens"] == len(out[1]["tokens"])
    assert out[2]["tokens"] == [] and out[2]["n_bpe_tokens"] == 0
    assert out[3]["tokens"] == []
    assert bpe.decode_tokens(out[4]["tokens"]) == "low"
    with pytest.raises(ValueError):
        bpe.encode(df, merges + [merges[0]])  # duplicate merge


def test_encode_is_map_only_and_deterministic(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = bpe.train_bpe(bpe.word_counts(docs.limit(100)), n_merges=50)
    enc = bpe.encode(docs, merges)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: the 100 TB hot path
    a = sorted(
        (r["doc_id"], tuple(r["tokens"])) for r in enc.collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["tokens"]))
        for r in bpe.encode(docs.repartition(13), merges).collect()
    )
    assert a == b


def test_corpus_compression_improves_with_merges(spark, sf_smoke):
    """More merges ⇒ fewer tokens; any trained tokenizer beats
    character-level and never goes below word-level."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    counts = bpe.word_counts(docs)
    base = docs.agg(
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.size(F.split("text", " "))).alias("words"),
    ).first()
    toks = {}
    for n in (20, 200):
        merges = bpe.train_bpe(counts, n_merges=n)
        toks[n] = (
            bpe.encode(docs, merges).agg(F.sum("n_bpe_tokens")).first()[0]
        )
    assert toks[200] < toks[20] < base["chars"]
    assert toks[200] >= base["words"]


# ----------------------------------------------------- property tests

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="abc", min_size=1, max_size=6)


@given(
    corpus=st.lists(_WORD, min_size=1, max_size=20),
    doc=st.lists(_WORD, min_size=0, max_size=12),
    n_merges=st.integers(0, 30),
)
@settings(max_examples=150, deadline=None)
def test_encode_decode_roundtrip_property(corpus, doc, n_merges):
    """For ANY corpus-trained merge list and ANY document over the
    alphabet, decode(encode(doc)) == the normalized document, and the
    token count never exceeds character-level length."""
    from collections import Counter

    merges = bpe.train_bpe(dict(Counter(corpus)), n_merges=n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    toks: list[str] = []
    for w in doc:
        toks.extend(bpe._encode_word(w, ranks))
    assert bpe.decode_tokens(toks) == " ".join(doc)
    assert len(toks) <= sum(len(w) + 1 for w in doc)


@given(st.lists(_WORD, min_size=1, max_size=15))
@settings(max_examples=100, deadline=None)
def test_more_merges_never_increase_tokens_property(words):
    from collections import Counter

    counts = dict(Counter(words))
    prev = None
    for n in (0, 5, 20):
        merges = bpe.train_bpe(counts, n_merges=n)
        ranks = {p: i for i, p in enumerate(merges)}
        total = sum(len(bpe._encode_word(w, ranks)) for w in words)
        if prev is not None:
            assert total <= prev
        prev = total

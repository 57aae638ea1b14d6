"""Collocation mining (operators/collocations.py): count closed forms,
lift semantics (attraction vs independence), pruning, and edge cases."""

from __future__ import annotations

import math
import random

import pytest

from csce438_distributed_password_cracker_spark.operators.collocations import (
    collocations,
    word_bigrams,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], ["text"])


def test_bigram_explode_closed_form(spark):
    df = _docs(spark, ["a b c", "a  b", "x", "", None])
    got = sorted(
        (r["w1"], r["w2"]) for r in word_bigrams(df, "text").collect()
    )
    # double space collapses (empty tokens dropped); single-word, empty
    # and NULL docs contribute nothing
    assert got == [("a", "b"), ("a", "b"), ("b", "c")]


def test_counts_and_lift_closed_form(spark):
    # 4 bigrams total: (a,b) x2, (b,c) x1, (c,a) x1
    df = _docs(spark, ["a b c a", "a b"])
    rows = {
        (r["w1"], r["w2"]): r
        for r in collocations(df, "text", min_count=1).collect()
    }
    # position-based unigram counts: 'a' is a LEFT word twice (the
    # trailing 'a' of doc1 has no successor), 'b' a left word once
    ab = rows[("a", "b")]
    assert (ab["c_ab"], ab["c_a"], ab["c_b"]) == (2, 2, 2)
    # N=4: lift = 4*2/(2*2)
    assert ab["lift"] == pytest.approx(2.0)
    bc = rows[("b", "c")]
    assert (bc["c_ab"], bc["c_a"], bc["c_b"]) == (1, 1, 1)
    assert bc["lift"] == pytest.approx(4.0)


def test_planted_phrase_attracts_independent_pairs_do_not(spark):
    """'new' is ALWAYS followed by 'york' -> lift ≈ vocab-size scale;
    two independent filler words pair with lift ≈ 1."""
    rng = random.Random(5)
    filler = [f"w{i}" for i in range(20)]
    texts = []
    for _ in range(400):
        words = [rng.choice(filler) for _ in range(30)]
        pos = rng.randrange(0, 28)
        words[pos : pos + 2] = ["new", "york"]
        texts.append(" ".join(words))
    out = {
        (r["w1"], r["w2"]): r["lift"]
        for r in collocations(_docs(spark, texts), "text", min_count=5).collect()
    }
    ny = out[("new", "york")]
    assert ny > 10  # hard attraction
    indep = [
        v for (a, b), v in out.items()
        if a.startswith("w") and b.startswith("w")
    ]
    assert indep and all(0.3 < v < 3.0 for v in indep)
    # PMI is just log2(lift) driver-side
    assert math.log2(ny) > math.log2(max(indep))


def test_min_count_prunes_and_guard(spark):
    df = _docs(spark, ["a b c a b"])
    assert {
        (r["w1"], r["w2"])
        for r in collocations(df, "text", min_count=2).collect()
    } == {("a", "b")}
    with pytest.raises(ValueError, match="min_count"):
        collocations(df, "text", min_count=0)


def test_collocations_presplit_tokens_match_string_path(spark):
    """r8: the array<string> input hook (shared token frame) must count
    exactly what the raw-string path counts, double spaces included."""
    from pyspark.sql import functions as F

    from csce438_distributed_password_cracker_spark.operators.collocations import (
        collocations,
    )

    docs = spark.createDataFrame(
        [("a b  b c",), ("b c b c",), ("",), (None,)], "text string"
    )
    tok = docs.select(
        F.filter(F.split("text", " "), lambda x: x != "").alias("toks")
    )
    a = sorted(map(tuple, collocations(docs, "text", min_count=1).collect()))
    b = sorted(map(tuple, collocations(tok, "toks", min_count=1).collect()))
    assert a == b and a

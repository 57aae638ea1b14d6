"""Fuzzy key matching (operators/fuzzy.py): FastSS exactness vs a
brute-force Levenshtein oracle, deletion-neighborhood closed forms,
canonical-key assignment, bucket capping, and NULL/edge handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import fuzzy


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, key string")


def test_deletion_neighborhood_closed_form(spark):
    lit_abc = "'abc'"
    out = spark.sql(
        f"SELECT {fuzzy.deletion_variants_sql(lit_abc, 1)} AS v"
    ).first()["v"]
    assert sorted(out) == ["ab", "abc", "ac", "bc"]
    out2 = spark.sql(
        f"SELECT {fuzzy.deletion_variants_sql(lit_abc, 2)} AS v"
    ).first()["v"]
    assert sorted(out2) == ["a", "ab", "abc", "ac", "b", "bc", "c"]
    with pytest.raises(ValueError):
        fuzzy.deletion_variants_sql("'x'", 3)


@pytest.mark.parametrize("k", [1, 2])
def test_pairs_exact_vs_bruteforce(spark, k):
    """The FastSS guarantee: the variant join finds EXACTLY the pairs a
    brute-force Levenshtein scan finds."""
    keys = [
        "plate", "plates", "plat", "slate", "plant",
        "widget", "widgets", "midget",
        "hot ring", "hot rings", "hot ping", "cold ring",
        "a", "b", "ab",
    ]
    df = _df(spark, list(enumerate(keys)))
    got = {
        (r["key_a"], r["key_b"])
        for r in fuzzy.fuzzy_key_pairs(df, "id", "key", max_edits=k).collect()
    }
    import itertools

    def lev(s, t):
        d = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (cs != ct)
                )
        return d[len(t)]

    want = {
        (a, b)
        for a, b in itertools.combinations(keys, 2)
        if 0 < lev(a, b) <= k
    }
    # normalize order by min-id (enumeration order == id order)
    idx = {s: i for i, s in enumerate(keys)}
    got_n = {tuple(sorted(p, key=lambda s: idx[s])) for p in got}
    want_n = {tuple(sorted(p, key=lambda s: idx[s])) for p in want}
    assert got_n == want_n


def test_pairs_key_granularity_and_counts(spark):
    # a billion-row shape in miniature: repeated keys collapse first
    df = _df(
        spark,
        [(i, "plate") for i in range(50)]
        + [(100 + i, "plato") for i in range(3)]
        + [(200, None)],
    )
    rows = fuzzy.fuzzy_key_pairs(df, "id", "key").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["key_a"], r["key_b"]) == ("plate", "plato")
    assert (r["id_a"], r["id_b"]) == (0, 100)  # min-id reps
    assert (r["n_a"], r["n_b"]) == (50, 3)
    assert r["dist"] == 1


def test_bucket_cap_drops_hot_variant(spark):
    # 1-char keys all share the '' variant; capping drops that bucket
    df = _df(spark, [(i, c) for i, c in enumerate("abcdefgh")])
    exact = fuzzy.fuzzy_key_pairs(df, "id", "key", max_edits=1)
    assert exact.count() == 8 * 7 // 2  # all pairs are distance 1
    capped = fuzzy.fuzzy_key_pairs(
        df, "id", "key", max_edits=1, max_bucket_size=4
    )
    assert capped.count() == 0  # the hot '' bucket was dropped


def test_fuzzy_match_canonicalizes_transitively(spark):
    # plate ~ plates ~ platess chain: all three canonicalize to the
    # min-id key even though plate<->platess is distance 2
    df = _df(
        spark,
        [(0, "plate"), (1, "plates"), (2, "platess"), (3, "widget")],
    )
    out = {
        r["key"]: r["canonical_key"]
        for r in fuzzy.fuzzy_match(df, "id", "key").collect()
    }
    assert out == {
        "plate": "plate",
        "plates": "plate",
        "platess": "plate",
        "widget": "widget",
    }


def test_fuzzy_on_part_names(spark, sf_smoke):
    """The real table: distinct p_name pairs within distance 1 exist
    and every reported pair verifies."""
    parts = spark.read.parquet(f"{sf_smoke}/part.parquet").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("key")
    )
    pairs = fuzzy.fuzzy_key_pairs(parts, "id", "key").collect()
    assert len(pairs) > 0
    assert all(0 < r["dist"] <= 1 for r in pairs)
    assert all(r["key_a"] != r["key_b"] for r in pairs)


# ----------------------------------------------------- property tests

from hypothesis import given, settings
from hypothesis import strategies as st


def _lev(s, t):
    d = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        prev, d[0] = d[0], i
        for j, ct in enumerate(t, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
    return d[len(t)]


def _variants(s, k):
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1:])
        out |= nxt
        frontier = nxt
    return out


@given(
    a=st.text(alphabet="abz", min_size=0, max_size=7),
    b=st.text(alphabet="abz", min_size=0, max_size=7),
    k=st.integers(1, 2),
)
@settings(max_examples=300, deadline=None)
def test_deletion_neighborhood_guarantee_property(a, b, k):
    """The FastSS theorem the join relies on: lev(a, b) <= k implies
    the k-deletion neighborhoods intersect (no false negatives); the
    converse filter is the levenshtein verify."""
    if _lev(a, b) <= k:
        assert _variants(a, k) & _variants(b, k)

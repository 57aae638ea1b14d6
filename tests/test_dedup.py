"""Dedup operators: exact, MinHash-LSH recall vs exact Jaccard, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import dedup


def _docs_with_dups(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog again and again"),  # near dup of 1
        (4, "completely different words about spark shuffles and parquet files"),
        (5, "another unrelated sentence mentioning catalyst and tungsten engines"),
        (6, "the quick brown fox jumps over the lazy dog again and often"),  # near dup of 1
    ]
    return spark.createDataFrame(base, "doc_id LONG, text STRING")


def test_exact_dedup_keeps_min_id(spark):
    df = _docs_with_dups(spark)
    out = dedup.exact_dedup(df, ["text"], "doc_id")
    kept = {r["doc_id"] for r in out.collect()}
    assert 1 in kept and 2 not in kept
    assert kept == {1, 3, 4, 5, 6}


def test_jaccard_pairs_find_near_dups(spark):
    df = _docs_with_dups(spark)
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=0.7)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup -> jaccard 1.0
    assert (1, 3) in got and (1, 6) in got  # one-word-changed near dups
    assert (1, 4) not in got and (4, 5) not in got


def test_minhash_lsh_recall_vs_exact(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.catalog import load_table

    docs = load_table(spark, sf_smoke, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=1, threshold=0.95
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=1, num_hashes=64, bands=16, threshold=0.95
        ).collect()
    }
    # LSH output is verified by exact jaccard -> no false positives
    assert lsh <= exact
    # banding S-curve at j>=0.95, b=16, r=4: P(miss) = (1-j^4)^16 < 0.002
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.9, f"recall {recall}: {len(lsh)}/{len(exact)}"


def test_minhash_verify_reports_exact_jaccard_values(spark):
    """The jaccard column on LSH survivors must equal the exact set
    Jaccard — exercises the count-based verify's own size aggregation
    (minhash candidates arrive WITHOUT pre-annotated sizes, unlike the
    prefix-filter join's)."""
    docs = _docs_with_dups(spark)
    rows = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=1, num_hashes=64, bands=16, threshold=0.5
    ).collect()
    assert rows, "expected at least one near-dup pair"
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows:
        sa, sb = set(texts[r["id_a"]].split()), set(texts[r["id_b"]].split())
        assert r["jaccard"] == round(len(sa & sb) / len(sa | sb), 6), (
            r["id_a"],
            r["id_b"],
        )


def test_minhash_deterministic(spark):
    df = _docs_with_dups(spark)
    a = dedup.minhash_signature(df, "doc_id", "text").collect()
    b = dedup.minhash_signature(df, "doc_id", "text").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_simhash_near_pairs(spark):
    df = _docs_with_dups(spark)
    sh = {r["id"]: r["simhash"] for r in dedup.simhash(df, "doc_id", "text").collect()}
    assert sh[1] == sh[2]  # identical text -> identical simhash
    pairs = dedup.simhash_near_pairs(df, "doc_id", "text", max_hamming=16)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    # hamming(1,2) must be 0
    zero = [r for r in pairs.collect() if (r["id_a"], r["id_b"]) == (1, 2)]
    assert zero[0]["hamming"] == 0


def test_simhash_block_join_matches_brute_force(spark):
    # pigeonhole guarantee: any pair with hamming <= 3 (< 4 blocks) must
    # share a block, so the block join finds exactly the brute-force set —
    # in BOTH hash modes (xxhash64 production, md5-portable verification).
    import pytest

    df = _docs_with_dups(spark)
    for portable in (False, True):
        sh = dedup.simhash(df, "doc_id", "text", portable=portable)
        a = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
        b = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
        brute = {
            (r["id_a"], r["id_b"])
            for r in a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", dedup.hamming64_expr("ha", "hb").alias("h"))
            .filter(F.col("h") <= 3)
            .collect()
        }
        blocked = {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_near_pairs(
                df, "doc_id", "text", max_hamming=3, portable=portable
            ).collect()
        }
        assert blocked == brute, f"portable={portable}"


def test_portable_hash_matches_duckdb(spark):
    # the cross-engine contract porthash is built on: Spark's conv-parsed
    # md5 prefix and DuckDB's 0x-cast md5 prefix are the SAME integer.
    import duckdb

    from csce438_distributed_password_cracker_spark.functions.porthash import (
        P31,
        md5_60_duckdb,
        md5_60_spark,
    )

    samples = ["tok", "the quick brown", "", "a b", "naïve — unicode ✓"]
    sdf = spark.createDataFrame([(s,) for s in samples], "x STRING")
    got = [
        (r["h"], r["hm"])
        for r in sdf.selectExpr(
            f"{md5_60_spark('x', 42)} AS h",
            f"{md5_60_spark('x', 42)} % {P31} AS hm",
        ).collect()
    ]
    con = duckdb.connect()
    vals = ", ".join(f"('{s}')" for s in samples)
    want = con.execute(
        f"SELECT {md5_60_duckdb('x', 42)} AS h, "
        f"{md5_60_duckdb('x', 42)} % {P31} AS hm "
        f"FROM (VALUES {vals}) t(x)"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_simhash_rejects_incomplete_block_count(spark):
    # blocks <= max_hamming would silently drop pairs whose differing bits
    # spread one-per-block; the constructor must refuse, not undercount.
    import pytest

    df = _docs_with_dups(spark)
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_near_pairs(df, "doc_id", "text", max_hamming=8, blocks=4)
    with pytest.raises(ValueError, match="blocks"):
        dedup.simhash_near_pairs(df, "doc_id", "text", max_hamming=70)


def test_connected_components_deep_chain_converges_logarithmically(spark):
    """Pointer jumping (round 8): a 300-link chain — the adversarial
    shape paragraph/substring overlap chains produce — must converge
    within the DEFAULT max_iter (20 rounds ≈ log₂ 300 + slack), where
    plain O(diameter) propagation would need 300 rounds and raise."""
    import warnings

    from csce438_distributed_password_cracker_spark.operators.dedup import (
        connected_components,
    )

    n = 301
    ids = spark.range(n).selectExpr("id")
    edges = spark.range(n - 1).selectExpr("id as id_a", "id + 1 as id_b")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any non-convergence warning fails
        out = connected_components(ids, edges).collect()
    assert {r["component_id"] for r in out} == {0}
    assert len(out) == n


def test_connected_components_matches_brute_force_random_graphs(spark):
    """The jump step must not change semantics: labels equal a driver-side
    union-find on seeded random graphs (mixed cliques, chains, singletons)."""
    import numpy as np

    from csce438_distributed_password_cracker_spark.operators.dedup import (
        connected_components,
    )

    rng = np.random.default_rng(8)
    for trial in range(3):
        n = 60
        m = int(rng.integers(10, 50))
        ea = rng.integers(0, n, size=m).tolist()
        eb = rng.integers(0, n, size=m).tolist()
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ea, eb):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {i: find(i) for i in range(n)}

        ids = spark.range(n).selectExpr("id")
        edges = spark.createDataFrame(
            list(zip(ea, eb)), "id_a long, id_b long"
        ).where("id_a != id_b")
        got = {
            r["id"]: r["component_id"]
            for r in connected_components(ids, edges).collect()
        }
        assert got == want, trial


def test_connected_components_warns_when_max_iter_exhausted(spark):
    """A path graph of diameter 9 cannot converge in 2 rounds — the
    caller must hear about it (silent under-merging corrupts dedup)."""
    import warnings

    import pytest

    from csce438_distributed_password_cracker_spark.operators.dedup import (
        connected_components,
    )

    ids = spark.range(10).selectExpr("id")
    edges = spark.range(9).selectExpr("id as id_a", "id + 1 as id_b")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(ids, edges, max_iter=2).collect()
    # enough rounds: converges quietly to one component
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = connected_components(ids, edges, max_iter=20).collect()
    assert {r["component_id"] for r in out} == {0}

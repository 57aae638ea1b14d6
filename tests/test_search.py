"""BM25 retrieval: score parity with a pure-Python reference scorer,
partition-pruned probe plan, and index stats round-trip."""

from __future__ import annotations

import pytest

from csce438_distributed_password_cracker_spark.catalog import load_table
from csce438_distributed_password_cracker_spark.operators import search


DOCS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "the quick red fox",
    3: "lazy dog sleeps all day the dog snores",
    4: "completely unrelated text about spark engines",
    5: "quick quick quick fox fox dog",
}


@pytest.fixture()
def index(spark, tmp_path):
    df = spark.createDataFrame(
        list(DOCS.items()), "doc_id long, text string"
    )
    path = str(tmp_path / "bm25")
    stats = search.bm25_build(df, "doc_id", "text", path, n_buckets=8)
    assert stats["n_docs"] == 5.0
    return path


def test_bm25_matches_reference_scorer(spark, index):
    for query in ["quick fox", "lazy dog", "the", "spark"]:
        got = {
            r.id: r.score
            for r in search.bm25_search(spark, index, query, top_n=10).collect()
        }
        want = search.bm25_score_py(DOCS, query)
        assert got.keys() == want.keys(), query
        for i in got:
            assert abs(got[i] - want[i]) < 1e-4, (query, i)


def test_bm25_ranking_properties(spark, index):
    rows = search.bm25_search(spark, index, "quick fox", top_n=3).collect()
    assert len(rows) == 3
    # doc 5 repeats both terms most within a short doc -> ranks first
    assert rows[0].id == 5
    assert rows[0].score >= rows[1].score >= rows[2].score

    with pytest.raises(ValueError, match="empty"):
        search.bm25_search(spark, index, "   ")
    with pytest.raises(FileNotFoundError):
        search.bm25_search(spark, index + "nope", "x")


def test_bm25_probe_prunes_postings_partitions(spark, index):
    probe = search.bm25_search(spark, index, "quick fox", top_n=3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term_bucket" in plan


def test_bm25_over_corpus_documents(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    path = str(tmp_path / "bm25_corpus")
    search.bm25_build(docs, "doc_id", "text", path, n_buckets=16)
    # any frequent corpus word must retrieve a full page of hits with
    # monotone scores
    rows = search.bm25_search(spark, path, "the data", top_n=10).collect()
    assert len(rows) == 10
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_incremental_update_equals_full_rebuild(spark, tmp_path):
    """Growing the index batch-by-batch must answer every query exactly
    like a from-scratch build over the full corpus (postings append,
    term stats merge, corpus stats fold)."""
    half1 = {k: v for k, v in DOCS.items() if k <= 3}
    half2 = {k: v for k, v in DOCS.items() if k > 3}
    inc_path = str(tmp_path / "inc")
    full_path = str(tmp_path / "full")

    df1 = spark.createDataFrame(list(half1.items()), "doc_id long, text string")
    df2 = spark.createDataFrame(list(half2.items()), "doc_id long, text string")
    full = spark.createDataFrame(list(DOCS.items()), "doc_id long, text string")

    search.bm25_build(df1, "doc_id", "text", inc_path, n_buckets=8)
    stats = search.bm25_update(df2, "doc_id", "text", inc_path)
    assert stats["n_docs"] == 5.0
    search.bm25_build(full, "doc_id", "text", full_path, n_buckets=8)

    for query in ["quick fox", "lazy dog", "spark engines", "the"]:
        inc = {
            r.id: r.score
            for r in search.bm25_search(spark, inc_path, query).collect()
        }
        ref = {
            r.id: r.score
            for r in search.bm25_search(spark, full_path, query).collect()
        }
        assert inc == ref, query

    with pytest.raises(FileNotFoundError):
        search.bm25_update(df2, "doc_id", "text", str(tmp_path / "missing"))


def test_query_tokenization_matches_index_tokenization(spark, tmp_path):
    """Probe and index must share ONE tokenization (single-space
    split): a query with tabs/double spaces scores identically to its
    single-space spelling, and the Python reference scorer agrees."""
    from csce438_distributed_password_cracker_spark.operators import search

    docs = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "quick  brown dog"), (3, "lazy dog")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bm25tok")
    search.bm25_build(docs, "doc_id", "text", path, n_buckets=8)

    def scores(q):
        return {
            r.id: r.score
            for r in search.bm25_search(spark, path, q, top_n=10).collect()
        }

    # tab and repeated spaces are NOT token separators in the index
    # tokenization; "quick\tbrown" is one (unindexed) token
    assert scores("quick brown") == scores("quick brown")
    assert scores("quick\tbrown") == {}  # single unindexed token
    # doc 2's double space produces an empty token that inflates dl but
    # never matches a query (empty query tokens are dropped)
    ref = search.bm25_score_py(
        {1: "quick brown fox", 2: "quick  brown dog", 3: "lazy dog"},
        "quick brown",
    )
    got = scores("quick brown")
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-5


def test_probe_handles_all_unindexed_terms(spark, tmp_path):
    from csce438_distributed_password_cracker_spark.operators import search

    docs = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    )
    path = str(tmp_path / "bm25empty")
    search.bm25_build(docs, "doc_id", "text", path, n_buckets=4)
    out = search.bm25_search(spark, path, "gamma delta", top_n=5)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["id", "score"]


def test_probe_plan_has_no_join_and_prunes_buckets(spark, tmp_path):
    """r4: term→bucket is stored at build and IDF folds driver-side, so
    the probe plan must contain NO join of any kind and must prune the
    postings scan to the query terms' bucket partitions."""
    from csce438_distributed_password_cracker_spark.operators import search

    docs = spark.createDataFrame(
        [(i, f"alpha beta tok{i % 4}") for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bm25plan")
    search.bm25_build(docs, "doc_id", "text", path, n_buckets=8)
    probe = search.bm25_search(spark, path, "alpha tok1", top_n=5)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "PartitionFilters: [" in plan and "term_bucket" in plan


def test_xxhash64_py_matches_spark(spark):
    """The driver-side XXH64 twin must be bit-identical to F.xxhash64 —
    every tail-length class of the algorithm (mod-32 stripes, mod-8
    words, the 4-byte step, single bytes) plus multi-byte UTF-8."""
    from pyspark.sql import functions as F

    from csce438_distributed_password_cracker_spark.functions.xxh64 import (
        pmod,
        xxhash64_py,
    )

    cases = ["x" * n for n in range(0, 101)]
    cases += ["naïve café ☃ 日本語", "term tok7", "\t\n mixed \x00"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    for r in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert r["h"] == xxhash64_py(r["s"]), repr(r["s"])
    assert all(0 <= pmod(xxhash64_py(c), 64) < 64 for c in cases)


def test_termstats_partitioned_and_probe_prunes(spark, index, tmp_path):
    """r7: termstats is hive-partitioned by term_bucket (vocab-sized at
    a web corpus — the single-file rewrite was a single-writer cliff)
    and the probe computes its buckets driver-side, so the termstats
    scan prunes to the query terms' directories."""
    import glob as globmod

    from pyspark.sql import functions as F

    from csce438_distributed_password_cracker_spark.functions.xxh64 import (
        pmod,
        xxhash64_py,
    )

    dirs = globmod.glob(f"{index}/termstats/term_bucket=*")
    assert dirs, "termstats must be hive-partitioned by term_bucket"
    # driver-side bucket == stored bucket for every indexed term
    stats = spark.read.parquet(f"{index}/termstats").collect()
    for r in stats:
        assert int(r["term_bucket"]) == pmod(xxhash64_py(r["term"]), 8)
    # the pruned read sees exactly the filtered terms
    terms = ["quick", "fox"]
    buckets = sorted({pmod(xxhash64_py(t), 8) for t in terms})
    pruned = (
        spark.read.parquet(f"{index}/termstats")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    assert {r["term"] for r in pruned.collect()} == set(terms)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "term_bucket" in plan


def test_bm25_update_keeps_partitioned_termstats(spark, tmp_path):
    """Incremental update must preserve the partitioned layout and the
    driver-side bucket contract."""
    import glob as globmod

    from csce438_distributed_password_cracker_spark.functions.xxh64 import (
        pmod,
        xxhash64_py,
    )
    from csce438_distributed_password_cracker_spark.operators import search

    base = spark.createDataFrame(
        [(i, f"alpha tok{i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bm25upd")
    search.bm25_build(base, "doc_id", "text", path, n_buckets=8)
    batch = spark.createDataFrame(
        [(100 + i, f"beta tok{i % 5}") for i in range(10)],
        "doc_id long, text string",
    )
    search.bm25_update(batch, "doc_id", "text", path)
    assert globmod.glob(f"{path}/termstats/term_bucket=*")
    for r in spark.read.parquet(f"{path}/termstats").collect():
        assert int(r["term_bucket"]) == pmod(xxhash64_py(r["term"]), 8)


def test_probe_reads_legacy_unpartitioned_termstats(spark, index, tmp_path):
    """Pre-r7 indexes stored term_bucket as a DATA column in a single
    termstats file; the bucket-pruning probe must degrade to a plain
    filter there and return identical scores."""
    import shutil

    from pyspark.sql import functions as F

    legacy = str(tmp_path / "legacy")
    shutil.copytree(index, legacy)
    ts = spark.read.parquet(f"{index}/termstats").select(
        "term", "df_t", F.col("term_bucket").cast("int").alias("term_bucket")
    ).collect()
    shutil.rmtree(f"{legacy}/termstats")
    spark.createDataFrame(
        ts, "term string, df_t long, term_bucket int"
    ).repartition(1).write.parquet(f"{legacy}/termstats")
    for q in ["quick fox", "lazy dog", "spark"]:
        a = {(r.id, r.score) for r in
             search.bm25_search(spark, index, q, top_n=10).collect()}
        b = {(r.id, r.score) for r in
             search.bm25_search(spark, legacy, q, top_n=10).collect()}
        assert a == b, q


def test_build_survives_zero_postings_corpus(spark, tmp_path):
    """r8 (ADVICE): a corpus whose partitioned postings write emits
    zero rows (empty frame / all-empty token arrays) must still build a
    valid index — the termstats read-back carries an explicit schema —
    and a probe against the truly-empty index fails LOUDLY."""
    import pytest

    from csce438_distributed_password_cracker_spark.operators import search

    empty = spark.createDataFrame([], "doc_id long, text string")
    path = str(tmp_path / "bm25bare")
    stats = search.bm25_build(empty, "doc_id", "text", path, n_buckets=4)
    assert stats["n_docs"] == 0.0 and stats["total_len"] == 0.0
    with pytest.raises(ValueError, match="empty"):
        search.bm25_search(spark, path, "anything")
    # growing the empty-base index works and converges to a fresh build
    docs = spark.createDataFrame(
        [(1, "quick fox"), (2, "lazy dog dog")], "doc_id long, text string"
    )
    search.bm25_update(docs, "doc_id", "text", path)
    fresh = str(tmp_path / "bm25fresh")
    search.bm25_build(docs, "doc_id", "text", fresh, n_buckets=4)
    a = {(r.id, r.score) for r in
         search.bm25_search(spark, path, "dog fox", top_n=5).collect()}
    b = {(r.id, r.score) for r in
         search.bm25_search(spark, fresh, "dog fox", top_n=5).collect()}
    assert a == b and a

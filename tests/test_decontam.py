"""Benchmark decontamination (operators/decontam.py): overlap counts,
flagging, removal, and the broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import decontam


def _corpora(spark):
    train = spark.createDataFrame(
        [
            # shares the full 5-gram prefix of eval doc 100 (5 grams in common
            # at n=3: positions over 'a b c d e f g')
            (1, "a b c d e f g"),
            # shares nothing with any eval doc
            (2, "p q r s t u v"),
            # exact duplicate of eval doc 101
            (3, "h i j k l m n o"),
            # short doc (< n tokens): single partial shingle, no overlap
            (4, "x y"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "a b c d e f z"), (101, "h i j k l m n o")],
        "doc_id long, text string",
    )
    return train, eval_df


def test_ngram_overlap_counts(spark):
    train, eval_df = _corpora(spark)
    got = {
        (r.train_id, r.eval_id): r.n_shared
        for r in decontam.ngram_overlap(
            train, eval_df, "doc_id", "text", n=3, min_hits=1
        ).collect()
    }
    # doc 1 vs 100: token trigrams of 'a b c d e f g' = {abc,bcd,cde,def,efg},
    # of 'a b c d e f z' = {abc,bcd,cde,def,efz} -> 4 shared
    assert got[(1, 100)] == 4
    # doc 3 vs 101: identical docs, 6 trigrams each, all shared
    assert got[(3, 101)] == 6
    assert (2, 100) not in got and (2, 101) not in got
    assert all(k[0] != 4 for k in got)


def test_min_hits_threshold(spark):
    train, eval_df = _corpora(spark)
    got = decontam.ngram_overlap(
        train, eval_df, "doc_id", "text", n=3, min_hits=5
    ).collect()
    assert {(r.train_id, r.eval_id) for r in got} == {(3, 101)}


def test_decontaminate_removes_flagged(spark):
    train, eval_df = _corpora(spark)
    clean = decontam.decontaminate(
        train, eval_df, "doc_id", "text", n=3, min_hits=1
    )
    assert sorted(r.doc_id for r in clean.select("doc_id").collect()) == [2, 4]
    # schema is the training schema, untouched
    assert clean.columns == train.columns


def test_overlap_is_distinct_gram_semantics(spark):
    # repeated n-grams inside one doc count ONCE (distinct-set overlap,
    # like the published 13-gram dirty-doc rules)
    train = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
    rows = decontam.ngram_overlap(
        train, eval_df, "doc_id", "text", n=3, min_hits=1
    ).collect()
    assert len(rows) == 1
    # train distinct trigrams: {abc,bca,cab}; eval: {abc,bcd} -> 1 shared
    assert rows[0].n_shared == 1


def test_plan_broadcasts_eval_side(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    ov = decontam.ngram_overlap(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        "doc_id",
        "text",
        n=5,
        min_hits=2,
    )
    plan = ov._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    # the corpus (train) side must reach the broadcast join WITHOUT a
    # shuffle: the only hashpartitioning exchanges allowed are the eval
    # side's distinct (inside the broadcast build, small by contract)
    # and the post-join count_distinct aggregation over MATCHED rows
    # (two-phase: keys (t,e,g) then (t,e)).  A fourth exchange would
    # mean the raw corpus gram stream is being shuffled — the 100 TB
    # anti-pattern this operator exists to avoid.
    tree = plan.split("\n\n")[0]
    n_exch = tree.count("Exchange hashpartitioning")
    assert n_exch <= 3, f"unexpected corpus-side shuffle ({n_exch}):\n{plan}"
    # removal path: flagged-id anti join is broadcast too
    clean = decontam.decontaminate(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        "doc_id",
        "text",
        n=5,
        min_hits=2,
    )
    cplan = clean._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in cplan and "LeftAnti" in cplan, cplan


def test_gate_consistency_sf_smoke(spark, sf_smoke):
    """The decontam branch of q_dedup_jaccard equals the operator run
    directly (same params), and survivors + flagged partition the corpus."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 7 != 0)
    eval_df = docs.filter(F.col("doc_id") % 7 == 0)
    flagged = decontam.contaminated_ids(
        train, eval_df, "doc_id", "text", n=5, min_hits=2
    )
    clean = decontam.decontaminate(
        train, eval_df, "doc_id", "text", n=5, min_hits=2
    )
    n_train = train.count()
    n_flag = flagged.count()
    assert n_flag > 0  # calibrated: sf0.001 has real contamination
    assert clean.count() == n_train - n_flag


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

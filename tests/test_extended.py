"""Extended operators: connected components, IVF similarity search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.catalog import load_table
from csce438_distributed_password_cracker_spark.operators import dedup, similarity


def test_connected_components_small_graph(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "id LONG")
    # components: {1,2,3,4} (chain), {5,6} (pair), {7} (singleton)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a LONG, id_b LONG"
    )
    out = {
        r["id"]: r["component_id"]
        for r in dedup.connected_components(ids, edges).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_transitivity_across_rounds(spark):
    # a long chain needs multiple propagation rounds: diameter 6
    n = 7
    ids = spark.createDataFrame([(i,) for i in range(n)], "id LONG")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a LONG, id_b LONG"
    )
    out = {
        r["id"]: r["component_id"]
        for r in dedup.connected_components(ids, edges).collect()
    }
    assert set(out.values()) == {0}


def test_ivf_full_probe_equals_brute_force(spark, sf_smoke):
    """n_probe == n_centroids probes every inverted list ⇒ the IVF result
    must EQUAL the exact brute-force top-k (graceful degradation)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    rest = emb.filter(F.col("vec_id") != 0)
    brute = similarity.brute_force_topk(rest, query, k=10).collect()
    ivf = similarity.ivf_topk(
        rest, query, k=10, n_centroids=8, n_probe=8
    ).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in ivf] == [
        (r["vec_id"], r["cos_sim"]) for r in brute
    ]


def test_hash_split_deterministic_proportions(spark):
    from csce438_distributed_password_cracker_spark.operators.split import (
        hash_split,
    )

    df = spark.range(50_000)
    out = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 50_000 - 0.8) < 0.01
    assert abs(counts["val"] / 50_000 - 0.1) < 0.01
    # pure function of (key, seed): same assignment on re-run AND after
    # repartitioning (the property sample()/randomSplit() lack)
    again = hash_split(
        df.repartition(13), "id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # different seed -> different assignment
    other = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
    assert sorted(map(tuple, out.collect())) != sorted(map(tuple, other.collect()))


def test_hash_sample_and_stratified(spark):
    from csce438_distributed_password_cracker_spark.operators.split import (
        hash_sample,
        stratified_sample,
    )

    df = spark.range(50_000).withColumn(
        "grp", (F.col("id") % 4).cast("string")
    )
    out = hash_sample(df, "id", 0.1)
    frac = out.filter("in_sample").count() / 50_000
    assert abs(frac - 0.1) < 0.01
    # repartition-invariant (pure function of key+seed)
    again = hash_sample(df.repartition(7), "id", 0.1)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    # map-side only: no exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    strat = stratified_sample(
        df, ["grp"], "id", {"0": 0.5, "1": 0.1, "2": 0.0, "3": 1.0}
    )
    got = {
        r["grp"]: r["n"]
        for r in strat.filter("in_sample")
        .groupBy("grp")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_per = 12_500
    assert abs(got.get("0", 0) / n_per - 0.5) < 0.03
    assert abs(got.get("1", 0) / n_per - 0.1) < 0.03
    assert "2" not in got
    assert got["3"] == n_per
    splan = strat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in splan, splan


def test_group_quota_cap_and_prefilter_equivalence(spark):
    from csce438_distributed_password_cracker_spark.operators.split import (
        group_quota,
        hash_sample,
    )

    df = spark.range(10_000).withColumn(
        "grp", (F.col("id") % 5).cast("string")
    )
    out = group_quota(df, ["grp"], "id", k=37)
    kept = out.filter("in_quota")
    counts = [
        r["n"]
        for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()
    ]
    assert counts == [37] * 5
    # deterministic across repartitioning
    again = group_quota(df.repartition(11), ["grp"], "id", k=37)
    assert sorted(
        (r["id"]) for r in kept.select("id").collect()
    ) == sorted(r["id"] for r in again.filter("in_quota").select("id").collect())
    # the documented skewed-stratum recipe: hash-threshold prefilter at an
    # overshooting rate, then rank survivors -> identical kept set
    # (hash order is preserved under hash-threshold filtering because both
    # use the same hash)
    pre = hash_sample(df, "id", 0.2).filter("in_sample").drop("in_sample")
    fast = group_quota(pre, ["grp"], "id", k=37)
    assert sorted(r["id"] for r in kept.select("id").collect()) == sorted(
        r["id"] for r in fast.filter("in_quota").select("id").collect()
    )


def test_quality_score_composite_bounds(spark, sf_smoke):
    """The composite `quality` (excluded from the oracle hash for
    round-half-tie reasons — see q_text_quality_score) is bounded in
    [0,1] and punishes punctuation-heavy text."""
    from csce438_distributed_password_cracker_spark.operators import textops

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    rows = textops.quality_score(docs).collect()
    assert rows and all(0.0 <= r["quality"] <= 1.0 for r in rows)
    probe = spark.createDataFrame(
        [
            (1, "the data row of and a clean readable sentence " * 8),
            (2, "!!!! ???? ;;;; @@@@ #### $$$$ %%%% ^^^^ &&&& " * 8),
        ],
        "doc_id LONG, text STRING",
    )
    q = {r["doc_id"]: r["quality"] for r in textops.quality_score(probe).collect()}
    assert q[1] > q[2]


def test_multimodal_resize_plumbing(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.operators import multimodal

    docs = load_table(spark, sf_smoke, "documents")
    media = multimodal.attach_fake_media(docs, "doc_id", "text")
    resized = multimodal.resize(media, width=64, height=64)
    rows = resized.collect()
    assert len(rows) == docs.count()
    budget = (64 * 64) // 64
    for r in rows[:20]:
        assert len(r["payload"]) <= budget
        assert r["meta"]["width"] == 64 and r["meta"]["height"] == 64
    # deterministic stub: same input -> same bytes
    again = {r["doc_id"]: bytes(r["payload"]) for r in resized.collect()}
    assert {r["doc_id"]: bytes(r["payload"]) for r in rows} == again


def test_ivf_partial_probe_returns_k_plausible_rows(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    rest = emb.filter(F.col("vec_id") != 0)
    rows = similarity.ivf_topk(
        rest, query, k=5, n_centroids=8, n_probe=2
    ).collect()
    assert len(rows) == 5
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    # determinism: seeded centroids + deterministic ranking
    again = similarity.ivf_topk(
        rest, query, k=5, n_centroids=8, n_probe=2
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_weighted_sample_topk_model_and_determinism(spark):
    """Efraimidis-Spirakis weighted sampling: selection equals the pure
    math model when the uniform is injected, is deterministic across
    repartitioning, re-keys by seed, and excludes nonpositive/NULL
    weights."""
    import math
    import random

    from csce438_distributed_password_cracker_spark.operators.split import (
        weighted_sample_topk,
    )

    rng = random.Random(3)
    rows = [
        (i, float(rng.randint(1, 500)), rng.random())
        for i in range(2_000)
    ]
    df = spark.createDataFrame(rows, ["id", "w", "u"]).repartition(7)
    out = weighted_sample_topk(df, "id", "w", k=50, u_col="u")
    got = [r["id"] for r in out.collect()]
    model = sorted(rows, key=lambda t: (-(math.log(t[2]) / t[1]), t[0]))[:50]
    assert sorted(got) == sorted(t[0] for t in model)

    # hash-derived path: deterministic under repartitioning, seed re-keys
    df2 = spark.createDataFrame(
        [(i, float(1 + i % 9)) for i in range(5_000)], ["id", "w"]
    )
    a = sorted(
        r["id"] for r in weighted_sample_topk(df2, "id", "w", 100).collect()
    )
    b = sorted(
        r["id"]
        for r in weighted_sample_topk(
            df2.repartition(13), "id", "w", 100
        ).collect()
    )
    assert a == b
    c = sorted(
        r["id"]
        for r in weighted_sample_topk(df2, "id", "w", 100, seed=9).collect()
    )
    assert a != c

    # nonpositive / NULL weights are excluded; k > survivors returns all
    df3 = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 5.0)], ["id", "w"]
    )
    kept = sorted(
        r["id"] for r in weighted_sample_topk(df3, "id", "w", 10).collect()
    )
    assert kept == [1, 5]


def test_weighted_sample_is_weight_proportional(spark):
    """Inclusion tracks weight: under many seeds, an item with 10x the
    weight of the rest is selected ~10x as often in the k=1 draw (the ES
    first-draw marginal is exactly w_i / sum(w))."""
    from csce438_distributed_password_cracker_spark.operators.split import (
        weighted_sample_topk,
    )

    # 20 items: item 0 has weight 10, others weight 1 -> P(top-1 = 0) = 1/3
    df = spark.createDataFrame(
        [(i, 10.0 if i == 0 else 1.0) for i in range(20)], ["id", "w"]
    )
    wins = 0
    n_seeds = 120
    for s in range(n_seeds):
        top = weighted_sample_topk(df, "id", "w", k=1, seed=s).collect()
        wins += top[0]["id"] == 0
    # binomial(120, 1/3): mean 40, sd ~5.2 -> 4 sd band
    assert 19 <= wins <= 61, wins


def test_weighted_sample_per_group_model_and_cap(spark):
    """Per-group ES sampling: ≤ k rows per group, selection equals the
    per-group pure-math model with an injected uniform, deterministic
    across repartitioning."""
    import math
    import random

    from csce438_distributed_password_cracker_spark.operators.split import (
        weighted_sample_per_group,
    )

    rng = random.Random(11)
    rows = [
        (i, str(i % 5), float(rng.randint(1, 99)), rng.random())
        for i in range(3_000)
    ]
    df = spark.createDataFrame(rows, ["id", "grp", "w", "u"]).repartition(9)
    out = weighted_sample_per_group(
        df, ["grp"], "id", "w", k=15, u_col="u"
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["grp"], set()).add(r["id"])
    assert all(len(v) <= 15 for v in got.values())
    for g in map(str, range(5)):
        members = [t for t in rows if t[1] == g]
        model = sorted(
            members, key=lambda t: (-(math.log(t[3]) / t[2]), t[0])
        )[:15]
        assert got[g] == {t[0] for t in model}, g
    again = weighted_sample_per_group(
        df.repartition(4), ["grp"], "id", "w", k=15, u_col="u"
    )
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_curriculum_order_stages_and_plan(spark):
    """Quantile-staged curriculum: stages are monotone in score,
    roughly balanced on smooth data, NULL scores stage NULL, the
    verdict plan is map-only, and the guards fire."""
    from csce438_distributed_password_cracker_spark.operators.split import (
        curriculum_order,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1_000)] + [(2_000, None)],
        "id long, score double",
    )
    out = curriculum_order(df, "id", "score", n_stages=4, exact=True)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[2_000]["stage"] is None
    # monotone: stage never decreases as the score rises
    staged = [rows[i]["stage"] for i in range(1_000)]
    assert staged == sorted(staged)
    assert set(staged) == {0, 1, 2, 3}
    # balanced within one row on this uniform ramp
    from collections import Counter

    sizes = Counter(staged)
    assert all(abs(v - 250) <= 1 for v in sizes.values()), sizes
    # the coordinate is the shared sampling bucket: deterministic
    again = curriculum_order(
        df.repartition(7), "id", "score", n_stages=4, exact=True
    )
    assert sorted(
        (r["id"], r["stage"], r["curr_key"]) for r in out.collect()
    ) == sorted((r["id"], r["stage"], r["curr_key"]) for r in again.collect())
    # stage+coordinate assignment is map-only (thresholds are literals)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # guards
    with pytest.raises(ValueError, match="n_stages"):
        curriculum_order(df, "id", "score", n_stages=1)
    allnull = spark.createDataFrame([(1, None)], "id long, score double")
    with pytest.raises(ValueError, match="no\\s+non-NULL|non-NULL"):
        curriculum_order(allnull, "id", "score", exact=True)
    with pytest.raises(ValueError, match="no\\s+non-NULL|non-NULL"):
        curriculum_order(allnull, "id", "score", exact=False)


def test_leakage_safe_split_keeps_components_together(spark):
    from csce438_distributed_password_cracker_spark.operators.split import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    # chain pairs (3k, 3k+1, 3k+2) into one component each
    edges = spark.range(0, 2000, 3).selectExpr(
        "id as id_a", "id + 1 as id_b"
    ).union(
        spark.range(0, 2000, 3).selectExpr("id + 1 as id_a", "id + 2 as id_b")
    ).where("id_b < 2000")
    out = leakage_safe_split(
        docs, "doc_id", edges, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    # no component straddles splits
    straddlers = (
        out.groupBy("component_id")
        .agg(F.countDistinct("split").alias("k"))
        .where("k > 1")
        .count()
    )
    assert straddlers == 0
    # proportions in the right ballpark (components ~uniform size 3)
    frac = {
        r["split"]: r["n"] / 2000
        for r in out.groupBy("split").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert 0.7 < frac["train"] < 0.9 and frac["val"] > 0.03
    # deterministic
    again = leakage_safe_split(
        docs, "doc_id", edges, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    assert out.exceptAll(again).count() == 0
    # no edges -> degenerates to exactly the row-keyed hash_split
    no_edges = spark.createDataFrame([], "id_a long, id_b long")
    solo = leakage_safe_split(
        docs, "doc_id", no_edges, {"train": 0.9, "test": 0.1}
    ).select("doc_id", "split")
    plain = hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
    assert solo.exceptAll(plain.select("doc_id", "split")).count() == 0


def test_leakage_safe_split_strict_on_unconverged_components(spark):
    import pytest

    from csce438_distributed_password_cracker_spark.operators.split import (
        leakage_safe_split,
    )

    docs = spark.range(30).selectExpr("id as doc_id")
    # one diameter-29 path: cannot converge in 2 rounds
    edges = spark.range(29).selectExpr("id as id_a", "id + 1 as id_b")
    with pytest.raises(ValueError, match="did not converge"):
        leakage_safe_split(
            docs, "doc_id", edges, {"train": 0.5, "test": 0.5}, max_iter=2
        )
    # non-strict degrades to the warning and still returns a frame
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = leakage_safe_split(
            docs, "doc_id", edges, {"train": 0.5, "test": 0.5},
            max_iter=2, strict=False,
        )
    assert out.count() == 30
    # enough rounds: strict passes quietly and the chain is ONE split
    ok = leakage_safe_split(
        docs, "doc_id", edges, {"train": 0.5, "test": 0.5}, max_iter=40
    )
    assert ok.select("split").distinct().count() == 1


def test_hash_split_bucket_expr_injection(spark):
    """r8: the bucket_expr/bucket_space hook (the split twin of the
    samplers' u_col) must drive assignment from the injected coordinate
    — thresholds scale to the custom bucket space — and compose through
    leakage_safe_split so whole components move together."""
    from csce438_distributed_password_cracker_spark.operators.split import (
        hash_split,
        leakage_safe_split,
        md5_bucket_sql,
    )

    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(
        docs,
        "doc_id",
        w,
        bucket_expr=F.expr(md5_bucket_sql("CAST(doc_id AS STRING)", 256)),
        bucket_space=256,
    )
    # replay the md5 bucket + int() thresholds by hand: sorted names
    # accumulate test(0.1) -> 25, train(0.8) -> 230
    b = out.withColumn(
        "b", F.expr(md5_bucket_sql("CAST(doc_id AS STRING)", 256))
    )
    expect = F.when(F.col("b") < 25, "test").when(
        F.col("b") < 230, "train"
    ).otherwise("val")
    assert b.where(F.col("split") != expect).count() == 0
    # and the composition: injected bucket of the COMPONENT key keeps
    # every chained pair in one split
    edges = spark.range(0, 1000, 2).selectExpr(
        "id as id_a", "id + 1 as id_b"
    ).where("id_b < 1000")
    leak = leakage_safe_split(
        docs,
        "doc_id",
        edges,
        w,
        bucket_expr=F.expr(
            md5_bucket_sql("CAST(component_id AS STRING)", 256)
        ),
        bucket_space=256,
    )
    strad = (
        leak.groupBy("component_id")
        .agg(F.countDistinct("split").alias("k"))
        .where("k > 1")
        .count()
    )
    assert strad == 0

"""sf0.1 smoke for the round-3 additions — the new operators' unit
tests run at toy scale; these drive them at the largest local SF
(documents 5k rows, events 100k rows) and assert full completion with
reconciled counts, so 'works' is demonstrated at the same scale the
bench corpus runs at."""

from __future__ import annotations

from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.catalog import load_table
from csce438_distributed_password_cracker_spark.operators import (
    chunking,
    packing,
    profile,
    search,
    versioned,
)
from csce438_distributed_password_cracker_spark.operators.diff import diff_stats
from csce438_distributed_password_cracker_spark.operators.textops import (
    redact_pii,
)
from csce438_distributed_password_cracker_spark.streaming import rollup

SF01 = "/root/testdata/sf0.1"


def test_bm25_full_corpus_build_and_probe(spark, tmp_path):
    docs = load_table(spark, SF01, "documents")
    idx = str(tmp_path / "bm25")
    stats = search.bm25_build(docs, "doc_id", "text", idx)
    assert stats["n_docs"] == docs.count()
    hits = search.bm25_search(spark, idx, "the data model", top_n=20).collect()
    assert len(hits) == 20
    scores = [h.score for h in hits]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0


def test_chunk_pack_redact_full_corpus(spark):
    docs = load_table(spark, SF01, "documents")
    scrubbed = docs.select("doc_id", *redact_pii(out_col="text"))
    chunked = chunking.chunk_documents(
        scrubbed, "doc_id", "text", chunk_tokens=128, overlap=16
    )
    assert chunked.count() >= docs.count()
    packed = packing.pack_sequences(
        chunked, "chunk_id", "n_tokens", budget=512
    )
    assert packed.count() == chunked.count()
    assert (
        packing.pack_stats(packed, 512).filter("tokens > 512").count() == 0
    )


def test_rollup_full_events_and_reconcile(spark, tmp_path):
    events = load_table(spark, SF01, "events")
    table = str(tmp_path / "rollup")
    days = sorted(
        r[0] for r in events.select(F.to_date("ts")).distinct().collect()
    )
    mid = days[len(days) // 2]
    assert rollup.merge_batch(
        spark, table, events.filter(F.to_date("ts") <= mid), 0
    )
    assert rollup.merge_batch(
        spark, table, events.filter(F.to_date("ts") > mid), 1
    )
    stats = diff_stats(rollup.rollup_verify(spark, events, table))
    assert stats["changed"] == stats["added"] == stats["removed"] == 0
    assert stats["unchanged"] > 0


def test_versioned_merge_full_corpus(spark, tmp_path):
    docs = load_table(spark, SF01, "documents").select(
        "doc_id", "text", "lang"
    )
    root = str(tmp_path / "tbl")
    versioned.commit_version(docs, root, partition_by="lang")
    langs = [r[0] for r in docs.select("lang").distinct().limit(1).collect()]
    delta = (
        docs.filter(F.col("lang") == langs[0])
        .limit(50)
        .withColumn("text", F.lit("edited"))
        .withColumn("deleted", F.lit(False))
    )
    v = versioned.merge_versioned(
        spark, root, delta, key_cols=["doc_id", "lang"],
        partition_col="lang", delete_col="deleted",
    )
    latest = versioned.read_version(spark, root)
    assert latest.count() == docs.count()
    assert latest.filter(F.col("text") == "edited").count() == 50
    assert versioned.read_version(spark, root, 1).filter(
        F.col("text") == "edited"
    ).count() == 0
    assert v == 2


def test_profile_drift_full_corpus_quiet(spark):
    docs = load_table(spark, SF01, "documents")
    # deterministic half-split preserving distributions statistically
    half = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    d = profile.profile_drift(
        docs.select("doc_id", "text", "lang"),
        half.select("doc_id", "text", "lang"),
        rel_threshold=0.25,
    )
    noisy = [
        (r.column, r.metric)
        for r in d.collect()
        if r.drifted
        and r.metric not in ("n_rows", "approx_distinct")
        # text is near-unique, so its 'dominant' item is an arbitrary
        # count-1 row — top-k drift is only meaningful on categorical
        # columns (lang stays quiet below)
        and not (r.column == "text" and r.metric == "top_k")
    ]
    assert noisy == []  # same corpus shape: only size-driven metrics move


def test_paragraph_dedup_full_corpus(spark):
    """Cross-doc paragraph sweep over the whole sf0.1 documents table
    (8-token chunk units): completes, conserves documents, and removes
    the repeated chunks the synthetic near-dup docs share."""
    from csce438_distributed_password_cracker_spark.operators.paradedup import (
        carve_pseudo_paragraphs,
        paragraph_dedup,
    )

    raw = load_table(spark, SF01, "documents")
    docs = carve_pseudo_paragraphs(raw, "doc_id", "text", n=8, sep="|")
    out = paragraph_dedup(docs, sep="|")
    agg = out.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_paragraphs").alias("total"),
        F.sum("n_kept").alias("kept"),
    ).first()
    assert agg["n_docs"] == raw.count()
    assert 0 < agg["kept"] < agg["total"]


def test_mix_corpora_full_corpus(spark):
    """Token-budget mixing over sf0.1: budget hit in expectation, only
    weighted langs selected."""
    from csce438_distributed_password_cracker_spark.operators.mixing import (
        mix_corpora,
    )

    docs = load_table(spark, SF01, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    budget = 100_000
    out = mix_corpora(
        docs, "lang", "doc_id", "n_tokens",
        {"en": 0.5, "fr": 0.3, "de": 0.2}, budget,
    )
    got = (
        out.where("in_mix")
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    )
    assert {r["lang"] for r in got} <= {"en", "fr", "de"}
    total = sum(r["toks"] for r in got)
    assert 0.85 * budget <= total <= 1.15 * budget


def test_semantic_pairs_full_embeddings(spark):
    """SemDeDup pair mining over the full sf0.1 embedding table (50k
    vectors, 32 clusters): completes with exact-threshold pairs only."""
    from csce438_distributed_password_cracker_spark.operators.semdedup import (
        semantic_pairs,
    )

    emb = load_table(spark, SF01, "embeddings")
    pairs = semantic_pairs(
        emb, 0.5, n_centroids=32, refine_iters=1
    ).collect()
    assert len(pairs) > 0
    assert all(r["cos_sim"] >= 0.5 and r["id_a"] < r["id_b"] for r in pairs)


def test_substring_dedup_full_corpus(spark):
    """Exact-substring sweep over the full sf0.1 documents table:
    completes, removes real shifted duplication, never removes from a
    window's first occurrence more than it has."""
    from csce438_distributed_password_cracker_spark.operators.substring import (
        excise_duplicate_spans,
    )

    docs = load_table(spark, SF01, "documents")
    out = excise_duplicate_spans(docs, "doc_id", "text", k=8)
    agg = out.agg(
        F.sum("n_tokens").alias("t"),
        F.sum("n_removed").alias("r"),
        F.count("*").alias("n"),
    ).first()
    assert agg["n"] == docs.count()
    assert 0 < agg["r"] < agg["t"]


def test_dsir_select_full_corpus(spark):
    """DSIR over the full sf0.1 corpus at the production feature width
    (2^18): both count models, the log-ratio weight table, scoring and
    an exact top-1000 Gumbel resample complete; the selection is
    measurably enriched toward the English target."""
    from csce438_distributed_password_cracker_spark.operators import dsir

    docs = load_table(spark, SF01, "documents").select(
        "doc_id", "lang", "text"
    )
    w = dsir.importance_weights(
        dsir.feature_counts(docs),
        dsir.feature_counts(docs.where("lang = 'en'")),
    )
    sel = dsir.dsir_select(docs, w, k=1000)
    rows = sel.collect()
    assert len(rows) == 1000
    n_en = sum(1 for r in rows if r["lang"] == "en")
    frac_corpus = docs.where("lang = 'en'").count() / docs.count()
    assert n_en / 1000 > frac_corpus


def test_lm_and_clf_full_corpus(spark):
    """The two model-based quality filters over the full sf0.1 corpus:
    the self-trained bigram LM and the 2^18-feature classifier both
    complete with one row per doc and non-degenerate scores."""
    from csce438_distributed_password_cracker_spark.operators import (
        classifier,
        lmscore,
    )

    docs = load_table(spark, SF01, "documents").select("doc_id", "text")
    n = docs.count()
    lm = lmscore.score_documents(
        docs, lmscore.train_bigram_lm(docs), vocab_size=4096
    )
    agg = lm.agg(
        F.count("*").alias("n"), F.avg("lm_ppl").alias("p")
    ).first()
    assert agg["n"] == n and agg["p"] > 1.0
    w = classifier.pseudo_weights(spark, classifier.DEFAULT_N_FEATURES)
    clf = classifier.score_linear(docs, w)
    cagg = clf.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("clf_label"), 1).otherwise(0)).alias("pos"),
    ).first()
    assert cagg["n"] == n and 0 < cagg["pos"] < n


def test_bpe_tokenize_full_corpus(spark):
    """BPE over the full sf0.1 corpus: word-count training table, merge
    learning, map-only encode — every doc tokenized, token totals
    between word- and char-level, decode round-trips a sample."""
    from csce438_distributed_password_cracker_spark.operators import bpe

    docs = load_table(spark, SF01, "documents").select("doc_id", "text")
    merges = bpe.train_bpe(bpe.word_counts(docs), n_merges=200)
    enc = bpe.encode(docs, merges)
    agg = enc.agg(
        F.count("*").alias("n"), F.sum("n_bpe_tokens").alias("t")
    ).first()
    base = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.size(F.split("text", " "))).alias("words"),
    ).first()
    assert agg["n"] == base["n"]
    assert base["words"] <= agg["t"] < base["chars"]
    sample = enc.join(docs, "doc_id").limit(20).collect()
    for r in sample:
        assert bpe.decode_tokens(r["tokens"]) == " ".join(
            w for w in r["text"].split(" ") if w
        )


def test_heavy_hitters_and_weighted_sample_full_corpus(spark):
    """Late-r5 operators at full local SF: the Misra-Gries sieve over
    all sf0.1 corpus tokens equals brute force exactly, and weighted
    sampling draws k=1000 of orders' 150k rows through TakeOrdered
    without a global sort."""
    from csce438_distributed_password_cracker_spark.operators.freq import (
        heavy_hitters,
    )
    from csce438_distributed_password_cracker_spark.operators.split import (
        weighted_sample_topk,
    )

    docs = load_table(spark, SF01, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    got = {
        (r["word"], r["cnt"])
        for r in heavy_hitters(words, "word", den=30, k=64).collect()
    }
    total = words.count()
    brute = {
        (r["word"], r["cnt"])
        for r in words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * 30 > total)
        .collect()
    }
    assert got == brute and got

    # orders: 150k rows with a UNIQUE key (synthetic lineitem reuses
    # (orderkey, linenumber) tuples, so it can't pin distinctness)
    orders = load_table(spark, SF01, "orders").select(
        F.col("o_orderkey").alias("oid"),
        F.col("o_totalprice").cast("double").alias("w"),
    )
    samp = weighted_sample_topk(orders, "oid", "w", k=1_000)
    rows = samp.collect()
    assert len(rows) == 1_000
    assert len({r["oid"] for r in rows}) == 1_000  # without replacement
    # the plan is TakeOrdered, not a global Sort+Limit
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_ingest_stream_full_corpus(spark, tmp_path):
    """Round-7 twin at sf0.1: 80% corpus bootstrap + one 20% batch
    through the streaming maintenance path; the grown index answers a
    probe over the full corpus and the log reconciles the counts."""
    from csce438_distributed_password_cracker_spark.streaming import (
        search_ingest as bsi,
    )

    docs = load_table(spark, SF01, "documents")
    idx = str(tmp_path / "bm25inc")
    log0 = bsi.bm25_ingest_batch(
        spark, docs.where("doc_id % 5 != 0"), idx, batch_id=0
    ).first()
    log1 = bsi.bm25_ingest_batch(
        spark, docs.where("doc_id % 5 = 0"), idx, batch_id=1
    ).first()
    n = docs.count()
    assert log0.n_new + log1.n_new == n and log1.n_docs == float(n)
    hits = search.bm25_search(spark, idx, "the data model", top_n=20).collect()
    assert len(hits) == 20 and hits[0].score >= hits[-1].score > 0


def test_pca_moments_and_projection_full_embeddings(spark, tmp_path):
    """Round-7: incremental moments over the full embeddings table
    refit to the one-shot model; projection covers every row."""
    from csce438_distributed_password_cracker_spark.operators import embedproj

    emb = load_table(spark, SF01, "embeddings")
    path = str(tmp_path / "moments")
    embedproj.update_moments(emb.where("vec_id % 2 = 0"), "embedding", path)
    embedproj.update_moments(emb.where("vec_id % 2 = 1"), "embedding", path)
    inc = embedproj.fit_pca_from_moments(spark, path, 8)
    full = embedproj.fit_pca(emb, "embedding", 8)
    import numpy as np

    assert inc.n == full.n == emb.count()
    assert np.allclose(inc.components, full.components, atol=1e-6)
    out = embedproj.project(emb, inc, "embedding")
    assert out.where(F.col("embedding_pca").isNull()).count() == 0

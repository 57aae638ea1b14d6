"""End-to-end corpus-pipeline integration: raw JSON drop → schema-enforced
ingest + quarantine → exact dedup → benchmark decontamination →
cross-doc paragraph dedup → exact-substring span sweep → MinHash-LSH
near-dup sweep → SemDeDup semantic dedup (over the embedding table) →
PII scrub → quality filters (repetition + CCNet LM gate) → DSIR
importance selection → split/sample → corpus audits (exact heavy-hitter
stopword discovery, per-lang weighted eval draw) → token-budget mixing WITH
upsampling (epochs materialized) → deterministic shuffle → chunking →
sequence packing → BM25 retrieval over the curated corpus — the full
MassiveText/Pile-shaped curation path in curriculum order.

Each stage is oracle- or property-tested on its own elsewhere; this test
pins that they COMPOSE — the full path a user of the engine actually
runs, with counts reconciled at every stage and end-to-end determinism
across reruns.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from csce438_distributed_password_cracker_spark.operators import (
    chunking,
    decontam,
    dedup,
    dsir,
    lmscore,
    packing,
    paradedup,
    search,
    semdedup,
    substring,
    textops,
)
from csce438_distributed_password_cracker_spark.operators.mixing import (
    explode_epochs,
    mix_corpora,
)
from csce438_distributed_password_cracker_spark.operators.split import (
    hash_sample,
    hash_split,
    shuffle_rows,
)
from csce438_distributed_password_cracker_spark.sources import ingest

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _raw_drop(spark, sf_smoke, tmp_path) -> str:
    """A realistic messy drop: the documents table as JSON lines, plus
    exact duplicates under fresh ids and two malformed lines."""
    raw_dir = str(tmp_path / "raw")
    os.makedirs(raw_dir)
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    dups = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    # hand-written file (not Spark's writer): appending to a Spark-written
    # part file would invalidate its Hadoop .crc sidecar and fail the read
    import json as _json

    with open(f"{raw_dir}/drop.json", "w") as f:
        for r in docs.unionAll(dups).collect():
            f.write(_json.dumps(r.asDict()) + "\n")
        f.write("not json at all\n")
        f.write('{"doc_id": "also-not-a-long"\n')
    return raw_dir


def _run_pipeline(spark, raw_dir, sf_smoke):
    clean, bad = ingest.split_valid(
        ingest.ingest(spark, raw_dir, "json", SCHEMA)
    )

    # exact dedup: keep the min-id representative per distinct text
    deduped = dedup.exact_dedup(clean, ["text"], "doc_id")

    # benchmark decontamination against the held-out eval partition
    train = deduped.filter(F.col("doc_id") % 7 != 0)
    eval_df = deduped.filter(F.col("doc_id") % 7 == 0)
    decon = decontam.decontaminate(
        train, eval_df, "doc_id", "text", n=5, min_hits=2
    )

    # cross-doc boilerplate removal: 8-token chunks as pseudo-paragraphs
    # ('|'-joined — the synthetic docs lack separators), first-occurrence
    # election corpus-wide, then restore spaces so tokenization is
    # unchanged downstream
    chunked_text = paradedup.carve_pseudo_paragraphs(
        decon, "doc_id", "text", n=8, sep="|"
    )
    boiler_free = (
        paradedup.paragraph_dedup(chunked_text, sep="|")
        .join(decon.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id", "lang",
            F.translate("text_deduped", "|", " ").alias("text"),
        )
    )

    # exact-substring sweep (Lee et al. span-level): remove the SHIFTED
    # duplicated runs the aligned paragraph carve missed.  Checkpoint
    # here: every downstream stage and assertion re-derives its inputs
    # per action, and the dedup prefix (ingest → … → substring) is the
    # expensive sub-DAG — truncating its lineage once keeps the test
    # O(actions), exactly what a production pipeline does by
    # materializing between curation phases.
    span_free = (
        substring.excise_duplicate_spans(
            boiler_free, "doc_id", "text", k=8
        )
        .join(boiler_free.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id", "lang", F.col("text_deduped").alias("text")
        )
        .localCheckpoint(eager=False)
    )

    # doc-level near-dup sweep (MinHash-LSH banding → connected
    # components, min-id representative per cluster) AFTER the exact
    # sweeps: boilerplate and repeated spans are already gone, so
    # banding measures the documents' own overlap
    pairs = dedup.minhash_lsh_pairs(
        span_free, "doc_id", "text", threshold=0.5
    ).select("id_a", "id_b")
    comps = dedup.connected_components(
        span_free.select(F.col("doc_id").cast("long").alias("id")), pairs
    )
    near_free = span_free.join(
        comps.filter(F.col("id") == F.col("component_id")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
    ).localCheckpoint(eager=False)

    # semantic dedup over the embedding table (SemDeDup): drop the
    # non-representative members of each embedding-space near-dup
    # component; docs without an embedding pass through untouched
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    sem = semdedup.semantic_dedup(
        emb.join(
            near_free.select(F.col("doc_id").alias("vec_id")), "vec_id"
        ),
        threshold=0.97,
        n_centroids=8,
    )
    sem_free = near_free.join(
        sem.filter(~F.col("keep")).select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_anti",
    )

    # PII scrub, then quality filters: drop highly repetitive docs,
    # then the CCNet-shaped LM gate — a bigram model trained on the
    # held-out eval partition (the "reference corpus"), keeping docs
    # whose bigrams are ≤10% OOV against it (integer signals only, so
    # the stage is exactly reproducible)
    scrubbed = sem_free.select(
        "doc_id", "lang", *textops.redact_pii(out_col="text")
    )
    profiled = scrubbed.select(
        "*", *textops.repetition_metrics("text")
    ).filter(F.col("dup_trigram_frac") < 0.9)
    ref_model = lmscore.train_bigram_lm(eval_df)
    profiled = profiled.join(
        lmscore.score_documents(profiled, ref_model, vocab_size=64)
        .where("lm_n_oov * 10 <= lm_n_bigrams")
        .select("doc_id"),
        "doc_id",
    )

    # DSIR importance selection against the held-out reference: keep
    # the top-80% of the Gumbel-perturbed importance ranking (threshold
    # mode — the approxQuantile cutoff is computed eagerly once, the
    # verdict itself is a map-only filter)
    w = dsir.importance_weights(
        dsir.feature_counts(profiled, n_features=4096),
        dsir.feature_counts(eval_df, n_features=4096),
        n_features=4096,
    )
    profiled = dsir.dsir_select(
        profiled, w, threshold_frac=0.8, n_features=4096
    ).select("doc_id", "lang", "text")

    # carve: independent 10% sample flag + train/val/test split
    carved = hash_split(
        hash_sample(profiled, "doc_id", 0.1),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )

    # compose the training mix under a token budget: zh is the scarce
    # high-weight domain (weight 0.5, budget 3.5× its supply → rate
    # 1.75 — UPSAMPLED between 1 and the max_epochs=2 cap, exercising
    # both the whole-epoch floor and the fractional-epoch hash), then
    # materialize the repeats and fix the training order with the
    # deterministic global shuffle before chunking.  Exploded epochs
    # get fresh unique ids so chunk/pack keys stay collision-free.
    train_docs = carved.filter(F.col("split") == "train").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    ztoks = (
        train_docs.where("lang = 'zh'").agg(F.sum("n_tokens")).first()[0]
        or 0
    )
    mixed = mix_corpora(
        train_docs, "lang", "doc_id", "n_tokens",
        {"zh": 0.5, "en": 0.5},
        token_budget=int(3.5 * ztoks),
        max_epochs=2, epochs_col="mix_epochs",
    ).filter("in_mix")
    repeated = explode_epochs(mixed, "mix_epochs").withColumn(
        "doc_id", F.col("doc_id") * 10 + F.col("epoch")
    )
    ordered = shuffle_rows(repeated, "doc_id")

    # chunk the mixed train selection into overlapping 128-token
    # windows, then pack chunks into 512-token sequences (chunking
    # guarantees no oversized doc ever reaches the packer's budget guard)
    chunked = chunking.chunk_documents(
        ordered, "doc_id", "text", chunk_tokens=128, overlap=16
    )
    packed = packing.pack_sequences(
        chunked, "chunk_id", "n_tokens", budget=512, n_groups=8
    )
    return (
        clean, bad, deduped, train, decon, near_free, sem_free, profiled,
        carved, mixed, repeated, chunked, packed,
    )


def test_pipeline_composes_with_reconciled_counts(spark, sf_smoke, tmp_path):
    raw_dir = _raw_drop(spark, sf_smoke, tmp_path)
    (
        clean, bad, deduped, train, decon, near_free, sem_free, profiled,
        carved, mixed, repeated, chunked, packed,
    ) = _run_pipeline(spark, raw_dir, sf_smoke)

    # ingest: 500 originals + 10 injected dups parsed, 2 lines quarantined
    assert clean.count() == 510
    assert bad.count() == 2

    # exact dedup folds the 10 injected copies (plus any natural exact
    # dups in the table) — one row per distinct text survives
    n_dedup = deduped.count()
    assert n_dedup == clean.select("text").distinct().count()

    # decontamination only ever removes training docs, never adds
    n_train, n_decon = train.count(), decon.count()
    assert 0 < n_decon < n_train  # sf0.001 is calibrated to have hits
    flagged = decontam.contaminated_ids(
        train, deduped.filter(F.col("doc_id") % 7 == 0), "doc_id", "text",
        n=5, min_hits=2,
    ).count()
    assert n_decon == n_train - flagged

    # near-dup sweep keeps one representative per cluster: re-running
    # candidate generation over the survivors finds NO remaining pair
    # (deterministic banding, so this is exact, not probabilistic)
    n_near = near_free.count()
    assert 0 < n_near <= n_decon
    from csce438_distributed_password_cracker_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    assert (
        minhash_lsh_pairs(near_free, "doc_id", "text", threshold=0.5)
        .limit(1)
        .count()
        == 0
    )

    # semantic dedup only ever removes docs, never adds; docs without
    # embeddings (the injected >1M ids) pass through
    n_sem = sem_free.count()
    assert 0 < n_sem <= n_near

    # dedup sweeps + quality filter + carving preserve rows (flags,
    # not drops, except the repetition cut)
    assert profiled.count() <= n_sem
    assert carved.count() == profiled.count()
    assert set(carved.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test",
    }

    # corpus audits over the curated selection (the sweeps a pipeline
    # runs between curation and mixing): exact heavy-hitter stopword
    # discovery — every surfaced token really exceeds the 1/40 share —
    # and a length-proportional per-lang eval draw (weighted sampling
    # without replacement, ≤ 4 docs per lang, deterministic)
    from csce438_distributed_password_cracker_spark.operators.freq import (
        heavy_hitters,
    )
    from csce438_distributed_password_cracker_spark.operators.split import (
        weighted_sample_per_group,
    )

    words = profiled.select(
        F.explode(F.split("text", " ")).alias("w")
    ).where("w <> ''")
    hh = heavy_hitters(words, "w", den=40)
    n_words = words.count()
    hh_rows = hh.collect()
    assert hh_rows and all(r["cnt"] * 40 > n_words for r in hh_rows)
    eval_draw = weighted_sample_per_group(
        profiled.withColumn(
            "n_tokens", F.size(F.split(F.col("text"), " "))
        ),
        ["lang"], "doc_id", "n_tokens", k=4,
    )
    per_lang = {
        r["lang"]: r["n"]
        for r in eval_draw.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_lang and all(n <= 4 for n in per_lang.values())

    # the mix selects a non-empty, budget-bounded train subset; zh is
    # upsampled — realized (epoch-weighted) tokens land near its 1.75×
    # rate, both 1- and 2-epoch zh rows exist, and the exploded row
    # count reconciles exactly with the per-row epoch counts
    n_mix = mixed.count()
    n_train_split = carved.filter(F.col("split") == "train").count()
    assert 0 < n_mix <= n_train_split
    ztoks = (
        carved.filter("split = 'train' and lang = 'zh'")
        .agg(F.sum(F.size(F.split("text", " "))))
        .first()[0]
    )
    budget = int(3.5 * ztoks)
    realized = mixed.agg(
        F.sum(F.col("n_tokens") * F.col("mix_epochs"))
    ).first()[0]
    assert 0.6 * budget <= realized <= 1.4 * budget
    zh_epochs = {
        r["mix_epochs"]
        for r in mixed.where("lang = 'zh'").collect()
    }
    assert zh_epochs == {1, 2}  # fractional upsampling: both arms hit
    zh_realized = mixed.where("lang = 'zh'").agg(
        F.sum(F.col("n_tokens") * F.col("mix_epochs"))
    ).first()[0]
    assert 1.4 * ztoks <= zh_realized <= 2.0 * ztoks  # ~1.75× supply
    assert repeated.count() == mixed.agg(F.sum("mix_epochs")).first()[0]
    assert repeated.select("doc_id").distinct().count() == repeated.count()

    # chunk + pack: every chunk lands in exactly one pack, budget held
    assert chunked.count() >= repeated.count()  # long docs fan out
    assert packed.count() == chunked.count()
    over = packing.pack_stats(packed, 512).filter("tokens > 512").count()
    assert over == 0

    # the curated corpus is retrievable: BM25 index over the SCRUBBED
    # + quality-filtered corpus (indexing pre-scrub text would ship PII
    # in the retrieval index) answers a probe with monotone scores
    idx = str(tmp_path / "bm25")
    search.bm25_build(profiled, "doc_id", "text", idx, n_buckets=8)
    hits = search.bm25_search(spark, idx, "the data", top_n=5).collect()
    assert len(hits) == 5
    assert [h.score for h in hits] == sorted(
        (h.score for h in hits), reverse=True
    )

    # terminal stage: export the packed training sequences as validated
    # shards — manifest totals reconcile with the packer's output and a
    # validated read-back returns every row
    from csce438_distributed_password_cracker_spark.operators import (
        export as export_ops,
    )

    exp = str(tmp_path / "shards")
    manifest = export_ops.export_shards(
        packed, exp, id_col="chunk_id", num_shards=4
    )
    assert manifest["total_rows"] == packed.count()
    back = export_ops.read_shards(spark, exp)
    assert back.count() == packed.count()


def test_pipeline_deterministic_across_reruns(spark, sf_smoke, tmp_path):
    raw_dir = _raw_drop(spark, sf_smoke, tmp_path)
    *_, packed_a = _run_pipeline(spark, raw_dir, sf_smoke)
    *_, packed_b = _run_pipeline(spark, raw_dir, sf_smoke)
    assert sorted(map(tuple, packed_a.collect())) == sorted(
        map(tuple, packed_b.collect())
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

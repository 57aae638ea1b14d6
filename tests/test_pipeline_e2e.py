"""End-to-end corpus-pipeline integration: raw JSON drop → schema-enforced
ingest + quarantine → exact dedup → benchmark decontamination →
cross-doc paragraph dedup → exact-substring span sweep → MinHash-LSH
near-dup sweep → SemDeDup semantic dedup (over the embedding table) →
PII scrub → quality filter
→ split/sample → token-budget mixing → deterministic shuffle →
chunking → sequence packing → BM25 retrieval over the curated corpus —
the full MassiveText/Pile-shaped curation path in curriculum order.

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
    lmscore,
    packing,
    paradedup,
    search,
    semdedup,
    substring,
    textops,
)
from csce438_distributed_password_cracker_spark.operators.mixing import (
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

    # carve: independent 10% sample flag + train/val/test split
    carved = hash_split(
        hash_sample(profiled, "doc_id", 0.1),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )

    # compose the training mix under a token budget (per-lang weights,
    # water-filling rates), then fix the training order with the
    # deterministic global shuffle before chunking
    train_docs = carved.filter(F.col("split") == "train").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    mixed = mix_corpora(
        train_docs, "lang", "doc_id", "n_tokens",
        {"en": 0.4, "fr": 0.2, "de": 0.2, "es": 0.1, "zh": 0.1},
        token_budget=30_000,
    ).filter("in_mix")
    ordered = shuffle_rows(mixed, "doc_id")

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
        carved, mixed, chunked, packed,
    )


def test_pipeline_composes_with_reconciled_counts(spark, sf_smoke, tmp_path):
    raw_dir = _raw_drop(spark, sf_smoke, tmp_path)
    (
        clean, bad, deduped, train, decon, near_free, sem_free, profiled,
        carved, mixed, chunked, packed,
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

    # the mix selects a non-empty, budget-bounded train subset
    n_mix = mixed.count()
    n_train_split = carved.filter(F.col("split") == "train").count()
    assert 0 < n_mix <= n_train_split
    mix_tokens = mixed.agg(F.sum("n_tokens")).first()[0]
    assert mix_tokens <= 1.35 * 30_000

    # chunk + pack: every chunk lands in exactly one pack, budget held
    assert chunked.count() >= n_mix  # long docs fan out
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


def test_pipeline_deterministic_across_reruns(spark, sf_smoke, tmp_path):
    raw_dir = _raw_drop(spark, sf_smoke, tmp_path)
    *_, packed_a = _run_pipeline(spark, raw_dir, sf_smoke)
    *_, packed_b = _run_pipeline(spark, raw_dir, sf_smoke)
    assert sorted(map(tuple, packed_a.collect())) == sorted(
        map(tuple, packed_b.collect())
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

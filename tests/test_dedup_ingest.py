"""Ingest-time dedup: a persisted MinHash index probed per micro-batch
(streaming/dedup_ingest.py) — corpus dups flagged, batch self-dedup,
uniques admitted into the index, end-to-end as a real stream."""

from __future__ import annotations

import json

from csce438_distributed_password_cracker_spark.streaming import dedup_ingest


DOC_A = (
    "the quick brown fox jumps over the lazy dog while rain falls on the "
    "quiet town and the river bends past old stone bridges near the market square"
)
# one substituted token in 28 → 3-gram Jaccard ≈ 0.84, est ≈ 0.81: above
# the 0.7 threshold with margin, and deterministic (fixed seeds)
DOC_A_NEAR = DOC_A.replace("river", "stream")
DOC_B = "completely different words about spark shuffles and parquet files here"
DOC_C = "another unrelated sentence mentioning catalyst and tungsten engines now"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_ingest_batch_flags_corpus_dups_and_admits_uniques(spark, tmp_path):
    idx = str(tmp_path / "index")
    corpus = _docs(spark, [(1, DOC_A), (2, DOC_B)])
    dedup_ingest.build_dedup_index(corpus, idx)

    batch = _docs(spark, [(10, DOC_A_NEAR), (11, DOC_C)])
    verdict = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(spark, batch, idx).collect()
    }
    assert verdict[10] == (True, 1)  # near-dup of corpus doc 1
    assert verdict[11] == (False, None)  # novel → admitted

    # the admitted doc is now index state: a later batch sees it
    batch2 = _docs(spark, [(20, DOC_C)])
    verdict2 = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(spark, batch2, idx).collect()
    }
    assert verdict2[20] == (True, 11)

    # dup docs must NOT have been admitted
    sigs = spark.read.parquet(f"{idx}/sigs")
    assert {r["id"] for r in sigs.select("id").collect()} == {1, 2, 11}


def test_ingest_batch_self_dedup_without_index(spark, tmp_path):
    idx = str(tmp_path / "index")  # never built: first-ever batch
    batch = _docs(spark, [(5, DOC_A), (6, DOC_A), (7, DOC_B)])
    verdict = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(spark, batch, idx).collect()
    }
    assert verdict[5] == (False, None)  # first arrival wins
    assert verdict[6] == (True, 5)  # exact dup of earlier batch doc
    assert verdict[7] == (False, None)
    sigs = spark.read.parquet(f"{idx}/sigs")
    assert {r["id"] for r in sigs.select("id").collect()} == {5, 7}


def test_dedup_ingest_stream_end_to_end(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for row in [
            {"doc_id": 1, "text": DOC_A},
            {"doc_id": 2, "text": DOC_A_NEAR},
            {"doc_id": 3, "text": DOC_B},
        ]:
            f.write(json.dumps(row) + "\n")
    q = dedup_ingest.start_dedup_ingest(
        spark,
        str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_path=str(tmp_path / "index"),
        sink_table="dedup_verdicts_test",
    )
    q.awaitTermination(120)
    try:
        out = {
            r["id"]: (r["is_dup"], r["dup_of"])
            for r in spark.table("dedup_verdicts_test").collect()
        }
        assert out == {1: (False, None), 2: (True, 1), 3: (False, None)}
    finally:
        spark.sql("DROP TABLE IF EXISTS dedup_verdicts_test")


def test_probe_prunes_band_buckets_at_planning_time(spark, tmp_path):
    """The band table is partitioned by (band_idx, band_bucket) and a
    probe must PRUNE to the batch's bucket directories in the
    FileSourceScan (planning-time partition pruning), reading strictly
    fewer files than the full index — with verdicts unchanged."""
    idx = str(tmp_path / "index")
    corpus = _docs(spark, [(i, f"{DOC_A} variant {i} " + "pad " * i) for i in range(8)])
    dedup_ingest.build_dedup_index(corpus, idx)

    # layout: hive dirs for both partition levels exist
    import pathlib

    band_dirs = list(pathlib.Path(idx, "bands").glob("band_idx=*/band_bucket=*"))
    assert band_dirs, "expected band_idx=*/band_bucket=* partition dirs"

    batch = _docs(spark, [(100, DOC_A)])
    sigs, band_rows = dedup_ingest._sig_and_bands(batch, "doc_id", "text")
    band_rows = band_rows.localCheckpoint(eager=True)
    pruned = dedup_ingest._pruned_index_bands(spark, idx, band_rows)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "band_bucket" in plan.split("PartitionFilters")[1][:400]

    # the pruned scan reads <= the batch's bucket count, < the full index
    n_pairs = band_rows.select("band_idx", "band_bucket").distinct().count()
    n_read = pruned.select("band_idx", "band_bucket").distinct().count()
    n_total = (
        spark.read.parquet(f"{idx}/bands")
        .select("band_idx", "band_bucket")
        .distinct()
        .count()
    )
    assert n_read <= n_pairs < n_total or n_read < n_total

    # verdicts are unchanged by the pruning: the known near-dup is found
    verdict = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(
            spark, _docs(spark, [(200, DOC_A), (201, "utterly new words only")]), idx
        ).collect()
    }
    assert verdict[200][0] is True and verdict[200][1] == 0
    assert verdict[201] == (False, None)


def test_stream_inline_compaction_bounds_files_and_keeps_verdicts(spark, tmp_path):
    """compact_every wires maintenance into the live ingest loop: after a
    multi-file stream with per-batch compaction, the index's file count
    stays bounded, later probes still find corpus dups, and all verdicts
    match the no-compaction semantics."""
    src = tmp_path / "incoming"
    src.mkdir()
    idx = str(tmp_path / "index")
    dedup_ingest.build_dedup_index(_docs(spark, [(1, DOC_A), (2, DOC_B)]), idx)
    # maxFilesPerTrigger=1 forces one micro-batch per file -> 3 batches,
    # compaction fires after each (compact_every=1)
    for i, (did, text) in enumerate(
        [(10, DOC_C), (11, DOC_A), (12, DOC_B + " with brand new suffix tokens")]
    ):
        with open(src / f"b{i}.json", "w") as f:
            f.write(json.dumps({"doc_id": did, "text": text}) + "\n")

    spark.sql("DROP TABLE IF EXISTS dedup_compact_test")
    q = dedup_ingest.start_dedup_ingest(
        spark,
        str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_path=idx,
        sink_table="dedup_compact_test",
        compact_every=1,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    try:
        out = {
            r["id"]: (r["is_dup"], r["dup_of"])
            for r in spark.table("dedup_compact_test").collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS dedup_compact_test")
    assert out[10] == (False, None)
    assert out[11] == (True, 1)
    assert out[12] == (False, None)

    from csce438_distributed_password_cracker_spark.operators import maintenance

    # bounded: 1 file per non-empty (band_idx, band_bucket) dir + 1 sigs file
    n_band_dirs = len(
        list((tmp_path / "index" / "bands").glob("band_idx=*/band_bucket=*"))
    )
    assert maintenance.parquet_file_count(f"{idx}/bands") <= n_band_dirs
    assert maintenance.parquet_file_count(f"{idx}/sigs") == 1

    # the compacted index still serves: corpus dup found, novel admitted
    verdict = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(
            spark, _docs(spark, [(20, DOC_C), (21, "fresh unseen closing phrase")]), idx
        ).collect()
    }
    assert verdict[20] == (True, 10)
    assert verdict[21] == (False, None)


def test_ingest_appends_in_legacy_layout_without_wedging(spark, tmp_path):
    """A pre-band_bucket index (bands/ partitioned by band_idx only) must
    keep working: ingest appends in the ON-DISK layout instead of mixing
    partition depths (which Spark's discovery rejects), so later batches
    still read the index and verdicts stay correct."""
    idx = str(tmp_path / "legacy")
    corpus = _docs(spark, [(1, DOC_A), (2, DOC_B)])
    sigs, band_rows = dedup_ingest._sig_and_bands(corpus, "doc_id", "text")
    (
        band_rows.drop("band_bucket")          # the legacy writer's layout
        .repartition("band_idx")
        .write.mode("overwrite")
        .partitionBy("band_idx")
        .parquet(f"{idx}/bands")
    )
    sigs.write.mode("overwrite").parquet(f"{idx}/sigs")

    # batch 1 admits a novel doc -> append must follow the legacy layout
    v1 = {
        r["id"]: r["is_dup"]
        for r in dedup_ingest.ingest_batch(
            spark, _docs(spark, [(10, DOC_C)]), idx
        ).collect()
    }
    assert v1 == {10: False}
    # batch 2 must still be able to READ the index (no mixed layouts) and
    # see both the original corpus and batch 1's admission
    v2 = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(
            spark, _docs(spark, [(20, DOC_A), (21, DOC_C)]), idx
        ).collect()
    }
    assert v2[20] == (True, 1)
    assert v2[21] == (True, 10)
    import pathlib

    assert not list(pathlib.Path(idx, "bands").glob("band_idx=*/band_bucket=*"))


def test_ingest_replay_does_not_self_dup(spark, tmp_path):
    """foreachBatch replay semantics: if a batch's index appends became
    durable but the batch is re-run (sink failure, driver restart), the
    replayed docs must NOT match their own earlier index rows — the
    verdict stays (is_dup=False) instead of flipping to a self-dup at
    est_jaccard 1.0, and later batches still dedup against them once."""
    idx = str(tmp_path / "index")
    dedup_ingest.build_dedup_index(_docs(spark, [(1, DOC_A)]), idx)

    batch = _docs(spark, [(10, DOC_C)])
    first = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(spark, batch, idx).collect()
    }
    replay = {  # same batch again: its rows are already in the index
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(spark, batch, idx).collect()
    }
    assert first == replay == {10: (False, None)}

    # a different doc id with the same text still dedups against doc 10
    v = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(
            spark, _docs(spark, [(20, DOC_C)]), idx
        ).collect()
    }
    assert v[20] == (True, 10)

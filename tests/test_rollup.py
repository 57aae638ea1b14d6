"""Incremental materialized rollup: multi-batch streaming maintenance
must equal the from-scratch batch aggregate, prune its merges to the
touched days, and no-op on crash-replayed batches."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.catalog import load_table
from csce438_distributed_password_cracker_spark.streaming import rollup


def _canon(df):
    return sorted(
        (
            str(r.day),
            r.event_type,
            r.n_events,
            round(r.sum_value, 6),
            round(r.sum_sq, 4),
            round(r.min_value, 6),
            round(r.max_value, 6),
            r.approx_users,
            tuple(r.value_hist),
        )
        for r in rollup.with_user_estimate(df).collect()
    )


def test_rollup_matches_batch_answer(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    src = str(tmp_path / "events_in")
    # 4 input files -> maxFilesPerTrigger=1 forces 4 micro-batches
    events.repartition(4).write.parquet(src)

    table = str(tmp_path / "rollup")
    q = rollup.start_rollup_stream(
        spark,
        src,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    got = rollup.read_rollup(spark, table)
    want = rollup.rollup_of(events)
    assert _canon(got.drop("last_batch_id")) == _canon(want)
    # multi-batch: the highest absorbed batch id proves >1 merge ran
    assert got.select(F.max("last_batch_id")).first()[0] >= 3

    # the HLL estimate tracks the exact per-key distinct-user count
    # (HLL error at lgK=12 is ~1.6% std; these keys have ≤ a few
    # hundred distinct users, well inside the sketch's exact range)
    exact = {
        (str(r.day), r.event_type): r.u
        for r in events.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    for r in rollup.with_user_estimate(got).collect():
        assert abs(r.approx_users - exact[(str(r.day), r.event_type)]) <= max(
            2, 0.05 * exact[(str(r.day), r.event_type)]
        )


def test_rollup_merge_prunes_and_replay_noop(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    days = [
        r[0]
        for r in events.select(F.to_date("ts").alias("d"))
        .distinct()
        .orderBy("d")
        .collect()
    ]
    early, late = days[: len(days) // 2], days[len(days) // 2 :]
    b0 = events.filter(F.to_date("ts").isin(early))
    b1 = events.filter(F.to_date("ts").isin(late))

    table = str(tmp_path / "rollup")
    assert rollup.merge_batch(spark, table, b0, batch_id=0)

    def day_inodes(vdir, only_early=True):
        root = Path(table) / vdir
        return {
            str(p.relative_to(root)): p.stat().st_ino
            for p in root.rglob("*.parquet")
            if any(f"day={d}" in str(p) for d in early) == only_early
        }

    from csce438_distributed_password_cracker_spark.operators import versioned

    v1 = versioned.history(table)[-1]["dir"]
    early_files = day_inodes(v1, only_early=True)
    assert rollup.merge_batch(spark, table, b1, batch_id=1)
    v2 = versioned.history(table)[-1]["dir"]
    assert v2 != v1
    # batch 1 touches only late days: every early-day file in the new
    # version is a HARD LINK of the previous version's file (same
    # inode — O(changed) I/O, the copy-on-write contract)
    assert day_inodes(v2, only_early=True) == early_files

    merged = _canon(rollup.read_rollup(spark, table).drop("last_batch_id"))
    assert merged == _canon(rollup.rollup_of(events))

    # time travel: the pre-batch-1 snapshot still answers exactly the
    # early-days aggregate (versioned sink, round 4)
    v1_num = versioned.history(table)[0]["version"]
    assert _canon(
        rollup.read_rollup(spark, table, version=v1_num).drop(
            "last_batch_id"
        )
    ) == _canon(rollup.rollup_of(b0))

    # crash replay: re-offering an absorbed batch must be a no-op
    assert rollup.merge_batch(spark, table, b1, batch_id=1) is False
    assert _canon(
        rollup.read_rollup(spark, table).drop("last_batch_id")
    ) == merged


def test_hist_quantile_tracks_exact_percentiles(spark, sf_smoke):
    """The mergeable histogram answers quantiles within one bin width of
    the exact percentile (the documented trade)."""
    from csce438_distributed_password_cracker_spark.streaming.rollup import (
        HIST_BINS,
        HIST_HI,
        HIST_LO,
    )

    events = load_table(spark, sf_smoke, "events")
    bin_w = (HIST_HI - HIST_LO) / HIST_BINS
    agg = rollup.rollup_of(events).collect()
    exact = {
        (str(r.day), r.event_type): r.ps
        for r in events.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        )
        .agg(F.expr("percentile(value, array(0.5, 0.95))").alias("ps"))
        .collect()
    }
    del exact  # sf0.001 keys are tiny; check the MERGED global histogram
    # merge all per-key histograms element-wise — the associativity the
    # design claims — and compare against the exact global percentiles
    merged_hist = [0] * len(agg[0].value_hist)
    for r in agg:
        merged_hist = [a + b for a, b in zip(merged_hist, r.value_hist)]
    g50, g95 = events.agg(
        F.expr("percentile(value, array(0.5, 0.95))")
    ).first()[0]
    assert abs(rollup.hist_quantile(merged_hist, 0.5) - g50) <= bin_w
    assert abs(rollup.hist_quantile(merged_hist, 0.95) - g95) <= bin_w
    assert sum(merged_hist) == events.count()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rollup.hist_quantile([0] * (HIST_BINS + 2), 0.5)
    with _pytest.raises(ValueError):
        rollup.hist_quantile([1] * (HIST_BINS + 2), 1.5)


def test_rollup_empty_first_batch_does_not_poison(spark, sf_smoke, tmp_path):
    """An empty first micro-batch must be a no-op, NOT create a
    zero-row partitioned dataset that breaks every later read."""
    events = load_table(spark, sf_smoke, "events")
    table = str(tmp_path / "rollup")
    empty = events.filter(F.lit(False))
    assert rollup.merge_batch(spark, table, empty, batch_id=0)
    assert not Path(table).exists()
    assert rollup.merge_batch(spark, table, events, batch_id=1)
    assert _canon(
        rollup.read_rollup(spark, table).drop("last_batch_id")
    ) == _canon(rollup.rollup_of(events))


def test_rollup_null_ts_events_merge_and_replay(spark, sf_smoke, tmp_path):
    """Events with NULL ts roll up under the null day and must MERGE
    across batches (null-safe slice + key matching) and be replay-proof
    like any other day."""
    events = load_table(spark, sf_smoke, "events")
    nulled = events.limit(20).withColumn("ts", F.lit(None).cast("timestamp"))
    table = str(tmp_path / "rollup")
    assert rollup.merge_batch(spark, table, nulled.limit(10), batch_id=0)
    assert rollup.merge_batch(
        spark, table, nulled.subtract(nulled.limit(10)), batch_id=1
    )
    got = rollup.read_rollup(spark, table)
    null_rows = got.filter(F.col("day").isNull())
    assert null_rows.count() == null_rows.select("event_type").distinct().count()
    assert (
        null_rows.agg(F.sum("n_events")).first()[0] == 20
    )  # both batches merged, no overwrite
    # replay of batch 1 must be detected even for the null day
    assert (
        rollup.merge_batch(
            spark, table, nulled.subtract(nulled.limit(10)), batch_id=1
        )
        is False
    )


def test_rollup_verify_clean_and_detects_drift(spark, sf_smoke, tmp_path):
    """A healthy incremental table reconciles 100% unchanged against
    the raw history; a corrupted key shows up as changed."""
    from csce438_distributed_password_cracker_spark.operators.diff import (
        diff_stats,
    )

    events = load_table(spark, sf_smoke, "events")
    table = str(tmp_path / "rollup")
    days = sorted(
        r[0] for r in events.select(F.to_date("ts")).distinct().collect()
    )
    assert rollup.merge_batch(
        spark, table, events.filter(F.to_date("ts") <= days[2]), 0
    )
    assert rollup.merge_batch(
        spark, table, events.filter(F.to_date("ts") > days[2]), 1
    )

    stats = diff_stats(rollup.rollup_verify(spark, events, table))
    assert stats["changed"] == stats["added"] == stats["removed"] == 0
    assert stats["unchanged"] > 0

    # corrupt one stored row (committed as a new version, as a manual
    # table edit would be) -> exactly one changed key
    from csce438_distributed_password_cracker_spark.operators import versioned

    stored = rollup.read_rollup(spark, table).localCheckpoint(eager=True)
    first = stored.first()
    corrupted = stored.withColumn(
        "n_events",
        F.when(
            (F.col("day") == F.lit(first.day))
            & (F.col("event_type") == first.event_type),
            F.col("n_events") + 1,
        ).otherwise(F.col("n_events")),
    )
    versioned.commit_version(corrupted, table, partition_by="day")
    stats = diff_stats(rollup.rollup_verify(spark, events, table))
    assert stats["changed"] == 1


def test_rollup_replay_of_batch_zero_is_noop(spark, sf_smoke, tmp_path):
    """foreachBatch ids start at 0: a crash-replay of the
    TABLE-CREATING batch 0 must be skipped, not double-counted (a
    stored last_batch_id of 0 is falsy — the regression a truthiness
    check reintroduces)."""
    events = load_table(spark, sf_smoke, "events")
    table = str(tmp_path / "rollup")
    assert rollup.merge_batch(spark, table, events, batch_id=0)
    before = _canon(rollup.read_rollup(spark, table).drop("last_batch_id"))
    # crash replay of batch 0
    assert rollup.merge_batch(spark, table, events, batch_id=0) is False
    after = _canon(rollup.read_rollup(spark, table).drop("last_batch_id"))
    assert after == before  # aggregates not doubled


def test_legacy_plain_parquet_rollup_is_adopted(spark, sf_smoke, tmp_path):
    """A pre-versioned rollup table (day=* parquet dirs, no manifest)
    must be ADOPTED as version 1 on the first post-upgrade batch, not
    silently shadowed by a fresh table holding only that batch."""
    events = load_table(spark, sf_smoke, "events")
    days = sorted(
        r[0] for r in events.select(F.to_date("ts")).distinct().collect()
    )
    early = events.filter(F.to_date("ts") <= days[1])
    late = events.filter(F.to_date("ts") > days[1])

    table = str(tmp_path / "legacy")
    # simulate the pre-round-4 sink layout: plain partitioned parquet
    legacy = rollup.rollup_of(early).withColumn(
        "last_batch_id", F.lit(0).cast("long")
    )
    legacy.repartition(1, "day").write.partitionBy("day").parquet(table)

    assert rollup.merge_batch(spark, table, late, batch_id=1)
    got = _canon(rollup.read_rollup(spark, table).drop("last_batch_id"))
    assert got == _canon(rollup.rollup_of(events))  # old state survived
    # and the replay ledger survived too: batch 0 re-offered is a no-op
    assert rollup.merge_batch(spark, table, early, batch_id=0) is False

def test_rollup_vacuum_cadence_bounds_versions(spark, sf_smoke, tmp_path):
    """A long-running stream with vacuum_every keeps the version
    directory count bounded (≤ keep_last after each cadence hit) across
    3× the cadence in batches — and verdicts stay identical to the
    from-scratch aggregate (vacuum only trims HISTORY, never the head)."""
    events = load_table(spark, sf_smoke, "events")
    src = str(tmp_path / "events_in")
    # 6 files + maxFilesPerTrigger=1 -> 6 micro-batches = 3× the cadence
    events.repartition(6).write.parquet(src)

    table = str(tmp_path / "rollup")
    q = rollup.start_rollup_stream(
        spark,
        src,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        vacuum_every=2,
        keep_last=2,
    )
    q.awaitTermination(120)

    # bounded: the last vacuum ran at batch 6, so at most keep_last
    # retained versions + at most vacuum_every-1 committed since
    from csce438_distributed_password_cracker_spark.operators import versioned

    hist = versioned.history(table)
    assert len(hist) <= 2 + 1
    on_disk = [p.name for p in Path(table).glob("v*")]
    assert sorted(on_disk) == sorted(h["dir"] for h in hist)
    assert not list(Path(table).glob("_staging-*"))

    # verdicts unchanged vs the from-scratch batch answer
    got = rollup.read_rollup(spark, table)
    assert _canon(got.drop("last_batch_id")) == _canon(
        rollup.rollup_of(events)
    )
    # the reconciliation audit agrees: every key unchanged
    audit = rollup.rollup_verify(spark, events, table)
    assert {r.diff_status for r in audit.collect()} == {"unchanged"}

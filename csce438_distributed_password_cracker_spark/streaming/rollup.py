"""Incremental materialized aggregates — a streaming rollup table kept
fresh per micro-batch by merging ALGEBRAIC partials into a persisted
parquet table, instead of rescanning history.

Reference analog: none (north-star extension, BASELINE.json); this is
the materialized-view-maintenance pattern every monitoring/metrics
surface over a 100 TB event stream runs.

Why this shape scales:

- **Partials are algebraic.**  count / sum / min / max (and sum of
  squares for variance) merge associatively, so each micro-batch
  contributes a per-key partial and the stored rollup absorbs it with
  one more group-by — the historical raw events are NEVER re-read.
  Exact distincts are NOT mergeable, so distinct users ride as a
  DataSketches HLL sketch column (``hll_sketch_agg`` per batch,
  ``hll_union_agg`` at merge — register-max union is order-independent
  and lossless at fixed lgK): the rollup stores the sketch's binary
  state and any reader calls ``hll_sketch_estimate`` on it.  Exact
  medians likewise don't merge, so quantiles ride as a fixed-bin
  HISTOGRAM array (width_bucket counts; merge = element-wise sum —
  trivially associative), decoded by :func:`hist_quantile` with
  within-bin linear interpolation: error is bounded by bin width, the
  classic mergeable-quantile trade every metrics store makes.
- **The merge is partition-pruned.**  The rollup table is
  hive-partitioned by day; a batch's partial touches only the days in
  the batch (a live stream touches ~today), so the stored slice read
  back for merging prunes to those directories and the copy-on-write
  merge rewrites only them.  Cost per batch ∝ batch size +
  touched-day rollup rows — independent of table history.
- **The sink is a VERSIONED table** (:mod:`operators.versioned`,
  round 4): each micro-batch lands as an atomic manifest commit via
  ``merge_versioned``, so dashboard readers get torn-read-free
  snapshots mid-merge and the rollup's history is time-travelable for
  free (read the table as of any absorbed batch).  Untouched day
  directories hard-link forward — per-batch I/O stays O(touched
  days).
- **Single writer, exactly-once.**  The file source + checkpoint give
  exactly-once batch delivery; the merge runs inside ``foreachBatch``
  (the documented idempotent-sink escape hatch).  A replayed batch
  after a crash between merge and checkpoint would double-count — the
  classic streaming-upsert pitfall — so the rollup stores
  ``last_batch_id`` per key and ``merge_batch`` SKIPS batches it has
  already absorbed (idempotence via the sink's own state, the same
  trick as Delta's txn-version dedup).  The versioned commit's
  parent-version precondition additionally makes an accidental second
  writer loud (ConcurrentWriteError) instead of silently lost.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.merge import partition_pred
from ..operators.versioned import (
    MANIFEST,
    commit_version,
    merge_versioned,
    read_version,
    vacuum,
)

ROLLUP_KEYS = ["day", "event_type"]

# histogram layout for the mergeable quantile column: HIST_BINS equal
# bins over [HIST_LO, HIST_HI) plus underflow (index 0) and overflow
# (index HIST_BINS+1), matching width_bucket's bucket numbering.  The
# bounds are a deployment choice (events.value is generated in
# [0, 1000)); out-of-range values still count, in the edge buckets.
HIST_LO, HIST_HI, HIST_BINS = 0.0, 1000.0, 40


def _partial(batch: DataFrame) -> DataFrame:
    """Per-(day, event_type) algebraic partial of one events batch."""
    return batch.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.sum(F.col("value") * F.col("value")).alias("sum_sq"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.expr("hll_sketch_agg(user_id)").alias("users_hll"),
        F.array(
            *[
                F.count(
                    F.when(
                        F.width_bucket(
                            "value",
                            F.lit(HIST_LO),
                            F.lit(HIST_HI),
                            F.lit(HIST_BINS),
                        )
                        == i,
                        1,
                    )
                )
                for i in range(HIST_BINS + 2)
            ]
        ).alias("value_hist"),
    )


def _combine(stacked: DataFrame) -> DataFrame:
    """Merge stacked partials (stored ∪ incoming) back to one row/key —
    every aggregate here is the MERGE form of its partial."""
    return stacked.groupBy(*ROLLUP_KEYS).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.sum("sum_sq").alias("sum_sq"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.expr("hll_union_agg(users_hll)").alias("users_hll"),
        F.array(
            *[
                F.sum(F.element_at("value_hist", i + 1))
                for i in range(HIST_BINS + 2)
            ]
        ).alias("value_hist"),
        F.max("last_batch_id").alias("last_batch_id"),
    )


def merge_batch(
    spark: SparkSession,
    rollup_path: str,
    batch: DataFrame,
    batch_id: int,
) -> bool:
    """Absorb one micro-batch into the versioned rollup table (one
    atomic manifest commit per batch); returns False if ``batch_id``
    was already absorbed (idempotent replay no-op)."""
    part = _partial(batch).withColumn(
        "last_batch_id", F.lit(batch_id).cast("long")
    ).localCheckpoint(eager=True)
    days = [r[0] for r in part.select("day").distinct().collect()]
    if not days:
        # empty batch — and deliberately checked BEFORE the existence
        # branch: an empty FIRST batch must not create a zero-row
        # partitioned dataset (no data files -> every later read would
        # die with UNABLE_TO_INFER_SCHEMA, permanently poisoning the
        # table)
        return True
    root = Path(rollup_path)
    if not (root / MANIFEST).exists():
        if root.exists() and any(root.glob("day=*")):
            # legacy plain-parquet rollup (pre-versioned sink): adopt
            # its accumulated state as version 1 instead of silently
            # shadowing it with a table containing only this batch —
            # that would reset every aggregate AND the last_batch_id
            # replay ledger
            commit_version(
                spark.read.parquet(rollup_path),
                rollup_path,
                partition_by="day",
                num_files=1,
            )
        else:
            commit_version(
                part, rollup_path, partition_by="day", num_files=1
            )
            return True

    stored = read_version(spark, rollup_path)
    # replay detection stays partition-pruned: a crash-replayed batch
    # re-reads the same source files, so its touched days are identical
    # and carry its batch id — no need to scan the table's full history.
    # partition_pred (not isin) so a NULL day — events with NULL ts roll
    # up under __HIVE_DEFAULT_PARTITION__ — merges instead of being
    # invisible to the slice (replay would double-count it and the swap
    # would overwrite its history).
    slice_df = stored.filter(partition_pred("day", days))
    # explicit None check, NOT `or -1`: foreachBatch ids start at 0 and
    # a stored last_batch_id of 0 is falsy — the truthiness spelling
    # would re-merge a crash-replayed batch 0 and double-count every
    # aggregate of the table-creating batch.
    max_absorbed = slice_df.select(F.max("last_batch_id")).first()[0]
    if (max_absorbed if max_absorbed is not None else -1) >= batch_id:
        return False  # crash-replay of an already-merged batch

    merged = _combine(slice_df.unionByName(part))
    # single-writer by streaming contract, so no retries: a concurrent
    # writer is a deployment bug and must surface as
    # ConcurrentWriteError, not be silently serialized around
    merge_versioned(
        spark,
        rollup_path,
        merged,
        key_cols=ROLLUP_KEYS,
        partition_col="day",
        num_files=1,
    )
    return True


def start_rollup_stream(
    spark: SparkSession,
    events_dir: str,
    rollup_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    vacuum_every: int = 0,
    keep_last: int = 2,
) -> StreamingQuery:
    """readStream over a directory of events parquet files →
    ``merge_batch`` per micro-batch.  ``max_files_per_trigger`` forces
    multi-batch processing (tests); production leaves it unset and lets
    the source batch naturally.

    ``vacuum_every`` > 0 bounds the table's version history: every N
    micro-batches the single writer vacuums old versions down to
    ``keep_last`` (the same in-writer maintenance cadence as
    dedup-ingest's ``compact_every``).  Without it a long-running
    stream commits one version per batch forever — hard links keep the
    BYTES cheap, but file/metadata counts and the manifest grow without
    bound.  Running inside ``foreachBatch`` means no writer is ever
    mid-flight when the vacuum sweeps staging dirs, and time travel
    still reaches the ``keep_last`` newest versions."""
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)

    def _absorb(b: DataFrame, bid: int) -> None:
        merge_batch(spark, rollup_path, b, bid)
        if (
            vacuum_every > 0
            and (bid + 1) % vacuum_every == 0
            and (Path(rollup_path) / MANIFEST).exists()
        ):
            vacuum(rollup_path, keep_last=keep_last)

    writer = stream.writeStream.foreachBatch(_absorb).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(
    spark: SparkSession, rollup_path: str, version: int | None = None
) -> DataFrame:
    """The rollup table's latest committed snapshot (or a time-travel
    ``version``) — readers go through the manifest, never the raw
    directory tree, so a mid-merge read is impossible to tear."""
    return read_version(spark, rollup_path, version)


def hist_quantile(hist: list[int], q: float) -> float:
    """Approximate quantile from a stored ``value_hist`` array: find the
    bucket where the cumulative count crosses q·total and interpolate
    linearly inside it.  Error ≤ one bin width for in-range data; the
    open-ended edge buckets answer with their finite boundary."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    total = sum(hist)
    if total == 0:
        raise ValueError("empty histogram")
    width = (HIST_HI - HIST_LO) / HIST_BINS
    target = q * total
    cum = 0
    for i, n in enumerate(hist):
        if cum + n >= target and n > 0:
            frac = (target - cum) / n
            if i == 0:  # underflow bucket: no lower bound to lerp from
                return HIST_LO
            if i == HIST_BINS + 1:  # overflow bucket
                return HIST_HI
            lo = HIST_LO + (i - 1) * width
            return lo + frac * width
        cum += n
    return HIST_HI


def with_user_estimate(df: DataFrame) -> DataFrame:
    """Decode the stored HLL state into the per-key distinct-user
    estimate a dashboard reads."""
    return df.withColumn(
        "approx_users", F.expr("hll_sketch_estimate(users_hll)")
    ).drop("users_hll")


def rollup_of(events: DataFrame) -> DataFrame:
    """The batch (from-scratch) answer the incremental table must equal:
    same aggregates over the full event history, minus the bookkeeping
    column."""
    return _partial(events)


def rollup_verify(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    rel_tol: float = 1e-9,
) -> DataFrame:
    """Reconciliation audit: compare the stored incremental table
    against the from-scratch aggregate over the raw history — the
    periodic drift check a production rollup runs (a bug, a manual
    table edit, or a non-idempotent replay shows up as changed/added/
    removed keys; a healthy table is 100% unchanged).  Returns
    (ROLLUP_KEYS..., diff_status) like :func:`operators.diff.
    snapshot_diff`, but with the comparison the float semantics
    demand: ACCUMULATED sums (sum_value, sum_sq) differ in their last
    bits between the incremental and from-scratch addition orders, so
    they compare under ``rel_tol`` relative tolerance (hashing rounded
    floats would false-alarm at scale); counts, histograms, min/max
    (order-independent), and the DECODED HLL estimate (stored sketch
    bytes are representation-dependent) compare exactly.  The key join
    is null-safe (NULL-day history must reconcile, not false-alarm)."""

    def canon(df: DataFrame, tag: str) -> DataFrame:
        return with_user_estimate(df).select(
            *[F.col(k).alias(f"{tag}_{k}") for k in ROLLUP_KEYS],
            *[
                F.col(c).alias(f"{tag}_{c}")
                for c in (
                    "n_events", "sum_value", "sum_sq", "min_value",
                    "max_value", "approx_users",
                )
            ],
            F.col("value_hist").cast("array<long>").alias(f"{tag}_hist"),
        )

    truth = canon(rollup_of(events), "t")
    stored = canon(
        read_version(spark, rollup_path).drop("last_batch_id"), "s"
    )
    cond = None
    for k in ROLLUP_KEYS:
        c = truth[f"t_{k}"].eqNullSafe(stored[f"s_{k}"])
        cond = c if cond is None else (cond & c)
    joined = truth.join(stored, cond, "full_outer")

    def close(c: str):  # accumulated floats: relative tolerance
        t, s = F.col(f"t_{c}"), F.col(f"s_{c}")
        return F.abs(t - s) <= F.lit(rel_tol) * F.greatest(
            F.abs(t), F.abs(s), F.lit(1.0)
        )

    exact = [
        F.col(f"t_{c}").eqNullSafe(F.col(f"s_{c}"))
        for c in ("n_events", "min_value", "max_value", "approx_users")
    ] + [F.col("t_hist").eqNullSafe(F.col("s_hist"))]
    same = F.lit(True)
    for e in exact + [close("sum_value"), close("sum_sq")]:
        same = same & e
    return joined.select(
        *[
            F.coalesce(F.col(f"t_{k}"), F.col(f"s_{k}")).alias(k)
            for k in ROLLUP_KEYS
        ],
        F.when(F.col("s_n_events").isNull(), F.lit("removed"))
        .when(F.col("t_n_events").isNull(), F.lit("added"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("diff_status"),
    )

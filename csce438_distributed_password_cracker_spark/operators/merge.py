"""Copy-on-write MERGE (upsert + delete) into a plain-parquet table,
with partition pruning — the Delta/Iceberg ``MERGE INTO`` shape without
a table format.

Reference analog: none (north-star extension, BASELINE.json).  A corpus
pipeline needs this constantly: late-arriving document fixes, metadata
backfills, takedown/tombstone removals — a trickle of changes against a
100 TB table that must NOT cost a full rewrite.

The 100 TB contract this module encodes:

- **Touch only the partitions the delta touches.**  The delta's
  distinct partition values are computed first (the delta is small by
  contract); the target is then read with an ``isin`` partition filter,
  so planning prunes every untouched partition directory — merge cost
  is proportional to the CHANGED slice of the table, not its size.
  Untouched partition directories are never read, rewritten, or even
  listed beyond planning.
- **Broadcast the delta's keys.**  The upsert anti-join (drop target
  rows whose key the delta replaces) broadcasts the delta, so the
  touched slice streams through a map-side hash join — no shuffle of
  the big side.
- **Swap directories, don't overwrite in place.**  The rewritten
  partitions are written to a temp dataset and swapped per-directory
  (write-new → rename-old-away → rename-new-in → delete-old), the same
  discipline as :func:`operators.maintenance.compact_parquet` and with
  the same caveat: on an object store, flip a manifest/metastore
  pointer instead — plain renames are only per-directory atomic on a
  real filesystem.

Deletes ride the same pass: delta rows flagged by ``delete_col`` act as
tombstones — their keys are removed from the target and the tombstone
row itself is not inserted.  An unpartitioned target degenerates to a
bounded full rewrite (one "partition"), which is still the correct
semantics — just without pruning to save.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _key_cond(left: DataFrame, right: DataFrame, key_cols: list[str]):
    """Null-safe conjunction ``left.k <=> right.__k_k`` over the key
    columns (the right side carries ``__k_``-prefixed aliases so the
    join condition is unambiguous)."""
    cond = None
    for k in key_cols:
        c = left[k].eqNullSafe(right[f"__k_{k}"])
        cond = c if cond is None else (cond & c)
    return cond


def partition_pred(part_col: str, values: list):
    """Predicate matching ``part_col`` against a value list INCLUDING
    None — plain ``isin`` follows SQL IN semantics and never matches
    NULL, which is exactly wrong for pruning toward the
    ``__HIVE_DEFAULT_PARTITION__`` directory."""
    non_null = [v for v in values if v is not None]
    pred = F.col(part_col).isin(non_null) if non_null else F.lit(False)
    if any(v is None for v in values):
        pred = pred | F.col(part_col).isNull()
    return pred


def _partition_dir(spark: SparkSession, part_col: str, value) -> str:
    """Hive-style directory name for one partition value — rendered by
    Spark's OWN path escaper (ExternalCatalogUtils.escapePathName), so
    values needing escaping (':', '/', '%', …) map to the exact
    directory ``DataFrameWriter.partitionBy`` wrote; a hand-rolled
    format here would silently miss the swap for such values."""
    if value is None:
        return f"{part_col}=__HIVE_DEFAULT_PARTITION__"
    if isinstance(value, bool):  # Spark writes true/false lowercase
        return f"{part_col}={str(value).lower()}"
    escaped = (
        spark._jvm.org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(str(value))
    )
    return f"{part_col}={escaped}"


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    delta: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
    delete_col: str | None = None,
    files_per_partition: int = 4,
) -> dict[str, int]:
    """MERGE ``delta`` into the parquet table at ``target_path``:
    delta rows replace target rows with the same ``key_cols`` (last
    writer wins), new keys are inserted, and rows where ``delete_col``
    is true are tombstones (key removed, row not inserted).

    Returns ``{"partitions_touched": ..., "partitions_total": ...,
    "rows_upserted": ..., "rows_deleted": ...}``.

    ``partition_col`` must be the target's hive partition column when
    the target is partitioned (pruning + per-directory swap); omit it
    for an unpartitioned target (full copy-on-write rewrite).  The
    delta must carry the target's data columns (plus ``delete_col``);
    tombstone rows only need their key and partition values.

    Partition-moving keys: pruning is only sound if a key's partition
    value never changes (the Delta/Iceberg partition-predicate-merge
    assumption).  When ``partition_col`` is part of ``key_cols`` a move
    is impossible and nothing extra is read; otherwise the UNTOUCHED
    partitions' key columns are scanned (column-pruned) and the merge
    raises if a delta key already lives outside the touched slice —
    silently leaving a stale duplicate would be worse than the scan.
    """
    src = Path(target_path)
    if not src.exists():
        raise FileNotFoundError(target_path)
    if not key_cols:
        raise ValueError("key_cols must be non-empty")

    # the delta is small by contract and is consumed several times
    # (counts, partition values, claimed keys, the rewrite) — pay its
    # plan exactly once.  For streaming callers the delta is itself an
    # aggregation over stored state; without this it re-executes per use.
    delta = delta.localCheckpoint(eager=True)

    target = spark.read.parquet(target_path)
    data_cols = target.columns  # includes partition_col (Spark appends it)
    if delete_col is not None and delete_col not in delta.columns:
        raise ValueError(f"delete_col {delete_col!r} not in delta columns")

    is_del = (
        F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )
    upserts = delta.filter(~is_del)
    tombstones = delta.filter(is_del)
    missing = [c for c in data_cols if c not in upserts.columns]
    if missing:
        raise ValueError(f"delta is missing target columns: {missing}")

    n_upsert = upserts.count()
    n_delete = tombstones.count()

    if partition_col is not None:
        if partition_col not in delta.columns:
            raise ValueError(
                f"partition_col {partition_col!r} not in delta columns"
            )
        touched = [
            r[0]
            for r in delta.select(partition_col).distinct().collect()
        ]
        # isin on the partition column prunes untouched directories at
        # planning time (PartitionFilters in the scan).  SQL's IN never
        # matches NULL, so a null partition value (the
        # __HIVE_DEFAULT_PARTITION__ directory) needs its own predicate
        # — without it the null partition's existing rows would be
        # dropped from `kept` while its directory still gets swapped.
        touched_pred = partition_pred(partition_col, touched)
        slice_df = target.filter(touched_pred)
        part_dirs = {_partition_dir(spark, partition_col, v) for v in touched}
        total_parts = sum(
            1 for p in src.iterdir()
            if p.is_dir() and p.name.startswith(f"{partition_col}=")
        )
        if partition_col not in key_cols:
            # keys CAN move partitions under this schema: a delta key
            # already stored in an untouched partition would survive as
            # a stale duplicate.  Column-pruned scan of the untouched
            # remainder, broadcast semi-join against the delta's keys.
            # ~touched_pred is null-hostile (NULL partition rows would
            # escape the check), so spell the complement null-safely.
            rest = target.filter(
                F.coalesce(~touched_pred, F.lit(True))
            ).select(*key_cols)
            delta_keys = delta.select(
                *[F.col(k).alias(f"__k_{k}") for k in key_cols]
            ).distinct()
            moved = (
                rest.join(
                    F.broadcast(delta_keys),
                    _key_cond(rest, delta_keys, key_cols),
                    "left_semi",
                )
                .limit(1)
                .count()
            )
            if moved:
                raise ValueError(
                    "delta moves existing key(s) across partitions; "
                    "rewrite the old partition too (include it in the "
                    "delta as tombstones) or key the table by its "
                    "partition column"
                )
    else:
        touched, part_dirs = [], set()
        slice_df = target
        total_parts = 1

    # keys the delta claims (upserts replace, tombstones remove) — small
    # by contract, so the anti-join broadcasts and the touched slice
    # never shuffles.  NULL-SAFE key equality: with plain equality a
    # NULL key component never matches, so the stored row would survive
    # the anti-join AND the delta row would be inserted — a duplicate.
    claimed = delta.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols]
    ).distinct()
    kept = slice_df.join(
        F.broadcast(claimed), _key_cond(slice_df, claimed, key_cols), "left_anti"
    )
    merged = kept.unionByName(upserts.select(*data_cols))

    tmp = src.with_name(src.name + ".__merge_tmp__")
    old = src.with_name(src.name + ".__merge_old__")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    if partition_col is not None:
        (
            merged.repartition(files_per_partition, partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(str(tmp))
        )
        # swap ONLY the touched partition directories; everything else
        # in the target is untouched on disk
        old.mkdir()
        for d in sorted(part_dirs):
            cur, new = src / d, tmp / d
            if cur.exists():
                cur.rename(old / d)
            if new.exists():  # fully-deleted partitions vanish
                new.rename(cur)
        # safety net: every partition the rewrite produced must have been
        # swapped in — a leftover means the directory-name derivation
        # disagreed with what Spark wrote (silent data loss otherwise)
        leftover = [
            p.name
            for p in tmp.iterdir()
            if p.is_dir() and p.name.startswith(f"{partition_col}=")
        ]
        if leftover:
            raise RuntimeError(
                f"merge produced partitions not covered by the swap set: "
                f"{leftover} (dir-name escaping mismatch?)"
            )
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
    else:
        merged.repartition(files_per_partition).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        src.rename(old)
        tmp.rename(src)
        shutil.rmtree(old, ignore_errors=True)

    return {
        "partitions_touched": len(part_dirs) if partition_col else 1,
        "partitions_total": total_parts,
        "rows_upserted": n_upsert,
        "rows_deleted": n_delete,
    }

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
  contract); the target is then read with a partition-tuple filter,
  so planning prunes every untouched partition directory — merge cost
  is proportional to the CHANGED slice of the table, not its size.
  Untouched partition directories are never read, rewritten, or even
  listed beyond planning.  Multi-level hive layouts (e.g.
  ``day=…/source=…``) prune at every level.
- **Broadcast the delta's keys.**  The upsert anti-join (drop target
  rows whose key the delta replaces) broadcasts the delta, so the
  touched slice streams through a map-side hash join — no shuffle of
  the big side.
- **Swap directories, don't overwrite in place.**  The rewritten
  partitions are written to a temp dataset, the derived swap set is
  VALIDATED against what Spark actually wrote (a rendering mismatch
  aborts with the target untouched — never half-merged), then swapped
  per-leaf-directory (rename-old-away → rename-new-in → delete-old),
  the same discipline as :func:`operators.maintenance.compact_parquet`
  and with the same caveat: on an object store, flip a
  manifest/metastore pointer instead — plain renames are only
  per-directory atomic on a real filesystem.

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

# Characters Hive/Spark escape in partition path names
# (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
# .charToEscape, itself a port of Hive's FileUtils): ASCII control
# chars, DEL, and the shell/URI-special set below.
_ESCAPE_CHARS = frozenset(chr(c) for c in range(0x01, 0x20)) | frozenset(
    '"#%\'*/:=?\\\x7f{[]^'
)

DEFAULT_PARTITION_NAME = "__HIVE_DEFAULT_PARTITION__"


def escape_path_name(s: str) -> str:
    """Pure-Python port of Spark's partition-path escaping (each
    escaped char becomes ``%XX`` uppercase hex).  Ported rather than
    called through ``spark._jvm`` — the private-JVM route is
    unavailable under Spark Connect, and the swap set is pre-validated
    against the written directories anyway (see ``merge_upsert``), so a
    divergence aborts cleanly instead of corrupting the target."""
    return "".join(
        f"%{ord(c):02X}" if c in _ESCAPE_CHARS else c for c in s
    )


def _write_salt(key_cols: list[str], n: int):
    """Deterministic per-row salt in [0, n) for the rewrite's
    repartition: hash-partitioning on the partition columns alone lands
    each leaf's rows in ONE task (same tuple → same hash), so a large
    touched partition would funnel through a single writer and emerge
    as one oversized file.  Salting by the row's key hash spreads each
    leaf over up to ``n`` tasks/files — the file-sizing knob actually
    working at cluster scale.  (The repartition widens numPartitions
    ×4 so distinct (leaf, salt) combos rarely collide into one
    shuffle partition; a collision only merges files, never splits a
    leaf across unintended directories.)"""
    return F.pmod(F.xxhash64(*key_cols), F.lit(n))


def _key_cond(left: DataFrame, right: DataFrame, key_cols: list[str]):
    """Null-safe conjunction ``left.k <=> right.__k_k`` over the key
    columns (the right side carries ``__k_``-prefixed aliases so the
    join condition is unambiguous)."""
    cond = None
    for k in key_cols:
        c = left[k].eqNullSafe(right[f"__k_{k}"])
        cond = c if cond is None else (cond & c)
    return cond


def normalize_empty_partition_values(
    delta: DataFrame, part_cols: list[str]
) -> DataFrame:
    """'' -> NULL in the delta's string partition columns ('' and NULL
    are the SAME physical hive partition; see merge_upsert)."""
    from pyspark.sql.types import StringType

    for c in part_cols:
        if c in delta.columns and isinstance(
            delta.schema[c].dataType, StringType
        ):
            delta = delta.withColumn(c, F.nullif(F.col(c), F.lit("")))
    return delta


def normalize_partition_cols(
    partition_cols: str | list[str] | None,
) -> list[str]:
    """Accept a single column name or a list; return a list (possibly
    empty).  Single-column callers keep their ``partition_col="day"``
    spelling."""
    if partition_cols is None:
        return []
    if isinstance(partition_cols, str):
        return [partition_cols]
    return list(partition_cols)


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


def partition_tuple_pred(part_cols: list[str], tuples: list[tuple]):
    """Predicate matching the partition-column TUPLE against a list of
    touched tuples: OR over tuples of AND over null-safe per-column
    equality.  Touched sets are small by contract (the delta's distinct
    partition values), so the expression stays compact and Spark's
    partition pruning evaluates it at planning time."""
    if not tuples:
        return F.lit(False)
    pred = None
    for tup in tuples:
        conj = None
        for c, v in zip(part_cols, tup):
            eq = (
                F.col(c).isNull()
                if v is None
                else F.col(c).eqNullSafe(F.lit(v))
            )
            conj = eq if conj is None else (conj & eq)
        pred = conj if pred is None else (pred | conj)
    return pred


def _partition_level(part_col: str, value) -> str:
    """One ``col=value`` path segment, rendered like
    ``DataFrameWriter.partitionBy`` renders it."""
    if value is None or value == "":
        # Spark sends null AND empty-string values to the default
        # partition (ExternalCatalogUtils.getPartitionPathString)
        return f"{part_col}={DEFAULT_PARTITION_NAME}"
    if isinstance(value, bool):  # Spark writes true/false lowercase
        return f"{part_col}={str(value).lower()}"
    return f"{part_col}={escape_path_name(str(value))}"


def partition_rel_dir(part_cols: list[str], values: tuple) -> str:
    """Relative directory (possibly nested) for one partition tuple,
    e.g. ``day=2024-01-01/source=web``.  Values whose Python ``str()``
    differs from Spark's rendering (Decimal, timestamps) are caught by
    the pre-swap validation in ``merge_upsert`` — the merge aborts with
    the target untouched rather than swapping the wrong directory."""
    return "/".join(
        _partition_level(c, v) for c, v in zip(part_cols, values)
    )


def list_leaf_partitions(root: Path, part_cols: list[str]) -> list[str]:
    """Relative paths of every leaf partition directory under ``root``
    for the given hive layout depth (driver-side listing of DIRECTORY
    names only — O(partitions), not O(files))."""
    leaves: list[str] = []

    def walk(cur: Path, depth: int, rel: str) -> None:
        if depth == len(part_cols):
            leaves.append(rel)
            return
        prefix = f"{part_cols[depth]}="
        for p in sorted(cur.iterdir()):
            if p.is_dir() and p.name.startswith(prefix):
                walk(p, depth + 1, f"{rel}/{p.name}" if rel else p.name)

    walk(root, 0, "")
    return leaves


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    delta: DataFrame,
    key_cols: list[str],
    partition_col: str | list[str] | None = None,
    delete_col: str | None = None,
    files_per_partition: int = 4,
) -> dict[str, int]:
    """MERGE ``delta`` into the parquet table at ``target_path``:
    delta rows replace target rows with the same ``key_cols`` (last
    writer wins), new keys are inserted, and rows where ``delete_col``
    is true are tombstones (key removed, row not inserted).

    Returns ``{"partitions_touched": ..., "partitions_total": ...,
    "rows_upserted": ..., "rows_deleted": ...}``.

    ``partition_col`` is the target's hive partition column — a single
    name or a LIST for multi-level layouts like ``["day", "source"]``
    (pruning + per-leaf-directory swap); omit it for an unpartitioned
    target (full copy-on-write rewrite).  The delta must carry the
    target's data columns (plus ``delete_col``); tombstone rows only
    need their key and partition values.

    Partition-moving keys: pruning is only sound if a key's partition
    tuple never changes (the Delta/Iceberg partition-predicate-merge
    assumption).  When every partition column is part of ``key_cols``
    a move is impossible and nothing extra is read; otherwise the
    UNTOUCHED partitions' key columns are scanned (column-pruned) and
    the merge raises if a delta key already lives outside the touched
    slice — silently leaving a stale duplicate would be worse than the
    scan.
    """
    src = Path(target_path)
    if not src.exists():
        raise FileNotFoundError(target_path)
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    part_cols = normalize_partition_cols(partition_col)

    # normalize '' -> NULL in string partition columns BEFORE anything
    # consumes the delta: Spark's writer sends both to
    # __HIVE_DEFAULT_PARTITION__ and readers hand back NULL, so a ''
    # key component would never null-safe-match its stored twin (the
    # anti-join keeps the stored row AND inserts the delta row — a
    # silent duplicate key) and a '' touched tuple would miss the
    # stored slice entirely
    delta = normalize_empty_partition_values(delta, part_cols)

    # the delta is small by contract and is consumed several times
    # (counts, partition values, claimed keys, the rewrite) — pay its
    # plan exactly once.  For streaming callers the delta is itself an
    # aggregation over stored state; without this it re-executes per use.
    delta = delta.localCheckpoint(eager=True)

    target = spark.read.parquet(target_path)
    data_cols = target.columns  # includes partition cols (Spark appends)
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

    if part_cols:
        absent = [c for c in part_cols if c not in delta.columns]
        if absent:
            raise ValueError(
                f"partition column(s) {absent} not in delta columns"
            )
        touched = [
            # belt-and-braces '' -> None (the delta was already
            # normalized above; non-string partition types can't
            # carry '')
            tuple(None if v == "" else v for v in r)
            for r in delta.select(*part_cols).distinct().collect()
        ]
        # the tuple predicate prunes untouched directories at planning
        # time (PartitionFilters in the scan), null-safely — a null
        # partition value (the __HIVE_DEFAULT_PARTITION__ directory)
        # must merge, not vanish.
        touched_pred = partition_tuple_pred(part_cols, touched)
        slice_df = target.filter(touched_pred)
        part_dirs = {partition_rel_dir(part_cols, t) for t in touched}
        total_parts = len(list_leaf_partitions(src, part_cols))
        if any(c not in key_cols for c in part_cols):
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
                    "partition columns"
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

    if part_cols:
        (
            merged.repartition(
                4 * files_per_partition * max(1, len(part_dirs)),
                *part_cols,
                _write_salt(key_cols, files_per_partition),
            )
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(str(tmp))
        )
        # VALIDATE the derived swap set against what Spark actually
        # wrote BEFORE touching the target: a partition value whose
        # Python rendering diverges from Spark's (exotic Decimal /
        # timestamp formatting) must abort with the target fully
        # intact — the old post-swap check detected the mismatch only
        # after some renames had happened, leaving a half-merged table.
        written = set(list_leaf_partitions(tmp, part_cols))
        stray = sorted(written - part_dirs)
        if stray:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"merge wrote partitions outside the derived swap set: "
                f"{stray} (dir-name rendering mismatch?) — target left "
                f"untouched"
            )
        # the reverse direction: every touched dir must exist in the
        # target (a rewrite or full delete) or in tmp (a rewrite or a
        # brand-new partition).  A dir in NEITHER means the derived
        # name does not match what Spark renders (a fully-deleted
        # partition would otherwise silently SURVIVE — its real dir
        # never renamed away) — or the delta tombstones a partition
        # that never existed, which deserves a loud error too.
        unaccounted = sorted(
            d
            for d in part_dirs
            if d not in written and not (src / d).exists()
        )
        if unaccounted:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"touched partitions resolve to directories present "
                f"neither in the target nor in the rewrite: "
                f"{unaccounted} (dir-name rendering mismatch, or "
                f"tombstones for a partition that does not exist) — "
                f"target left untouched"
            )
        # swap ONLY the touched partition directories; everything else
        # in the target is untouched on disk.  Fully-deleted partitions
        # are in part_dirs but not in `written` — their target dir is
        # renamed away and nothing replaces it (they vanish).
        old.mkdir()
        for d in sorted(part_dirs):
            cur, new = src / d, tmp / d
            if cur.exists():
                dst = old / d
                dst.parent.mkdir(parents=True, exist_ok=True)
                cur.rename(dst)
            if new.exists():
                cur.parent.mkdir(parents=True, exist_ok=True)
                new.rename(cur)
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
        "partitions_touched": len(part_dirs) if part_cols else 1,
        "partitions_total": total_parts,
        "rows_upserted": n_upsert,
        "rows_deleted": n_delete,
    }

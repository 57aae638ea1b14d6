"""Versioned parquet tables — a minimal manifest-pointer format giving
plain parquet the three properties the directory-swap operators
(merge/compaction) honestly disclaim: ATOMIC commits, TIME TRAVEL, and
safe concurrent readers.

Reference analog: none (north-star extension, BASELINE.json); this is
the "table format lite" every production lakehouse interposes between
writers and raw parquet (Delta/Iceberg's transaction log, reduced to
its load-bearing core).

Layout::

    root/
      v00000001/part-*.parquet     immutable version directories
      v00000002/...
      _manifest.json               the POINTER (atomic rename commit)

Why this shape holds at 100 TB:

- **Commit = one rename.**  Data lands in a fresh version directory
  that no reader knows about, then the manifest is replaced via
  write-tmp → ``os.replace`` (atomic on POSIX).  A reader that loaded
  the manifest an instant earlier keeps reading its version's
  directory, which is immutable — no torn reads, no retry loops.  (On
  an object store, swap the rename for a conditional PUT of the
  manifest object — the layout is unchanged.)
- **Copy-on-write reuses unchanged files.**  ``merge_versioned``
  rewrites only the partitions the delta touches and HARD-LINKS every
  unchanged partition file into the new version directory — a new
  snapshot costs O(changed slice) I/O and O(files) metadata, never a
  table copy.  (Object-store variant: list unchanged files in the
  manifest instead of linking; same idea, file-level reuse.)
- **Time travel is free.**  Old versions are just directories the
  manifest's history remembers; ``read_version(..., version=N)`` pins
  one.  ``vacuum`` bounds disk by deleting directories beyond a
  retention count — the same maintenance cadence as compaction.
- **Single writer.**  Like every swap-based operator here, writers
  must be serialized (the streaming modules already run one writer);
  the manifest makes READERS safe, not writers concurrent.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .merge import _key_cond, partition_pred

MANIFEST = "_manifest.json"


def _load_manifest(root: Path) -> dict:
    with open(root / MANIFEST) as f:
        return json.load(f)


def _commit_manifest(root: Path, manifest: dict) -> None:
    tmp = root / (MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, root / MANIFEST)  # the atomic commit point


def _next_version(root: Path) -> tuple[int, dict]:
    if (root / MANIFEST).exists():
        m = _load_manifest(root)
        return m["version"] + 1, m
    return 1, {"version": 0, "dir": None, "history": []}


def commit_version(
    df: DataFrame,
    root_dir: str,
    partition_by: str | None = None,
    num_files: int = 4,
) -> int:
    """Write ``df`` as the table's next version (full snapshot) and
    atomically move the pointer; returns the new version number.
    ``partition_by`` is a TABLE property recorded in the manifest —
    hive partitioning is what lets :func:`merge_versioned` rewrite
    only touched partitions and hard-link the rest."""
    root = Path(root_dir)
    root.mkdir(parents=True, exist_ok=True)
    version, manifest = _next_version(root)
    if version > 1 and manifest.get("partition_by") != partition_by:
        raise ValueError(
            f"table is partitioned by {manifest.get('partition_by')!r}; "
            f"got partition_by={partition_by!r}"
        )
    vdir = f"v{version:08d}"
    # clear any orphan from a commit that crashed pre-manifest-rename
    # (unreferenced by construction); without this the retried commit
    # fails on 'path already exists' forever
    shutil.rmtree(root / vdir, ignore_errors=True)
    if partition_by:
        (
            df.repartition(num_files, partition_by)
            .write.partitionBy(partition_by)
            .parquet(str(root / vdir))
        )
    else:
        df.repartition(num_files).write.parquet(str(root / vdir))
    manifest["history"] = manifest["history"] + [
        {"version": version, "dir": vdir}
    ]
    manifest.update(version=version, dir=vdir, partition_by=partition_by)
    _commit_manifest(root, manifest)
    return version


def read_version(
    spark: SparkSession, root_dir: str, version: int | None = None
) -> DataFrame:
    """The table at ``version`` (default: latest).  The returned frame
    reads an immutable directory — later commits cannot tear it."""
    root = Path(root_dir)
    m = _load_manifest(root)
    if version is None:
        entry = {"version": m["version"], "dir": m["dir"]}
    else:
        matches = [h for h in m["history"] if h["version"] == version]
        if not matches:
            raise ValueError(
                f"version {version} not in history "
                f"{[h['version'] for h in m['history']]} (vacuumed?)"
            )
        entry = matches[0]
    if entry["dir"] is None:
        raise ValueError("table has no committed version")
    return spark.read.parquet(str(root / entry["dir"]))


def history(root_dir: str) -> list[dict]:
    """Commit log, oldest first (version numbers + directories)."""
    return list(_load_manifest(Path(root_dir))["history"])


def merge_versioned(
    spark: SparkSession,
    root_dir: str,
    delta: DataFrame,
    key_cols: list[str],
    partition_col: str,
    delete_col: str | None = None,
) -> int:
    """Copy-on-write MERGE as a NEW VERSION: rewrite only the
    partitions the delta touches, hard-link every other partition file
    from the current version, commit the pointer atomically; returns
    the new version.  Same upsert/tombstone semantics and constraints
    as :func:`operators.merge.merge_upsert` (partition-moving keys:
    key by the partition column or tombstone the old partition)."""
    from pyspark.sql import functions as F

    root = Path(root_dir)
    m = _load_manifest(root)
    if m["dir"] is None:
        raise ValueError("commit an initial version first")
    if m.get("partition_by") != partition_col:
        raise ValueError(
            f"table is partitioned by {m.get('partition_by')!r}; "
            f"merge asked for {partition_col!r} (commit_version with "
            "partition_by to enable partition-level copy-on-write)"
        )
    cur = root / m["dir"]
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if delete_col is not None and delete_col not in delta.columns:
        raise ValueError(f"delete_col {delete_col!r} not in delta columns")

    delta = delta.localCheckpoint(eager=True)
    target = spark.read.parquet(str(cur))
    data_cols = target.columns
    is_del = (
        F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )
    upserts = delta.filter(~is_del)
    missing = [c for c in data_cols if c not in upserts.columns]
    if missing:
        raise ValueError(f"delta is missing target columns: {missing}")
    touched = [r[0] for r in delta.select(partition_col).distinct().collect()]
    pred = partition_pred(partition_col, touched)

    # same kernel and constraints as merge_upsert — including its
    # partition-moving-key guard: a delta key stored in an UNtouched
    # partition would survive its hard-linked files as a stale duplicate
    claimed = delta.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols]
    ).distinct()
    if partition_col not in key_cols:
        rest = target.filter(
            F.coalesce(~pred, F.lit(True))
        ).select(*key_cols)
        if (
            rest.join(
                F.broadcast(claimed), _key_cond(rest, claimed, key_cols),
                "left_semi",
            )
            .limit(1)
            .count()
        ):
            raise ValueError(
                "delta moves existing key(s) across partitions; "
                "tombstone the old partition too or key the table by "
                "its partition column"
            )

    version, manifest = _next_version(root)
    vdir = root / f"v{version:08d}"
    # an orphan directory from a commit that crashed before its
    # manifest rename would wedge every future commit — it is
    # unreferenced by construction, so clear it
    shutil.rmtree(vdir, ignore_errors=True)

    # rewrite ONLY the touched slice, hive-partitioned
    slice_df = target.filter(pred)
    merged = slice_df.join(
        F.broadcast(claimed), _key_cond(slice_df, claimed, key_cols), "left_anti"
    ).unionByName(upserts.select(*data_cols))
    (
        merged.repartition(4, partition_col)
        .write.partitionBy(partition_col)
        .parquet(str(vdir))
    )

    # hard-link every UNtouched partition's files into the new version:
    # O(files) metadata, zero data copied, both versions readable
    from .merge import _partition_dir

    touched_dirs = {_partition_dir(spark, partition_col, v) for v in touched}
    for pdir in cur.iterdir():
        if not pdir.is_dir() or not pdir.name.startswith(f"{partition_col}="):
            continue
        if pdir.name in touched_dirs:
            continue
        dest = vdir / pdir.name
        dest.mkdir()
        for fp in pdir.iterdir():
            if fp.suffix == ".parquet" or fp.name.startswith("part-"):
                os.link(fp, dest / fp.name)

    manifest["history"] = manifest["history"] + [
        {"version": version, "dir": vdir.name}
    ]
    manifest.update(version=version, dir=vdir.name)
    _commit_manifest(root, manifest)
    return version


def vacuum(root_dir: str, keep_last: int = 2) -> list[int]:
    """Delete version directories beyond the newest ``keep_last``
    (hard links make retained versions self-sufficient — deleting an
    old directory never breaks a newer one).  Returns the removed
    version numbers; the manifest's history is trimmed to match."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    root = Path(root_dir)
    m = _load_manifest(root)
    hist = m["history"]
    drop, keep = hist[:-keep_last], hist[-keep_last:]
    # trim the manifest FIRST: a reader must never resolve a version
    # whose directory is mid-delete
    m["history"] = keep
    _commit_manifest(root, m)
    for h in drop:
        shutil.rmtree(root / h["dir"], ignore_errors=True)
    return [h["version"] for h in drop]

"""Versioned parquet tables — a minimal manifest-pointer format giving
plain parquet the three properties the directory-swap operators
(merge/compaction) honestly disclaim: ATOMIC commits, TIME TRAVEL, and
safe concurrent readers — plus, since round 4, OPTIMISTIC CONCURRENCY
for writers.

Reference analog: none (north-star extension, BASELINE.json); this is
the "table format lite" every production lakehouse interposes between
writers and raw parquet (Delta/Iceberg's transaction log, reduced to
its load-bearing core).

Layout::

    root/
      v00000001/part-*.parquet     immutable version directories
      v00000002/...
      _staging-<pid>-<nonce>/      in-flight writes (invisible to readers)
      _commit.lock                 tiny mutex around the commit point
      _manifest.json               the POINTER (atomic rename commit)

Why this shape holds at 100 TB:

- **Commit = one rename.**  Data lands in a fresh STAGING directory
  that no reader knows about; the commit critical section (guarded by
  a create-exclusive lock file) renames it to its version directory
  and replaces the manifest via write-tmp → ``os.replace`` (atomic on
  POSIX).  A reader that loaded the manifest an instant earlier keeps
  reading its version's directory, which is immutable — no torn
  reads, no retry loops.  The commit point is PLUGGABLE: the default
  :class:`PosixCommitBackend` (lock file + atomic rename) suits one
  host or any rename-atomic filesystem; :class:`CasCommitBackend`
  implements the OBJECT-STORE protocol — unique data-directory names
  plus a conditional PUT (compare-and-swap) of the manifest object —
  so a 100 TB deployment on S3/GCS swaps one class, not the layout.
- **Writers serialize via commit preconditions.**  Every write lands
  in its own uniquely-named staging directory, so concurrent writers
  never collide on disk; the commit point assigns the version number
  under the lock.  ``merge_versioned`` additionally carries the
  PARENT-VERSION PRECONDITION: its merged content was computed
  against a specific snapshot, so if another commit landed first the
  commit aborts with :class:`ConcurrentWriteError` (or transparently
  recomputes, with ``retries``) instead of silently clobbering the
  other writer's update — the lost-update anomaly a bare
  read-increment-rename scheme has.
- **Copy-on-write reuses unchanged files.**  ``merge_versioned``
  rewrites only the partitions the delta touches and HARD-LINKS every
  unchanged partition file into the new version directory — a new
  snapshot costs O(changed slice) I/O and O(files) metadata, never a
  table copy.  Multi-level hive layouts (``["day", "source"]``) link
  per leaf directory.  (Object-store variant: list unchanged files in
  the manifest instead of linking; same idea, file-level reuse.)
- **Time travel is free.**  Old versions are just directories the
  manifest's history remembers; ``read_version(..., version=N)`` pins
  one.  ``vacuum`` bounds disk by deleting directories beyond a
  retention count — the same maintenance cadence as compaction.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .merge import (
    _key_cond,
    list_leaf_partitions,
    normalize_empty_partition_values,
    normalize_partition_cols,
    partition_rel_dir,
    partition_tuple_pred,
)

MANIFEST = "_manifest.json"
COMMIT_LOCK = "_commit.lock"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this merge's snapshot read and
    its commit point; the merge result would clobber their update.
    Retry the merge against the new head (``merge_versioned`` does so
    itself when ``retries > 0``)."""


def _load_manifest(root: Path) -> dict:
    with open(root / MANIFEST) as f:
        return json.load(f)


def _write_manifest(root: Path, manifest: dict) -> None:
    tmp = root / (MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, root / MANIFEST)  # the atomic pointer flip


def _head(root: Path) -> dict:
    if (root / MANIFEST).exists():
        return _load_manifest(root)
    return {"version": 0, "dir": None, "history": []}


@contextmanager
def _commit_lock(root: Path, timeout: float = 30.0, poll: float = 0.05):
    """Create-exclusive lock file serializing the commit critical
    section (manifest read-check → staging rename → manifest replace).
    The section is a few syscalls, so contention is brief; a crashed
    writer leaves a stale lock that surfaces as a loud TimeoutError
    naming the file (delete it after confirming no writer is alive —
    the staging layout guarantees a crashed writer left no
    partially-visible state)."""
    lock = root / COMMIT_LOCK
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"commit lock {lock} not released in {timeout}s — "
                    f"stale lock from a crashed writer? verify and delete"
                )
            time.sleep(poll)
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        yield
    finally:
        os.unlink(lock)


def _staging_dir(root: Path) -> Path:
    """Unique per-attempt staging path: concurrent writers never
    collide on disk, and readers never see it (only manifest-referenced
    ``v*`` directories are ever read)."""
    return root / f"_staging-{os.getpid()}-{uuid.uuid4().hex[:8]}"


def _next_manifest(
    manifest: dict,
    partition_by: list[str],
    expected_parent: int | None,
    schema_json: str | None,
    vdir: str,
) -> tuple[int, dict]:
    """Pure commit bookkeeping shared by every backend: verify the
    preconditions against a manifest SNAPSHOT, assign the next version,
    return (version, new_manifest).  Raises :class:`ConcurrentWriteError`
    / ``ValueError`` without touching disk — the caller cleans staging."""
    if (
        expected_parent is not None
        and manifest["version"] != expected_parent
    ):
        raise ConcurrentWriteError(
            f"table advanced to v{manifest['version']} while this "
            f"merge was computed against v{expected_parent}"
        )
    stored_parts = normalize_partition_cols(manifest.get("partition_by"))
    if manifest["version"] > 0 and stored_parts != partition_by:
        raise ValueError(
            f"table is partitioned by {stored_parts!r}; "
            f"got partition_by={partition_by!r}"
        )
    version = manifest["version"] + 1
    entry = {"version": version, "dir": vdir}
    if schema_json is not None:
        # each version records ITS OWN schema: readers apply it so
        # hard-linked files from before an additive evolution read
        # back with the new columns as NULL, and time travel
        # returns each version's contemporary schema
        entry["schema"] = schema_json
    new = dict(manifest)
    new["history"] = manifest["history"] + [entry]
    new.update(
        version=version,
        dir=vdir,
        partition_by=partition_by if partition_by else None,
    )
    return version, new


class PosixCommitBackend:
    """Commit point for a POSIX filesystem (the default): a
    create-exclusive lock file serializes the critical section, the
    staging directory is RENAMED to its version directory (atomic), and
    the manifest is replaced via write-tmp → ``os.replace``.  Correct on
    one host or any filesystem with atomic rename + O_EXCL semantics
    (local disk, most cluster filesystems); NOT on object stores or NFS
    — use a conditional-PUT backend there (:class:`CasCommitBackend` is
    the protocol's shape)."""

    name = "posix"

    def commit(
        self,
        root: Path,
        staging: Path,
        partition_by: list[str],
        expected_parent: int | None,
        schema_json: str | None,
    ) -> int:
        with _commit_lock(root):
            manifest = _head(root)
            try:
                version, new = _next_manifest(
                    manifest, partition_by, expected_parent, schema_json,
                    vdir=f"v{manifest['version'] + 1:08d}",
                )
            except (ConcurrentWriteError, ValueError):
                shutil.rmtree(staging, ignore_errors=True)
                raise
            vdir = new["dir"]
            # an orphan directory from a writer that crashed after the
            # staging rename but before the manifest flip is unreferenced
            # by construction — clear it so the retried commit proceeds
            shutil.rmtree(root / vdir, ignore_errors=True)
            staging.rename(root / vdir)
            _write_manifest(root, new)
        return version

    def update_manifest(self, root: Path, fn) -> dict:
        """Serialized read-modify-write of the manifest (vacuum's trim):
        takes the SAME lock as commits, so a trim can never overwrite a
        concurrent commit's pointer with its stale copy."""
        with _commit_lock(root):
            new = fn(_load_manifest(root))
            _write_manifest(root, new)
        return new


class CasCommitBackend:
    """Commit point for an OBJECT STORE, where the only atomic primitive
    is a CONDITIONAL PUT of the manifest object (S3 ``If-Match`` /
    ``If-None-Match``, GCS ``x-goog-if-generation-match``, Azure ETag) —
    no lock files, no atomic directory rename.

    Protocol per commit attempt (the Delta/Iceberg log-commit shape,
    reduced to one pointer object):

    1. GET the manifest (content = the ETag stand-in).
    2. Upload the data under a UNIQUE version directory name
       (``vNNNNNNNN-<nonce>``): two racing writers targeting the same
       version number never collide on a data path, and unreferenced
       uploads are invisible to readers (only manifest-referenced dirs
       are ever read) — vacuum sweeps the losers.
    3. Conditional-PUT the new manifest iff the stored manifest is
       byte-identical to the snapshot read in (1).  Lost the race →
       un-publish and either raise :class:`ConcurrentWriteError` (merge
       commits, whose content depends on the parent) or re-read and
       retry (full snapshots, whose content does not).

    This implementation SIMULATES the store's server-side atomicity with
    a process-local mutex around compare+replace — a faithful test
    double for the protocol; a real deployment swaps ``_cas`` for the
    store's conditional PUT and ``_publish`` for an upload, and nothing
    above this class changes."""

    name = "cas"

    def __init__(self) -> None:
        import threading

        self._atomic = threading.Lock()

    @staticmethod
    def _snapshot(root: Path) -> tuple[dict, bytes | None]:
        p = root / MANIFEST
        if p.exists():
            b = p.read_bytes()
            return json.loads(b), b
        return {"version": 0, "dir": None, "history": []}, None

    def _cas(
        self, root: Path, expected: bytes | None, new_manifest: dict
    ) -> bool:
        """Compare-and-swap on the manifest CONTENT (the ETag analog —
        any concurrent change fails the swap, not just version bumps)."""
        with self._atomic:  # stands in for the store's atomicity
            p = root / MANIFEST
            current = p.read_bytes() if p.exists() else None
            if current != expected:
                return False
            _write_manifest(root, new_manifest)
            return True

    def commit(
        self,
        root: Path,
        staging: Path,
        partition_by: list[str],
        expected_parent: int | None,
        schema_json: str | None,
    ) -> int:
        while True:
            manifest, etag = self._snapshot(root)
            try:
                version, new = _next_manifest(
                    manifest, partition_by, expected_parent, schema_json,
                    vdir=(
                        f"v{manifest['version'] + 1:08d}-"
                        f"{uuid.uuid4().hex[:8]}"
                    ),
                )
            except (ConcurrentWriteError, ValueError):
                shutil.rmtree(staging, ignore_errors=True)
                raise
            vdir = new["dir"]
            staging.rename(root / vdir)  # the "upload" — unreferenced
            if self._cas(root, etag, new):
                return version
            if expected_parent is not None:
                # merge content depends on the parent snapshot: the
                # caller (merge_versioned) recomputes, we just clean up
                shutil.rmtree(root / vdir, ignore_errors=True)
                raise ConcurrentWriteError(
                    "manifest changed under this merge's conditional "
                    f"put (computed against v{expected_parent})"
                )
            # full snapshot: content is parent-independent, reuse the
            # uploaded data and re-contend against the new head
            try:
                (root / vdir).rename(staging)
            except FileNotFoundError:
                # a concurrent vacuum swept this upload as an orphan
                # (its version fell at/below the advanced head) — the
                # data is gone, fail loudly rather than loop
                raise ConcurrentWriteError(
                    f"upload {vdir} was swept by a concurrent vacuum "
                    "while losing the manifest race; re-run the write"
                ) from None

    def update_manifest(self, root: Path, fn) -> dict:
        """CAS-retry read-modify-write (vacuum's trim): recomputes the
        update from the freshest manifest until the conditional put
        lands, so it can never roll back a concurrent commit."""
        while True:
            manifest, etag = self._snapshot(root)
            new = fn(manifest)
            if self._cas(root, etag, new):
                return new


_POSIX_BACKEND = PosixCommitBackend()


def _commit_staged(
    root: Path,
    staging: Path,
    partition_by: list[str],
    expected_parent: int | None,
    schema_json: str | None = None,
    backend: "PosixCommitBackend | CasCommitBackend | None" = None,
) -> int:
    """The commit point: delegate to the table's commit backend (POSIX
    lock+rename by default; conditional-PUT for object stores).
    Returns the new version."""
    return (backend or _POSIX_BACKEND).commit(
        root, staging, partition_by, expected_parent, schema_json
    )


def commit_version(
    df: DataFrame,
    root_dir: str,
    partition_by: str | list[str] | None = None,
    num_files: int = 4,
    backend=None,
) -> int:
    """Write ``df`` as the table's next version (full snapshot) and
    atomically move the pointer; returns the new version number.
    ``partition_by`` is a TABLE property recorded in the manifest — a
    single column or a list for multi-level hive layouts — and is what
    lets :func:`merge_versioned` rewrite only touched partitions and
    hard-link the rest.  ``num_files`` sizes the write (files per
    partition for a partitioned table); tune it so files land near the
    100–1024 MB sweet spot at the table's real scale."""
    root = Path(root_dir)
    root.mkdir(parents=True, exist_ok=True)
    part_cols = normalize_partition_cols(partition_by)
    staging = _staging_dir(root)
    if part_cols:
        (
            df.repartition(num_files, *part_cols)
            .write.partitionBy(*part_cols)
            .parquet(str(staging))
        )
    else:
        df.repartition(num_files).write.parquet(str(staging))
    # full snapshots carry no parent precondition: their content does
    # not depend on the previous version, so "serialize after whoever
    # got there first" is the correct semantics
    return _commit_staged(
        root, staging, part_cols, expected_parent=None,
        schema_json=df.schema.json(), backend=backend,
    )


def _read_entry(spark: SparkSession, root: Path, entry: dict) -> DataFrame:
    """Read one version directory, applying the version's RECORDED
    schema when present: files hard-linked from before an additive
    evolution lack the new columns, and an explicit schema makes the
    parquet reader fill them with NULL (schema-on-read) instead of
    whatever the first-listed file happens to carry."""
    path = str(root / entry["dir"])
    sj = entry.get("schema")
    if sj is None:  # manifest written before schemas were recorded
        return spark.read.parquet(path)
    from pyspark.sql.types import StructType

    return spark.read.schema(
        StructType.fromJson(json.loads(sj))
    ).parquet(path)


def read_version(
    spark: SparkSession, root_dir: str, version: int | None = None
) -> DataFrame:
    """The table at ``version`` (default: latest).  The returned frame
    reads an immutable directory — later commits cannot tear it."""
    root = Path(root_dir)
    m = _load_manifest(root)
    if m["dir"] is None:
        raise ValueError("table has no committed version")
    if version is None:
        version = m["version"]
    matches = [h for h in m["history"] if h["version"] == version]
    if not matches:
        raise ValueError(
            f"version {version} not in history "
            f"{[h['version'] for h in m['history']]} (vacuumed?)"
        )
    entry = matches[0]
    if entry["dir"] is None:
        raise ValueError("table has no committed version")
    return _read_entry(spark, root, entry)


def history(root_dir: str) -> list[dict]:
    """Commit log, oldest first (version numbers + directories)."""
    return list(_load_manifest(Path(root_dir))["history"])


def table_changes(
    spark: SparkSession,
    root_dir: str,
    key_cols: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change data feed between two committed versions — one row per key
    whose payload differs, with ``diff_status`` ∈ {added, removed,
    changed} plus ``from_version``/``to_version`` audit columns (the
    Delta-Lake-CDF-shaped answer to "what did the pipeline change since
    version N?", derived ENTIRELY from the immutable version
    directories, so it works retroactively on tables that never logged
    per-commit deltas).

    Scale shape: both snapshots reduce map-side to (key, xxhash64) via
    operators/diff.snapshot_diff — one i64 per row crosses the shuffle,
    'unchanged' keys (the overwhelming majority between adjacent
    versions) are dropped before the caller sees them, and hard-linked
    files shared by the two versions still scan twice (acceptable: CDF
    consumers run this per-commit where both sides are partition-pruned
    reads; a file-level short-circuit would need file manifests per
    commit, which the design trades away for rename-only commits).
    """
    from pyspark.sql import functions as F

    from .diff import snapshot_diff

    m = _load_manifest(Path(root_dir))
    if to_version is None:
        to_version = m["version"]
    # existence FIRST: asking for changes since a version that never
    # existed must say "not in history", not "swap the arguments"
    known = [h["version"] for h in m["history"]]
    for v in (from_version, to_version):
        if v not in known:
            raise ValueError(
                f"version {v} not in history {known} (vacuumed?)"
            )
    if from_version > to_version:
        # swapped args would silently INVERT added/removed labels — an
        # audit consumer acting on backwards changes is worse than an
        # error
        raise ValueError(
            f"from_version {from_version} > to_version {to_version}: "
            "swap the arguments (the feed direction is from → to)"
        )
    before = read_version(spark, root_dir, from_version)
    after = read_version(spark, root_dir, to_version)
    d = snapshot_diff(before, after, key_cols)
    return d.where(F.col("diff_status") != "unchanged").select(
        "*",
        F.lit(from_version).alias("from_version"),
        F.lit(to_version).alias("to_version"),
    )


def _merge_once(
    spark: SparkSession,
    root: Path,
    delta: DataFrame,
    key_cols: list[str],
    part_cols: list[str],
    delete_col: str | None,
    num_files: int,
    allow_new_columns: bool,
    backend=None,
) -> int:
    """One optimistic merge attempt: snapshot the head, compute the
    merged touched slice against it, stage, commit with the
    parent-version precondition."""
    from pyspark.sql import functions as F

    m = _head(root)
    if m["dir"] is None:
        raise ValueError("commit an initial version first")
    stored_parts = normalize_partition_cols(m.get("partition_by"))
    if stored_parts != part_cols:
        raise ValueError(
            f"table is partitioned by {stored_parts!r}; "
            f"merge asked for {part_cols!r} (commit_version with "
            "partition_by to enable partition-level copy-on-write)"
        )
    parent = m["version"]
    cur = root / m["dir"]
    entry = [h for h in m["history"] if h["version"] == parent][0]

    target = _read_entry(spark, root, entry)
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
    # additive schema evolution (Delta mergeSchema-style): delta columns
    # beyond the target's schema extend it when opted in — kept rows and
    # every hard-linked old file read back with NULL there (the commit
    # records the widened schema; _read_entry applies it)
    extra_cols = [
        c
        for c in delta.columns
        if c not in data_cols and c != (delete_col or "")
    ]
    if not allow_new_columns:
        extra_cols = []  # silently pruned, as before (opt-in feature)
    out_cols = data_cols + extra_cols
    touched = [
        # '' -> None: both land in __HIVE_DEFAULT_PARTITION__ (see
        # merge_upsert) — distinct treatment would hard-link the old
        # default dir AND write a new one, duplicating its rows
        tuple(None if v == "" else v for v in r)
        for r in delta.select(*part_cols).distinct().collect()
    ]
    pred = partition_tuple_pred(part_cols, touched)

    # same kernel and constraints as merge_upsert — including its
    # partition-moving-key guard: a delta key stored in an UNtouched
    # partition would survive its hard-linked files as a stale duplicate
    claimed = delta.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols]
    ).distinct()
    if any(c not in key_cols for c in part_cols):
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
                "its partition columns"
            )

    # rewrite ONLY the touched slice, hive-partitioned, into staging
    staging = _staging_dir(root)
    slice_df = target.filter(pred)
    kept = slice_df.join(
        F.broadcast(claimed), _key_cond(slice_df, claimed, key_cols), "left_anti"
    )
    for c in extra_cols:
        kept = kept.withColumn(
            c, F.lit(None).cast(delta.schema[c].dataType)
        )
    merged = kept.unionByName(upserts.select(*out_cols))
    from .merge import _write_salt

    (
        merged.repartition(
            4 * num_files * max(1, len(touched)),
            *part_cols,
            _write_salt(key_cols, num_files),
        )
        .write.partitionBy(*part_cols)
        .parquet(str(staging))
    )

    # validate the rendered touched set against what Spark wrote BEFORE
    # linking: a rendering divergence would hard-link a touched
    # partition's OLD files alongside the newly-written ones — silent
    # duplicate data in the new version
    touched_dirs = {partition_rel_dir(part_cols, t) for t in touched}
    written = set(list_leaf_partitions(staging, part_cols))
    stray = sorted(written - touched_dirs)
    if stray:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"merge wrote partitions outside the derived touched set: "
            f"{stray} (dir-name rendering mismatch?) — nothing committed"
        )
    # and every touched dir must exist in the parent version or the
    # staging write: a dir in neither means the rendering diverged (a
    # fully-deleted partition's REAL dir would then be hard-linked
    # forward below — tombstoned rows committed into the new version)
    # or the delta tombstones a partition that never existed
    unaccounted = sorted(
        d
        for d in touched_dirs
        if d not in written and not (cur / d).exists()
    )
    if unaccounted:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"touched partitions resolve to directories present "
            f"neither in the parent version nor in the rewrite: "
            f"{unaccounted} (dir-name rendering mismatch, or tombstones "
            f"for a partition that does not exist) — nothing committed"
        )

    # hard-link every UNtouched leaf partition's files into staging:
    # O(files) metadata, zero data copied, both versions readable
    for rel in list_leaf_partitions(cur, part_cols):
        if rel in touched_dirs:
            continue
        src_leaf = cur / rel
        dest = staging / rel
        dest.mkdir(parents=True, exist_ok=True)
        for fp in src_leaf.iterdir():
            if fp.suffix == ".parquet" or fp.name.startswith("part-"):
                os.link(fp, dest / fp.name)

    return _commit_staged(
        root, staging, part_cols, expected_parent=parent,
        schema_json=merged.schema.json(), backend=backend,
    )


def merge_versioned(
    spark: SparkSession,
    root_dir: str,
    delta: DataFrame,
    key_cols: list[str],
    partition_col: str | list[str],
    delete_col: str | None = None,
    num_files: int = 4,
    retries: int = 0,
    allow_new_columns: bool = False,
    backend=None,
) -> int:
    """Copy-on-write MERGE as a NEW VERSION: rewrite only the
    partitions the delta touches, hard-link every other partition file
    from the current version, commit the pointer atomically; returns
    the new version.  Same upsert/tombstone semantics and constraints
    as :func:`operators.merge.merge_upsert` (partition-moving keys:
    key by the partition columns or tombstone the old partition);
    ``partition_col`` may be a list for multi-level layouts.

    Concurrency: the commit carries a parent-version precondition.  If
    another writer committed since this merge's snapshot read, the
    attempt raises :class:`ConcurrentWriteError` — with ``retries > 0``
    the merge transparently recomputes against the new head instead
    (each retry re-reads the head, so the serial history is correct:
    both writers' updates survive).

    ``allow_new_columns=True`` enables ADDITIVE schema evolution:
    delta columns beyond the target's schema are appended to the table
    schema (existing rows read back NULL there, including the
    hard-linked untouched partitions — each version's manifest entry
    records its schema and readers apply it); without the flag extra
    delta columns are pruned, as a guard against typo'd column names
    silently widening the table.

    ``num_files`` sizes the rewrite (files per touched partition);
    the default suits test-scale tables — at cluster scale set it so
    rewritten files land near the 100–1024 MB sweet spot, exactly as
    :func:`commit_version` already exposes."""
    root = Path(root_dir)
    part_cols = normalize_partition_cols(partition_col)
    if not part_cols:
        raise ValueError("merge_versioned requires partition column(s)")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if delete_col is not None and delete_col not in delta.columns:
        raise ValueError(f"delete_col {delete_col!r} not in delta columns")

    # '' -> NULL in string partition columns ('' and NULL are the same
    # physical hive partition — see merge_upsert), BEFORE the
    # checkpoint so every attempt sees the normalized delta
    delta = normalize_empty_partition_values(delta, part_cols)
    delta = delta.localCheckpoint(eager=True)
    attempts = retries + 1
    for i in range(attempts):
        try:
            return _merge_once(
                spark, root, delta, key_cols, part_cols, delete_col,
                num_files, allow_new_columns, backend,
            )
        except ConcurrentWriteError:
            if i == attempts - 1:
                raise
    raise AssertionError("unreachable")


def delete_where(
    spark: SparkSession,
    root_dir: str,
    predicate: str,
    key_cols: list[str],
    partition_col: str | list[str],
    num_files: int = 4,
    retries: int = 0,
    backend=None,
) -> tuple[int, int]:
    """Row-level DELETE as a new version — the GDPR-erasure / retention
    shape ("purge user X", "drop rows older than N days"): tombstone
    every current-head row matching the SQL ``predicate`` through the
    copy-on-write merge.  Returns ``(new_version, n_deleted)``;
    a predicate matching nothing commits no version (no-op, the current
    head is returned unchanged with ``n_deleted=0``).

    Scale shape: the matching pass is one partition-prunable scan of
    the head (Catalyst pushes the predicate into the parquet read; a
    predicate on the partition columns prunes directories at planning
    time), the delta carries ONLY (key, partition, tombstone) columns
    — never the payload — and the merge rewrites just the touched
    partitions, hard-linking the rest.  Note the ERASURE caveat hard
    links imply: older versions still reference the rows until
    :func:`vacuum` trims them — a compliance delete is
    ``delete_where`` + ``vacuum(keep_last=1)``.
    """
    part_cols = normalize_partition_cols(partition_col)
    head = read_version(spark, root_dir)
    victims = head.where(predicate).select(
        *dict.fromkeys([*key_cols, *part_cols])
    )
    from pyspark.sql import functions as F

    delta = victims.withColumn("__deleted", F.lit(True))
    # an all-tombstone delta still passes the merge's structural
    # payload-column contract: attach typed NULLs for the columns a
    # delete row never reads
    for f in head.schema.fields:
        if f.name not in delta.columns:
            delta = delta.withColumn(
                f.name, F.lit(None).cast(f.dataType)
            )
    # checkpoint BEFORE counting: the count and merge_versioned's own
    # eager checkpoint would otherwise each run the head predicate scan
    # — one pass instead of two
    delta = delta.localCheckpoint(eager=True)
    n = delta.count()
    if n == 0:
        return _load_manifest(Path(root_dir))["version"], 0
    v = merge_versioned(
        spark,
        root_dir,
        delta,
        key_cols=key_cols,
        partition_col=part_cols,
        delete_col="__deleted",
        num_files=num_files,
        retries=retries,
        backend=backend,
    )
    return v, n


def vacuum(root_dir: str, keep_last: int = 2, backend=None) -> list[int]:
    """Delete version directories beyond the newest ``keep_last``
    (hard links make retained versions self-sufficient — deleting an
    old directory never breaks a newer one), plus any abandoned
    ``_staging-*`` directories from crashed writers, plus any ORPHANED
    uploads — version directories no manifest references (a CAS writer
    that died between its upload and its conditional put leaks one;
    see :class:`CasCommitBackend`).  Orphans are swept only when their
    version number ≤ the current head: an in-flight upload always
    targets head+1, so it is never touched, while a stale one (head
    moved past it) has already lost its race — its conditional put can
    only fail.  Returns the removed version numbers; the manifest's
    history is trimmed to match.  Run on the maintenance cadence, when
    no writer is mid-flight (an in-flight writer's staging dir would
    be swept — its commit then fails loudly on the missing rename
    source, nothing corrupts)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    root = Path(root_dir)
    # the trim is a read-modify-write of the manifest, so it goes
    # through the backend's serialized update (POSIX: the same commit
    # lock as writers; CAS: conditional-put retry): an unserialized trim
    # racing a concurrent commit would overwrite the new head with its
    # stale copy — rolling the pointer back and orphaning the freshly
    # committed version
    dropped: dict[str, list] = {}

    def trim(m: dict) -> dict:
        hist = m["history"]
        # recompute from the FRESH manifest on every (CAS-retry) call
        dropped["drop"] = hist[:-keep_last]
        new = dict(m)
        # trim the manifest FIRST: a reader must never resolve a
        # version whose directory is mid-delete
        new["history"] = hist[-keep_last:]
        return new

    new_manifest = (backend or _POSIX_BACKEND).update_manifest(root, trim)
    drop = dropped["drop"]
    for h in drop:
        shutil.rmtree(root / h["dir"], ignore_errors=True)
    for p in root.glob("_staging-*"):
        shutil.rmtree(p, ignore_errors=True)
    # orphan sweep: unreferenced v*[-nonce] dirs at or below the head
    referenced = {h["dir"] for h in new_manifest.get("history", [])}
    if new_manifest.get("dir"):
        referenced.add(new_manifest["dir"])
    head = int(new_manifest.get("version", 0))
    for p in root.glob("v*"):
        m = re.match(r"^v(\d{8})(?:-[0-9a-f]{8})?$", p.name)
        if m and p.name not in referenced and int(m.group(1)) <= head:
            shutil.rmtree(p, ignore_errors=True)
    return [h["version"] for h in drop]

"""Scheme-aware filesystem metadata operations (exists / rename /
delete / list) for the maintenance paths that mutate on-disk datasets.

Spark's own reads and writes are already FS-agnostic (they go through
Hadoop), but the ENGINE-side metadata steps around them — the
compaction swap's renames, the existence probes, the file counts —
were POSIX `pathlib` calls, which silently operate on the LOCAL
filesystem even when the dataset lives at ``hdfs://`` / ``s3a://``.
This module routes those steps through the Hadoop ``FileSystem`` API
resolved from the path's scheme (the same discipline as
``streaming/ingest_common.index_exists``, ADVICE r6), falling back to
``pathlib`` only when no JVM handle exists (Spark Connect clients,
plain-local tooling) — and in that fallback a REMOTE path raises
instead of silently probing the wrong filesystem.

Atomicity contract for :func:`rename`: directory rename is atomic on
POSIX local filesystems and on HDFS; object stores (``s3a://``,
``gs://``, ...) implement it as copy+delete — O(data), NOT atomic.
:func:`warn_if_non_atomic_rename` makes that visible at the call site;
the object-store-safe commit shape is a manifest flip (the CAS backend
in operators/versioned.py), not a rename.
"""

from __future__ import annotations

import warnings
from pathlib import Path
from urllib.parse import urlsplit

from pyspark.sql import SparkSession

# schemes whose "rename" is a copy+delete (no atomic directory move)
_COPY_RENAME_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss", "cos"}
)


def scheme_of(path: str) -> str:
    """Lower-cased URI scheme of ``path`` ('' for plain local paths)."""
    return urlsplit(path).scheme.lower()


def sibling(path: str, suffix: str) -> str:
    """``path`` with ``suffix`` appended to its last component —
    URI-safe (no ``pathlib`` round-trip, which mangles ``file://``)."""
    return path.rstrip("/") + suffix


def _jvm_fs(spark: SparkSession, path: str):
    """(FileSystem, hadoop.fs.Path) for ``path``, or ``None`` when the
    session has no JVM handle (Spark Connect)."""
    try:
        jvm = spark._jvm
        jsc = spark._jsc
    except Exception:
        return None
    if jvm is None or jsc is None:
        return None
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(jsc.hadoopConfiguration()), jpath


def _local_or_raise(path: str, op: str) -> Path:
    """pathlib fallback target for ``path``; raises for remote schemes
    (a silent local-FS ``op`` against an hdfs://-resident dataset is
    exactly the corruption class this module exists to prevent)."""
    parts = urlsplit(path)
    if parts.scheme.lower() not in ("", "file"):
        raise RuntimeError(
            f"cannot {op} {parts.scheme}://-resident path without JVM "
            "filesystem access (Spark Connect client?)"
        )
    return Path(parts.path if parts.scheme else path)


def exists(spark: SparkSession, path: str) -> bool:
    """Scheme-aware existence probe."""
    fs = _jvm_fs(spark, path)
    if fs is not None:
        f, p = fs
        return bool(f.exists(p))
    return _local_or_raise(path, "probe").exists()


def listing_tag(spark: SparkSession, path: str, salt: str = "") -> int:
    """O(#files) **freshness/listing fingerprint** of a dataset: md5
    over file count + total bytes + the sorted file listing's (name,
    length, modification time), folded to a path-safe int.  Every
    normal rewrite of a parquet dataset changes mtime/size/names, so a
    regenerated table re-tags — the freshness signal build-once index
    paths key on — WITHOUT scanning a single data row.  This is the
    check a 100 TB probe can afford: the former per-call full-corpus
    hash aggregation dominated gate-probe cost at sf10 (a metadata
    listing is O(files) on any Hadoop filesystem; on object stores it
    is one LIST per prefix page).  Zero Spark jobs — pinned in tests.

    This is deliberately NOT a content fingerprint (ADVICE r9): a
    dataset rewritten in place with identical file names AND identical
    sizes AND mtimes within the same millisecond (object-store copy
    with preserved metadata; coarse-mtime filesystems) keeps its tag,
    and a stale index would be served.  Callers that need exact
    content invalidation must force a rebuild — ``salt`` is the escape
    hatch: any nonempty value folds into the hash, changing the tag
    (and therefore the tag-keyed index path) deterministically.  The
    gate/opbench probe paths wire it to ``$SPARK_GRAFT_FORCE_REBUILD``
    (plans/pipeline_queries._source_tag); deleting the index directory
    works too.  The limitation and the hatch are pinned in
    tests/test_maintenance.py."""
    import hashlib

    entries: list[str] = []
    fs = _jvm_fs(spark, path)
    if fs is not None:
        f, p = fs
        it = f.listFiles(p, True)  # recursive
        while it.hasNext():
            st = it.next()
            entries.append(
                f"{st.getPath().toString()}|{st.getLen()}|{st.getModificationTime()}"
            )
    else:
        base = _local_or_raise(path, "fingerprint")
        files = [base] if base.is_file() else sorted(base.rglob("*"))
        for fp in files:
            if fp.is_file():
                s = fp.stat()
                entries.append(f"{fp}|{s.st_size}|{s.st_mtime_ns // 1_000_000}")
    total_bytes = sum(int(e.split("|")[-2]) for e in entries)
    payload = (
        f"n={len(entries)}|bytes={total_bytes}|salt={salt}\n"
        + "\n".join(sorted(entries))
    )
    h = hashlib.md5(payload.encode()).hexdigest()
    return int(h, 16) % 1_000_000_007


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Scheme-aware rename; raises ``RuntimeError`` on failure.

    Hadoop's ``FileSystem.rename`` has two failure modes an unchecked
    call turns into silent corruption: it reports most failures by
    RETURNING False rather than raising, and when ``dst`` already
    exists as a directory it "succeeds" by moving ``src`` INSIDE it
    (the ``mv``-into-dir semantic) — nesting the dataset one level
    down.  This wrapper checks the return value AND refuses an
    existing destination up front, so the swap semantics are the same
    strict no-overwrite move on every filesystem."""
    fs = _jvm_fs(spark, src)
    if fs is not None:
        f, p = fs
        jdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
        if f.exists(jdst):
            raise RuntimeError(
                f"rename destination {dst!r} already exists — Hadoop "
                "rename would nest the source inside it, not replace it"
            )
        try:
            ok = f.rename(p, jdst)
        except Exception as e:  # some FS impls throw instead (local FS
            # raises FileNotFoundException for a missing source)
            raise RuntimeError(
                f"FileSystem.rename({src!r} -> {dst!r}) failed: {e}"
            ) from e
        if not ok:
            raise RuntimeError(
                f"FileSystem.rename({src!r} -> {dst!r}) returned false "
                "(destination exists, source missing, or cross-FS move)"
            )
        return
    lsrc, ldst = _local_or_raise(src, "rename"), _local_or_raise(dst, "rename")
    if ldst.exists():
        raise RuntimeError(
            f"rename destination {dst!r} already exists — refusing the "
            "overwrite/nesting ambiguity"
        )
    lsrc.rename(ldst)


def delete(spark: SparkSession, path: str) -> None:
    """Scheme-aware recursive delete; missing paths are a no-op (the
    ``shutil.rmtree(..., ignore_errors=True)`` contract)."""
    fs = _jvm_fs(spark, path)
    if fs is not None:
        f, p = fs
        if f.exists(p):
            f.delete(p, True)
        return
    import shutil

    shutil.rmtree(_local_or_raise(path, "delete"), ignore_errors=True)


def count_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Recursive count of data files under ``path`` whose name ends
    with ``suffix`` (metadata files — ``_SUCCESS``, dot-files — never
    match the suffix)."""
    fs = _jvm_fs(spark, path)
    if fs is not None:
        f, p = fs
        if not f.exists(p):
            return 0
        it = f.listFiles(p, True)
        n = 0
        while it.hasNext():
            if it.next().getPath().getName().endswith(suffix):
                n += 1
        return n
    return sum(1 for _ in _local_or_raise(path, "list").rglob(f"*{suffix}"))


def warn_if_non_atomic_rename(path: str, what: str) -> None:
    """Visible warning when a swap is about to run on a filesystem
    whose rename is copy-based (object stores): readers can observe a
    window proportional to data size, and a crash mid-copy leaves both
    directories.  The caller proceeds — compaction is still correct,
    just not atomic — but the operator must know."""
    if scheme_of(path) in _COPY_RENAME_SCHEMES:
        warnings.warn(
            f"{what}: {path} is on an object store whose rename is "
            "copy+delete — the swap is NOT atomic there (readers may see "
            "an O(data)-long unreadable window). Prefer the versioned-"
            "table manifest flip (operators/versioned.py CAS backend) "
            "for object-store-resident indexes.",
            RuntimeWarning,
            stacklevel=3,
        )

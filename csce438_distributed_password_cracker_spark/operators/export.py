"""Sharded training-data export — the last mile of a curation pipeline.

Write the curated corpus as deterministic shards with a validated
manifest, so a training job (or a resume after partial loss) can trust
what is on disk: per-shard row counts and order-independent content
checksums are computed BEFORE the write, re-derived from the files
AFTER it, and only a matching export publishes its manifest.  This is
the webdataset/tfrecord shard contract re-expressed on parquet.

Scale shape (100 TB):

- Shard assignment is the deterministic global shuffle
  (:func:`~.split.shuffle_rows`): ONE range exchange on
  ``xxhash64(key, seed)`` — shard membership is a pure function of
  (key, seed, num_shards), reproducible across sessions and clusters.
  Callers can pass their own ``shard_col`` instead (e.g. a gate query's
  engine-portable md5 bucket) and skip the shuffle.
- Expected stats are one tiny aggregation per shard (count + ``bit_xor``
  of a full-row xxhash64 — order-independent and overflow-free, so the
  checksum is insensitive to task scheduling and file order).  The
  sharded frame is PERSISTED across the stats pass and the write: both
  see one evaluation of the lineage (uncached, each would re-run the
  full scan + exchange, and a nondeterministic input would make stats
  and written bytes legitimately disagree).
- The verification read-back is a second full scan of the WRITTEN bytes
  (not the input lineage) — that is the point: it catches lost tasks,
  truncated files and column drift before the manifest publishes.
  ``verify=False`` skips it when the write path is separately trusted.
- The manifest is a single JSON object written LAST (write-tmp +
  atomic rename): readers that find a manifest may trust every shard it
  names; a crashed export leaves data dirs but no manifest.

Reference analog: none (north-star export family; the result-sink
analog is SURVEY §2.1 S4).
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .split import shuffle_rows

__all__ = [
    "export_shards",
    "read_shards",
    "repair_shards",
    "ExportIntegrityError",
]

MANIFEST = "_shards_manifest.json"


class ExportIntegrityError(RuntimeError):
    """Written shards disagree with the pre-write stats (lost rows,
    truncated files, or column drift) — the manifest was NOT published."""


def _shard_stats(df: DataFrame, shard_col: str, cols: list[str]) -> dict:
    rows = (
        df.groupBy(shard_col)
        .agg(
            F.count("*").alias("rows"),
            F.expr(
                "bit_xor(xxhash64("
                + ", ".join(f"`{c}`" for c in cols)
                + "))"
            ).alias("checksum"),
        )
        .collect()
    )
    return {
        int(r[shard_col]): (int(r["rows"]), int(r["checksum"]))
        for r in rows
    }


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    num_shards: int = 16,
    seed: int = 42,
    shard_col: str | None = None,
    verify: bool = True,
) -> dict:
    """Write ``df`` as ``num_shards`` deterministic shards under
    ``path`` (hive layout ``shard_id=N/``) and publish a validated
    manifest.  Returns the manifest dict.

    Without ``shard_col``, rows are assigned by the deterministic
    global shuffle (xxhash64 hash intervals — see module docstring);
    with it, the caller's column is used as-is (values must lie in
    ``[0, num_shards)``).  The manifest is written only after the
    on-disk shards reproduce the pre-write counts and checksums
    (``verify=True``); on mismatch :class:`ExportIntegrityError` is
    raised and no manifest exists, so readers never trust a partial
    export."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    root = Path(path)
    if (root / MANIFEST).exists():
        raise ValueError(f"{path} already holds a published export")
    derived = shard_col is None
    if derived:
        shard_col = "shard_id"
        if shard_col in df.columns:
            # shuffle_rows would silently REPLACE the caller's column
            # (and repair_shards could then select wrong rows) — make
            # the collision a loud choice instead
            raise ValueError(
                "df already has a `shard_id` column; pass "
                "shard_col='shard_id' to shard on it, or rename it"
            )
        out = shuffle_rows(df, id_col, seed, num_shards, shard_col)
    else:
        out = df
    data_cols = [c for c in out.columns if c != shard_col]
    # persist: the stats aggregation and the parquet write must see ONE
    # evaluation of the lineage — uncached, each would re-run the full
    # scan (+ the shuffle_rows exchange), and a nondeterministic input
    # would make pre-write stats and written bytes legitimately differ
    out = out.persist()
    try:
        expected = _shard_stats(out, shard_col, data_cols)
        bad = [s for s in expected if not 0 <= s < num_shards]
        if bad:
            raise ValueError(
                f"shard values outside [0, {num_shards}): {bad}"
            )

        out.write.partitionBy(shard_col).mode("errorifexists").parquet(
            str(root / "data")
        )
    finally:
        out.unpersist()

    spark = df.sparkSession
    written = spark.read.parquet(str(root / "data"))
    if verify:
        got = _shard_stats(written, shard_col, data_cols)
        if got != expected:
            raise ExportIntegrityError(
                f"written shards disagree with pre-write stats: "
                f"expected {expected}, read back {got}"
            )

    manifest = {
        "num_shards": int(num_shards),
        "seed": int(seed),
        "id_col": id_col,
        "shard_col": shard_col,
        "derived": derived,
        "columns": data_cols,
        "total_rows": sum(r for r, _ in expected.values()),
        "shards": [
            {"shard": s, "rows": r, "checksum": str(c)}
            for s, (r, c) in sorted(expected.items())
        ],
        "verified": bool(verify),
    }
    tmp = root / f".{MANIFEST}.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    tmp.write_text(json.dumps(manifest, indent=1))
    tmp.replace(root / MANIFEST)  # publish is the LAST, atomic step
    return manifest


def repair_shards(
    df: DataFrame,
    path: str,
    verify: bool = True,
) -> list[int]:
    """Selectively re-write the shards of a published export that
    drifted from their manifest (lost files, truncation, bit rot),
    re-deriving each shard's rows from the SOURCE frame ``df`` — which
    must be the same data the export was built from (shard assignment
    is a pure function of the manifest's key/seed/num_shards, so the
    re-derivation is exact).  Returns the repaired shard ids.

    Only drifted shards are touched: the damage scan and the rewrite
    are both partition-pruned to the broken subset — repairing 1 shard
    of 10,000 reads one shard's footprint and writes one shard.  The
    manifest is untouched (the repair restores what it already
    promises); a final verify pass (default on) re-checks the repaired
    shards against it and raises if the source no longer reproduces
    the manifest (wrong ``df`` — refuse to guess)."""
    root = Path(path)
    mf = root / MANIFEST
    if not mf.exists():
        raise FileNotFoundError(
            f"{path} has no published manifest — nothing to repair "
            "(re-run export_shards)"
        )
    manifest = json.loads(mf.read_text())
    shard_col = manifest["shard_col"]
    cols = manifest["columns"]
    want = {
        int(s["shard"]): (int(s["rows"]), int(s["checksum"]))
        for s in manifest["shards"]
    }
    spark = df.sparkSession
    on_disk = spark.read.parquet(str(root / "data"))
    got = _shard_stats(on_disk, shard_col, cols)
    broken = sorted(
        s for s in want if got.get(s) != want[s]
    )
    if not broken:
        return []
    # the manifest records whether the shard column was DERIVED at
    # export time: a derived export always re-derives here (dropping
    # any same-named caller column — export_shards rejects that input
    # anyway); a caller-sharded export requires the caller's column.
    # Old manifests without the flag fall back to the column's absence.
    derived = manifest.get("derived", shard_col not in df.columns)
    if derived:
        src = shuffle_rows(
            df.drop(shard_col),
            manifest["id_col"],
            manifest["seed"],
            manifest["num_shards"],
            shard_col,
        )
    else:
        if shard_col not in df.columns:
            raise ValueError(
                f"export was sharded on the caller's `{shard_col}` "
                "column, which this frame does not carry"
            )
        src = df
    replacement = src.where(F.col(shard_col).isin(broken)).select(
        *cols, shard_col
    )
    # one evaluation feeds both the fresh-stats check and the rewrite
    replacement = replacement.persist()
    try:
        if verify:
            fresh = _shard_stats(replacement, shard_col, cols)
            bad = {
                s: fresh.get(s) for s in broken if fresh.get(s) != want[s]
            }
            if bad:
                raise ExportIntegrityError(
                    "source frame does not reproduce the manifest for "
                    f"shards {sorted(bad)} — wrong or changed input, "
                    "refusing to repair"
                )
        for s in broken:
            import shutil

            shutil.rmtree(
                root / "data" / f"{shard_col}={s}", ignore_errors=True
            )
        (
            replacement.write.partitionBy(shard_col)
            .mode("append")
            .parquet(str(root / "data"))
        )
    finally:
        replacement.unpersist()
    return broken


def read_shards(
    spark: SparkSession, path: str, validate: bool = True
) -> DataFrame:
    """Read a published export.  ``validate=True`` re-derives per-shard
    counts and checksums against the manifest (one scan) and raises
    :class:`ExportIntegrityError` on any drift — the resume-safety
    check a training job runs before trusting a corpus."""
    root = Path(path)
    mf = root / MANIFEST
    if not mf.exists():
        raise FileNotFoundError(
            f"{path} has no published manifest — incomplete export"
        )
    manifest = json.loads(mf.read_text())
    df = spark.read.parquet(str(root / "data"))
    if validate:
        got = _shard_stats(df, manifest["shard_col"], manifest["columns"])
        want = {
            int(s["shard"]): (int(s["rows"]), int(s["checksum"]))
            for s in manifest["shards"]
        }
        if got != want:
            raise ExportIntegrityError(
                f"export at {path} drifted from its manifest: "
                f"manifest {want}, on disk {got}"
            )
    return df

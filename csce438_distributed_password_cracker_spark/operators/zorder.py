"""Z-order (Morton-curve) file clustering — multi-dimensional data
skipping for parquet scans.

A range-partitioned write sorted on ONE column gives tight per-file
min/max on that column and the FULL range on every other, so parquet
footer pruning only helps one predicate dimension.  Interleaving the
bits of several columns (the Morton curve — public prior art: Morton
1966; Delta Lake ``OPTIMIZE ZORDER BY``; Iceberg's sort-order z-order)
makes every file cover a small hyper-rectangle, so point/range
predicates on ANY of the clustered columns skip most files.  At 100 TB
the scan is the dominant cost and footer pruning is free — layout IS
the index.

Scale shape:

- Column ranges come from ONE tiny min/max aggregation (driver gets
  2×d numbers); values then scale to a ``bits``-wide integer grid and
  interleave JVM-side (a codegen'd ``aggregate`` lambda over the bit
  positions — no UDF).
- The write is ``repartitionByRange`` on the z-value + a
  within-partition sort: one range exchange, the same cost as any
  sorted write; no extra pass.
- ``skipping_stats`` reads back ONLY parquet footers (pyarrow metadata
  — no data I/O) and reports each file's per-column coverage fraction;
  ``files_hit`` counts the files a point/range predicate must read —
  the measurable skipping win.

Null handling: NULLs in a clustered column sort to grid cell 0.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "write_zordered", "skipping_stats", "files_hit"]


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16
) -> "F.Column":
    """The Morton key for ``cols`` (numeric), as a Column: each value
    rescaled to ``[0, 2**bits)`` over its observed min/max (ONE tiny
    agg — the returned expression embeds the bounds as literals), bits
    interleaved.  ``len(cols) * bits`` must fit 63 bits."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder over 1-4 columns")
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds int64")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).first()
    d = len(cols)
    grid = (1 << bits) - 1
    parts = []
    for j, c in enumerate(cols):
        if bounds[f"min_{c}"] is None:
            raise ValueError(
                f"cannot z-order on `{c}`: no non-NULL values (empty "
                "input or all-NULL column) — bounds are data-derived"
            )
        lo = float(bounds[f"min_{c}"])
        hi = float(bounds[f"max_{c}"])
        span = (hi - lo) or 1.0
        cell = (
            f"CAST(least({grid}, greatest(0, "
            f"floor((CAST(coalesce(`{c}`, {lo}) AS DOUBLE) - {lo})"
            f" / {span} * {grid}))) AS BIGINT)"
        )
        parts.append(
            f"aggregate(sequence(0, {bits - 1}), 0L,"
            f" (acc, i) -> acc | (((({cell}) >> i) & 1) << (i * {d} + {j})))"
        )
    return F.expr(" | ".join(f"({p})" for p in parts))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered on the
    Morton curve of ``cols``: one range exchange on the z-value +
    within-file sort, so each file covers a compact hyper-rectangle
    and footer pruning works on EVERY clustered column."""
    z = zorder_value(df, cols, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(int(num_files), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("errorifexists")
        .parquet(path)
    )


def _file_ranges(path: str, cols: list[str]) -> list[dict]:
    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("part-*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    mins[name] = min(
                        mins.get(name, st.min), st.min
                    )
                    maxs[name] = max(
                        maxs.get(name, st.max), st.max
                    )
        if mins:
            out.append({"file": f.name, "min": mins, "max": maxs})
    return out


def skipping_stats(path: str, cols: list[str]) -> dict[str, float]:
    """Mean per-file coverage fraction per column — footer metadata
    only, no data I/O.  1.0 means every file spans the whole column
    (no skipping possible); a z-ordered layout pushes every clustered
    column well below 1."""
    ranges = _file_ranges(path, cols)
    if not ranges:
        raise FileNotFoundError(f"no parquet files with stats in {path}")
    stats: dict[str, float] = {}
    for c in cols:
        glo = min(r["min"][c] for r in ranges)
        ghi = max(r["max"][c] for r in ranges)
        span = (ghi - glo) or 1.0
        stats[c] = sum(
            (r["max"][c] - r["min"][c]) / span for r in ranges
        ) / len(ranges)
    return stats


def files_hit(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose ``[min, max]`` intersects ``[lo, hi]``, total
    files) — what a parquet reader with footer pruning would open for
    the predicate ``col BETWEEN lo AND hi``."""
    ranges = _file_ranges(path, [col])
    hit = sum(
        1 for r in ranges if not (r["max"][col] < lo or r["min"][col] > hi)
    )
    return hit, len(ranges)

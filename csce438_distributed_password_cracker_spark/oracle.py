"""Local DuckDB-oracle harness — mirrors the driver's correctness gate
(row-count + column names + order-insensitive value compare) so regressions
surface in pytest before the driver ever runs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .catalog import TABLES, table_path
from .plans.corpus import REGISTRY  # corpus import populates the registry


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Oracle connection over the parquet views.

    Capacity knobs (needed once compares run at sf10, where the
    heaviest oracles spill): ``SPARK_GRAFT_ORACLE_MEM`` sets DuckDB's
    memory_limit (default: DuckDB's 80%-of-RAM — overcommitted when
    the in-process Spark driver JVM also holds a large heap) and
    ``SPARK_GRAFT_ORACLE_TMP`` its spill directory (default: cwd/.tmp).
    Gate-scale runs need neither."""
    import os
    import re

    con = duckdb.connect()
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM")
    if mem:
        # validate before interpolating into SET (a stray quote would
        # surface as a baffling DuckDB parser error — ADVICE r10); the
        # shape is DuckDB's own memory_limit grammar
        if not re.fullmatch(r"[0-9]+(\.[0-9]+)?\s*[KMGT]i?B?", mem.strip()):
            raise ValueError(
                f"SPARK_GRAFT_ORACLE_MEM={mem!r} is not a size like "
                "'60GB' / '1.5GiB'"
            )
        con.execute(f"SET memory_limit='{mem.strip()}'")
    tmp = os.environ.get("SPARK_GRAFT_ORACLE_TMP")
    if tmp:
        if "'" in tmp:
            raise ValueError(
                f"SPARK_GRAFT_ORACLE_TMP={tmp!r} must not contain a quote"
            )
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        # partial corpora are legitimate (the Zipf scale corpora carry
        # only documents/part — tools/gen_scale_corpus.py --tables):
        # skip views whose parquet is absent so a single-table compare
        # can still run there; a query that references a missing table
        # then fails loudly at its own FROM, not at connection time
        p = table_path(sf_dir, t)
        if not os.path.exists(p):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return repr(v)  # keeps 2.0 vs 2 distinct float repr
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(
    spark: SparkSession, name: str, sf_dir: str, capacity_mode: bool = False
) -> CompareResult:
    """``capacity_mode`` (the at-scale sweep) prefers a query's
    bounded-working-set oracle spelling when one is registered —
    ``oracle_exec`` (multi-statement temp-table program) or
    ``oracle_parts`` (independently-run UNION ALL branches, results
    concatenated) — over the single-statement ``oracle``.  All three
    are semantically identical; the compare is order-insensitive, so
    concatenation order never matters."""
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None and q.oracle_exec is None:
        ok = True  # rows-only check: it ran
        return CompareResult(name, ok, f"rows-only: {len(spark_pdf)} rows")
    con = duckdb_connection(sf_dir)
    try:
        if capacity_mode and q.oracle_exec is not None:
            oracle_pdf = q.oracle_exec(con)
        elif capacity_mode and q.oracle_parts is not None:
            oracle_pdf = pd.concat(
                [con.execute(p).fetchdf() for p in q.oracle_parts],
                ignore_index=True,
            )
        else:
            oracle_pdf = con.execute(q.oracle).fetchdf()
    finally:
        con.close()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            name,
            False,
            f"schema mismatch: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}",
        )
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            name, False, f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    s_rows, o_rows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:3]
        return CompareResult(name, False, f"value mismatch, first diffs: {diffs}")
    return CompareResult(name, True, f"{len(spark_pdf)} rows match")

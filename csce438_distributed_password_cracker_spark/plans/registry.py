"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every declared operator from SURVEY.md §2 registers here.  The driver runs
each Spark query and its oracle side-by-side at sf0.01 and compares
row-count + schema + order-insensitive value-hash, so:

- alias every computed column identically in both engines;
- keep output types simple (bigint / double / string / date / timestamp /
  boolean) — no decimals or int128 in the *final* schema;
- monetary aggregates go through DECIMAL(18,2) internally (exact, associative
  — immune to float summation-order divergence between Spark's partial aggs
  and DuckDB), then round + cast to double for output;
- integer sums in DuckDB are cast to BIGINT (DuckDB sums to int128);
- every nondeterministic choice (top-k ties, "any" semantics) is resolved
  with an explicit deterministic tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QueryDef"] = {}


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None ⇒ driver does rows-only check
    doc: str = ""
    # Capacity-mode alternatives for the at-scale sweep (tools/
    # scale_sweep.py) — semantically identical to `oracle`, shaped so
    # DuckDB's working set stays bounded at 100× corpora.  The sf0.01
    # driver gate only ever reads `oracle`.
    #
    # oracle_parts: the oracle split into independently-runnable
    # statements whose concatenated results equal the single statement
    # (a UNION ALL per part) — each part spills within budget where the
    # union'd whole overflows the disk (q_tpch at sf10: 22 branches in
    # one statement spilled past 74 GB; branch-by-branch each fits).
    oracle_parts: tuple[str, ...] | None = None
    # oracle_exec: a callable (duckdb_connection) -> pandas.DataFrame
    # that computes the oracle result through multiple statements (e.g.
    # an iterative temp-table loop replacing an unspillable recursive
    # CTE — q_array_ops' BPE fixed point at sf10).
    oracle_exec: Callable | None = None


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    oracle_parts: tuple[str, ...] | None = None,
    oracle_exec: Callable | None = None,
):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc,
            oracle_parts=oracle_parts,
            oracle_exec=oracle_exec,
        )
        return fn

    return deco

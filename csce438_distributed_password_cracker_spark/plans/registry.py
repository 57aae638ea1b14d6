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


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco

"""TPC-H-style multi-join analytical queries over the driver tables —
the standard relational workload a user of a general engine runs daily
(adapted to the driver schema: no partsupp table, o_orderpriority in
place of o_shippriority).  Spark SQL and DuckDB spell each identically,
so one string serves both engines; money math follows the DECIMAL(18,2)
parity discipline (plans/registry.py).

Plan shapes these exercise at scale: star joins where Catalyst must
broadcast the dims (region/nation) and shuffle the facts, aggregate
pushdown through multi-way joins, selective date-range scans with full
predicate pushdown.

Q1/Q6/Q3/Q5/Q10 are registered as ONE labeled union (`q_tpch`) so the driver
correctness gate — which records at most 50 registry entries — covers
all three: each branch keeps its own joins, pushed-down predicates, and
deterministic top-k; the outer union only harmonizes the output schema
(typed NULLs for columns a branch doesn't produce).  Catalyst plans the
three branches independently and unions the results, so the physical
shapes are identical to three separate queries.
"""

from __future__ import annotations

from .relational import _dec, _money, _sql_query

_REVENUE = f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount')})"

_sql_query(
    "q_tpch",
    f"""
    SELECT 'q1' AS tpch_q,
           CAST(NULL AS BIGINT) AS k_id,
           l_returnflag AS k_name,
           l_linestatus AS k_name2,
           CAST(NULL AS TIMESTAMP) AS order_ts,
           revenue,
           n_rows,
           sum_qty
    FROM (
      SELECT l.l_returnflag, l.l_linestatus,
             {_money(_REVENUE, "revenue")},
             COUNT(*) AS n_rows,
             CAST(round(sum({_dec("l.l_quantity")}), 2) AS DOUBLE) AS sum_qty
      FROM lineitem l
      WHERE l.l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l.l_returnflag, l.l_linestatus
    )
    UNION ALL
    SELECT 'q6' AS tpch_q,
           CAST(NULL AS BIGINT) AS k_id,
           CAST(NULL AS STRING) AS k_name,
           CAST(NULL AS STRING) AS k_name2,
           CAST(NULL AS TIMESTAMP) AS order_ts,
           revenue,
           n_rows,
           CAST(NULL AS DOUBLE) AS sum_qty
    FROM (
      SELECT {_money(f"{_dec('l.l_extendedprice')} * {_dec('l.l_discount')}", "revenue")},
             COUNT(*) AS n_rows
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND {_dec("l.l_discount")} BETWEEN 0.04 AND 0.08
        AND l.l_quantity < 24
    )
    UNION ALL
    SELECT 'q3' AS tpch_q,
           CAST(l_orderkey AS BIGINT) AS k_id,
           o_orderpriority AS k_name,
           CAST(NULL AS STRING) AS k_name2,
           o_orderdate AS order_ts,
           revenue,
           CAST(NULL AS BIGINT) AS n_rows,
           CAST(NULL AS DOUBLE) AS sum_qty
    FROM (
      SELECT l.l_orderkey,
             {_money(_REVENUE, "revenue")},
             o.o_orderdate,
             o.o_orderpriority
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
      ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
      LIMIT 10
    )
    UNION ALL
    SELECT 'q5' AS tpch_q,
           CAST(NULL AS BIGINT) AS k_id,
           n_name AS k_name,
           CAST(NULL AS STRING) AS k_name2,
           CAST(NULL AS TIMESTAMP) AS order_ts,
           revenue,
           CAST(NULL AS BIGINT) AS n_rows,
           CAST(NULL AS DOUBLE) AS sum_qty
    FROM (
      SELECT n.n_name,
             {_money(_REVENUE, "revenue")}
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
                     AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n.n_name
    )
    UNION ALL
    SELECT 'q10' AS tpch_q,
           CAST(c_custkey AS BIGINT) AS k_id,
           c_name AS k_name,
           n_name AS k_name2,
           CAST(NULL AS TIMESTAMP) AS order_ts,
           revenue,
           CAST(NULL AS BIGINT) AS n_rows,
           CAST(NULL AS DOUBLE) AS sum_qty
    FROM (
      SELECT c.c_custkey, c.c_name, n.n_name,
             {_money(_REVENUE, "revenue")}
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY c.c_custkey, c.c_name, n.n_name
      ORDER BY revenue DESC, c.c_custkey
      LIMIT 20
    )
    """,
    doc="TPC-H battery, one labeled union: Q1 pricing summary — the "
    "full-fact-scan partial-agg benchmark (6-group output, map-side "
    "combine does all the work; measures trimmed to the union schema); "
    "Q6 forecast revenue — filter-only scan, every predicate pushed to "
    "the parquet reader, single-row sum; Q3 shipping priority — 3-way "
    "join, date-range pushdown on both fact scans, grouped revenue, "
    "deterministic top-10 (orderkey tie-break); Q5 local supplier volume "
    "— 6-way star join, Catalyst broadcasts region/nation/supplier and "
    "shuffles the two facts once; Q10 returned items — selective "
    "returnflag + date pushdown, 4-way join, deterministic top-20.",
    tables=("customer", "orders", "lineitem", "supplier", "nation", "region"),
)

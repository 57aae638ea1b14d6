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
"""

from __future__ import annotations

from .relational import _dec, _money, _sql_query

_sql_query(
    "q_tpch_q3",
    f"""
    SELECT l.l_orderkey,
           {_money(f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount')})", "revenue")},
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
    """,
    doc="TPC-H Q3 (shipping priority, adapted): 3-way join, date-range "
    "pushdown on both fact scans, grouped revenue, deterministic top-10 "
    "(orderkey tie-break).",
    tables=("customer", "orders", "lineitem"),
)

_sql_query(
    "q_tpch_q5",
    f"""
    SELECT n.n_name,
           {_money(f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount')})", "revenue")}
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
    """,
    doc="TPC-H Q5 (local supplier volume): 6-way star join — Catalyst "
    "broadcasts region/nation/supplier, shuffles the two facts once on "
    "the join keys; the local-supplier predicate (c_nationkey = "
    "s_nationkey) rides the supplier join.",
    tables=("customer", "orders", "lineitem", "supplier", "nation", "region"),
)

_sql_query(
    "q_tpch_q10",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_money(f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount')})", "revenue")}
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
    """,
    doc="TPC-H Q10 (returned items): who returned the most revenue in a "
    "quarter — selective returnflag + date pushdown, 4-way join, "
    "deterministic top-20.",
    tables=("customer", "orders", "lineitem", "nation"),
)

"""Declared relational corpus over the driver test tables (SURVEY.md §2.1
S3, §2.2 P3, §2.4 J1/J2, §2.5 A1/A3, §2.6 L2, §2.8 F1/F4, §2.10).

Parity discipline (see registry.py): money math runs in DECIMAL(18,2) —
exact and associative, so Spark's partial-agg ordering and DuckDB's
single-node ordering cannot diverge — and is cast to DOUBLE only at the
output boundary (exact decimal → correctly-rounded double = identical bits
in both engines).  Where the Spark and DuckDB dialects coincide, ONE SQL
string is used for both sides (Catalyst runs it via temp views), which makes
the oracle equivalence self-evident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


def _dec(col: str) -> str:
    return f"CAST({col} AS DECIMAL(18,2))"


def _money(expr: str, alias: str) -> str:
    return f"CAST(round(sum({expr}), 2) AS DOUBLE) AS {alias}"


def _sql_query(
    name: str,
    sql: str,
    doc: str,
    tables: tuple[str, ...],
    oracle: str | None = "",
    oracle_parts: tuple[str, ...] | None = None,
):
    """Register a query whose Spark side runs ``sql`` through Catalyst (via
    temp views).  By default the oracle is the *same* string (dialects
    coincide); pass ``oracle=...`` where DuckDB needs different spelling."""

    @register(
        name,
        oracle=sql if oracle == "" else oracle,
        doc=doc,
        oracle_parts=oracle_parts,
    )
    def _q(spark: SparkSession, sf_dir: str, _sql=sql, _tables=tables) -> DataFrame:
        for t in _tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(_sql)

    return _q


# ── scans / filters / projections ────────────────────────────────────────

_sql_query(
    "q_events_scan",
    """
    SELECT event_id, user_id, event_type, value,
           CAST(get_json_object(props, '$.k') AS BIGINT) AS props_k
    FROM events
    WHERE event_type = 'purchase'
    """,
    doc="S3 batch analog: tagged-message scan with pushed-down filter "
    "(server main read loop, server.c:477-505), plus semi-structured "
    "extraction from the JSON props payload (message-body parse, "
    "request.c:34-36 analog) — JVM-side JSON path evaluation, no UDF.",
    tables=("events",),
    oracle="""
    SELECT event_id, user_id, event_type, value,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
    FROM events
    WHERE event_type = 'purchase'
    """,
)

_sql_query(
    "q_msg_demux",
    f"""
    SELECT event_type,
           count(*) AS n,
           {_money(_dec("value"), "total_value")}
    FROM events
    GROUP BY event_type
    """,
    doc="P3: first-byte tag dispatch (server.c:103-128) as per-type "
    "demux counts over the events table.",
    tables=("events",),
)

# ── joins ────────────────────────────────────────────────────────────────


@register(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="J1: registry lookup join (worker_found, server.c:130-143) as a "
    "broadcast hash join — the 5-row region dim ships to every task; no "
    "shuffle of the probe side.",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


_sql_query(
    "q_join_sortmerge",
    f"""
    SELECT o.o_orderkey,
           o.o_orderdate,
           {_money(f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount')})", "revenue")},
           count(*) AS n_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    doc="J2: verdict-to-request correlation (server.c:275-331) as the "
    "large-large equi-join: orders⋈lineitem, shuffle on the join key, "
    "partial aggregation map-side.",
    tables=("orders", "lineitem"),
)

@register(
    "q_join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Anti join: the pending-set complement (check_req_status waiting on "
    "outstanding workers, server.c:264-267) — customers with no orders.",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")

def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Idempotent INGEST step for q_join_bucketed: write orders/lineitem
    as 8-bucket sorted tables on the join key (once per session × sf).
    Factored out of the query body so callers that time the query —
    bench.py pre-builds in its warmup — measure the zero-exchange probe,
    not ingest: build cost belongs to the one-off ingest job at scale,
    exactly like q_ann_probe's persisted index."""
    import os
    import shutil

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    names = {}
    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"bkt_{t}_{tag}"
        names[t] = name
        # bucket METADATA lives in the session catalog (in-memory here),
        # so each session rebuilds; clear the stale warehouse dir a prior
        # session left behind (LOCATION_ALREADY_EXISTS otherwise)
        if not spark.catalog.tableExists(name):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
            (
                load_table(spark, sf_dir, t)
                # align write tasks with buckets (same murmur3 hash):
                # exactly ONE file per bucket, which is what lets the
                # reader trust sortBy order and elide the SMJ sorts
                .repartition(8, F.col(key))
                .write.bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(name)
            )
    return names


@register(
    "q_join_bucketed",
    oracle=f"""
    SELECT o.o_orderkey,
           max(o.o_orderdate) AS o_orderdate,
           {_money(f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount')})", "revenue")},
           count(*) AS n_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    """,
    doc="J2 at its co-located best: orders and lineitem written as "
    "bucketed+sorted tables on the join key (ensure_bucketed_tables — "
    "ingest-time, pre-built and reported separately by bench.py), then "
    "joined AND aggregated with ZERO exchanges — bucketing satisfies the "
    "SortMergeJoin's distribution requirement, and grouping on the "
    "bucket key rides the same distribution (asserted in "
    "tests/test_plans.py).  The intra-partition SMJ sorts remain: since "
    "SPARK-28595 bucketed scans report sortBy ordering only under "
    "spark.sql.legacy.bucketedTableScan.outputOrdering, and sorting "
    "already-sorted runs is cheap next to the shuffle this plan avoids.  "
    "This is THE 100 TB pattern for a fact-fact join both sides of which "
    "are reused across queries: pay the shuffle once at ingest, never "
    "again.  Result is bucketing-invariant, so the oracle is the plain "
    "join over the raw tables.",
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(names["orders"])
    li = spark.table(names["lineitem"])
    # MERGE hint: at toy SF Catalyst would broadcast the orders side,
    # which hides the plan this query exists to demonstrate — at real
    # scale neither fact side is broadcastable and SMJ is what runs
    return (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.max("o_orderdate").alias("o_orderdate"),
            F.expr(
                f"CAST(round(sum({_dec('l_extendedprice')} * (1 - {_dec('l_discount')})), 2) AS DOUBLE)"
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_join_skew_salted",
    oracle=f"""
    SELECT s.s_nationkey,
           count(*) AS n_lines,
           {_money(f"{_dec('l.l_extendedprice')} * (1 - {_dec('l.l_discount')})", "revenue")},
           CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_distinct_orders
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
    doc="Skew mitigation as a gate-checked query: the fact side is salted "
    "across 8 sub-keys (salt from a row-local uniquifier, so a hot key's "
    "rows spread evenly) and the dim side replicated 8x — one hot key's "
    "single reducer becomes 8 (operators/skew.py).  The per-nation "
    "distinct-order count runs the salted two-phase distinct (dedup on "
    "(group, salt-of-x, x), then merge disjoint partials).  Both "
    "transforms are result-invariant, so the oracle is the plain join + "
    "plain COUNT(DISTINCT).",
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import skew

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = skew.salted_join(li, sup, "l_suppkey", salts=8)
    base = joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_lines"),
        F.expr(
            f"CAST(round(sum({_dec('l_extendedprice')} * (1 - {_dec('l_discount')})), 2) AS DOUBLE)"
        ).alias("revenue"),
    )
    dist = skew.salted_count_distinct(
        joined, "s_nationkey", "l_orderkey", salts=16
    ).withColumnRenamed("n_distinct_l_orderkey", "n_distinct_orders")
    return base.join(dist, "s_nationkey")


# ── aggregations ─────────────────────────────────────────────────────────

_sql_query(
    "q_agg_exists",
    """
    SELECT user_id,
           bool_or(event_type = 'error') AS has_error,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    doc="A1: existential any/all verdict aggregation (check_req_status, "
    "server.c:243-273) — grouped bool_or.",
    tables=("events",),
)

_EVENT_COUNTS = """
    SELECT count(*) AS n_total,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'view') AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'error') AS n_error
    FROM events
"""

_AGG_SCALARS_SQL = f"""
    SELECT e.n_total, e.n_click, e.n_view, e.n_purchase, e.n_error,
           l.d_parts, l.d_supps, l.n_rows,
           abs(a.approx_d - l.d_parts) <= 0.05 * l.d_parts AS approx_within_5pct
    FROM ({_EVENT_COUNTS}) e
    CROSS JOIN (
      SELECT count(DISTINCT l_partkey) AS d_parts,
             count(DISTINCT l_suppkey) AS d_supps,
             count(*) AS n_rows
      FROM lineitem
    ) l
    CROSS JOIN (
      SELECT approx_count_distinct(l_partkey, 0.02) AS approx_d FROM lineitem
    ) a
    """


@register(
    "q_agg_scalars",
    oracle=f"""
    SELECT e.n_total, e.n_click, e.n_view, e.n_purchase, e.n_error,
           l.d_parts, l.d_supps, l.n_rows,
           true AS approx_within_5pct,
           p.prof_qty_nonnull, p.prof_qty_min, p.prof_qty_max,
           p.prof_qty_mean, p.prof_price_min, p.prof_price_max,
           d.d_added, d.d_removed, d.d_changed, d.d_unchanged
    FROM ({_EVENT_COUNTS}) e
    CROSS JOIN (
      SELECT count(DISTINCT l_partkey) AS d_parts,
             count(DISTINCT l_suppkey) AS d_supps,
             count(*) AS n_rows
      FROM lineitem
    ) l
    CROSS JOIN (
      -- closed-form twin of the ONE-PASS profile the Spark side runs
      -- through operators/profile.profile (long-format reshaped back
      -- to scalars)
      SELECT CAST(count(l_quantity) AS BIGINT) AS prof_qty_nonnull,
             CAST(min(l_quantity) AS DOUBLE) AS prof_qty_min,
             CAST(max(l_quantity) AS DOUBLE) AS prof_qty_max,
             round(avg(CAST(l_quantity AS DOUBLE)), 6) AS prof_qty_mean,
             CAST(min(l_extendedprice) AS DOUBLE) AS prof_price_min,
             CAST(max(l_extendedprice) AS DOUBLE) AS prof_price_max
      FROM lineitem
    ) p
    CROSS JOIN (
      -- closed-form twin of operators/diff.snapshot_diff over the
      -- derived before/after customer snapshots (% 10 classes below)
      SELECT CAST(count(*) FILTER (WHERE c_custkey % 10 = 5) AS BIGINT)
               AS d_added,
             CAST(count(*) FILTER (WHERE c_custkey % 10 = 3) AS BIGINT)
               AS d_removed,
             CAST(count(*) FILTER (WHERE c_custkey % 10 = 4) AS BIGINT)
               AS d_changed,
             CAST(count(*) FILTER (WHERE c_custkey % 10 NOT IN (3, 4))
               AS BIGINT) AS d_unchanged
      FROM customer
    ) d
    """,
    doc="Scalar aggregate battery in one row (merged so the driver gate "
    "covers each; the gate caps the registry at 50 entries): A3 filtered "
    "counting (idle-worker census, server.c:338-357); distinct aggregation "
    "(expand + two-phase agg); E5 approx_count_distinct (HLL++ sketch — "
    "mergeable, no expand, the 100 TB path) asserted within 5% of its "
    "exact twin (the oracle states the invariant).  Round-4 fusion adds "
    "two more production operators as scalar branches: prof_* — "
    "operators/profile.profile's ONE-PASS dataset profile over lineitem "
    "(the exact subset of its metrics: nonnull count, min/max, rounded "
    "mean — sketch metrics stay test-covered), reshaped from the "
    "long-format output; d_* — operators/diff.snapshot_diff between the "
    "customer table and a derived after-snapshot (keys %10=3 dropped, "
    "%10=4 value-bumped, %10=5 re-keyed as inserts), classifying every "
    "key added/removed/changed/unchanged via the map-side row-hash "
    "reduction.  All single-row aggregates; the cross joins are "
    "broadcast no-ops.",
)
def q_agg_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import snapshot_diff
    from ..operators.profile import profile

    for t in ("events", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    base = spark.sql(_AGG_SCALARS_SQL)

    li = load_table(spark, sf_dir, "lineitem")
    prof = profile(li, columns=["l_quantity", "l_extendedprice"])

    def metric(col: str, m: str, alias: str, rnd: int | None = None):
        v = F.max(
            F.when(
                (F.col("column") == col) & (F.col("metric") == m),
                F.col("value_num"),
            )
        )
        if rnd is not None:
            v = F.round(v, rnd)
        return v.alias(alias)

    prof_row = prof.agg(
        metric("l_quantity", "n_nonnull", "prof_qty_nonnull")
        .cast("long")
        .alias("prof_qty_nonnull"),
        metric("l_quantity", "min", "prof_qty_min"),
        metric("l_quantity", "max", "prof_qty_max"),
        metric("l_quantity", "mean", "prof_qty_mean", rnd=6),
        metric("l_extendedprice", "min", "prof_price_min"),
        metric("l_extendedprice", "max", "prof_price_max"),
    )

    cust = load_table(spark, sf_dir, "customer")
    mod10 = F.pmod(F.col("c_custkey"), F.lit(10))
    after = (
        cust.filter(mod10 != 3)  # removed
        .withColumn(
            "c_acctbal",
            F.when(mod10 == 4, F.col("c_acctbal") + 1).otherwise(
                F.col("c_acctbal")
            ),
        )  # changed
        .unionByName(
            # re-key by NEGATION, not a "+big constant" offset: custkeys
            # are positive at every SF, so -k can never collide with an
            # existing key.  The former +1_000_000 offset collided at
            # sf10 (1.5M customers): 50k re-keyed inserts landed on
            # existing keys, duplicating them in the after-snapshot and
            # misclassifying added→changed (caught by the sf10 sweep).
            cust.filter(mod10 == 5).withColumn(
                "c_custkey", -F.col("c_custkey")
            )
        )  # added
    )
    diff = snapshot_diff(cust, after, key_cols=["c_custkey"])
    diff_row = diff.agg(
        *[
            F.sum(
                F.when(F.col("diff_status") == s, 1).otherwise(0)
            ).cast("long").alias(f"d_{s}")
            for s in ("added", "removed", "changed", "unchanged")
        ]
    )
    return base.crossJoin(prof_row).crossJoin(diff_row)

_sql_query(
    "q_agg_groupby",
    f"""
    SELECT l_returnflag,
           l_linestatus,
           {_money(_dec("l_quantity"), "sum_qty")},
           {_money(_dec("l_extendedprice"), "sum_base_price")},
           {_money(f"{_dec('l_extendedprice')} * (1 - {_dec('l_discount')})", "sum_disc_price")},
           {_money(f"{_dec('l_extendedprice')} * (1 - {_dec('l_discount')}) * (1 + {_dec('l_tax')})", "sum_charge")},
           CAST(sum({_dec("l_quantity")}) AS DOUBLE) / count(*) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Grouped agg (TPC-H Q1 shape): map-side partial agg + exchange on "
    "the group keys; DECIMAL keeps partial/final merge exact.",
    tables=("lineitem",),
)

# ── sort / limit ─────────────────────────────────────────────────────────

_sql_query(
    "q_sort_limit",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="L2: ordered scan + top-k (Spark: TakeOrderedAndProject — no full "
    "sort, per-partition heaps merged on the driver). Tie-break on "
    "o_orderkey makes the k-set deterministic.",
    tables=("orders",),
)

# ── scalar functions ─────────────────────────────────────────────────────

_STRING_OPS_COLS = """
    SELECT c_custkey,
           concat('c ', c_mktsegment, ' ', c_name) AS tagged,
           substring(c_name, 1, 8) AS prefix,
           upper(c_mktsegment) AS seg_upper,
           lower(c_mktsegment) AS seg_lower,
           length(c_name) AS name_len,
           CAST(substring(c_name, 10, 9) AS BIGINT) AS parsed_id,
           {sha} AS digest
    FROM customer
    """

_sql_query(
    "q_string_ops",
    _STRING_OPS_COLS.format(sha="sha2(c_name, 256)"),
    oracle=_STRING_OPS_COLS.format(sha="sha256(c_name)"),
    doc="F4/F5: string assembly (request.c:51-69), tag peek via substring "
    "(server.c:110), numeric parse (request.c:34-36).  digest is the F1 "
    "mass-hashing column (round-6 fusion of the former q_sha1_mass — "
    "same scan, same codegen stage): sha256 fallback because the pinned "
    "DuckDB lacks sha1(); SHA-1 reference fidelity (worker.c:50-54 "
    "format) is asserted in tests/test_crack.py against hashlib.",
    tables=("customer",),
)

_sql_query(
    "q_date_ops",
    f"""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           count(*) AS n_orders,
           {_money(_dec("o_totalprice"), "month_total")}
    FROM orders
    GROUP BY year(o_orderdate), month(o_orderdate)
    """,
    doc="Date bucketing over orders (corpus breadth; no reference analog — "
    "SURVEY.md §2.8 'absent' row).",
    tables=("orders",),
)

_sql_query(
    "q_math_ops",
    """
    SELECT l_orderkey,
           l_linenumber,
           abs(l_extendedprice) AS abs_price,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
           sqrt(l_quantity) AS sqrt_qty,
           l_partkey % 7 AS pk_mod
    FROM lineitem
    """,
    doc="Arithmetic scalars; sqrt is IEEE-correctly-rounded (bit-identical "
    "across engines), no libm-divergent functions in the oracle path.",
    tables=("lineitem",),
)

# ── window functions ─────────────────────────────────────────────────────

_sql_query(
    "q_window_rank",
    f"""
    SELECT c_nationkey,
           c_custkey,
           spend,
           rank() OVER (PARTITION BY c_nationkey ORDER BY spend DESC, c_custkey) AS spend_rank
    FROM (
      SELECT c.c_nationkey, c.c_custkey,
             {_money(_dec("o.o_totalprice"), "spend")}
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, c.c_custkey
    )
    """,
    doc="§2.10: rank within partition — customers by spend within nation; "
    "deterministic tie-break on c_custkey.",
    tables=("customer", "orders"),
)

"""Extended corpus: multi-dimensional aggregation (rollup / cube /
grouping sets), analytic windows, semi-join, per-group top-k, near-dup
connected components, and IVF similarity search.

The reference has no analog for any of these (SURVEY.md §2.5/§2.10 list
the categories as built-in Spark surface); they are declared to complete
the engine's coverage as a general analytics + training-data-pipeline
system.  Where Spark SQL and DuckDB spell the query identically, one SQL
string serves both sides (parity self-evident); the components query
oracles an ITERATIVE Spark algorithm against a DuckDB recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup, similarity
from .registry import register
from .relational import _dec, _money, _sql_query

# ── multi-dimensional aggregation ────────────────────────────────────────

_sql_query(
    "q_agg_grouping",
    f"""
    SELECT 'rollup' AS gmode, r.r_name AS d1, n.n_name AS d2,
           count(*) AS n_rows,
           {_money(_dec("c.c_acctbal"), "total")}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    UNION ALL
    SELECT 'cube' AS gmode, o_orderpriority AS d1, o_orderstatus AS d2,
           count(*) AS n_rows,
           {_money(_dec("o_totalprice"), "total")}
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    UNION ALL
    SELECT 'gsets' AS gmode, o_orderpriority AS d1, o_orderstatus AS d2,
           count(*) AS n_rows,
           {_money(_dec("o_totalprice"), "total")}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    doc="Multi-dimensional aggregation battery, one labeled union (merged "
    "rollup/cube/grouping-sets so the 50-entry driver gate covers each): "
    "rollup — hierarchical subtotals region → nation → grand total (Spark "
    "expands grouping sets before the exchange, so the shuffle still "
    "carries one row per (grouping-set, key) after partial aggregation); "
    "cube — all 2² marginal combinations of (priority, status); explicit "
    "grouping sets — two independent one-dimension rollouts in one scan.",
    tables=("customer", "nation", "region", "orders"),
)

@register(
    "q_agg_pivot",
    oracle="""
    SELECT user_id,
      count(*) FILTER (WHERE event_type = 'click')    AS click,
      count(*) FILTER (WHERE event_type = 'error')    AS error,
      count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      count(*) FILTER (WHERE event_type = 'signup')   AS signup,
      count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
    doc="Pivot (categorical spread): per-user event-type counts.  The "
    "pivot value list is EXPLICIT — with it, Spark pivots in one pass "
    "with a fixed output schema; without it, a first job scans for "
    "distinct values (schema-on-data, a scale smell).",
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .fillna(0)
    )


_sql_query(
    "q_agg_percentile",
    """
    SELECT o_orderpriority,
           percentile(o_totalprice, 0.5) AS p50,
           percentile(o_totalprice, 0.9) AS p90,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN flo50 = fhi50
                  OR arr[CAST(flo50 AS BIGINT) + 1]
                     = arr[CAST(fhi50 AS BIGINT) + 1]
                THEN arr[CAST(flo50 AS BIGINT) + 1]
                ELSE (fhi50 - pos50) * arr[CAST(flo50 AS BIGINT) + 1]
                   + (pos50 - flo50) * arr[CAST(fhi50 AS BIGINT) + 1]
           END AS p50,
           CASE WHEN flo90 = fhi90
                  OR arr[CAST(flo90 AS BIGINT) + 1]
                     = arr[CAST(fhi90 AS BIGINT) + 1]
                THEN arr[CAST(flo90 AS BIGINT) + 1]
                ELSE (fhi90 - pos90) * arr[CAST(flo90 AS BIGINT) + 1]
                   + (pos90 - flo90) * arr[CAST(fhi90 AS BIGINT) + 1]
           END AS p90,
           n AS n_orders
    FROM (
      SELECT o_orderpriority,
             list_sort(list(o_totalprice)) AS arr,
             count(*) AS n,
             CAST('0.5' AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE) AS pos50,
             CAST('0.9' AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE) AS pos90,
             floor(CAST('0.5' AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE)) AS flo50,
             ceil(CAST('0.5' AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE)) AS fhi50,
             floor(CAST('0.9' AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE)) AS flo90,
             ceil(CAST('0.9' AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE)) AS fhi90
      FROM orders GROUP BY o_orderpriority
    )
    """,
    doc="Exact grouped percentiles (linear interpolation).  The oracle "
    "replays Spark Percentile's EXACT arithmetic — position = q·(n−1), "
    "then the two-sided-weight form (hi−pos)·lower + (pos−lo)·higher "
    "with Spark's equal-neighbors short-circuit (duplicated values return exactly, no arithmetic) and integral-position branch — over a sorted list, because "
    "DuckDB quantile_cont's own lerp differs in the last ulp once the "
    "interpolation pair stops being dyadic (first seen at the 10x "
    "corpus; the two-sided spelling was verified against Spark "
    "empirically).  At scale the exact sort-based form gives way to "
    "approx_percentile (t-digest), whose error-bounded twin "
    "q_approx_distinct models.",
    tables=("orders",),
)

# ── analytic windows ─────────────────────────────────────────────────────

_sql_query(
    "q_window_running",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(round(sum({_dec("o_totalprice")}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS running_spend,
           CAST(round(sum({_dec("o_totalprice")}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS moving_sum_3
    FROM orders
    """,
    doc="Running sum + 3-row moving sum per customer — one window "
    "sort-shuffle serves both frames (DECIMAL accumulation for "
    "engine-portable exactness — a moving *average* would hit "
    "half-up-vs-half-even ties between engines; DOUBLE only at the "
    "output boundary).",
    tables=("orders",),
)

_sql_query(
    "q_window_lead",
    """
    SELECT user_id, event_id,
           lead(event_id) OVER w AS next_event_id,
           lag(event_id)  OVER w AS prev_event_id,
           ntile(4)       OVER w AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    doc="lead/lag/ntile over the per-connection message sequence — the "
    "analytic-window complement of the T3 seqnum audit.",
    tables=("events",),
)

# ── semi-join / per-group top-k ──────────────────────────────────────────

_sql_query(
    "q_join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    doc="Left-semi join (customers with ≥1 order): the planner rewrites "
    "IN to a semi-join that never materializes the probe side's matches — "
    "the dual of q_join_anti's pending-set semantics.",
    tables=("customer", "orders"),
)

_sql_query(
    "q_topk_per_group",
    """
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
    doc="Top-3 orders per priority: rank-then-filter — Spark pushes a "
    "per-partition limit below the window exchange (WindowGroupLimit), so "
    "each map task ships at most k rows per group.",
    tables=("orders",),
)

# ── temporal joins (as-of / range) ───────────────────────────────────────


@register(
    "q_join_asof",
    oracle="""
    WITH purch AS (
      SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id,
           p.event_id AS last_purchase_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="As-of join (north-star custom operator): each click attributed "
    "to the user's most recent purchase at or before it — union + one "
    "window sort per key + last(ignorenulls), ONE shuffle, no inequality "
    "join (operators/temporal.py).  Oracle: DuckDB's native ASOF JOIN.",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import temporal

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    out = temporal.asof_join(
        clicks,
        purchases,
        key="user_id",
        probe_ts="ts",
        event_ts="ts",
        payload_cols=["purchase_id"],
    )
    return out.select(
        "event_id", "user_id", F.col("purchase_id").alias("last_purchase_id")
    )


@register(
    "q_join_range",
    # The oracle uses the SAME 3-bin equality trick as the operator
    # (round 11): the former raw-inequality LEFT JOIN made DuckDB plan
    # a per-user inequality join that ground >55 min at sf10 (10M
    # events) where this hash-join spelling takes seconds.  Semantics
    # identical: an event within ±3600 s of a purchase lands in exactly
    # one of the purchase's three probe bins (floor arithmetic), so
    # each qualifying pair is counted once; unmatched purchases keep
    # their 3 probe rows and count 0.
    oracle="""
    WITH ex AS (
      SELECT user_id, event_id AS oid,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600.0)
                  AS BIGINT) AS bin
      FROM events
    ),
    p AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ps,
             CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600.0)
                  AS BIGINT) AS bin
      FROM events WHERE event_type = 'purchase'
    ),
    px AS (
      SELECT p.event_id, p.user_id, p.ps, p.bin + d.d AS jbin
      FROM p, (VALUES (-1), (0), (1)) AS d(d)
    )
    SELECT px.event_id,
           count(e.oid) FILTER (WHERE e.oid <> px.event_id
                                  AND abs(px.ps - e.es) <= 3600)
             AS n_in_range
    FROM px
    LEFT JOIN ex e ON e.user_id = px.user_id AND e.bin = px.jbin
    GROUP BY px.event_id
    """,
    doc="Range join (north-star custom operator): per purchase, how many "
    "other events of the same user fall within ±1 hour.  Binned to "
    "equality keys (3-bin constant fan-out) + exact post-filter — a hash "
    "shuffle instead of the nested loop a raw inequality predicate plans "
    "(operators/temporal.py).",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import temporal

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    others = ev.select(
        F.col("user_id"),
        F.col("ts").alias("ots"),
        F.col("event_id").alias("other_id"),
    )
    counted = temporal.range_join_count(
        purchases,
        others,
        key="user_id",
        left_ts="ts",
        right_ts="ots",
        radius_seconds=3600,
    )
    # range_join_count counts ALL rows incl. the purchase itself; subtract it
    return counted.select(
        "event_id", (F.col("n_in_range") - 1).alias("n_in_range")
    )


# ── near-dup clustering (iterative) ──────────────────────────────────────


@register(
    "q_dedup_components",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
               i -> concat_ws(' ', string_split(text, ' ')[i],
                                   string_split(text, ' ')[i+1],
                                   string_split(text, ' ')[i+2])) AS s
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.8
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM pairs
    ),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT e.b AS id, reach.r FROM reach JOIN edges e ON reach.id = e.a
    )
    SELECT id, min(r) AS component_id FROM reach GROUP BY id
    """,
    doc="Near-dup clustering: connected components over exact-Jaccard≥0.8 "
    "edges (iterative min-label propagation on the Spark side; the oracle "
    "computes the same components with a recursive CTE).  The step after "
    "every real dedup pass: pick one keeper per component.",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8
    ).select("id_a", "id_b")
    ids = docs.select(F.col("doc_id").alias("id"))
    return dedup.connected_components(ids, edges)


# ── robust outlier screening (late round 5) ──────────────────────────────

@register(
    "q_outlier_flags",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3,
             quantile_cont(o_totalprice, 0.5)  AS med
      FROM orders
    ),
    md AS (
      SELECT quantile_cont(abs(o_totalprice - (SELECT med FROM b)), 0.5)
               AS mad
      FROM orders
    ),
    ifen AS (
      SELECT q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM b
    ),
    mfen AS (
      SELECT med - 3.0 * 1.4826 * mad AS lo,
             med + 3.0 * 1.4826 * mad AS hi
      FROM b, md
    ),
    gfen AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25)
               - 1.5 * (quantile_cont(o_totalprice, 0.75)
                        - quantile_cont(o_totalprice, 0.25)) AS lo,
             quantile_cont(o_totalprice, 0.75)
               + 1.5 * (quantile_cont(o_totalprice, 0.75)
                        - quantile_cont(o_totalprice, 0.25)) AS hi
      FROM orders GROUP BY 1
    )
    SELECT 'iqr' AS branch, o_orderkey, o_totalprice AS v,
           CAST(NULL AS VARCHAR) AS grp,
           lo AS bound_lo, hi AS bound_hi,
           (o_totalprice < lo OR o_totalprice > hi) AS is_outlier
    FROM orders, ifen
    UNION ALL
    SELECT 'mad' AS branch, o_orderkey, o_totalprice AS v,
           CAST(NULL AS VARCHAR) AS grp,
           lo AS bound_lo, hi AS bound_hi,
           (o_totalprice < lo OR o_totalprice > hi) AS is_outlier
    FROM orders, mfen
    UNION ALL
    SELECT 'iqr_grp' AS branch, o_orderkey, o_totalprice AS v,
           o_orderpriority AS grp,
           lo AS bound_lo, hi AS bound_hi,
           (o_totalprice < lo OR o_totalprice > hi) AS is_outlier
    FROM orders JOIN gfen USING (o_orderpriority)
    """,
    doc="Robust outlier screening (operators/outliers.py) over order "
    "totals, both fence families as a labeled union: Tukey IQR fences "
    "(k=1.5) and MAD z-fences (k=3, consistency constant 1.4826).  The "
    "Spark side runs the real operator with exact=True — fences derive "
    "from the sort-based exact percentile (≡ DuckDB quantile_cont up "
    "to interpolation op order) through fixed-order IEEE fence arithmetic computed "
    "driver-side, so fences AND per-row verdicts hash-match without "
    "rounding.  Production path: approxQuantile (Greenwald-Khanna, one "
    "mergeable pass) for the bounds — the verdict stays a map-only "
    "comparison against plan-literal fences; bounds are reusable via "
    "the bounds= parameter (score today's partition against last "
    "week's fences).",
)
def q_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.outliers import flag_outliers, flag_outliers_grouped

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    def _branch(method: str, k: float) -> DataFrame:
        return flag_outliers(
            orders, "o_totalprice", method=method, k=k, exact=True
        ).select(
            F.lit(method).alias("branch"),
            "o_orderkey",
            F.col("o_totalprice").alias("v"),
            F.lit(None).cast("string").alias("grp"),
            "bound_lo",
            "bound_hi",
            "is_outlier",
        )

    # per-group fences: a DISTRIBUTED grouped aggregate joined back —
    # the no-driver-collect shape a 100 TB deployment needs
    grouped = flag_outliers_grouped(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ),
        ["o_orderpriority"],
        "o_totalprice",
        method="iqr",
        k=1.5,
        exact=True,
    ).select(
        F.lit("iqr_grp").alias("branch"),
        "o_orderkey",
        F.col("o_totalprice").alias("v"),
        F.col("o_orderpriority").alias("grp"),
        "bound_lo",
        "bound_hi",
        "is_outlier",
    )
    # the two scalar branches each run an exact-percentile fence job at
    # construction; they are independent — overlap them (opt guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        iqr_f = pool.submit(_branch, "iqr", 1.5)
        mad_f = pool.submit(_branch, "mad", 3.0)
    return iqr_f.result().unionAll(mad_f.result()).unionAll(grouped)

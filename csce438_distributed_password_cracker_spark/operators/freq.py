"""Heavy hitters — find every item whose frequency exceeds a share
threshold, EXACTLY, without a full-vocabulary groupBy.

Reference analog: none (north-star extension, BASELINE.json) — the
"most frequent tokens / domains / URLs" sweep every corpus-curation
pipeline runs before choosing stopword lists, boilerplate filters, or
per-domain caps.

Why not just ``GROUP BY item``?  At 100 TB the item column (tokens,
URLs, hosts) has billions of distinct values, so the exact groupBy
shuffles the full corpus keyed by item — almost all of it for items
that occur once and can never pass the threshold.  The classic fix is
a two-pass sieve (Misra–Gries 1982; mergeability per Agarwal et al.
2012, "Mergeable Summaries", PODS):

1. **Candidate pass (map-only):** each partition maintains a
   Misra–Gries summary with ``k`` counters in one Arrow-batched
   ``mapInPandas`` sweep.  MG guarantees per-partition undercount
   ≤ n_p/(k+1), so any item with partition-local frequency
   > n_p/(k+1) survives locally; summing over partitions, any item
   with GLOBAL frequency > n/(k+1) must exceed n_p/(k+1) in at least
   one partition and therefore appears in some summary (the pigeonhole
   step — pinned by a hypothesis property in tests/test_freq.py).
   Output is ≤ k rows per partition — no shuffle of the corpus.
2. **Merge + pre-sieve (one tiny shuffle):** the per-partition
   summaries (≤ k+1 rows each) merge via ``groupBy(item).agg(sum)``
   and the threshold upper-bound test runs distributed, so the driver
   collect is O(true candidates), not O(partitions·k) — the shape
   that survives 10⁵-10⁶ input partitions.
3. **Exact pass:** re-scan with the (tiny) candidate set as a
   pushed-down ``isin`` filter / broadcast semi-join, groupBy the
   survivors only, and keep items with ``count * den > total`` —
   integer-exact, engine-portable arithmetic.

Total cost: two corpus scans, one summary-sized merge shuffle, and one
shuffle whose input is only the candidate-matching rows.  The
threshold must satisfy
``1/den ≥ 1/(k+1)`` (i.e. ``k + 1 ≥ den``) for the no-false-negative
guarantee; :func:`heavy_hitters` enforces it.

The per-batch merge uses the mergeable-summaries form of MG: merge
counter multisets by summing, then subtract the (k+1)-th largest count
from every counter and drop the non-positives — equivalent to running
the one-item-at-a-time decrement loop, but vectorized over
``value_counts`` of each Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def mg_merge(summary: dict, batch_counts: dict, k: int) -> dict:
    """Merge exact ``batch_counts`` into a Misra–Gries ``summary`` with
    at most ``k`` counters (Agarwal et al. 2012 §3: sum counters, then
    subtract the (k+1)-th largest and drop ≤ 0).  Pure function of the
    two dicts (inputs are never mutated) — shared by the Arrow sweep
    and the property tests."""
    merged = dict(summary)
    for item, c in batch_counts.items():
        merged[item] = merged.get(item, 0) + int(c)
    if len(merged) > k:
        # (k+1)-th largest count; subtracting it zeroes at least one
        # counter, so ≤ k survive
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {i: c - cut for i, c in merged.items() if c - cut > 0}
    return merged


def mg_partials(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries: ≤ ``k`` (item, est) rows per
    partition plus ONE sentinel row (item NULL, est = partition row
    count) so the caller gets the exact total in the same single scan.
    NULL items are excluded from counting (mirror any oracle with
    ``WHERE item IS NOT NULL``).  The item column keeps its ORIGINAL
    type — summaries and the downstream recount join/filter stay
    type-exact (no stringification collisions).  Complex item types
    (array/map/struct) are rejected loudly — they are unhashable in
    the counting kernel; serialize first (``to_json`` or a hash)."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    from pyspark.sql.types import ArrayType, MapType, StructType

    dt = df.schema[item_col].dataType
    if isinstance(dt, (ArrayType, MapType, StructType)):
        raise ValueError(
            f"item column {item_col!r} has complex type {dt.simpleString()}"
            " — unhashable in the counting kernel; serialize it first"
            " (to_json(col) or xxhash64(col))"
        )
    src = df.select(F.col(item_col).alias("item"))
    out_schema = StructType(
        [
            StructField("item", src.schema["item"].dataType, True),
            StructField("est", LongType(), False),
        ]
    )

    def _sweep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        seen = 0
        for pdf in batches:
            vals = pdf["item"].dropna()
            seen += len(vals)
            summary = mg_merge(summary, vals.value_counts().to_dict(), k)
        # the sentinel travels in its OWN frame: appending None to an
        # int64 item list coerces the pandas column to float64, which
        # silently corrupts ids above 2^53 (review-caught regression)
        yield pd.DataFrame(
            {
                "item": list(summary.keys()),
                "est": [int(v) for v in summary.values()],
            }
        )
        yield pd.DataFrame({"item": [None], "est": [seen]})

    return src.mapInPandas(_sweep, out_schema)


def sieved_candidates(partials: DataFrame, den: int, k: int) -> DataFrame:
    """The distributed pre-sieve between the MG sweep and the driver:
    merge per-partition summaries with ONE tiny shuffle
    (``groupBy(item).agg(sum(est))`` — ≤ (k+1) rows per input partition,
    ≤ distinct-candidate rows out), recover ``total`` from the merged
    NULL-item sentinel group as a broadcast 1-row frame, and keep only
    items whose estimate UPPER BOUND crosses the threshold:

        keep i  iff  (sum_est_i + total/(k+1)) > total/den

    cross-multiplied so the comparison stays integer-exact (a floored
    slack could drop a boundary item).  An item absent from a
    partition's summary has local undercount ≤ n_p/(k+1); summed over
    partitions the global understatement is ≤ total/(k+1), so no item
    above threshold can be sieved out (the pigeonhole guarantee).

    Scale shape: the driver collect downstream of this frame is
    O(true candidates), NOT O(partitions·k) — at 10⁵-10⁶ input
    partitions the unmerged collect would ship 10⁷-10⁸ rows to the
    driver; the merged, pre-sieved collect ships only items that can
    actually pass.  Output columns: item, est, __total."""
    merged = partials.groupBy("item").agg(F.sum("est").alias("est"))
    tot = merged.where(F.col("item").isNull()).select(
        F.col("est").alias("__total")
    )
    return (
        merged.where(F.col("item").isNotNull())
        .crossJoin(F.broadcast(tot))
        .where(
            (F.col("est") * (k + 1) + F.col("__total")) * den
            > F.col("__total") * (k + 1)
        )
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    den: int,
    k: int | None = None,
    count_col: str = "cnt",
    handle: list | None = None,
) -> DataFrame:
    """All items whose frequency strictly exceeds ``total / den``, with
    their EXACT counts — ``(item, cnt)``, the item keeping its original
    column name AND type.

    ``k`` (MG counter budget, default ``2 * den``) must satisfy
    ``k + 1 ≥ den`` or candidates could be silently missed.

    FULLY LAZY (round-7 convergence with the grouped sibling): nothing
    reaches the driver.  The per-partition MG summaries persist
    (MEMORY_AND_DISK, ≤ k+1 rows per partition) and are shared by the
    sieve subtree and the sentinel-total subtree; the exact pass is a
    broadcast semi-join of the corpus against the sieved candidate
    FRAME (:func:`sieved_candidates` — O(true candidates) rows), and
    the final threshold compares against the broadcast 1-row total.
    At 10⁵-10⁶ partitions this keeps the driver entirely out of the
    data path — the round-6 eager variant still drained candidates
    through one driver collect to build an ``isin`` literal list.

    Lifecycle: the persisted summaries are owned by the returned plan
    (Spark evicts LRU; lineage survives executor loss).  A long-lived
    driver that wants DETERMINISTIC release passes ``handle=[]`` — the
    persisted frame is appended to it, so the caller can
    ``h[0].unpersist()`` once the result is materialized.
    """
    if den < 2:
        raise ValueError(f"den must be ≥ 2, got {den}")
    k = 2 * den if k is None else k
    if k + 1 < den:
        raise ValueError(
            f"k={k} breaks the guarantee: need k+1 ≥ den={den} so every "
            "item above threshold survives the Misra-Gries sieve"
        )
    from pyspark import StorageLevel

    # persist so the sentinel-total subtree and the merged-candidates
    # subtree share ONE corpus sweep (the cached partials are ≤ (k+1)
    # rows per partition — negligible)
    partials = mg_partials(df, item_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if handle is not None:
        handle.append(partials)
    cand = sieved_candidates(partials, den, k).select(
        F.col("item").alias("__hh_item")
    )
    tot = (
        partials.where(F.col("item").isNull())
        .agg(F.sum("est").alias("__total"))
    )
    item = F.col(item_col)
    exact = (
        df.where(item.isNotNull())
        .join(F.broadcast(cand), item == F.col("__hh_item"), "left_semi")
        .groupBy(item)
        .agg(F.count("*").alias(count_col))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .where(F.col(count_col) * den > F.col("__total"))
        .select(item_col, count_col)
    )


def mg_partials_by_group(
    df: DataFrame, group_col: str, item_col: str, k: int
) -> DataFrame:
    """Per-(partition, group) Misra–Gries summaries: ≤ ``k``
    (grp, item, est) rows per group per partition plus ONE sentinel row
    per (partition, group) — item NULL, est = the group's non-NULL item
    count — so per-group totals ride the same single scan.  NULL items
    are excluded from counting; a NULL GROUP is a legitimate group of
    its own (downstream joins are null-safe).  Same complex-type guard
    as :func:`mg_partials`."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    from pyspark.sql.types import ArrayType, MapType, StructType

    for c in (group_col, item_col):
        dt = df.schema[c].dataType
        if isinstance(dt, (ArrayType, MapType, StructType)):
            raise ValueError(
                f"column {c!r} has complex type {dt.simpleString()}"
                " — unhashable in the counting kernel; serialize it"
                " first (to_json(col) or xxhash64(col))"
            )
    src = df.select(
        F.col(group_col).alias("grp"), F.col(item_col).alias("item")
    )
    out_schema = StructType(
        [
            StructField("grp", src.schema["grp"].dataType, True),
            StructField("item", src.schema["item"].dataType, True),
            StructField("est", LongType(), False),
        ]
    )

    def _sweep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summaries: dict = {}
        seen: dict = {}
        for pdf in batches:
            ok = pdf[pdf["item"].notna()]
            # pandas groupby drops NaN keys by default — dropna=False
            # keeps the NULL group (its own stratum, not silently lost)
            for grp, sub in ok.groupby("grp", dropna=False, sort=False):
                key = None if pd.isna(grp) else grp
                seen[key] = seen.get(key, 0) + len(sub)
                summaries[key] = mg_merge(
                    summaries.get(key, {}),
                    sub["item"].value_counts().to_dict(),
                    k,
                )
        yield pd.DataFrame(
            [
                (grp, item, int(est))
                for grp, summary in summaries.items()
                for item, est in summary.items()
            ],
            columns=["grp", "item", "est"],
        )
        # sentinels in their own frame (the int64-coercion trap — see
        # mg_partials)
        yield pd.DataFrame(
            [(grp, None, int(n)) for grp, n in seen.items()],
            columns=["grp", "item", "est"],
        )

    return src.mapInPandas(_sweep, out_schema)


def grouped_heavy_hitters(
    df: DataFrame,
    group_col: str,
    item_col: str,
    den: int,
    k: int | None = None,
    count_col: str = "cnt",
    total_col: str = "grp_total",
    handle: list | None = None,
) -> DataFrame:
    """Per-GROUP heavy hitters — every (group, item) whose frequency
    strictly exceeds ``group_total / den`` WITHIN its group, with exact
    counts: ``(group_col, item_col, count_col, total_col)``.  The
    per-domain sweep of corpus curation (per-source boilerplate tokens,
    per-host URL patterns) where a global threshold would drown small
    domains under big ones.

    Same two-pass Misra–Gries shape as :func:`heavy_hitters`, grouped:
    the MG pigeonhole bound holds PER (partition, group) — an item
    above its group's threshold exceeds the local bound in some
    partition's summary of that group — so the sieve stays exact with
    the same ``k + 1 ≥ den`` requirement.  The candidate set stays a
    DATAFRAME end-to-end (≤ groups × k rows): at millions of groups a
    driver collect would be the exact O(groups·k) mistake the global
    operator's pre-sieve removed, so the exact pass is a semi-join
    against the sieved candidates instead of an isin pushdown.  The
    summary-sized frames (candidates, per-group totals) join with an
    explicit BROADCAST hint: the Arrow sweep already holds every
    group's k-counter summary in one partition's dict, so the
    operator's memory contract is groups × k fits an executor — the
    same bound that makes the broadcast safe, and it keeps the CORPUS
    side of the exact pass from ever shuffling (the initial plan
    would otherwise sort-merge the full token stream on (group,
    item)).  Group joins are NULL-SAFE — a NULL group is a stratum,
    not a dropped row.

    Lifecycle: the MERGED summaries (≤ candidates + groups rows — the
    post-shuffle frame both the totals and candidate subtrees consume)
    persist (MEMORY_AND_DISK) and are owned by the returned plan —
    Spark evicts LRU, lineage survives executor loss.  A long-lived
    driver that wants DETERMINISTIC release passes ``handle=[]``: the
    persisted frame is appended to it for ``h[0].unpersist()`` after
    the result is materialized (same contract as
    :func:`heavy_hitters`).
    """
    if den < 2:
        raise ValueError(f"den must be ≥ 2, got {den}")
    k = 2 * den if k is None else k
    if k + 1 < den:
        raise ValueError(
            f"k={k} breaks the guarantee: need k+1 ≥ den={den} so every "
            "item above its group threshold survives the Misra-Gries sieve"
        )
    from pyspark import StorageLevel

    merged = (
        mg_partials_by_group(df, group_col, item_col, k)
        .groupBy("grp", "item")
        .agg(F.sum("est").alias("est"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if handle is not None:
        handle.append(merged)
    totals = merged.where(F.col("item").isNull()).select(
        "grp", F.col("est").alias("__total")
    )
    cand = (
        merged.where(F.col("item").isNotNull())
        .join(
            F.broadcast(totals.withColumnRenamed("grp", "__t_grp")),
            F.col("grp").eqNullSafe(F.col("__t_grp")),
        )
        .where(
            (F.col("est") * (k + 1) + F.col("__total")) * den
            > F.col("__total") * (k + 1)
        )
        .select("grp", "item")
    )
    src = df.select(
        F.col(group_col).alias("grp"), F.col(item_col).alias("item")
    ).where(F.col(item_col).isNotNull())
    exact = (
        src.join(
            F.broadcast(
                cand.withColumnsRenamed(
                    {"grp": "__c_grp", "item": "__c_item"}
                )
            ),
            F.col("grp").eqNullSafe(F.col("__c_grp"))
            & (F.col("item") == F.col("__c_item")),
            "left_semi",
        )
        .groupBy("grp", "item")
        .agg(F.count("*").alias(count_col))
    )
    return (
        exact.join(
            F.broadcast(totals.withColumnRenamed("grp", "__t_grp")),
            F.col("grp").eqNullSafe(F.col("__t_grp")),
        )
        .where(F.col(count_col) * den > F.col("__total"))
        .select(
            F.col("grp").alias(group_col),
            F.col("item").alias(item_col),
            count_col,
            F.col("__total").alias(total_col),
        )
    )

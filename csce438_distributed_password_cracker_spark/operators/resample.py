"""Time-series resampling with gap-fill — regularize an event stream
onto a fixed-interval grid per key, carrying the last observation
forward through empty bins (LOCF).

The standard feature-engineering step before windowed models (pandas
``resample().ffill()``, TimescaleDB ``time_bucket_gapfill`` +
``locf``): telemetry arrives irregularly, the model wants one row per
(key, interval).

Scale shape (100 TB):

- Binning + per-bin aggregation is ONE shuffle on (key, bin) with
  map-side partials; the per-bin "last" value is a ``max_by`` over a
  (ts, id) tuple — a SELECTION, not arithmetic, so results are
  deterministic under any partitioning and safe to hash.
- The grid is generated from each key's OWN span (min..max bin —
  a tiny per-key aggregate + a map-only ``sequence`` explode), never a
  global cross join of keys × bins: a key active for one hour costs
  one hour of rows.  ``max_bins_per_key`` turns a pathological span
  (one stray 1970 timestamp → half a century of grid) into a loud
  error instead of an explode.
- The LOCF pass is one window per key (``last(..., ignorenulls)``) —
  a single exchange on the key, sorted by bin.

Reference analog: none (north-star time-series family; the event
stream is SURVEY §2.9's table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_locf", "resample_interp"]


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    interval_seconds: int,
    value_col: str | None = None,
    id_col: str | None = None,
    max_bins_per_key: int = 1_000_000,
    _keep_last: bool = False,
) -> DataFrame:
    """Resample ``df`` onto ``interval_seconds`` bins per ``key_col``:
    one output row per (key, bin) from the key's first to last active
    bin, with

    - ``bin_start`` — the bin's start timestamp,
    - ``n_events`` — events in the bin (0 for gap bins),
    - ``filled`` — true iff the bin had no events,
    - ``<value_col>_locf`` (when ``value_col`` given) — the bin's last
      NON-NULL observation by (ts, id) order, carried forward through
      gaps (NULL until the key's first non-NULL observation).  A bin
      whose every event has a NULL value keeps the previous bin's
      carry — a NULL measurement is "no observation", not "observe
      NULL" (matching the streaming kernel and the SQL twin's
      NULL-skipping ``arg_max``).

    ``id_col`` breaks ties between events sharing a timestamp (pass it
    whenever the stream can contain same-instant events — without it
    the per-bin "last" falls back to ts order alone, which is only
    deterministic for strictly increasing timestamps)."""
    if interval_seconds < 1:
        raise ValueError("interval_seconds must be >= 1")
    n = int(interval_seconds)
    bin_col = F.floor(F.unix_timestamp(F.col(ts_col)) / n).alias("_bin")
    order = (
        F.struct(F.col(ts_col), F.col(id_col))
        if id_col
        else F.struct(F.col(ts_col))
    )
    aggs = [F.count("*").alias("_n")]
    if value_col is not None:
        # NULL ordering key on NULL-valued rows: max_by skips them, so
        # the per-bin pick is the last NON-null observation (a NULL
        # measurement must not erase the carry-forward)
        aggs.append(
            F.max_by(
                F.col(value_col),
                F.when(F.col(value_col).isNotNull(), order),
            ).alias("_last")
        )
    per_bin = df.groupBy(F.col(key_col), bin_col).agg(*aggs)
    spans = per_bin.groupBy(key_col).agg(
        F.min("_bin").alias("_b0"), F.max("_bin").alias("_b1")
    )
    # the span guard rides the grid expression LAZILY (raise_error in
    # the over-limit branch): an eager collect here would run the full
    # (key, bin) aggregation once for the check and again for the
    # returned plan — doubling the corpus pass this operator is
    # documented to make once
    cap = int(max_bins_per_key)
    grid = spans.select(
        key_col,
        F.explode(
            F.expr(
                f"sequence(_b0, CASE WHEN _b1 - _b0 < {cap} THEN _b1 "
                f"ELSE CAST(raise_error(concat("
                f"'key ', CAST(`{key_col}` AS STRING), ' spans ', "
                f"CAST(_b1 - _b0 + 1 AS STRING), "
                f"' bins (> max_bins_per_key={cap}) — a stray "
                f"timestamp would explode the grid; clean or clamp "
                f"first')) AS BIGINT) END)"
            )
        ).alias("_bin"),
    )
    joined = grid.join(per_bin, [key_col, "_bin"], "left")
    out = joined.select(
        key_col,
        F.timestamp_seconds(F.col("_bin") * n).alias("bin_start"),
        F.col("_bin").alias("bin"),
        F.coalesce("_n", F.lit(0)).cast("long").alias("n_events"),
        F.col("_n").isNull().alias("filled"),
        *(
            [F.col("_last")]
            if value_col is not None
            else []
        ),
    )
    if value_col is not None:
        w = (
            Window.partitionBy(key_col)
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            f"{value_col}_locf",
            F.last("_last", ignorenulls=True).over(w),
        )
        if not _keep_last:
            out = out.drop("_last")
    return out


def resample_interp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    interval_seconds: int,
    value_col: str,
    id_col: str | None = None,
    max_bins_per_key: int = 1_000_000,
) -> DataFrame:
    """:func:`resample_locf` with LINEAR interpolation through gaps
    instead of a flat carry — the ``pandas resample().interpolate()`` /
    TimescaleDB ``interpolate()`` shape for quantities that drift
    between observations (gauges, prices) rather than step (states).

    Adds ``<value_col>_interp``: for a bin with an observation, the
    observation itself (the same per-bin last-non-NULL selection as
    LOCF); for a gap bin BETWEEN two observed bins, the straight line
    between the surrounding anchors evaluated at the bin index; before
    the key's first observation NULL (nothing to anchor the left end);
    after the last observation the value holds flat (≡ LOCF — no right
    anchor to extrapolate toward, and silent extrapolation invents
    data).

    Scale shape: everything :func:`resample_locf` does plus ONE more
    window over the same (key, bin) ordering — the backward pass reuses
    the LOCF exchange; the forward pass is computed inside the same
    per-key sort (Catalyst fuses windows sharing partitioning+ordering,
    so no extra shuffle — pinned in tests/test_resample.py).
    """
    out = resample_locf(
        df,
        key_col,
        ts_col,
        interval_seconds,
        value_col=value_col,
        id_col=id_col,
        max_bins_per_key=max_bins_per_key,
        _keep_last=True,
    )
    # anchor = (bin, value) of the nearest bin with its OWN non-NULL
    # observation (``_last`` — NOT the LOCF column: a bin whose events
    # all carry NULL values inherits a carry-forward but must not
    # anchor the line); bin and value travel together as a struct
    obs = F.when(
        F.col("_last").isNotNull(),
        F.struct(
            F.col("bin").alias("b"),
            F.col("_last").cast("double").alias("v"),
        ),
    )
    back = (
        Window.partitionBy(key_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy("bin")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev = F.last(obs, ignorenulls=True).over(back)
    nxt = F.first(obs, ignorenulls=True).over(fwd)
    # gap with both anchors → lerp; no right anchor → hold left (LOCF);
    # no left anchor → NULL.  The observed-bin case falls out of prev:
    # its own anchor IS prev, so the lerp fraction is 0.
    frac = (F.col("bin") - prev["b"]).cast("double") / (
        nxt["b"] - prev["b"]
    ).cast("double")
    out = out.withColumn(
        f"{value_col}_interp",
        F.when(
            prev.isNotNull() & nxt.isNotNull() & (nxt["b"] != prev["b"]),
            prev["v"] + (nxt["v"] - prev["v"]) * frac,
        ).otherwise(prev["v"]),
    )
    return out.drop("_last")

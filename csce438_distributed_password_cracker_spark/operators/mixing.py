"""Token-budget corpus mixing — compose a pretraining corpus from
weighted domains under a total token budget.

The standard last step of a curation pipeline (after dedup / decontam /
quality filtering): given per-domain mixture weights (e.g. web 0.6,
code 0.2, books 0.2) and a token budget, decide per row whether it is
in the mix.  Public prior art: the per-source mixture tables of the
Pile / LLaMA / Gopher training setups.

Reference analog: none (north-star addition beyond the reference's
surface, like operators/split.py).

Scale shape (100 TB):

- ONE small aggregation (``groupBy(domain).sum(tokens)``) produces per-
  domain token totals — ≤ #domains rows to the driver.
- Rate computation is a driver-side water-filling loop over those few
  rows: a domain whose corpus cannot supply its share saturates at the
  epoch cap (rate 1.0 by default; ``max_epochs > 1`` opts into
  LLaMA/Gopher-style upsampling of scarce domains) and its unused
  budget is redistributed across the remaining domains in proportion
  to their weights (iterates ≤ #domains times).
- The verdict pass is map-only: a "mix"-tag-salted key hash
  thresholded at the domain's rate — no shuffle, reproducible across
  runs/engines/partitionings, independent of split/sample decisions
  made on the same key (fresh hash per decision kind), and new rows
  get a stable verdict without touching old ones.

Hash-threshold sampling hits each domain's rate in expectation (error
O(1/sqrt(rows)) of the domain's token share); for quota-EXACT caps
rank within each domain by a hash coordinate and keep a token-prefix
(the :func:`~..operators.split.group_quota` shape — rank and threshold
must share one coordinate for the skew prefilter recipe to apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localframe import local_frame
from .split import _HASH_SPACE


def mixing_rates(
    domain_tokens: dict[str, int],
    weights: dict[str, float],
    token_budget: int,
    max_epochs: float = 1.0,
) -> dict[str, float]:
    """Per-domain sampling rates for a target mixture under a budget.

    Water-filling: start from ``rate_d = weight_d * budget / tokens_d``;
    any domain with rate ≥ ``max_epochs`` is saturated (it contributes
    its whole corpus ``max_epochs`` times over) and the budget it
    cannot absorb is re-spread over the unsaturated domains by weight.
    Deterministic, pure Python over ≤ #domains entries.

    ``max_epochs`` is the UPSAMPLING cap: 1.0 (default) never repeats a
    row; the LLaMA/Gopher mixture tables repeat scarce high-weight
    domains (Wikipedia ~2.4 epochs in LLaMA-1), which is ``max_epochs >
    1`` here — a rate of 2.4 means every row twice plus a deterministic
    40% sample a third time (see :func:`mix_corpora` /
    :func:`explode_epochs`).
    """
    missing = set(weights) - set(domain_tokens)
    if missing:
        raise ValueError(f"weights name absent domains: {sorted(missing)}")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    weights = {d: w / wsum for d, w in weights.items()}
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be > 0")

    rates: dict[str, float] = {}
    # zero-weight and empty domains take rate 0 up front: a zero-weight
    # domain left "active" would make the renormalizing sum collapse to
    # 0 once every positive-weight domain saturates (division by zero)
    active = {
        d: w for d, w in weights.items() if domain_tokens[d] > 0 and w > 0
    }
    for d in weights:
        if d not in active:
            rates[d] = 0.0
    budget = float(token_budget)
    # Each pass either saturates >=1 domain or assigns final rates, so
    # the loop runs at most len(active) times.
    while active:
        asum = sum(active.values())
        saturated = []
        for d, w in active.items():
            want = w / asum * budget
            if want >= domain_tokens[d] * max_epochs:
                saturated.append(d)
        if not saturated:
            for d, w in active.items():
                rates[d] = (w / asum * budget) / domain_tokens[d]
            break
        for d in saturated:
            rates[d] = float(max_epochs)
            budget -= domain_tokens[d] * max_epochs
            del active[d]
        budget = max(budget, 0.0)
    return rates


def mix_corpora(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: int,
    seed: int = 42,
    flag_col: str = "in_mix",
    rate_col: str | None = "mix_rate",
    max_epochs: float = 1.0,
    epochs_col: str | None = None,
) -> DataFrame:
    """Append ``flag_col``: deterministic membership in a token-budgeted
    mixture.  Domains absent from ``weights`` are excluded (flag False,
    rate 0).  Returns the input columns plus the flag (and the applied
    per-domain rate when ``rate_col`` is set, for auditability).

    With ``max_epochs > 1`` the water-filling may assign a domain a
    rate above 1 (upsampling — the LLaMA/Gopher mixture shape); pass
    ``epochs_col`` to get the per-row repeat count ``floor(rate) +
    (bucket < frac(rate))`` — an exact integer both engines derive from
    the same hash, consumed by :func:`explode_epochs` to materialize
    the repeats.  ``flag_col`` is then ``epochs_col > 0``.

    One small agg + one map-only pass; see the module docstring for the
    scale argument and the expectation-vs-exact caveat.
    """
    if max_epochs > 1.0 and epochs_col is None:
        raise ValueError(
            "max_epochs > 1 upsamples rows; pass epochs_col to receive "
            "the per-row repeat count (explode_epochs materializes it)"
        )
    totals = {
        row[0]: row[1] or 0
        for row in (
            df.where(F.col(domain_col).isin(list(weights)))
            .groupBy(domain_col)
            .agg(F.sum(token_col))
            .collect()
        )
    }
    for d in weights:
        totals.setdefault(d, 0)
    rates = mixing_rates(totals, weights, token_budget, max_epochs)

    # tag-salt the sampling coordinate (fresh hash per decision kind):
    # the bare key hash at the default seed is the SAME coordinate
    # hash_split/hash_sample threshold on, so an unsalted mix at rate r
    # would select exactly the first r of the split ordering — e.g. the
    # test split into the training mix.  Mirrors the SQL twin's 'm' tag.
    bucket = F.pmod(
        F.xxhash64(F.lit("mix"), F.col(id_col), F.lit(seed)),
        F.lit(_HASH_SPACE),
    )
    # verdicts via a broadcast join against the tiny (domain, rate,
    # threshold) table, not a per-domain when-chain: the chain is a
    # linear codegen expression that degenerates at hundreds of
    # domains, while the broadcast hash join stays flat (and is still
    # map-side — no shuffle).  Unweighted/NULL domains miss the join
    # and coalesce to (False, 0.0), same as before.  The threshold
    # stored per domain is for the FRACTIONAL part of the rate; the
    # whole-epoch floor rides alongside as an int.
    spark = df.sparkSession
    rates_rows = [
        (
            d,
            float(r),
            int(r),  # whole epochs
            int((r - int(r)) * _HASH_SPACE),  # fractional threshold
        )
        for d, r in sorted(rates.items())
    ]
    # the rates-table key takes the INPUT's domain dtype (int sources,
    # string langs, ... all join cleanly; a hardcoded string key would
    # reject non-string domain columns at plan time)
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    rates_df = local_frame(
        spark,
        rates_rows,
        StructType(
            [
                StructField(domain_col, df.schema[domain_col].dataType),
                StructField("__mix_rate", DoubleType()),
                StructField("__mix_floor", LongType()),
                StructField("__mix_thr", LongType()),
            ]
        ),
    )
    epochs = F.coalesce(
        F.col("__mix_floor")
        + F.when(bucket < F.col("__mix_thr"), 1).otherwise(0),
        F.lit(0),
    ).cast("long")
    out = df.join(F.broadcast(rates_df), domain_col, "left").withColumn(
        flag_col, epochs > 0
    )
    if epochs_col:
        out = out.withColumn(epochs_col, epochs)
    if rate_col:
        out = out.withColumn(rate_col, F.coalesce("__mix_rate", F.lit(0.0)))
    return out.drop("__mix_rate", "__mix_floor", "__mix_thr").select(
        *df.columns,
        flag_col,
        *([epochs_col] if epochs_col else []),
        *([rate_col] if rate_col else []),
    )


def explode_epochs(
    df: DataFrame, epochs_col: str, epoch_col: str = "epoch"
) -> DataFrame:
    """Materialize the repeats an upsampling mix assigned: one output
    row per ``(input row, epoch)`` with ``epoch_col`` in ``[1,
    epochs]``; rows with 0 epochs disappear.  Map-only (``explode`` of
    a ``sequence`` — no shuffle), so upsampled duplicates are born on
    the partition that holds the source row; the deterministic global
    shuffle (:func:`~.split.shuffle_rows` keyed on ``(id, epoch)``) is
    the intended next stage, which also separates a row's epochs from
    one another in the final shard order."""
    return df.where(F.col(epochs_col) > 0).select(
        "*",
        F.explode(
            F.sequence(F.lit(1), F.col(epochs_col).cast("int"))
        ).alias(epoch_col),
    )

"""Deterministic dataset splitting (train/val/test) — a training-data
pipeline staple.  Assignment is a pure function of the row key (hash
bucket), never a random sample: reproducible across runs, clusters and
engines, stable under repartitioning, and new rows join a split without
reshuffling old ones — none of which `df.sample`/`randomSplit` guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def hash_bucket(id_col: str, n_buckets: int = 100, seed: int = 42) -> Column:
    """Bucket in [0, n_buckets) from xxhash64 of the key — the production
    path (one JVM hash, no string materialization)."""
    return F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_buckets))


def md5_bucket_sql(expr: str, n_buckets: int = 256) -> str:
    """Engine-portable bucket from the first two hex chars of md5 —
    md5 is bit-identical in Spark and DuckDB, and the hex-char arithmetic
    spells the same in both dialects (instr/strpos differ; this uses
    position arithmetic via a lookup string).  Used by the oracle-checked
    split query; production uses :func:`hash_bucket`."""
    c1 = f"position(substring(md5({expr}), 1, 1) IN '{HEX}') - 1"
    c2 = f"position(substring(md5({expr}), 2, 1) IN '{HEX}') - 1"
    return f"((({c1}) * 16 + ({c2})) % {n_buckets})"


_HASH_SPACE = 1_000_000


def _sample_bucket(id_col: str, seed: int) -> Column:
    """The shared sampling coordinate: ``xxhash64(key, seed) mod 1e6``.
    hash_sample/stratified_sample THRESHOLD on it and group_quota RANKS
    by it, so threshold-prefilter + rank compose exactly (the skewed-
    stratum recipe in :func:`group_quota`)."""
    return F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_HASH_SPACE))


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 42,
    flag_col: str = "in_sample",
) -> DataFrame:
    """Append a deterministic Bernoulli-style sample flag: keep iff
    ``xxhash64(key, seed)`` falls in the first ``fraction`` of bucket
    space.  Unlike ``df.sample`` this is reproducible across runs,
    engines and partitionings, independent of any split assignment made
    with a different seed, and new rows get a stable verdict without
    touching old ones — one hash per row, no shuffle, no state."""
    bucket = _sample_bucket(id_col, seed)
    return df.withColumn(flag_col, bucket < int(fraction * _HASH_SPACE))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    fractions: dict | float,
    seed: int = 42,
    flag_col: str = "in_sample",
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` is either one
    rate for every stratum or a dict keyed by the (single) stratum
    value.  Same hash-threshold mechanics as :func:`hash_sample` — the
    stratum only picks the rate, so this is STILL one shuffle-free
    map-side pass (the trap to avoid at 100 TB is sampleBy/window
    designs that shuffle the corpus just to pick rows)."""
    bucket = _sample_bucket(id_col, seed)
    if isinstance(fractions, dict):
        if len(strata_cols) != 1:
            raise ValueError("dict fractions require exactly one stratum col")
        expr = None
        for val, frac in sorted(fractions.items()):
            cond = F.col(strata_cols[0]) == val
            thr = bucket < int(frac * _HASH_SPACE)
            expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
        expr = expr.otherwise(F.lit(False))
    else:
        expr = bucket < int(float(fractions) * _HASH_SPACE)
    return df.withColumn(flag_col, expr)


def group_quota(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    k: int,
    seed: int = 42,
    rank_col: str = "strat_rank",
    flag_col: str = "in_quota",
) -> DataFrame:
    """Cap each stratum at ``k`` rows, chosen deterministically: rank
    rows inside each stratum by the shared sampling bucket
    (:func:`_sample_bucket`, tie-break on the key) and keep rank ≤ k —
    the per-domain/per-source quota step of a corpus-curation pipeline,
    reproducible across runs.

    Scale note: this is one shuffle on the strata key plus a per-stratum
    sort.  A pathological stratum (one domain = 10% of 100 TB) makes
    that sort the straggler; when k ≪ stratum size, pre-filter with
    :func:`hash_sample`/:func:`stratified_sample` at a rate that
    overshoots k (e.g. 3·k/|stratum|) and rank only the survivors —
    same final kept set, because ranking and thresholding use the SAME
    bucket coordinate, so dropping rows above the threshold can only
    remove ranks > k — at a fraction of the sort cost.  (Equivalence
    pinned in tests/test_extended.py.)"""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(_sample_bucket(id_col, seed), F.col(id_col))
    )
    out = df.withColumn(rank_col, F.row_number().over(w))
    return out.withColumn(flag_col, F.col(rank_col) <= k)


def shuffle_rows(
    df: DataFrame,
    id_col: str,
    seed: int = 42,
    num_shards: int | None = None,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Deterministic global shuffle — the "randomize training-data order"
    step before writing sharded output.  Ordering key is
    ``xxhash64(key, seed)`` (tie-break on the key), so the permutation
    is reproducible across runs/clusters and re-keyable by seed —
    everything ``df.orderBy(rand())`` is not.

    With ``num_shards``, a ``shard_col`` is appended: an ORDER-PRESERVING
    equal-width cut of the hash space (shard i holds the i-th contiguous
    hash interval), so shard membership is a pure function of
    (key, seed, num_shards) — reproducible across sessions, unlike an
    RDD partition index, whose RangePartitioner samples boundaries with
    a session-dependent seed.  Write with ``partitionBy(shard_col)``
    (or repartition on it) and readers walking shards in id order see
    the same permutation end-to-end on every run.

    The plan is a range partition on the hash + within-partition sort
    (one exchange, no single-node global sort)."""
    keyed = df.withColumn(
        "__shuf", F.xxhash64(F.col(id_col), F.lit(seed))
    )
    out = keyed.orderBy("__shuf", id_col)
    if num_shards is not None:
        # map int64 hash space onto [0, num_shards) monotonically;
        # double rounding is monotone, so order across shards holds
        shard = F.least(
            F.lit(num_shards - 1),
            F.floor(
                (F.col("__shuf").cast("double") / F.lit(2.0**64) + 0.5)
                * num_shards
            ).cast("int"),
        )
        out = out.withColumn(shard_col, shard)
    return out.drop("__shuf")


def md5_sample_sql(expr: str, tag: str, n_buckets: int = 256) -> str:
    """Engine-portable sampling bucket: md5 of a TAGGED key so multiple
    sampling decisions on the same key are independent (different tag ⇒
    a fresh hash).  Same two-hex-char arithmetic as
    :func:`md5_bucket_sql`; spells identically in Spark SQL and DuckDB."""
    return md5_bucket_sql(f"concat('{tag}:', {expr})", n_buckets)


def md5_uniform_sql(expr: str, tag: str, hex_chars: int = 6) -> str:
    """Engine-portable uniform in (0, 1): the first ``hex_chars`` hex
    chars of a tag-salted md5, read as an integer via the same
    position-lookup arithmetic as :func:`md5_bucket_sql`, then centered
    into the open interval — ``(v + 0.5) / 16^hex_chars`` — so ln(u) is
    always finite.  Spells identically in Spark SQL and DuckDB."""
    inner = f"concat('{tag}:', {expr})"
    acc = "0"
    for i in range(1, hex_chars + 1):
        c = f"(position(substring(md5({inner}), {i}, 1) IN '{HEX}') - 1)"
        acc = f"(({acc}) * 16 + {c})"
    return f"(({acc} + 0.5) / {16 ** hex_chars}.0)"


def _es_keyed(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    seed: int,
    key_col: str,
    u_col: str | None,
) -> DataFrame:
    """The shared Efraimidis–Spirakis coordinate: drop nonpositive/NULL
    weights, append ``key_col = ln(u)/w`` where u is the hash-derived
    (or injected) per-row uniform.  One definition so the global and
    per-group scopes can never drift apart."""
    w = F.col(weight_col).cast("double")
    if u_col is None:
        u = (
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 24))
            + F.lit(0.5)
        ) / F.lit(float(1 << 24))
    else:
        u = F.col(u_col)
    return df.where(w > 0).withColumn(key_col, F.ln(u) / w)


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
    key_col: str = "samp_key",
    u_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the k rows
    with the largest ``u^(1/w)`` where u is a per-row uniform — the
    Efraimidis–Spirakis (2006) one-pass reservoir scheme, which draws
    exactly the weighted-without-replacement distribution.  Ranking by
    ``ln(u)/w`` descending is the same order (ln is monotone, ln u < 0)
    without the overflow-prone pow.

    The uniform is hash-derived (``xxhash64(key, seed)`` centered into
    (0,1)), never ``rand()``: the sample is reproducible across runs,
    engines and partitionings, and re-keyable by seed.  Pass ``u_col``
    to supply an externally computed uniform (the oracle-checked query
    injects the md5-portable :func:`md5_uniform_sql` coordinate so
    DuckDB can replay the identical draw).

    Rows with weight ≤ 0 or NULL are excluded (they have probability 0;
    ln(u)/w would flip sign).  The plan is a TakeOrdered — per-partition
    top-k then a driver merge of k·n_partitions rows, no global sort —
    so it holds at 100 TB for the k a sampling step wants (≤ millions).
    """
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    out = _es_keyed(df, id_col, weight_col, seed, key_col, u_col)
    return out.orderBy(F.desc(key_col), F.col(id_col)).limit(k)


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
    key_col: str = "samp_key",
    rank_col: str = "samp_rank",
    u_col: str | None = None,
) -> DataFrame:
    """Per-stratum weighted sampling without replacement — the weighted
    analog of :func:`group_quota`: within each group, rank rows by the
    Efraimidis–Spirakis key ``ln(u)/w`` descending (deterministic
    tie-break on the id column) and keep ``rank ≤ k``.  Each group draws its own
    weighted-without-replacement sample of size ≤ k — the per-domain /
    per-source curation cap where bigger documents should win
    proportionally, not uniformly.

    Same uniform contract as :func:`weighted_sample_topk` (hash-derived,
    reproducible, ``u_col`` injectable); rows with weight ≤ 0 or NULL
    are excluded.  Cost is ONE shuffle on the group key + a per-group
    sort; for a pathological stratum, pre-filter on the SAME key
    coordinate (``key > c`` for a threshold that overshoots k) and rank
    only survivors — filtering by the ordering coordinate itself can
    only remove ranks > k once the threshold keeps ≥ k rows per group.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    keyed = _es_keyed(df, id_col, weight_col, seed, key_col, u_col)
    win = Window.partitionBy(*group_cols).orderBy(
        F.desc(key_col), F.col(id_col)
    )
    return keyed.withColumn(rank_col, F.row_number().over(win)).where(
        F.col(rank_col) <= k
    )


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_stages: int = 4,
    seed: int = 42,
    exact: bool = False,
    stage_col: str = "stage",
    order_col: str = "curr_key",
    relative_error: float = 1e-4,
) -> DataFrame:
    """Curriculum ordering for a dataloader (public prior art: Bengio
    2009 curriculum learning; length/quality-staged pretraining): bucket
    rows into ``n_stages`` ascending-score stages by QUANTILE thresholds
    and give each row a deterministic within-stage shuffle coordinate —
    the consumer sorts by ``(stage, curr_key, id)`` and reads easy→hard
    with the inside of each stage deterministically shuffled.

    Scale shape: thresholds are ONE quantile aggregation reduced to
    n_stages−1 driver literals (``approxQuantile`` one-pass mergeable by
    default; sort-based exact ``percentile`` under ``exact=True`` — the
    oracle-checked path), then stage assignment and the shuffle
    coordinate are MAP-ONLY.  No global sort happens here — materialize
    the order with ``repartitionByRange(stage_col, order_col)`` +
    within-partition sort at write time, exactly like
    :func:`shuffle_rows`.  A window ``ntile`` would equalize stage sizes
    but costs a single-partition global sort — the quantile-threshold
    form trades exact equality of stage sizes for a plan that survives
    100 TB.  NULL scores get stage NULL (screen them first)."""
    if n_stages < 2:
        raise ValueError(f"n_stages must be ≥ 2, got {n_stages}")
    from .quantiles import column_quantiles

    probs = [i / n_stages for i in range(1, n_stages)]
    thresholds = column_quantiles(
        df, score_col, probs, exact=exact, relative_error=relative_error
    )
    s = F.col(score_col)
    stage = None
    for t in thresholds:
        step = F.when(s > F.lit(t), 1).otherwise(0)
        stage = step if stage is None else stage + step
    # withColumn, not select('*', ...): a pre-existing stage/curr_key
    # column is REPLACED instead of silently duplicated (the ambiguous-
    # reference error would otherwise surface at the consumer's sort)
    return df.withColumn(
        stage_col, F.when(s.isNotNull(), stage).cast("int")
    ).withColumn(order_col, _sample_bucket(id_col, seed))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
    bucket_expr: Column | None = None,
    bucket_space: int = 1_000_000,
) -> DataFrame:
    """Append ``split_col`` ∈ weights.keys() assigned by hash bucket in
    proportion to the weights (must sum to 1).  Deterministic in
    (key, seed).

    ``bucket_expr``/``bucket_space`` replace the xxhash64 bucket with a
    caller-supplied coordinate in ``[0, bucket_space)`` — the same
    oracle-injection hook as ``u_col`` in the weighted samplers (the
    gate query injects the engine-portable md5 bucket so DuckDB replays
    identical assignments); production leaves it None."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    n = bucket_space
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n))
    )
    expr: Column | None = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(acc * n)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(split_col, expr)


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    edges: DataFrame,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
    component_col: str = "component_id",
    max_iter: int = 20,
    strict: bool = True,
    bucket_expr: Column | None = None,
    bucket_space: int = 1_000_000,
) -> DataFrame:
    """:func:`hash_split`, keyed by the NEAR-DUP COMPONENT instead of
    the row: two documents connected through ``edges (id_a, id_b)``
    (any dedup family's verified candidate pairs — MinHash, SimHash,
    embedding cosine) always land in the SAME split, so a test set
    can't contain a near-copy of a training document — the leakage mode
    row-keyed splitting cannot prevent, and the reason dedup runs
    BEFORE splitting in every published pipeline.

    Appends ``component_col`` (min reachable id; singletons label
    themselves, so with NO edges this degenerates to exactly
    ``hash_split(id_col)``) and ``split_col``.  Cost: the
    connected-components rounds (O(component diameter) shuffles over
    edge ENDPOINTS only) + one broadcast-scale join back; assignment
    itself stays a pure map of the component key — deterministic in
    (component, seed), stable under repartitioning, and new singleton
    rows join their split without reshuffling old ones."""
    from .dedup import connected_components

    # strict (default): an UNCONVERGED component labeling means split
    # components — i.e. possible near-copies straddling train/test, the
    # exact leakage this function exists to prevent.  The escalation is
    # STRUCTURAL (connected_components' on_nonconverged="error"), not a
    # string-matched warning — a safety property must not depend on
    # message wording, and a warning alone is too easy to miss in a
    # Spark driver log.
    comps = connected_components(
        df.select(F.col(id_col).alias("id")),
        edges,
        max_iter=max_iter,
        on_nonconverged="error" if strict else "warn",
    )
    out = df.join(
        comps.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumnRenamed("component_id", component_col)
    return hash_split(
        out,
        component_col,
        weights,
        seed,
        split_col,
        bucket_expr=bucket_expr,
        bucket_space=bucket_space,
    )

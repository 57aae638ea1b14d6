"""Deterministic fault injection for event streams: per-row drop /
duplicate / delay decided by tag-salted hashes of the row key.

Reference analog: the LSP transport's loss injector —
``lsp_set_drop_rate`` / ``lsp_should_drop`` (lsp_common.c:11-36), wired
into ``sendto_maydrop`` / ``recvfrom_maydrop`` (lsp_common.c:42-95) —
which drops each packet with probability ``drop_rate`` using a
wall-clock-seeded ``rand()``.  That is the fault model the protocol's
seqnum acceptor (lsp_server.c:241-249) and epoch liveness
(lsp_server.c:31-35) exist to survive, and what the reference's test
harness turns on to prove they do.

This engine's injector is a first-class operator rather than a test
hook, with two deliberate upgrades over the reference:

- **Deterministic, not wall-clock-seeded.**  Every decision is a pure
  function of (key columns, tag): the same seed replays the same fault
  pattern across runs, engines and partitionings — a chaos run that
  fails is REPRODUCIBLE, where the reference's ``srand(gettimeofday)``
  draws a fresh pattern every call.  It also makes the injection
  oracle-checkable (the gate's DuckDB twin re-derives the identical
  decisions from md5).
- **The full lossy-channel triple.**  UDP doesn't just drop: it
  duplicates and reorders.  ``dup_frac`` re-emits selected rows (the
  duplicate is byte-identical, as on the wire) and ``delay_frac``
  shifts selected rows' event time forward — the late-data shape that
  watermarks and the seqnum window audit must absorb.

Scale shape: everything here is a stateless map — a hash filter, an
``explode(array_repeat(...))``, a timestamp add.  No shuffle, no
state, no Python boundary; the expressions are codegen'd.  The
operator therefore composes with BOTH batch frames and Structured
Streaming sources (stateless narrow transforms are legal in any output
mode), at any scale the underlying scan supports.

Hash modes (the engine's usual twin discipline, e.g. q_dedup_sketch):
``production`` decides via ``xxhash64`` (JVM-side, fastest);
``portable`` via the md5 arithmetic of :func:`operators.split.
md5_uniform_sql`, bit-identical in Spark and DuckDB so the correctness
gate can replay the draw.  The two modes draw DIFFERENT (equally
valid) fault patterns — fix one mode when comparing runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.split import md5_uniform_sql

HASH_MODES = ("production", "portable")


def _uniform(key_cols: Sequence[str], tag: str, hash_mode: str) -> Column:
    """Per-row uniform in (0, 1), a pure function of (key, tag).

    NULL keys: both modes hash through the SAME NULL-skipping concat
    (``concat_ws``), so a NULL component degrades to the empty string
    rather than poisoning the draw to NULL (which would silently
    exempt the row from every fault) — and a row's NULL-key disposition
    is identical across hash modes.

    Multi-column key caveat (inherent to the joined-string design both
    modes share): components are joined with ``':'``, so two DIFFERENT
    keys whose rendered values embed the delimiter can collide —
    ``('x:y', 'z')`` and ``('x', 'y:z')`` draw the SAME faults.  Pick
    key columns whose string forms cannot contain ``':'`` (ids,
    numbers), or pre-join the key yourself with a safe delimiter.

    Seed-compatibility break (round 9, ADVICE r9): production mode
    used to hash per-column (``xxhash64(tag, c1, c2, ...)``); it now
    hashes the ':'-joined string, so any given seed replays a
    DIFFERENT drop/dup/delay pattern than pre-r9 builds.  In-repo
    soak baselines were re-derived; fault corpora or expected-verdict
    sets recorded against a pre-r9 build must be regenerated, not
    compared."""
    key_sql = ", ".join(f"CAST({c} AS STRING)" for c in key_cols)
    joined = f"concat_ws(':', {key_sql})"
    if hash_mode == "portable":
        return F.expr(md5_uniform_sql(joined, tag))
    return (
        F.pmod(F.xxhash64(F.lit(tag), F.expr(joined)), F.lit(1 << 24))
        + F.lit(0.5)
    ) / F.lit(float(1 << 24))


def inject_faults(
    df: DataFrame,
    key_cols: Sequence[str],
    drop_frac: float = 0.0,
    dup_frac: float = 0.0,
    delay_frac: float = 0.0,
    delay_seconds: int = 0,
    ts_col: str | None = None,
    seed: str = "faults",
    hash_mode: str = "production",
) -> DataFrame:
    """Inject a deterministic lossy-channel fault pattern into ``df``.

    Per input row, three independent tag-salted uniforms over
    ``key_cols`` decide (in this order — a dropped row is gone, as on
    the wire, so it can be neither duplicated nor delayed):

    1. **drop** when ``u(seed:drop) < drop_frac`` — the row is removed;
    2. **duplicate** when ``u(seed:dup) < dup_frac`` — the surviving
       row is emitted twice, byte-identical;
    3. **delay** when ``u(seed:delay) < delay_frac`` — the row's
       ``ts_col`` shifts forward by ``delay_seconds`` (both copies of a
       duplicate shift together: one key, one draw).

    ``key_cols`` should identify the message (e.g. the event id): one
    decision per message, replayed identically on every run with the
    same ``seed``.  Returns a frame with ``df``'s exact schema — fault
    bookkeeping stays out of the data path so the output drops into
    any consumer unchanged.
    """
    for name, v in (
        ("drop_frac", drop_frac),
        ("dup_frac", dup_frac),
        ("delay_frac", delay_frac),
    ):
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"{name} must be in [0, 1], got {v}")
    if hash_mode not in HASH_MODES:
        raise ValueError(f"hash_mode must be one of {HASH_MODES}, got {hash_mode!r}")
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    if delay_frac > 0.0 and (ts_col is None or delay_seconds <= 0):
        raise ValueError(
            "delay_frac > 0 requires ts_col and a positive delay_seconds"
        )

    cols = list(df.columns)
    out = df
    if drop_frac > 0.0:
        out = out.where(
            _uniform(key_cols, f"{seed}:drop", hash_mode) >= F.lit(drop_frac)
        )
    if delay_frac > 0.0:
        shifted = F.col(ts_col) + F.expr(f"INTERVAL {int(delay_seconds)} SECOND")
        out = out.withColumn(
            ts_col,
            F.when(
                _uniform(key_cols, f"{seed}:delay", hash_mode) < F.lit(delay_frac),
                shifted,
            ).otherwise(F.col(ts_col)),
        )
    if dup_frac > 0.0:
        n_copies = F.when(
            _uniform(key_cols, f"{seed}:dup", hash_mode) < F.lit(dup_frac),
            F.lit(2),
        ).otherwise(F.lit(1))
        # collision-proof marker: withColumn REPLACES a same-named input
        # column, and select(*cols) would then return the exploded marker
        # instead of the user's values
        marker = "__fault_n"
        while marker in cols:
            marker += "_"
        out = out.withColumn(marker, F.explode(F.array_repeat(F.lit(1), n_copies)))
    return out.select(*cols)


def faulted_cte_sql(
    table: str,
    key_sql: str,
    drop_frac: float,
    dup_frac: float,
    seed: str,
    out_name: str = "events_faulted",
    delay_frac: float = 0.0,
    delay_seconds: int = 0,
    ts_col: str | None = None,
    cols: Sequence[str] | None = None,
) -> str:
    """WITH-clause body (two CTE definitions, no ``WITH`` keyword)
    re-deriving :func:`inject_faults`' fault pattern
    (``hash_mode='portable'``) over ``table`` in portable SQL — the
    oracle's twin for the gate branch, composable into a larger query's
    own WITH clause.  Duplication spells as UNION ALL of the selected
    survivors, which is multiset-equal to the operator's
    ``explode(array_repeat(...))``; delay spells as a CASE shift on
    ``ts_col`` applied to the survivors BEFORE duplication (the
    operator's order — both copies of a duplicate shift together).
    Timestamp+interval arithmetic is exact integer microseconds in both
    engines, so the shifted branch stays hash-identical.  Because Spark
    has no ``SELECT * REPLACE``, enabling delay requires the explicit
    ``cols`` list to rebuild the projection."""
    u_drop = md5_uniform_sql(key_sql, f"{seed}:drop")
    u_dup = md5_uniform_sql(key_sql, f"{seed}:dup")
    # float literals via CAST('<repr>' AS DOUBLE): a bare decimal parses
    # as DECIMAL in DuckDB (the PCA-gate literal gotcha); here the md5
    # uniform's granularity (~6e-8) keeps any real draw far from the
    # decimal-vs-double literal gap, but the house spelling costs nothing
    d_drop = f"CAST('{drop_frac!r}' AS DOUBLE)"
    d_dup = f"CAST('{dup_frac!r}' AS DOUBLE)"
    if delay_frac > 0.0:
        if not cols or ts_col is None or delay_seconds <= 0:
            raise ValueError(
                "delay_frac > 0 requires cols, ts_col and a positive "
                "delay_seconds (no portable SELECT * REPLACE)"
            )
        u_delay = md5_uniform_sql(key_sql, f"{seed}:delay")
        d_delay = f"CAST('{delay_frac!r}' AS DOUBLE)"
        proj = ", ".join(
            c
            if c != ts_col
            else (
                f"CASE WHEN {u_delay} < {d_delay} "
                f"THEN {ts_col} + INTERVAL {int(delay_seconds)} SECOND "
                f"ELSE {ts_col} END AS {ts_col}"
            )
            for c in cols
        )
    else:
        proj = "*"
    return f"""
    __fault_survivors AS (
      SELECT {proj} FROM {table} WHERE {u_drop} >= {d_drop}
    ),
    {out_name} AS (
      SELECT * FROM __fault_survivors
      UNION ALL
      SELECT * FROM __fault_survivors WHERE {u_dup} < {d_dup}
    )
    """


def faulted_view_sql(
    table: str,
    key_sql: str,
    drop_frac: float,
    dup_frac: float,
    seed: str,
    **kwargs,
) -> str:
    """Standalone SELECT form of :func:`faulted_cte_sql` (runs in both
    Spark and DuckDB as-is)."""
    out_name = kwargs.get("out_name", "events_faulted")
    cte = faulted_cte_sql(table, key_sql, drop_frac, dup_frac, seed, **kwargs)
    return f"WITH {cte} SELECT * FROM {out_name}"

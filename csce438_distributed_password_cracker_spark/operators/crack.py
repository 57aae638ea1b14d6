"""Q-CORE: the reference's canonical query (SURVEY.md §0) as a Spark plan.

    SELECT candidate FROM base26_range(:lower, :upper)
    WHERE sha1_hex(candidate) = :hash LIMIT 1;   -- empty ⇒ 'x'

Semantics ported:
- hash-equality filter  = worker.c:41-56 (SHA-1 → 40 lowercase hex → compare)
- existential verdict   = server.c:243-273 (any found ⇒ 'f <pass>', all
  exhausted ⇒ 'x')
- determinism divergence: the reference answers with whichever worker's
  'f' arrives first (race, server.c:275-306); we answer min(candidate) —
  deterministic, required for oracle hash-matching (SURVEY.md §2.5 A2).
- early termination     = worker.c:84-91 returns on first hit.  ``crack``
  probes with ``first()`` over the ordinal-ordered filtered keyspace:
  Spark's CollectLimit/executeTake submits partitions *incrementally* —
  1 partition, then ``spark.sql.limit.scaleUpFactor`` (4×) more per wave,
  in partition-index order — and stops submitting the moment a row
  arrives.  Because keyspace partitions are contiguous ascending ordinal
  ranges and narrow ops preserve iterator order, the first collected row
  is the *lowest-partition, lowest-ordinal* match.  This subsumes the
  accumulator + cancelJobGroup refinement SURVEY.md §4.4 sketches:
  remaining work is never *launched* rather than launched-then-cancelled,
  there is no failed-job noise, and no accumulator update can be lost
  with a cancelled task.  The probe row is provably the deterministic
  min (A2): take waves scan a contiguous *prefix* of partitions, each
  partition is a contiguous ascending ordinal range whose iterator order
  survives the narrow project+filter, and executeTake concatenates
  per-partition results in partition-index order — so the first row out
  is the lowest-ordinal match of the scanned prefix, and any unscanned
  partition holds only higher ordinals.  tests/test_crack.py pins this
  against the full-aggregation min.

Scale: a width-8 space is 2.1e11 candidates in ~52k partitions of ~4M
ordinals (sources/keyspace.py).  Latency-to-first-hit is bounded by the
take waves actually scanned (geometric ramp from 1 task), independent of
total keyspace size; a miss still costs the full scan — exactly the
reference's exhaustion behavior (worker.c:103-107).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..sources.keyspace import keyspace


@dataclass(frozen=True)
class CrackResult:
    """Reply semantics of server.c:251-262: 'f <pass>' or 'x'."""

    found: bool
    password: str | None

    @property
    def reply(self) -> str:
        return f"f {self.password}" if self.found else "x"


def candidates_matching(
    spark: SparkSession,
    digest: str,
    width: int,
    lower_ord: int = 0,
    upper_ord: int | None = None,
    hash_func: str = "sha1",
    with_ordinal: bool = False,
) -> DataFrame:
    """All candidates in the (inclusive) ordinal range whose hash equals
    ``digest``.  ``hash_func``: 'sha1' (reference fidelity, worker.c:50-54 —
    F.sha1 emits the identical 40-char lowercase hex) or 'sha256' (oracle
    path; pinned DuckDB lacks sha1, SURVEY.md §2.8 F1)."""
    ks = keyspace(spark, width, lower_ord, upper_ord, with_ordinal=with_ordinal)
    col = F.col("candidate")
    hashed = F.sha1(col) if hash_func == "sha1" else F.sha2(col, 256)
    return ks.filter(hashed == F.lit(digest.lower()))


def crack_verdict_df(
    spark: SparkSession,
    digest: str,
    width: int,
    lower_ord: int = 0,
    upper_ord: int | None = None,
    hash_func: str = "sha1",
) -> DataFrame:
    """One-row verdict: (found BOOLEAN, password STRING|NULL).

    min() gives the deterministic A2 semantics; count>0 is the existential
    A1 aggregation (max-of-boolean over workers, server.c:243-273).
    """
    matches = candidates_matching(spark, digest, width, lower_ord, upper_ord, hash_func)
    return matches.agg(
        (F.count("*") > 0).alias("found"),
        F.min("candidate").alias("password"),
    )


def crack(
    spark: SparkSession,
    digest: str,
    width: int,
    hash_func: str = "sha1",
) -> CrackResult:
    """Full-space crack with native early termination (SURVEY.md §4.4).

    Probe: ``first()`` over the ordinal-ordered match stream — Spark's
    incremental take stops submitting partitions once a row arrives, so a
    hit in an early partition leaves the rest of the space *unlaunched*,
    and the row returned is the deterministic min (the module docstring
    gives the order-preservation argument and why this supersedes the
    accumulator + cancelJobGroup sketch).  Cost profile: early hit ⇒
    latency bounded by the take waves actually scanned; late hit ⇒ the
    geometric ramp costs at most a small constant factor over one full
    scan; miss ⇒ full scan, as the reference's exhaustion path.
    """
    probe = candidates_matching(
        spark, digest, width, hash_func=hash_func, with_ordinal=True
    ).first()
    if probe is None:
        return CrackResult(False, None)
    return CrackResult(True, probe["candidate"])


def crack_chunked(
    spark: SparkSession,
    digest: str,
    width: int,
    lower_ord: int = 0,
    upper_ord: int | None = None,
    chunk_ordinals: int = 256 * 4_000_000,
    hash_func: str = "sha1",
) -> CrackResult:
    """The SURVEY §4.4 chunked ordinal loop — the drive shape for
    spaces past the honest partition-sizing envelope (width ≥ 9, where
    ``num_partitions_for``'s 1M-task cap makes per-task size grow) and
    for targeted sub-range requests at any width (server.c:403-434).

    Successive inclusive ``[lo, hi]`` windows of ``chunk_ordinals``
    each run the same first()-probe as :func:`crack`; a hit in window
    i means windows > i are never SUBMITTED (driver-level early stop,
    bounding wasted work to < one chunk beyond the hit), and within
    the hit window executeTake's incremental waves leave its own tail
    unlaunched (task-level early stop).  Windows ascend and the probe
    row is the lowest-ordinal match of its window, so the answer is
    the deterministic min over the whole range — A2 semantics, same
    verdict as one :func:`crack_verdict_df` over ``[lower_ord,
    upper_ord]``.  A miss exhausts every window to 'x', the
    reference's exhaustion path (worker.c:103-107, server.c:257-262).
    """
    if chunk_ordinals < 1:
        raise ValueError(f"chunk_ordinals must be ≥ 1, got {chunk_ordinals}")
    n = codec.keyspace_size(width)
    hi = n - 1 if upper_ord is None else upper_ord
    lo = lower_ord
    while lo <= hi:
        chunk_hi = min(lo + chunk_ordinals - 1, hi)
        probe = candidates_matching(
            spark, digest, width, lo, chunk_hi, hash_func,
            with_ordinal=True,
        ).first()
        if probe is not None:
            return CrackResult(True, probe["candidate"])
        lo = chunk_hi + 1
    return CrackResult(False, None)

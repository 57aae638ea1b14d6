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
- early termination     = worker.c:84-91 returns on first hit.  Spark can't
  short-circuit a running stage, so ``crack`` iterates ordinal *chunks* and
  stops at the first non-empty chunk (SURVEY.md §4.4).  Within-chunk work is
  wasted on a hit — the same waste profile as the reference's
  straggler-workers-keep-scanning behavior (server.c:251-256), but bounded
  by the chunk size.

Scale: a width-8 space is 2.1e11 candidates.  The chunked loop keeps each
job ≈ DEFAULT_CHUNK ordinals (→ ~chunk/4M tasks via the keyspace source),
so cluster size × chunk size bounds latency-to-first-hit independent of
total keyspace size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..sources.keyspace import keyspace

DEFAULT_CHUNK = 128_000_000  # ordinals per early-stop probe job


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
) -> DataFrame:
    """All candidates in the (inclusive) ordinal range whose hash equals
    ``digest``.  ``hash_func``: 'sha1' (reference fidelity, worker.c:50-54 —
    F.sha1 emits the identical 40-char lowercase hex) or 'sha256' (oracle
    path; pinned DuckDB lacks sha1, SURVEY.md §2.8 F1)."""
    ks = keyspace(spark, width, lower_ord, upper_ord)
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
    chunk: int = DEFAULT_CHUNK,
) -> CrackResult:
    """Full-space crack with chunked early termination (SURVEY.md §4.4).

    Scans ordinal chunks [lo, lo+chunk) in order; the first chunk with a hit
    ends the search.  Because chunks are scanned in ordinal order and we take
    min() within the chunk, the answer equals the global lexicographic min —
    chunking never changes the verdict.
    """
    n = codec.keyspace_size(width)
    lo = 0
    while lo < n:
        hi = min(lo + chunk, n) - 1
        row = crack_verdict_df(spark, digest, width, lo, hi, hash_func).first()
        if row is not None and row["found"]:
            return CrackResult(True, row["password"])
        lo = hi + 1
    return CrackResult(False, None)

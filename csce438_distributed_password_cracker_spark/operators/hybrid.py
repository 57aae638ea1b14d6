"""Hybrid retrieval — fuse a lexical (BM25) result list with a vector
(ANN) result list by Reciprocal Rank Fusion, the standard two-tower
retrieval stack (sparse + dense) reduced to its Spark shape.

Reference analog: none (north-star extension, BASELINE.json); composes
:mod:`operators.search` (BM25 probe) with :mod:`operators.similarity`
(ANN probes).

RRF (Cormack et al.): score(d) = Σ_lists 1/(k + rank_d) — rank-based,
so the two engines' incomparable score scales never need calibration;
k=60 is the published default.  Scale shape: both inputs are already
top-n lists (tiny), so fusion is a driver-scale operation expressed as
DataFrame algebra anyway — rank via a window over each list, full
outer join on the doc id, null ranks contribute 0.  The expensive work
(index probes) happens upstream with their own pruning; fusion adds no
scan and no meaningful shuffle (two ≤ n-row lists).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from ..localframe import local_frame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 60


def _ranked(results: DataFrame, id_col: str, score_col: str, tag: str) -> DataFrame:
    """(id, rrf_<tag>) — 1/(k + rank) with rank from the list's own
    score order, ties broken by id for determinism."""
    w = Window.orderBy(F.desc(score_col), F.col(id_col))
    return results.select(
        F.col(id_col).alias("id"),
        (1.0 / (F.lit(RRF_K) + F.row_number().over(w))).alias(f"rrf_{tag}"),
    )


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
    top_n: int = 10,
) -> DataFrame:
    """(id, rrf_score, in_lexical, in_vector): top_n docs by summed
    reciprocal ranks across the two lists."""
    lx = _ranked(lexical, id_col, score_col, "lex")
    vc = _ranked(vector, id_col, score_col, "vec")
    return (
        lx.join(vc, "id", "full_outer")
        .select(
            "id",
            F.round(
                F.coalesce("rrf_lex", F.lit(0.0))
                + F.coalesce("rrf_vec", F.lit(0.0)),
                8,
            ).alias("rrf_score"),
            F.col("rrf_lex").isNotNull().alias("in_lexical"),
            F.col("rrf_vec").isNotNull().alias("in_vector"),
        )
        .orderBy(F.desc("rrf_score"), "id")
        .limit(top_n)
    )


MMR_MAX_SHORTLIST = 4096


def mmr_rerank(
    shortlist: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
    vec_col: str = "vec",
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    greedily pick ``k`` docs maximizing ``lam·rel − (1−lam)·max cosine
    to the already-picked set`` — the standard diversity pass AFTER a
    retrieval shortlist, so near-duplicate hits don't crowd out the
    result page / sampled batch.  Returns (id, mmr_rank 1-based,
    mmr_score at selection time).

    Scale shape: the expensive part (building the shortlist) is the
    upstream distributed probe; MMR itself is inherently sequential in
    ``k`` (each pick changes every remaining candidate's penalty), so
    it runs driver-side over the COLLECTED shortlist — bounded by the
    same rerank_n discipline as the IVF exact re-rank
    (similarity.py ``ivf_probe``'s shortlist collect); a guard refuses
    lists past :data:`MMR_MAX_SHORTLIST` instead of letting a
    mis-wired full-corpus frame melt the driver.

    Determinism: relevance ties break by ascending id at every pick;
    scores are float64 throughout.  Rows with NULL or NaN relevance
    are rejected with a ValueError (a NaN would silently poison the
    greedy ordering).

    Divergence from Carbonell & Goldstein: the diversity penalty is
    ``max(0, max cosine to picked)`` — ALL negative similarities are
    floored to 0, not just the zero-vector convention.  The paper's
    raw form hands a candidate anti-correlated with the picked set a
    positive bonus on top of its relevance; here the penalty only ever
    suppresses redundancy, which keeps the score scale inside
    ``[lam·rel − (1−lam), lam·rel]`` and matches the [0,1]-normalized
    relevance contract below.  Callers wanting the raw form can negate
    lam-weighted scores upstream; the clamp is deliberate, not a
    zero-vector special case.

    The relevance scale matters: the cosine penalty lives in [0, 1], so
    ``score_col`` should be comparably normalized (rank-based RRF
    scores, min-max-scaled BM25, or cosine similarities) — raw BM25
    magnitudes (~10s) drown the penalty and the re-rank degenerates to
    relevance order.
    """
    import numpy as np

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    rows = (
        shortlist.select(
            F.col(id_col).alias("id"),
            F.col(score_col).cast("double").alias("rel"),
            F.col(vec_col).alias("v"),
        )
        .limit(MMR_MAX_SHORTLIST + 1)
        .collect()
    )
    if len(rows) > MMR_MAX_SHORTLIST:
        raise ValueError(
            f"MMR shortlist exceeds {MMR_MAX_SHORTLIST} rows — rerank "
            "a probe's top-n, not a corpus"
        )
    spark = shortlist.sparkSession
    # id keeps the CALLER's type (bm25_search deliberately preserves the
    # stored id type; re-ranking must not flip it, and an int64 coercion
    # would silently floor float ids / crash on string ids)
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("id", shortlist.schema[id_col].dataType),
            StructField("mmr_rank", IntegerType()),
            StructField("mmr_score", DoubleType()),
        ]
    )
    if not rows:
        return spark.createDataFrame([], out_schema)
    bad = sum(
        1 for r in rows if r["rel"] is None or math.isnan(r["rel"])
    )
    if bad:
        raise ValueError(
            f"{bad} shortlist row(s) have NULL/NaN {score_col!r}; "
            "MMR needs a total relevance order — filter or impute first"
        )
    # deterministic candidate order: relevance desc, id asc
    rows = sorted(rows, key=lambda r: (-r["rel"], r["id"]))
    ids = [r["id"] for r in rows]
    rel = np.asarray([r["rel"] for r in rows], dtype=np.float64)
    mat = np.asarray([np.asarray(r["v"], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    mat = mat / np.where(norms == 0.0, 1.0, norms)[:, None]

    n = len(rows)
    picked: list[int] = []
    out = []
    max_sim = np.full(n, -np.inf)
    remaining = np.ones(n, dtype=bool)
    for rank in range(1, min(k, n) + 1):
        if picked:
            mmr = lam * rel - (1.0 - lam) * np.maximum(max_sim, 0.0)
        else:
            mmr = lam * rel
        mmr = np.where(remaining, mmr, -np.inf)
        # argmax with the candidate order as tiebreak (rows pre-sorted
        # rel desc / id asc, and np.argmax takes the FIRST maximum)
        j = int(np.argmax(mmr))
        picked.append(j)
        remaining[j] = False
        out.append((ids[j], rank, float(round(mmr[j], 8))))
        # one BLAS matvec updates every remaining candidate's penalty
        max_sim = np.maximum(max_sim, mat @ mat[j])
    # local_frame: LocalTableScan, not a python-worker ExistingRDD scan
    return local_frame(spark, out, out_schema)

"""Similarity search over embedding columns (SURVEY.md §2.12 E2).

Baseline: brute-force cosine top-k (exact; O(n) per query — correct answer
and the verifier for everything else).  Scale path: random-hyperplane LSH —
sign-bit bucketing turns the scan into an equality-join on bucket keys;
multiple independent tables trade recall for probe cost.

Hyperplanes are generated from a seeded RNG on the driver (tiny:
n_planes × dim floats) and baked into the plan as array literals —
deterministic across runs, broadcast to every task; no model state.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors
from ..localframe import local_frame


def brute_force_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k of ``emb`` rows against the single-row ``query``
    DataFrame (broadcast).  TakeOrderedAndProject keeps this a per-partition
    heap + driver merge — no global sort."""
    return (
        emb.crossJoin(F.broadcast(query))
        .select(
            id_col,
            F.round(vectors.cosine(vec_col, query_vec_col), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 200_000,
    margin: float = 1e-6,
    max_rows: int = 10_000_000,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via blocked matrix multiply.

    Candidate generation: one side stays partitioned; the other side is
    broadcast in row-blocks as a dense float64 matrix, and each Arrow batch
    computes ``A_normed @ B_block.T`` with vectorized BLAS inside
    ``mapInPandas`` — ~10³× the throughput of a per-pair higher-order
    expression, and the shape that scales (a 1000-executor cluster does
    n_blocks passes of GEMM; no quadratic shuffle, no cross join).

    Driver memory is O(block), never O(table): ids are hash-partitioned
    into ``n_blocks = ceil(count / block_rows)`` blocks **in the
    DataFrame**, and each iteration collects only its own block's rows
    (a pushed-down equality filter on the block id).  Hash blocking keeps
    every block ≈ block_rows without a global sort; each unordered pair
    {x, y} with x < y is generated exactly once — in y's block's pass.

    Candidates use ``threshold − margin`` to absorb float32→float64 noise;
    survivors are re-verified with the SAME JVM-side cosine expression the
    naive plan uses, so results (incl. round(·, 6)) are bit-identical to
    the unblocked baseline and the SQL oracle.

    APPLICABILITY BOUND — exact all-pairs is inherently quadratic: the
    driver sequences ``n_blocks`` Spark jobs, each broadcasting one
    ~``block_rows``-row matrix and re-scanning ``emb``.  That is the
    right tool up to roughly 10M rows (≤ ~50 sequential passes at the
    default block size); at 1e9 rows it would mean ~5,000 serial jobs
    with ~GB broadcasts — use the sub-quadratic path instead
    (LSH prefilter → exact re-verify: ``lsh_topk_multi`` /
    ``minhash_lsh_pairs``-style banding), which is the documented 100 TB
    design.  ``max_rows`` enforces the envelope; raise it explicitly to
    opt into a bigger exact run.
    """
    spark = emb.sparkSession
    src = emb.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v"))
    n = src.count()
    if n > max_rows:
        raise ValueError(
            f"cosine_pairs_blocked is the EXACT quadratic path, bounded to "
            f"~{max_rows:,} rows ({n:,} given): driver-sequenced block scans "
            f"stop amortizing beyond it.  Use cosine_pairs_lsh (multi-table "
            f"LSH prefilter + exact re-verify) at this scale."
        )
    n_blocks = max(1, math.ceil(n / block_rows))
    blocked = src.withColumn(
        "__blk", F.pmod(F.xxhash64("id"), F.lit(n_blocks))
    )
    parts: list[DataFrame] = []
    for blk in range(n_blocks):
        b_ids, b_mat = _collect_matrix(
            blocked.filter(F.col("__blk") == blk), "id", "v"
        )
        if len(b_ids) == 0:
            continue
        bc = spark.sparkContext.broadcast((b_ids, b_mat))

        def gen(batches, _bc=bc):
            bids, bmat = _bc.value
            for batch in batches:
                if len(batch) == 0:  # empty Arrow batch: 1-D asarray breaks norm
                    continue
                a_ids = batch["id"].to_numpy(dtype=np.int64)
                amat = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in batch["v"]]
                )
                anorm = np.linalg.norm(amat, axis=1)
                amat = amat / np.where(anorm == 0.0, 1.0, anorm)[:, None]
                sim = amat @ bmat.T
                ia, ib = np.nonzero(sim >= threshold - margin)
                keep = a_ids[ia] < bids[ib]
                yield pd.DataFrame(
                    {"id_a": a_ids[ia][keep], "id_b": bids[ib][keep]}
                )

        parts.append(src.mapInPandas(gen, "id_a long, id_b long"))
    if not parts:
        return spark.createDataFrame([], "id_a long, id_b long, cos_sim double")
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.union(p)
    a = emb.select(
        F.col(id_col).cast("long").alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = emb.select(
        F.col(id_col).cast("long").alias("id_b"), F.col(vec_col).alias("__vb")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(vectors.cosine("__va", "__vb"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Driver-side (ids, L2-normalized float64 matrix) — for centroid /
    block tables that are small by construction."""
    pdf = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    ).toPandas()
    ids = pdf["id"].to_numpy(dtype=np.int64)
    if len(ids) == 0:
        return ids, np.empty((0, 0), dtype=np.float64)
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
    norms = np.linalg.norm(mat, axis=1)
    return ids, mat / np.where(norms == 0.0, 1.0, norms)[:, None]


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, "np.ndarray", "np.ndarray"]:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Centroids are a deterministic seeded sample of the data (k-means||
    init without the refinement sweeps — the probe structure, not centroid
    quality, is what this operator exercises).  The sample is the first
    ``n_centroids`` rows under engine-portable ``md5('<seed>:<id>')``
    ordering (id tie-break): md5 hex is bit-identical in Spark and DuckDB,
    so the correctness oracle can reproduce the exact centroid set in SQL —
    an xxhash64 ordering would be unverifiable outside Spark.  Cluster i is
    the i-th row of that ordering.  Assignment is one mapInPandas pass with
    the centroid matrix broadcast: GEMM against n_centroids rows, argmax —
    O(n · n_centroids · dim) flops, no shuffle.  At cluster scale the
    assigned table is then written partitioned by ``cluster`` so a probe
    reads only its inverted lists.

    Returns (assigned_df(id, cluster), centroid_ids, centroid_matrix).
    """
    cent = emb.orderBy(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
        F.col(id_col),
    ).limit(n_centroids)
    cent_ids, cent_mat = _collect_matrix(cent, id_col, vec_col)
    src = emb.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    )
    return _assign_to(src, cent_mat), cent_ids, cent_mat


def ivf_refine(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, "np.ndarray"]:
    """Spherical k-means (Lloyd) refinement of ``ivf_assign``'s seeded
    sample centroids — the quality step a production IVF build runs.

    Fully distributed, one pass per sweep: assignment AND the centroid
    update fold into a single broadcast-GEMM mapInPandas pass — each
    Arrow batch argmax-assigns its rows and emits its own K × dim
    partial sums of unit-normalized members (map-side combine in numpy,
    ``np.add.at``/``bincount``), so the only shuffle is the partial-sum
    aggregation (K × dim × n_partitions rows) and the vector table is
    never joined or re-shuffled.  The collected update is tiny
    (n_centroids × dim doubles).  Spherical update (normalize the mean)
    matches the cosine/argmax-dot assignment, so the Lloyd objective
    (mean cosine to the assigned centroid) is non-decreasing — asserted
    in tests.  Empty clusters keep their previous centroid.  All inputs
    deterministic ⇒ identical centroids on every run/cluster layout.

    Returns (assigned_df(id, cluster), centroid_matrix) after
    ``n_iters`` refinement sweeps.
    """
    src = emb.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    )
    _, _, cent_mat = ivf_assign(emb, n_centroids, seed, id_col, vec_col)
    dim = cent_mat.shape[1]
    for _ in range(n_iters):
        sums = (
            _assign_partial_sums(src, cent_mat)
            .groupBy("cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new_mat = cent_mat.copy()
        counts = np.zeros(n_centroids, dtype=np.int64)
        acc = np.zeros((n_centroids, dim), dtype=np.float64)
        for r in sums:
            acc[r["cluster"], r["pos"]] = r["s"]
            counts[r["cluster"]] = r["n"]
        for c in range(n_centroids):
            if counts[c] > 0:
                norm = np.linalg.norm(acc[c])
                new_mat[c] = acc[c] / (norm if norm else 1.0)
        cent_mat = new_mat
    return _assign_to(src, cent_mat), cent_mat


def _assign_partial_sums(src: DataFrame, cent_mat: "np.ndarray") -> DataFrame:
    """One fused Lloyd half-sweep: per Arrow batch, argmax-assign the
    unit-normalized rows and emit the batch's (cluster, pos) partial
    sums + member counts — K × dim rows per batch, never the vectors."""
    bc = src.sparkSession.sparkContext.broadcast(cent_mat)

    def gen(batches):
        cmat = bc.value
        K, D = cmat.shape
        for batch in batches:
            if len(batch) == 0:
                continue
            amat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch["v"]]
            )
            norms = np.linalg.norm(amat, axis=1)
            amat = amat / np.where(norms == 0.0, 1.0, norms)[:, None]
            cl = np.argmax(amat @ cmat.T, axis=1)
            acc = np.zeros((K, D), dtype=np.float64)
            np.add.at(acc, cl, amat)
            counts = np.bincount(cl, minlength=K)
            nz = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "cluster": np.repeat(nz, D).astype(np.int32),
                    "pos": np.tile(np.arange(D, dtype=np.int32), len(nz)),
                    "s": acc[nz].ravel(),
                    "n": np.repeat(counts[nz], D).astype(np.int64),
                }
            )

    return src.mapInPandas(gen, "cluster int, pos int, s double, n long")


def _assign_to(src: DataFrame, cent_mat: "np.ndarray") -> DataFrame:
    """One broadcast-GEMM assignment pass against a given centroid
    matrix (src must be (id, v))."""
    bc = src.sparkSession.sparkContext.broadcast(cent_mat)

    def assign(batches):
        cmat = bc.value
        for batch in batches:
            if len(batch) == 0:  # empty Arrow batch: 1-D asarray breaks norm
                continue
            amat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch["v"]]
            )
            norms = np.linalg.norm(amat, axis=1)
            amat = amat / np.where(norms == 0.0, 1.0, norms)[:, None]
            yield pd.DataFrame(
                {
                    "id": batch["id"].to_numpy(dtype=np.int64),
                    "cluster": np.argmax(amat @ cmat.T, axis=1).astype(np.int32),
                }
            )

    return src.mapInPandas(assign, "id long, cluster int")


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: probe the query's ``n_probe`` nearest
    centroids' inverted lists, re-rank exactly by cosine (same JVM
    expression as the brute-force baseline).  ``n_probe == n_centroids``
    degrades gracefully to the exact answer — asserted in tests.
    ``refine_iters`` > 0 runs that many Lloyd sweeps (``ivf_refine``)
    before probing; the gate query keeps refine_iters=0, whose centroid
    set the DuckDB oracle can re-derive in SQL."""
    if refine_iters > 0:
        assigned, cent_mat = ivf_refine(
            emb, n_centroids, refine_iters, seed, id_col, vec_col
        )
    else:
        assigned, _, cent_mat = ivf_assign(emb, n_centroids, seed, id_col, vec_col)
    qrow = query.select(F.col(query_vec_col)).first()
    qvec = np.asarray(qrow[0], dtype=np.float64)
    qn = np.linalg.norm(qvec)
    qvec = qvec / (qn if qn else 1.0)
    probe = _top_clusters(cent_mat @ qvec, n_probe)
    candidates = emb.join(
        assigned.filter(F.col("cluster").isin(probe)),
        F.col(id_col) == F.col("id"),
    )
    return (
        candidates.crossJoin(F.broadcast(query))
        .select(
            id_col,
            F.round(vectors.cosine(vec_col, query_vec_col), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _top_clusters(dots: "np.ndarray", n: int) -> list[int]:
    """Indices of the ``n`` largest dot products, ties broken by LOWER
    cluster index (np.argsort alone is unstable on ties — the oracle's
    ``ORDER BY similarity DESC, cluster`` tie-break must be reproduced
    exactly)."""
    order = np.lexsort((np.arange(len(dots)), -dots))
    return [int(i) for i in order[:n]]


def _hyperplanes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(
    emb: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``bucket`` int64 column: sign bits of projections onto
    ``n_planes`` seeded random hyperplanes.

    One Arrow-batched GEMM pass (vectors × plane matrix), not per-plane
    column expressions: higher-order-function dot products evaluate
    interpreted per element, so at table scale the projection would
    dominate — the BLAS batch is ~100× the throughput and keeps the plan
    a single narrow mapInPandas with no shuffle.
    """
    import pyspark.sql.types as T

    planes = np.asarray(_hyperplanes(n_planes, dim, seed), dtype=np.float64)
    bc = emb.sparkSession.sparkContext.broadcast(planes)
    shifts = np.arange(n_planes, dtype=np.int64)

    def bucketize(batches):
        P = bc.value
        for pdf in batches:
            if len(pdf) == 0:  # empty Arrow batch: 1-D asarray breaks matmul
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            bits = (mat @ P.T > 0).astype(np.int64)
            out = pdf.copy()
            out["bucket"] = (bits << shifts).sum(axis=1)
            yield out

    schema = T.StructType(
        list(emb.schema.fields) + [T.StructField("bucket", T.LongType())]
    )
    return emb.mapInPandas(bucketize, schema)


def _bucket_of(vec: "np.ndarray", planes: "np.ndarray") -> int:
    """Driver-side LSH bucket of a single query vector (sign bits of the
    projections) — must match lsh_bucket's per-row arithmetic exactly."""
    bits = (planes @ vec > 0).astype(np.int64)
    return int((bits << np.arange(len(planes), dtype=np.int64)).sum())


def build_lsh_index(
    emb: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    write_partitions: int = 16,
) -> None:
    """BUILD phase of the scale-path ANN: materialize the LSH-bucketed
    table as parquet **partitioned by bucket**, so probes are pruned to
    one partition at planning time (PartitionFilters in the scan, not a
    post-scan filter).  At 100 TB this runs once per corpus version; the
    hyperplanes are re-derivable from (seed, n_planes, dim), so the index
    carries no side-channel state."""
    # hash-repartition on the partition column first: otherwise every write
    # task emits a file into every bucket directory it touches (tasks ×
    # buckets small files — metadata death at scale).  With the shuffle,
    # each bucket's rows land in exactly one of ``write_partitions``
    # writers → exactly one file per non-empty bucket.  Size
    # write_partitions for the cluster (reducer count), not the bucket
    # count.
    lsh_bucket(emb, dim, n_planes, seed, vec_col).repartition(
        write_partitions, "bucket"
    ).write.mode("overwrite").partitionBy("bucket").parquet(path)


def lsh_index_update(
    emb_new: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    """Grow a persisted LSH index with a batch of NEW vectors: bucketize
    with the SAME deterministic hyperplanes (re-derived from seed — the
    index carries no state to reconcile) and APPEND under the existing
    bucket layout.  Because bucketing is a pure function of the vector,
    an updated index is bit-identical in content to a full rebuild over
    the union — probes see the new vectors immediately.  Cost ∝ batch.
    Append-only id contract, and appends accrete small files per batch:
    bound them with operators/maintenance.compact_parquet(partition_by=
    ['bucket']) on the maintenance cadence."""
    lsh_bucket(emb_new, dim, n_planes, seed, vec_col).repartition(
        "bucket"
    ).write.mode("append").partitionBy("bucket").parquet(path)


def lsh_probe(
    spark,
    path: str,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """PROBE phase: compute the query's bucket driver-side (n_planes dot
    products on one vector) and read ONLY that partition of the persisted
    index — the literal equality filter on the partition column prunes at
    planning time, so probe I/O is O(bucket), not O(table).  Exact cosine
    re-rank over the bucket, same expression as brute force."""
    planes = np.asarray(_hyperplanes(n_planes, dim, seed), dtype=np.float64)
    qrow = query.select(F.col(query_vec_col)).first()
    qbucket = _bucket_of(np.asarray(qrow[0], dtype=np.float64), planes)
    idx = spark.read.parquet(path).filter(F.col("bucket") == qbucket)
    return (
        idx.crossJoin(F.broadcast(query))
        .select(
            id_col,
            F.round(vectors.cosine(vec_col, query_vec_col), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    write_partitions: int = 16,
) -> None:
    """BUILD phase of IVF: materialize vectors **partitioned by cluster**
    (the inverted lists) plus a tiny centroids table the probe planner
    reads to choose lists.  The write is one mapInPandas assignment pass
    + one shuffle-free partitioned write."""
    assigned, _, cent_mat = ivf_assign(emb, n_centroids, seed, id_col, vec_col)
    spark = emb.sparkSession
    (
        emb.join(assigned, F.col(id_col) == F.col("id"))
        .drop("id")
        .repartition(write_partitions, "cluster")  # one file per list
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/vectors")
    )
    cent_rows = [
        (int(i), [float(x) for x in row]) for i, row in enumerate(cent_mat)
    ]
    local_frame(
        spark, cent_rows, "cluster int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_update(
    emb_new: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Grow a persisted IVF index with a batch of NEW vectors: assign
    them against the STORED centroids (one broadcast-GEMM pass) and
    APPEND into the matching inverted-list partitions.  Unlike the LSH
    update this is NOT rebuild-equivalent — a rebuild would re-derive
    centroids from the larger corpus — it is the standard production
    trade: lists stay probe-consistent with the stored quantizer, and
    centroid drift is repaid on the maintenance cadence (ivf_refine +
    rebuild).  Append-only id contract; compact with
    maintenance.compact_parquet(partition_by=['cluster'])."""
    spark = emb_new.sparkSession
    cent = (
        spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    )
    cent_mat = np.asarray(
        [r.centroid for r in cent], dtype=np.float64
    )
    # stored centroids are already unit-norm (build goes through
    # _collect_matrix); renormalizing is an idempotent guard against a
    # future build path that forgets to
    norms = np.linalg.norm(cent_mat, axis=1)
    cent_mat = cent_mat / np.where(norms == 0.0, 1.0, norms)[:, None]
    src = emb_new.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    )
    assigned = _assign_to(src, cent_mat)
    (
        emb_new.join(assigned, F.col(id_col) == F.col("id"))
        .drop("id")
        .repartition("cluster")
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(f"{path}/vectors")
    )


def ivf_probe(
    spark,
    path: str,
    query: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """PROBE phase: rank centroids driver-side (n_centroids dot products),
    read only the ``n_probe`` chosen cluster partitions (planning-time
    pruning via the IN-list on the partition column), exact cosine
    re-rank."""
    cent = spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    cent_mat = np.asarray([r["centroid"] for r in cent], dtype=np.float64)
    qrow = query.select(F.col(query_vec_col)).first()
    qvec = np.asarray(qrow[0], dtype=np.float64)
    qn = np.linalg.norm(qvec)
    qvec = qvec / (qn if qn else 1.0)
    probe = _top_clusters(cent_mat @ qvec, n_probe)
    idx = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cluster").isin(probe)
    )
    return (
        idx.crossJoin(F.broadcast(query))
        .select(
            id_col,
            F.round(vectors.cosine(vec_col, query_vec_col), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _table_planes(
    n_planes: int, dim: int, n_tables: int, seed: int
) -> list["np.ndarray"]:
    """L independent hyperplane sets.  Table t is seeded ``seed + 1000*t``,
    so table 0 reproduces the single-table operator exactly (pinned in
    tests) and every table is re-derivable from (seed, t) — no stored
    model state, same as the single-table path."""
    return [
        np.asarray(_hyperplanes(n_planes, dim, seed + 1000 * t), dtype=np.float64)
        for t in range(n_tables)
    ]


def lsh_bucket_multi(
    emb: DataFrame,
    dim: int,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``buckets array<bigint>`` column: the row's bucket in each of
    ``n_tables`` independent LSH tables.

    ONE Arrow-batched GEMM against the stacked (L·P × dim) plane matrix —
    multi-table costs one matrix multiply, not L passes — then the bit
    matrix is reshaped (rows, L, P) and collapsed to per-table bucket ids.
    Narrow mapInPandas, no shuffle."""
    import pyspark.sql.types as T

    tables = _table_planes(n_planes, dim, n_tables, seed)
    stacked = np.vstack(tables)
    bc = emb.sparkSession.sparkContext.broadcast(stacked)
    shifts = np.arange(n_planes, dtype=np.int64)

    def bucketize(batches):
        P = bc.value
        for pdf in batches:
            if len(pdf) == 0:  # empty Arrow batch: 1-D asarray breaks matmul
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            bits = (mat @ P.T > 0).astype(np.int64)
            bits = bits.reshape(len(pdf), n_tables, n_planes)
            buckets = (bits << shifts).sum(axis=2)
            out = pdf.copy()
            out["buckets"] = list(buckets)
            yield out

    schema = T.StructType(
        list(emb.schema.fields)
        + [T.StructField("buckets", T.ArrayType(T.LongType()))]
    )
    return emb.mapInPandas(bucketize, schema)


def lsh_topk_multi(
    emb: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    multiprobe: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Multi-table LSH approximate top-k with recall control: a row is a
    candidate if its bucket matches the query's bucket in ANY of the L
    tables (``multiprobe``=r additionally probes every bucket within
    Hamming distance ≤ r of the query's — Σ_{i≤r} C(P,i) targets per
    table; r=1 ⇒ L·(P+1) total); the candidate union
    is re-ranked ONCE by exact cosine, same expression as brute force.

    Recall grows with n_tables and multiprobe and shrinks with n_planes —
    the production knob set; tests/test_similarity.py measures recall ≥
    0.9 vs brute force on the driver tables at sf0.1.  Probe cost stays
    O(matched buckets): candidate generation is a narrow scan + filter
    (bucket membership against L·Σ_{i≤r}C(P,i) literals — no join, no
    shuffle; ``_probe_targets`` refuses radii that would explode the
    literal list) and the re-rank is TakeOrderedAndProject.  At cluster
    scale, persist via ``build_lsh_index`` per table (or one table
    partitioned by (table, bucket)) so each probe prunes to the same
    target-bucket partitions.

    Note on candidate volume: the driver's synthetic embeddings are
    near-uniform on the sphere (no cluster structure), so high recall
    requires probing a large fraction of buckets; on real clustered
    embeddings the same configuration prunes far harder.  That trade is
    data-dependent by nature — the operator exposes it as parameters."""
    tables = _table_planes(n_planes, dim, n_tables, seed)
    qrow = query.select(F.col(query_vec_col)).first()
    qvec = np.asarray(qrow[0], dtype=np.float64)

    bucketed = lsh_bucket_multi(emb, dim, n_planes, n_tables, seed, vec_col)
    cond = None
    for t, planes in enumerate(tables):
        qb = _bucket_of(qvec, planes)
        targets = _probe_targets(qb, n_planes, multiprobe)
        term = F.element_at("buckets", t + 1).isin([int(b) for b in targets])
        cond = term if cond is None else cond | term
    return (
        bucketed.filter(cond)
        .crossJoin(F.broadcast(query))
        .select(
            id_col,
            F.round(vectors.cosine(vec_col, query_vec_col), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _probe_targets(
    qb: int, n_planes: int, multiprobe: int, max_targets: int = 4096
) -> set[int]:
    """All buckets within Hamming distance ≤ ``multiprobe`` of ``qb``:
    Σ_{r≤multiprobe} C(n_planes, r) targets.  Capped: an uncapped radius
    (e.g. r=5 at P=20 → 21k literals per table) would silently build a
    pathological OR-filter; refuse loudly instead."""
    import itertools
    import math as _math

    n_targets = sum(
        _math.comb(n_planes, r) for r in range(min(multiprobe, n_planes) + 1)
    )
    if n_targets > max_targets:
        raise ValueError(
            f"multiprobe={multiprobe} at n_planes={n_planes} expands to "
            f"{n_targets} target buckets per table (> {max_targets}): lower "
            f"the radius or add tables (n_tables) for recall instead"
        )
    targets = {qb}
    for r in range(1, min(multiprobe, n_planes) + 1):
        for bits in itertools.combinations(range(n_planes), r):
            flip = 0
            for j in bits:
                flip |= 1 << j
            targets.add(qb ^ flip)
    return targets


def cosine_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 3,
    n_tables: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SUB-QUADRATIC near-dup pairs: multi-table LSH prefilter → exact
    cosine re-verify — the scale path ``cosine_pairs_blocked``'s
    row-envelope guard points to.

    Candidate generation is pure equality joins: per-row buckets for L
    tables come from one stacked-GEMM pass (``lsh_bucket_multi``), are
    exploded to (id, table, bucket) rows, and self-joined on (table,
    bucket) with id_a < id_b — shuffle volume is Σ bucket² per (table,
    bucket) group, never n².  Survivors are re-verified with the same
    JVM cosine expression as the exact operator, so every emitted pair
    is bit-identical to ``cosine_pairs_blocked``'s (precision 1.0 by
    construction); recall is the probabilistic knob — P(candidate) =
    1-(1-p^P)^L with p = 1-θ/π — tuned via (n_planes, n_tables) and
    measured in tests (1.0 at the defaults on the driver tables).

    ``max_bucket_size`` drops oversized (table, bucket) groups (skew
    guard, same discipline as minhash_lsh_pairs): a dropped bucket can
    only reduce recall, never correctness.  On near-uniform vectors and
    mid thresholds the reduction factor is modest (loose buckets are
    what recall demands — a data property); clustered real-world
    embeddings concentrate near-dup pairs into tight buckets where the
    same configuration prunes hard.
    """
    bucketed = lsh_bucket_multi(emb, dim, n_planes, n_tables, seed, vec_col)
    # persist (NOT localCheckpoint): brows feeds both self-join sides and,
    # with the skew guard, the bucket-size count — without reuse the
    # full-table GEMM bucketing would re-execute per consumer.  persist
    # keeps lineage, so on a real cluster a lost executor recomputes the
    # block instead of failing the job (and no job runs at construction
    # time).  Lifecycle: owned by the returned plan; Spark evicts LRU.
    from pyspark import StorageLevel

    brows = bucketed.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode("buckets").alias("tbl", "bucket"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if max_bucket_size is not None:
        oversized = (
            brows.groupBy("tbl", "bucket")
            .count()
            .filter(F.col("count") > max_bucket_size)
            .select("tbl", "bucket")
        )
        brows = brows.join(
            F.broadcast(oversized), ["tbl", "bucket"], "left_anti"
        )
    left = brows.withColumnRenamed("id", "id_a")
    right = brows.withColumnRenamed("id", "id_b")
    cand = (
        left.join(right, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = emb.select(
        F.col(id_col).cast("long").alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = emb.select(
        F.col(id_col).cast("long").alias("id_b"), F.col(vec_col).alias("__vb")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(vectors.cosine("__va", "__vb"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_topk(
    emb: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: probe only vectors in the query's LSH bucket,
    re-rank exactly by cosine.  Recall grows with fewer planes / more
    tables; at cluster scale the bucketed table is pre-partitioned by
    ``bucket`` so a probe touches one partition."""
    bucketed = lsh_bucket(emb, dim, n_planes, seed, vec_col)
    qb = lsh_bucket(
        query.withColumnRenamed(query_vec_col, vec_col), dim, n_planes, seed, vec_col
    ).select(F.col("bucket").alias("qbucket"), F.col(vec_col).alias(query_vec_col))
    return (
        bucketed.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .select(
            id_col,
            F.round(vectors.cosine(vec_col, query_vec_col), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ── scalar-quantized IVF (SQ8): compressed inverted lists ────────────────


def _with_sq8(df: DataFrame, vec_col: str) -> DataFrame:
    """Add (sq_scale DOUBLE, sq_vec ARRAY<TINYINT>) — per-vector symmetric
    int8 quantization, pure codegen'd column expressions (no UDF):
    scale = max|x| / 127, q_i = round(x_i / scale) ∈ [-127, 127].
    Cosine is scale-invariant, so the probe scores the int8 arrays
    DIRECTLY (no dequantization) — the per-vector scale only matters
    for reconstruction and is stored for completeness.  Two steps so the
    transform lambda references the MATERIALIZED sq_scale column —
    inlining the aggregate into the lambda would re-evaluate it per
    array element (the interpreted-lambda trap textops hit in r3)."""
    scale = (
        F.expr(
            f"aggregate({vec_col}, 0D, "
            f"(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
        )
        / 127.0
    )
    return df.withColumn(
        "sq_scale", F.greatest(scale, F.lit(1e-30))
    ).withColumn(
        "sq_vec",
        F.expr(
            f"transform({vec_col}, "
            f"x -> CAST(round(CAST(x AS DOUBLE) / sq_scale) AS TINYINT))"
        ),
    )


def build_ivf_sq_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    write_partitions: int = 16,
    fullvec_buckets: int = 16,
    refine_iters: int = 0,
) -> None:
    """IVF index with SCALAR-QUANTIZED (int8) inverted lists — the
    compression layer that makes the index itself affordable at corpus
    scale (VERDICT r3 #4): a float64[64] row is ~512 B of vector; its
    SQ8 twin is ~64 B + one scale, so the hot probe path reads ~8×
    less.  Reference analog: none (north-star ANN family).

    Layout::

        path/lists/cluster=C/      (id, sq_scale, sq_vec int8[]) — probed
        path/fullvec/fv_bucket=B/  (id, full vector) — re-rank fetch only
        path/centroids/            tiny (cluster, centroid) planner table
        path/meta/                 (fullvec_buckets,)

    The probe shortlists on int8 cosine (scale cancels), then re-ranks
    the top ``rerank_n`` ids against full-precision vectors fetched
    PARTITION-PRUNED from ``fullvec`` (bucket = id % fullvec_buckets is
    derivable driver-side from the candidate ids — no scan, no hash
    job).  Quantization error only reorders near-ties inside the
    shortlist, which the exact re-rank repairs."""
    if refine_iters > 0:
        assigned, cent_mat = ivf_refine(
            emb, n_centroids, refine_iters, seed, id_col, vec_col
        )
    else:
        assigned, _, cent_mat = ivf_assign(
            emb, n_centroids, seed, id_col, vec_col
        )
    spark = emb.sparkSession
    (
        _with_sq8(
            emb.join(assigned, F.col(id_col) == F.col("id")).drop("id"),
            vec_col,
        )
        .select(id_col, "cluster", "sq_scale", "sq_vec")
        .repartition(write_partitions, "cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/lists")
    )
    (
        emb.select(
            id_col,
            vec_col,
            F.pmod(F.col(id_col), F.lit(fullvec_buckets))
            .cast("int")
            .alias("fv_bucket"),
        )
        .repartition(fullvec_buckets, "fv_bucket")
        .write.mode("overwrite")
        .partitionBy("fv_bucket")
        .parquet(f"{path}/fullvec")
    )
    cent_rows = [
        (int(i), [float(x) for x in row]) for i, row in enumerate(cent_mat)
    ]
    local_frame(
        spark, cent_rows, "cluster int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    local_frame(
        spark,
        [(int(fullvec_buckets), vec_col)],
        "fullvec_buckets int, vec_col string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def ivf_sq_probe(
    spark,
    path: str,
    query: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    rerank_n: int = 50,
    id_col: str = "vec_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """PROBE of :func:`build_ivf_sq_index`: rank centroids driver-side,
    read only the ``n_probe`` chosen (quantized) lists, shortlist
    ``rerank_n`` ids by int8 cosine, fetch their full vectors from the
    bucket-pruned ``fullvec`` store, exact cosine top-k.  Driver state
    is bounded by ``rerank_n`` ids; list I/O is the compressed ~1/8."""
    cent = spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    cent_mat = np.asarray([r["centroid"] for r in cent], dtype=np.float64)
    meta = spark.read.parquet(f"{path}/meta").first()
    fv_buckets = int(meta["fullvec_buckets"])
    vec_col = meta["vec_col"]  # the build's column name, not a guess
    qrow = query.select(F.col(query_vec_col)).first()
    qvec = np.asarray(qrow[0], dtype=np.float64)
    qn = np.linalg.norm(qvec)
    probe = _top_clusters(cent_mat @ (qvec / (qn if qn else 1.0)), n_probe)

    shortlist = (
        spark.read.parquet(f"{path}/lists")
        .filter(F.col("cluster").isin(probe))
        .crossJoin(F.broadcast(query))
        .select(
            id_col,
            vectors.cosine("sq_vec", query_vec_col).alias("approx_sim"),
        )
        .orderBy(F.desc("approx_sim"), F.asc(id_col))
        .limit(rerank_n)
    )
    ids = [r[0] for r in shortlist.select(id_col).collect()]  # ≤ rerank_n
    fullvec = spark.read.parquet(f"{path}/fullvec")
    if not ids:
        # empty result with the SAME schema as the hit path (id type
        # comes from the stored table, not a hardcoded long)
        return (
            fullvec.select(
                id_col, F.lit(0.0).alias("cos_sim")
            ).filter(F.lit(False))
        )
    buckets = sorted({int(i) % fv_buckets for i in ids})
    full = fullvec.filter(F.col("fv_bucket").isin(buckets)).filter(
        F.col(id_col).isin(ids)
    )
    return (
        full.crossJoin(F.broadcast(query))
        .select(
            id_col,
            F.round(
                vectors.cosine(vec_col, query_vec_col), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_sq_index_update(
    emb_new: DataFrame,
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Grow a persisted SQ8 index with a batch of NEW vectors: assign
    against the STORED centroids (broadcast-GEMM, quantizer-consistent
    — same contract as :func:`ivf_index_update`), quantize with the
    same codegen'd expressions, and APPEND into the matching list and
    fullvec bucket partitions.  Append-only id contract; centroid drift
    is repaid by a rebuild on the maintenance cadence; compact with
    maintenance.compact_parquet as lists accrete files."""
    spark = emb_new.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first()
    fv_buckets, vec_col = int(meta["fullvec_buckets"]), meta["vec_col"]
    cent = (
        spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    )
    cent_mat = np.asarray([r.centroid for r in cent], dtype=np.float64)
    norms = np.linalg.norm(cent_mat, axis=1)
    cent_mat = cent_mat / np.where(norms == 0.0, 1.0, norms)[:, None]
    src = emb_new.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    )
    assigned = _assign_to(src, cent_mat)
    (
        _with_sq8(
            emb_new.join(assigned, F.col(id_col) == F.col("id")).drop("id"),
            vec_col,
        )
        .select(id_col, "cluster", "sq_scale", "sq_vec")
        .repartition("cluster")
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(f"{path}/lists")
    )
    (
        emb_new.select(
            id_col,
            vec_col,
            F.pmod(F.col(id_col), F.lit(fv_buckets))
            .cast("int")
            .alias("fv_bucket"),
        )
        .repartition("fv_bucket")
        .write.mode("append")
        .partitionBy("fv_bucket")
        .parquet(f"{path}/fullvec")
    )

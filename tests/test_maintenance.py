"""Small-file compaction (operators/maintenance.py): append-mode parquet
datasets are rewritten to a bounded file count with identical rows,
preserved partition layout, and a still-working consumer afterwards."""

from __future__ import annotations

from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import maintenance
from csce438_distributed_password_cracker_spark.streaming import dedup_ingest
from tests.test_dedup_ingest import DOC_A, DOC_B, DOC_C, _docs


def _rows(spark, path):
    return {
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in spark.read.parquet(path).collect()
    }


def test_compact_parquet_flat(spark, tmp_path):
    path = str(tmp_path / "flat")
    # 3 appends × multiple tasks → many small files
    for lo in (0, 100, 200):
        spark.range(lo, lo + 50).repartition(8).write.mode("append").parquet(path)
    before_files = maintenance.parquet_file_count(path)
    before_rows = _rows(spark, path)
    assert before_files >= 24

    after_files = maintenance.compact_parquet(spark, path, num_files=2)
    assert after_files <= 2
    assert maintenance.parquet_file_count(path) == after_files
    assert _rows(spark, path) == before_rows


def test_compact_parquet_preserves_partition_layout(spark, tmp_path):
    path = str(tmp_path / "parts")
    df = spark.range(300).select(
        (F.col("id") % 3).alias("p"), F.col("id").alias("v")
    )
    for _ in range(3):
        df.repartition(8).write.mode("append").partitionBy("p").parquet(path)
    before_rows = _rows(spark, path)
    assert maintenance.parquet_file_count(path) > 6

    after_files = maintenance.compact_parquet(
        spark, path, partition_by=["p"], num_files=1
    )
    assert after_files <= 3  # ≤ num_files per partition dir × 3 dirs
    assert _rows(spark, path) == before_rows
    # hive layout intact: partition dirs still prunable
    pruned = spark.read.parquet(path).filter(F.col("p") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p#" in plan or "p#" in plan
    assert pruned.count() == 300  # 100 p==1 rows × 3 appends


def test_compact_parquet_missing_path_raises(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        maintenance.compact_parquet(spark, str(tmp_path / "nope"))


def test_compact_parquet_file_scheme_uri(spark, tmp_path):
    """The swap must run through the Hadoop FileSystem resolved from the
    path's scheme — driven here through an explicit ``file://`` URI, the
    scheme-aware code path a POSIX ``Path.rename`` could not serve (the
    r7 local-FS-only caveat)."""
    local = tmp_path / "scheme"
    uri = f"file://{local}"
    for lo in (0, 100, 200):
        spark.range(lo, lo + 50).repartition(8).write.mode("append").parquet(uri)
    before_rows = _rows(spark, str(local))
    assert maintenance.parquet_file_count(uri, spark) >= 24

    after_files = maintenance.compact_parquet(spark, uri, num_files=2)
    assert after_files <= 2
    # the swap left no tmp/old residue and the plain-path view agrees
    assert not (tmp_path / "scheme.__compact_tmp__").exists()
    assert not (tmp_path / "scheme.__compact_old__").exists()
    assert maintenance.parquet_file_count(str(local)) == after_files
    assert _rows(spark, str(local)) == before_rows


def test_fsutil_rename_checks_hadoop_false_return(spark, tmp_path):
    """Hadoop FileSystem.rename reports failure by RETURNING false;
    fsutil.rename must surface that as an error, not silent success."""
    import pytest

    from csce438_distributed_password_cracker_spark import fsutil

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    with pytest.raises(RuntimeError, match="rename"):
        fsutil.rename(spark, f"file://{tmp_path}/a", f"file://{tmp_path}/b")
    with pytest.raises(RuntimeError, match="rename"):
        fsutil.rename(spark, f"file://{tmp_path}/missing", f"file://{tmp_path}/c")
    # and a legal rename works + exists/delete round-trip
    fsutil.rename(spark, f"file://{tmp_path}/a", f"file://{tmp_path}/c")
    assert fsutil.exists(spark, f"file://{tmp_path}/c")
    fsutil.delete(spark, f"file://{tmp_path}/c")
    assert not fsutil.exists(spark, f"file://{tmp_path}/c")
    fsutil.delete(spark, f"file://{tmp_path}/c")  # missing → no-op


def test_fsutil_object_store_rename_warns():
    import warnings as w

    from csce438_distributed_password_cracker_spark import fsutil

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        fsutil.warn_if_non_atomic_rename("s3a://bucket/tbl", "compact_parquet")
        fsutil.warn_if_non_atomic_rename("/local/tbl", "compact_parquet")
        fsutil.warn_if_non_atomic_rename("file:///local/tbl", "compact_parquet")
    assert len(caught) == 1 and "NOT atomic" in str(caught[0].message)


def test_compact_dedup_index_preserves_verdicts(spark, tmp_path):
    idx = str(tmp_path / "index")
    dedup_ingest.build_dedup_index(_docs(spark, [(1, DOC_A), (2, DOC_B)]), idx)
    # several appending batches grow the file count
    dedup_ingest.ingest_batch(spark, _docs(spark, [(10, DOC_C)]), idx)
    dedup_ingest.ingest_batch(
        spark, _docs(spark, [(11, DOC_B + " extended with new tokens")]), idx
    )
    bands_rows = _rows(spark, f"{idx}/bands")
    sigs_rows = _rows(spark, f"{idx}/sigs")
    before = maintenance.parquet_file_count(f"{idx}/bands")

    counts = maintenance.compact_dedup_index(spark, idx)
    assert counts["bands"] < before
    # index CONTENT is unchanged — only file boundaries moved
    assert _rows(spark, f"{idx}/bands") == bands_rows
    assert _rows(spark, f"{idx}/sigs") == sigs_rows

    # the compacted index still serves probes: corpus dup found, novel admitted
    verdict = {
        r["id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_ingest.ingest_batch(
            spark, _docs(spark, [(20, DOC_A), (21, "totally novel closing words")]), idx
        ).collect()
    }
    assert verdict[20] == (True, 1)
    assert verdict[21] == (False, None)

def _morton(vals, bounds, bits):
    """Reference Morton encoder: min-max normalize then interleave bits."""
    top = (1 << bits) - 1
    z = 0
    k = len(vals)
    for j, (v, (lo, hi)) in enumerate(zip(vals, bounds)):
        if hi <= lo:
            n = 0
        else:
            frac = min(max((float(v) - lo) / (hi - lo), 0.0), 1.0)
            n = int(frac * top)
        for i in range(bits):
            z |= ((n >> i) & 1) << (i * k + j)
    return z


def test_zorder_column_matches_reference_morton(spark):
    bounds = {"x": (0.0, 15.0), "y": (0.0, 15.0)}
    df = spark.range(16).select(
        (F.col("id") % 4 * 5).alias("x"), (F.col("id") / 3).cast("long").alias("y")
    )
    z = maintenance.zorder_column(df, ["x", "y"], bounds, bits=4)
    got = {(r["x"], r["y"]): r["z"] for r in df.withColumn("z", z).collect()}
    for (x, y), zv in got.items():
        assert zv == _morton([x, y], [bounds["x"], bounds["y"]], 4), (x, y)


def test_zorder_sort_clusters_both_dimensions(spark):
    # 8×8 grid; sorting by z-value must place spatial neighbors in the
    # same half of the output far more often than a single-key sort would
    # for the trailing key.
    df = spark.range(64).select(
        (F.col("id") % 8).alias("x"), (F.col("id") / 8).cast("long").alias("y")
    )
    bounds = {"x": (0.0, 7.0), "y": (0.0, 7.0)}
    z = maintenance.zorder_column(df, ["x", "y"], bounds, bits=3)
    rows = df.withColumn("z", z).orderBy("z").collect()
    # nulls / out-of-bounds clamp rather than error
    edge = spark.createDataFrame(
        [(None, 100.0), (-5.0, 3.0)], "x double, y double"
    )
    edge_z = maintenance.zorder_column(edge, ["x", "y"], bounds, bits=3)
    assert edge.withColumn("z", edge_z).count() == 2
    # quadrant locality: first 16 rows of the z-order are exactly the
    # low-low quadrant (x<4, y<4) — the defining Morton property
    first = rows[:16]
    assert all(r["x"] < 4 and r["y"] < 4 for r in first)


def test_zorder_rejects_overflow(spark):
    import pytest

    df = spark.range(1).select(F.col("id").alias("x"))
    with pytest.raises(ValueError):
        maintenance.zorder_column(df, ["x"] * 4, {"x": (0, 1)}, bits=16)


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """The point of z-order clustering: after sorting by the z-value,
    parquet footer min/max stats prune range predicates on EVERY
    clustered column, not just the leading sort key.  A y-range box over
    an x-sorted layout overlaps every file (y spans everything in each
    file); over the z-ordered layout it overlaps only a strict subset."""
    import glob as globmod

    import pyarrow.parquet as pq

    df = spark.range(40_000).select(
        (F.col("id") % 197).cast("double").alias("x"),
        F.pmod(F.xxhash64("id"), F.lit(197)).cast("double").alias("y"),
    )
    bounds = {"x": (0.0, 196.0), "y": (0.0, 196.0)}

    x_path = str(tmp_path / "by_x")
    z_path = str(tmp_path / "by_z")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(x_path)
    z = maintenance.zorder_column(df, ["x", "y"], bounds, bits=8)
    (
        df.withColumn("__z", z)
        .repartitionByRange(16, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.parquet(z_path)
    )

    def overlapping_files(path, col, lo, hi):
        n_total, n_overlap = 0, 0
        for f in globmod.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        mins.append(c.statistics.min)
                        maxs.append(c.statistics.max)
            n_total += 1
            if mins and not (max(maxs) < lo or min(mins) > hi):
                n_overlap += 1
        return n_overlap, n_total

    # a tight y-range: the x-sorted layout cannot prune it at all
    y_x, total_x = overlapping_files(x_path, "y", 10.0, 20.0)
    y_z, total_z = overlapping_files(z_path, "y", 10.0, 20.0)
    assert y_x == total_x, "x-sorted files all span the y domain"
    assert y_z < total_z, f"z-order should prune y ranges ({y_z}/{total_z})"
    # and x-ranges still prune under z-order (coarser than an x-sort,
    # but far better than nothing)
    x_z, _ = overlapping_files(z_path, "x", 10.0, 20.0)
    assert x_z < total_z


def test_listing_tag_metadata_only_and_rewrite_sensitive(spark, tmp_path):
    """fsutil.listing_tag: the freshness fingerprint probe paths key on
    must (a) launch ZERO Spark jobs (it is the check a 100 TB probe can
    afford — a data scan here re-creates the O(table)-per-probe cost
    the build/probe split removes), (b) be stable across reads, and
    (c) change when the dataset is rewritten."""
    import time

    from csce438_distributed_password_cracker_spark import fsutil
    from csce438_distributed_password_cracker_spark.plans.benchmetrics import (
        StageMetricsTracker,
    )

    p = str(tmp_path / "ds")
    spark.range(100).write.parquet(p)
    tracker = StageMetricsTracker(spark)
    tracker.delta()
    t1 = fsutil.listing_tag(spark, p)
    t2 = fsutil.listing_tag(spark, p)
    d = tracker.delta()
    assert d["n_stages"] == 0, "listing_tag must not run Spark jobs"
    assert t1 == t2
    assert 0 <= t1 < 1_000_000_007
    time.sleep(0.05)  # mtime resolution guard
    spark.range(100).write.mode("overwrite").parquet(p)
    assert fsutil.listing_tag(spark, p) != t1


def test_listing_tag_limitation_and_force_rebuild_salt(spark, tmp_path):
    """listing_tag is a FRESHNESS fingerprint, not a content hash
    (ADVICE r9): an in-place rewrite that preserves every file's name,
    size and mtime-ms is invisible to it.  Pin that documented
    limitation executable-y, and pin the escape hatch: a salt (the
    SPARK_GRAFT_FORCE_REBUILD wiring in _source_tag) deterministically
    changes the tag without touching the data."""
    import os

    from csce438_distributed_password_cracker_spark import fsutil

    d = tmp_path / "ds"
    d.mkdir()
    f = d / "part-00000.bin"
    f.write_bytes(b"A" * 64)
    st = f.stat()
    t1 = fsutil.listing_tag(spark, str(d))

    # same-size same-mtime rewrite: content changed, tag CANNOT see it
    f.write_bytes(b"B" * 64)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert fsutil.listing_tag(spark, str(d)) == t1  # the documented hole

    # the escape hatch: any new salt re-tags deterministically
    s1 = fsutil.listing_tag(spark, str(d), salt="rebuild-1")
    assert s1 != t1
    assert fsutil.listing_tag(spark, str(d), salt="rebuild-1") == s1
    assert fsutil.listing_tag(spark, str(d), salt="rebuild-2") != s1

    # a size change IS seen even at identical mtime (size is listed)
    f.write_bytes(b"B" * 65)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert fsutil.listing_tag(spark, str(d)) != t1

    # _source_tag folds the env hatch in
    from csce438_distributed_password_cracker_spark.plans import pipeline_queries as pq

    base = pq._source_tag(spark, "/root/testdata/sf0.001", "region")
    os.environ["SPARK_GRAFT_FORCE_REBUILD"] = "test-hatch"
    try:
        assert pq._source_tag(spark, "/root/testdata/sf0.001", "region") != base
    finally:
        del os.environ["SPARK_GRAFT_FORCE_REBUILD"]
    assert pq._source_tag(spark, "/root/testdata/sf0.001", "region") == base

"""Versioned tables: atomic pointer commits, immutable time travel,
file-level reuse across versions (hard links), and vacuum retention."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import versioned


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.range(20).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v1-"), F.col("id")).alias("body"),
        (F.col("id") % 4).cast("string").alias("part"),
    )
    assert versioned.commit_version(df, root, partition_by="part") == 1
    return root


def test_commit_read_and_time_travel(spark, table):
    v1 = versioned.read_version(spark, table)
    assert v1.count() == 20

    delta = spark.createDataFrame(
        [(0, "v2-0", "0", False), (100, "v2-100", "0", False)],
        "k long, body string, part string, deleted boolean",
    )
    v = versioned.merge_versioned(
        spark, table, delta, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    assert v == 2
    latest = {r.k: r.body for r in versioned.read_version(spark, table).collect()}
    assert latest[0] == "v2-0" and latest[100] == "v2-100"
    assert len(latest) == 21

    # time travel: version 1 still answers exactly as before
    old = {r.k: r.body for r in versioned.read_version(spark, table, 1).collect()}
    assert old[0] == "v1-0" and 100 not in old and len(old) == 20
    assert [h["version"] for h in versioned.history(table)] == [1, 2]


def test_merge_reuses_unchanged_files_via_hard_links(spark, table):
    delta = spark.createDataFrame(
        [(1, "changed", "1", False)],
        "k long, body string, part string, deleted boolean",
    )
    versioned.merge_versioned(
        spark, table, delta, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    root = Path(table)
    m = json.loads((root / versioned.MANIFEST).read_text())
    v1, v2 = (root / h["dir"] for h in m["history"])

    def inodes(vdir, part):
        return {
            p.name: p.stat().st_ino for p in (vdir / f"part={part}").iterdir()
            if p.name.startswith("part-")
        }

    # untouched partitions: SAME inodes (hard links, zero data copied)
    for part in ("0", "2", "3"):
        assert inodes(v1, part) == inodes(v2, part)
    # the touched partition was rewritten (disjoint inodes)
    assert not (
        set(inodes(v1, "1").values()) & set(inodes(v2, "1").values())
    )


def test_manifest_swap_is_atomic_for_readers(spark, table):
    """A reader that resolved the manifest BEFORE a commit keeps
    reading its immutable version directory."""
    pinned = versioned.read_version(spark, table)  # resolves v1's dir
    before = pinned.count()
    delta = spark.createDataFrame(
        [(k, "bulk", "0", False) for k in range(200, 260)],
        "k long, body string, part string, deleted boolean",
    )
    versioned.merge_versioned(
        spark, table, delta, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    assert pinned.count() == before  # unaffected by the commit
    assert versioned.read_version(spark, table).count() == before + 60


def test_vacuum_trims_history_and_keeps_retained_readable(spark, table):
    for i in range(3):
        delta = spark.createDataFrame(
            [(i, f"rev-{i}", str(i % 4), False)],
            "k long, body string, part string, deleted boolean",
        )
        versioned.merge_versioned(
            spark, table, delta, key_cols=["k"], partition_col="part",
            delete_col="deleted",
        )
    assert [h["version"] for h in versioned.history(table)] == [1, 2, 3, 4]

    removed = versioned.vacuum(table, keep_last=2)
    assert removed == [1, 2]
    assert [h["version"] for h in versioned.history(table)] == [3, 4]
    # retained versions are self-sufficient despite deleted ancestors
    assert versioned.read_version(spark, table, 3).count() == 20
    assert versioned.read_version(spark, table, 4).count() == 20
    with pytest.raises(ValueError, match="vacuumed"):
        versioned.read_version(spark, table, 1)
    with pytest.raises(ValueError, match="keep_last"):
        versioned.vacuum(table, keep_last=0)


def test_partitioning_is_a_table_property(spark, tmp_path, table):
    flat = str(tmp_path / "flat")
    df = spark.range(5).select(F.col("id").alias("k"))
    versioned.commit_version(df, flat)  # unpartitioned table
    delta = spark.createDataFrame([(1, "x", "0", False)],
        "k long, body string, part string, deleted boolean")
    with pytest.raises(ValueError, match="partitioned by"):
        versioned.merge_versioned(
            spark, flat, delta, key_cols=["k"], partition_col="part",
        )
    with pytest.raises(ValueError, match="partitioned by"):
        versioned.commit_version(df, table, partition_by=None)


def test_schema_evolution_across_versions(spark, tmp_path):
    """Each version directory is self-contained, so a column added in a
    later full-snapshot commit coexists with earlier versions — time
    travel returns each version's own schema."""
    root = str(tmp_path / "evolving")
    v1_df = spark.range(3).select(F.col("id").alias("k"))
    versioned.commit_version(v1_df, root)
    v2_df = v1_df.withColumn("quality", F.col("k") * 0.5)
    versioned.commit_version(v2_df, root)

    assert versioned.read_version(spark, root, 1).columns == ["k"]
    latest = versioned.read_version(spark, root)
    assert latest.columns == ["k", "quality"]
    assert latest.count() == 3


def test_concurrent_writer_loses_loudly_without_retries(spark, table):
    """Two interleaved merges: writer B commits while writer A is
    mid-flight (between A's snapshot read and its commit point).  A's
    commit must raise ConcurrentWriteError — NOT silently clobber B's
    update (the lost-update anomaly of a bare read-increment-rename)."""
    delta_a = spark.createDataFrame(
        [(0, "A-wrote", "0", False)],
        "k long, body string, part string, deleted boolean",
    )
    delta_b = spark.createDataFrame(
        [(3, "B-wrote", "3", False)],
        "k long, body string, part string, deleted boolean",
    )

    state = {"injected": False}
    real_staging = versioned._staging_dir

    def staging_with_interleaved_b(root):
        if not state["injected"]:
            state["injected"] = True
            # B sneaks a full merge in while A holds its v1 snapshot
            versioned.merge_versioned(
                spark, table, delta_b, key_cols=["k"],
                partition_col="part", delete_col="deleted",
            )
        return real_staging(root)

    versioned._staging_dir = staging_with_interleaved_b
    try:
        with pytest.raises(versioned.ConcurrentWriteError):
            versioned.merge_versioned(
                spark, table, delta_a, key_cols=["k"],
                partition_col="part", delete_col="deleted",
            )
    finally:
        versioned._staging_dir = real_staging

    # B's update survived; A landed nothing; no staging litter
    latest = {r.k: r.body for r in versioned.read_version(spark, table).collect()}
    assert latest[3] == "B-wrote" and latest[0] == "v1-0"
    assert [h["version"] for h in versioned.history(table)] == [1, 2]
    assert not list(Path(table).glob("_staging-*"))


def test_concurrent_writer_retries_to_correct_serial_history(spark, table):
    """Same interleave, but with retries=1: A recomputes against B's
    commit and BOTH updates survive in the final version."""
    delta_a = spark.createDataFrame(
        [(0, "A-wrote", "0", False)],
        "k long, body string, part string, deleted boolean",
    )
    delta_b = spark.createDataFrame(
        [(3, "B-wrote", "3", False)],
        "k long, body string, part string, deleted boolean",
    )

    state = {"injected": False}
    real_staging = versioned._staging_dir

    def staging_with_interleaved_b(root):
        if not state["injected"]:
            state["injected"] = True
            versioned.merge_versioned(
                spark, table, delta_b, key_cols=["k"],
                partition_col="part", delete_col="deleted",
            )
        return real_staging(root)

    versioned._staging_dir = staging_with_interleaved_b
    try:
        v = versioned.merge_versioned(
            spark, table, delta_a, key_cols=["k"],
            partition_col="part", delete_col="deleted", retries=1,
        )
    finally:
        versioned._staging_dir = real_staging

    assert v == 3  # serial history: v1 -> B's v2 -> A's retried v3
    latest = {r.k: r.body for r in versioned.read_version(spark, table).collect()}
    assert latest[0] == "A-wrote" and latest[3] == "B-wrote"
    assert [h["version"] for h in versioned.history(table)] == [1, 2, 3]


def test_parallel_writers_all_land(spark, table):
    """Thread-level sanity: N concurrent merges with retries all land;
    the final table carries every writer's key and the history is a
    clean serial chain (commit-lock + precondition discipline)."""
    import threading

    errors = []

    def writer(i):
        try:
            delta = spark.createDataFrame(
                [(1000 + i, f"w{i}", str(i % 4), False)],
                "k long, body string, part string, deleted boolean",
            )
            versioned.merge_versioned(
                spark, table, delta, key_cols=["k"], partition_col="part",
                delete_col="deleted", retries=8,
            )
        except Exception as e:  # surface in the main thread
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    latest = {r.k for r in versioned.read_version(spark, table).collect()}
    assert {1000, 1001, 1002, 1003} <= latest
    assert [h["version"] for h in versioned.history(table)] == [1, 2, 3, 4, 5]


def test_multi_column_partitioned_versioned_merge(spark, tmp_path):
    """(day, source)-layout: merge rewrites one leaf, hard-links every
    other leaf (inode equality), and num_files sizes the rewrite."""
    root = str(tmp_path / "tbl2d")
    df = spark.range(24).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v1-"), F.col("id")).alias("body"),
        F.date_add(F.lit("2024-03-01"), (F.col("id") % 2).cast("int"))
        .cast("string")
        .alias("day"),
        F.element_at(
            F.array(F.lit("web"), F.lit("api")),
            (F.col("id") % 2 + 1).cast("int"),
        ).alias("source"),
    )
    assert (
        versioned.commit_version(df, root, partition_by=["day", "source"])
        == 1
    )
    # id%2 couples day and source here: leaves are (03-01, web), (03-02, api)
    delta = spark.createDataFrame(
        [(0, "changed", "2024-03-01", "web", False)],
        "k long, body string, day string, source string, deleted boolean",
    )
    v = versioned.merge_versioned(
        spark, root, delta, key_cols=["k", "day", "source"],
        partition_col=["day", "source"], delete_col="deleted", num_files=2,
    )
    assert v == 2
    rootp = Path(root)
    m = json.loads((rootp / versioned.MANIFEST).read_text())
    v1, v2 = (rootp / h["dir"] for h in m["history"])

    def inodes(vdir, rel):
        return {
            p.name: p.stat().st_ino
            for p in (vdir / rel).iterdir()
            if p.name.startswith("part-")
        }

    untouched = "day=2024-03-02/source=api"
    touched = "day=2024-03-01/source=web"
    assert inodes(v1, untouched) == inodes(v2, untouched)  # hard links
    assert not (
        set(inodes(v1, touched).values()) & set(inodes(v2, touched).values())
    )
    # num_files=2 sized the rewritten leaf
    assert len(inodes(v2, touched)) == 2

    latest = {r.k: r.body for r in versioned.read_version(spark, root).collect()}
    assert latest[0] == "changed" and len(latest) == 24


def test_vacuum_sweeps_abandoned_staging(spark, table):
    (Path(table) / "_staging-999-deadbeef").mkdir()
    versioned.merge_versioned(
        spark,
        table,
        spark.createDataFrame(
            [(1, "x", "1", False)],
            "k long, body string, part string, deleted boolean",
        ),
        key_cols=["k"],
        partition_col="part",
        delete_col="deleted",
    )
    versioned.vacuum(table, keep_last=1)
    assert not list(Path(table).glob("_staging-*"))


def test_merge_schema_evolution_additive(spark, table):
    """allow_new_columns=True: a delta carrying a new column widens the
    table schema; kept rows AND hard-linked untouched partitions read
    back NULL there, the new rows carry their values, and time travel
    returns each version's contemporary schema."""
    delta = spark.createDataFrame(
        [(0, "v2-0", "0", False, 0.9), (100, "v2-100", "1", False, 0.5)],
        "k long, body string, part string, deleted boolean, quality double",
    )
    # without the flag the extra column is pruned (typo guard)
    v2 = versioned.merge_versioned(
        spark, table, delta, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    assert "quality" not in versioned.read_version(spark, table, v2).columns

    v3 = versioned.merge_versioned(
        spark, table, delta, key_cols=["k"], partition_col="part",
        delete_col="deleted", allow_new_columns=True,
    )
    latest = versioned.read_version(spark, table, v3)
    # (partition columns come last on read regardless of declared order)
    assert "quality" in latest.columns
    rows = {r.k: r for r in latest.collect()}
    assert rows[0].quality == 0.9 and rows[100].quality == 0.5
    # untouched (hard-linked, old-schema files) and kept rows: NULL
    assert rows[2].quality is None and rows[3].quality is None
    assert len(rows) == 21

    # time travel: pre-evolution versions keep their own schema
    assert "quality" not in versioned.read_version(spark, table, 1).columns

    # a further merge WITHOUT the new column still works (delta must
    # carry the full current schema now)
    with pytest.raises(ValueError, match="missing target columns"):
        versioned.merge_versioned(
            spark, table,
            spark.createDataFrame(
                [(5, "x", "1", False)],
                "k long, body string, part string, deleted boolean",
            ),
            key_cols=["k"], partition_col="part", delete_col="deleted",
        )


def test_schema_evolution_survives_untouched_partition_links(spark, table):
    """After an evolution touching ONE partition, reading the latest
    version scans hard-linked old files from the other three partitions
    under the widened schema — schema-on-read must hold per file."""
    delta = spark.createDataFrame(
        [(1, "evolved", "1", 3.5)],
        "k long, body string, part string, score double",
    )
    v = versioned.merge_versioned(
        spark, table, delta, key_cols=["k"], partition_col="part",
        allow_new_columns=True,
    )
    latest = versioned.read_version(spark, table, v)
    # every partition readable; only k=1 carries the score
    per_part = {
        r.part: r.n
        for r in latest.groupBy("part").agg(F.count("*").alias("n")).collect()
    }
    assert per_part == {"0": 5, "1": 5, "2": 5, "3": 5}
    scored = latest.filter(F.col("score").isNotNull()).collect()
    assert len(scored) == 1 and scored[0].k == 1


# ---------------------------------------- conditional-PUT (CAS) backend


@pytest.fixture()
def cas():
    return versioned.CasCommitBackend()


@pytest.fixture()
def cas_table(spark, tmp_path, cas):
    root = str(tmp_path / "cas_tbl")
    df = spark.range(20).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v1-"), F.col("id")).alias("body"),
        (F.col("id") % 4).cast("string").alias("part"),
    )
    assert (
        versioned.commit_version(df, root, partition_by="part", backend=cas)
        == 1
    )
    return root


def test_cas_commit_merge_and_time_travel(spark, cas_table, cas):
    """The object-store protocol supports the same commit/merge/read
    surface: nonce'd version directories, no lock file ever created."""
    delta = spark.createDataFrame(
        [(0, "v2-0", "0", False), (100, "v2-100", "0", False)],
        "k long, body string, part string, deleted boolean",
    )
    v = versioned.merge_versioned(
        spark, cas_table, delta, key_cols=["k"], partition_col="part",
        delete_col="deleted", backend=cas,
    )
    assert v == 2
    latest = {
        r.k: r.body for r in versioned.read_version(spark, cas_table).collect()
    }
    assert latest[0] == "v2-0" and latest[100] == "v2-100"
    old = {
        r.k: r.body
        for r in versioned.read_version(spark, cas_table, 1).collect()
    }
    assert old[0] == "v1-0" and 100 not in old
    # data directories carry the per-attempt nonce (unique upload names)
    dirs = [h["dir"] for h in versioned.history(cas_table)]
    assert all("-" in d for d in dirs)
    # no lock file: the CAS protocol has no lock to take
    assert not (Path(cas_table) / versioned.COMMIT_LOCK).exists()


def test_cas_concurrent_writer_loses_loudly(spark, cas_table, cas):
    """Same lost-update interleave as the POSIX test, against the CAS
    backend: writer A's merge (computed against v1) must fail its
    conditional put after B lands v2."""
    delta_a = spark.createDataFrame(
        [(0, "A-wrote", "0", False)],
        "k long, body string, part string, deleted boolean",
    )
    delta_b = spark.createDataFrame(
        [(3, "B-wrote", "3", False)],
        "k long, body string, part string, deleted boolean",
    )
    state = {"injected": False}
    real_staging = versioned._staging_dir

    def staging_with_interleaved_b(root):
        if not state["injected"]:
            state["injected"] = True
            versioned.merge_versioned(
                spark, cas_table, delta_b, key_cols=["k"],
                partition_col="part", delete_col="deleted", backend=cas,
            )
        return real_staging(root)

    versioned._staging_dir = staging_with_interleaved_b
    try:
        with pytest.raises(versioned.ConcurrentWriteError):
            versioned.merge_versioned(
                spark, cas_table, delta_a, key_cols=["k"],
                partition_col="part", delete_col="deleted", backend=cas,
            )
    finally:
        versioned._staging_dir = real_staging

    latest = {
        r.k: r.body for r in versioned.read_version(spark, cas_table).collect()
    }
    assert latest[3] == "B-wrote" and latest[0] == "v1-0"
    assert [h["version"] for h in versioned.history(cas_table)] == [1, 2]
    # the loser left neither staging litter nor an unreferenced upload
    referenced = {h["dir"] for h in versioned.history(cas_table)}
    on_disk = {p.name for p in Path(cas_table).glob("v*")}
    assert on_disk == referenced
    assert not list(Path(cas_table).glob("_staging-*"))


def test_cas_lost_conditional_put_cleans_its_upload(spark, cas_table, cas):
    """Force the conditional put itself to lose (the post-upload race):
    a merge raises ConcurrentWriteError and sweeps its uploaded data; a
    full snapshot re-contends with the same upload and lands."""
    real_cas = cas._cas
    fails = {"n": 1}

    def flaky_cas(root, expected, new_manifest):
        if fails["n"] > 0:
            fails["n"] -= 1
            return False  # someone else's put landed first
        return real_cas(root, expected, new_manifest)

    cas._cas = flaky_cas
    try:
        delta = spark.createDataFrame(
            [(0, "late", "0", False)],
            "k long, body string, part string, deleted boolean",
        )
        with pytest.raises(versioned.ConcurrentWriteError):
            versioned.merge_versioned(
                spark, cas_table, delta, key_cols=["k"],
                partition_col="part", delete_col="deleted", backend=cas,
            )
        referenced = {h["dir"] for h in versioned.history(cas_table)}
        on_disk = {p.name for p in Path(cas_table).glob("v*")}
        assert on_disk == referenced  # loser's upload swept

        # full snapshots re-contend internally (content is
        # parent-independent) — one lost put, then it lands
        fails["n"] = 1
        df = spark.range(5).select(
            F.col("id").alias("k"),
            F.lit("snap").alias("body"),
            (F.col("id") % 4).cast("string").alias("part"),
        )
        v = versioned.commit_version(
            df, cas_table, partition_by="part", backend=cas
        )
        assert v == 2
        assert versioned.read_version(spark, cas_table).count() == 5
    finally:
        cas._cas = real_cas


def test_cas_parallel_writers_all_land(spark, cas_table, cas):
    import threading

    errors = []

    def writer(i):
        try:
            delta = spark.createDataFrame(
                [(1000 + i, f"w{i}", str(i % 4), False)],
                "k long, body string, part string, deleted boolean",
            )
            versioned.merge_versioned(
                spark, cas_table, delta, key_cols=["k"],
                partition_col="part", delete_col="deleted", retries=8,
                backend=cas,
            )
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    latest = {r.k for r in versioned.read_version(spark, cas_table).collect()}
    assert {1000, 1001, 1002, 1003} <= latest
    assert [h["version"] for h in versioned.history(cas_table)] == [
        1, 2, 3, 4, 5,
    ]


def test_cas_vacuum_trims_under_cas_retry(spark, cas_table, cas):
    for i in range(2):
        delta = spark.createDataFrame(
            [(i, f"rev-{i}", str(i % 4), False)],
            "k long, body string, part string, deleted boolean",
        )
        versioned.merge_versioned(
            spark, cas_table, delta, key_cols=["k"], partition_col="part",
            delete_col="deleted", backend=cas,
        )
    # one lost put on the trim's conditional write: it must re-read and
    # retry, never roll the pointer back
    real_cas = cas._cas
    fails = {"n": 1}

    def flaky_cas(root, expected, new_manifest):
        if fails["n"] > 0:
            fails["n"] -= 1
            return False
        return real_cas(root, expected, new_manifest)

    cas._cas = flaky_cas
    try:
        removed = versioned.vacuum(cas_table, keep_last=1, backend=cas)
    finally:
        cas._cas = real_cas
    assert removed == [1, 2]
    assert [h["version"] for h in versioned.history(cas_table)] == [3]
    assert versioned.read_version(spark, cas_table).count() == 20


def test_vacuum_sweeps_orphaned_uploads_not_inflight(spark, table):
    """Regression (round-5 review): a CAS writer that dies between its
    nonce'd upload and the conditional put leaks an unreferenced
    version directory — vacuum must sweep it.  An upload AHEAD of the
    head (version head+1 — an in-flight writer) must survive."""
    df = spark.createDataFrame(
        [(1, "x", "1", False)],
        "k long, body string, part string, deleted boolean",
    )
    versioned.merge_versioned(
        spark, table, df, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    versioned.merge_versioned(
        spark, table, df, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    root = Path(table)
    head = versioned.history(table)[-1]["version"]
    orphan = root / f"v{head:08d}-deadbeef"  # lost-race upload <= head
    orphan.mkdir()
    (orphan / "junk.parquet").write_bytes(b"x")
    inflight = root / f"v{head + 1:08d}-cafef00d"  # targets head+1
    inflight.mkdir()
    versioned.vacuum(table, keep_last=2)
    assert not orphan.exists(), "orphaned upload must be swept"
    assert inflight.exists(), "in-flight upload must survive"
    # the retained history's dirs are untouched
    for h in versioned.history(table):
        assert (root / h["dir"]).exists()
    # after head advances past it, the abandoned in-flight dir is swept
    versioned.merge_versioned(
        spark, table, df, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    assert versioned.history(table)[-1]["version"] == head + 1
    versioned.vacuum(table, keep_last=2)
    assert not inflight.exists()


def test_table_changes_between_versions(spark, table):
    """Change data feed: added/changed/removed keys between two commits,
    derived retroactively from the immutable version directories."""
    delta = spark.createDataFrame(
        [(0, "v2-0", "0", False), (100, "v2-100", "0", False),
         (3, None, "3", True)],
        "k long, body string, part string, deleted boolean",
    )
    versioned.merge_versioned(
        spark, table, delta, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    cdf = versioned.table_changes(spark, table, ["k"], 1)
    got = {r.k: r.diff_status for r in cdf.collect()}
    assert got == {0: "changed", 100: "added", 3: "removed"}
    assert cdf.columns == ["k", "diff_status", "from_version", "to_version"]
    rows = cdf.select("from_version", "to_version").first()
    assert (rows[0], rows[1]) == (1, 2)
    # explicit to_version and identity diff
    assert versioned.table_changes(spark, table, ["k"], 1, 1).count() == 0
    # a version that never existed says so — even when it ALSO exceeds
    # the defaulted to_version (existence is checked before ordering)
    with pytest.raises(ValueError, match="not in history"):
        versioned.table_changes(spark, table, ["k"], 7)
    with pytest.raises(ValueError, match="not in history"):
        versioned.table_changes(spark, table, ["k"], 1, 7)
    # swapped EXISTING versions would invert added/removed — loud error
    with pytest.raises(ValueError, match="swap the arguments"):
        versioned.table_changes(spark, table, ["k"], 2, 1)


def test_delete_where_tombstones_and_erasure_path(spark, table):
    """Row-level DELETE: predicate-matching rows vanish from the new
    head, survive in the old version until vacuum, no-op predicates
    commit nothing, and the full erasure recipe (delete + vacuum)
    removes the bytes."""
    v, n = versioned.delete_where(
        spark, table, "k % 4 = 1", ["k"], "part"
    )
    assert (v, n) == (2, 5)  # keys 1,5,9,13,17 of range(20)
    head = versioned.read_version(spark, table)
    assert head.count() == 15
    assert head.where("k % 4 = 1").count() == 0
    # time travel still sees them (hard links) — the documented caveat
    assert versioned.read_version(spark, table, 1).count() == 20
    # no-op predicate: no new version
    v2, n2 = versioned.delete_where(
        spark, table, "k > 1000", ["k"], "part"
    )
    assert (v2, n2) == (2, 0)
    assert [h["version"] for h in versioned.history(table)] == [1, 2]
    # compliance erasure: vacuum to the head only
    versioned.vacuum(table, keep_last=1)
    with pytest.raises(ValueError, match="not in history"):
        versioned.read_version(spark, table, 1)
    # partition-scoped delete prunes to the partition and empties it
    v3, n3 = versioned.delete_where(
        spark, table, "part = '2'", ["k"], "part"
    )
    assert n3 == 5 and versioned.read_version(spark, table).where(
        "part = '2'"
    ).count() == 0

"""Copy-on-write MERGE: semantics (upsert/insert/delete, last-writer-
wins), partition pruning of the target scan, and the on-disk contract
that untouched partition directories are not rewritten."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators.merge import (
    merge_upsert,
)


@pytest.fixture()
def seeded_table(spark, tmp_path):
    """Partitioned parquet table: 40 rows over 4 lang partitions."""
    path = str(tmp_path / "docs")
    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("body"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("ja")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )
    df.repartition(2, "lang").write.partitionBy("lang").parquet(path)
    return path


def _snapshot(path):
    """(relative file path -> mtime_ns) for every parquet data file."""
    root = Path(path)
    return {
        str(p.relative_to(root)): p.stat().st_mtime_ns
        for p in root.rglob("*.parquet")
    }


def test_merge_semantics_and_pruned_io(spark, seeded_table):
    before = _snapshot(seeded_table)

    # delta touches ONLY lang=en (doc_id % 4 == 0): update doc 0,
    # insert doc 100, tombstone doc 4
    delta = spark.createDataFrame(
        [
            (0, "text-0-v2", "en", False),
            (100, "text-100", "en", False),
            (4, None, "en", True),
        ],
        "doc_id long, body string, lang string, deleted boolean",
    )
    stats = merge_upsert(
        spark,
        seeded_table,
        delta,
        key_cols=["doc_id"],
        partition_col="lang",
        delete_col="deleted",
    )
    assert stats == {
        "partitions_touched": 1,
        "partitions_total": 4,
        "rows_upserted": 2,
        "rows_deleted": 1,
    }

    out = spark.read.parquet(seeded_table)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 40  # 40 - 1 deleted + 1 inserted
    assert rows[0].body == "text-0-v2" and rows[0].lang == "en"
    assert rows[100].body == "text-100"
    assert 4 not in rows
    assert rows[1].body == "text-1"  # untouched partition intact

    # on-disk contract: every file in the three untouched partitions is
    # the SAME file (same path, same mtime); lang=en was rewritten
    after = _snapshot(seeded_table)
    untouched_before = {k: v for k, v in before.items() if "lang=en" not in k}
    untouched_after = {k: v for k, v in after.items() if "lang=en" not in k}
    assert untouched_before == untouched_after
    assert {k for k in after if "lang=en" in k} != {
        k for k in before if "lang=en" in k
    }


def test_merge_new_partition_and_full_delete(spark, seeded_table):
    # insert into a brand-new partition AND tombstone every row of lang=ja
    ja_ids = [
        r.doc_id
        for r in spark.read.parquet(seeded_table)
        .filter(F.col("lang") == "ja")
        .collect()
    ]
    delta = spark.createDataFrame(
        [(200, "hola", "es", False)]
        + [(i, None, "ja", True) for i in ja_ids],
        "doc_id long, body string, lang string, deleted boolean",
    )
    merge_upsert(
        spark,
        seeded_table,
        delta,
        key_cols=["doc_id"],
        partition_col="lang",
        delete_col="deleted",
    )
    out = spark.read.parquet(seeded_table)
    langs = {r[0] for r in out.select("lang").distinct().collect()}
    assert langs == {"en", "de", "fr", "es"}  # ja vanished, es appeared
    assert not (Path(seeded_table) / "lang=ja").exists()
    assert out.filter(F.col("doc_id") == 200).count() == 1


def test_merge_unpartitioned_and_validation(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(path)

    delta = spark.createDataFrame([(3, 999), (50, 100)], "k long, v long")
    stats = merge_upsert(spark, path, delta, key_cols=["k"])
    assert stats["partitions_touched"] == stats["partitions_total"] == 1
    rows = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert rows[3] == 999 and rows[50] == 100 and len(rows) == 11

    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(
            spark, path, delta.select("k"), key_cols=["k"]
        )
    with pytest.raises(FileNotFoundError):
        merge_upsert(spark, str(tmp_path / "nope"), delta, key_cols=["k"])


def test_merge_prunes_target_scan(spark, seeded_table):
    """The slice read during a merge carries an isin partition filter —
    verify via the same plan the operator builds."""
    target = spark.read.parquet(seeded_table)
    plan = (
        target.filter(F.col("lang").isin(["en"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "lang" in plan


def test_merge_escaped_partition_values(spark, tmp_path):
    """Partition values needing Hive path-escaping (':' -> %3A) must be
    swapped correctly — the merge derives directory names with Spark's
    own escaper, and its safety net raises rather than silently losing
    a rewritten partition."""
    path = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [(1, "v1", "a:b"), (2, "v2", "plain")],
        "k long, body string, part string",
    )
    df.repartition(1).write.partitionBy("part").parquet(path)
    assert (Path(path) / "part=a%3Ab").exists()

    delta = spark.createDataFrame(
        [(1, "v1-new", "a:b", False), (3, "v3", "x/y", False)],
        "k long, body string, part string, deleted boolean",
    )
    stats = merge_upsert(
        spark, path, delta, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    assert stats["partitions_touched"] == 2
    rows = {r.k: (r.body, r.part) for r in spark.read.parquet(path).collect()}
    assert rows == {
        1: ("v1-new", "a:b"),
        2: ("v2", "plain"),
        3: ("v3", "x/y"),
    }
    assert (Path(path) / "part=x%2Fy").exists()


def test_merge_null_partition_value(spark, tmp_path):
    """NULL partition values (the __HIVE_DEFAULT_PARTITION__ dir) must
    merge, not be silently replaced: plain isin never matches NULL, so
    without the null-safe predicate the null partition's existing rows
    would vanish on any delta touching it."""
    path = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (3, "c", "en")],
        "k long, body string, part string",
    ).repartition(1).write.partitionBy("part").parquet(path)

    delta = spark.createDataFrame(
        [(9, "new-null", None, False), (1, "a-v2", None, False)],
        "k long, body string, part string, deleted boolean",
    )
    merge_upsert(
        spark, path, delta, key_cols=["k"], partition_col="part",
        delete_col="deleted",
    )
    rows = {r.k: (r.body, r.part) for r in spark.read.parquet(path).collect()}
    assert rows == {
        1: ("a-v2", None),
        2: ("b", None),  # the pre-existing null-partition row SURVIVES
        3: ("c", "en"),
        9: ("new-null", None),
    }


def test_merge_rejects_partition_moving_keys(spark, seeded_table):
    """A delta that moves a key to a different partition must raise —
    pruned rewriting would otherwise leave the stale old row behind as
    a silent duplicate."""
    delta = spark.createDataFrame(
        [(0, "moved", "de", False)],  # doc 0 lives in lang=en
        "doc_id long, body string, lang string, deleted boolean",
    )
    with pytest.raises(ValueError, match="moves existing key"):
        merge_upsert(
            spark, seeded_table, delta, key_cols=["doc_id"],
            partition_col="lang", delete_col="deleted",
        )
    # the guard is skipped (and moves impossible) when the partition
    # column is part of the key
    merge_upsert(
        spark, seeded_table, delta, key_cols=["doc_id", "lang"],
        partition_col="lang", delete_col="deleted",
    )
    out = spark.read.parquet(seeded_table)
    assert out.filter(F.col("doc_id") == 0).count() == 2  # both keys exist


@pytest.fixture()
def multi_part_table(spark, tmp_path):
    """(day, source)-partitioned table: the multi-level hive layout a
    production corpus actually uses."""
    path = str(tmp_path / "events2d")
    df = spark.range(60).select(
        F.col("id").alias("k"),
        F.concat(F.lit("b-"), F.col("id")).alias("body"),
        F.date_add(F.lit("2024-01-01"), (F.col("id") % 3).cast("int"))
        .cast("string")
        .alias("day"),
        F.element_at(
            F.array(F.lit("web"), F.lit("api")),
            (F.col("id") % 2 + 1).cast("int"),
        ).alias("source"),
    )
    df.repartition(2, "day", "source").write.partitionBy(
        "day", "source"
    ).parquet(path)
    return path


def test_multi_column_partition_merge_prunes_and_swaps_leaves(
    spark, multi_part_table
):
    """Merge into a (day, source) layout: only the touched LEAF
    directory is rewritten; every other leaf's files are untouched on
    disk, and pruning reaches the scan."""
    delta = spark.createDataFrame(
        [
            # k=0 lives in (2024-01-01, web): id%3=0, id%2=0
            (0, "updated", "2024-01-01", "web", False),  # existing key
            (600, "new", "2024-01-01", "web", False),  # insert
            (2, None, "2024-01-03", "web", True),  # tombstone (id%3=2)
        ],
        "k long, body string, day string, source string, deleted boolean",
    )
    before = _snapshot(multi_part_table)
    stats = merge_upsert(
        spark,
        multi_part_table,
        delta,
        key_cols=["k", "day", "source"],
        partition_col=["day", "source"],
        delete_col="deleted",
    )
    assert stats["partitions_touched"] == 2
    assert stats["partitions_total"] == 6
    assert stats["rows_upserted"] == 2 and stats["rows_deleted"] == 1

    after = _snapshot(multi_part_table)
    touched = ("day=2024-01-01/source=web", "day=2024-01-03/source=web")
    for rel, mtime in before.items():
        if not rel.startswith(touched):
            assert after[rel] == mtime, f"untouched leaf rewritten: {rel}"

    got = {r.k: r.body for r in spark.read.parquet(multi_part_table).collect()}
    assert got[0] == "updated" and got[600] == "new" and 2 not in got
    assert len(got) == 60  # 60 - 1 delete + 1 insert

    # pruning is plan-visible: the touched-tuple filter reaches
    # PartitionFilters (not a post-scan Filter)
    target = spark.read.parquet(multi_part_table)
    from csce438_distributed_password_cracker_spark.operators.merge import (
        partition_tuple_pred,
    )

    plan = (
        target.filter(
            partition_tuple_pred(
                ["day", "source"], [("2024-01-01", "api")]
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan


def test_multi_column_partition_moving_key_detected(spark, multi_part_table):
    """A delta that relocates an existing key to a different (day,
    source) tuple must raise, not leave a stale duplicate."""
    delta = spark.createDataFrame(
        [(0, "moved", "2024-01-02", "web", False)],
        "k long, body string, day string, source string, deleted boolean",
    )
    # k=0 lives in day=2024-01-01/source=api; keying by k alone lets it move
    with pytest.raises(ValueError, match="moves existing key"):
        merge_upsert(
            spark,
            multi_part_table,
            delta,
            key_cols=["k"],
            partition_col=["day", "source"],
            delete_col="deleted",
        )


def test_escape_path_name_matches_spark_rendering(spark, tmp_path):
    """Partition values needing hive escaping (':', '/', '%', '#') map
    to the exact directories Spark writes, so the swap set derivation
    agrees with the writer — pinned by merging such a table."""
    from csce438_distributed_password_cracker_spark.operators.merge import (
        escape_path_name,
        partition_rel_dir,
    )

    path = str(tmp_path / "weird")
    vals = ["a:b", "a/b", "50%", "x#y", "plain", "sp ace"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, part string"
    )
    df.repartition(1).write.partitionBy("part").parquet(path)
    written = {
        p.name for p in Path(path).iterdir() if p.name.startswith("part=")
    }
    derived = {partition_rel_dir(["part"], (v,)) for v in vals}
    assert derived == written

    # escaping round-trip basics
    assert escape_path_name("a:b") == "a%3Ab"
    assert escape_path_name("a/b") == "a%2Fb"
    assert escape_path_name("plain") == "plain"

    # and the merge itself works against the escaped layout
    delta = spark.createDataFrame(
        [(0, "a:b"), (99, "a/b")], "k long, part string"
    )
    stats = merge_upsert(
        spark, path, delta, key_cols=["k", "part"], partition_col="part"
    )
    assert stats["partitions_touched"] == 2
    assert spark.read.parquet(path).count() == 7


def test_rendering_mismatch_aborts_before_any_rename(spark, tmp_path):
    """If the derived swap set disagrees with what Spark wrote, the
    merge must abort with the TARGET FULLY INTACT (no half-merged
    state) — pinned by faking a divergent rendering."""
    import csce438_distributed_password_cracker_spark.operators.merge as M

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"b{i}", str(i % 2)) for i in range(8)],
        "k long, body string, part string",
    )
    df.repartition(1).write.partitionBy("part").parquet(path)
    before = _snapshot(path)

    delta = spark.createDataFrame([(0, "new", "0")], "k long, body string, part string")
    real = M.partition_rel_dir

    def broken(cols, values):
        return real(cols, tuple(f"{v}XX" for v in values))

    orig = M.partition_rel_dir
    M.partition_rel_dir = broken
    try:
        with pytest.raises(RuntimeError, match="outside the derived swap set"):
            merge_upsert(
                spark, path, delta, key_cols=["k", "part"],
                partition_col="part",
            )
    finally:
        M.partition_rel_dir = orig
    # target untouched, temp dirs cleaned
    assert _snapshot(path) == before
    assert not list(Path(path).parent.glob("*.__merge_tmp__"))


def test_empty_string_partition_value_merges_with_null_rows(spark, tmp_path):
    """'' and NULL partition values share __HIVE_DEFAULT_PARTITION__
    (Spark reads both back as NULL): a delta with '' must MERGE with the
    stored NULL-partition rows, not swap their directory away unread."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "keepme", None), (2, "plain", "a")],
        "k long, body string, part string",
    )
    df.repartition(1).write.partitionBy("part").parquet(path)

    delta = spark.createDataFrame(
        [(3, "new-empty", "")], "k long, body string, part string"
    )
    merge_upsert(spark, path, delta, key_cols=["k", "part"],
                 partition_col="part")
    got = {r.k: (r.body, r.part) for r in spark.read.parquet(path).collect()}
    # stored NULL-partition row SURVIVES alongside the new row
    assert got[1] == ("keepme", None)
    assert got[3] == ("new-empty", None)  # '' reads back as NULL
    assert got[2] == ("plain", "a")
    assert len(got) == 3

"""Z-order clustering (operators/zorder.py): Morton key closed form,
measurable footer-pruning wins vs a linear sort on the same data, and
the files_hit skipping count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import zorder


def test_morton_key_closed_form(spark):
    # 2 cols x 2 bits over value range [0, 3]: cell == value, so the
    # Morton key is the classic bit interleave
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    z = zorder.zorder_value(df, ["x", "y"], bits=2)
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", z).collect()
    }

    def morton(x, y):
        out = 0
        for i in range(2):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert got == {
        (x, y): morton(x, y) for x in range(4) for y in range(4)
    }
    # locality: the four cells of each 2x2 quadrant are contiguous
    assert sorted(got[(x, y)] for x in (0, 1) for y in (0, 1)) == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        zorder.zorder_value(df, ["x"] * 5)
    with pytest.raises(ValueError):
        zorder.zorder_value(df, ["x", "y"], bits=32)


def test_zorder_beats_linear_sort_on_both_dims(spark, tmp_path):
    """The point of the layout: a linear sort gives one tight column
    and one full-range column; z-order keeps BOTH well under full
    range, and a point-range predicate on the second column opens a
    fraction of the files instead of all of them."""
    n = 40_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 200).cast("long").alias("a"),
            (F.floor(F.col("id") / 200) % 200).cast("long").alias("b"),
        )
        .repartition(8)
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "l")
    zorder.write_zordered(df, zpath, ["a", "b"], num_files=16)
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.parquet(lpath)
    )
    zs = zorder.skipping_stats(zpath, ["a", "b"])
    ls = zorder.skipping_stats(lpath, ["a", "b"])
    # linear: tight on a, useless on b
    assert ls["a"] < 0.2
    assert ls["b"] > 0.9
    # z-order: BOTH dims well under full coverage (sqrt(16)=4 splits
    # per dim in the ideal grid; allow generous slack)
    assert zs["a"] < 0.5 and zs["b"] < 0.5, zs
    # a narrow predicate on b: linear opens every file, z-order a few
    zhit, ztot = zorder.files_hit(zpath, "b", 10, 15)
    lhit, ltot = zorder.files_hit(lpath, "b", 10, 15)
    assert ztot == ltot == 16
    assert lhit == 16
    assert zhit <= 8, (zhit, ztot)
    # correctness: both layouts hold exactly the same rows
    za = spark.read.parquet(zpath)
    assert za.count() == n
    assert za.groupBy().agg(F.sum("a"), F.sum("b")).first() == (
        df.groupBy().agg(F.sum("a"), F.sum("b")).first()
    )


def test_zorder_on_events_table(spark, sf_smoke, tmp_path):
    from csce438_distributed_password_cracker_spark.catalog import load_table

    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("t"), "value"
    )
    path = str(tmp_path / "ev")
    zorder.write_zordered(ev, path, ["user_id", "t"], num_files=8)
    stats = zorder.skipping_stats(path, ["user_id", "t"])
    assert stats["user_id"] < 0.75 and stats["t"] < 0.75, stats
    assert spark.read.parquet(path).count() == ev.count()

"""Deterministic fault injection (streaming/faults.py): replayable
drop/duplicate/delay decisions, rate concentration, the portable-SQL
twin (Spark operator ≡ DuckDB re-derivation), map-only plan shape, and
batch≡stream application."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.streaming.faults import (
    faulted_view_sql,
    inject_faults,
)

N = 4000


def _events(spark, n=N):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        (
            F.lit(datetime.datetime(2024, 1, 1))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("ts"),
        (F.col("id") * 2).cast("double").alias("value"),
    )


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


@pytest.mark.parametrize("mode", ["production", "portable"])
def test_deterministic_replay_and_schema(spark, mode):
    df = _events(spark)
    kw = dict(
        key_cols=["event_id"], drop_frac=0.2, dup_frac=0.1,
        delay_frac=0.1, delay_seconds=3600, ts_col="ts",
        seed="s1", hash_mode=mode,
    )
    a, b = inject_faults(df, **kw), inject_faults(df, **kw)
    assert a.columns == df.columns
    assert a.schema == df.schema
    assert _multiset(a) == _multiset(b)
    # a different seed draws a different pattern
    c = inject_faults(df, **{**kw, "seed": "s2"})
    assert _multiset(c) != _multiset(a)


@pytest.mark.parametrize("mode", ["production", "portable"])
def test_rates_concentrate(spark, mode):
    df = _events(spark)
    out = inject_faults(
        df, ["event_id"], drop_frac=0.2, dup_frac=0.1, seed="r", hash_mode=mode
    )
    rows = out.collect()
    ids = [r["event_id"] for r in rows]
    survivors = set(ids)
    n_dropped = N - len(survivors)
    n_dups = len(ids) - len(survivors)
    # binomial(4000, .2) sd ≈ 25 → ±5 sd bounds; dup over survivors
    assert abs(n_dropped - 0.2 * N) < 130, n_dropped
    assert abs(n_dups - 0.1 * len(survivors)) < 100, n_dups
    # duplicates are byte-identical, exactly one extra copy
    from collections import Counter

    by_id = Counter(ids)
    assert set(by_id.values()) <= {1, 2}
    full = Counter(tuple(r) for r in rows)
    for k, c in full.items():
        assert c <= 2


def test_delay_shifts_whole_key(spark):
    df = _events(spark, 1000)
    out = inject_faults(
        df, ["event_id"], dup_frac=0.3, delay_frac=0.5, delay_seconds=7200,
        ts_col="ts", seed="d", hash_mode="production",
    )
    orig = {r["event_id"]: r["ts"] for r in df.collect()}
    shifted, unshifted = set(), set()
    for r in out.collect():
        delta = (r["ts"] - orig[r["event_id"]]).total_seconds()
        assert delta in (0.0, 7200.0), delta
        (shifted if delta else unshifted).add(r["event_id"])
    # one draw per key: no key appears both shifted and unshifted
    assert not (shifted & unshifted)
    assert abs(len(shifted) - 500) < 120


def test_portable_twin_matches_duckdb(spark):
    """The gate contract: inject_faults(portable) over a table is
    multiset-equal to faulted_view_sql run by DuckDB on the same rows —
    the identical md5 decision math in both engines."""
    import duckdb

    df = _events(spark, 1500).select("event_id", "user_id", "value")
    got = inject_faults(
        df, ["event_id"], drop_frac=0.25, dup_frac=0.15, seed="g",
        hash_mode="portable",
    )
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    sql = faulted_view_sql(
        "events", "concat_ws(':', CAST(event_id AS STRING))",
        drop_frac=0.25, dup_frac=0.15, seed="g",
    )
    want = con.execute(sql).fetchall()
    from collections import Counter

    assert _multiset(got) == Counter(tuple(r) for r in want)
    # and the SAME SQL string also runs through Spark (dialect overlap)
    df.createOrReplaceTempView("events")
    spark_sql = spark.sql(sql)
    assert _multiset(spark_sql) == _multiset(got)


def test_portable_twin_with_delay_matches_duckdb(spark):
    """Full triple twin: drop + dup + delay (CASE-shifted ts over an
    explicit column list, since Spark lacks SELECT * REPLACE) — the
    operator's rows multiset-equal DuckDB's AND Spark's run of the
    same SQL string."""
    import duckdb

    df = _events(spark, 1200)
    kw = dict(drop_frac=0.2, dup_frac=0.1, seed="t3")
    got = inject_faults(
        df, ["event_id"], delay_frac=0.3, delay_seconds=5400, ts_col="ts",
        hash_mode="portable", **kw,
    )
    sql = faulted_view_sql(
        "events", "concat_ws(':', CAST(event_id AS STRING))",
        delay_frac=0.3, delay_seconds=5400, ts_col="ts",
        cols=("event_id", "user_id", "ts", "value"), **kw,
    )
    con = duckdb.connect()
    con.register("events", df.toPandas())
    from collections import Counter

    want = Counter(tuple(r) for r in con.execute(sql).fetchall())
    assert _multiset(got) == want
    df.createOrReplaceTempView("events")
    assert _multiset(spark.sql(sql)) == _multiset(got)
    # the shift really happened for ~30% of survivors
    orig = {r["event_id"]: r["ts"] for r in df.collect()}
    n_shift = sum(
        1 for r in got.collect() if (r["ts"] - orig[r["event_id"]]).total_seconds()
    )
    assert n_shift > 0.15 * 1200


def test_map_only_plan(spark):
    out = inject_faults(
        _events(spark), ["event_id"], drop_frac=0.1, dup_frac=0.1,
        delay_frac=0.1, delay_seconds=60, ts_col="ts",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


@pytest.mark.parametrize("mode", ["production", "portable"])
def test_null_keys_consistent_not_exempt(spark, mode):
    # NULL key components hash as empty string (concat_ws skips NULLs) in
    # BOTH modes: every all-NULL-key row shares ONE draw — consistent,
    # never an accidental exemption.  Replay stays deterministic.
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (3, 3.0)], "k int, v double"
    )
    a = inject_faults(df, ["k"], drop_frac=0.5, seed="n", hash_mode=mode)
    b = inject_faults(df, ["k"], drop_frac=0.5, seed="n", hash_mode=mode)
    assert _multiset(a) == _multiset(b)
    kept_null = {r["v"] for r in a.collect() if r["k"] is None}
    assert kept_null in (set(), {1.0, 2.0})  # one draw for both
    # and the NULL draw equals the empty-string key's draw: a row whose
    # key IS '' must share the NULL rows' disposition under the same seed
    df2 = spark.createDataFrame([("", 9.0)], "k string, v double")
    kept_empty = {
        r["v"]
        for r in inject_faults(
            df2, ["k"], drop_frac=0.5, seed="n", hash_mode=mode
        ).collect()
    }
    assert (kept_empty == {9.0}) == (kept_null == {1.0, 2.0})


def test_fault_marker_column_collision(spark):
    # an input column literally named __fault_n must survive duplication
    # untouched (the injector derives a collision-free temp marker)
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(200)], "event_id int, __fault_n int"
    )
    out = inject_faults(df, ["event_id"], dup_frac=0.3, seed="c")
    assert out.columns == df.columns
    vals = {(r["event_id"], r["__fault_n"]) for r in out.collect()}
    assert vals == {(i, i * 10) for i in range(200)}


def test_view_sql_custom_out_name(spark):
    # faulted_view_sql must honor out_name end-to-end (the final SELECT
    # used to hardcode events_faulted)
    df = _events(spark, 300)
    df.createOrReplaceTempView("events")
    sql = faulted_view_sql(
        "events", "concat_ws(':', CAST(event_id AS STRING))",
        drop_frac=0.2, dup_frac=0.1, seed="o", out_name="my_cte",
    )
    assert "my_cte" in sql
    got = _multiset(spark.sql(sql))
    want = _multiset(
        inject_faults(
            df, ["event_id"], drop_frac=0.2, dup_frac=0.1, seed="o",
            hash_mode="portable",
        )
    )
    assert got == want


def test_validation(spark):
    df = _events(spark, 10)
    with pytest.raises(ValueError, match="drop_frac"):
        inject_faults(df, ["event_id"], drop_frac=1.5)
    with pytest.raises(ValueError, match="hash_mode"):
        inject_faults(df, ["event_id"], drop_frac=0.1, hash_mode="fast")
    with pytest.raises(ValueError, match="key_cols"):
        inject_faults(df, [], drop_frac=0.1)
    with pytest.raises(ValueError, match="delay"):
        inject_faults(df, ["event_id"], delay_frac=0.1)  # no ts_col/seconds


def test_acceptor_detects_injected_faults_live(spark, tmp_path):
    """The reference's chaos loop, end to end on the live path: a clean
    seqnum stream goes through the loss injector INSIDE the stream and
    then through the stateful acceptor (lsp_server.c:241-249 analog) —
    whose verdicts must equal a Python replay of the acceptance rule
    over the deterministic faulted multiset.  Injected duplicates
    surface as 'duplicate', injected drops as 'gap' verdicts."""
    from csce438_distributed_password_cracker_spark.streaming import stateful

    df = spark.range(120).select(
        (F.col("id") % 4).alias("connid"),
        (F.col("id") / 4 + 1).cast("long").alias("seqnum"),
    )
    src = str(tmp_path / "msgs")
    df.coalesce(1).write.parquet(src)  # one file → one micro-batch
    kw = dict(
        key_cols=["connid", "seqnum"], drop_frac=0.15, dup_frac=0.2,
        seed="chaos", hash_mode="production",
    )

    # expected: replay the acceptor's rule (per conn, sorted) over the
    # batch-side injection — deterministic, same decisions as the stream
    faulted = inject_faults(spark.read.parquet(src), **kw).collect()
    per_conn: dict[int, list[int]] = {}
    for r in faulted:
        per_conn.setdefault(r["connid"], []).append(r["seqnum"])
    expected = set()
    for conn, seqs in per_conn.items():
        last = 0
        for s in sorted(seqs):
            if s == last + 1:
                expected.add((conn, s, "accepted"))
                last = s
            elif s <= last:
                expected.add((conn, s, "duplicate"))
            else:
                expected.add((conn, s, "gap"))
    assert any(st == "duplicate" for _, _, st in expected)
    assert any(st == "gap" for _, _, st in expected)

    stream = spark.readStream.schema(df.schema).parquet(src)
    audited = stateful.seqnum_accept_stream(inject_faults(stream, **kw))
    q = (
        audited.writeStream.format("memory")
        .queryName("fault_audit_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["connid"], r["seqnum"], r["status"])
        for r in spark.sql("SELECT * FROM fault_audit_test").collect()
    }
    assert got == expected


def test_stream_equals_batch(spark, tmp_path):
    """Stateless narrow transforms must behave identically under
    Structured Streaming: the injector applied inside a file-source
    stream yields exactly the batch application's rows."""
    src = str(tmp_path / "src")
    df = _events(spark, 800)
    df.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    faulted = inject_faults(
        stream, ["event_id"], drop_frac=0.2, dup_frac=0.1, seed="sv",
        hash_mode="production",
    )
    sink = str(tmp_path / "sink")
    q = (
        faulted.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _multiset(spark.read.parquet(sink))
    want = _multiset(
        inject_faults(
            spark.read.parquet(src), ["event_id"], drop_frac=0.2,
            dup_frac=0.1, seed="sv", hash_mode="production",
        )
    )
    assert got == want

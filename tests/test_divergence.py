"""Divergence asserts (SURVEY.md §4.3 / §5.2.4): each reference defect has
a test proving the engine's behavior is the *intended* semantics, not the
defect.

Defect 2 (worker death ⇒ subrange silently lost ⇒ possible false 'x',
server.c:257-267 + empty sched_thread_run server.c:441-443): Spark
reschedules failed tasks, so a mid-scan crash yields the correct answer.
Needs task retries (local[N, maxFailures]), so it runs in a subprocess
with its own session.

Defect 3 (uint32 keyspace ordinal overflow at width ≥ 7, server.c:199-209):
the engine's int64 codec is exact far beyond 2³².
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.functions import codec

RETRY_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from csce438_distributed_password_cracker_spark.operators.crack import crack

    # local[4, 2]: 4 threads, task maxFailures=2 -> failed tasks rerun
    spark = (
        SparkSession.builder.master("local[4, 2]")
        .appName("divergence-worker-death")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import functions as F
    from csce438_distributed_password_cracker_spark.sources.keyspace import keyspace

    # kill the first attempt of partition 0 mid-scan (the reference's dead
    # worker); the retry must still find the answer in that subrange
    def flaky(batches):
        ctx = TaskContext.get()
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            raise RuntimeError("simulated worker death (epoch timeout)")
        for b in batches:
            yield b

    ks = keyspace(spark, 3).repartition(4).mapInPandas(flaky, "candidate string")
    # 'aaa' lives in the killed partition's range ordinal-wise; after
    # repartition we only know SOME partition died — the point is the scan
    # still covers the full space afterwards.
    n = ks.count()
    assert n == 26**3, f"retry lost rows: {n}"
    hit = ks.filter(
        F.sha1("candidate")
        == "bcfd32e429fce945c2d1c6ea96e954189b4bb671"  # sha1('qed')
    ).collect()
    assert [r["candidate"] for r in hit] == ["qed"], hit
    print("RETRY_OK")
    spark.stop()
    """
)


def test_worker_death_is_retried_not_false_x():
    proc = subprocess.run(
        [sys.executable, "-c", RETRY_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRY_OK" in proc.stdout, proc.stderr[-2000:]


def test_codec_exact_beyond_uint32(spark):
    """Width-8 ordinals exceed 2³² (26⁸ ≈ 2.09e11); the reference's uint32
    codec wraps there — the engine must not."""
    probes = [0, 2**32 + 12345, 26**8 - 1]

    def py_decode(n: int, width: int = 8) -> str:
        out = []
        for _ in range(width):
            out.append(chr(97 + n % 26))
            n //= 26
        return "".join(reversed(out))

    df = spark.createDataFrame([(p,) for p in probes], "id LONG").select(
        "id",
        F.expr(codec.decode_sql("id", 8)).alias("s"),
    )
    df = df.select(
        "id", "s", F.expr(codec.encode_sql("s", 8)).alias("rt")
    )
    for r in df.collect():
        assert r["s"] == py_decode(r["id"]), r
        assert r["rt"] == r["id"], r

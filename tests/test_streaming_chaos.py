"""Chaos / loss-injection analog over the LIVE streaming path (SURVEY.md
§5.1: the reference's only transport test is `drop_rate=0.5` loss
injection, lsp_common.c:6-95).

The Spark analog of a dropped/dead worker mid-request is a task failure
inside a streaming micro-batch: we kill the first attempt of one keyspace
scan partition during the foreachBatch crack kernel and assert Spark's
task retry masks it — the sink holds exactly the verdicts an undisturbed
batch run produces (the reference, by contrast, can reply a false 'x'
when a worker dies, server.c:257-267 + the empty sched_thread_run).

Needs task retries (`local[N, maxFailures]`), so it runs in a subprocess
with its own session, like tests/test_divergence.py.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

CHAOS_SCRIPT = textwrap.dedent(
    """
    import hashlib
    import json
    import shutil
    import sys
    import tempfile

    sys.path.insert(0, "/root/repo")
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4, 2]")
        .appName("streaming-chaos")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import csce438_distributed_password_cracker_spark.streaming.requests as R

    retries = spark.sparkContext.accumulator(0)
    orig_keyspace = R.keyspace

    def chaos_keyspace(spark, width, *a, **k):
        ks = orig_keyspace(spark, width, *a, **k)

        def flaky(batches):
            ctx = TaskContext.get()
            if ctx.partitionId() == 0:
                if ctx.attemptNumber() == 0:
                    # accumulator updates of FAILED tasks are discarded
                    # (exactly-once), so the marker is recorded by the
                    # retry attempt below, which only exists because this
                    # attempt died
                    raise RuntimeError("simulated worker death mid-batch")
                retries.add(1)
            for b in batches:
                yield b

        return ks.mapInPandas(flaky, ks.schema)

    R.keyspace = chaos_keyspace  # inject into the foreachBatch kernel

    hit = hashlib.sha256(b"qed").hexdigest()
    miss = hashlib.sha256(b"NOPE!").hexdigest()
    src = tempfile.mkdtemp(prefix="chaos_src_")
    ckpt = tempfile.mkdtemp(prefix="chaos_ckpt_")
    with open(src + "/reqs.json", "w") as f:
        f.write(json.dumps({"request_id": 1, "hash": hit, "width": 3}) + "\\n")
        f.write(json.dumps({"request_id": 2, "hash": miss, "width": 3}) + "\\n")

    spark.sql("DROP TABLE IF EXISTS chaos_verdicts")
    # a previous run's managed-table directory outlives its catalog entry
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(wh + "/chaos_verdicts", ignore_errors=True)
    q = R.start_request_stream(
        spark, src, ckpt, sink_table="chaos_verdicts",
        hash_func="sha256", available_now=True,
    )
    q.awaitTermination()
    rows = {
        r["request_id"]: (r["found"], r["password"], r["reply"])
        for r in spark.table("chaos_verdicts").collect()
    }
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    assert retries.value >= 1, "chaos injection never fired"
    assert rows[1] == (True, "qed", "f qed"), rows
    assert rows[2] == (False, None, "x"), rows
    print("CHAOS_OK retried_tasks=%d" % retries.value)
    """
)


def test_stream_survives_injected_task_failure():
    out = subprocess.run(
        [sys.executable, "-c", CHAOS_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "CHAOS_OK" in out.stdout, out.stdout + out.stderr

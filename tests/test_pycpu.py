"""Python-side CPU accounting (plans/pycpu.py): the §C.18 second bench
column must see driver AND worker Python CPU, never another process
tree's, and never shrink."""

from __future__ import annotations

import subprocess
import sys
import time

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from csce438_distributed_password_cracker_spark.plans.pycpu import PythonCpuTracker


def test_driver_cpu_attributed():
    tr = PythonCpuTracker()
    t0 = time.process_time()
    x = 0
    while time.process_time() - t0 < 0.3:
        x += 1
    d = tr.delta()
    assert d >= 0.25, f"driver burn under-reported: {d}"


def test_monotone_and_idle_near_zero():
    tr = PythonCpuTracker()
    a = tr.snapshot()
    time.sleep(0.2)  # idle wall time is NOT CPU time
    b = tr.snapshot()
    assert b >= a
    assert b - a < 0.15, f"idle window charged {b - a}s of CPU"


def test_reaped_foreign_subprocess_not_counted():
    """A non-pyspark child we spawn and reap must not inflate the
    number: its CPU folds into OUR cutime, which the tracker
    deliberately excludes (self cutime would also include the JVM)."""
    tr = PythonCpuTracker()
    tr.delta()
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import time\nt0=time.process_time()\n"
            "while time.process_time()-t0<0.4: pass",
        ],
        check=True,
    )
    d = tr.delta()
    assert d < 0.3, f"reaped non-daemon child's 0.4s CPU leaked in: {d}"


def test_worker_cpu_attributed_and_jvm_query_cheap(spark):
    """An Arrow (pandas_udf) stage's Python CPU lands in the delta of
    ITS window; a JVM-only shuffle query's window stays near zero.
    This is exactly the blind spot §C.18 closes: executorCpuTime sees
    the second query, only this tracker sees the first."""

    @pandas_udf("double")
    def burn(v: pd.Series) -> pd.Series:
        import math

        s = 0.0
        for x in v:
            for i in range(120):
                s += math.sin(x + i)
        return v * 0 + s

    # warm the daemons so fork/import cost doesn't blur attribution
    spark.range(1000).select(
        burn(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()

    tr = PythonCpuTracker()
    tr.delta()

    spark.range(150_000).select(
        burn(F.col("id").cast("double")).alias("b")
    ).write.format("noop").mode("overwrite").save()
    d_arrow = tr.delta()

    spark.range(2_000_000).select((F.col("id") % 97).alias("k")).groupBy(
        "k"
    ).count().write.format("noop").mode("overwrite").save()
    d_jvm = tr.delta()

    assert d_arrow > 1.0, f"worker CPU missed: arrow window {d_arrow}s"
    assert d_jvm < d_arrow / 3, (
        f"JVM-only window charged {d_jvm}s vs arrow {d_arrow}s — "
        "attribution is bleeding across windows"
    )


def test_snapshot_detail_scope_and_components(spark):
    tr = PythonCpuTracker()
    d = tr.snapshot_detail()
    assert d["scope"] == "tree"  # Linux container: /proc is there
    assert d["driver"] > 0.0
    assert d["workers"] >= 0.0 and d["reaped"] >= 0.0

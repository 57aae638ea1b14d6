from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csce438_distributed_password_cracker_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Small core count + tiny shuffle partitioning: test suites run many tiny
    # jobs; 8 threads keeps JVM startup/scheduling overhead low.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    s = get_spark(app_name="pwdcrack-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE


def fresh_sink(spark, name: str) -> str:
    """Drop a managed sink table AND its leftover warehouse location (a
    crashed earlier run leaves the dir behind after the DROP, and
    saveAsTable refuses to reuse it).  Shared by every streaming-ingest
    test that writes a saveAsTable sink."""
    import shutil
    from pathlib import Path

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = Path(
        spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
    )
    loc = wh / name
    if loc.exists():
        shutil.rmtree(loc)
    return name

"""Every registered query vs the DuckDB oracle at sf0.001 (fast local gate;
the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from csce438_distributed_password_cracker_spark.oracle import compare_query
from csce438_distributed_password_cracker_spark.plans import corpus


@pytest.mark.parametrize("name", sorted(corpus.REGISTRY))
def test_query_matches_oracle(spark, sf_smoke, name):
    res = compare_query(spark, name, sf_smoke)
    assert res.ok, f"{name}: {res.detail}"

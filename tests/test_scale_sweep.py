"""Planted-truth at-scale checks (tools/scale_sweep.py): the rig's
check functions must (a) pass on a corpus the generator just made, and
(b) actually detect corruption — a checker that can't fail is not
evidence.  Runs on a tiny derived corpus (sf0.001 × 4) so the suite
stays fast; the real runs happen at .scale/sf1 via the CLI."""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

import gen_scale_corpus as g  # noqa: E402
import scale_sweep as sw  # noqa: E402
from conftest import SF_SMOKE  # noqa: E402

if not os.path.isdir(SF_SMOKE):  # pragma: no cover - layout guard
    pytest.skip("smoke corpus missing", allow_module_level=True)


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("scale_tiny")
    rng = np.random.default_rng(g.SEED)
    docs, dt = g.gen_documents(SF_SMOKE, 4, rng)
    pq.write_table(docs, out / "documents.parquet")
    emb, et = g.gen_embeddings(SF_SMOKE, 4, rng)
    pq.write_table(emb, out / "embeddings.parquet")
    shutil.copyfile(
        os.path.join(SF_SMOKE, "part.parquet"), out / "part.parquet"
    )
    truth = {"documents": dt, "embeddings": et}
    with open(out / "planted_truth.json", "w") as f:
        json.dump(truth, f)
    return str(out), truth


def test_planted_checks_pass_on_fresh_corpus(spark, tiny_corpus):
    sf_dir, truth = tiny_corpus
    ok, detail = sw.check_jaccard(spark, sf_dir, truth)
    assert ok, detail
    assert "planted recalled" in detail
    ok, detail = sw.check_components(spark, sf_dir, truth)
    assert ok, detail
    assert "union-find" in detail
    ok, detail = sw.check_knn(spark, sf_dir, truth)
    assert ok, detail


def test_knn_check_detects_corruption(spark, tiny_corpus, tmp_path):
    """Flip one planted neighbor to a random vector: the check must fail
    (otherwise it proves nothing)."""
    sf_dir, truth = tiny_corpus
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    shutil.copyfile(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(bad, "documents.parquet"),
    )
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    v = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    seed = int(next(iter(truth["embeddings"]["seed_neighbors"])))
    victim = truth["embeddings"]["seed_neighbors"][str(seed)][0]
    rng = np.random.default_rng(1)
    repl = rng.standard_normal(v.shape[1]).astype(np.float32)
    v[victim] = repl / np.linalg.norm(repl)
    t2 = t.set_column(
        t.schema.get_field_index("embedding"),
        "embedding",
        pa.array(list(v), type=pa.list_(pa.float32())),
    )
    pq.write_table(t2, os.path.join(bad, "embeddings.parquet"))
    ok, detail = sw.check_knn(spark, bad, truth)
    assert not ok and str(seed) in detail.replace(",", " ")


def test_components_check_detects_bad_labeling(spark, tiny_corpus, monkeypatch):
    """Sabotage connected_components both ways — split (self-labels)
    and spurious merge (all one label): the union-find comparison must
    reject BOTH; a fixed-point audit alone cannot see the merge case."""
    from pyspark.sql import functions as F

    from csce438_distributed_password_cracker_spark.operators import dedup

    sf_dir, truth = tiny_corpus

    def self_labels(ids, edges, **kw):
        return ids.select("id", F.col("id").alias("component_id"))

    monkeypatch.setattr(dedup, "connected_components", self_labels)
    ok, detail = sw.check_components(spark, sf_dir, truth)
    assert not ok and "union-find" in detail

    def merged_labels(ids, edges, **kw):
        # over-merge: every node labeled by the GLOBAL min id — constant
        # on every edge (a fixed point), but fuses unrelated components
        return ids.select(
            "id", F.lit(0).cast("long").alias("component_id")
        )

    monkeypatch.setattr(dedup, "connected_components", merged_labels)
    ok, detail = sw.check_components(spark, sf_dir, truth)
    assert not ok and "union-find" in detail

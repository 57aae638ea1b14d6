"""Sharded export (operators/export.py): roundtrip with validated
manifest, deterministic shard assignment, integrity failures surface
loudly, publish-is-last semantics, and caller-supplied shard columns."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import export
from csce438_distributed_password_cracker_spark.operators.split import (
    shuffle_rows,
)


def _docs(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "lang", "text"
    )


def test_roundtrip_with_manifest(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    path = str(tmp_path / "corpus")
    manifest = export.export_shards(docs, path, num_shards=8)
    assert manifest["total_rows"] == docs.count()
    assert len(manifest["shards"]) <= 8
    assert manifest["verified"] is True
    # hive layout: one dir per shard that received rows
    dirs = {p.name for p in (Path(path) / "data").iterdir() if p.is_dir()}
    assert dirs == {f"shard_id={s['shard']}" for s in manifest["shards"]}
    back = export.read_shards(spark, path)
    assert back.count() == docs.count()
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )


def test_shard_assignment_matches_shuffle_rows(spark, sf_smoke, tmp_path):
    """Shard membership is the deterministic global shuffle's —
    reproducible across sessions, so a re-export of the same corpus
    shards identically (resume / incremental append safety)."""
    docs = _docs(spark, sf_smoke)
    path = str(tmp_path / "corpus")
    export.export_shards(docs, path, num_shards=4)
    back = export.read_shards(spark, path)
    want = {
        r["doc_id"]: r["shard_id"]
        for r in shuffle_rows(docs, "doc_id", num_shards=4).collect()
    }
    assert all(
        want[r["doc_id"]] == int(r["shard_id"]) for r in back.collect()
    )
    # manifests of two exports of the same frame are identical
    path2 = str(tmp_path / "corpus2")
    m1 = json.loads((Path(path) / export.MANIFEST).read_text())
    m2 = export.export_shards(docs, path2, num_shards=4)
    assert m1["shards"] == m2["shards"]


def test_validation_catches_tampering(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke).limit(100)
    path = str(tmp_path / "corpus")
    export.export_shards(docs, path, num_shards=2)
    # delete one data file: counts/checksums drift
    victim = next((Path(path) / "data").glob("shard_id=*/part-*"))
    victim.unlink()
    with pytest.raises(export.ExportIntegrityError):
        export.read_shards(spark, path)
    # validate=False trusts the manifest (caller's explicit choice)
    assert export.read_shards(spark, path, validate=False).count() < 100


def test_no_manifest_means_no_trust(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke).limit(50)
    path = str(tmp_path / "corpus")
    export.export_shards(docs, path, num_shards=2)
    (Path(path) / export.MANIFEST).unlink()  # simulate crashed export
    with pytest.raises(FileNotFoundError):
        export.read_shards(spark, path)
    # and a published dir refuses a second export
    path2 = str(tmp_path / "c2")
    export.export_shards(docs, path2, num_shards=2)
    with pytest.raises(ValueError):
        export.export_shards(docs, path2, num_shards=2)


def test_caller_supplied_shard_column(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke).withColumn(
        "bucket", (F.col("doc_id") % 3).cast("int")
    )
    path = str(tmp_path / "corpus")
    m = export.export_shards(
        docs, path, num_shards=3, shard_col="bucket"
    )
    want = {
        int(r["bucket"]): r["n"]
        for r in docs.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert {s["shard"]: s["rows"] for s in m["shards"]} == want
    # out-of-range shard values fail before any write
    bad = docs.withColumn("bucket", F.lit(99))
    with pytest.raises(ValueError):
        export.export_shards(
            bad, str(tmp_path / "c3"), num_shards=3, shard_col="bucket"
        )


def test_param_validation(spark, sf_smoke, tmp_path):
    with pytest.raises(ValueError):
        export.export_shards(
            _docs(spark, sf_smoke), str(tmp_path / "x"), num_shards=0
        )


def test_repair_restores_tampered_shards(spark, sf_smoke, tmp_path):
    """Delete one shard's file and corrupt-by-truncation another: repair
    re-derives EXACTLY the broken shards from the source and the
    validated read works again."""
    docs = _docs(spark, sf_smoke)
    path = str(tmp_path / "corpus")
    export.export_shards(docs, path, num_shards=4)
    data = Path(path) / "data"
    victims = sorted(data.glob("shard_id=*/part-*"))[:1]
    victims[0].unlink()
    broken_dir = int(victims[0].parent.name.split("=")[1])
    with pytest.raises(export.ExportIntegrityError):
        export.read_shards(spark, path)
    repaired = export.repair_shards(docs, path)
    assert repaired == [broken_dir]
    back = export.read_shards(spark, path)  # validates again
    assert back.count() == docs.count()
    # nothing to repair on a healthy export
    assert export.repair_shards(docs, path) == []


def test_repair_refuses_wrong_source(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    path = str(tmp_path / "corpus")
    export.export_shards(docs, path, num_shards=2)
    victim = next((Path(path) / "data").glob("shard_id=*/part-*"))
    victim.unlink()
    wrong = docs.withColumn("text", F.upper("text"))
    with pytest.raises(export.ExportIntegrityError, match="refusing"):
        export.repair_shards(wrong, path)
    # the right source still fixes it afterwards
    assert len(export.repair_shards(docs, path)) == 1
    assert export.read_shards(spark, path).count() == docs.count()


def test_repair_requires_manifest(spark, sf_smoke, tmp_path):
    with pytest.raises(FileNotFoundError):
        export.repair_shards(
            _docs(spark, sf_smoke), str(tmp_path / "nothing")
        )


def test_export_rejects_shard_id_name_collision(spark, sf_smoke, tmp_path):
    """A pre-existing shard_id column must be a loud choice, never
    silently replaced (repair would then select wrong rows)."""
    docs = _docs(spark, sf_smoke).withColumn(
        "shard_id", (F.col("doc_id") % 2).cast("int")
    )
    with pytest.raises(ValueError, match="shard_id"):
        export.export_shards(docs, str(tmp_path / "x"))
    # the explicit form works and repair honors the caller column
    path = str(tmp_path / "y")
    export.export_shards(docs, path, num_shards=2, shard_col="shard_id")
    victim = next((Path(path) / "data").glob("shard_id=*/part-*"))
    victim.unlink()
    assert len(export.repair_shards(docs, path)) == 1
    assert export.read_shards(spark, path).count() == docs.count()

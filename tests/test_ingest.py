"""Schema-enforced ingestion (sources/ingest.py): CSV/JSON round-trips
against the parquet truth, quarantine semantics, FAILFAST, and the
bounded-file-count landing."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from csce438_distributed_password_cracker_spark.sources import ingest

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_csv_roundtrip_matches_parquet(spark, sf_smoke, tmp_path):
    truth = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    csv_dir = str(tmp_path / "docs_csv")
    # quoteAll: the text column contains commas/spaces
    truth.write.option("header", True).option("quoteAll", True).csv(csv_dir)
    got = ingest.ingest(
        spark, csv_dir, "csv", DOCS_SCHEMA, options={"header": "true"}
    )
    clean, bad = ingest.split_valid(got)
    assert bad.count() == 0
    assert _canon(clean) == _canon(truth)


def test_json_roundtrip_preserves_arrays(spark, sf_smoke, tmp_path):
    truth = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    json_dir = str(tmp_path / "emb_json")
    truth.write.json(json_dir)
    clean, bad = ingest.split_valid(
        ingest.ingest(spark, json_dir, "json", EMB_SCHEMA)
    )
    assert bad.count() == 0
    assert clean.schema["embedding"].dataType == ArrayType(FloatType())
    assert _canon(clean.select("vec_id", "label")) == _canon(
        truth.select("vec_id", "label")
    )
    # float32 array values survive the text round-trip exactly enough to
    # compare after a fixed rounding
    a = clean.select("vec_id", F.round(F.element_at("embedding", 1), 5).alias("v"))
    b = truth.select("vec_id", F.round(F.element_at("embedding", 1), 5).alias("v"))
    assert _canon(a) == _canon(b)


def test_permissive_quarantines_malformed_rows(spark, tmp_path):
    json_dir = str(tmp_path / "mixed_json")
    os.makedirs(json_dir)
    with open(f"{json_dir}/part-0.json", "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n')
        f.write("this is not json\n")
        f.write('{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n')
    clean, bad = ingest.split_valid(
        ingest.ingest(spark, json_dir, "json", DOCS_SCHEMA)
    )
    assert clean.count() == 2
    assert ingest.CORRUPT_COL not in clean.columns
    quarantined = [r[0] for r in bad.collect()]
    assert quarantined == ["this is not json"]


def test_failfast_raises_on_malformed(spark, tmp_path):
    json_dir = str(tmp_path / "bad_json")
    os.makedirs(json_dir)
    with open(f"{json_dir}/part-0.json", "w") as f:
        f.write('{"doc_id": 1}\n')
        f.write("not json either\n")
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        ingest.ingest(
            spark, json_dir, "json", DOCS_SCHEMA, mode="FAILFAST"
        ).collect()


def test_parquet_contract_prunes_and_nulls(spark, sf_smoke):
    """Against self-describing parquet the schema is a contract: extra
    source columns are pruned, missing requested columns read as
    null."""
    narrow = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("no_such_col", StringType()),
        ]
    )
    got = ingest.ingest(
        spark, f"{sf_smoke}/documents.parquet", "parquet", narrow
    )
    assert got.columns == ["doc_id", "no_such_col"]
    assert got.filter(F.col("no_such_col").isNotNull()).count() == 0
    assert got.count() == 500


def test_land_bounds_file_count(spark, sf_smoke, tmp_path):
    df = spark.read.parquet(f"{sf_smoke}/documents.parquet").repartition(37)
    out = str(tmp_path / "landed")
    ingest.land(df, out, max_output_files=4)
    files = glob.glob(f"{out}/*.parquet")
    assert 1 <= len(files) <= 4
    assert spark.read.parquet(out).count() == 500


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_orc_roundtrip_schema_contract(spark, tmp_path):
    """ORC rides the same self-describing contract as parquet: declared
    schema prunes extra columns and nulls missing ones."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from csce438_distributed_password_cracker_spark.sources import ingest as ing

    src = str(tmp_path / "drop.orc")
    spark.createDataFrame(
        [(1, "a", 9.0), (2, "b", 8.0)], "k long, s string, extra double"
    ).write.orc(src)

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("s", StringType()),
            StructField("missing", StringType()),
        ]
    )
    df = ing.ingest(spark, src, "orc", schema)
    assert df.columns == ["k", "s", "missing"]  # extra pruned, missing added
    rows = {r.k: (r.s, r.missing) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", None)}


def test_with_provenance_file_and_row_lineage(spark, tmp_path):
    """_metadata lineage: src_file names the real part file, src_row is
    the stable 0-based index within it (re-reads agree), and the
    columns are scan constants (no Exchange)."""
    from csce438_distributed_password_cracker_spark.sources.ingest import (
        with_provenance,
    )

    p = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "id * 2 AS v").repartition(
        4
    ).write.parquet(p)
    out = with_provenance(spark.read.parquet(p))
    rows = out.collect()
    assert len(rows) == 100
    by_file: dict = {}
    for r in rows:
        assert r["src_file"].endswith(".parquet") and "/t/" in r["src_file"]
        by_file.setdefault(r["src_file"], []).append(r["src_row"])
    # within each file: 0-based, contiguous, unique
    for idxs in by_file.values():
        assert sorted(idxs) == list(range(len(idxs)))
    # stable across re-reads
    again = {
        (r["id"], r["src_file"], r["src_row"])
        for r in with_provenance(spark.read.parquet(p)).collect()
    }
    assert again == {(r["id"], r["src_file"], r["src_row"]) for r in rows}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def _write_media_dir(root):
    """6 files under nested dirs: 2 PNG, 2 WAV, 2 opaque."""
    from csce438_distributed_password_cracker_spark.operators.multimodal import (
        png_encode,
        wav_encode,
    )

    (root / "img").mkdir(parents=True)
    (root / "aud" / "deep").mkdir(parents=True)
    files = {}
    for i in (0, 1):
        p = root / "img" / f"pic{i}.png"
        p.write_bytes(png_encode(3, 2, bytes((i * 31 + j) % 256 for j in range(6))))
        files[str(p)] = "png"
    for i in (0, 1):
        p = root / "aud" / "deep" / f"clip{i}.wav"
        p.write_bytes(wav_encode(8000, [(i * 7 + j * 13) % 2048 - 1024 for j in range(16)]))
        files[str(p)] = "wav"
    for i in (0, 1):
        p = root / f"blob{i}.bin"
        p.write_bytes(b"\x00opaque" + bytes([i]) * 10)
        files[str(p)] = None
    return files


def test_ingest_binary_sniffs_and_feeds_decode(spark, tmp_path):
    from csce438_distributed_password_cracker_spark.operators import multimodal
    from csce438_distributed_password_cracker_spark.sources.ingest import (
        ingest_binary,
    )

    files = _write_media_dir(tmp_path)
    media = ingest_binary(spark, str(tmp_path))
    rows = media.collect()
    assert len(rows) == 6
    # JVM-side sniff == the Python sniff on the same bytes, and matches
    # what was written
    for r in rows:
        path = r["path"].removeprefix("file:")
        assert r["media_type"] == files[path]
        assert r["media_type"] == multimodal.sniff(bytes(r["payload"]))
        assert r["length"] == len(bytes(r["payload"]))
    # doc_id: stable across re-reads, unique across files
    ids = {r["doc_id"] for r in rows}
    assert len(ids) == 6
    again = {r["doc_id"] for r in ingest_binary(spark, str(tmp_path)).collect()}
    assert again == ids
    # schema prefix matches MEDIA_SCHEMA -> decode_media runs directly
    decoded = {
        r["doc_id"]: r for r in multimodal.decode_media(media).collect()
    }
    kinds = {r["doc_id"]: r["media_type"] for r in rows}
    for did, d in decoded.items():
        if kinds[did] == "png":
            assert (d["width"], d["height"]) == (3, 2)
        elif kinds[did] == "wav":
            assert (d["sample_rate"], d["n_frames"]) == (8000, 16)
        else:
            assert d["media_type"] == "unknown"
    # sniff stays JVM-side: no Python evaluation node in the media plan
    plan = media._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_ingest_binary_glob_prunes_at_listing(spark, tmp_path):
    from csce438_distributed_password_cracker_spark.sources.ingest import (
        ingest_binary,
    )

    _write_media_dir(tmp_path)
    only_png = ingest_binary(spark, str(tmp_path), glob="*.png")
    assert only_png.count() == 2
    assert {r["media_type"] for r in only_png.collect()} == {"png"}
    flat = ingest_binary(spark, str(tmp_path), glob="*.bin", recursive=False)
    assert flat.count() == 2


def test_ingest_binary_empty_and_missing_edges(spark, tmp_path):
    """binaryFile has a FIXED schema, so empty dirs and no-match globs
    return 0 rows (no schema-inference failure); a missing path fails
    loudly rather than reading as empty."""
    import pytest
    from pyspark.errors import AnalysisException

    from csce438_distributed_password_cracker_spark.sources.ingest import (
        ingest_binary,
    )

    empty = tmp_path / "empty"
    empty.mkdir()
    assert ingest_binary(spark, str(empty)).count() == 0
    (empty / "a.txt").write_text("x")
    assert ingest_binary(spark, str(empty), glob="*.png").count() == 0
    with pytest.raises(AnalysisException):
        ingest_binary(spark, str(tmp_path / "missing")).count()

"""Source/sink coverage: partitioned parquet writes with partition
pruning, CSV and JSON round-trips.  The reference has no file I/O at all
(SURVEY.md §2.1) — this is engine-completeness surface, and the partition
pruning assertion is a 100 TB design check: a date/key-partitioned layout
is what makes selective scans cheap at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.catalog import load_table

from test_plans import plan_str


def test_partitioned_parquet_write_and_pruning(spark, sf_oracle, tmp_path):
    out = str(tmp_path / "orders_by_priority")
    orders = load_table(spark, sf_oracle, "orders")
    orders.write.partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    pruned = back.filter(F.col("o_orderpriority") == "1-URGENT")
    p = plan_str(spark, pruned)
    # the filter must become a PartitionFilter (directory pruning), not a
    # data filter evaluated per row
    assert "PartitionFilters" in p and "1-URGENT" in p.split("PartitionFilters", 1)[1].splitlines()[0]
    expected = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert pruned.count() == expected


def test_csv_roundtrip(spark, sf_oracle, tmp_path):
    out = str(tmp_path / "nation_csv")
    nation = load_table(spark, sf_oracle, "nation")
    nation.write.option("header", True).csv(out)
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_json_roundtrip(spark, sf_oracle, tmp_path):
    out = str(tmp_path / "region_json")
    region = load_table(spark, sf_oracle, "region")
    region.write.json(out)
    back = spark.read.json(out).select(*region.columns)  # json sorts keys
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, region.collect()))


def test_events_ts_layout_drift(spark, tmp_path):
    """The driver regenerates testdata between rounds and events.ts has
    shipped as BOTH parquet TIMESTAMP(NANOS) (readable only via
    nanosAsLong → int64) and TIMESTAMP(MICROS) (reads as a timestamp
    directly).  load_table must normalize either layout to the same
    queryable timestamp values instead of assuming one."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = {
        "event_id": [1, 2, 3],
        "ts": [
            datetime.datetime(2026, 1, 1, 12, 0, 0),
            datetime.datetime(2026, 1, 1, 12, 30, 0),
            datetime.datetime(2026, 1, 2, 0, 15, 30),
        ],
        "user_id": [10, 11, 10],
    }
    got = {}
    for unit in ("ns", "us"):
        d = tmp_path / f"layout_{unit}"
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array(rows["event_id"], type=pa.int64()),
                "ts": pa.array(rows["ts"], type=pa.timestamp(unit)),
                "user_id": pa.array(rows["user_id"], type=pa.int64()),
            }
        )
        # version 2.6 preserves nanos physically (older versions coerce)
        pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
        df = load_table(spark, str(d), "events")
        # one dtype for every layout: TIMESTAMP, never TIMESTAMP_NTZ
        assert df.schema["ts"].dataType.typeName() == "timestamp"
        got[unit] = sorted(
            df.select(
                "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t")
            ).collect()
        )
    assert got["ns"] == got["us"]
    assert [r["t"] for r in got["us"]] == [
        "2026-01-01 12:00:00",
        "2026-01-01 12:30:00",
        "2026-01-02 00:15:30",
    ]


def test_documents_embeddings_dtype_drift(spark, sf_smoke, tmp_path):
    """The driver regenerates testdata between rounds and dtypes have
    drifted before (events.ts: NANOS vs MICROS).  Pin gate-greenness for
    the plausible next drifts — narrower integer ids/counts and a
    float64 embedding element — on the dtype-sensitive queries: both
    engines read the same files, so every query must stay hash-green."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from csce438_distributed_password_cracker_spark.catalog import TABLES
    from csce438_distributed_password_cracker_spark.oracle import compare_query

    tmp = str(tmp_path / "drift")
    import os

    os.makedirs(tmp)
    for t in TABLES:
        shutil.copy(f"{sf_smoke}/{t}.parquet", f"{tmp}/{t}.parquet")
    d = pq.read_table(f"{sf_smoke}/documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": d["doc_id"].cast(pa.int32()),
                "text": d["text"],
                "lang": d["lang"],
                "source": d["source"],
                "n_chars": d["n_chars"].cast(pa.int32()),
            }
        ),
        f"{tmp}/documents.parquet",
    )
    e = pq.read_table(f"{sf_smoke}/embeddings.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": e["vec_id"].cast(pa.int32()),
                "embedding": e["embedding"].cast(pa.list_(pa.float64())),
                "label": e["label"].cast(pa.int64()),
            }
        ),
        f"{tmp}/embeddings.parquet",
    )
    for q in (
        "q_text_profile",
        "q_multimodal_features",
        "q_dedup_exact",
        "q_similarity_knn",
        "q_split_assign",
    ):
        r = compare_query(spark, q, tmp)
        assert r.ok, f"{q} broke under dtype drift: {getattr(r, 'detail', '')}"

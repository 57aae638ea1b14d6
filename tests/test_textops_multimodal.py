"""Text analysis + multimodal plumbing operators."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.catalog import load_table
from csce438_distributed_password_cracker_spark.operators import multimodal, textops


def test_language_id_argmax(spark):
    df = spark.createDataFrame(
        [
            (1, "the data row of the table and the plan"),
            (2, "el la de y fila fila de la"),
            (3, "der die das und zeile der die"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in textops.language_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de"}


def test_quality_score_bounds(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    out = textops.quality_score(docs).select("quality").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "ab cd1 ef-gh 23")], "doc_id LONG, text STRING")
    r = textops.token_counts(df).first()
    assert r["ws_tokens"] == 4
    # BPE-ish: ab | cd | 1 | ef | - | gh | 23
    assert r["bpe_tokens"] == 7


def test_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [(1, "a" * 50 + "b" * 50), (2, "a" * 50 + "b" * 50), (3, "x" * 100)],
        "doc_id LONG, text STRING",
    )
    fp = {r["doc_id"]: tuple(r["fingerprint"]) for r in textops.fingerprint(df, "doc_id").collect()}
    assert fp[1] == fp[2]  # identical docs -> identical fingerprint
    assert fp[1] != fp[3]
    assert list(fp[1]) == sorted(fp[1])  # canonical order


def test_multimodal_features_plumbing(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    media = multimodal.attach_fake_media(docs, "doc_id", "text")
    feats = multimodal.extract_features(media)
    rows = feats.limit(5).collect()
    assert all(len(r["feature"]) == 8 for r in rows)
    # content_hash is the sha256 of the payload bytes (Arrow fidelity)
    joined = (
        feats.join(docs, "doc_id").select("doc_id", "content_hash", "text").limit(5)
    )
    for r in joined.collect():
        assert r["content_hash"] == hashlib.sha256(r["text"].encode()).hexdigest()


def test_frame_sample(spark):
    df = spark.createDataFrame([(1, "abcdef")], "doc_id LONG, text STRING")
    media = multimodal.attach_fake_media(df, "doc_id", "text").withColumn(
        "meta", F.expr("named_struct('media_type', 'video', 'width', 0, 'height', 0, 'sample_rate', 0, 'n_frames', 10)")
    )
    frames = multimodal.frame_sample(media, every_n=3)
    got = sorted(r["frame_idx"] for r in frames.collect())
    assert got == [0, 3, 6, 9]

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


def test_repetition_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 trigram positions, 3 distinct
            (2, "a b c d e"),  # 3 positions, all distinct
            (3, "a b"),  # < 3 tokens: defined as no repetition
            (4, "x x x x"),  # 2 positions, 1 distinct
        ],
        "doc_id LONG, text STRING",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select("doc_id", *textops.repetition_metrics()).collect()
    }
    assert rows[1]["n_distinct_trigrams"] == 3
    assert rows[1]["dup_trigram_frac"] == round(1 - 3 / 7, 6)
    assert rows[2]["n_distinct_trigrams"] == 3
    assert rows[2]["dup_trigram_frac"] == 0.0
    assert rows[3]["n_distinct_trigrams"] == 0
    assert rows[3]["dup_trigram_frac"] == 0.0
    assert rows[4]["n_distinct_trigrams"] == 1
    assert rows[4]["dup_trigram_frac"] == 0.5
    # map-only: no exchange in the plan
    plan = (
        df.select("doc_id", *textops.repetition_metrics())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


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

# ---------------------------------------------------------------------------
# Real pure-stdlib codecs (PNG / WAV) + synth→decode closed loop
# ---------------------------------------------------------------------------


def test_png_codec_roundtrip_local():
    px = bytes((i * 7 + 3) % 256 for i in range(11 * 5))
    blob = multimodal.png_encode(11, 5, px)
    assert blob[:8] == multimodal.PNG_MAGIC
    w, h, got = multimodal.png_decode(blob)
    assert (w, h, got) == (11, 5, px)


def test_png_decode_defilters_sub_and_up():
    """The decoder is a real (subset) decoder: it must undo Sub/Up
    scanline filters, not just the filter-0 rows our encoder emits."""
    import struct as st
    import zlib as zl

    # hand-build a 3x2 PNG with row0 filter=1 (Sub), row1 filter=2 (Up)
    pixels = [[10, 20, 30], [15, 25, 35]]
    row0 = bytes([1, 10, 10, 10])          # Sub deltas for 10,20,30
    row1 = bytes([2, 5, 5, 5])             # Up deltas vs row0
    raw = row0 + row1

    def chunk(tag, data):
        return (
            st.pack(">I", len(data)) + tag + data
            + st.pack(">I", zl.crc32(tag + data) & 0xFFFFFFFF)
        )

    blob = (
        multimodal.PNG_MAGIC
        + chunk(b"IHDR", st.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zl.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, got = multimodal.png_decode(blob)
    assert (w, h) == (3, 2)
    assert list(got) == pixels[0] + pixels[1]


def test_png_decode_rejects_corruption():
    import pytest

    blob = bytearray(multimodal.png_encode(4, 3, bytes(range(12))))
    blob[20] ^= 0xFF  # flip a byte inside IHDR -> CRC must catch it
    with pytest.raises(ValueError):
        multimodal.png_decode(bytes(blob))
    with pytest.raises(ValueError):
        multimodal.png_decode(b"not a png at all")


def test_wav_codec_roundtrip_local():
    samples = [(i * 13) % 2048 - 1024 for i in range(100)]
    blob = multimodal.wav_encode(8000, samples)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    rate, n, got = multimodal.wav_decode(blob)
    assert (rate, n, got) == (8000, 100, samples)


def test_synthesize_and_decode_media_closed_loop(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 25), (7, 300)], "doc_id LONG, n_chars LONG"
    )
    media = multimodal.synthesize_media(df)
    decoded = {r["doc_id"]: r for r in multimodal.decode_media(media).collect()}
    # even ids -> png with closed-form geometry; odd -> wav with timing
    assert decoded[0]["media_type"] == "png"
    assert (decoded[0]["width"], decoded[0]["height"]) == (4 + 10 % 13, 3 + 0 % 7)
    assert decoded[2]["media_type"] == "png"
    assert (decoded[2]["width"], decoded[2]["height"]) == (4 + 25 % 13, 3 + 2 % 7)
    assert decoded[1]["media_type"] == "wav"
    assert decoded[1]["sample_rate"] == 8000
    assert decoded[1]["n_frames"] == 64 + 10 % 128
    assert decoded[1]["duration_us"] == (64 + 10 % 128) * 125
    # pixel statistics equal an independent Python recomputation
    w, h = decoded[2]["width"], decoded[2]["height"]
    px = [(2 * 31 + i) % 256 for i in range(w * h)]
    assert decoded[2]["sum_val"] == sum(px)
    assert decoded[2]["min_val"] == min(px)
    assert decoded[2]["max_val"] == max(px)
    sm = [(7 * 7 + i * 13) % 2048 - 1024 for i in range(64 + 300 % 128)]
    assert decoded[7]["sum_val"] == sum(sm)
    assert (decoded[7]["min_val"], decoded[7]["max_val"]) == (min(sm), max(sm))


def test_extract_features_decodes_real_media(spark):
    df = spark.createDataFrame([(0, 20), (1, 20)], "doc_id LONG, n_chars LONG")
    media = multimodal.synthesize_media(df)
    feats = {
        r["doc_id"]: r["feature"]
        for r in multimodal.extract_features(media).collect()
    }
    assert feats[0][0] == 1.0  # png-decoded, not byte-stats
    assert feats[0][1] == 4 + 20 % 13 and feats[0][2] == 3.0
    assert feats[1][0] == 2.0  # wav-decoded
    assert feats[1][1] == 8000.0


def test_resize_png_real_nearest_neighbor(spark):
    px = bytes(range(8 * 4))
    df = spark.createDataFrame(
        [(1, bytearray(multimodal.png_encode(8, 4, px)),
          {"media_type": "image", "width": 8, "height": 4,
           "sample_rate": None, "n_frames": 1})],
        "doc_id LONG, payload BINARY, "
        "meta STRUCT<media_type STRING, width INT, height INT, "
        "sample_rate INT, n_frames INT>",
    )
    out = multimodal.resize(df, 4, 2).collect()[0]
    assert out["meta"]["width"] == 4 and out["meta"]["height"] == 2
    w, h, got = multimodal.png_decode(bytes(out["payload"]))
    assert (w, h) == (4, 2)
    # nearest-neighbor: sampled from the source grid at stride 2
    expect = bytes(px[(y * 2) * 8 + (x * 2)] for y in range(2) for x in range(4))
    assert got == expect


def test_redact_pii_patterns_and_count(spark):
    from csce438_distributed_password_cracker_spark.operators.textops import (
        redact_pii,
    )

    rows = [
        (1, "contact john.doe+x@example.co.uk for details"),
        (2, "server at 192.168.1.254 port 80"),
        (3, "call (555) 123-4567 or +1 555 987 6543 now"),
        (4, "clean text with numbers 12345 and v1.2.3 intact"),
        (5, "mail a@b.io from 10.0.0.1 phone 555-123-4567"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r.id: (r.text_redacted, r.n_redactions)
        for r in df.select("id", *redact_pii()).collect()
    }
    assert out[1] == ("contact <EMAIL> for details", 1)
    assert out[2] == ("server at <IP> port 80", 1)
    assert out[3][0] == "call <PHONE> or <PHONE> now"
    assert out[3][1] == 2
    # precision: versions and plain numbers survive untouched
    assert out[4] == ("clean text with numbers 12345 and v1.2.3 intact", 0)
    assert out[5] == ("mail <EMAIL> from <IP> phone <PHONE>", 3)


def test_redact_pii_is_map_only(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.catalog import load_table
    from csce438_distributed_password_cracker_spark.operators.textops import (
        redact_pii,
    )

    docs = load_table(spark, sf_smoke, "documents")
    plan = (
        docs.select("doc_id", *redact_pii())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_redact_pii_counts_real_replacements_only(spark):
    """A pre-existing literal '<EMAIL>' token must not inflate the
    count, and custom tokens with regex metacharacters must count
    correctly (matches are counted on the pre-replacement text)."""
    from csce438_distributed_password_cracker_spark.operators.textops import (
        redact_pii,
    )

    df = spark.createDataFrame(
        [(1, "already scrubbed <EMAIL> here, new a@b.co too")],
        "id long, text string",
    )
    [r] = df.select(*redact_pii()).collect()
    assert r.n_redactions == 1  # only the real address counts

    custom = [("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]")]
    df2 = spark.createDataFrame(
        [(1, "ssn 123-45-6789 and 987-65-4321 end")], "id long, text string"
    )
    [r2] = df2.select(*redact_pii(patterns=custom)).collect()
    assert r2.text_redacted == "ssn [SSN] and [SSN] end"
    assert r2.n_redactions == 2  # '[SSN]' metacharacters don't miscount


def test_gopher_rules_each_threshold(spark):
    """Rae 2021 A.1.1 battery: a compliant doc passes; seven variants
    each violate exactly one rule."""
    from csce438_distributed_password_cracker_spark.operators.textops import (
        gopher_keep,
        gopher_rules,
    )

    good = " ".join(
        ["the", "be", "to", "of", "and"] + ["quality"] * 55
    )  # 60 words, mean len ~6.6, 5 stopword hits, all alphabetic
    docs = [
        (0, good),
        (1, " ".join(["word"] * 10)),  # too few words
        (2, " ".join(["a"] * 60)),  # mean word length < 3
        (3, good + " " + "#" * 1 + " #" * 9),  # symbols per word >= 0.1
        (4, "\n".join(["- " + good] * 10)),  # all lines bullets
        (5, "\n".join([good + "..."] * 10)),  # all lines ellipsis
        (6, " ".join(["the", "and"] + ["123"] * 58)),  # alpha frac low
        (7, " ".join(["zzz"] * 60)),  # no stopwords
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", *gopher_rules("text"))
        .withColumn("gopher_keep", gopher_keep())
        .collect()
    }
    assert out[0]["gopher_keep"] is True
    for i in range(1, 8):
        assert out[i]["gopher_keep"] is False, i
    # spot-check the feature values
    assert out[0]["g_n_words"] == 60
    assert out[0]["g_stop_hits"] == 5
    assert out[0]["g_alpha_frac"] == 1.0
    assert out[1]["g_n_words"] == 10
    assert out[2]["g_mean_word_len"] == 1.0
    assert out[3]["g_symbol_ratio"] >= 0.1
    assert out[4]["g_bullet_frac"] == 1.0
    assert out[5]["g_ellipsis_frac"] == 1.0
    assert out[6]["g_alpha_frac"] < 0.8
    assert out[7]["g_stop_hits"] == 0


def test_gopher_rules_edges_and_map_only(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.operators.textops import (
        gopher_keep,
        gopher_rules,
    )
    from pyspark.sql import functions as F

    # empty / whitespace-only docs: zero words, rules all computable
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in df.select("doc_id", *gopher_rules("text"))
        .withColumn("gopher_keep", gopher_keep())
        .collect()
    }
    for i in (1, 2):
        assert rows[i]["g_n_words"] == 0
        assert rows[i]["gopher_keep"] is False
    assert rows[3]["g_n_words"] == 2
    # full corpus: single scan, no exchange; the synthetic vocabulary
    # rarely carries >= 2 of the paper's stopwords, so tune that rule
    # down (the thresholds are keyword args for exactly this reason)
    # and assert the conjunction discriminates rather than degenerates
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = docs.select("doc_id", *gopher_rules("text")).withColumn(
        "gopher_keep", gopher_keep(min_stop_hits=1)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("gopher_keep"), 1).otherwise(0)).alias("k"),
    ).first()
    assert agg["n"] == docs.count() and 0 < agg["k"] < agg["n"]


def test_repetition_battery_closed_form(spark):
    """Rae 2021 A.1.2: each signal on crafted docs, paper thresholds."""
    from csce438_distributed_password_cracker_spark.operators.textops import (
        repetition_battery,
        repetition_keep,
    )

    varied = " ".join(f"w{i}" for i in range(60))
    docs = [
        (0, varied),                                 # clean
        (1, "\n".join(["same line here"] * 10)),     # all-dup lines
        (2, "\n".join([varied, varied, "unique x"])),  # 2/3 dup lines
        (3, " ".join(["ab cd"] * 40)),               # one 2-gram rules
        (4, None),                                   # NULL text
        (5, "one two"),                              # tiny, no trigram
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", *repetition_battery("text"))
        .withColumn("repetition_keep", repetition_keep())
        .collect()
    }
    assert out[0]["repetition_keep"] is True
    assert out[0]["r_dup_line_frac"] == 0.0
    # doc 1: 10 identical lines -> dup frac 0.9, char frac 1.0
    assert out[1]["r_dup_line_frac"] == 0.9
    assert out[1]["r_dup_line_char_frac"] == 1.0
    assert out[1]["repetition_keep"] is False
    # doc 2: 3 lines, 2 identical -> dup frac 1/3 rounded
    assert out[2]["r_dup_line_frac"] == round(1 - 2 / 3, 6)
    assert out[2]["r_dup_line_char_frac"] > 0.9  # the two big dup lines
    # doc 3: 'cd ab' repeats 39x dominating the 2-gram mass
    assert out[3]["r_top2gram_char_frac"] > 0.4
    assert out[3]["repetition_keep"] is False
    # NULL text: all zeros, keep (nothing repetitive about nothing)
    assert out[4]["r_dup_line_frac"] == 0.0
    assert out[4]["repetition_keep"] is True
    # < 3 words: trigram leg is 0, not an error
    assert out[5]["r_top3gram_char_frac"] == 0.0


def test_repetition_battery_map_only_corpus(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.operators.textops import (
        repetition_battery,
        repetition_keep,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = docs.select("doc_id", *repetition_battery("text")).withColumn(
        "repetition_keep", repetition_keep()
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("repetition_keep"), 1).otherwise(0)).alias("k"),
        F.max("r_top2gram_char_frac").alias("m2"),
    ).first()
    assert agg["n"] == docs.count()
    assert agg["k"] > 0
    assert 0.0 < agg["m2"] <= 1.0


def test_top_gram_is_most_frequent_not_longest(spark):
    """Regression (round-5 review): the paper's metric is the MOST
    FREQUENT n-gram's coverage — a rarer but longer gram must not win
    on chars x count alone."""
    from csce438_distributed_password_cracker_spark.operators.textops import (
        repetition_battery,
    )

    # 'aa bb' occurs 3x (cov 3*4=12 word-chars); 'longword1 longword2'
    # occurs 2x (cov 2*18=36): the most frequent gram wins -> 12/wchars
    text = "aa bb aa bb aa bb x longword1 longword2 y longword1 longword2"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = df.select(*repetition_battery("text")).first()
    words = [w for w in text.split(" ") if w]
    wchars = sum(len(w) for w in words)
    # build expectation independently: most frequent 2-gram
    from collections import Counter

    grams = Counter(
        f"{a} {b}" for a, b in zip(words, words[1:])
    )
    top_cnt = max(grams.values())
    cov = max(
        c * (len(g) - 1) for g, c in grams.items() if c == top_cnt
    )
    assert r["r_top2gram_char_frac"] == round(min(1.0, cov / wchars), 6)
    assert cov == 12  # 'aa bb' x3, not the longword pair's 36

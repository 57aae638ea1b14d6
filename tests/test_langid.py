"""Cavnar–Trenkle rank-order language ID (operators/langid.py):
profile training closed form, out-of-place classification, real-corpus
accuracy, NULL/short-doc edges, map-only plan, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csce438_distributed_password_cracker_spark.operators import langid


def test_profile_training_closed_form(spark):
    df = spark.createDataFrame(
        [("xx", "ababab"), ("yy", "czczcz")],
        "lang string, text string",
    )
    prof = langid.train_char_ngram_profiles(df, n=2, top_k=3)
    # 'ababab' 2-grams: ab x3, ba x2 -> ranked [ab, ba]
    assert prof["xx"] == ["ab", "ba"]
    assert prof["yy"] == ["cz", "zc"]
    with pytest.raises(ValueError):
        langid.train_char_ngram_profiles(df, n=0)


def test_classification_rank_distance(spark):
    train = spark.createDataFrame(
        [("aa", "the cat and the hat and the bat"),
         ("bb", "zzz qqq zzz qqq zzz vvv")],
        "lang string, text string",
    )
    prof = langid.train_char_ngram_profiles(train, n=3, top_k=20)
    docs = spark.createDataFrame(
        [(1, "the rat and the mat"), (2, "qqq zzz qqq"),
         (3, None), (4, "ab")],  # NULL and shorter-than-n docs
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["lang_pred_ngram"]
        for r in langid.classify_char_ngram(
            docs, prof, n=3, top_k=20
        ).collect()
    }
    assert out[1] == "aa"
    assert out[2] == "bb"
    assert out[3] is None
    assert out[4] is None
    with pytest.raises(ValueError):
        langid.classify_char_ngram(docs, {})


def test_real_languages_classify_correctly(spark):
    """Genuinely distinct languages (the synthetic corpus's lang label
    is uncorrelated with its text, so accuracy is tested on real
    sentences): train on a few documents per language, classify
    HELD-OUT sentences."""
    train_rows = [
        ("en", "the quick brown fox jumps over the lazy dog near the river"),
        ("en", "this is a simple english sentence about data and tables"),
        ("en", "we should read the book before the meeting starts today"),
        ("de", "der schnelle braune fuchs springt über den faulen hund am fluss"),
        ("de", "dies ist ein einfacher deutscher satz über daten und tabellen"),
        ("de", "wir sollten das buch vor dem treffen heute lesen und verstehen"),
        ("fr", "le renard brun rapide saute par dessus le chien paresseux près de la rivière"),
        ("fr", "ceci est une phrase française simple sur les données et les tables"),
        ("fr", "nous devrions lire le livre avant la réunion aujourd'hui"),
        ("es", "el rápido zorro marrón salta sobre el perro perezoso junto al río"),
        ("es", "esta es una frase española sencilla sobre datos y tablas"),
        ("es", "deberíamos leer el libro antes de la reunión de hoy"),
    ]
    train = spark.createDataFrame(train_rows, "lang string, text string")
    prof = langid.train_char_ngram_profiles(train, top_k=60)
    held_out = spark.createDataFrame(
        [
            (1, "the dog and the fox are very lazy this morning", "en"),
            (2, "der hund und der fuchs sind heute sehr faul", "de"),
            (3, "le chien et le renard sont très paresseux ce matin", "fr"),
            (4, "el perro y el zorro son muy perezosos esta mañana", "es"),
        ],
        "doc_id long, text string, want string",
    )
    out = {
        r["doc_id"]: (r["lang_pred_ngram"], r["want"])
        for r in langid.classify_char_ngram(
            held_out, prof, top_k=60
        ).collect()
    }
    for i, (got, want) in out.items():
        assert got == want, (i, got, want)


def test_corpus_scale_plan_and_determinism(spark, sf_smoke):
    """Over the full synthetic corpus: training is one (lang, gram)
    shuffle, classification adds NO exchange (profiles are plan
    literals), and predictions are identical across partitionings."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    prof = langid.train_char_ngram_profiles(docs)
    assert set(prof) == {"de", "en", "es", "fr", "zh"}
    assert all(len(v) == 40 for v in prof.values())
    classified = langid.classify_char_ngram(docs, prof)
    plan = (
        classified._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # map-only: profiles are literals
    assert classified.where("lang_pred_ngram IS NULL").count() == 0
    a = sorted(
        (r["doc_id"], r["lang_pred_ngram"]) for r in classified.collect()
    )
    b = sorted(
        (r["doc_id"], r["lang_pred_ngram"])
        for r in langid.classify_char_ngram(
            docs.repartition(13), prof
        ).collect()
    )
    assert a == b


def test_classify_engines_agree(spark, sf_smoke):
    """The arrow fast path and the zero-UDF SQL expression path produce
    identical verdicts on real corpus sentences, short docs (NULL) and
    NULL text included."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    extra = spark.createDataFrame(
        [(10_001, "xx", "ab"), (10_002, "xx", None), (10_003, "xx", "")],
        "doc_id long, lang string, text string",
    )
    docs = docs.unionByName(extra)
    prof = langid.train_char_ngram_profiles(docs)
    got_arrow = {
        r["doc_id"]: r["lang_pred_ngram"]
        for r in langid.classify_char_ngram(
            docs, prof, engine="arrow"
        ).collect()
    }
    got_sql = {
        r["doc_id"]: r["lang_pred_ngram"]
        for r in langid.classify_char_ngram(
            docs, prof, engine="sql"
        ).collect()
    }
    assert got_arrow == got_sql
    assert got_arrow[10_001] is None  # shorter than n=3
    assert got_arrow[10_002] is None  # NULL text
    assert got_arrow[10_003] is None  # empty text


def test_train_engines_agree(spark, sf_smoke):
    """Arrow partial-count training and the zero-UDF explode+groupBy
    training produce identical rank profiles."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    a = langid.train_char_ngram_profiles(docs, engine="arrow")
    b = langid.train_char_ngram_profiles(docs, engine="sql")
    assert a == b

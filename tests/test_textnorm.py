"""Text normalization (operators/textnorm.py): the JVM chain's
semantics, NULL passthrough, the NFC Arrow path, and — the load-bearing
property — byte parity between the Spark expression and the DuckDB twin
on adversarial inputs."""

from __future__ import annotations

import duckdb
import pytest

from csce438_distributed_password_cracker_spark.operators import textnorm

CASES = [
    "Hello​ World",            # zero-width space splits a token
    "tabs\tand\nnewlines\r\nhere",  # whitespace zoo
    "  leading and trailing  ",
    "CTRL\x01chars\x7fgone",
    "MiXeD Case ASCII",
    "double  spaces   collapse",
    "﻿BOM prefix",
    "plain",
    "",
    "a \x01 b",                     # control flanked by spaces
    "nbsp\u00a0disguise",           # U+00A0 copy-paste whitespace
    "em\u2003space and\u3000wide",  # Unicode space zoo
]


def test_normalize_semantics_and_nulls(spark):
    rows = [(i, c) for i, c in enumerate(CASES)] + [(99, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["text_norm"]
        for r in textnorm.normalize_text(df, "text").collect()
    }
    assert out[0] == "hello world"
    assert out[1] == "tabs and newlines here"
    assert out[2] == "leading and trailing"
    assert out[3] == "ctrlcharsgone"
    assert out[4] == "mixed case ascii"
    assert out[5] == "double spaces collapse"
    assert out[6] == "bom prefix"
    assert out[7] == "plain"
    assert out[8] == ""
    assert out[9] == "a b"          # control strip BEFORE ws collapse
    assert out[10] == "nbsp disguise"
    assert out[11] == "em space and wide"
    assert out[99] is None
    # map-only: no exchange, no Python (default path)
    plan = (
        textnorm.normalize_text(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_nfc_form_composes_and_guards(spark):
    df = spark.createDataFrame(
        [(1, "Café"), (2, "Café"), (3, None)],
        "id long, text string",
    )
    out = {
        r["id"]: r["text_norm"]
        for r in textnorm.normalize_text(df, "text", form="NFC").collect()
    }
    assert out[1] == out[2] == "café"  # composed == decomposed
    assert out[3] is None
    with pytest.raises(ValueError, match="form"):
        textnorm.normalize_text(df, "text", form="NFX")


def test_spark_and_duckdb_twins_agree_byte_for_byte(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "id long, text string"
    )
    got_spark = {
        r["id"]: r["text_norm"]
        for r in textnorm.normalize_text(df, "text").collect()
    }
    sql = textnorm.normalize_sql("text")
    con2 = duckdb.connect()
    import pandas as pd

    con2.register(
        "t", pd.DataFrame({"id": range(len(CASES)), "text": CASES})
    )
    got_duck = dict(con2.execute(f"SELECT id, {sql} FROM t").fetchall())
    assert got_duck == got_spark
    # lowercase=False twin parity too
    sql_nc = textnorm.normalize_sql("text", lowercase=False)
    got_duck_nc = dict(
        con2.execute(f"SELECT id, {sql_nc} FROM t").fetchall()
    )
    got_spark_nc = {
        r["id"]: r["n"]
        for r in df.select(
            "id",
            textnorm.normalize_expr(df["text"], lowercase=False).alias("n"),
        ).collect()
    }
    assert got_duck_nc == got_spark_nc


def test_normalization_makes_disguised_copies_collide_in_dedup(spark):
    """The reason this operator exists: zero-width insertions, case
    flips and whitespace games defeat exact dedup on raw bytes but
    collide after normalize_text."""
    from csce438_distributed_password_cracker_spark.operators.dedup import (
        exact_dedup,
    )

    rows = [
        (1, "the quick brown fox"),
        (2, "The  quick\tbrown fox "),      # case + ws games
        (3, "the quick bro​wn fox"),         # zero-width space inside
        (4, "a different document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # raw bytes: nothing collides
    assert exact_dedup(df, ["text"], "doc_id").count() == 4
    normed = textnorm.normalize_text(df, "text")
    kept = exact_dedup(normed, ["text_norm"], "doc_id")
    assert kept.count() == 2
    assert {r["doc_id"] for r in kept.collect()} == {1, 4}  # min-id wins


def test_randomized_alphabet_parity(spark):
    """200 seeded random strings over a deliberately nasty alphabet
    (controls, unicode spaces, zero-widths, mixed case, punctuation):
    the Spark chain and the DuckDB twin must agree byte-for-byte."""
    import random

    import duckdb
    import pandas as pd

    alphabet = (
        list("aZ9 .!") + ["\t", "\n", "\x01", "\x0b", "\x7f"]
        + [" ", " ", "　", "​", "﻿", "é", "\u2028", "\u0085", "\u1680"]
    )
    rng = random.Random(1234)
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, text string"
    )
    got_spark = {
        r["id"]: r["text_norm"]
        for r in textnorm.normalize_text(df, "text").collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(len(cases)), "text": cases}))
    sql = textnorm.normalize_sql("text")
    got_duck = dict(con.execute(f"SELECT id, {sql} FROM t").fetchall())
    assert got_duck == got_spark

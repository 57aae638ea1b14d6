"""Character-n-gram language identification — the Cavnar–Trenkle
rank-order profile classifier (1994, "N-Gram-Based Text
Categorization"), the published algorithm behind classic langid tools.

``textops.language_id`` ships the marker-overlap SHAPE (tiny word
lists, argmax); this module is the real thing: per-language profiles
are the top-K character n-grams by frequency, a document is classified
by the rank-order ("out-of-place") distance between its own profile
and each language's, smallest distance wins.

Distributed re-expression:

- **Training** (:func:`train_char_ngram_profiles`): gram counts
  pre-aggregate per partition in one Arrow sweep (a Counter per
  (partition, lang) — default ``engine="arrow"``; ``engine="sql"``
  keeps the zero-UDF codegen'd explode), merge through ONE shuffle on
  (lang, gram) whose input is distinct-grams-per-partition rows, and
  per-language ranking is a window over the counts
  (language-partitioned) — only L×K rows reach the driver.
- **Classification** (:func:`classify_char_ngram`): entirely MAP-ONLY
  either way; two engines, same verdicts:

  - ``engine="arrow"`` (default): one Arrow-batched ``pandas_udf`` —
    per doc a Counter + top-K sort + rank-dict probes, the profiles
    captured in the closure.  ~4× faster than the expression tower
    (the round-5 opbench's heaviest entry): the interpreted
    ``filter``/``zip_with``/``transform`` lambdas over sorted gram
    arrays cost more per doc than one Python loop over Arrow batches.
  - ``engine="sql"``: zero-UDF expression path — the document's own
    top-K profile from the battery's sort + run-length pattern, the
    out-of-place distance as literal-map probes.  Keeps classification
    inside codegen for pipelines that must stay UDF-free; pinned equal
    to the arrow engine on real sentences in tests/test_langid.py.

Determinism: profile ranks tie-break on the gram string; language
argmin ties break on the language code; docs shorter than ``n`` chars
classify as NULL (no signal — never a guess).

Reference analog: none (north-star E3 upgrade over
textops.language_id's marker heuristic).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["train_char_ngram_profiles", "classify_char_ngram"]


def _grams_sql(text_col: str, n: int) -> str:
    # sequence(1, 0) DESCENDS in Spark, so short docs are gated on an
    # explicit CASE rather than a clamped upper bound
    return (
        f"CASE WHEN length({text_col}) >= {n} THEN"
        f" transform(sequence(1, length({text_col}) - {n - 1}),"
        f" i -> substring({text_col}, i, {n}))"
        f" ELSE array() END"
    )


def _gram_partials_arrow(
    df: DataFrame, lang_col: str, text_col: str, n: int
) -> DataFrame:
    """Per-partition (lang, gram, count) partials in ONE Arrow sweep —
    a Counter per (partition, lang) instead of exploding one row per
    gram occurrence.  The downstream (lang, gram) shuffle then moves
    ≤ distinct-grams-per-partition rows, not total-gram-occurrence
    rows (the same partial-aggregate compression the exact groupBy
    gets, minus the per-occurrence explode allocation that dominated
    the round-5 opbench)."""
    from collections import Counter

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    src = df.select(
        F.col(lang_col).alias("_lang"), F.col(text_col).alias("_t")
    )
    out_schema = StructType(
        [
            StructField("_lang", src.schema["_lang"].dataType, True),
            StructField("_g", StringType(), False),
            StructField("_c", LongType(), False),
        ]
    )

    def _sweep(batches):
        agg: dict = {}
        for pdf in batches:
            for lang, t in zip(pdf["_lang"], pdf["_t"]):
                if not isinstance(t, str) or len(t) < n:
                    continue
                agg.setdefault(lang, Counter()).update(
                    t[i : i + n] for i in range(len(t) - n + 1)
                )
        yield pd.DataFrame(
            [
                (lang, g, c)
                for lang, cnt in agg.items()
                for g, c in cnt.items()
            ],
            columns=["_lang", "_g", "_c"],
        )

    return src.mapInPandas(_sweep, out_schema)


def train_char_ngram_profiles(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 40,
    engine: str = "arrow",
) -> dict[str, list[str]]:
    """Per-language rank profiles: the ``top_k`` most frequent char
    ``n``-grams per language, most frequent first (count desc, gram
    asc tie-break).  One (lang, gram) shuffle; L×K rows to the
    driver.  ``engine="arrow"`` (default) pre-aggregates gram counts
    per partition in one Arrow sweep; ``engine="sql"`` is the zero-UDF
    explode + groupBy — identical profiles (pinned in tests)."""
    if n < 1 or top_k < 1:
        raise ValueError("n and top_k must be >= 1")
    if engine not in ("arrow", "sql"):
        raise ValueError(f"engine must be 'arrow' or 'sql', got {engine!r}")
    if engine == "arrow":
        counts = (
            _gram_partials_arrow(df, lang_col, text_col, n)
            .groupBy("_lang", "_g")
            .agg(F.sum("_c").alias("_c"))
        )
    else:
        counts = (
            df.where(F.col(text_col).isNotNull())
            .select(
                F.col(lang_col).alias("_lang"),
                F.explode(F.expr(_grams_sql(text_col, n))).alias("_g"),
            )
            .groupBy("_lang", "_g")
            .agg(F.count("*").alias("_c"))
        )
    ranked = counts.withColumn(
        "_rank",
        F.row_number().over(
            Window.partitionBy("_lang").orderBy(
                F.desc("_c"), F.asc("_g")
            )
        ),
    ).where(F.col("_rank") <= int(top_k))
    profiles: dict[str, list[str]] = {}
    for r in ranked.orderBy("_lang", "_rank").collect():
        profiles.setdefault(r["_lang"], []).append(r["_g"])
    return profiles


def _doc_profile_sql(text_col: str, n: int, top_k: int) -> str:
    """The document's own top-``top_k`` gram profile (rank order),
    built from run BOUNDARIES over the sorted gram array: start
    indices are the positions where the value changes, run lengths are
    differences of consecutive starts — every step an array primitive
    or an O(1)-body lambda (an accumulator that appends an array per
    run would copy the accumulator quadratically in the interpreted
    evaluator)."""
    grams = f"array_sort({_grams_sql(text_col, n)})"
    # evaluated with `_sg` bound to the sorted grams by the caller
    # greatest(i-1, 1): OR does not short-circuit, so the i=1 arm must
    # not build an element_at(_sg, 0) (INVALID_INDEX_OF_ZERO); at i=1
    # the self-compare is false and the first arm decides
    starts = (
        "filter(sequence(1, size(_sg)), i -> i = 1 OR "
        "element_at(_sg, i) != element_at(_sg, greatest(i - 1, 1)))"
    )
    runs = (
        f"zip_with({starts},"
        f" concat(slice({starts}, 2, size({starts})),"
        f"        array(size(_sg) + 1)),"
        f" (s, e) -> named_struct("
        f"   'negcnt', CAST(s AS BIGINT) - CAST(e AS BIGINT),"
        f"   'g', element_at(_sg, s)))"
    )
    inner = (
        f"transform(slice(array_sort({runs}), 1, {int(top_k)}),"
        f" s -> s.g)"
    )
    # bind the sorted array once via a lambda over a single-element
    # array (gives `_sg` a name); the empty-array guard is a CASE —
    # sequence(1, 0) DESCENDS, so the starts filter must never run
    # over an empty _sg
    guarded = (
        f"CASE WHEN size(_sg) > 0 THEN {inner}"
        f" ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return (
        f"element_at(transform(array({grams}),"
        f" _sg -> {guarded}), 1)"
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _classify_arrow_udf(profiles: dict[str, list[str]], n: int, top_k: int):
    """Arrow-batched classifier: per doc, gram Counter → top-K by
    (count desc, gram asc) → out-of-place distance against each
    language's rank dict (missing gram costs ``top_k``) → argmin with
    language-code tie-break.  Exactly the SQL engine's semantics, one
    Python pass per Arrow batch instead of an interpreted-lambda tower
    per row."""
    from pyspark.sql.functions import pandas_udf

    ranks = {
        lang: {g: i + 1 for i, g in enumerate(p)}
        for lang, p in profiles.items()
    }
    langs = sorted(profiles)
    k = int(top_k)

    @pandas_udf("string")
    def classify(texts: pd.Series) -> pd.Series:
        from collections import Counter

        out: list[str | None] = []
        for t in texts:
            if not isinstance(t, str) or len(t) < n:
                out.append(None)
                continue
            cnt = Counter(t[i : i + n] for i in range(len(t) - n + 1))
            dp = [
                g
                for g, _ in sorted(
                    cnt.items(), key=lambda kv: (-kv[1], kv[0])
                )[:k]
            ]
            best_d, best_l = None, None
            for lang in langs:
                r = ranks[lang]
                d = 0
                for i, g in enumerate(dp):
                    rg = r.get(g)
                    d += abs(i + 1 - rg) if rg is not None else k
                if best_d is None or d < best_d:
                    best_d, best_l = d, lang
            out.append(best_l)
        return pd.Series(out, dtype="object")

    return classify


def classify_char_ngram(
    df: DataFrame,
    profiles: dict[str, list[str]],
    text_col: str = "text",
    n: int = 3,
    top_k: int = 40,
    out_col: str = "lang_pred_ngram",
    engine: str = "arrow",
) -> DataFrame:
    """Append ``out_col``: the language whose rank profile is closest
    (Cavnar–Trenkle out-of-place distance) to the document's own
    profile.  Map-only — profiles ship as plan/closure literals.  Docs
    shorter than ``n`` chars get NULL (no signal).  ``engine="arrow"``
    (default, one Arrow-batched pandas_udf) and ``engine="sql"``
    (zero-UDF expression tower) produce identical verdicts — see the
    module docstring for the trade."""
    if not profiles:
        raise ValueError("profiles must not be empty")
    if engine not in ("arrow", "sql"):
        raise ValueError(f"engine must be 'arrow' or 'sql', got {engine!r}")
    if engine == "arrow":
        return df.withColumn(
            out_col,
            _classify_arrow_udf(profiles, n, top_k)(F.col(text_col)),
        )
    doc_prof = _doc_profile_sql(text_col, n, top_k)
    staged = df.withColumn("__dp", F.expr(doc_prof))
    k = int(top_k)
    dist_cols: list[Column] = []
    for lang in sorted(profiles):
        # rank lookup via a literal MAP (one codegen'd probe per doc
        # gram) instead of array_position over a literal array (a
        # nested interpreted scan per gram)
        rank_map = ", ".join(
            f"{_sql_str(g)}, {i + 1}L"
            for i, g in enumerate(profiles[lang])
        )
        dist = (
            f"aggregate(transform(sequence(1, size(__dp)),"
            f" i -> coalesce(abs(CAST(i AS BIGINT) -"
            f" element_at(map({rank_map}), element_at(__dp, i))),"
            f" {k}L)), 0L, (a, x) -> a + x)"
        )
        dist_cols.append(
            F.expr(
                f"CASE WHEN size(__dp) > 0 THEN {dist} END"
            ).alias(f"__d_{lang}")
        )
    staged = staged.select("*", *dist_cols)
    pairs = ", ".join(
        f"named_struct('d', __d_{lang}, 'l', {_sql_str(lang)})"
        for lang in sorted(profiles)
    )
    verdict = staged.withColumn(
        out_col,
        F.expr(
            f"CASE WHEN size(__dp) > 0 THEN"
            f" array_min(array({pairs})).l END"
        ),
    )
    drop = ["__dp"] + [f"__d_{lang}" for lang in sorted(profiles)]
    return verdict.drop(*drop)

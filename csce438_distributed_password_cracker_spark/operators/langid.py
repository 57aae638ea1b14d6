"""Character-n-gram language identification — the Cavnar–Trenkle
rank-order profile classifier (1994, "N-Gram-Based Text
Categorization"), the published algorithm behind classic langid tools.

``textops.language_id`` ships the marker-overlap SHAPE (tiny word
lists, argmax); this module is the real thing: per-language profiles
are the top-K character n-grams by frequency, a document is classified
by the rank-order ("out-of-place") distance between its own profile
and each language's, smallest distance wins.

Distributed re-expression:

- **Training** (:func:`train_char_ngram_profiles`): char n-gram explode
  is map-only (``substring`` over a ``sequence`` — codegen'd, no
  lambda-per-char re-scan), counts are ONE shuffle on (lang, gram)
  with map-side partials, per-language ranking is a window over the
  counts (language-partitioned), and only L×K rows reach the driver.
- **Classification** (:func:`classify_char_ngram`): entirely MAP-ONLY —
  the language profiles are plan literals (a few KB), the document's
  own top-K profile is built with the battery's sort + run-length
  pattern (one pass per doc, no per-distinct rescans), and the
  out-of-place distance is K array_position probes per language.
  Zero shuffles, zero UDFs: classification of 100 TB is a projection.

Determinism: profile ranks tie-break on the gram string; language
argmin ties break on the language code; docs shorter than ``n`` chars
classify as NULL (no signal — never a guess).

Reference analog: none (north-star E3 upgrade over
textops.language_id's marker heuristic).
"""

from __future__ import annotations

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


def train_char_ngram_profiles(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 40,
) -> dict[str, list[str]]:
    """Per-language rank profiles: the ``top_k`` most frequent char
    ``n``-grams per language, most frequent first (count desc, gram
    asc tie-break).  One (lang, gram) shuffle; L×K rows to the
    driver."""
    if n < 1 or top_k < 1:
        raise ValueError("n and top_k must be >= 1")
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


def classify_char_ngram(
    df: DataFrame,
    profiles: dict[str, list[str]],
    text_col: str = "text",
    n: int = 3,
    top_k: int = 40,
    out_col: str = "lang_pred_ngram",
) -> DataFrame:
    """Append ``out_col``: the language whose rank profile is closest
    (Cavnar–Trenkle out-of-place distance) to the document's own
    profile.  Map-only — profiles ship as plan literals.  Docs shorter
    than ``n`` chars get NULL (no signal)."""
    if not profiles:
        raise ValueError("profiles must not be empty")
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

"""Cross-document EXACT SUBSTRING deduplication — remove duplicated
k-token spans from every occurrence after the corpus-wide first.

Public prior art: Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" — their EXACTSUBSTR variant removes repeated
50-token spans wherever they occur, catching the duplication that
document- and paragraph-granular passes miss (quotes, templated
sentences, shifted boilerplate).  They build a single-machine suffix
array; the distributed re-expression here is the standard windowed-hash
formulation: every k-token window is fingerprinted, windows elect a
corpus-wide first occurrence, and every later occurrence's span is
excised — O(n·k) map-side work instead of a shared O(n) suffix
structure, embarrassingly parallel, no machine ever holds the corpus.

This completes the engine's dedup granularity ladder:
document-exact (dedup.exact_dedup) → paragraph (paradedup) →
SUBSTRING SPAN (this module) → near-dup (MinHash/SimHash/Jaccard) →
semantic (semdedup).

Reference analog: none (north-star dedup family).

Scale shape (100 TB):

- Window generation is a map-only explode; each window row carries only
  ``(hash, doc_id, pos)`` into the election shuffle — never text.
- The election is ONE aggregation on the window hash with map-side min
  partials (the billion-fold boilerplate window reduces to a min+count
  before the exchange — same skew argument as the paragraph election).
- Verdict spans come back keyed on ``doc_id`` — three small integers
  per duplicated window; the interval merge is one per-doc window pass;
  the text is rebuilt MAP-SIDE from the document's own token array.
  Document text never crosses the wire at all (one better than the
  paragraph sweep, whose winners carry text once).

Semantics notes:

- Excision can make previously non-adjacent tokens adjacent (inherent
  to span removal; Lee et al. accept the same artifact).
- ``portable=True`` fingerprints windows with the engine-portable
  md5-60 hash so a DuckDB oracle recomputes identical verdicts;
  production default is xxhash64 (cheaper, same verdicts absent a
  64-bit collision — the paradedup collision-odds note applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.porthash import md5_int_spark


def window_occurrences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Every k-token window of every document: ``(_did, _pos, _h)`` —
    0-based positions, xxhash64 fingerprints (md5-60 under
    ``portable=True``).  Documents shorter than ``k`` tokens emit no
    windows.  The SINGLE tokenize/explode/fingerprint definition shared
    by the batch sweep and the streaming ingest twin
    (streaming/substring_ingest.py) — the persisted index's convergence
    to batch semantics depends on these being bit-identical."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    base = (
        df.select(F.col(id_col).alias("_did"), toks.alias("_toks"))
        .withColumn("_nt", F.size("_toks"))
        .where(F.col("_nt") >= k)
    )
    pos = base.select(
        "_did",
        "_toks",
        F.explode(F.expr(f"sequence(1, _nt - {k} + 1)")).alias("_i"),
    )
    gram = f"array_join(slice(_toks, _i, {k}), ' ')"
    h = (
        md5_int_spark(gram, seed, 15)
        if portable
        else f"xxhash64({gram}, {int(seed)})"
    )
    return pos.select(
        "_did", (F.col("_i") - 1).alias("_pos"), F.expr(h).alias("_h")
    )


def window_winners(occ: DataFrame) -> DataFrame:
    """First-occurrence election over window occurrences: one row per
    fingerprint ``(_h, _wdid, _wpos, _n)`` — the minimum (doc, pos)
    plus the occurrence count, computed with map-side min/count
    partials (the billion-fold boilerplate window reduces before the
    exchange).  Shared by :func:`duplicate_spans` and the streaming
    ingest twin's per-batch election."""
    return (
        occ.groupBy("_h")
        .agg(
            F.min_by(
                F.struct("_did", "_pos"), F.struct("_did", "_pos")
            ).alias("_w"),
            F.count("*").alias("_n"),
        )
        .select(
            "_h",
            F.col("_w._did").alias("_wdid"),
            F.col("_w._pos").alias("_wpos"),
            "_n",
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    seed: int = 42,
    portable: bool = False,
    min_count: int = 2,
) -> DataFrame:
    """Token spans ``(id_col, start, end)`` — 0-based, end-exclusive —
    whose k-token window text occurs at least ``min_count`` times
    corpus-wide, EXCLUDING each window's first occurrence (the minimum
    (doc, pos), so verdicts are deterministic and engine-portable)."""
    if min_count < 2:
        raise ValueError("min_count must be >= 2 (1 would excise text "
                         "that is not duplicated anywhere)")
    occ = window_occurrences(df, id_col, text_col, k, seed, portable)
    winners = window_winners(occ)
    return (
        occ.join(winners, "_h")
        .where(
            (F.col("_n") >= int(min_count))
            & ~(
                (F.col("_did") == F.col("_wdid"))
                & (F.col("_pos") == F.col("_wpos"))
            )
        )
        .select(
            F.col("_did").alias(id_col),
            F.col("_pos").alias("start"),
            (F.col("_pos") + k).alias("end"),
        )
    )


def merge_spans(spans: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Merge overlapping/adjacent ``[start, end)`` spans per document
    into disjoint islands (gaps-and-islands with a running max end) —
    one window pass on the doc key, so the downstream coverage test is
    O(islands) per token instead of O(raw spans)."""
    w = Window.partitionBy(id_col).orderBy("start", "end")
    prev_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    island = F.sum(
        F.when(F.col("start") > F.coalesce(prev_end, F.lit(-1)), 1)
        .otherwise(0)
    ).over(w)
    return (
        spans.select(id_col, "start", "end", island.alias("_isl"))
        .groupBy(id_col, "_isl")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .select(id_col, "start", "end")
    )


def excise_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_deduped",
) -> DataFrame:
    """Remove merged ``[start, end)`` token spans from each document —
    the map-side rebuild shared by :func:`excise_duplicate_spans` and
    the streaming ingest twin (streaming/substring_ingest.py).  Returns
    ``(id_col, out_col, n_tokens, n_removed)`` for every input document
    (documents with no spans come back verbatim-reassembled)."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start", "end")).alias("_spans")
    )
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    joined = df.select(F.col(id_col), toks.alias("_toks")).join(
        per_doc, id_col, "left"
    )
    kept = F.expr(
        "CASE WHEN _spans IS NULL THEN _toks ELSE "
        "transform("
        "  filter(sequence(0, size(_toks) - 1),"
        "         i -> NOT exists(_spans,"
        "                         s -> i >= s.start AND i < s.end)),"
        "  j -> element_at(_toks, j + 1)) END"
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias(out_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


def excise_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    seed: int = 42,
    portable: bool = False,
    min_count: int = 2,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Corpus-wide exact-substring dedup: every duplicated k-token span
    is removed from all occurrences AFTER the first; returns
    ``(id_col, out_col, n_tokens, n_removed)`` for every input document
    (untouched documents come back verbatim-reassembled)."""
    spans = merge_spans(
        duplicate_spans(
            df, id_col, text_col, k, seed, portable, min_count
        ),
        id_col,
    )
    return excise_spans(df, spans, id_col, text_col, out_col)

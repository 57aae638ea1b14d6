"""Cross-document paragraph deduplication — the MassiveText/Gopher-style
exact paragraph sweep (Rae et al. 2021 run exact dedup at document AND
paragraph granularity; C4 does the same for three-sentence spans).

Complements the engine's other dedup passes: exact doc dedup
(operators/dedup.exact_dedup), near-dup (MinHash/SimHash/Jaccard), and
INTRA-doc segment dedup (textops.dedup_segments).  This one removes a
paragraph from every document AFTER its first occurrence anywhere in
the corpus — the shared boilerplate (headers, footers, licence blocks)
that near-dup passes under-weight because it is only a fraction of each
host document.

Scale shape (100 TB):

- Explode docs into (doc_id, pos, paragraph) rows — map-only fan-out.
- First-occurrence election: ONE aggregation on xxhash64(paragraph) —
  the election shuffle carries (hash, doc_id, pos) only, never the
  text; ``min_by`` elects the winner (min (doc_id, pos) —
  deterministic, engine-portable).  Map-side partial aggregation
  flattens skew: the same footer a billion times is ONE group whose
  reduction is a min.
- The paragraph BYTES cross the wire exactly once — in the verdict
  join against the (tiny relative to the corpus) winner table, hashed
  on the same 64-bit key.
- Survivors reassemble per doc with one grouped sort (``sort_array``
  over (pos, paragraph) structs) — the last shuffle, on doc_id.

Fingerprint note: grouping on xxhash64 means a 64-bit collision could
merge two distinct paragraphs (≈ n²/2⁶⁵; at 10¹⁰ paragraphs ≈ 3%
chance of ONE collision corpus-wide, which would drop one paragraph
instance).  Acceptable for corpus curation; pass
``collision_safe=True`` to group on the paragraph text itself (same
plan shape, wider shuffle rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quote_regex(sep: str) -> str:
    """Literal-quote a separator for Java-regex ``F.split``: escape every
    non-alphanumeric ASCII char.  (\\Q...\\E quoting breaks when the
    separator itself contains the sequence ``\\E``.)"""
    if not sep:
        raise ValueError("sep must be non-empty")
    return "".join(
        c if (c.isalnum() or ord(c) > 127) else "\\" + c for c in sep
    )


def carve_pseudo_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    sep: str = "|",
) -> DataFrame:
    """Re-render each document as fixed ``n``-token chunks joined by
    ``sep`` — pseudo-paragraph units for corpora without natural
    separators (map-only column algebra).  The shared preprocessing for
    :func:`paragraph_dedup` used by the gate query, the e2e pipeline
    and the sf0.1 smoke; restore the original tokens afterwards with
    ``F.translate(col, sep, ' ')``."""
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(n)
    )
    return df.select(
        F.col(id_col),
        F.array_join(
            F.transform(
                starts, lambda s: F.array_join(F.slice(toks, s + 1, n), " ")
            ),
            sep,
        ).alias(text_col),
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 0,
    collision_safe: bool = False,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Corpus-wide first-occurrence paragraph dedup.

    Returns ``(id_col, out_col, n_paragraphs, n_kept)`` — every document
    with its surviving paragraphs rejoined by ``sep`` in original order.
    Paragraphs shorter than ``min_chars`` are exempt (kept everywhere):
    short connectives ("Introduction") are not boilerplate worth a
    corpus-wide election, and exempting them bounds the group count.
    First occurrence = the minimum (doc_id, position) holding the
    paragraph, so verdicts are deterministic and engine-portable.
    """
    # literal-quote the separator: F.split takes a REGEX while array_join
    # reassembles with the literal — without quoting, a '. ' separator
    # would split on any-char+space.  NULL text is treated as empty so
    # counts stay non-NULL (the one-empty-paragraph case, exempt below).
    sep_re = _quote_regex(sep)
    text = F.coalesce(F.col(text_col), F.lit(""))
    paras = df.select(
        F.col(id_col).alias("_did"),
        F.posexplode(F.split(text, F.lit(sep_re), -1)).alias(
            "_pos", "_para"
        ),
    )
    # empty paragraphs (consecutive/leading/trailing separators) are
    # always exempt: electing them would collapse every later document's
    # blank structure to the corpus-wide first blank
    elect = F.length("_para") >= max(int(min_chars), 1)
    key = (
        F.col("_para") if collision_safe else F.xxhash64("_para")
    ).alias("_k")
    contested = paras.where(elect)
    winners = (
        contested.select(key, "_did", "_pos")
        .groupBy("_k")
        .agg(
            F.min_by(
                F.struct("_did", "_pos"), F.struct("_did", "_pos")
            ).alias("_w")
        )
        .select("_k", F.col("_w._did").alias("_wdid"), F.col("_w._pos").alias("_wpos"))
    )
    kept = (
        contested.select(key, "_did", "_pos", "_para")
        .join(winners, "_k")
        .where((F.col("_did") == F.col("_wdid")) & (F.col("_pos") == F.col("_wpos")))
        .select("_did", "_pos", "_para")
        .unionByName(paras.where(~elect).select("_did", "_pos", "_para"))
    )
    # per-doc paragraph count straight off the split array — a map-only
    # projection, not an explode+aggregate (one less exchange and one
    # less corpus-wide Generate)
    totals = df.select(
        F.col(id_col).alias("_did"),
        F.size(F.split(text, F.lit(sep_re), -1))
        .cast("long")
        .alias("n_paragraphs"),
    )
    survivors = kept.groupBy("_did").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_para"))),
                lambda s: s["_para"],
            ),
            sep,
        ).alias(out_col),
        F.count("*").alias("n_kept"),
    )
    # left join from totals: a document whose EVERY paragraph lost its
    # election still comes back (empty text, n_kept 0)
    return totals.join(survivors, "_did", "left").select(
        F.col("_did").alias(id_col),
        F.coalesce(out_col, F.lit("")).alias(out_col),
        "n_paragraphs",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )

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
- The paragraph BYTES cross the wire at most once — in the verdict
  join against the (tiny relative to the corpus) winner table, hashed
  on the same 64-bit key.  The HEAVY HITTERS never cross at all: the
  election already counts each fingerprint's occurrences, so the top
  ``heavy_hitters`` most-duplicated fingerprints (the corpus-wide
  footer — exactly the rows that would make the verdict join's hash
  key hot) are broadcast with their winners and resolved MAP-SIDE;
  only the long tail of low-count fingerprints enters the shuffled
  verdict join, where no key is hot by construction.
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


def election(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 0,
    collision_safe: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The first-occurrence election, exposed as a seam so tests can
    assert on the verdict join's inputs.  Returns
    ``(paras, exempt, occurrences, winners)``:

    - ``paras`` — every (``_did``, ``_pos``, ``_para``) row (exploded);
    - ``exempt`` — the never-elected subset (below ``min_chars`` or
      empty), kept everywhere.  Returned HERE, alongside the contested
      complement, so the exemption predicate lives in exactly one
      place — a caller re-stating it out-of-band could silently drop
      or duplicate paragraphs if the predicates drifted;
    - ``occurrences`` — the contested subset with its fingerprint
      ``_k`` (the text-carrying side of the verdict join);
    - ``winners`` — one row per fingerprint: ``(_k, _wdid, _wpos, _n)``,
      the elected first occurrence plus the occurrence COUNT (computed
      map-side inside the same aggregation) that ranks heavy hitters.
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
    exempt = paras.where(~elect).select("_did", "_pos", "_para")
    winners = (
        contested.select(key, "_did", "_pos")
        .groupBy("_k")
        .agg(
            F.min_by(
                F.struct("_did", "_pos"), F.struct("_did", "_pos")
            ).alias("_w"),
            F.count("*").alias("_n"),
        )
        .select(
            "_k",
            F.col("_w._did").alias("_wdid"),
            F.col("_w._pos").alias("_wpos"),
            "_n",
        )
    )
    occurrences = contested.select(key, "_did", "_pos", "_para")
    return paras, exempt, occurrences, winners


def heavy_winners(winners: DataFrame, heavy_hitters: int) -> DataFrame:
    """The broadcast candidate set for the verdict join's heavy-hitter
    bypass: the ``heavy_hitters`` fingerprints with the MOST occurrences
    (count > 1 — a unique paragraph's only occurrence is its own winner,
    so broadcasting it buys nothing), ties broken by fingerprint so the
    set is deterministic.  A global top-N over the election output is a
    map-side partial top-N per partition + an N-row driver merge — no
    extra shuffle."""
    return (
        winners.where(F.col("_n") > 1)
        .orderBy(F.desc("_n"), F.asc("_k"))
        .limit(int(heavy_hitters))
        .select("_k", "_wdid", "_wpos", "_n")
    )


def reassemble(
    df: DataFrame,
    kept: DataFrame,
    id_col: str,
    text_col: str,
    sep: str,
    out_col: str,
) -> DataFrame:
    """Rejoin surviving (``_did``, ``_pos``, ``_para``) rows into
    per-document texts: ``(id_col, out_col, n_paragraphs, n_kept)``.
    The shared tail of :func:`paragraph_dedup` and the streaming
    ingest twin (streaming/paradedup_ingest.py) — per-doc totals come
    map-only off the split array, survivors reassemble with one
    grouped sort, and a document whose every paragraph lost still
    comes back (empty text, n_kept 0)."""
    sep_re = _quote_regex(sep)
    text = F.coalesce(F.col(text_col), F.lit(""))
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
    return totals.join(survivors, "_did", "left").select(
        F.col("_did").alias(id_col),
        F.coalesce(out_col, F.lit("")).alias(out_col),
        "n_paragraphs",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 0,
    collision_safe: bool = False,
    out_col: str = "text_deduped",
    heavy_hitters: int = 1024,
) -> DataFrame:
    """Corpus-wide first-occurrence paragraph dedup.

    Returns ``(id_col, out_col, n_paragraphs, n_kept)`` — every document
    with its surviving paragraphs rejoined by ``sep`` in original order.
    Paragraphs shorter than ``min_chars`` are exempt (kept everywhere):
    short connectives ("Introduction") are not boilerplate worth a
    corpus-wide election, and exempting them bounds the group count.
    First occurrence = the minimum (doc_id, position) holding the
    paragraph, so verdicts are deterministic and engine-portable.

    ``heavy_hitters``: the top-N most-duplicated fingerprints are
    resolved via a broadcast join (map-side) instead of the shuffled
    verdict join — the corpus-wide footer's billion text copies never
    enter an exchange (see the module docstring).  ``0`` disables the
    bypass (identical verdicts, single shuffled join).
    """
    _, exempt, occ, winners = election(
        df, id_col, text_col, sep, min_chars, collision_safe
    )
    is_win = (F.col("_did") == F.col("_wdid")) & (
        F.col("_pos") == F.col("_wpos")
    )
    if heavy_hitters > 0:
        heavy = heavy_winners(winners, heavy_hitters)
        # heavy occurrences resolve MAP-SIDE (broadcast hash join + a
        # broadcast anti join) — their text never enters an exchange;
        # the winners exchange feeding both `heavy` and the tail join
        # below is identical, so Spark's ReuseExchange computes the
        # election once
        kept_contested = (
            occ.join(F.broadcast(heavy.drop("_n")), "_k")
            .where(is_win)
            .select("_did", "_pos", "_para")
            .unionByName(
                occ.join(F.broadcast(heavy.select("_k")), "_k", "left_anti")
                .join(winners.drop("_n"), "_k")
                .where(is_win)
                .select("_did", "_pos", "_para")
            )
        )
    else:
        kept_contested = (
            occ.join(winners.drop("_n"), "_k")
            .where(is_win)
            .select("_did", "_pos", "_para")
        )
    kept = kept_contested.unionByName(exempt)
    return reassemble(df, kept, id_col, text_col, sep, out_col)

"""Byte-pair-encoding tokenizer — train a merge table, encode a corpus.

Public prior art: Sennrich et al. 2016 (BPE for NMT) and the GPT-2
tokenizer (Radford 2019): learn the ``n_merges`` most frequent symbol
pairs from word frequencies, then tokenize by applying merges in rank
order per word.  Every LLM pretraining pipeline runs exactly this
shape: train once (usually on a sample), encode everything.

Distributed re-expression:

- **Word counts** (:func:`word_counts`): the only corpus-sized stage of
  training — a map-only token explode + ONE shuffle on the word key
  with map-side partials (the Zipf head reduces before the exchange).
- **Merge learning** (:func:`train_bpe`): classic BPE over the
  ``(word, count)`` table DRIVER-SIDE.  This is the standard practical
  factoring (fastBPE, HuggingFace tokenizers do the same): the word-
  frequency table is vocabulary-sized, not corpus-sized — millions of
  rows for a 100 TB corpus — and each merge iteration only touches
  words containing the merged pair.  ``max_words`` turns a pathological
  vocabulary into a loud error instead of a driver OOM; cap the table
  with a frequency floor (``min_count``) before collecting.
- **Encoding** (:func:`encode`): map-only, zero shuffles — the merge
  ranks broadcast in the UDF closure (a list of pairs — a few MB for
  a 50k vocab) and each Arrow batch tokenizes independently with a
  per-batch word cache (natural text repeats words heavily, so the
  greedy merge loop runs once per DISTINCT word per batch).  This is
  the 100 TB hot path and it scales linearly with executors.

Sequential-per-word greedy merging is not SQL-expressible (same class
as sequence packing), so the operator is tests-only by design; the
Spark-side plumbing (schema, Arrow batching, plan shape) is asserted
in tests/test_bpe.py and the full-corpus encode runs in the opbench
battery and the sf0.1 scale smoke.

Reference analog: none (north-star tokenization family).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "word_counts",
    "train_bpe",
    "encode",
    "decode_tokens",
    "EOW",
    "GATE_MERGES",
]

# end-of-word marker (Sennrich 2016 §3.2) — distinguishes "est</w>"
# in "newest" from "est" mid-word, so detokenization is unambiguous
EOW = "▁"

#: Pinned merge table for the correctness gate (the ``bpe`` branch of
#: q_array_ops): ``train_bpe(word_counts(sf0.01 documents), 16)`` — a
#: pure function of the driver's public test data, inlined as a constant
#: so the Spark query and its DuckDB oracle replay the SAME table at any
#: sf (oracle_sql() strings are static).  The oracle re-applies these
#: merges per distinct word as a recursive CTE (rank order, all
#: non-overlapping occurrences per step — exactly :func:`_encode_word`'s
#: greedy loop), so every token boundary and count is hash-exact.
GATE_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("e", EOW),
    ("n", EOW),
    ("er", EOW),
    ("o", "w"),
    ("ow", EOW),
    ("o", "r"),
    ("s", "t"),
    ("h", EOW),
    ("a", "t"),
    ("l", "u"),
    ("i", "n"),
    ("a", EOW),
    ("g", EOW),
    ("y", EOW),
    ("a", "r"),
]


def word_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus word-frequency table ``(word, cnt)``: map-only whitespace
    explode + ONE shuffle on the word key (map-side partials)."""
    return (
        df.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _pair_counts(
    vocab: dict[tuple[str, ...], int],
) -> Counter[tuple[str, str]]:
    pairs: Counter[tuple[str, str]] = Counter()
    for syms, cnt in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += cnt
    return pairs


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    counts: DataFrame | dict[str, int],
    n_merges: int,
    min_count: int = 1,
    max_words: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn the ``n_merges`` highest-frequency symbol merges from a
    :func:`word_counts` table (or a plain ``{word: count}`` dict).
    Deterministic: frequency ties break lexicographically, matching a
    fixed total order across runs and platforms.  Returns the ordered
    merge list — rank IS priority, feed it to :func:`encode`.

    ``min_count`` floors the word frequencies BEFORE the driver
    collect; ``max_words`` hard-caps the collected vocabulary (loud
    error, not an OOM — raise ``min_count`` to shrink the table)."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    if isinstance(counts, DataFrame):
        capped = counts.where(F.col("cnt") >= int(min_count))
        n = capped.count()
        if n > max_words:
            raise ValueError(
                f"word table has {n} rows > max_words={max_words}; "
                "raise min_count to shrink it before collecting"
            )
        items = [(r["word"], r["cnt"]) for r in capped.collect()]
    else:
        items = [
            (w, c) for w, c in counts.items() if c >= int(min_count)
        ]
        if len(items) > max_words:
            raise ValueError(
                f"word table has {len(items)} rows > max_words={max_words}"
            )
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in items:
        syms = tuple(word) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(cnt)

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            _merge_word(syms, best): cnt for syms, cnt in vocab.items()
        }
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    syms: tuple[str, ...] = tuple(word) + (EOW,)
    while len(syms) > 1:
        ranked = [
            (ranks[p], p)
            for p in set(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not ranked:
            break
        syms = _merge_word(syms, min(ranked)[1])
    return syms


def encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Tokenize every document with a trained merge list: returns
    ``(id_col, tokens_col array<string>, n_bpe_tokens)``.  Map-only
    (``mapInPandas`` — zero shuffles); the merge ranks ship once per
    task in the closure and each Arrow batch keeps a per-batch cache
    keyed on the distinct words it sees (the greedy merge loop is
    amortized to once per distinct word).  NULL text encodes to an
    empty token array."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    if len(ranks) != len(merges):
        raise ValueError("merge list contains duplicates")
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField(tokens_col, ArrayType(StringType())),
            StructField("n_bpe_tokens", LongType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple[str, ...]] = {}

        def tok(text: str | None) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                out.extend(enc)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(tok)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    tokens_col: toks,
                    "n_bpe_tokens": toks.map(len).astype("int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def decode_tokens(tokens: list[str]) -> str:
    """Inverse of per-word encoding: concatenate and split on the
    end-of-word marker (driver-side helper for tests/debugging)."""
    return " ".join(w for w in "".join(tokens).split(EOW) if w)

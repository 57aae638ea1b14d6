"""Sequence packing — assemble documents into token-budget-bounded
training sequences, the step between a curated corpus and a dataloader.

Reference analog: none (north-star extension, BASELINE.json).

Why this shape: optimal bin packing is NP-hard and even greedy next-fit
is inherently sequential (each decision depends on the running bin
fill), so a naive implementation becomes a driver-side loop — the #1
anti-pattern at 100 TB.  The distributed contract here:

1. hash-partition documents into ``n_groups`` independent streams
   (pure function of the key — deterministic under repartitioning);
2. within each group, order by (hash bucket, key) and run NEXT-FIT
   packing in one Arrow-batched ``applyInPandas`` pass — state is
   group-local, so groups pack embarrassingly parallel;
3. emit (doc, pack_id) with pack_id globally unique as
   (group, local_pack).

Guarantees (pinned in tests/test_packing.py):
- every pack's token total ≤ budget, provided every doc ≤ budget
  (oversized docs raise — callers chunk first);
- every doc lands in exactly one pack;
- deterministic in (keys, seed, budget, n_groups) — independent of
  input partitioning or row order;
- next-fit's classic bound: all packs except possibly the last per
  group are > budget/2 full whenever all docs ≤ budget/2 — so
  utilization stays near the offline packer's at corpus scale (and the
  number of groups only adds ≤ n_groups underfull tail packs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from .split import _sample_bucket


def next_fit_assign(
    tokens: list[int], budget: int
) -> tuple[list[int], list[int]]:
    """The pure next-fit kernel: for docs in the given order, return
    (pack index, position inside pack) per doc.  Opens a new pack when
    the next doc would overflow the current one.  Extracted so the
    Arrow UDF and the hypothesis property tests exercise the SAME code
    (tests/test_properties.py pins budget bound, coverage, and the
    >½-utilization next-fit guarantee over random inputs)."""
    packs, pos = [], []
    cur_pack, cur_fill, cur_pos = 0, 0, 0
    for tok in tokens:
        if cur_fill + tok > budget and cur_fill > 0:
            cur_pack += 1
            cur_fill, cur_pos = 0, 0
        packs.append(cur_pack)
        pos.append(cur_pos)
        cur_fill += int(tok)
        cur_pos += 1
    return packs, pos


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_groups: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Append ``group_id``, ``pack_id`` (globally unique string
    "<group>/<local>") and ``pack_pos`` (0-based position inside the
    pack) via per-group next-fit packing.

    One shuffle (the groupBy on ``group_id``) + one Arrow pass; at
    cluster scale ``n_groups`` should be ≥ executor-core count so every
    core packs its own stream.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    src = df.select(
        F.col(id_col).alias("doc_key"),
        F.col(token_col).cast("long").alias("n_tok"),
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_groups))
        .cast("int")
        .alias("group_id"),
        _sample_bucket(id_col, seed + 1).alias("__ord"),
    )
    out_schema = StructType(
        [
            src.schema["doc_key"],
            StructField("n_tok", src.schema["n_tok"].dataType, True),
            StructField("group_id", src.schema["group_id"].dataType, True),
            src.schema["__ord"],
        ]
        + [
            StructField("pack_local", src.schema["n_tok"].dataType, False),
            StructField("pack_pos", src.schema["n_tok"].dataType, False),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ord", "doc_key"], kind="mergesort")
        over = pdf["n_tok"] > budget
        if over.any():
            bad = pdf.loc[over, "doc_key"].iloc[0]
            raise ValueError(
                f"doc {bad!r} exceeds pack budget {budget}; chunk oversized "
                "docs before packing"
            )
        packs, pos = next_fit_assign([int(t) for t in pdf["n_tok"]], budget)
        return pdf.assign(pack_local=packs, pack_pos=pos)

    packed = src.groupBy("group_id").applyInPandas(_pack, out_schema)
    return (
        packed.withColumn(
            "pack_id",
            F.concat_ws(
                "/", F.col("group_id").cast("string"),
                F.col("pack_local").cast("string"),
            ),
        )
        .select(
            F.col("doc_key").alias(id_col),
            "n_tok",
            "group_id",
            "pack_id",
            "pack_pos",
        )
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill statistics (n_docs, tokens, utilization) — the
    audit a dataloader pipeline runs after packing."""
    return packed.groupBy("group_id", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("tokens"),
        F.round(F.sum("n_tok") / F.lit(float(budget)), 6).alias("utilization"),
    )

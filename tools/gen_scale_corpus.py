#!/usr/bin/env python
"""Derive a LARGER synthetic corpus from the driver's sf0.1 tables for
scale measurements (VERDICT r7 next-round #1: one measured point above
sf0.1 to convert the 100 TB plan-shape arguments into data).

The driver only ships sf ≤ 0.1; this script writes an sf-(0.1·M) dir
whose ``documents`` / ``embeddings`` tables are drawn from the SAME
distributions as the driver's generator, measured off sf0.1 itself:

- documents: token length sampled from the empirical sf0.1 length
  distribution, tokens iid from the empirical 31-word vocabulary,
  lang/source from their empirical marginals (lang is independent of
  text in the driver's data — verified), ``n_chars = len(text)``.
  The duplicate structure is reproduced at the same DENSITY, because
  that is what the dedup operators' cost scales with: ~10% of docs
  form disjoint near-dup pairs (0.0512 pairs per doc) (one member is the other with 2 token
  edits — sf0.1 pairs share ~45 of ~47 8-gram shingles, i.e. a couple
  of edits), and ~0.16% are byte-exact copies.  Keeping the per-doc
  candidate density constant is what makes the sfM/sf0.1 runtime ratio
  interpretable as data scaling rather than workload-shape drift.
- embeddings: the sf0.1 vectors are isotropic unit-norm float32 in 64
  dims with labels uniform over 10 and independent of the vector
  (verified: per-label centroids have norm ≈ 1/√n — pure noise), so
  the scaled table is seeded Gaussian → L2-normalized, same dtypes.

- events (round-8 extension): users scale with the corpus (the
  driver's own behavior), event_id ts-ordered, marginals measured —
  so the streaming-analog family (audits, windows, asof/range
  self-joins) gets a scale point too.

- relational star schema (round-8 late extension): customer / supplier
  / part / orders / lineitem row-bootstrapped ×M with dense re-keying
  and preserved lines-per-order fan-out; nation/region stay fixed (as
  in TPC-H proper).  The dir is therefore a FULLY scaled sf-(0.1·M)
  corpus — every family, including q_tpch, can be measured on it.

Deterministic: one fixed numpy PCG64 seed; no wall-clock anywhere.

Vocabulary modes (round 9, VERDICT r8 next #2): the driver's synthetic
documents draw from a DEGENERATE 31-word vocabulary, which saturates
the 8-gram shingle space — at 10× data the LSH candidate BOUND grows
~98× (measured, §C.10) and the shingle-dedup ratios carry an asterisk.
``--vocab zipf`` swaps in a synthetic Zipf(s=1.1) vocabulary of
``--vocab-size`` words (default 20,000 — a realistic unique-token
count for a 50k-doc crawl slice), everything else (length
distribution, lang/source marginals, near/exact-dup densities)
unchanged, so the shingle-based dedup family can be measured on
text whose n-gram collision structure resembles real corpora.
``--tables`` restricts generation to a comma-listed subset (the Zipf
corpora only need ``documents``).

Usage:  python tools/gen_scale_corpus.py [--mult 10] [--src /root/testdata/sf0.1]
            [--out /root/repo/.scale/sf1] [--vocab empirical|zipf]
            [--vocab-size 20000] [--zipf-s 1.1] [--tables documents,...]
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 0x5F1C0DE
NEAR_DUP_PAIRS_PER_DOC = 0.0512  # near-dup pairs per doc (sf0.1: 256 pairs / 5000 docs)
EXACT_DUP_FRAC = 0.0016  # fraction of docs that are byte-exact copies
NEAR_DUP_EDITS = 2  # token edits between near-dup pair members

# Planted-truth constants (round 9, VERDICT r8 next #4): the generator
# KNOWS which rows it made similar, so it emits that knowledge as a
# sidecar (planted_truth.json) and the at-scale correctness rig
# (tools/scale_sweep.py) verifies containment/recall against it — an
# exact ground truth that costs O(planted), where the full brute-force
# oracle would cost O(n²) at sf1.
PLANT_EMB_SEEDS = 16  # seeded ANN query vectors
PLANT_EMB_NEIGHBORS = 4  # planted neighbors per seed
PLANT_EMB_EPS = 0.05  # noise radius: cos(seed, nb) ≈ 0.9988, vs the
# max random cosine over 5M 64-dim pairs ≈ 0.65 — planted neighbors are
# the top-k of their seed with enormous margin


def _empirical_docs(src: str):
    """(vocab, vocab_probs, lengths, langs, lang_probs, sources) measured
    from the source documents table."""
    t = pq.read_table(f"{src}/documents.parquet", columns=["text", "lang", "source"])
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    from collections import Counter

    vocab_counts = Counter()
    lengths = []
    for tx in texts:
        toks = tx.split(" ")
        lengths.append(len(toks))
        vocab_counts.update(toks)
    vocab = sorted(vocab_counts)
    tot = sum(vocab_counts.values())
    vprobs = np.array([vocab_counts[w] / tot for w in vocab])
    lang_counts = Counter(langs)
    lang_vals = sorted(lang_counts)
    lprobs = np.array([lang_counts[v] / len(langs) for v in lang_vals])
    return vocab, vprobs, np.array(lengths), lang_vals, lprobs, sorted(set(sources))


def zipf_vocab(
    size: int, s: float, rng: np.random.Generator
) -> tuple[list[str], np.ndarray]:
    """Synthetic vocabulary of ``size`` distinct lowercase words with
    Zipf-law probabilities p(rank) ∝ rank^-s.  Word SHAPES are random
    3–9-letter strings (drawn once, deterministically) so shingle
    hashing sees realistic byte diversity; an index suffix guarantees
    uniqueness without a rejection loop."""
    if size < 2:
        raise ValueError(f"vocab size must be ≥ 2, got {size}")
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 10, size=size)
    words = [
        "".join(letters[rng.integers(0, 26, size=ln)]) + str(i)
        for i, ln in enumerate(lens)
    ]
    probs = 1.0 / np.arange(1, size + 1, dtype=np.float64) ** s
    return words, probs / probs.sum()


def gen_documents(
    src: str,
    mult: int,
    rng: np.random.Generator,
    vocab_mode: str = "empirical",
    vocab_size: int = 20_000,
    zipf_s: float = 1.1,
) -> pa.Table:
    vocab, vprobs, lengths, lang_vals, lprobs, sources = _empirical_docs(src)
    if vocab_mode == "zipf":
        vocab, vprobs = zipf_vocab(vocab_size, zipf_s, rng)
    elif vocab_mode != "empirical":
        raise ValueError(f"vocab_mode must be empirical|zipf, got {vocab_mode!r}")
    n_src = pq.read_metadata(f"{src}/documents.parquet").num_rows
    n = n_src * mult

    lens = rng.choice(lengths, size=n)
    toks_flat = rng.choice(len(vocab), size=int(lens.sum()), p=vprobs)
    vocab_arr = np.array(vocab, dtype=object)
    texts: list[str] = []
    off = 0
    for ln in lens:
        texts.append(" ".join(vocab_arr[toks_flat[off : off + ln]]))
        off += ln

    # near-dup pairs at the measured density: doc j := doc i, 2 edits
    n_pairs = int(round(NEAR_DUP_PAIRS_PER_DOC * n))
    involved = rng.choice(n, size=2 * n_pairs, replace=False)
    near_pairs: list[list[int]] = []
    for p in range(n_pairs):
        i, j = int(involved[2 * p]), int(involved[2 * p + 1])
        toks = texts[i].split(" ")
        for pos in rng.choice(len(toks), size=min(NEAR_DUP_EDITS, len(toks)), replace=False):
            toks[pos] = vocab[int(rng.integers(len(vocab)))]
        texts[j] = " ".join(toks)
        near_pairs.append([i, j])
    # byte-exact copies at the measured density (copy targets may be
    # anyone, including a near-dup member — same as organic crawl dups)
    n_exact = int(round(EXACT_DUP_FRAC * n))
    dst = rng.choice(n, size=n_exact, replace=False)
    srcs_idx = rng.choice(n, size=n_exact)
    copied: list[tuple[int, int]] = []
    for a, b in zip(dst, srcs_idx):
        if int(a) != int(b):
            texts[int(a)] = texts[int(b)]
            copied.append((int(a), int(b)))

    # Ground truth is recorded AFTER all mutation: a copy SOURCE that is
    # itself overwritten by a later copy leaves (a, b) no longer equal
    # (~47% of sf1 corpora hit this at least once), so exact_pairs keeps
    # only pairs still byte-identical in the final corpus.  A later
    # overwrite of a near-dup MEMBER likewise voids that planted pair;
    # the voided list lets the rig skip them instead of asserting stale
    # text relationships.
    exact_pairs = [[a, b] for a, b in copied if texts[a] == texts[b]]
    overwritten = {a for a, _ in copied}
    truth = {
        "near_pairs": near_pairs,
        "exact_pairs": exact_pairs,
        "near_pairs_voided": sorted(
            [p for p in near_pairs if p[0] in overwritten or p[1] in overwritten],
        ),
        "near_dup_edits": NEAR_DUP_EDITS,
    }
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(
                np.array(lang_vals, dtype=object)[
                    rng.choice(len(lang_vals), size=n, p=lprobs)
                ]
            ),
            "source": pa.array(
                np.array(sources, dtype=object)[rng.choice(len(sources), size=n)]
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    return table, truth


def gen_embeddings(src: str, mult: int, rng: np.random.Generator):
    meta = pq.read_table(f"{src}/embeddings.parquet", columns=["embedding", "label"])
    d = len(meta.column("embedding")[0].as_py())
    n_labels = int(max(meta.column("label").to_pylist())) + 1
    n = meta.num_rows * mult

    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    # plant seeded ANN ground truth in the TAIL rows (ids unchanged, row
    # count unchanged): seed s sits at base, its k neighbors at
    # base+1..base+k are seed + eps·noise renormalized — cos ≈ 0.9988,
    # unreachable by any random pair, so the seed's exact top-k IS the
    # planted set.  float32 end-to-end, same dtype as the organic rows.
    n_slots = PLANT_EMB_SEEDS * (1 + PLANT_EMB_NEIGHBORS)
    neighbors: dict[int, list[int]] = {}
    if n >= 2 * n_slots:
        start = n - n_slots
        for s in range(PLANT_EMB_SEEDS):
            base = start + s * (1 + PLANT_EMB_NEIGHBORS)
            seed_vec = v[base]
            nb_ids = list(range(base + 1, base + 1 + PLANT_EMB_NEIGHBORS))
            for j in nb_ids:
                noise = rng.standard_normal(d).astype(np.float32)
                noise /= np.linalg.norm(noise)
                # unit-norm noise scaled by eps ⇒ cos(seed, nb) =
                # (1 + eps·⟨seed,noise⟩)/‖seed+eps·noise‖ ≈ 1/√(1+eps²)
                # ≈ 0.9988 — a deterministic margin, not dimension-dependent
                nb = seed_vec + PLANT_EMB_EPS * noise
                v[j] = nb / np.linalg.norm(nb)
            neighbors[base] = nb_ids
    truth = {
        "seed_neighbors": {str(k): ids for k, ids in neighbors.items()},
        "eps": PLANT_EMB_EPS,
    }
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(n_labels, size=n).astype(np.int32)
            ),
        }
    )
    return table, truth


def gen_events(src: str, mult: int, rng: np.random.Generator) -> pa.Table:
    """Scaled events stream from the measured marginals: users scale
    WITH the corpus (driver behavior — sf0.01 has 150 users, sf0.1 has
    1500, both ~66 events/user), so per-user window partitions keep a
    constant size and the per-user audits scale by user count, not by
    partition depth.  ``event_id`` is assigned in ts order (measured:
    zero inversions in the source), values bootstrap-resample the
    source column, ``props`` replays the ``{"k": 0..99}`` payload."""
    t = pq.read_table(f"{src}/events.parquet", columns=["ts", "user_id", "event_type", "value"])
    n_src = t.num_rows
    n = n_src * mult
    n_users = len(set(t.column("user_id").to_pylist())) * mult
    from collections import Counter

    tcounts = Counter(t.column("event_type").to_pylist())
    types = sorted(tcounts)
    tprobs = np.array([tcounts[x] / n_src for x in types])
    ts_src = t.column("ts").to_pylist()
    lo = min(ts_src).timestamp() * 1_000_000
    hi = max(ts_src).timestamp() * 1_000_000

    ts_us = np.sort(rng.integers(int(lo), int(hi), size=n))
    values = rng.choice(np.asarray(t.column("value").to_pylist()), size=n)
    ks = rng.integers(0, 100, size=n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n).astype(np.int64)),
            "event_type": pa.array(
                np.array(types, dtype=object)[rng.choice(len(types), size=n, p=tprobs)]
            ),
            "value": pa.array(values, type=pa.float64()),
            "props": pa.array([f'{{"k": {int(k)}}}' for k in ks], type=pa.string()),
        }
    )


def _bootstrap(src_path: str, n: int, rng: np.random.Generator) -> pa.Table:
    """Row-bootstrap: sample ``n`` whole rows with replacement — exactly
    preserves every column marginal AND every within-row joint the
    source has (measured: the driver's relational columns are
    independent draws, so whole-row resampling is the faithful and
    simplest scale-up)."""
    t = pq.read_table(src_path)
    idx = pa.array(rng.integers(0, t.num_rows, size=n))
    return t.take(idx)


def _set(t: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    return t.set_column(t.schema.get_field_index(name), name, arr)


def gen_relational(src: str, mult: int, rng: np.random.Generator) -> dict[str, pa.Table]:
    """Scaled TPC-H-ish star schema (round-8 late extension): customer /
    supplier / part / orders / lineitem row-bootstrapped ×mult with
    dense re-keying (keys are 0..N-1 sequential in the source);
    nation/region stay fixed, as in TPC-H proper.  FK consistency by
    re-draw: o_custkey uniform over the scaled customers, l_partkey /
    l_suppkey uniform over the scaled parts/suppliers (measured source
    behavior — 98.5% of (partkey, suppkey) pairs unique, ~30 suppliers
    per part, the density the derived-partsupp CTE scales with);
    lineitem keeps the empirical lines-per-order distribution so join
    fan-outs are preserved.  o_totalprice is measured to be independent
    of the order's lineitems in the source, so the bootstrap keeps it.
    """
    out: dict[str, pa.Table] = {}
    n_cust = pq.read_metadata(f"{src}/customer.parquet").num_rows * mult
    n_supp = pq.read_metadata(f"{src}/supplier.parquet").num_rows * mult
    n_part = pq.read_metadata(f"{src}/part.parquet").num_rows * mult
    n_ord = pq.read_metadata(f"{src}/orders.parquet").num_rows * mult

    cust = _bootstrap(f"{src}/customer.parquet", n_cust, rng)
    cust = _set(cust, "c_custkey", pa.array(np.arange(n_cust, dtype=np.int64)))
    cust = _set(
        cust, "c_name",
        pa.array([f"Customer#{i:09d}" for i in range(n_cust)], type=pa.string()),
    )
    out["customer"] = cust

    supp = _bootstrap(f"{src}/supplier.parquet", n_supp, rng)
    supp = _set(supp, "s_suppkey", pa.array(np.arange(n_supp, dtype=np.int64)))
    supp = _set(
        supp, "s_name",
        pa.array([f"Supplier#{i:09d}" for i in range(n_supp)], type=pa.string()),
    )
    out["supplier"] = supp

    part = _bootstrap(f"{src}/part.parquet", n_part, rng)
    out["part"] = _set(
        part, "p_partkey", pa.array(np.arange(n_part, dtype=np.int64))
    )

    orders = _bootstrap(f"{src}/orders.parquet", n_ord, rng)
    orders = _set(orders, "o_orderkey", pa.array(np.arange(n_ord, dtype=np.int64)))
    orders = _set(
        orders, "o_custkey",
        pa.array(rng.integers(0, n_cust, size=n_ord).astype(np.int64)),
    )
    out["orders"] = orders

    # lines-per-order from the empirical distribution → preserved fan-out
    li_src = pq.read_table(f"{src}/lineitem.parquet")
    counts = np.bincount(
        np.bincount(li_src.column("l_orderkey").to_numpy(zero_copy_only=False))
    )[1:]  # counts[k-1] = number of orders with k lines
    ks = np.arange(1, len(counts) + 1)
    per_order = rng.choice(ks, size=n_ord, p=counts / counts.sum())
    n_li = int(per_order.sum())
    li = li_src.take(pa.array(rng.integers(0, li_src.num_rows, size=n_li)))
    li = _set(li, "l_orderkey", pa.array(np.repeat(np.arange(n_ord, dtype=np.int64), per_order)))
    linenum = np.concatenate([np.arange(1, k + 1) for k in per_order])
    li = _set(li, "l_linenumber", pa.array(linenum.astype(li_src.schema.field("l_linenumber").type.to_pandas_dtype())))
    li = _set(li, "l_partkey", pa.array(rng.integers(0, n_part, size=n_li).astype(np.int64)))
    li = _set(li, "l_suppkey", pa.array(rng.integers(0, n_supp, size=n_li).astype(np.int64)))
    out["lineitem"] = li
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    ap.add_argument("--vocab", choices=("empirical", "zipf"), default="empirical")
    ap.add_argument("--vocab-size", type=int, default=20_000)
    ap.add_argument("--zipf-s", type=float, default=1.1)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list restricting generation (documents, embeddings, "
        "events, relational); default: everything + fixed-dim copies",
    )
    args = ap.parse_args()
    wanted = (
        {s.strip() for s in args.tables.split(",") if s.strip()}
        if args.tables
        else {"documents", "embeddings", "events", "relational"}
    )
    known = {"documents", "embeddings", "events", "relational"}
    if wanted - known:
        raise SystemExit(f"--tables names unknown tables: {sorted(wanted - known)}")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)

    truth: dict = {"mult": args.mult, "src": args.src, "vocab": args.vocab}
    if "documents" in wanted:
        docs, doc_truth = gen_documents(
            args.src, args.mult, rng,
            vocab_mode=args.vocab, vocab_size=args.vocab_size, zipf_s=args.zipf_s,
        )
        pq.write_table(docs, out / "documents.parquet")
        truth["documents"] = doc_truth
        print(
            f"documents: {docs.num_rows} rows (vocab={args.vocab}, "
            f"{len(doc_truth['near_pairs'])} planted near pairs, "
            f"{len(doc_truth['exact_pairs'])} exact)"
        )
    if "embeddings" in wanted:
        emb, emb_truth = gen_embeddings(args.src, args.mult, rng)
        pq.write_table(emb, out / "embeddings.parquet")
        truth["embeddings"] = emb_truth
        print(
            f"embeddings: {emb.num_rows} rows "
            f"({len(emb_truth['seed_neighbors'])} planted ANN seeds)"
        )
    if "events" in wanted:
        ev = gen_events(args.src, args.mult, rng)
        pq.write_table(ev, out / "events.parquet")
        print(f"events: {ev.num_rows} rows")
    rel_names: set[str] = set()
    if "relational" in wanted:
        rel = gen_relational(args.src, args.mult, rng)
        rel_names = set(rel)
        for name, t in rel.items():
            pq.write_table(t, out / f"{name}.parquet")
            print(f"{name}: {t.num_rows} rows")

    if args.tables is None:
        scaled = {f"{n}.parquet" for n in rel_names} | {
            "documents.parquet", "embeddings.parquet", "events.parquet"
        }
        for f in sorted(Path(args.src).glob("*.parquet")):
            if f.name not in scaled:
                shutil.copyfile(f, out / f.name)
                print(f"copied {f.name} (fixed dimension)")

    import json

    # a --tables-restricted run must not destroy sidecar truth for the
    # tables it did NOT regenerate — merge over any existing sidecar
    sidecar = out / "planted_truth.json"
    if sidecar.exists():
        with open(sidecar) as f:
            prev = json.load(f)
        for k in ("documents", "embeddings"):
            if k in prev and k not in truth:
                truth[k] = prev[k]
    with open(sidecar, "w") as f:
        json.dump(truth, f)
    print(f"planted_truth.json: {sorted(k for k in truth if isinstance(truth[k], dict))}")


if __name__ == "__main__":
    main()

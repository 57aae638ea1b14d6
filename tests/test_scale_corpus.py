"""Scale-corpus generator (tools/gen_scale_corpus.py): deterministic
output, schema fidelity, and the measured duplicate densities that make
the sf1/sf0.1 bench ratio (BASELINE.md §C.10) read as data scaling.
Pure pyarrow/numpy — no Spark session."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from gen_scale_corpus import (  # noqa: E402
    EXACT_DUP_FRAC,
    NEAR_DUP_PAIRS_PER_DOC,
    SEED,
    gen_documents,
    gen_embeddings,
)
from conftest import SF_ORACLE  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_ORACLE_DIR", SF_ORACLE)
if not os.path.isdir(SRC):  # pragma: no cover - container layout guard
    pytest.skip(f"oracle corpus not present at {SRC}", allow_module_level=True)


def test_documents_deterministic_and_faithful():
    rng = np.random.default_rng(SEED)
    t, truth = gen_documents(SRC, 2, rng)
    t2, truth2 = gen_documents(SRC, 2, np.random.default_rng(SEED))
    assert t.equals(t2) and truth == truth2

    assert t.column_names == ["doc_id", "text", "lang", "source", "n_chars"]
    n = t.num_rows
    assert n == 1000  # 500 × 2
    texts = t.column("text").to_pylist()
    assert all(
        nc == len(tx)
        for nc, tx in zip(t.column("n_chars").to_pylist(), texts)
    )
    # exact-dup density ≈ measured constant
    n_exact = n - len(set(texts))
    assert abs(n_exact - EXACT_DUP_FRAC * n) <= 3
    # near-dup pairs at the measured per-doc density (8-gram witness)
    from collections import defaultdict

    sh = defaultdict(set)
    for i, tx in enumerate(texts):
        toks = tx.split(" ")
        for j in range(len(toks) - 7):
            sh[" ".join(toks[j : j + 8])].add(i)
    pairs = set()
    for ds in sh.values():
        if len(ds) > 1:
            l = sorted(ds)
            pairs.update(
                (l[i], l[j]) for i in range(len(l)) for j in range(i + 1, len(l))
            )
    want = NEAR_DUP_PAIRS_PER_DOC * n
    # 2-token edits erase the witness for the shortest docs — allow the
    # same ~2% shortfall measured at sf1 (2522 of 2560), plus noise
    assert 0.85 * want <= len(pairs) <= 1.25 * want, (len(pairs), want)
    # marginals drawn from the source's domains
    assert set(t.column("lang").to_pylist()) <= {"en", "zh", "es", "fr", "de"}
    assert all(s.startswith("src") for s in set(t.column("source").to_pylist()))


def test_documents_zipf_vocab():
    """--vocab zipf: same schema/length/density contract, but the token
    distribution is heavy-tailed over a large vocabulary — the corpus
    shape that keeps shingle buckets near-constant for LSH dedup."""
    rng = np.random.default_rng(SEED)
    t, _ = gen_documents(SRC, 2, rng, vocab_mode="zipf", vocab_size=5000)
    t2, _ = gen_documents(
        SRC, 2, np.random.default_rng(SEED), vocab_mode="zipf", vocab_size=5000
    )
    assert t.equals(t2)
    assert t.column_names == ["doc_id", "text", "lang", "source", "n_chars"]
    texts = t.column("text").to_pylist()
    from collections import Counter

    tok_counts = Counter(tok for tx in texts for tok in tx.split(" "))
    # far richer than the 31-word empirical vocabulary, bounded by request
    assert 1000 < len(tok_counts) <= 5000
    # Zipf head: the most frequent token dominates the median one
    freqs = sorted(tok_counts.values(), reverse=True)
    assert freqs[0] > 20 * freqs[len(freqs) // 2]
    # dup densities preserved (exact copies; near-dups share 8-grams)
    n = t.num_rows
    n_exact = n - len(set(texts))
    assert abs(n_exact - EXACT_DUP_FRAC * n) <= 3
    sh = {}
    for i, tx in enumerate(texts):
        toks = tx.split(" ")
        for j in range(len(toks) - 7):
            sh.setdefault(" ".join(toks[j : j + 8]), set()).add(i)
    n_multi = sum(1 for ds in sh.values() if len(ds) > 1)
    assert n_multi > 0  # near-dup witnesses survive the vocab swap
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vocab_mode"):
        gen_documents(SRC, 1, rng, vocab_mode="uniform")


def test_planted_truth_is_true():
    """The sidecar ground truth must describe the corpus it ships with:
    planted near pairs really differ by ≤ NEAR_DUP_EDITS tokens, exact
    pairs are byte-identical, and planted embedding neighbors really are
    their seed's nearest vectors by a decisive margin."""
    t, truth = gen_documents(SRC, 2, np.random.default_rng(SEED))
    texts = t.column("text").to_pylist()
    voided = {tuple(p) for p in truth["near_pairs_voided"]}
    checked = 0
    for i, j in truth["near_pairs"]:
        if (i, j) in voided:
            continue
        a, b = texts[i].split(" "), texts[j].split(" ")
        assert len(a) == len(b)
        assert sum(x != y for x, y in zip(a, b)) <= truth["near_dup_edits"]
        checked += 1
    assert checked > 30
    for a, b in truth["exact_pairs"]:
        assert texts[a] == texts[b]

    emb, etruth = gen_embeddings(SRC, 2, np.random.default_rng(7))
    v = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    assert len(etruth["seed_neighbors"]) == 16
    for seed_s, nbs in etruth["seed_neighbors"].items():
        seed = int(seed_s)
        cos = v @ v[seed]
        cos[seed] = -2.0  # exclude self
        top = np.argsort(-cos)[: len(nbs)]
        assert set(top.tolist()) == set(nbs), (seed, top, nbs)
        # decisive margin: planted ≥ 0.99, best unplanted far below
        assert min(cos[nbs]) > 0.99
        cos[nbs] = -2.0
        assert cos.max() < 0.9


def test_events_deterministic_and_faithful():
    from gen_scale_corpus import gen_events

    t = gen_events(SRC, 2, np.random.default_rng(3))
    t2 = gen_events(SRC, 2, np.random.default_rng(3))
    assert t.equals(t2)
    assert t.column_names == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    n = t.num_rows
    assert n == 20000  # 10k × 2
    # users scale with the corpus: 150 × 2
    users = set(t.column("user_id").to_pylist())
    assert len(users) > 250 and max(users) < 300
    # event_id is ts-ordered (zero inversions, as measured in the source)
    ts = t.column("ts").to_pylist()
    assert all(a <= b for a, b in zip(ts, ts[1:]))
    assert set(t.column("event_type").to_pylist()) == {
        "signup", "click", "purchase", "error", "view",
    }
    import json as _json

    ks = {_json.loads(p)["k"] for p in t.column("props").to_pylist()[:500]}
    assert ks <= set(range(100))


def test_relational_deterministic_fk_consistent():
    from gen_scale_corpus import gen_relational

    rel = gen_relational(SRC, 2, np.random.default_rng(5))
    rel2 = gen_relational(SRC, 2, np.random.default_rng(5))
    for k in rel:
        assert rel[k].equals(rel2[k]), k
    n_cust = rel["customer"].num_rows
    n_supp = rel["supplier"].num_rows
    n_part = rel["part"].num_rows
    n_ord = rel["orders"].num_rows
    assert (n_cust, n_supp, n_part, n_ord) == (3000, 200, 4000, 30000)
    # dense sequential keys + name formulas
    assert rel["customer"].column("c_custkey").to_pylist() == list(range(n_cust))
    assert rel["customer"].column("c_name")[7].as_py() == "Customer#000000007"
    assert rel["supplier"].column("s_name")[0].as_py() == "Supplier#000000000"
    # FK ranges
    oc = rel["orders"].column("o_custkey").to_numpy()
    assert oc.min() >= 0 and oc.max() < n_cust
    li = rel["lineitem"]
    assert li.column("l_partkey").to_numpy().max() < n_part
    assert li.column("l_suppkey").to_numpy().max() < n_supp
    ok = li.column("l_orderkey").to_numpy()
    assert ok.min() == 0 and ok.max() == n_ord - 1
    # fan-out preserved: mean lines/order ≈ source's 4.0, linenumbers 1..k
    per = np.bincount(ok)
    assert 3.5 < per.mean() < 4.5
    import collections

    ln_by_order = collections.defaultdict(list)
    for o, ln in zip(ok[:5000], li.column("l_linenumber").to_pylist()[:5000]):
        ln_by_order[o].append(ln)
    for o, lns in list(ln_by_order.items())[:50]:
        assert lns == list(range(1, len(lns) + 1)), (o, lns)
    # schemas byte-compatible with the source
    import pyarrow.parquet as pq

    for name in ("customer", "supplier", "part", "orders", "lineitem"):
        assert rel[name].schema.equals(
            pq.read_schema(f"{SRC}/{name}.parquet"), check_metadata=False
        ), name


def test_embeddings_deterministic_unit_norm():
    t, truth = gen_embeddings(SRC, 2, np.random.default_rng(7))
    t2, truth2 = gen_embeddings(SRC, 2, np.random.default_rng(7))
    assert t.equals(t2) and truth == truth2
    import pyarrow as pa

    assert t.schema.field("embedding").type == pa.list_(pa.float32())
    assert t.schema.field("label").type == pa.int32()
    v = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    assert v.shape[1] == 64
    norms = np.linalg.norm(v, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    labels = set(t.column("label").to_pylist())
    assert labels <= set(range(10))

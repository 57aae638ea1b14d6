#!/usr/bin/env python
"""At-scale correctness rig (round 9, VERDICT r8 next #4): drive every
gate query's correctness check at a SCALED corpus (default .scale/sf1),
closing the gap the sf0.01 driver gate cannot see.

Two verification modes, applied per query:

- **full** — the exact driver compare (rows + schema + value hash vs the
  DuckDB oracle, csce438_distributed_password_cracker_spark.oracle.compare_query), run in a
  KILLABLE subprocess with a per-query timeout: a quadratic oracle
  (brute-force pair twins) times out instead of hanging the rig, and is
  recorded as such rather than silently skipped.
- **planted** — for the queries whose oracles ARE quadratic in the
  corpus, closed-form ground truth the generator planted
  (planted_truth.json, tools/gen_scale_corpus.py) is checked instead:
  containment/recall of planted structures at exact scores, plus a
  full (or hash-sampled, loudly noted) PRECISION audit that recomputes
  every emitted result from first principles in Python — output-sized
  work, never O(n²).

A query with a planted check runs BOTH when the full compare fits the
budget; its verdict is the conjunction.  Results land as JSON
(default SCALE_CORRECTNESS.json): {name: {mode, ok, detail, wall_sec}}.

Usage:
  python tools/scale_sweep.py [--sf-dir /root/repo/.scale/sf1]
      [--out SCALE_CORRECTNESS.json] [--only a,b] [--timeout 900]
      [--skip-full a,b]   # known-quadratic oracles: planted check only
  python tools/scale_sweep.py --one q_name --sf-dir DIR   # worker mode
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Oracles quadratic in the corpus (brute-force pair twins) — the full
# compare is not attempted for these by default; the planted check is
# their at-scale verdict.  Everything else gets the full compare, and a
# timeout there is reported as "full_timeout" (a bug in this list, not
# silence).
DEFAULT_SKIP_FULL = {
    "q_dedup_jaccard",      # all-pairs 3-gram Jaccard + all-pairs fuzzy
    "q_dedup_components",   # all-pairs candidate join + recursive reach
}

JACCARD_N = 3
JACCARD_THRESHOLD = 0.8
DECONTAM_N = 5
DECONTAM_MIN_HITS = 2
AUDIT_CAP = 100_000  # precision-audit rows before deterministic sampling
FUZZY_RECALL_SAMPLE = 200


def _load_truth(sf_dir: str) -> dict:
    p = os.path.join(sf_dir, "planted_truth.json")
    if not os.path.exists(p):
        raise SystemExit(
            f"{p} missing — regenerate the corpus with tools/"
            "gen_scale_corpus.py (round-9+ emits the planted-truth sidecar)"
        )
    with open(p) as f:
        return json.load(f)


def _texts(sf_dir: str) -> dict[int, str]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _shingles(text: str, n: int) -> set[str]:
    """EXACTLY the operator/oracle shingle semantics: windows starting at
    every position 0..max(len-n, 0), truncated at the end (concat_ws
    skips the out-of-range components), DISTINCT."""
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))
    }


def _sample(rows: list, cap: int) -> tuple[list, str]:
    if len(rows) <= cap:
        return rows, f"audited all {len(rows)}"
    step = (len(rows) + cap - 1) // cap
    picked = sorted(rows)[::step]
    return picked, (
        f"AUDIT SAMPLED: {len(picked)} of {len(rows)} emitted rows "
        f"(deterministic stride {step})"
    )


def check_jaccard(spark, sf_dir: str, truth: dict) -> tuple[bool, str]:
    """q_dedup_jaccard's three branches without an O(n²) oracle:

    - jaccard: planted-pair RECALL at exact scores + full/sampled
      PRECISION (every emitted pair's true 3-gram-set Jaccard recomputed
      in Python equals the reported score and clears the threshold).
    - decontam: planted pairs straddling the %7 train/eval partition
      must be reported with the exact distinct-5-gram overlap; emitted
      pairs precision-audited the same way.
    - fuzzy: every emitted pair's Levenshtein distance recomputed
      (full precision); recall audited on a seeded name sample via a
      one-sided DuckDB brute force (sample × all names — linear).
    """
    from pyspark.sql import functions as F

    from csce438_distributed_password_cracker_spark.catalog import load_table
    from csce438_distributed_password_cracker_spark.operators import decontam, dedup, fuzzy

    texts = _texts(sf_dir)
    voided = {tuple(p) for p in truth["documents"]["near_pairs_voided"]}
    notes: list[str] = []

    docs = load_table(spark, sf_dir, "documents")
    emitted = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=JACCARD_N, threshold=JACCARD_THRESHOLD
        ).collect()
    }
    sh_cache: dict[int, set[str]] = {}

    def sh(i: int) -> set[str]:
        if i not in sh_cache:
            sh_cache[i] = _shingles(texts[i], JACCARD_N)
        return sh_cache[i]

    def true_jac(i: int, j: int) -> float:
        a, b = sh(i), sh(j)
        return round(len(a & b) / len(a | b), 6)

    # recall over planted pairs
    n_recall = 0
    for i, j in truth["documents"]["near_pairs"]:
        if (i, j) in voided:
            continue
        tj = true_jac(i, j)
        if tj < JACCARD_THRESHOLD:
            continue  # the 2-token edit pushed this short doc under
        key = (min(i, j), max(i, j))
        if key not in emitted:
            return False, f"jaccard recall: planted pair {key} (j={tj}) missing"
        if abs(emitted[key] - tj) > 0:
            return False, (
                f"jaccard score: pair {key} reported {emitted[key]} != {tj}"
            )
        n_recall += 1
    if n_recall < 0.5 * len(truth["documents"]["near_pairs"]):
        return False, (
            f"jaccard recall basis degenerate: only {n_recall} planted "
            "pairs clear the threshold"
        )
    # precision over emitted pairs
    audit, note = _sample(list(emitted), AUDIT_CAP)
    notes.append(f"jaccard: {n_recall} planted recalled; {note}")
    for i, j in audit:
        tj = true_jac(i, j)
        if tj < JACCARD_THRESHOLD or abs(emitted[(i, j)] - tj) > 0:
            return False, f"jaccard precision: pair {(i, j)} reported {emitted[(i, j)]} true {tj}"

    # decontam branch
    dec = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in decontam.ngram_overlap(
            docs.filter(F.col("doc_id") % 7 != 0),
            docs.filter(F.col("doc_id") % 7 == 0),
            "doc_id",
            "text",
            n=DECONTAM_N,
            min_hits=DECONTAM_MIN_HITS,
        ).collect()
    }
    g_cache: dict[int, set[str]] = {}

    def g5(i: int) -> set[str]:
        if i not in g_cache:
            g_cache[i] = _shingles(texts[i], DECONTAM_N)
        return g_cache[i]

    n_dec = 0
    for i, j in truth["documents"]["near_pairs"]:
        if (i, j) in voided:
            continue
        for tr, ev in ((i, j), (j, i)):
            if tr % 7 == 0 or ev % 7 != 0:
                continue
            shared = len(g5(tr) & g5(ev))
            if shared < DECONTAM_MIN_HITS:
                continue
            if dec.get((tr, ev)) != shared:
                return False, (
                    f"decontam: planted straddling pair {(tr, ev)} expected "
                    f"{shared}, got {dec.get((tr, ev))}"
                )
            n_dec += 1
    audit, note = _sample(list(dec), AUDIT_CAP)
    notes.append(f"decontam: {n_dec} planted straddlers recalled; {note}")
    for tr, ev in audit:
        shared = len(g5(tr) & g5(ev))
        if shared < DECONTAM_MIN_HITS or dec[(tr, ev)] != shared:
            return False, f"decontam precision: {(tr, ev)} reported {dec[(tr, ev)]} true {shared}"

    # fuzzy branch (part names, Levenshtein 1 over distinct-name reps)
    import pyarrow.parquet as pq

    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("pid"), "p_name"
    )
    fz = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy.fuzzy_key_pairs(parts, "pid", "p_name", max_edits=1).collect()
    }
    pt = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    rep: dict[str, int] = {}
    for k, nm in zip(pt.column("p_partkey").to_pylist(), pt.column("p_name").to_pylist()):
        if nm not in rep or k < rep[nm]:
            rep[nm] = int(k)
    by_id = {v: k for k, v in rep.items()}
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE names(id BIGINT, nm VARCHAR)")
        con.executemany("INSERT INTO names VALUES (?, ?)", list(by_id.items()))
        for a, b in fz:
            d = con.execute(
                "SELECT levenshtein(?, ?)", [by_id[a], by_id[b]]
            ).fetchone()[0]
            if d != fz[(a, b)] or d != 1:
                return False, f"fuzzy precision: {(a, b)} reported {fz[(a, b)]} true {d}"
        # sampled recall: seeded stride over the distinct reps
        ids = sorted(by_id)
        stride = max(len(ids) // FUZZY_RECALL_SAMPLE, 1)
        sample = ids[::stride][:FUZZY_RECALL_SAMPLE]
        con.execute("CREATE TABLE samp(id BIGINT, nm VARCHAR)")
        con.executemany(
            "INSERT INTO samp VALUES (?, ?)", [(i, by_id[i]) for i in sample]
        )
        want = con.execute(
            """
            SELECT s.id, n.id FROM samp s JOIN names n
              ON s.id <> n.id AND levenshtein(s.nm, n.nm) = 1
            """
        ).fetchall()
    finally:
        con.close()
    for sa, na in want:
        key = (min(sa, na), max(sa, na))
        if key not in fz:
            return False, f"fuzzy recall: sampled true pair {key} missing"
    notes.append(
        f"fuzzy: {len(fz)} emitted all true; sampled recall "
        f"{len(want)} pairs over {len(sample)} seed names"
    )
    return True, "; ".join(notes)


COMPONENTS_EDGE_CAP = 2_000_000
COMPONENTS_NODE_CAP = 20_000_000


def check_components(spark, sf_dir: str, truth: dict) -> tuple[bool, str]:
    """q_dedup_components without the O(n²) recursive oracle: the edge
    LIST is output-sized (its generation is what check_jaccard audits),
    so an INDEPENDENT driver-side union-find over the collected edges
    computes the exact min-id labeling in O(nodes + edges), and the
    operator's full labeling is compared to it row for row.  This
    catches both split components (an edge straddling two labels) and
    spurious merges (two true components sharing a label) — a
    fixed-point audit alone cannot see the latter.  Bounded by loud
    caps: a corpus whose emitted edge list exceeds them needs a bigger
    rig, not a silent sample."""
    from pyspark.sql import functions as F

    from csce438_distributed_password_cracker_spark.catalog import load_table
    from csce438_distributed_password_cracker_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    edges_df = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=JACCARD_N, threshold=JACCARD_THRESHOLD
    ).select("id_a", "id_b")
    ids = docs.select(F.col("doc_id").alias("id"))
    labels_df = dedup.connected_components(ids, edges_df)

    n_docs = docs.count()
    if n_docs > COMPONENTS_NODE_CAP:
        return False, f"{n_docs} nodes exceeds the driver-side audit cap"
    edges = [(r["id_a"], r["id_b"]) for r in edges_df.collect()]
    if len(edges) > COMPONENTS_EDGE_CAP:
        return False, f"{len(edges)} edges exceeds the driver-side audit cap"

    # independent reference: path-compressing union-find (by min root)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    got = {
        r["id"]: r["component_id"] for r in labels_df.collect()
    }
    if len(got) != n_docs:
        return False, f"label cardinality {len(got)} != {n_docs} docs"
    n_bad = 0
    first_bad = None
    for node, comp in got.items():
        want = find(node)
        if comp != want:
            n_bad += 1
            first_bad = first_bad or (node, comp, want)
    if n_bad:
        return False, (
            f"{n_bad} labels differ from the union-find reference; "
            f"first: node {first_bad[0]} got {first_bad[1]} want {first_bad[2]}"
        )

    texts = _texts(sf_dir)
    voided = {tuple(p) for p in truth["documents"]["near_pairs_voided"]}
    n_checked = 0
    for i, j in truth["documents"]["near_pairs"]:
        if (i, j) in voided:
            continue
        a, b = _shingles(texts[i], JACCARD_N), _shingles(texts[j], JACCARD_N)
        if round(len(a & b) / len(a | b), 6) < JACCARD_THRESHOLD:
            continue
        if got[i] != got[j]:
            return False, f"planted pair {(i, j)} split across components"
        n_checked += 1
    return True, (
        f"exact match vs union-find over {n_docs} nodes / {len(edges)} "
        f"edges; {n_checked} planted pairs co-labeled"
    )


def check_knn(spark, sf_dir: str, truth: dict) -> tuple[bool, str]:
    """Exact-kNN at scale via planted neighbors: for every seeded query
    vector the operator's top-k must be EXACTLY the planted set (cos
    ≈ 0.9988 vs a ≤ ~0.65 organic ceiling), with scores matching a
    float64 recompute to 1e-5.  Covers q_similarity_knn's knn/mmr
    shortlist machinery (brute_force_topk) — the branch whose DuckDB
    twin is the sweep's cost blocker at sf1."""
    import numpy as np
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from csce438_distributed_password_cracker_spark.catalog import load_table
    from csce438_distributed_password_cracker_spark.operators import similarity

    seeds = {
        int(k): v for k, v in truth["embeddings"]["seed_neighbors"].items()
    }
    if not seeds:
        return False, "no planted ANN seeds in truth sidecar"
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    vid = np.asarray(t.column("vec_id").to_pylist())
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    idx_of = {int(v): i for i, v in enumerate(vid)}

    emb = load_table(spark, sf_dir, "embeddings")
    for seed, nbs in sorted(seeds.items()):
        k = len(nbs)
        query = emb.filter(F.col("vec_id") == seed).select(
            F.col("embedding").alias("qvec")
        )
        got = similarity.brute_force_topk(
            emb.filter(F.col("vec_id") != seed), query, k=k
        ).collect()
        got_ids = [r["vec_id"] for r in got]
        if set(got_ids) != set(nbs):
            return False, f"seed {seed}: top-{k} {got_ids} != planted {nbs}"
        qv = mat[idx_of[seed]].astype(np.float64)
        for r in got:
            tv = mat[idx_of[r["vec_id"]]].astype(np.float64)
            want = float(qv @ tv / (np.linalg.norm(qv) * np.linalg.norm(tv)))
            if abs(r["cos_sim"] - round(want, 6)) > 1e-5:
                return False, (
                    f"seed {seed} nb {r['vec_id']}: cos {r['cos_sim']} "
                    f"!= {round(want, 6)}"
                )
    return True, f"{len(seeds)} planted seeds: exact top-k ids + scores"


PLANTED_CHECKS = {
    "q_dedup_jaccard": check_jaccard,
    "q_dedup_components": check_components,
    "q_similarity_knn": check_knn,
}


def worker(name: str, sf_dir: str) -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from csce438_distributed_password_cracker_spark.oracle import compare_query
    from csce438_distributed_password_cracker_spark.session import get_spark

    # The COMPARE collects the full result driver-side (that's the
    # point of the rig); at sf10 a 61M-row result blows the 1 GiB
    # default maxResultSize (q_outlier_flags did, first sf10 run) —
    # a harness capacity setting, not an operator property.
    spark = get_spark(
        app_name=f"scale-sweep-{name}",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    t0 = time.perf_counter()
    # capacity_mode: prefer a query's bounded-working-set oracle twin
    # (oracle_exec / oracle_parts) — closes the two round-10 sf10
    # oracle-capacity holes (q_tpch branch-by-branch, q_array_ops'
    # iterative BPE loop) with full rows+schema+hash compares
    res = compare_query(spark, name, sf_dir, capacity_mode=True)
    print(
        "RESULT " + json.dumps(
            {
                "name": name,
                "ok": res.ok,
                "detail": res.detail[:500],
                "wall_sec": round(time.perf_counter() - t0, 1),
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale/sf1"))
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_CORRECTNESS.json"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--skip-full", default=",".join(sorted(DEFAULT_SKIP_FULL)))
    ap.add_argument("--one", default=None, help="worker mode: one full compare")
    args = ap.parse_args()

    if args.one:
        worker(args.one, args.sf_dir)
        return

    from csce438_distributed_password_cracker_spark.plans import corpus

    names = sorted(corpus.REGISTRY)
    if args.only:
        only = {s.strip() for s in args.only.split(",") if s.strip()}
        unknown = only - set(names)
        if unknown:
            raise SystemExit(f"--only names unknown queries: {sorted(unknown)}")
        names = [n for n in names if n in only]
    skip_full = {s.strip() for s in args.skip_full.split(",") if s.strip()}

    results: dict[str, dict] = {}
    for name in names:
        entry: dict = {}
        if name not in skip_full:
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one", name,
                     "--sf-dir", args.sf_dir],
                    capture_output=True,
                    text=True,
                    timeout=args.timeout,
                    cwd=REPO,
                )
                line = next(
                    (l for l in proc.stdout.splitlines() if l.startswith("RESULT ")),
                    None,
                )
                if line is None:
                    entry["full"] = {
                        "ok": False,
                        "detail": (proc.stderr or proc.stdout)[-500:],
                    }
                else:
                    entry["full"] = json.loads(line[len("RESULT "):])
            except subprocess.TimeoutExpired:
                entry["full"] = {
                    "ok": False,
                    "detail": f"full compare exceeded {args.timeout}s (killed)",
                    "timeout": True,
                }
            print(f"{name}: full ok={entry['full']['ok']} "
                  f"({entry['full'].get('wall_sec', '?')}s)", flush=True)
        results[name] = entry
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)

    planted_names = [n for n in names if n in PLANTED_CHECKS]
    if planted_names:
        os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
        from csce438_distributed_password_cracker_spark.session import get_spark

        spark = get_spark(app_name="scale-sweep-planted")
        truth = _load_truth(args.sf_dir)
        for name in planted_names:
            t0 = time.perf_counter()
            try:
                ok, detail = PLANTED_CHECKS[name](spark, args.sf_dir, truth)
            except Exception as ex:  # surface, don't hide
                ok, detail = False, f"{type(ex).__name__}: {ex}"
            results[name]["planted"] = {
                "ok": ok,
                "detail": detail[:800],
                "wall_sec": round(time.perf_counter() - t0, 1),
            }
            print(f"{name}: planted ok={ok}", flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)

    # roll up a verdict per query
    n_ok = 0
    for name, entry in results.items():
        parts = [v["ok"] for v in entry.values()]
        entry["ok"] = bool(parts) and all(parts)
        n_ok += entry["ok"]
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"{n_ok}/{len(results)} ok → {args.out}")


if __name__ == "__main__":
    main()

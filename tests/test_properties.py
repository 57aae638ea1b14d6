"""Property-based tests (SURVEY.md §5.2.1): codec bijection, reference
split-algebra coverage, and exactness of the prefix-filtered similarity
join against a brute-force model.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from csce438_distributed_password_cracker_spark.functions import codec
from csce438_distributed_password_cracker_spark.operators import dedup

# ── codec bijection (pure-Python model, validated against Spark below) ───

widths = st.integers(min_value=1, max_value=13)


@given(st.data())
def test_codec_roundtrip_property(data):
    w = data.draw(widths)
    n = data.draw(st.integers(min_value=0, max_value=codec.keyspace_size(w) - 1))
    s = codec.py_decode(n, w)
    assert len(s) == w and s.islower()
    assert codec.py_encode(s) == n


@given(st.data())
def test_codec_order_isomorphism(data):
    """encode is an order isomorphism: ordinal order == lexicographic
    order (what makes min(candidate) ≡ first-match-in-scan-order, the A2
    determinism argument)."""
    w = data.draw(st.integers(min_value=1, max_value=8))
    hi = codec.keyspace_size(w) - 1
    a = data.draw(st.integers(min_value=0, max_value=hi))
    b = data.draw(st.integers(min_value=0, max_value=hi))
    assert (a < b) == (codec.py_decode(a, w) < codec.py_decode(b, w))


@given(st.data())
@settings(max_examples=200)
def test_split_algebra_coverage(data):
    """The reference's range split (server.c:387-434, per=(n-1) div k,
    contiguous inclusive subranges): gap-free, ordered, covers the full
    space; last subrange overshoots by < k (SURVEY.md §2.3 X2)."""
    w = data.draw(st.integers(min_value=1, max_value=6))
    k = data.draw(st.integers(min_value=1, max_value=64))
    n = codec.keyspace_size(w)
    per = (n - 1) // k
    subranges = [(i * (per + 1), i * (per + 1) + per) for i in range(k)]
    assert subranges[0][0] == 0
    for (lo_a, hi_a), (lo_b, _) in zip(subranges, subranges[1:]):
        assert lo_b == hi_a + 1  # contiguous, gap-free
    assert subranges[-1][1] >= n - 1  # full coverage
    assert subranges[-1][1] - (n - 1) < k  # bounded overshoot


def test_spark_codec_matches_python_model(spark):
    """One Spark job cross-checks the SQL codec against the Python model
    over seeded random ordinals at every width (incl. > uint32)."""
    rng = random.Random(42)
    rows = []
    for w in range(1, 14):
        hi = codec.keyspace_size(w) - 1
        for _ in range(40):
            rows.append((w, rng.randint(0, hi)))
    by_width: dict[int, list[int]] = {}
    for w, n in rows:
        by_width.setdefault(w, []).append(n)
    for w, ns in by_width.items():
        df = spark.createDataFrame([(n,) for n in ns], "id LONG").selectExpr(
            "id",
            f"{codec.decode_sql('id', w)} AS s",
            f"{codec.encode_sql(codec.decode_sql('id', w), w)} AS rt",
        )
        for r in df.collect():
            assert r["s"] == codec.py_decode(r["id"], w)
            assert r["rt"] == r["id"]


# ── prefix-filter similarity join exactness ──────────────────────────────


def _py_jaccard_pairs(docs: list[tuple[int, str]], n: int, t: float):
    """(id_a, id_b) -> round(jaccard, 6) for all pairs at or above t."""

    def shingles(text: str) -> set[str]:
        toks = text.split(" ")
        m = max(len(toks) - n + 1, 1)
        return {" ".join(toks[i : i + n]) for i in range(m)}

    sh = {i: shingles(s) for i, s in docs}
    out = {}
    for i, si in sh.items():
        for j, sj in sh.items():
            if i < j and len(si | sj):
                jac = len(si & sj) / len(si | sj)
                if jac >= t:
                    out[(i, j)] = round(jac, 6)
    return out


def test_prefix_filter_join_equals_brute_force(spark):
    """ngram_jaccard_pairs (prefix-filtered) must return EXACTLY the
    brute-force all-pairs answer — the filter is an optimization, never a
    semantics change.  Seeded random corpus with planted near-dups and a
    skewed vocabulary (the adversarial case for prefix selection)."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)] + ["the"] * 5  # skewed
    docs: list[tuple[int, str]] = []
    for i in range(50):
        toks = [rng.choice(vocab) for _ in range(rng.randint(3, 25))]
        docs.append((i, " ".join(toks)))
        if rng.random() < 0.3:  # planted near-dup: perturb one token
            dup = list(toks)
            dup[rng.randrange(len(dup))] = rng.choice(vocab)
            docs.append((1000 + i, " ".join(dup)))
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    for t in (0.5, 0.8, 0.95):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", n=2, threshold=t
            ).collect()
        }
        want = _py_jaccard_pairs(docs, n=2, t=t)
        # compare VALUES, not just pair identity: the count-based verify
        # derives |A∪B| from size bookkeeping (|A| + |B| − |A∩B|), so a
        # size-column bug could keep the pair set right with wrong scores
        assert got == want, (
            f"t={t}: missing={want.keys() - got.keys()} "
            f"extra={got.keys() - want.keys()} "
            f"diff={ {k: (got[k], want[k]) for k in got.keys() & want.keys() if abs(got[k] - want[k]) > 1e-9} }"
        )


# ── media codec round-trips (pure-Python kernels, no Spark needed) ───────

from csce438_distributed_password_cracker_spark.operators import multimodal  # noqa: E402


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(data):
    w = data.draw(st.integers(min_value=1, max_value=40))
    h = data.draw(st.integers(min_value=1, max_value=40))
    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    blob = multimodal.png_encode(w, h, px)
    assert multimodal.png_decode(blob) == (w, h, px)


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(data):
    rate = data.draw(st.sampled_from([8000, 16000, 44100]))
    samples = data.draw(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=500,
        )
    )
    blob = multimodal.wav_encode(rate, samples)
    assert multimodal.wav_decode(blob) == (rate, len(samples), samples)


@given(st.data())
@settings(max_examples=20, deadline=None)
def test_png_decode_rejects_any_single_byte_corruption_in_chunks(data):
    """Flipping any byte past the magic must either raise (CRC/structure)
    or — never — silently return different pixels."""
    px = bytes(range(48))
    blob = bytearray(multimodal.png_encode(8, 6, px))
    pos = data.draw(st.integers(min_value=8, max_value=len(blob) - 1))
    flip = data.draw(st.integers(min_value=1, max_value=255))
    blob[pos] ^= flip
    try:
        got = multimodal.png_decode(bytes(blob))
    except Exception:
        return  # rejected: the expected outcome
    assert got == (8, 6, px)  # survived only if the byte was immaterial


# ── next-fit packing kernel (the pure function the Arrow UDF runs) ───────

@given(st.data())
@settings(max_examples=300)
def test_next_fit_packing_properties(data):
    """operators/packing.next_fit_assign over random inputs: (1) no pack
    exceeds the budget; (2) every doc is assigned once, pack indices are
    contiguous from 0 and positions restart per pack; (3) the classic
    next-fit bound — when all docs ≤ budget/2, every pack except
    possibly the last is > budget/2 full."""
    from csce438_distributed_password_cracker_spark.operators.packing import (
        next_fit_assign,
    )

    budget = data.draw(st.integers(min_value=2, max_value=4096))
    tokens = data.draw(
        st.lists(st.integers(min_value=1, max_value=budget), max_size=200)
    )
    packs, pos = next_fit_assign(tokens, budget)
    assert len(packs) == len(pos) == len(tokens)
    fills: dict[int, int] = {}
    next_pos: dict[int, int] = {}
    for p, q, tok in zip(packs, pos, tokens):
        assert q == next_pos.get(p, 0)
        next_pos[p] = q + 1
        fills[p] = fills.get(p, 0) + tok
    assert all(f <= budget for f in fills.values())
    if tokens:
        assert sorted(fills) == list(range(max(packs) + 1))
    if tokens and all(t <= budget // 2 for t in tokens):
        last = max(packs)
        assert all(
            f > budget / 2 for p, f in fills.items() if p != last
        ), (budget, tokens, fills)


@given(st.data())
@settings(max_examples=200, deadline=None)
def test_hist_quantile_properties(data):
    """hist_quantile over arbitrary histograms: results stay inside
    [HIST_LO, HIST_HI], are monotone in q, and for in-range single-bin
    mass land inside that bin."""
    from csce438_distributed_password_cracker_spark.streaming.rollup import (
        HIST_BINS,
        HIST_HI,
        HIST_LO,
        hist_quantile,
    )

    hist = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=1000),
            min_size=HIST_BINS + 2,
            max_size=HIST_BINS + 2,
        )
    )
    if sum(hist) == 0:
        return
    qs = sorted(
        data.draw(
            st.lists(
                st.floats(min_value=0.0, max_value=1.0),
                min_size=2,
                max_size=5,
            )
        )
    )
    vals = [hist_quantile(hist, q) for q in qs]
    assert all(HIST_LO <= v <= HIST_HI for v in vals)
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))  # monotone

    # all mass in one interior bin -> every quantile inside that bin
    bin_i = data.draw(st.integers(min_value=1, max_value=HIST_BINS))
    single = [0] * (HIST_BINS + 2)
    single[bin_i] = data.draw(st.integers(min_value=1, max_value=1000))
    width = (HIST_HI - HIST_LO) / HIST_BINS
    lo = HIST_LO + (bin_i - 1) * width
    for q in qs:
        v = hist_quantile(single, q)
        assert lo - 1e-9 <= v <= lo + width + 1e-9


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_curriculum_staging_matches_python_model(spark, data):
    """curriculum_order's quantile-threshold staging equals the pure
    model (type-7 percentile thresholds + strict-greater counting) on
    random scores, for any stage count — and stages are monotone in
    score by construction."""
    from csce438_distributed_password_cracker_spark.operators.split import (
        curriculum_order,
    )

    n_stages = data.draw(st.integers(min_value=2, max_value=6))
    # Integer-grid scores: Spark's percentile interpolates as
    # (1-frac)*lower + frac*higher while the type-7 model below uses
    # lower + frac*(higher-lower); the two differ by ulps at subnormal
    # spacing (seen: scores [0.0, -5e-324] flip the strict-> stage
    # comparison).  On an integer grid the interior threshold sits
    # >= gap/6 away from any score, so op-order ulps can never cross
    # a comparison boundary.
    scores = data.draw(
        st.lists(
            st.integers(min_value=-(10**6), max_value=10**6).map(float),
            min_size=n_stages,
            max_size=60,
        )
    )
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(scores)], "id long, v double"
    )
    got = {
        r["id"]: r["stage"]
        for r in curriculum_order(
            df, "id", "v", n_stages=n_stages, exact=True
        ).collect()
    }
    s = sorted(scores)

    def q(p):
        h = (len(s) - 1) * p
        f = int(h)
        return s[f] + (h - f) * (s[min(f + 1, len(s) - 1)] - s[f])

    ts = [q(i / n_stages) for i in range(1, n_stages)]
    for i, v in enumerate(scores):
        assert got[i] == sum(1 for t in ts if v > t), (i, v, ts)
    # monotone: sorting by score never decreases the stage
    order = sorted(range(len(scores)), key=lambda i: scores[i])
    staged = [got[i] for i in order]
    assert staged == sorted(staged)

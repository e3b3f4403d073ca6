"""PPJoin prefix-filter kernels (stages/ppjoin.py) — the round-3 verdict's
"last 100-TB wall" fix: exact set-similarity joins must not expand hot
posting lists.

The headline test plants ONE boilerplate gram shared by 10_000 documents
(df = 1e4) and asserts the candidate stage emits ~0 pairs from it —
the old plan would put C(1e4, 2) ≈ 5e7 pair rows in one task."""

import numpy as np
import pyarrow as pa
import pytest

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages import (
    ppjoin as P,
)


def _gram_rows(doc_sets: dict[int, list[str]]) -> pa.Table:
    """(doc_id, gram, dn) rows as ngram_table would emit them."""
    ids, grams, dns = [], [], []
    for d, gs in doc_sets.items():
        for g in gs:
            ids.append(d)
            grams.append(g)
            dns.append(len(gs))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "gram": pa.array(grams, pa.string()),
            "dn": pa.array(dns, pa.int64()),
        }
    )


def _prefix_rows(doc_sets, tau=(1, 2)):
    """Run the single-partition composition attach_df -> select_prefix
    (one partition holds everything, so df is global)."""
    rows = _gram_rows(doc_sets)
    dfd = P.attach_df(rows)
    return P.select_prefix(dfd, *tau)


def test_boilerplate_gram_never_expands():
    """df=10_000 boilerplate gram -> zero candidate pairs from it; the
    old partition_pair_counts plan would emit C(10^4,2) ~ 5e7 rows."""
    n = 10_000
    # every doc: the same boilerplate gram + 2 unique grams
    doc_sets = {d: ["the quick brown", f"u{d} a", f"u{d} b"] for d in range(n)}
    pfx = _prefix_rows(doc_sets, tau=(1, 2))
    # prefix length for n=3, tau=1/2: 3 - ceil(3/2) + 1 = 2 rows/doc,
    # picked rarest-first -> the df=1e4 boilerplate gram (sorted last)
    # is in NOBODY's prefix
    assert pfx.num_rows == 2 * n
    cand = P.expand_prefix_pairs(pfx)
    assert cand.num_rows == 0  # unique grams share nothing


@pytest.mark.parametrize("num,den,seed", [
    (1, 2, 7), (2, 3, 8), (4, 5, 9), (1, 3, 10), (1, 2, 11),
])
def test_prefix_filter_is_exact_vs_bruteforce(num, den, seed):
    """Randomized: candidates from prefix expansion ⊇ all pairs with
    Jaccard >= tau (the prefix-filter completeness guarantee), across
    thresholds and seeds."""
    rng = np.random.default_rng(seed)
    vocab = [f"g{i}" for i in range(40)]
    doc_sets = {
        d: list(
            np.array(vocab)[
                rng.choice(40, size=rng.integers(3, 12), replace=False)
            ]
        )
        for d in range(60)
    }
    pfx = _prefix_rows(doc_sets, tau=(num, den))
    cand = set(
        np.asarray(P.expand_jaccard_pairs(pfx, num, den)["pair"]).tolist()
    )
    tau = num / den
    # brute force
    need = set()
    for a in range(60):
        for b in range(a + 1, 60):
            A, B = set(doc_sets[a]), set(doc_sets[b])
            j = len(A & B) / len(A | B)
            if j >= tau:
                need.add((a << 32) | b)
    assert need <= cand


@pytest.mark.parametrize("num,den,seed", [
    (7, 10, 11), (1, 2, 12), (9, 10, 13),
])
def test_smallside_expansion_exact_for_containment(num, den, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"g{i}" for i in range(30)]
    doc_sets = {
        d: list(
            np.array(vocab)[
                rng.choice(30, size=rng.integers(3, 15), replace=False)
            ]
        )
        for d in range(50)
    }
    rows = _gram_rows(doc_sets)
    flagged = P.select_prefix_flagged(P.attach_df(rows), num, den)
    cand = set(
        np.asarray(
            P.expand_smallside_pairs(flagged, num, den)["pair"]
        ).tolist()
    )
    tau = num / den
    need = set()
    for a in range(50):
        for b in range(a + 1, 50):
            A, B = set(doc_sets[a]), set(doc_sets[b])
            c = len(A & B) / min(len(A), len(B))
            if c >= tau:
                need.add((a << 32) | b)
    assert need <= cand


@pytest.mark.parametrize("num,den,seed", [
    (7, 20, 3), (1, 5, 4), (3, 5, 5),
])
def test_weighted_prefix_complete_vs_bruteforce(num, den, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"g{i}" for i in range(25)]
    doc_sets = {
        d: list(
            np.array(vocab)[
                rng.choice(25, size=rng.integers(3, 10), replace=False)
            ]
        )
        for d in range(40)
    }
    rows = _gram_rows(doc_sets)
    n_docs = len(doc_sets)
    idf_rows = P.attach_idf(rows, n_docs)
    pfx = P.select_prefix_weighted(idf_rows, num, den)
    cand = set(
        np.asarray(P.expand_weighted_pairs(pfx, num, den)["pair"]).tolist()
    )
    # brute-force weighted jaccard with the same fixed-point idf
    import collections

    df = collections.Counter(g for gs in doc_sets.values() for g in set(gs))
    w = {
        g: int(np.round(np.log(n_docs / c) * 1e6)) for g, c in df.items()
    }
    need = set()
    for a in range(40):
        for b in range(a + 1, 40):
            A, B = set(doc_sets[a]), set(doc_sets[b])
            wi = sum(w[g] for g in A & B)
            wu = sum(w[g] for g in A | B)
            if wu and wi / wu >= num / den:
                need.add((a << 32) | b)
    assert need <= cand


def test_weighted_prefix_drops_boilerplate():
    """Boilerplate gram (idf ~ 0 weight) is never in a weighted prefix
    when docs carry any rarer content."""
    n = 5_000
    doc_sets = {d: ["common x y", f"u{d} a", f"u{d} b"] for d in range(n)}
    rows = _gram_rows(doc_sets)
    idf_rows = P.attach_idf(rows, n)
    pfx = P.select_prefix_weighted(idf_rows, 7, 20)
    cand = P.expand_prefix_pairs(pfx)
    assert cand.num_rows == 0


def test_pair_containment_kernel():
    # pair 1: A={1,2,3}, B={2,3} -> inter 2, min 2, containment 1.0
    # pair 2: A={1,2,3,4}, B={5,6} -> 0.0 (dropped)
    pair1, pair2 = (1 << 32) | 2, (3 << 32) | 4
    rows = {
        "pair": [], "side": [], "sh": [],
    }
    for sh in (1, 2, 3):
        rows["pair"].append(pair1); rows["side"].append(0); rows["sh"].append(sh)
    for sh in (2, 3):
        rows["pair"].append(pair1); rows["side"].append(1); rows["sh"].append(sh)
    for sh in (1, 2, 3, 4):
        rows["pair"].append(pair2); rows["side"].append(0); rows["sh"].append(sh)
    for sh in (5, 6):
        rows["pair"].append(pair2); rows["side"].append(1); rows["sh"].append(sh)
    t = pa.table(
        {"pair": pa.array(rows["pair"], pa.int64()),
         "side": pa.array(rows["side"], pa.int8()),
         "sh": pa.array(rows["sh"], pa.int64())}
    )
    out = P.pair_containment(t, 0.7)
    assert out.num_rows == 1
    assert out["doc_a"][0].as_py() == 1 and out["doc_b"][0].as_py() == 2
    assert out["containment"][0].as_py() == 1.0


def test_pair_wjaccard_kernel_duplicate_refs_collapse():
    """Duplicate (pair, side, sh) rows (multi-gram candidates) must not
    inflate the weight sums."""
    pair = (1 << 32) | 2
    t = pa.table(
        {
            "pair": pa.array([pair] * 5, pa.int64()),
            "side": pa.array([0, 0, 0, 1, 1], pa.int8()),
            # side0: {10 (dup), 11}; side1: {10}
            "sh": pa.array([10, 10, 11, 10, 10], pa.int64()),
            "w": pa.array([100, 100, 50, 100, 100], pa.int64()),
        }
    )
    out = P.pair_wjaccard(t, 0.0)
    # wi = 100 (shared sh=10), union = 100 + 50 -> wjac = 100/150
    assert out.num_rows == 1
    assert out["wjaccard"][0].as_py() == pytest.approx(0.666667)

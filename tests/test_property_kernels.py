"""Hypothesis property tests for the window/session/dedup kernels —
randomized inputs against obviously-correct brute force (SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.functions import (
    windows as W,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.featurize import (
    dedup_first,
)


@st.composite
def keyed_ts(draw):
    n = draw(st.integers(1, 120))
    keys = np.sort(np.array(draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))))
    gaps = np.array(draw(st.lists(st.integers(0, 50), min_size=n, max_size=n)), np.int64)
    ts = np.cumsum(gaps)
    # restart ts inside each segment so segments are independent
    seg_start = W.segment_starts(keys)
    seg_id = W.segment_ids(seg_start)
    arange = np.arange(n)
    seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
    ts = ts - ts[seg_first]
    return keys, ts


@settings(max_examples=40, deadline=None)
@given(keyed_ts(), st.integers(0, 60))
def test_trailing_windows_match_bruteforce(data, delta):
    keys, ts = data
    n = len(ts)
    seg_start = W.segment_starts(keys)
    seg_id = W.segment_ids(seg_start)
    ts_adj = W.adjusted_ts(ts, seg_id, delta)
    l, r = W.trailing_bounds(ts_adj, delta)
    vals = np.arange(n, dtype=np.float64)
    cnt = W.windowed_count(l, r)
    sm = W.windowed_sum(vals, l, r)
    for i in range(n):
        in_win = (seg_id == seg_id[i]) & (ts >= ts[i] - delta) & (ts <= ts[i])
        assert cnt[i] == in_win.sum(), (i, delta)
        assert sm[i] == vals[in_win].sum()


@settings(max_examples=40, deadline=None)
@given(keyed_ts(), st.integers(1, 40))
def test_sessionize_matches_bruteforce(data, gap):
    keys, ts = data
    seg_start = W.segment_starts(keys)
    sid, sturn, gap_prev = W.sessionize(ts, seg_start, gap)
    n = len(ts)
    exp_sid, exp_sturn = np.zeros(n, np.int64), np.zeros(n, np.int64)
    cur_sid = cur_sturn = 0
    for i in range(n):
        if seg_start[i]:
            cur_sid, cur_sturn = 0, 0
        elif ts[i] - ts[i - 1] > gap:
            cur_sid += 1
            cur_sturn = 0
        else:
            cur_sturn += 1
        exp_sid[i], exp_sturn[i] = cur_sid, cur_sturn
    assert np.array_equal(sid, exp_sid)
    assert np.array_equal(sturn, exp_sturn)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4), st.integers(0, 20)),
        min_size=1,
        max_size=80,
    )
)
def test_dedup_first_keeps_min_order_row(rows):
    tbl = pa.table(
        {
            "k1": pa.array([r[0] for r in rows], pa.int64()),
            "k2": pa.array([r[1] for r in rows], pa.int64()),
            "o": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = dedup_first(tbl, ["k1", "k2"], ["o"]).to_pandas()
    # expected: per (k1,k2), the row with the smallest o (ties: any one of
    # the tied-minimum rows, deterministically the same across calls)
    import pandas as pd

    df = tbl.to_pandas()
    exp_min = df.groupby(["k1", "k2"])["o"].min()
    assert len(out) == len(exp_min)
    got = out.set_index(["k1", "k2"])["o"]
    for k, v in exp_min.items():
        assert got[k] == v
    out2 = dedup_first(tbl, ["k1", "k2"], ["o"]).to_pandas()
    assert out.equals(out2)


@settings(max_examples=30, deadline=None)
@given(keyed_ts())
def test_lag_lead_inverse(data):
    keys, ts = data
    seg_start = W.segment_starts(keys)
    lag = W.lag_within(ts, seg_start, -1)
    lead = W.lead_within(ts, seg_start, -1)
    n = len(ts)
    for i in range(n):
        if i > 0 and not seg_start[i]:
            assert lag[i] == ts[i - 1]
        else:
            assert lag[i] == -1
        if i + 1 < n and not seg_start[i + 1]:
            assert lead[i] == ts[i + 1]
        else:
            assert lead[i] == -1


# ---------------------------------------------------------------------------
# round-2 dedup kernels: LSH bucket pair expansion + distributed Jaccard
# ---------------------------------------------------------------------------

@st.composite
def bucket_rows(draw):
    n = draw(st.integers(1, 150))
    bk = np.array(draw(st.lists(st.integers(0, 8), min_size=n, max_size=n)), np.int64)
    d = np.array(draw(st.lists(st.integers(0, 20), min_size=n, max_size=n)), np.int64)
    return bk, d


@given(bucket_rows(), st.integers(2, 6))
@settings(max_examples=60, deadline=None)
def test_lsh_partition_pairs_matches_bruteforce(rows, max_bucket):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.dedup import (
        lsh_partition_pairs,
        unpack_pairs,
    )

    bk, d = rows
    part = pa.table({"bkey": pa.array(bk), "doc_id": pa.array(d)})
    got = np.asarray(lsh_partition_pairs(part, max_bucket=max_bucket)["pair"])
    # brute force: per bucket, sorted unique docs truncated to max_bucket,
    # all (a < b) combinations, then global distinct
    exp = set()
    for b in np.unique(bk):
        ids = sorted(set(d[bk == b].tolist()))[:max_bucket]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                exp.add((ids[i] << 32) | ids[j])
    assert sorted(got.tolist()) == sorted(exp)
    a, b2 = unpack_pairs(got)
    assert (a < b2).all()


@given(bucket_rows(), st.integers(2, 6))
@settings(max_examples=60, deadline=None)
def test_lsh_incremental_pairs_matches_bruteforce(rows, max_bucket):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.dedup import (
        lsh_partition_pairs_incremental,
        unpack_pairs,
    )

    bk, d = rows
    is_new = (d % 3 == 0).astype(np.int8)  # arbitrary new-doc rule
    part = pa.table(
        {
            "bkey": pa.array(bk),
            "doc_id": pa.array(d),
            "is_new": pa.array(is_new),
        }
    )
    got = np.asarray(
        lsh_partition_pairs_incremental(part, max_bucket=max_bucket)["pair"]
    )
    # brute force: per bucket, unique docs ordered NEW-first then by id,
    # truncated to max_bucket, all (a, b) combos with >=1 new, distinct
    exp = set()
    for b in np.unique(bk):
        ids = sorted(set(d[bk == b].tolist()))
        ids = sorted(ids, key=lambda x: (x % 3 != 0, x))[:max_bucket]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] % 3 == 0 or ids[j] % 3 == 0:
                    lo, hi = min(ids[i], ids[j]), max(ids[i], ids[j])
                    exp.add((lo << 32) | hi)
    assert sorted(got.tolist()) == sorted(exp)
    if len(got):
        a, b2 = unpack_pairs(got)
        assert (a < b2).all()


@st.composite
def pair_shingle_rows(draw):
    n_docs = draw(st.integers(2, 10))
    sets = [
        frozenset(draw(st.lists(st.integers(0, 15), max_size=12)))
        for _ in range(n_docs)
    ]
    n_pairs = draw(st.integers(1, 12))
    pairs = [
        tuple(sorted(draw(st.tuples(st.integers(0, n_docs - 1),
                                    st.integers(0, n_docs - 1)))))
        for _ in range(n_pairs)
    ]
    pairs = [p for p in pairs if p[0] != p[1]]
    dup_refs = draw(st.booleans())
    return sets, pairs, dup_refs


@given(pair_shingle_rows())
@settings(max_examples=80, deadline=None)
def test_pair_jaccard_matches_set_arithmetic(case):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.dedup import (
        attach_shingles,
        pack_pairs,
        pair_jaccard,
    )

    sets, pairs, dup_refs = case
    if not pairs:
        return
    sh_doc, sh_val = [], []
    for i, s in enumerate(sets):
        for v in sorted(s):
            sh_doc.append(i)
            sh_val.append(v)
    shingles = pa.table(
        {"doc_id": pa.array(sh_doc, pa.int64()), "sh": pa.array(sh_val, pa.int64())}
    )
    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    pr = pack_pairs(a, b)
    side = np.concatenate([np.zeros(len(a), np.int8), np.ones(len(b), np.int8)])
    refs = pa.table(
        {"doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
         "pair": pa.array(np.concatenate([pr, pr]), pa.int64()),
         "side": pa.array(side, pa.int8())}
    )
    if dup_refs:  # same pair surfacing from a second LSH bucket
        refs = pa.concat_tables([refs, refs])
    out = pair_jaccard(attach_shingles(refs, shingles), threshold=0.0)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.to_pylist()}
    for (x, y) in set(pairs):
        sx, sy = sets[x], sets[y]
        union = len(sx | sy)
        if union == 0:
            assert (x, y) not in got
        else:
            assert got[(x, y)] == round(len(sx & sy) / union, 6)

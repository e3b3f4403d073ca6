"""Property tests for the shared robust kernels (functions/robust.py):
mad_outlier_flags must agree with a brute-force per-group
quantile_disc median/MAD reference on random inputs, and
gap_session_ids must agree with a pandas reference sessionizer."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.functions.robust import (
    gap_session_ids,
    mad_outlier_flags,
)


def _disc_median(sorted_vals):
    n = len(sorted_vals)
    return sorted_vals[-((-n) // 2) - 1]  # ceil(n/2) - 1


def _brute_mad_flags(g, v, k):
    out = {}
    for key in set(g.tolist()):
        idx = np.flatnonzero(g == key)
        vals = np.sort(v[idx])
        med = _disc_median(vals)
        dev = np.abs(v[idx] - med)
        mad = _disc_median(np.sort(dev))
        for i, d in zip(idx, dev):
            out[int(i)] = bool(d > k * mad)
    return out


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(-50, 50)),
        min_size=1, max_size=120,
    ),
    st.integers(1, 4),
)
def test_mad_flags_match_bruteforce(rows, k):
    g = np.array([r[0] for r in rows], dtype=np.int64)
    v = np.array([r[1] for r in rows], dtype=np.int64)
    order, flags = mad_outlier_flags(g, v, k)
    expect = _brute_mad_flags(g, v, k)
    # flags align with `order`: map back to original row indices
    for pos, row_idx in enumerate(order):
        assert bool(flags[pos]) == expect[int(row_idx)], (
            g.tolist(), v.tolist(), k, row_idx,
        )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1, max_size=100,
    ),
    st.integers(1, 100),
)
def test_gap_sessions_match_pandas(rows, gap):
    import pandas as pd

    uid = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    eid = np.arange(len(rows), dtype=np.int64)  # unique tie-break
    order, u, t, sid = gap_session_ids(uid, ts, eid, gap)
    # session ids are dense, start at 0, nondecreasing
    assert sid[0] == 0
    assert ((np.diff(sid) == 0) | (np.diff(sid) == 1)).all()
    # pandas reference
    df = pd.DataFrame({"u": uid, "t": ts, "e": eid}).sort_values(
        ["u", "t", "e"], ignore_index=True
    )
    new = (df["u"] != df["u"].shift()) | (
        (df["t"] - df["t"].shift()) > gap
    )
    ref_sid = new.cumsum() - 1
    assert np.array_equal(u, df["u"].to_numpy())
    assert np.array_equal(t, df["t"].to_numpy())
    assert np.array_equal(sid, ref_sid.to_numpy())

"""Shared robust-statistics kernels (single definition — the per-group
median/MAD index arithmetic is subtle enough that two copies WILL
drift; r5 review finding)."""

from __future__ import annotations

import numpy as np


def mad_outlier_flags(
    gkey: np.ndarray, vals: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-group robust outlier flags: |v − median| > k·MAD, both with
    quantile_disc index semantics (the element at ceil(n/2)−1 of the
    ascending per-group sort — matches DuckDB ``quantile_disc(x, 0.5)``
    exactly; every compare stays in the input dtype, no float
    arithmetic).

    Returns ``(order, flags)``: ``order`` sorts rows by (gkey, vals)
    and ``flags`` aligns with that order — callers emit their output
    columns ``taken`` through ``order``."""
    order = np.lexsort((vals, gkey))
    g, v = gkey[order], vals[order]
    seg_start = np.concatenate(([True], g[1:] != g[:-1]))
    seg_id = np.cumsum(seg_start) - 1
    starts = np.flatnonzero(seg_start)
    ends = np.concatenate((starts[1:], [len(g)]))
    n = ends - starts
    med_idx = starts + (-((-n) // 2) - 1)  # ceil(n/2) - 1
    med = v[med_idx][seg_id]
    dev = np.abs(v - med)
    # MAD: per-group median of deviations — re-sort deviations within
    # the SAME segment ranges, reuse the same per-segment index
    order2 = np.lexsort((dev, seg_id))
    mad = dev[order2][med_idx][seg_id]
    return order, dev > k * mad


def gap_session_ids(
    uid: np.ndarray, ts: np.ndarray, eid: np.ndarray, gap_us: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Gap-threshold sessionization for event streams: rows sorted by
    (uid, ts, eid); a new session starts at each user boundary or when
    the gap to the previous event exceeds ``gap_us``. Returns
    ``(order, uid_sorted, ts_sorted, session_id)`` — one session-id
    definition shared by every session-window operator."""
    order = np.lexsort((eid, ts, uid))
    u, t = uid[order], ts[order]
    new_sess = np.concatenate(([True], u[1:] != u[:-1]))
    new_sess[1:] |= (t[1:] - t[:-1]) > gap_us
    sid = np.cumsum(new_sess) - 1
    return order, u, t, sid

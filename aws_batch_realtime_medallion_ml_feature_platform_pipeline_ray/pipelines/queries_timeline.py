"""Timeline & context-assembly operators (round 2e).

Five operators a transcript feature platform reaches for once the
per-entity window family (B10/B11/W1-W5) is in place:

- ``conv_truncate_budget``: context-window assembly under a token
  budget — the longest turn suffix whose whitespace-token total fits
  (the packing step every SFT/eval sample builder runs before
  tokenization; reference analog: the sample prep in
  ``/root/reference/scripts/transform_and_prepare_sample_data.py``
  bounds sample payloads before upload).
- ``conv_token_share``: per (conversation, role) token mass and its
  share of the conversation total — the "who talks how much" shape
  feature next to B13's per-role rolling counts.
- ``events_peak_concurrency``: max concurrent live sessions per day via
  a sweep line over session start/end points — the capacity metric the
  reference's Kinesis/Batch sizing implies (README's events/day load
  figure) but Spark windows can't express without a self-join; here it
  is ONE distributed prefix scan.
- ``events_interp_daily``: linear interpolation of each user's daily
  value series between observed days (the smooth-fill complement of
  ``events_resample_daily``'s LOCF).
- ``train_temporal_cv``: purged expanding-window time-series CV fold
  summary — the leakage-aware split protocol (train strictly before
  val, a purge gap between them) that generalizes the engine's
  holdout/k-fold splits to forecasting-style evaluation.

Scale shapes:

- conv ops: the SAME single conv_id-keyed exchange as every transcript
  kernel; per-partition work is lexsort + ``reduceat`` segment
  arithmetic (no per-row Python).
- peak concurrency: sessions collapse to two O(1) points each; points
  fold exactly by timestamp (``fold_by_keys`` — data-scale key), and
  the running count is the engine's block-offset prefix scan
  (``with_global_rank`` with a signed weight column — the weighted rank
  IS an exclusive prefix sum, so negative weights are exactly what a
  sweep line needs). Driver traffic is O(#blocks), never O(points).
- interp/CV: day-level partials only; the CV fold table is O(calendar
  days) and finishes driver-side like ``events_survival_hazard``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import schema as S
from ..functions import text as T
from ..functions import windows as W
from ..functions.numeric import div_trunc, round6
from ..sources.reads import read_parquet_sized
from ..sources.transcripts import TRANSCRIPTS_SQL_CTE, read_events_as_transcripts
from ..stages.keyed import fold_by_keys, map_partitions_by_key
from .queries import _conv_order

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# conv_truncate_budget — context assembly under a token budget
# ---------------------------------------------------------------------------

CTX_BUDGET_TOKENS = 100  # ~median conversation total at the fixtures


def q_conv_truncate_budget(sf_dir: str):
    """For every conversation: the longest SUFFIX of turns whose total
    whitespace-token count fits ``CTX_BUDGET_TOKENS`` (most-recent-first
    context packing — suffix monotonicity makes "kept" exactly the rows
    whose reverse running total fits, so the operator is order-free
    arithmetic, not a sequential scan).

    One conv_id-keyed exchange; per partition the reverse cumulative sum
    is plain cumsum algebra on the (conv, ts, event_id) sort, and the
    per-conversation summary falls out of ``reduceat`` over segment
    bounds. Emits (n_turns, n_kept, kept_tokens, first_kept_turn) per
    conversation; ``first_kept_turn`` is NULL when not even the last
    turn fits."""
    ds = read_events_as_transcripts(sf_dir)

    def fn(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
                "kept_tokens": pa.array([], pa.int64()),
                "first_kept_turn": pa.array([], pa.int32()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        order, _k, _ts, seg_start = _conv_order(tbl)
        starts = np.flatnonzero(seg_start)
        ends = np.concatenate((starts[1:], [len(seg_start)]))
        tok = T.token_count(tbl["text"].combine_chunks().take(pa.array(order)))
        c = np.cumsum(tok)
        # reverse running total within segment: rcum_i = c[end-1] - c[i] + tok_i
        seg_end_cum = np.repeat(c[ends - 1], ends - starts)
        rcum = seg_end_cum - c + tok
        keep = rcum <= CTX_BUDGET_TOKENS
        n_turns = (ends - starts).astype(np.int64)
        n_kept = np.add.reduceat(keep.astype(np.int64), starts)
        kept_tokens = np.add.reduceat(np.where(keep, tok, 0), starts)
        # kept rows are a suffix: first kept turn_idx = n_turns - n_kept
        none_kept = n_kept == 0
        first_kept = (n_turns - n_kept).astype(np.int32)
        conv = tbl["conv_id"].combine_chunks().take(pa.array(order[starts]))
        return pa.table(
            {
                "conv_id": conv,
                "n_turns": pa.array(n_turns),
                "n_kept": pa.array(n_kept),
                "kept_tokens": pa.array(kept_tokens),
                "first_kept_turn": pa.array(first_kept, mask=none_kept),
            }
        )

    return map_partitions_by_key(ds, "conv_id", fn, num_parts=NUM_PARTS)


CONV_TRUNCATE_BUDGET_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
t AS (
    SELECT conv_id, turn_idx,
           length(string_split(text, ' '))::BIGINT AS tok
    FROM transcripts
),
c AS (
    SELECT conv_id, turn_idx, tok,
           SUM(tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                          ROWS UNBOUNDED PRECEDING) AS rcum
    FROM t
)
SELECT conv_id,
       count(*)::BIGINT AS n_turns,
       COALESCE(count(*) FILTER (WHERE rcum <= {CTX_BUDGET_TOKENS}), 0)::BIGINT
           AS n_kept,
       COALESCE(SUM(tok) FILTER (WHERE rcum <= {CTX_BUDGET_TOKENS}), 0)::BIGINT
           AS kept_tokens,
       MIN(turn_idx) FILTER (WHERE rcum <= {CTX_BUDGET_TOKENS})
           AS first_kept_turn
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# conv_token_share — per (conversation, role) token mass + share
# ---------------------------------------------------------------------------

def q_conv_token_share(sf_dir: str):
    """Per (conversation, role): turn count, token total, and the role's
    share of the conversation's tokens. Both group levels resolve inside
    the ONE keyed partition (every row of a conv is local), so the
    "join" back to conversation totals is a ``repeat`` over segment
    bounds — no second exchange. Share is one double divide + the
    engine's DuckDB-exact ``round6``."""
    import pyarrow.compute as pc

    ds = read_events_as_transcripts(sf_dir)

    def fn(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "role": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "tokens": pa.array([], pa.int64()),
                "token_share": pa.array([], pa.float64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        conv = tbl["conv_id"].combine_chunks()
        ccodes = np.asarray(pc.dictionary_encode(conv).indices).astype(np.int64)
        role = tbl["role"].combine_chunks()
        rcodes = np.asarray(pc.dictionary_encode(role).indices).astype(np.int64)
        tok = T.token_count(tbl["text"].combine_chunks())
        order = np.lexsort((rcodes, ccodes))
        cs, rs, ts_ = ccodes[order], rcodes[order], tok[order]
        head = np.zeros(len(order), dtype=bool)
        head[0] = True
        head[1:] = (cs[1:] != cs[:-1]) | (rs[1:] != rs[:-1])
        gstarts = np.flatnonzero(head)
        g_n = np.diff(np.concatenate((gstarts, [len(order)])))
        g_tok = np.add.reduceat(ts_, gstarts)
        # conversation totals over the run-level arrays
        g_conv = cs[gstarts]
        conv_starts, _conv_ends, conv_len = W.segment_bounds(g_conv)
        tot = np.repeat(np.add.reduceat(g_tok, conv_starts), conv_len)
        share = round6(g_tok.astype(np.float64) / tot.astype(np.float64))
        take = pa.array(order[gstarts])
        return pa.table(
            {
                "conv_id": conv.take(take),
                "role": role.take(take),
                "n_turns": pa.array(g_n.astype(np.int64)),
                "tokens": pa.array(g_tok.astype(np.int64)),
                "token_share": pa.array(share, pa.float64()),
            }
        )

    return map_partitions_by_key(ds, "conv_id", fn, num_parts=NUM_PARTS)


CONV_TOKEN_SHARE_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
t AS (
    SELECT conv_id, role,
           length(string_split(text, ' '))::BIGINT AS tok
    FROM transcripts
),
r AS (
    SELECT conv_id, role, count(*)::BIGINT AS n_turns,
           SUM(tok)::BIGINT AS tokens
    FROM t GROUP BY 1, 2
),
ct AS (SELECT conv_id, SUM(tokens)::BIGINT AS tot FROM r GROUP BY 1)
SELECT r.conv_id, r.role, r.n_turns, r.tokens,
       ROUND(r.tokens::DOUBLE / ct.tot::DOUBLE, 6) AS token_share
FROM r JOIN ct USING (conv_id)
"""


# ---------------------------------------------------------------------------
# events_peak_concurrency — sweep-line max concurrent sessions per day
# ---------------------------------------------------------------------------

def _ranked_sweep(sf_dir: str):
    """Shared sweep-line prologue: gap sessions → ±1 points → exact fold
    by timestamp → distributed prefix scans (one sort). Returns a
    dataset with columns (t, ns, ne, net, run1, rnk): ``run1 - 1`` is
    the live-session count immediately BEFORE ``t`` (weighted scan) and
    ``rnk`` is the dense point index (unweighted scan — the candidate
    key the neighbor-pair stage needs)."""
    from ..stages.globalorder import with_global_scans

    ds = read_events_as_transcripts(sf_dir)

    def session_points(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "t": pa.array([], pa.int64()),
                "ns": pa.array([], pa.int64()),
                "ne": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        _order, k, ts, seg_start = _conv_order(tbl)
        sid, _sturn, _gap = W.sessionize(ts, seg_start, S.SESSION_GAP_US)
        brk = seg_start.copy()
        brk[1:] |= sid[1:] != sid[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [len(k)]))
        st = ts[starts]
        en = ts[ends - 1] + 1
        t_all = np.concatenate((st, en))
        ns = np.concatenate(
            (np.ones(len(st), np.int64), np.zeros(len(en), np.int64))
        )
        ne = np.concatenate(
            (np.zeros(len(st), np.int64), np.ones(len(en), np.int64))
        )
        # partial collapse by t before the global fold
        o = np.argsort(t_all, kind="stable")
        t_s = t_all[o]
        h = np.zeros(len(t_s), dtype=bool)
        h[0] = True
        h[1:] = t_s[1:] != t_s[:-1]
        gs = np.flatnonzero(h)
        return pa.table(
            {
                "t": pa.array(t_s[gs]),
                "ns": pa.array(np.add.reduceat(ns[o], gs)),
                "ne": pa.array(np.add.reduceat(ne[o], gs)),
            }
        )

    points = map_partitions_by_key(ds, "conv_id", session_points,
                                   num_parts=NUM_PARTS)
    folded = fold_by_keys(points, ["t"], sums=("ns", "ne"),
                          num_parts=NUM_PARTS)
    with_net = folded.map_batches(
        lambda t: t.append_column(
            "net",
            pa.array(
                np.asarray(t["ns"].combine_chunks())
                - np.asarray(t["ne"].combine_chunks())
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return with_global_scans(
        with_net, ["t"], descending=[False],
        specs=[("run1", "net"), ("rnk", None)],
    )


def q_events_peak_concurrency(sf_dir: str):
    """Max number of simultaneously-live sessions per day.

    Sessions are the engine's B11 gap sessions (same
    ``SESSION_GAP_US``); each occupies the half-open interval
    ``[first_ts, last_ts + 1)`` so single-turn sessions still count.
    Every session collapses to a +1 point at its start and a -1 point at
    its (exclusive) end; points fold exactly by timestamp; the running
    live count before each timestamp is the engine's distributed
    block-offset prefix scan (``with_global_rank`` with the signed net
    as weight — rank-1 = Σ net of strictly earlier timestamps), and the
    peak AT a timestamp is that plus the starts landing on it. A final
    low-cardinality day fold takes the max."""
    from ray.data.aggregate import Max

    ranked = _ranked_sweep(sf_dir)

    def peaks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()),
                 "p_peak": pa.array([], pa.int64())}
            )
        tt = np.asarray(t["t"].combine_chunks())
        run_before = np.asarray(t["run1"].combine_chunks()) - 1
        ns = np.asarray(t["ns"].combine_chunks())
        return pa.table(
            {
                "day": pa.array(div_trunc(tt, _US_PER_DAY)),
                "p_peak": pa.array(run_before + ns),
            }
        )

    per_point = ranked.map_batches(
        peaks, batch_format="pyarrow", zero_copy_batch=True
    )
    out = per_point.groupby("day").aggregate(
        Max("p_peak", alias_name="peak_concurrency")
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "day": t["day"].cast(pa.int64()),
                "peak_concurrency": t["peak_concurrency"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_PEAK_CONCURRENCY_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
g AS (
    SELECT conv_id, ts, turn_idx,
        CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                     > {S.SESSION_GAP_US}
             THEN 1 ELSE 0 END AS brk
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
s AS (
    SELECT conv_id, ts,
        SUM(brk) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                       ROWS UNBOUNDED PRECEDING) AS sid
    FROM g
),
sess AS (
    SELECT conv_id, sid, min(epoch_us(ts)) AS st,
           max(epoch_us(ts)) + 1 AS en
    FROM s GROUP BY 1, 2
),
pts AS (
    SELECT st AS t, 1::BIGINT AS ns, 0::BIGINT AS ne FROM sess
    UNION ALL
    SELECT en, 0, 1 FROM sess
),
p2 AS (SELECT t, SUM(ns)::BIGINT AS ns, SUM(ne)::BIGINT AS ne
       FROM pts GROUP BY 1),
sc AS (
    SELECT t,
        CAST(SUM(ns - ne) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
             AS BIGINT) + ne AS peak
    FROM p2
)
SELECT t // {_US_PER_DAY} AS day, MAX(peak)::BIGINT AS peak_concurrency
FROM sc GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_concurrency_hist — time spent at each live-session level
# ---------------------------------------------------------------------------

def q_events_concurrency_hist(sf_dir: str):
    """Time-in-state histogram of session concurrency: for each live-
    session count ≥ 1, the total microseconds the system spent at that
    level — the capacity-planning integral under the sweep line (peak
    says how high, this says for how long).

    Reuses the shared sweep prologue; the level AFTER each point is
    ``run1 - 1 + net``, and the duration to the NEXT point is a global
    lead obtained from the engine's sorted-neighborhood pair stage
    (``neighbor_pairs`` with window=1 — the same rank-bucket exchange
    that powers fuzzy blocking doubles as a distributed ``lead()``).
    A final low-cardinality fold sums per level."""
    from ray.data.aggregate import Sum

    from ..stages.globalorder import neighbor_pairs

    ranked = _ranked_sweep(sf_dir)

    def with_level(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"t": pa.array([], pa.int64()),
                 "lvl": pa.array([], pa.int64()),
                 "rnk": pa.array([], pa.int64())}
            )
        run_before = np.asarray(t["run1"].combine_chunks()) - 1
        net = np.asarray(t["net"].combine_chunks())
        return pa.table(
            {
                "t": t["t"].combine_chunks(),
                "lvl": pa.array(run_before + net),
                "rnk": t["rnk"].combine_chunks(),
            }
        )

    leveled = ranked.map_batches(
        with_level, batch_format="pyarrow", zero_copy_batch=True
    )
    # the DENSE rank (not the weighted level scan) keys the pair stage —
    # consecutive points differ by exactly 1 regardless of their nets
    pairs = neighbor_pairs(
        leveled, rank_col="rnk", window=1, carry_cols=["t", "lvl"],
        num_parts=NUM_PARTS,
    )

    def durations(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lvl": pa.array([], pa.int64()),
                 "p_us": pa.array([], pa.int64())}
            )
        ta = np.asarray(t["t_a"].combine_chunks())
        tb = np.asarray(t["t_b"].combine_chunks())
        lv = np.asarray(t["lvl_a"].combine_chunks())
        keep = lv >= 1
        return pa.table(
            {
                "lvl": pa.array(lv[keep]),
                "p_us": pa.array((tb - ta)[keep]),
            }
        )

    out = (
        pairs.map_batches(durations, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("lvl")
        .aggregate(Sum("p_us", alias_name="total_us"))
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "concurrency": t["lvl"].cast(pa.int64()),
                "total_us": t["total_us"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_CONCURRENCY_HIST_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
g AS (
    SELECT conv_id, ts, turn_idx,
        CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                     > {S.SESSION_GAP_US}
             THEN 1 ELSE 0 END AS brk
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
s AS (
    SELECT conv_id, ts,
        SUM(brk) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                       ROWS UNBOUNDED PRECEDING) AS sid
    FROM g
),
sess AS (
    SELECT conv_id, sid, min(epoch_us(ts)) AS st,
           max(epoch_us(ts)) + 1 AS en
    FROM s GROUP BY 1, 2
),
pts AS (
    SELECT st AS t, 1::BIGINT AS ns, 0::BIGINT AS ne FROM sess
    UNION ALL
    SELECT en, 0, 1 FROM sess
),
p2 AS (SELECT t, SUM(ns)::BIGINT AS ns, SUM(ne)::BIGINT AS ne
       FROM pts GROUP BY 1),
sc AS (
    SELECT t,
        CAST(SUM(ns - ne) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS lvl
    FROM p2
),
iv AS (SELECT lvl, lead(t) OVER (ORDER BY t) - t AS dur FROM sc)
SELECT lvl AS concurrency, CAST(SUM(dur) AS BIGINT) AS total_us
FROM iv WHERE dur IS NOT NULL AND lvl >= 1
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_interp_daily — linear interpolation onto the daily grid
# ---------------------------------------------------------------------------

def q_events_interp_daily(sf_dir: str):
    """Each user's irregular value series resampled to a REGULAR daily
    grid (first..last observed day) with LINEAR interpolation between
    observed days — the smooth-fill counterpart of
    ``events_resample_daily``'s step-function LOCF. A day's observation
    is its last ``(ts, event_id)`` row; interpolated values use the
    identical IEEE expression tree on both sides
    (``v0 + (v1-v0) * ((d-d0)/(d1-d0))``), so parity is bit-exact with
    no rounding step.

    Same single keyed-exchange plan as the LOCF resampler: per
    partition one lexsort, per-day last-obs selection by run bounds,
    grid materialization as repeat/arange arithmetic, and BOTH bracketing
    observations via one ``searchsorted`` on the per-user-blocked
    composite day axis."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def interp_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "value_interp": pa.array([], pa.float64()),
                "is_obs": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        val = np.asarray(t["value"].combine_chunks()).astype(np.float64)
        order = np.lexsort((eid, ts, uid))
        us, tss, vs = uid[order], ts[order], val[order]
        day = tss // _US_PER_DAY
        if len(day) and int(day.min()) < 0:
            # same packing precondition as events_resample_daily
            raise ValueError(
                "events_interp_daily: pre-epoch timestamps unsupported"
            )
        # last row of each (user, day) run = the day's observation
        h = np.zeros(len(us), dtype=bool)
        h[-1] = True
        h[:-1] = (us[1:] != us[:-1]) | (day[1:] != day[:-1])
        last_idx = np.flatnonzero(h)
        u_obs, d_obs, v_obs = us[last_idx], day[last_idx], vs[last_idx]
        starts, ends, _len = W.segment_bounds(u_obs)
        nseg = len(starts)
        spans = d_obs[ends - 1] - d_obs[starts] + 1
        total = int(spans.sum())
        seg_of_grid = np.repeat(np.arange(nseg, dtype=np.int64), spans)
        gstart = np.concatenate(([0], np.cumsum(spans)[:-1]))
        offs = np.arange(total, dtype=np.int64) - np.repeat(gstart, spans)
        grid_day = np.repeat(d_obs[starts], spans) + offs
        stride = int(day.max()) + 1
        if nseg * stride >= 2**63:
            raise OverflowError(
                "events_interp_daily: composite day axis would overflow"
            )
        seg_id_obs = np.repeat(np.arange(nseg, dtype=np.int64), ends - starts)
        okey = seg_id_obs * stride + d_obs
        gkey = seg_of_grid * stride + grid_day
        i0 = np.searchsorted(okey, gkey, side="right") - 1
        d0, v0 = d_obs[i0], v_obs[i0]
        exact = d0 == grid_day
        # non-exact grid days sit strictly between two observations of the
        # same user (grid spans first..last observed day), so i0+1 is the
        # forward bracket and stays inside the user's block
        i1 = np.minimum(i0 + 1, len(d_obs) - 1)
        d1, v1 = d_obs[i1], v_obs[i1]
        denom = np.where(exact, 1, d1 - d0).astype(np.float64)
        frac = (grid_day - d0).astype(np.float64) / denom
        vi = np.where(exact, v0, v0 + (v1 - v0) * frac)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u_obs[starts], spans)),
                "day": pa.array(grid_day),
                "value_interp": pa.array(vi, pa.float64()),
                "is_obs": pa.array(exact.astype(np.int64)),
            }
        )

    return map_partitions_by_key(ds, "user_id", interp_part,
                                 num_parts=NUM_PARTS)


EVENTS_INTERP_SQL = f"""
WITH ev AS (
    SELECT user_id, (epoch_us(ts) // {_US_PER_DAY})::BIGINT AS day,
           ts, event_id, value
    FROM events
),
lastd AS (
    SELECT user_id, day, value FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC
        ) AS rn FROM ev
    ) WHERE rn = 1
),
b AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM ev GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS day FROM b),
bk AS (
    SELECT g.user_id, g.day, l.day AS d0, l.value AS v0
    FROM grid g ASOF JOIN lastd l
      ON g.user_id = l.user_id AND g.day >= l.day
),
fw AS (
    SELECT g.user_id, g.day, l.day AS d1, l.value AS v1
    FROM grid g ASOF JOIN lastd l
      ON g.user_id = l.user_id AND g.day <= l.day
)
SELECT bk.user_id, bk.day::BIGINT AS day,
       CASE WHEN bk.d0 = bk.day THEN bk.v0
            ELSE bk.v0 + (fw.v1 - bk.v0) *
                 (((bk.day - bk.d0)::DOUBLE) / ((fw.d1 - bk.d0)::DOUBLE))
       END AS value_interp,
       CASE WHEN bk.d0 = bk.day THEN 1 ELSE 0 END::BIGINT AS is_obs
FROM bk JOIN fw ON bk.user_id = fw.user_id AND bk.day = fw.day
"""


# ---------------------------------------------------------------------------
# train_temporal_cv — purged expanding-window time-series CV summary
# ---------------------------------------------------------------------------

CV_FOLDS = 5
CV_PURGE_DAYS = 2


def q_train_temporal_cv(sf_dir: str):
    """Purged expanding-window time-series cross-validation plan:
    calendar days split into ``CV_FOLDS`` contiguous groups (DuckDB
    ``ntile`` semantics — first ``n % k`` groups one day larger); fold
    ``f`` (f = 2..K) trains on all days in groups < f and validates on
    group f MINUS its first ``CV_PURGE_DAYS`` days (the purge gap that
    keeps label windows from leaking across the boundary — same
    anti-leakage doctrine as the engine's as-of join).

    Only day-level totals move: per-batch day-count partials fold through
    a tiny groupby (O(calendar days)), and the fold table is assembled
    driver-side like ``events_survival_hazard`` — no event row reaches
    the driver. Emits per fold: train/purged/val row counts and the
    boundary days."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()),
                 "p_n": pa.array([], pa.int64())}
            )
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        day = div_trunc(ts, _US_PER_DAY)
        d = np.sort(day)
        s_, _e, ln = W.segment_bounds(d)
        return pa.table(
            {"day": pa.array(d[s_]), "p_n": pa.array(ln.astype(np.int64))}
        )

    counts = (
        ds.map_batches(day_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("p_n", alias_name="n"))
        .take_all()
    )  # O(calendar days)
    days = np.array(sorted(r["day"] for r in counts), dtype=np.int64)
    n_by_day = {int(r["day"]): int(r["n"]) for r in counts}
    n = np.array([n_by_day[int(d)] for d in days], dtype=np.int64)
    nd, k = len(days), CV_FOLDS
    sizes = np.full(k, nd // k, dtype=np.int64)
    sizes[: nd % k] += 1  # ntile: first n%k groups one larger
    grp = np.repeat(np.arange(1, k + 1, dtype=np.int64), sizes)
    rn = np.concatenate([np.arange(1, s + 1, dtype=np.int64) for s in sizes])

    folds, n_train, n_purged, n_val = [], [], [], []
    train_end, val_start, val_start_mask = [], [], []
    for f in range(2, k + 1):
        tr = grp < f
        pg = (grp == f) & (rn <= CV_PURGE_DAYS)
        vl = (grp == f) & (rn > CV_PURGE_DAYS)
        folds.append(f)
        n_train.append(int(n[tr].sum()))
        n_purged.append(int(n[pg].sum()))
        n_val.append(int(n[vl].sum()))
        train_end.append(int(days[tr].max()) if tr.any() else 0)
        has_val = bool(vl.any())
        val_start.append(int(days[vl].min()) if has_val else 0)
        val_start_mask.append(not has_val)
    return pa.table(
        {
            "fold": pa.array(folds, pa.int64()),
            "n_train": pa.array(n_train, pa.int64()),
            "n_purged": pa.array(n_purged, pa.int64()),
            "n_val": pa.array(n_val, pa.int64()),
            "train_end_day": pa.array(train_end, pa.int64()),
            "val_start_day": pa.array(
                val_start, pa.int64(), mask=np.array(val_start_mask)
            ),
        }
    )


TRAIN_TEMPORAL_CV_SQL = f"""
WITH ev AS (
    SELECT (epoch_us(ts) // {_US_PER_DAY})::BIGINT AS day FROM events
),
dc AS (SELECT day, count(*)::BIGINT AS n FROM ev GROUP BY 1),
dr AS (SELECT day, n, ntile({CV_FOLDS}) OVER (ORDER BY day) AS grp FROM dc),
dr2 AS (
    SELECT *, row_number() OVER (PARTITION BY grp ORDER BY day) AS rn
    FROM dr
),
folds AS (SELECT unnest(generate_series(2, {CV_FOLDS})) AS fold)
SELECT f.fold::BIGINT AS fold,
    COALESCE(SUM(n) FILTER (WHERE grp < f.fold), 0)::BIGINT AS n_train,
    COALESCE(SUM(n) FILTER (
        WHERE grp = f.fold AND rn <= {CV_PURGE_DAYS}), 0)::BIGINT AS n_purged,
    COALESCE(SUM(n) FILTER (
        WHERE grp = f.fold AND rn > {CV_PURGE_DAYS}), 0)::BIGINT AS n_val,
    MAX(day) FILTER (WHERE grp < f.fold) AS train_end_day,
    MIN(day) FILTER (WHERE grp = f.fold AND rn > {CV_PURGE_DAYS})
        AS val_start_day
FROM folds f CROSS JOIN dr2
GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "conv_truncate_budget": (q_conv_truncate_budget, CONV_TRUNCATE_BUDGET_SQL),
    "conv_token_share": (q_conv_token_share, CONV_TOKEN_SHARE_SQL),
    "events_peak_concurrency": (
        q_events_peak_concurrency,
        EVENTS_PEAK_CONCURRENCY_SQL,
    ),
    "events_concurrency_hist": (
        q_events_concurrency_hist,
        EVENTS_CONCURRENCY_HIST_SQL,
    ),
    "events_interp_daily": (q_events_interp_daily, EVENTS_INTERP_SQL),
    "train_temporal_cv": (q_train_temporal_cv, TRAIN_TEMPORAL_CV_SQL),
}

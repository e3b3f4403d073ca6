"""Session-structure and lifetime operators: duration-capped
sessionization (gap threshold + max-session-length splitting) and a
discrete-time survival/hazard profile of user lifetimes.

Reference parity: extends the engine's B11 gap sessionization
(functions/windows.sessionize, reference watermark semantics in
stream_pipeline) with the two lifecycle questions a feature platform
asks next — "cap runaway sessions" and "when do users churn".

Scale shapes:

- ``sessionize_capped``: the SAME single conv_id-keyed exchange as
  ``sessionize``; the cap adds only vectorized integer arithmetic
  (sub-session = elapsed-from-session-start // cap, fixed boundaries
  from the session's first turn — order-free, so it stays exact under
  any partitioning).
- ``events_survival_hazard``: per-user (first_day, last_day) via the
  engine's exact keyed fold (``fold_by_keys`` min/max — high-cardinality
  safe), then each user collapses to THREE O(1) difference-array
  partials; the per-day fold is O(calendar days) and the hazard
  arithmetic runs on that tiny table driver-side. No event row and no
  per-user row ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as S
from ..functions import windows as W
from ..sources.reads import read_parquet_sized
from ..sources.transcripts import TRANSCRIPTS_SQL_CTE, read_events_as_transcripts
from ..stages.keyed import fold_by_keys, map_partitions_by_key
from .queries import _conv_order, _turn_idx

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

CAP_US = 2 * 3_600 * 1_000_000  # max capped-session length: 2 hours


def q_sessionize_capped(sf_dir: str):
    """Gap sessionization with a maximum-session-duration cap: a session
    also splits at fixed ``CAP_US`` boundaries measured from its FIRST
    turn (the standard guard against runaway sessions — bot loops, held
    connections — that gap-only logic never closes).

    The fixed-boundary definition (``sub = (ts - session_start) // cap``)
    is deliberately order-free: unlike "reset the clock at each split",
    it needs no sequential scan, so the kernel stays one vectorized pass
    and any engine computes identical splits. Output ids are dense per
    conversation, ordered (session, boundary)."""
    ds = read_events_as_transcripts(sf_dir)

    def fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "session_id": pa.array([], pa.int64()),
                    "capped_session_id": pa.array([], pa.int64()),
                    "capped_turn_idx": pa.array([], pa.int32()),
                }
            )
        order, _k, ts, seg_start = _conv_order(tbl)
        sid, _sturn, _gap = W.sessionize(ts, seg_start, S.SESSION_GAP_US)
        n = len(ts)
        arange = np.arange(n, dtype=np.int64)
        # session start ts: first row of each (conv, session) run
        sess_break = seg_start.copy()
        sess_break[1:] |= sid[1:] != sid[:-1]
        sess_first = np.maximum.accumulate(np.where(sess_break, arange, 0))
        sub = (ts - ts[sess_first]) // CAP_US  # ts >= start, floor == trunc
        cap_break = sess_break.copy()
        cap_break[1:] |= sub[1:] != sub[:-1]
        # dense 0-based capped id within each conversation
        cb = np.cumsum(cap_break, dtype=np.int64)
        seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
        capped_id = cb - cb[seg_first]
        cap_first = np.maximum.accumulate(np.where(cap_break, arange, 0))
        capped_turn = (arange - cap_first).astype(np.int32)
        return pa.table(
            {
                "conv_id": tbl["conv_id"].combine_chunks().take(pa.array(order)),
                "turn_idx": pa.array(_turn_idx(seg_start), pa.int32()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "session_id": pa.array(sid, pa.int64()),
                "capped_session_id": pa.array(capped_id, pa.int64()),
                "capped_turn_idx": pa.array(capped_turn, pa.int32()),
            }
        )

    return map_partitions_by_key(ds, "conv_id", fn, num_parts=NUM_PARTS)


SESSIONIZE_CAPPED_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
g AS (
    SELECT conv_id, turn_idx, ts,
        epoch_us(ts) - lag(epoch_us(ts))
            OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS gap_us
    FROM transcripts
),
s AS (
    SELECT *,
        CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > {S.SESSION_GAP_US}
                      THEN 1 ELSE 0 END)
            OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
    FROM g
),
b AS (
    SELECT *,
        (epoch_us(ts) - min(epoch_us(ts))
             OVER (PARTITION BY conv_id, session_id)) // {CAP_US} AS sub
    FROM s
)
SELECT conv_id, turn_idx, ts, session_id,
    CAST(dense_rank() OVER (PARTITION BY conv_id ORDER BY session_id, sub)
         - 1 AS BIGINT) AS capped_session_id,
    CAST(row_number() OVER (PARTITION BY conv_id, session_id, sub
                            ORDER BY ts, turn_idx) - 1 AS INTEGER)
        AS capped_turn_idx
FROM b
"""


# ---------------------------------------------------------------------------
# Discrete-time survival / churn hazard over user lifetimes
# ---------------------------------------------------------------------------

_US_DAY = 86_400_000_000


def q_events_survival_hazard(sf_dir: str):
    """Kaplan-Meier-style daily churn profile: for every calendar day
    with activity, how many users were "alive" (first_day <= day <=
    last_day), how many had their LAST event that day (churned), and the
    discrete hazard ``churned / at_risk`` — the retention-curve input a
    feature platform derives from the same event stream.

    at_risk comes from a difference array over the contiguous day range
    (+1 at first_day, -1 after last_day, one cumsum over O(days) on the
    driver), so users contribute O(1) partials regardless of lifetime
    length; counts stay int64 and the hazard is the only division."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def day_col(t: pa.Table) -> pa.Table:
        # day duplicated into fd/ld so ONE fold yields both span ends
        # (fold_by_keys names outputs after their value column). The
        # batch's DISTINCT active days ride the same stream as marker
        # rows keyed user_id = -(day+1) — one parquet read serves both
        # the span fold and the observed-day set (real user_ids are
        # non-negative, so the keyspaces cannot collide).
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "fd": pa.array([], pa.int64()),
                    "ld": pa.array([], pa.int64()),
                }
            )
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        day = us // _US_DAY
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        if (uid < 0).any():
            raise ValueError("survival: negative user_id collides with day markers")
        md = np.unique(day)
        return pa.table(
            {
                "user_id": pa.array(np.concatenate((uid, -(md + 1))), pa.int64()),
                "fd": pa.array(np.concatenate((day, md)), pa.int64()),
                "ld": pa.array(np.concatenate((day, md)), pa.int64()),
            }
        )

    days = ds.map_batches(day_col, batch_format="pyarrow", zero_copy_batch=True)
    # materialize: the folded table is O(users + days) — far smaller than
    # the events read it replaces for the TWO consumers below (diff
    # partials + observed-day collect); without it each consumer would
    # re-run the full parquet scan
    spans = fold_by_keys(
        days, ["user_id"], mins=("fd",), maxs=("ld",), num_parts=NUM_PARTS
    ).materialize()

    def diff_partial(t: pa.Table) -> pa.Table:
        """(user, first, last) rows -> difference-array + churn partials
        (marker rows excluded)."""
        t = t.filter(pc.greater_equal(t["user_id"], 0))
        if t.num_rows == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "d_alive": pa.array([], pa.int64()),
                    "d_churn": pa.array([], pa.int64()),
                }
            )
        fd = np.asarray(t["fd"].combine_chunks())
        ld = np.asarray(t["ld"].combine_chunks())
        day = np.concatenate((fd, ld + 1, ld))
        d_alive = np.concatenate(
            (
                np.ones(len(fd), dtype=np.int64),
                -np.ones(len(ld), dtype=np.int64),
                np.zeros(len(ld), dtype=np.int64),
            )
        )
        d_churn = np.concatenate(
            (
                np.zeros(len(fd), dtype=np.int64),
                np.zeros(len(ld), dtype=np.int64),
                np.ones(len(ld), dtype=np.int64),
            )
        )
        g = (
            pa.table(
                {
                    "day": pa.array(day, pa.int64()),
                    "d_alive": pa.array(d_alive, pa.int64()),
                    "d_churn": pa.array(d_churn, pa.int64()),
                }
            )
            .group_by("day")
            .aggregate([("d_alive", "sum"), ("d_churn", "sum")])
        )
        return g.rename_columns(["day", "d_alive", "d_churn"])

    folded = (
        spans.map_batches(diff_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(
            Sum("d_alive", alias_name="da"), Sum("d_churn", alias_name="dc")
        )
        .take_all()
    )  # O(calendar days)
    folded.sort(key=lambda r: r["day"])
    dkeys = np.array([r["day"] for r in folded], dtype=np.int64)
    da = np.array([r["da"] for r in folded], dtype=np.int64)
    dc = np.array([r["dc"] for r in folded], dtype=np.int64)
    if len(dkeys) == 0:
        return pa.table(
            {
                "dt": pa.array([], pa.string()),
                "at_risk": pa.array([], pa.int64()),
                "churned": pa.array([], pa.int64()),
                "hazard": pa.array([], pa.float64()),
            }
        )
    # contiguous day grid: cumsum the difference array. The grid includes
    # span-gap days with at_risk > 0 but no events; the SQL twin reports
    # only distinct EVENT days, so restrict to those (the marker rows
    # that rode the span fold — no second events read).
    lo_days = np.arange(dkeys.min(), dkeys.max() + 1, dtype=np.int64)
    alive = np.zeros(len(lo_days), dtype=np.int64)
    churn = np.zeros(len(lo_days), dtype=np.int64)
    alive[dkeys - dkeys.min()] = da
    churn[dkeys - dkeys.min()] = dc
    at_risk = np.cumsum(alive)
    from ..functions.numeric import round6

    marker_rows = spans.map_batches(
        lambda t: t.filter(pc.less(t["user_id"], 0)).select(["fd"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # O(days) marker rows off the already-materialized spans
    obs = np.array(sorted(r["fd"] for r in marker_rows), dtype=np.int64)
    sel = np.isin(lo_days, obs)
    days_out = lo_days[sel]
    ar = at_risk[sel]
    ch = churn[sel]
    return pa.table(
        {
            "dt": pa.array(
                np.datetime_as_string(days_out.astype("datetime64[D]"), unit="D")
            ),
            "at_risk": pa.array(ar, pa.int64()),
            "churned": pa.array(ch, pa.int64()),
            "hazard": pa.array(round6(ch / ar.astype(np.float64)), pa.float64()),
        }
    )


EVENTS_SURVIVAL_SQL = """
WITH u AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS fd, max(CAST(ts AS DATE)) AS ld
    FROM events GROUP BY 1
),
d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
r AS (
    SELECT d.day, CAST(count(*) AS BIGINT) AS at_risk
    FROM d JOIN u ON d.day BETWEEN u.fd AND u.ld
    GROUP BY 1
),
c AS (SELECT ld AS day, CAST(count(*) AS BIGINT) AS churned FROM u GROUP BY 1)
SELECT strftime(r.day, '%Y-%m-%d') AS dt,
       r.at_risk,
       CAST(coalesce(c.churned, 0) AS BIGINT) AS churned,
       ROUND(CAST(coalesce(c.churned, 0) AS BIGINT)
             / CAST(r.at_risk AS DOUBLE), 6) AS hazard
FROM r LEFT JOIN c ON r.day = c.day
"""


REGISTRY: dict[str, tuple] = {
    "sessionize_capped": (q_sessionize_capped, SESSIONIZE_CAPPED_SQL),
    "events_survival_hazard": (q_events_survival_hazard, EVENTS_SURVIVAL_SQL),
}

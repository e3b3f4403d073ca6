"""Round-3 batch E: Haar wavelet decomposition of the daily revenue
series (multi-resolution burst localization) and the Hill tail-index
estimator over the value distribution's upper order statistics.

Both integer-exact up to the final documented float ops (the Haar
details are pure integer sums/differences of cents; Hill's log-ratios
use the identical IEEE expression on both engines with ROUND6)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# events_haar_details — unnormalized Haar wavelet details, levels 1..3
# ---------------------------------------------------------------------------

HAAR_LEVELS = 3


def q_events_haar_details(sf_dir: str):
    """Unnormalized Haar detail coefficients of the daily revenue-cents
    series at dyadic levels 1..{HAAR_LEVELS}: for level ℓ and block i,
    ``detail = Σ(first 2^(ℓ-1) days) − Σ(second half)`` over the block
    of 2^ℓ days anchored at the first active day — the multi-resolution
    change detector (a large |detail| at level ℓ localizes a burst at
    the 2^ℓ-day scale, where a global mean shift hides). All-integer
    cents: bit-exact by construction.

    Plan: the daily totals fold distributed (per-batch partials →
    calendar-bounded groupby); every level's coefficients derive from
    the O(days) daily vector with vectorized strided reshapes — the
    bounded finale shape (events_xcorr_lagged precedent)."""
    from .queries_r3f import _daily_cents

    daily = _daily_cents(sf_dir)
    if len(daily) == 0:
        return pa.table(
            {
                "level": pa.array([], pa.int64()),
                "idx": pa.array([], pa.int64()),
                "detail_cents": pa.array([], pa.int64()),
            }
        )
    days = daily["day"].to_numpy(np.int64)
    cents = daily["cents"].to_numpy(np.int64)
    d0 = int(days[0])
    span = int(days[-1]) - d0 + 1
    x = np.zeros(span, np.int64)
    x[days - d0] = cents
    present = np.zeros(span, bool)
    present[days - d0] = True
    levels, idxs, det = [], [], []
    for lev in range(1, HAAR_LEVELS + 1):
        blk = 1 << lev
        half = blk >> 1
        n_blk = -(-span // blk)
        pad = np.zeros(n_blk * blk, np.int64)
        pad[:span] = x
        padp = np.zeros(n_blk * blk, bool)
        padp[:span] = present
        m = pad.reshape(n_blk, blk)
        d = m[:, :half].sum(axis=1) - m[:, half:].sum(axis=1)
        # emit only blocks containing an ACTIVE day (the SQL twin groups
        # existing rows; an all-gap block has no row there)
        keep = padp.reshape(n_blk, blk).any(axis=1)
        levels.append(np.full(int(keep.sum()), lev, np.int64))
        idxs.append(np.flatnonzero(keep).astype(np.int64))
        det.append(d[keep])
    return pa.table(
        {
            "level": pa.array(np.concatenate(levels)),
            "idx": pa.array(np.concatenate(idxs)),
            "detail_cents": pa.array(np.concatenate(det)),
        }
    )


def _haar_sql() -> str:
    parts = []
    for lev in range(1, HAAR_LEVELS + 1):
        half = 1 << (lev - 1)
        parts.append(f"""
SELECT CAST({lev} AS BIGINT) AS level,
       CAST((day - (SELECT d0 FROM b)) // {1 << lev} AS BIGINT) AS idx,
       CAST(sum(CASE WHEN ((day - (SELECT d0 FROM b)) // {half}) % 2 = 0
                     THEN cents ELSE -cents END) AS BIGINT) AS detail_cents
FROM d GROUP BY 2""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH d AS (
    SELECT epoch_us(ts) // 86400000000 AS day,
           CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1
),
b AS (SELECT min(day) AS d0 FROM d)
{union}
"""


# ---------------------------------------------------------------------------
# events_hill_tail — Hill estimator of the value distribution's tail index
# ---------------------------------------------------------------------------

HILL_K = 100  # upper order statistics used


def q_events_hill_tail(sf_dir: str):
    """Hill estimator of the heavy-tail index over purchase values:
    ``hill = mean(ln(x_(i) / x_(k+1)))`` across the top-k order
    statistics (ties broken by event_id so the order-statistic set is
    deterministic); ``alpha = 1 / hill`` is the Pareto tail exponent —
    the tail-risk companion to the Zipf fit (docs_zipf_fit) on the
    VALUE axis.

    Plan: per-block partial top-(k+1) rides the block scan (O(k) rows
    per block — the global topk precedent), the driver merges O(blocks
    × k) candidates, and the k log-ratios are the only float ops —
    identical expression both engines, ROUND6."""
    from ..functions.numeric import round6, round_half_away

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def block_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cents": pa.array([], pa.int64()),
                "eid": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        is_p = np.asarray(
            pc.equal(t["event_type"].combine_chunks(), "purchase")
        )
        if not is_p.any():
            return empty
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks())[is_p] * 100.0
        ).astype(np.int64)
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))[is_p]
        order = np.lexsort((eid, -cents))[: HILL_K + 1]
        return pa.table(
            {
                "cents": pa.array(cents[order], pa.int64()),
                "eid": pa.array(eid[order], pa.int64()),
            }
        )

    cand = (
        ds.map_batches(block_topk, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # O(#blocks x k)
    )
    if len(cand) <= HILL_K:
        # fewer than k+1 purchases: mirror the SQL twin exactly
        # (k stays the literal parameter, the statistics are NULL)
        return pa.table(
            {
                "k": pa.array([HILL_K], pa.int64()),
                "xk_cents": pa.array([None], pa.int64()),
                "hill": pa.array([None], pa.float64()),
                "alpha": pa.array([None], pa.float64()),
            }
        )
    c = cand["cents"].to_numpy(np.int64)
    e = cand["eid"].to_numpy(np.int64)
    order = np.lexsort((e, -c))[: HILL_K + 1]
    top = c[order]
    xk = int(top[HILL_K])  # the (k+1)-th order statistic
    logs = np.log(top[:HILL_K].astype(np.float64) / float(xk))
    hill = float(round6(np.array([logs.mean()]))[0])
    alpha = float(round6(np.array([1.0 / (logs.mean())]))[0]) if logs.mean() > 0 else None
    return pa.table(
        {
            "k": pa.array([HILL_K], pa.int64()),
            "xk_cents": pa.array([xk], pa.int64()),
            "hill": pa.array([hill], pa.float64()),
            "alpha": pa.array([alpha], pa.float64()),
        }
    )


EVENTS_HILL_SQL = f"""
WITH p AS (
    SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
r AS (
    SELECT *, row_number() OVER (ORDER BY cents DESC, event_id) AS rn
    FROM p
),
xk AS (SELECT cents AS v FROM r WHERE rn = {HILL_K + 1}),
t AS (
    SELECT ln(CAST(cents AS DOUBLE) / (SELECT CAST(v AS DOUBLE) FROM xk))
               AS lr
    FROM r WHERE rn <= {HILL_K}
)
SELECT CAST({HILL_K} AS BIGINT) AS k,
       (SELECT CAST(v AS BIGINT) FROM xk) AS xk_cents,
       ROUND(avg(lr), 6) AS hill,
       CASE WHEN avg(lr) > 0 THEN ROUND(1.0 / avg(lr), 6) END AS alpha
FROM t
"""


REGISTRY: dict[str, tuple] = {
    "events_haar_details": (q_events_haar_details, _haar_sql()),
    "events_hill_tail": (q_events_hill_tail, EVENTS_HILL_SQL),
}

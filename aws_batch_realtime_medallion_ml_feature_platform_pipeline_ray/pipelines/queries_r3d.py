"""Round-3 batch D: sole-blame supplier analysis (the TPC-H Q21
exists/not-exists composition) and Wald's SPRT sequential A/B test.

Both have bit-exact DuckDB twins (float policy per queries.py; the SPRT
log-likelihood uses the identical IEEE expression tree on both sides).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized
from ..stages.keyed import cogroup_by_key, fold_sum_by_keys, map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# suppliers_late_blame — TPC-H Q21-style exists / not-exists composition
# ---------------------------------------------------------------------------

BLAME_SLA_DAYS = 30
_SLA_US = BLAME_SLA_DAYS * 86_400_000_000


def q_suppliers_late_blame(sf_dir: str):
    """Per supplier: the number of multi-supplier orders where THIS
    supplier breached the 30-day ship SLA and NO other supplier in the
    order did — the classic "suppliers who kept orders waiting"
    exists + not-exists double-correlated-subquery plan (TPC-H Q21
    shape, adapted to this schema's shipdate-vs-orderdate SLA; the
    reference has no joins at all, so this extends the engine's
    relational family).

    Plan: ONE cogroup on orderkey attaches o_orderdate to lineitems and
    reduces each order VECTORIZED (distinct suppliers, distinct late
    suppliers, the sole-late supplier) — per-order logic is segmented
    numpy off one lexsort, never a per-order Python loop; a second
    exchange folds (suppkey, 1) partials. Output is O(suppliers)."""
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["o_orderkey"], "o_orderdate": t["o_orderdate"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def per_order(lpart: pa.Table, rpart: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_suppkey": pa.array([], pa.int64()),
                "p_n": pa.array([], pa.int64()),
            }
        )
        if lpart.num_rows == 0 or rpart.num_rows == 0:
            return empty
        ok = np.asarray(lpart["l_orderkey"].combine_chunks().cast(pa.int64()))
        sk = np.asarray(lpart["l_suppkey"].combine_chunks().cast(pa.int64()))
        ship = np.asarray(
            lpart["l_shipdate"].combine_chunks().cast(pa.int64())
        )
        rok = np.asarray(rpart["l_orderkey"].combine_chunks().cast(pa.int64()))
        odate = np.asarray(
            rpart["o_orderdate"].combine_chunks().cast(pa.int64())
        )
        r_order = np.argsort(rok)
        rok_s, od_s = rok[r_order], odate[r_order]
        pos = np.searchsorted(rok_s, ok)
        pos_c = np.minimum(pos, len(rok_s) - 1)
        hit = rok_s[pos_c] == ok
        if not hit.all():  # orphan lineitems: inner-join semantics
            ok, sk, ship, pos_c = ok[hit], sk[hit], ship[hit], pos_c[hit]
        if len(ok) == 0:
            return empty
        late = ship > od_s[pos_c] + _SLA_US
        # reduce to distinct (order, supplier) with any-late flag
        order = np.lexsort((late, sk, ok))  # late=True sorts last -> max
        ok_s, sk_s, late_s = ok[order], sk[order], late[order]
        last = np.concatenate(
            ((ok_s[1:] != ok_s[:-1]) | (sk_s[1:] != sk_s[:-1]), [True])
        )
        okd, skd, lated = ok_s[last], sk_s[last], late_s[last]
        # per-order counts off segment bounds
        starts = np.flatnonzero(
            np.concatenate(([True], okd[1:] != okd[:-1]))
        )
        seg_len = np.diff(np.append(starts, len(okd)))
        seg_id = np.repeat(np.arange(len(starts)), seg_len)
        n_late = np.zeros(len(starts), np.int64)
        np.add.at(n_late, seg_id, lated.astype(np.int64))
        qualifies = (seg_len >= 2) & (n_late == 1)
        blame = lated & qualifies[seg_id]
        if not blame.any():
            return empty
        bs = np.sort(skd[blame])
        u, idx = np.unique(bs, return_index=True)
        cnt = np.diff(np.append(idx, len(bs)))
        return pa.table(
            {
                "l_suppkey": pa.array(u, pa.int64()),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = cogroup_by_key(
        li, orders, "l_orderkey", per_order, num_parts=NUM_PARTS
    )
    folded = fold_sum_by_keys(
        partials, ["l_suppkey"], ["p_n"], num_parts=NUM_PARTS
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "l_suppkey": t["l_suppkey"],
                "numwait": t["p_n"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SUPPLIERS_LATE_BLAME_SQL = f"""
WITH j AS (
    SELECT l.l_orderkey, l.l_suppkey,
           max(CASE WHEN l.l_shipdate > o.o_orderdate
                         + INTERVAL {BLAME_SLA_DAYS} DAY
                    THEN 1 ELSE 0 END) AS late
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
),
per_order AS (
    SELECT l_orderkey, count(*) AS n_supp,
           CAST(sum(late) AS BIGINT) AS n_late
    FROM j GROUP BY 1
)
SELECT j.l_suppkey, CAST(count(*) AS BIGINT) AS numwait
FROM j JOIN per_order p USING (l_orderkey)
WHERE j.late = 1 AND p.n_supp >= 2 AND p.n_late = 1
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_sprt — Wald sequential probability-ratio test on arrival order
# ---------------------------------------------------------------------------

SPRT_P0 = 0.18   # H0: purchase share
SPRT_P1 = 0.22   # H1
SPRT_ALPHA = 0.05
SPRT_BETA = 0.05


def q_events_sprt(sf_dir: str):
    """Wald's SPRT over the event stream in ARRIVAL (event_id) order:
    after each event the purchase-share log-likelihood ratio walks by
    ``ln(p1/p0)`` (purchase) or ``ln((1-p1)/(1-p0))`` (other); the test
    stops at the FIRST crossing of ``ln((1-β)/α)`` (accept H1) or
    ``ln(β/(1-α))`` (accept H0). The sequential A/B machinery that
    stops experiments early instead of fixed-horizon testing
    (events_srm_check / events_welch_t are the fixed-horizon family).

    Plan: the LLR is LINEAR in the prefix purchase count, so the walk
    needs only the engine's distributed global prefix scan
    (globalorder.with_global_scans, weighted rank = prefix purchases in
    event_id order); crossing detection is a vectorized per-block scan
    and the first-crossing fold collects one candidate row per block.
    Output: one row (decision, n_at_decision, llr ROUND6)."""
    from ..functions.numeric import round6
    from ..stages.globalorder import with_global_scans

    c1 = math.log(SPRT_P1 / SPRT_P0)
    c0 = math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))
    hi = math.log((1.0 - SPRT_BETA) / SPRT_ALPHA)
    lo = math.log(SPRT_BETA / (1.0 - SPRT_ALPHA))

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    ).map_batches(
        lambda t: t.append_column(
            "is_p",
            pc.cast(
                pc.equal(t["event_type"].combine_chunks(), "purchase"),
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scanned = with_global_scans(
        ds, ["event_id"], descending=[False],
        specs=[("rn", None), ("pp", "is_p")],
    )
    # rn/pp are 1 + strictly-earlier sums -> inclusive prefix needs +self
    def crossings(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "eid": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "llr": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        n = np.asarray(t["rn"].combine_chunks())  # inclusive row count
        isp = np.asarray(t["is_p"].combine_chunks())
        np_incl = np.asarray(t["pp"].combine_chunks()) - 1 + isp
        llr = np_incl * c1 + (n - np_incl) * c0
        out = (llr >= hi) | (llr <= lo)
        if not out.any():
            return empty
        i = int(np.flatnonzero(out)[0])  # first crossing in this block
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                "eid": pa.array([int(eid[i])], pa.int64()),
                "n": pa.array([int(n[i])], pa.int64()),
                "llr": pa.array([float(llr[i])], pa.float64()),
            }
        )

    cand = scanned.map_batches(
        crossings, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()  # O(#blocks): one candidate per block at most
    total = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id"]
    ).count()
    if len(cand) == 0:
        decision, n_at, llr_v = "continue", total, None
    else:
        first = cand.sort_values("eid", ignore_index=True).iloc[0]
        llr_v = float(round6(np.array([first["llr"]]))[0])
        decision = "accept_h1" if first["llr"] >= hi else "accept_h0"
        n_at = int(first["n"])
    return pa.table(
        {
            "decision": pa.array([decision], pa.string()),
            "n_at_decision": pa.array([n_at], pa.int64()),
            "llr": pa.array([llr_v], pa.float64()),
        }
    )


EVENTS_SPRT_SQL = f"""
WITH s AS (
    SELECT event_id,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                OVER w AS BIGINT) AS np,
           CAST(count(*) OVER w AS BIGINT) AS n
    FROM events
    WINDOW w AS (ORDER BY event_id ROWS UNBOUNDED PRECEDING)
),
l AS (
    SELECT event_id, n,
           np * ln({SPRT_P1} / {SPRT_P0})
             + (n - np) * ln((1.0 - {SPRT_P1}) / (1.0 - {SPRT_P0})) AS llr
    FROM s
),
x AS (
    SELECT * FROM l
    WHERE llr >= ln((1.0 - {SPRT_BETA}) / {SPRT_ALPHA})
       OR llr <= ln({SPRT_BETA} / (1.0 - {SPRT_ALPHA}))
    ORDER BY event_id LIMIT 1
)
SELECT
    coalesce(
        (SELECT CASE WHEN llr >= ln((1.0 - {SPRT_BETA}) / {SPRT_ALPHA})
                     THEN 'accept_h1' ELSE 'accept_h0' END FROM x),
        'continue') AS decision,
    coalesce((SELECT n FROM x),
             (SELECT CAST(count(*) AS BIGINT) FROM events))
        AS n_at_decision,
    (SELECT ROUND(llr, 6) FROM x) AS llr
"""


REGISTRY: dict[str, tuple] = {
    "suppliers_late_blame": (q_suppliers_late_blame, SUPPLIERS_LATE_BLAME_SQL),
    "events_sprt": (q_events_sprt, EVENTS_SPRT_SQL),
}

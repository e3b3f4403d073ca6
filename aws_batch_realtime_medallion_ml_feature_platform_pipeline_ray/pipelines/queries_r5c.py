"""Round-5 operator additions, batch 3 (oracle-exact, DuckDB twins).

- ``conv_tool_response_latency`` — per tool: calls, mean and max time to
  the IMMEDIATE next turn (tool-roundtrip latency from transcripts).
- ``conv_mask_budget``       — per conversation: total vs trainable
  (loss-mask role) token budget — the SFT packing planner's input.
- ``customers_rfm_quintiles`` — per-customer recency/frequency/monetary
  over orders with an exact GLOBAL monetary quintile via the
  distributed rank stage (no ntile approximation, no driver collect).
- ``lineitem_discount_elasticity`` — revenue/quantity by discount
  percent (pure streaming partials, 11-row fold).
- ``suppliers_ship_delay_median`` — per supplier: exact median ship
  delay in days (orderkey cogroup → suppkey exchange → quantile_disc
  semantics).
- ``events_session_depth_hist`` — session-length histogram under the
  30-minute-gap sessionization (same session definition as
  events_bounce_rate).

Reference provenance: extends spark_jobs/silver_and_gold.py:86-131
aggregates and build_datasets.py label derivation toward feature-store
breadth per the north rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6, round_half_away
from ..sources.reads import read_parquet_sized
from ..sources.transcripts import (
    TRANSCRIPTS_SQL_CTE,
    read_events_as_transcripts,
)
from ..stages.keyed import (
    cogroup_by_key,
    fold_by_keys,
    map_partitions_by_key,
)

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

_US = 1_000_000
_US_PER_DAY = 86_400 * _US


# ---------------------------------------------------------------------------
# conv_tool_response_latency — tool roundtrip time
# ---------------------------------------------------------------------------

def q_conv_tool_response_latency(sf_dir: str):
    """Per tool: number of calls that have a following turn, mean and
    max latency to that IMMEDIATE next turn ((ts, event_id) order). ONE
    conv-keyed exchange (successor lookup needs conversation order);
    per-tool (sum, max, n) partials fold through a tiny
    fixed-cardinality aggregate."""
    from ray.data.aggregate import Max, Sum

    from .queries import _conv_order

    ds = read_events_as_transcripts(sf_dir)

    def part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"tool": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "sum_us": pa.array([], pa.int64()),
             "max_us": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return empty
        import pandas as pd

        order, k, ts, _seg = _conv_order(tbl)
        tool = np.asarray(
            tbl["tool"].combine_chunks().take(pa.array(order)), dtype=object
        )
        n = len(k)
        has_next = np.zeros(n, dtype=bool)
        gap = np.zeros(n, dtype=np.int64)
        if n > 1:
            has_next[:-1] = k[1:] == k[:-1]
            gap[:-1] = ts[1:] - ts[:-1]
        keep = has_next & (tool != None)  # noqa: E711 — object-array null test
        if not keep.any():
            return empty
        inv, uniq = pd.factorize(tool[keep])
        s = np.zeros(len(uniq), np.int64)
        mx = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, gap[keep])
        np.maximum.at(mx, inv, gap[keep])
        return pa.table(
            {
                "tool": pa.array(uniq.astype(str), pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "sum_us": pa.array(s, pa.int64()),
                "max_us": pa.array(mx, pa.int64()),
            }
        )

    partials = map_partitions_by_key(ds, "conv_id", part,
                                     num_parts=NUM_PARTS)
    folded = partials.groupby("tool").aggregate(
        Sum("n", alias_name="n_calls"),
        Sum("sum_us", alias_name="s"),
        Max("max_us", alias_name="m"),
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "tool": t["tool"],
                "n_calls": t["n_calls"].combine_chunks().cast(pa.int64()),
                "avg_latency_s": pa.array(
                    round6(
                        np.asarray(t["s"].combine_chunks(), dtype=np.float64)
                        / np.asarray(t["n_calls"].combine_chunks(),
                                     dtype=np.float64)
                        / 1_000_000.0
                    ),
                    pa.float64(),
                ),
                "max_latency_s": pa.array(
                    np.asarray(t["m"].combine_chunks()) // _US, pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


CONV_TOOL_LATENCY_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
w AS (
    SELECT tool,
           epoch_us(lead(ts) OVER (PARTITION BY conv_id
                                   ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
    FROM transcripts
)
SELECT tool,
       COUNT(*)::BIGINT AS n_calls,
       ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
           AS avg_latency_s,
       CAST(MAX(gap_us) // 1000000 AS BIGINT) AS max_latency_s
FROM w WHERE gap_us IS NOT NULL AND tool IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# conv_mask_budget — trainable-token budget per conversation
# ---------------------------------------------------------------------------

def q_conv_mask_budget(sf_dir: str):
    """Per conversation: total whitespace tokens, trainable tokens
    (turns whose role is in the loss-mask set — queries_r4a.LOSS_ROLES)
    and the trainable ratio — what an SFT packing planner budgets
    against. ONE keyed exchange; token counts are exact
    (#spaces + 1, the split-on-space twin convention)."""
    from .queries import _conv_order
    from .queries_r4a import LOSS_ROLES

    ds = read_events_as_transcripts(sf_dir)

    def part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"conv_id": pa.array([], pa.string()),
             "n_tokens": pa.array([], pa.int64()),
             "n_trainable": pa.array([], pa.int64()),
             "trainable_ratio": pa.array([], pa.float64())}
        )
        if tbl.num_rows == 0:
            return empty
        import pandas as pd

        order, k, _ts, _seg = _conv_order(tbl)
        conv = np.asarray(
            tbl["conv_id"].combine_chunks().take(pa.array(order)),
            dtype=object,
        )
        toks = (
            np.asarray(
                pc.count_substring(
                    tbl["text"].combine_chunks(), pattern=" "
                ).cast(pa.int64()).take(pa.array(order))
            )
            + 1
        )
        role = np.asarray(
            tbl["role"].combine_chunks().take(pa.array(order)), dtype=object
        )
        trainable = np.isin(role.astype(str), np.array(LOSS_ROLES))
        inv, _u = pd.factorize(k)
        m = int(inv.max()) + 1 if len(inv) else 0
        tot = np.zeros(m, np.int64)
        tr = np.zeros(m, np.int64)
        np.add.at(tot, inv, toks)
        np.add.at(tr, inv, np.where(trainable, toks, 0))
        first = np.zeros(m, np.int64)
        first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        return pa.table(
            {
                "conv_id": pa.array(conv[first], pa.string()),
                "n_tokens": pa.array(tot, pa.int64()),
                "n_trainable": pa.array(tr, pa.int64()),
                "trainable_ratio": pa.array(
                    round6(tr.astype(np.float64) / tot.astype(np.float64)),
                    pa.float64(),
                ),
            }
        )

    return map_partitions_by_key(ds, "conv_id", part, num_parts=NUM_PARTS)


def _mask_budget_sql() -> str:
    from .queries_r4a import LOSS_ROLES

    roles = ", ".join(f"'{r}'" for r in LOSS_ROLES)
    return f"""
WITH {TRANSCRIPTS_SQL_CTE},
t AS (
    SELECT conv_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
           CAST(CASE WHEN role IN ({roles})
                THEN len(string_split(text, ' ')) ELSE 0 END AS BIGINT)
               AS tr
    FROM transcripts
)
SELECT conv_id,
       SUM(toks)::BIGINT AS n_tokens,
       SUM(tr)::BIGINT AS n_trainable,
       ROUND(CAST(SUM(tr) AS DOUBLE) / CAST(SUM(toks) AS DOUBLE), 6)
           AS trainable_ratio
FROM t GROUP BY 1
"""


# ---------------------------------------------------------------------------
# customers_rfm_quintiles — RFM with exact global quintile
# ---------------------------------------------------------------------------

RFM_CUTOFF = "2001-09-01"


def q_customers_rfm_quintiles(sf_dir: str):
    """Per customer (with ≥1 order): recency (days from last order to
    {RFM_CUTOFF}), frequency (orders), monetary (cent-exact total),
    plus an exact GLOBAL monetary quintile — bucket =
    (rank−1)·5 // n over the (monetary, custkey) total order, computed
    by the distributed rank stage (range-partitioned sort + O(#blocks)
    offset scan), never a driver-side rank."""
    import pandas as pd

    from ..stages.globalorder import with_global_rank

    cut = int(pd.Timestamp(RFM_CUTOFF).value // 1000)

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(
        lambda t: pa.table(
            {
                "custkey": t["o_custkey"].cast(pa.int64()),
                "odate": t["o_orderdate"].combine_chunks().cast(pa.int64()),
                "cents": pa.array(
                    round_half_away(
                        np.asarray(t["o_totalprice"].combine_chunks()) * 100.0
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    per_cust = fold_by_keys(
        orders, ["custkey"], sums=("cents", "one"), maxs=("odate",),
        num_parts=NUM_PARTS,
    ).materialize()
    n = per_cust.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"c_custkey": pa.array([], pa.int64()),
                 "recency_days": pa.array([], pa.int64()),
                 "frequency": pa.array([], pa.int64()),
                 "monetary": pa.array([], pa.float64()),
                 "m_quintile": pa.array([], pa.int64())}
            )
        )
    ranked = with_global_rank(
        per_cust, ["cents", "custkey"], descending=[False, False],
        rank_col="__r",
    )

    def finish(t: pa.Table) -> pa.Table:
        r = np.asarray(t["__r"].combine_chunks())
        return pa.table(
            {
                "c_custkey": t["custkey"].combine_chunks().cast(pa.int64()),
                "recency_days": pa.array(
                    (cut - np.asarray(t["odate"].combine_chunks()))
                    // _US_PER_DAY,
                    pa.int64(),
                ),
                "frequency": t["one"].combine_chunks().cast(pa.int64()),
                "monetary": pa.array(
                    np.asarray(t["cents"].combine_chunks()).astype(
                        np.float64
                    )
                    / 100.0,
                    pa.float64(),
                ),
                "m_quintile": pa.array((r - 1) * 5 // n, pa.int64()),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


CUSTOMERS_RFM_SQL = f"""
WITH g AS (
    SELECT o_custkey AS c_custkey,
           MAX(o_orderdate) AS last_o,
           COUNT(*)::BIGINT AS frequency,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
),
r AS (
    SELECT *,
           row_number() OVER (ORDER BY cents, c_custkey) AS rnk,
           COUNT(*) OVER () AS n
    FROM g
)
SELECT c_custkey,
       CAST((epoch_us(TIMESTAMP '{RFM_CUTOFF}') - epoch_us(last_o))
            // 86400000000 AS BIGINT) AS recency_days,
       frequency,
       CAST(cents AS DOUBLE) / 100.0 AS monetary,
       CAST((rnk - 1) * 5 // n AS BIGINT) AS m_quintile
FROM r
"""


# ---------------------------------------------------------------------------
# lineitem_discount_elasticity — revenue/qty by discount percent
# ---------------------------------------------------------------------------

def q_lineitem_discount_elasticity(sf_dir: str):
    """Items, quantity and cent-exact revenue per discount percent —
    the discount-elasticity table. Pure streaming partials, ≤11-row
    fold."""
    from ray.data.aggregate import Sum

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        d = round_half_away(
            np.asarray(t["l_discount"].combine_chunks()) * 100.0
        ).astype(np.int64)
        q = np.asarray(t["l_quantity"].combine_chunks())
        p = round_half_away(
            np.asarray(t["l_extendedprice"].combine_chunks()) * 100.0
        ).astype(np.int64)
        rev = p * (100 - d)
        inv, uniq = pd.factorize(d)
        nq = np.zeros(len(uniq), np.float64)
        nr = np.zeros(len(uniq), np.int64)
        np.add.at(nq, inv, q)
        np.add.at(nr, inv, rev)
        return pa.table(
            {
                "discount_pct": pa.array(uniq, pa.int64()),
                "ni": pa.array(np.bincount(inv).astype(np.int64),
                               pa.int64()),
                "sq": pa.array(nq, pa.float64()),
                "sr": pa.array(nr, pa.int64()),
            }
        )

    folded = li.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("discount_pct").aggregate(
        Sum("ni", alias_name="n_items"),
        Sum("sq", alias_name="sum_qty"),
        Sum("sr", alias_name="r"),
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "discount_pct": t["discount_pct"].combine_chunks().cast(
                    pa.int64()
                ),
                "n_items": t["n_items"].combine_chunks().cast(pa.int64()),
                "sum_qty": t["sum_qty"].combine_chunks().cast(pa.float64()),
                "revenue": pa.array(
                    np.asarray(t["r"].combine_chunks()).astype(np.float64)
                    / 10000.0,
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


LINEITEM_ELASTICITY_SQL = """
SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS discount_pct,
       COUNT(*)::BIGINT AS n_items,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# suppliers_ship_delay_median — per-supplier exact median delay
# ---------------------------------------------------------------------------

def q_suppliers_ship_delay_median(sf_dir: str):
    """Per supplier: exact median (quantile_disc semantics) of the ship
    delay in whole days (l_shipdate − o_orderdate). One orderkey
    cogroup attaches the order date, one suppkey exchange computes the
    per-supplier sorted median — the high-cardinality-group quantile
    pattern (supplier count scales with data, so this is the keyed
    exchange, not a fixed-domain fold)."""
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["l_orderkey"].cast(pa.int64()),
                "suppkey": t["l_suppkey"].cast(pa.int64()),
                "sdate": t["l_shipdate"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["o_orderkey"].cast(pa.int64()),
                "odate": t["o_orderdate"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def attach(lpart: pa.Table, opart: pa.Table) -> pa.Table:
        empty = pa.table(
            {"suppkey": pa.array([], pa.int64()),
             "delay": pa.array([], pa.int64())}
        )
        if lpart.num_rows == 0 or opart.num_rows == 0:
            return empty
        idx = pc.index_in(
            lpart["orderkey"], value_set=opart["orderkey"].combine_chunks()
        ).combine_chunks()
        keep = pc.is_valid(idx)
        if not pc.any(keep).as_py():
            return empty
        kept = lpart.filter(keep)
        od = np.asarray(
            opart["odate"].combine_chunks().take(idx.filter(keep))
        )
        delay = (np.asarray(kept["sdate"].combine_chunks()) - od) \
            // _US_PER_DAY
        return pa.table(
            {
                "suppkey": kept["suppkey"],
                "delay": pa.array(delay, pa.int64()),
            }
        )

    delays = cogroup_by_key(li, orders, "orderkey", attach,
                            num_parts=NUM_PARTS)

    def med(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "n_items": pa.array([], pa.int64()),
             "median_delay_days": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        sk = np.asarray(part["suppkey"].combine_chunks())
        dl = np.asarray(part["delay"].combine_chunks())
        order = np.lexsort((dl, sk))
        sk, dl = sk[order], dl[order]
        seg_start = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(seg_start)
        ends = np.concatenate((starts[1:], [len(sk)]))
        n = ends - starts
        med_idx = starts + (-((-n) // 2) - 1)  # ceil(n/2) - 1
        return pa.table(
            {
                "s_suppkey": pa.array(sk[starts], pa.int64()),
                "n_items": pa.array(n.astype(np.int64), pa.int64()),
                "median_delay_days": pa.array(dl[med_idx], pa.int64()),
            }
        )

    return map_partitions_by_key(delays, "suppkey", med,
                                 num_parts=NUM_PARTS)


SUPPLIERS_DELAY_SQL = """
WITH d AS (
    SELECT l.l_suppkey AS s_suppkey,
           (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
               // 86400000000 AS delay
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT s_suppkey, COUNT(*)::BIGINT AS n_items,
       CAST(quantile_disc(delay, 0.5) AS BIGINT) AS median_delay_days
FROM d GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_session_depth_hist — session-length histogram
# ---------------------------------------------------------------------------

def q_events_session_depth_hist(sf_dir: str):
    """Histogram of session lengths under the 30-minute-gap
    sessionization (the distribution behind events_bounce_rate's
    single-event share). ONE user-keyed exchange; per-depth partials
    fold through a tiny aggregate."""
    from ray.data.aggregate import Sum

    from .queries_r5a import BOUNCE_GAP_MIN, _ev

    gap_us = BOUNCE_GAP_MIN * 60 * _US
    ds = _ev(sf_dir, columns=["user_id", "ts", "event_id"])

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"depth": pa.array([], pa.int64()),
             "c": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        import pandas as pd

        from ..functions.robust import gap_session_ids

        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        _order, uid, ts, sid = gap_session_ids(uid, ts, eid, gap_us)
        depth = np.bincount(sid)
        inv, uniq = pd.factorize(depth)
        return pa.table(
            {
                "depth": pa.array(uniq.astype(np.int64), pa.int64()),
                "c": pa.array(np.bincount(inv).astype(np.int64),
                              pa.int64()),
            }
        )

    partials = map_partitions_by_key(ds, "user_id", part,
                                     num_parts=NUM_PARTS)
    return partials.groupby("depth").aggregate(
        Sum("c", alias_name="n_sessions")
    )


EVENTS_SESSION_DEPTH_SQL = f"""
WITH o AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - epoch_us(
                    lag(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
                ) > {30 * 60 * _US}
                OR lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_sess
    FROM events
),
s AS (
    SELECT user_id,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM o
),
g AS (SELECT user_id, sid, COUNT(*) AS depth FROM s GROUP BY 1, 2)
SELECT CAST(depth AS BIGINT) AS depth, COUNT(*)::BIGINT AS n_sessions
FROM g GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "conv_tool_response_latency": (
        q_conv_tool_response_latency,
        CONV_TOOL_LATENCY_SQL,
    ),
    "conv_mask_budget": (q_conv_mask_budget, _mask_budget_sql()),
    "customers_rfm_quintiles": (q_customers_rfm_quintiles,
                                CUSTOMERS_RFM_SQL),
    "lineitem_discount_elasticity": (
        q_lineitem_discount_elasticity,
        LINEITEM_ELASTICITY_SQL,
    ),
    "suppliers_ship_delay_median": (
        q_suppliers_ship_delay_median,
        SUPPLIERS_DELAY_SQL,
    ),
    "events_session_depth_hist": (
        q_events_session_depth_hist,
        EVENTS_SESSION_DEPTH_SQL,
    ),
}

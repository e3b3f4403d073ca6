"""Round-2n operators: growth curves, discriminative-feature scoring,
and repeat-purchase behavior.

- ``events_user_growth``: cumulative distinct users by day (the
  user-acquisition curve) — per-user FIRST day via the exact keyed
  fold, per-day new-user counts, running total over the
  calendar-bounded series.
- ``embedding_fisher_ratio``: per-dimension one-way ANOVA F across
  class labels (between-class over within-class variance) — the
  filter-method feature-selection score that ranks embedding
  dimensions by label discriminativeness; generalizes
  ``events_anova_f`` to 64 dims × 10 classes in one vectorized pass
  over per-(label, dim) moment partials.
- ``orders_repeat_rate``: repeat-customer share and mean gap between
  consecutive orders — the repeat-purchase behavior summary behind
  retention forecasting. ONE customer-keyed exchange; gaps are a
  per-partition sorted diff.

Exactness: counts and day/µs gaps are int64; F/means mirror the
``events_anova_f``/``events_welch_t`` double-expression contract with
ROUND(,6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6
from ..sources.reads import read_parquet_sized
from ..stages.keyed import fold_by_keys, map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# events_user_growth — cumulative distinct users by day
# ---------------------------------------------------------------------------


def q_events_user_growth(sf_dir: str):
    """Per day: new users (first ever seen that day) and the cumulative
    distinct-user count. Per-user first day via the exact keyed fold
    (one exchange), the per-day rollup is O(days), and the running
    total runs over the calendar-bounded series."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def first_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("user_id", "d0")}
            )
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        d = np.asarray(t["ts"].combine_chunks().cast(pa.int64())) \
            // 86_400_000_000
        order = np.argsort(uid, kind="stable")
        u, dd = uid[order], d[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "d0": pa.array(np.minimum.reduceat(dd, starts)),
            }
        )

    firsts = fold_by_keys(
        ds.map_batches(first_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"],
        mins=("d0",),
        num_parts=NUM_PARTS,
    )

    def day_partial(t: pa.Table) -> pa.Table:
        d = np.asarray(t["d0"].combine_chunks())
        dd, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"d": pa.array(dd), "pn": pa.array(cnt.astype(np.int64))}
        )

    per_day = (
        firsts.map_batches(day_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("d")
        .aggregate(Sum("pn", alias_name="new_users"))
    )

    def finale(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t["d"])
        d = np.asarray(t["d"].combine_chunks().take(order))
        n = np.asarray(t["new_users"].combine_chunks().take(order),
                       dtype=np.int64)
        return pa.table(
            {
                "d": pa.array(d, pa.int64()),
                "new_users": pa.array(n),
                "cum_users": pa.array(np.cumsum(n)),
            }
        )

    return per_day.repartition(1).map_batches(finale,
                                              batch_format="pyarrow")


EVENTS_USER_GROWTH_SQL = """
WITH f AS (
    SELECT user_id,
           min(CAST(epoch_us(ts) AS BIGINT) // 86400000000) AS d0
    FROM events GROUP BY 1
),
c AS (SELECT d0 AS d, count(*)::BIGINT AS new_users FROM f GROUP BY 1)
SELECT d, new_users,
       CAST(sum(new_users) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_users
FROM c
"""


# ---------------------------------------------------------------------------
# embedding_fisher_ratio — per-dimension class-discriminativeness
# ---------------------------------------------------------------------------


def q_embedding_fisher_ratio(sf_dir: str):
    """Per dimension: one-way ANOVA F of the component value across
    class labels. Per-batch (label, dim) moment partials (n, Σ, Σ²) —
    O(classes × dims) rows per block, the vector stream never shuffles
    — one tiny groupby fold, then the F formula per dim mirrored
    operand-for-operand. ROUND(,6) absorbs the float fold (same
    contract as ``embedding_covariance``)."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"label": pa.array([], pa.int64()),
             "dim": pa.array([], pa.int64()),
             "pn": pa.array([], pa.int64()),
             "ps": pa.array([], pa.float64()),
             "pq": pa.array([], pa.float64())}
        )
        if t.num_rows == 0:
            return empty
        emb = t["embedding"].combine_chunks()
        offs = np.asarray(emb.offsets)
        dims = np.diff(offs)
        if len(dims) == 0 or dims.max() == 0:
            return empty
        d = int(dims[0])
        mat = np.asarray(emb.values, dtype=np.float64).reshape(-1, d)
        lab = np.asarray(t["label"].combine_chunks().cast(pa.int64()))
        uniq, inv = np.unique(lab, return_inverse=True)
        k = len(uniq)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        s = np.zeros((k, d))
        q = np.zeros((k, d))
        np.add.at(s, inv, mat)
        np.add.at(q, inv, mat * mat)
        lab_col = np.repeat(uniq, d)
        dim_col = np.tile(np.arange(1, d + 1, dtype=np.int64), k)
        return pa.table(
            {
                "label": pa.array(lab_col),
                "dim": pa.array(dim_col),
                "pn": pa.array(np.repeat(n, d)),
                "ps": pa.array(s.ravel(), pa.float64()),
                "pq": pa.array(q.ravel(), pa.float64()),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "dim"])
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("ps", alias_name="s"),
            Sum("pq", alias_name="q"),
        )
    )

    def finale(t: pa.Table) -> pa.Table:
        lab = np.asarray(t["label"].combine_chunks())
        dim = np.asarray(t["dim"].combine_chunks())
        n = np.asarray(t["n"].combine_chunks(), dtype=np.float64)
        s = np.asarray(t["s"].combine_chunks())
        q = np.asarray(t["q"].combine_chunks())
        order = np.lexsort((lab, dim))
        lab, dim, n, s, q = (a[order] for a in (lab, dim, n, s, q))
        starts = np.flatnonzero(
            np.concatenate(([True], dim[1:] != dim[:-1]))
        )
        k = np.diff(np.append(starts, len(dim))).astype(np.float64)
        big_n = np.add.reduceat(n, starts)
        big_s = np.add.reduceat(s, starts)
        grand = big_s / big_n
        grand_rep = np.repeat(grand, np.diff(np.append(starts, len(dim)))
                              .astype(np.int64))
        ssb = np.add.reduceat(n * (s / n - grand_rep) ** 2, starts)
        ssw = np.add.reduceat(q - s * (s / n), starts)
        f = np.where(
            (k >= 2) & (big_n > k) & (ssw > 0.0),
            (ssb / (k - 1.0)) / (ssw / (big_n - k)),
            np.nan,
        )
        out_f = [None if not np.isfinite(x) else float(r)
                 for x, r in zip(f, round6(np.nan_to_num(f)))]
        return pa.table(
            {
                "dim": pa.array(dim[starts], pa.int64()),
                "n_classes": pa.array(k.astype(np.int64)),
                "f_stat": pa.array(out_f, pa.float64()),
            }
        )

    return folded.repartition(1).map_batches(finale, batch_format="pyarrow")


EMBEDDING_FISHER_SQL = """
WITH e AS (
    SELECT CAST(label AS BIGINT) AS label,
           CAST(unnest(embedding) AS DOUBLE) AS v,
           generate_subscripts(embedding, 1) AS dim
    FROM embeddings
),
g AS (
    SELECT label, dim,
           CAST(count(*) AS BIGINT) AS n, sum(v) AS s, sum(v * v) AS q
    FROM e GROUP BY 1, 2
),
tot AS (
    SELECT dim, CAST(count(*) AS BIGINT) AS k,
           CAST(sum(n) AS BIGINT) AS big_n,
           sum(s) AS big_s
    FROM g GROUP BY 1
),
parts AS (
    SELECT g.dim, t.k, t.big_n,
           sum(g.n * (g.s / g.n - t.big_s / t.big_n)
                   * (g.s / g.n - t.big_s / t.big_n)) AS ssb,
           sum(g.q - g.s * (g.s / g.n)) AS ssw
    FROM g JOIN tot t USING (dim) GROUP BY 1, 2, 3
)
SELECT CAST(dim AS BIGINT) AS dim, k AS n_classes,
       CASE WHEN k >= 2 AND big_n > k AND ssw > 0.0
            THEN ROUND((ssb / CAST(k - 1 AS DOUBLE))
                       / (ssw / CAST(big_n - k AS DOUBLE)), 6)
            ELSE NULL END AS f_stat
FROM parts
"""


# ---------------------------------------------------------------------------
# orders_repeat_rate — repeat-purchase behavior summary
# ---------------------------------------------------------------------------


def q_orders_repeat_rate(sf_dir: str):
    """Customer repeat-purchase summary: total/repeat customer counts,
    repeat rate, and the mean gap in days between CONSECUTIVE orders of
    the same customer. ONE customer-keyed exchange; gaps are a sorted
    per-partition diff with exact integer day sums."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate",
                                             "o_orderkey"]
    )

    def per_cust(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"p_cust": pa.array([], pa.int64()),
             "p_repeat": pa.array([], pa.int64()),
             "p_gaps": pa.array([], pa.int64()),
             "p_gap_days": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        ck = np.asarray(part["o_custkey"].combine_chunks().cast(pa.int64()))
        d = np.asarray(part["o_orderdate"].combine_chunks()
                       .cast(pa.int64())) // 86_400_000_000
        ok = np.asarray(part["o_orderkey"].combine_chunks())
        order = np.lexsort((ok, d, ck))
        c, dd = ck[order], d[order]
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        n = np.diff(np.append(starts, len(c)))
        same = np.concatenate(([False], c[1:] == c[:-1]))
        gaps = np.where(same, dd - np.concatenate(([0], dd[:-1])), 0)
        return pa.table(
            {
                "p_cust": pa.array([len(starts)], pa.int64()),
                "p_repeat": pa.array([int((n >= 2).sum())], pa.int64()),
                "p_gaps": pa.array([int(same.sum())], pa.int64()),
                "p_gap_days": pa.array(
                    [int(gaps[same].sum())], pa.int64()
                ),
            }
        )

    agg = map_partitions_by_key(
        ds, "o_custkey", per_cust, num_parts=NUM_PARTS
    ).aggregate(
        Sum("p_cust", alias_name="c"),
        Sum("p_repeat", alias_name="r"),
        Sum("p_gaps", alias_name="g"),
        Sum("p_gap_days", alias_name="gd"),
    )
    n_cust = int(agg["c"] or 0)
    n_rep = int(agg["r"] or 0)
    n_gaps = int(agg["g"] or 0)
    gap_days = int(agg["gd"] or 0)
    rate = float(round6(np.array([n_rep / n_cust]))[0]) if n_cust else None
    mean_gap = (
        float(round6(np.array([gap_days / n_gaps]))[0]) if n_gaps else None
    )
    return pa.table(
        {
            "n_customers": pa.array([n_cust], pa.int64()),
            "n_repeat": pa.array([n_rep], pa.int64()),
            "repeat_rate": pa.array([rate], pa.float64()),
            "n_gaps": pa.array([n_gaps], pa.int64()),
            "mean_gap_days": pa.array([mean_gap], pa.float64()),
        }
    )


ORDERS_REPEAT_RATE_SQL = """
WITH o AS (
    SELECT o_custkey,
           CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS d,
           lag(CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000)
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS prev_d
    FROM orders
),
pc AS (
    SELECT o_custkey, count(*)::BIGINT AS n,
           CAST(coalesce(sum(d - prev_d), 0) AS BIGINT) AS gap_days,
           CAST(count(prev_d) AS BIGINT) AS n_gaps
    FROM o GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(*) FILTER (n >= 2) AS BIGINT) AS n_repeat,
       ROUND(count(*) FILTER (n >= 2) / CAST(count(*) AS DOUBLE), 6)
           AS repeat_rate,
       CAST(sum(n_gaps) AS BIGINT) AS n_gaps,
       ROUND(sum(gap_days) / CAST(sum(n_gaps) AS DOUBLE), 6)
           AS mean_gap_days
FROM pc
"""


REGISTRY = {
    "events_user_growth": (q_events_user_growth, EVENTS_USER_GROWTH_SQL),
    "embedding_fisher_ratio": (
        q_embedding_fisher_ratio,
        EMBEDDING_FISHER_SQL,
    ),
    "orders_repeat_rate": (q_orders_repeat_rate, ORDERS_REPEAT_RATE_SQL),
}

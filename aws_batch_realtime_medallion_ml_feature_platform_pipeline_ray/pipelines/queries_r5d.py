"""Round-5 operator additions, batch 4 (oracle-exact, DuckDB twins).

- ``embedding_norm_outliers``  — per-label MAD outliers of the exact
  fixed-point SQUARED norm (all-int compares; the squared norm is
  monotone in the norm, so the flag set is scale-meaningful without a
  float sqrt).
- ``train_label_weights``      — inverse-frequency class-balance
  weights over the embedding labels (streaming partials, 10-row fold).
- ``conv_error_bursts``        — per conversation: longest run of
  consecutive error turns and the number of bursts (≥2-run), the
  degenerate-agent signal next to conv_repeat_loops.
- ``conv_first_error``         — per conversation: turn index and
  elapsed seconds of the FIRST error turn (−1 when none) — a triage /
  time-to-failure feature.
- ``customers_order_gap_median`` — per customer (≥2 orders): exact
  median days between consecutive orders (quantile_disc semantics) —
  the high-cardinality-group quantile pattern on a segmented diff.

Reference provenance: extends spark_jobs/silver_and_gold.py:86-131
per-entity aggregates toward curation/triage features per the north
rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6
from ..sources.reads import read_parquet_sized
from ..sources.transcripts import (
    TRANSCRIPTS_SQL_CTE,
    read_events_as_transcripts,
)
from ..stages.keyed import map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

_US = 1_000_000
_US_PER_DAY = 86_400 * _US

NORM_SCALE = 1_000_000
NORM_MAD_K = 3


# ---------------------------------------------------------------------------
# embedding_norm_outliers — per-label MAD outliers of the squared norm
# ---------------------------------------------------------------------------

def q_embedding_norm_outliers(sf_dir: str):
    """Per label: flag vectors whose exact fixed-point SQUARED norm
    (Σ q², q = floor(v·1e6 + 0.5), int64 — no float accumulation)
    deviates from the label median by more than {NORM_MAD_K}·MAD, both
    with quantile_disc index semantics. ONE keyed exchange on the
    fixed label domain."""
    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )

    def norms(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "label": pa.array([], pa.int64()),
             "n2": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        vals = np.asarray(
            t["embedding"].combine_chunks().values.to_numpy(
                zero_copy_only=False
            ),
            dtype=np.float64,
        ).reshape(t.num_rows, -1)
        q = np.floor(vals * NORM_SCALE + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"].combine_chunks().cast(pa.int64()),
                "label": t["label"].combine_chunks().cast(pa.int64()),
                "n2": pa.array((q * q).sum(axis=1), pa.int64()),
            }
        )

    nd = emb.map_batches(norms, batch_format="pyarrow",
                         zero_copy_batch=True)

    def flags(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "label": pa.array([], pa.int64()),
             "is_norm_outlier": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        from ..functions.robust import mad_outlier_flags

        lab = np.asarray(part["label"].combine_chunks())
        n2 = np.asarray(part["n2"].combine_chunks())
        vid = np.asarray(part["vec_id"].combine_chunks())
        order, flag = mad_outlier_flags(lab, n2, NORM_MAD_K)
        return pa.table(
            {
                "vec_id": pa.array(vid[order], pa.int64()),
                "label": pa.array(lab[order], pa.int64()),
                "is_norm_outlier": pa.array(flag.astype(np.int64),
                                            pa.int64()),
            }
        )

    return map_partitions_by_key(nd, "label", flags, num_parts=NUM_PARTS)


EMBEDDING_NORM_OUTLIERS_SQL = f"""
WITH e AS (
    SELECT vec_id, label,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {NORM_SCALE}
                      + 0.5) AS BIGINT) AS q
    FROM embeddings
),
n AS (
    SELECT vec_id, CAST(MIN(label) AS BIGINT) AS label,
           SUM(q * q) AS n2
    FROM e GROUP BY vec_id
),
med AS (SELECT label, quantile_disc(n2, 0.5) AS med FROM n GROUP BY 1),
dev AS (
    SELECT n.vec_id, n.label, abs(n.n2 - med.med) AS dv
    FROM n JOIN med ON med.label = n.label
),
mad AS (SELECT label, quantile_disc(dv, 0.5) AS mad FROM dev GROUP BY 1)
SELECT dev.vec_id, dev.label,
       CAST(dev.dv > {NORM_MAD_K} * mad.mad AS BIGINT) AS is_norm_outlier
FROM dev JOIN mad ON mad.label = dev.label
"""


# ---------------------------------------------------------------------------
# train_label_weights — inverse-frequency class-balance weights
# ---------------------------------------------------------------------------

def q_train_label_weights(sf_dir: str):
    """Class-balanced loss weights over the embedding labels:
    w = N / (K · n_label) (inverse frequency, mean weight 1 across
    examples when classes are balanced). Streaming per-batch partials,
    one |labels|-row fold, one float division round6."""
    from ray.data.aggregate import Sum

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["label"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        lab = np.asarray(t["label"].combine_chunks().cast(pa.int64()))
        inv, uniq = pd.factorize(lab)
        return pa.table(
            {
                "label": pa.array(uniq, pa.int64()),
                "c": pa.array(np.bincount(inv).astype(np.int64),
                              pa.int64()),
            }
        )

    folded = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("label").aggregate(Sum("c", alias_name="n_label"))

    import ray

    tbls = [t for t in ray.get(folded.to_arrow_refs()) if t.num_rows]
    import ray.data as rd

    if not tbls:
        return rd.from_arrow(
            pa.table(
                {"label": pa.array([], pa.int64()),
                 "n_label": pa.array([], pa.int64()),
                 "weight": pa.array([], pa.float64())}
            )
        )
    allt = pa.concat_tables(tbls)  # ≤ |labels| rows
    lab = np.asarray(allt["label"].combine_chunks())
    c = np.asarray(allt["n_label"].combine_chunks()).astype(np.int64)
    order = np.argsort(lab)
    lab, c = lab[order], c[order]
    total = int(c.sum())
    k = len(lab)
    w = round6(float(total) / (k * c.astype(np.float64)))
    return rd.from_arrow(
        pa.table(
            {
                "label": pa.array(lab, pa.int64()),
                "n_label": pa.array(c, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )


TRAIN_LABEL_WEIGHTS_SQL = """
WITH g AS (
    SELECT CAST(label AS BIGINT) AS label, COUNT(*)::BIGINT AS n_label
    FROM embeddings GROUP BY 1
)
SELECT label, n_label,
       ROUND(CAST((SELECT SUM(n_label) FROM g) AS DOUBLE)
             / ((SELECT COUNT(*) FROM g) * CAST(n_label AS DOUBLE)), 6)
           AS weight
FROM g
"""


# ---------------------------------------------------------------------------
# conv_error_bursts — consecutive-error runs per conversation
# ---------------------------------------------------------------------------

def q_conv_error_bursts(sf_dir: str):
    """Per conversation: the longest run of consecutive error turns and
    the number of bursts (runs of length ≥ 2) — degenerate-agent
    triage next to conv_repeat_loops. ONE keyed exchange, segmented
    run-length pass."""
    from .queries import _conv_order

    ds = read_events_as_transcripts(sf_dir)

    def part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"conv_id": pa.array([], pa.string()),
             "max_error_run": pa.array([], pa.int64()),
             "n_bursts": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return empty
        import pandas as pd

        order, k, _ts, seg_start = _conv_order(tbl)
        conv = np.asarray(
            tbl["conv_id"].combine_chunks().take(pa.array(order)),
            dtype=object,
        )
        err = np.asarray(
            pc.equal(tbl["role"].combine_chunks(), "error")
        ).astype(bool)[order]
        n = len(k)
        # run id: new run at conv start, error-flag change
        run_start = seg_start.copy()
        run_start[1:] |= err[1:] != err[:-1]
        rid = np.cumsum(run_start) - 1
        run_len = np.bincount(rid)
        run_err = err[run_start]
        run_conv_inv, conv_uniq = pd.factorize(k[run_start])
        m = len(conv_uniq)
        mx = np.zeros(m, np.int64)
        nb = np.zeros(m, np.int64)
        el = np.where(run_err, run_len, 0)
        np.maximum.at(mx, run_conv_inv, el)
        np.add.at(nb, run_conv_inv, (run_err & (run_len >= 2)).astype(np.int64))
        first = np.zeros(m, np.int64)
        idx_of_run_rows = np.flatnonzero(run_start)
        first[run_conv_inv[::-1]] = idx_of_run_rows[::-1]
        return pa.table(
            {
                "conv_id": pa.array(conv[first], pa.string()),
                "max_error_run": pa.array(mx, pa.int64()),
                "n_bursts": pa.array(nb, pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "conv_id", part, num_parts=NUM_PARTS)


CONV_ERROR_BURSTS_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
f AS (
    SELECT conv_id, turn_idx,
           CASE WHEN role = 'error' THEN 1 ELSE 0 END AS is_err,
           CASE WHEN role = 'error' THEN 1 ELSE 0 END
           - COALESCE(lag(CASE WHEN role = 'error' THEN 1 ELSE 0 END)
                      OVER (PARTITION BY conv_id ORDER BY turn_idx), -1)
               AS chg
    FROM transcripts
),
r AS (
    SELECT conv_id, is_err,
           SUM(CASE WHEN chg <> 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS UNBOUNDED PRECEDING) AS rid
    FROM f
),
runs AS (
    SELECT conv_id, rid, MAX(is_err) AS is_err, COUNT(*) AS len
    FROM r GROUP BY 1, 2
)
SELECT conv_id,
       CAST(COALESCE(MAX(CASE WHEN is_err = 1 THEN len END), 0) AS BIGINT)
           AS max_error_run,
       CAST(SUM(CASE WHEN is_err = 1 AND len >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bursts
FROM runs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# conv_first_error — time-to-first-failure feature
# ---------------------------------------------------------------------------

def q_conv_first_error(sf_dir: str):
    """Per conversation: turn index and elapsed whole seconds (from the
    first turn) of the FIRST error turn; −1/−1 when the conversation
    has none. ONE keyed exchange, segmented argmin."""
    from .queries import _conv_order

    ds = read_events_as_transcripts(sf_dir)

    def part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"conv_id": pa.array([], pa.string()),
             "first_error_turn": pa.array([], pa.int64()),
             "first_error_elapsed_s": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return empty
        import pandas as pd

        order, k, ts, seg_start = _conv_order(tbl)
        conv = np.asarray(
            tbl["conv_id"].combine_chunks().take(pa.array(order)),
            dtype=object,
        )
        err = np.asarray(
            pc.equal(tbl["role"].combine_chunks(), "error")
        ).astype(bool)[order]
        arange = np.arange(len(k), dtype=np.int64)
        seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
        tidx = arange - seg_first
        inv, uniq = pd.factorize(k)
        m = len(uniq)
        big = np.iinfo(np.int64).max
        ft = np.full(m, big, np.int64)
        np.minimum.at(ft, inv[err], tidx[err])
        first_row = np.zeros(m, np.int64)
        first_row[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        start_ts = ts[first_row]
        # ts of the first error turn = ts at (segment first + ft)
        has = ft < big
        err_row = first_row + np.where(has, ft, 0)
        elapsed = np.where(
            has, (ts[np.minimum(err_row, len(ts) - 1)] - start_ts) // _US,
            -1,
        )
        return pa.table(
            {
                "conv_id": pa.array(conv[first_row], pa.string()),
                "first_error_turn": pa.array(
                    np.where(has, ft, -1), pa.int64()
                ),
                "first_error_elapsed_s": pa.array(elapsed, pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "conv_id", part, num_parts=NUM_PARTS)


CONV_FIRST_ERROR_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
g AS (
    SELECT conv_id,
           MIN(CASE WHEN role = 'error' THEN turn_idx END) AS fe,
           MIN(ts) AS t0,
           MIN(CASE WHEN role = 'error' THEN ts END) AS te
    FROM transcripts GROUP BY 1
)
SELECT conv_id,
       CAST(COALESCE(fe, -1) AS BIGINT) AS first_error_turn,
       CAST(COALESCE((epoch_us(te) - epoch_us(t0)) // 1000000, -1)
            AS BIGINT) AS first_error_elapsed_s
FROM g
"""


# ---------------------------------------------------------------------------
# customers_order_gap_median — repeat-purchase cadence
# ---------------------------------------------------------------------------

def q_customers_order_gap_median(sf_dir: str):
    """Per customer with ≥2 orders: exact median days between
    consecutive orders ((o_orderdate, o_orderkey) order, quantile_disc
    semantics). ONE keyed exchange + segmented diff + per-group sorted
    median."""
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    ).map_batches(
        lambda t: pa.table(
            {
                "custkey": t["o_custkey"].cast(pa.int64()),
                "odate": t["o_orderdate"].combine_chunks().cast(pa.int64()),
                "okey": t["o_orderkey"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "n_orders": pa.array([], pa.int64()),
             "median_gap_days": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ck = np.asarray(t["custkey"].combine_chunks())
        od = np.asarray(t["odate"].combine_chunks())
        ok = np.asarray(t["okey"].combine_chunks())
        order = np.lexsort((ok, od, ck))
        ck, od = ck[order], od[order]
        n = len(ck)
        same = np.zeros(n, dtype=bool)
        same[1:] = ck[1:] == ck[:-1]
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = (od[1:] - od[:-1]) // _US_PER_DAY
        # gap rows (one per consecutive pair within a customer)
        gk = ck[same]
        gv = gap[same]
        if len(gk) == 0:
            return empty
        order2 = np.lexsort((gv, gk))
        gk, gv = gk[order2], gv[order2]
        seg_start = np.concatenate(([True], gk[1:] != gk[:-1]))
        starts = np.flatnonzero(seg_start)
        ends = np.concatenate((starts[1:], [len(gk)]))
        cnt = ends - starts
        med_idx = starts + (-((-cnt) // 2) - 1)
        return pa.table(
            {
                "c_custkey": pa.array(gk[starts], pa.int64()),
                "n_orders": pa.array(cnt.astype(np.int64) + 1, pa.int64()),
                "median_gap_days": pa.array(gv[med_idx], pa.int64()),
            }
        )

    return map_partitions_by_key(orders, "custkey", part,
                                 num_parts=NUM_PARTS)


CUSTOMERS_ORDER_GAP_SQL = """
WITH g AS (
    SELECT o_custkey AS c_custkey,
           (epoch_us(o_orderdate)
            - epoch_us(lag(o_orderdate)
                       OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey)))
               // 86400000000 AS gap
    FROM orders
)
SELECT c_custkey,
       COUNT(gap)::BIGINT + 1 AS n_orders,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS median_gap_days
FROM g WHERE gap IS NOT NULL
GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "embedding_norm_outliers": (q_embedding_norm_outliers,
                                EMBEDDING_NORM_OUTLIERS_SQL),
    "train_label_weights": (q_train_label_weights,
                            TRAIN_LABEL_WEIGHTS_SQL),
    "conv_error_bursts": (q_conv_error_bursts, CONV_ERROR_BURSTS_SQL),
    "conv_first_error": (q_conv_first_error, CONV_FIRST_ERROR_SQL),
    "customers_order_gap_median": (
        q_customers_order_gap_median,
        CUSTOMERS_ORDER_GAP_SQL,
    ),
}

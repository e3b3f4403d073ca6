"""Block-boundary invariance + properties for the round-2h operators
(analytics parity, governance audits, evaluation statistics)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("q_orders_market_share", ["o_year"]),
    ("q_returned_top_customers", ["revenue_c100", "c_custkey"]),
    ("q_promo_revenue_ratio", ["total_rev_c100"]),
    ("q_small_qty_revenue", ["total_price_c100"]),
    ("q_large_volume_customers", ["total_price_c100", "o_orderkey"]),
    ("q_fk_orphans_audit", ["rel"]),
    ("q_events_k_anonymity", ["total_groups"]),
    ("q_events_anova_f", ["n_rows"]),
    ("q_events_xcorr_lagged", ["lag"]),
    ("q_eval_ndcg", ["q_id"]),
    ("q_embedding_power_iteration", ["dim"]),
]


def _get(fn_name):
    import importlib

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2h"
    )
    return getattr(m, fn_name)


@pytest.mark.parametrize("fn,key", CASES, ids=[c[0] for c in CASES])
def test_tiny_blocks_same_answer(ray_session, fn, key):
    from ray.data.context import DataContext

    q = _get(fn)

    def run():
        r = q(SF)
        r = r.to_pandas() if hasattr(r, "to_pandas") else r
        return r.sort_values(key, ignore_index=True)

    base = run()
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024
        tiny = run()
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(base, tiny[base.columns])


def test_market_share_bounds(ray_session):
    df = _get("q_orders_market_share")(SF).to_pandas()
    assert len(df) > 0
    assert (df["tgt_rev_c100"] <= df["total_rev_c100"]).all()
    assert ((df["mkt_share"] >= 0) & (df["mkt_share"] <= 1)).all()


def test_ndcg_bounds(ray_session):
    df = _get("q_eval_ndcg")(SF).to_pandas()
    assert len(df) == 5
    assert ((df["ndcg"] >= 0.0) & (df["ndcg"] <= 1.0)).all()
    # zero relevant retrieved => ndcg defined as 0
    z = df[df["n_rel"] == 0]
    assert (z["ndcg"] == 0.0).all()
    # all relevant => perfect ordering is forced => ndcg == 1
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_ann import K

    full = df[df["n_rel"] == K]
    assert (full["ndcg"] == 1.0).all()


def test_xcorr_r_in_unit_interval(ray_session):
    df = _get("q_events_xcorr_lagged")(SF).to_pandas()
    assert list(df["lag"]) == list(range(8))
    r = df["r"].dropna()
    assert ((r >= -1.0) & (r <= 1.0)).all()
    # window shrinks by one day per lag step
    assert (df["n_days"].diff().dropna() == -1).all()


def test_k_anonymity_consistency(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2h import (
        KANON_K,
    )

    df = _get("q_events_k_anonymity")(SF).to_pandas()
    g, v, e = (int(df[c].iloc[0]) for c in
               ["total_groups", "violating_groups", "exposed_rows"])
    assert 0 <= v <= g
    # each violating group holds 1..K-1 rows
    assert v <= e <= v * (KANON_K - 1)


def test_power_iteration_unit_norm(ray_session):
    df = _get("q_embedding_power_iteration")(SF).to_pandas()
    assert len(df) == 64
    nrm = float(np.sqrt((df["v_next"] ** 2).sum()))
    assert abs(nrm - 1.0) < 1e-4  # round6 per-coordinate quantization


def test_fk_orphans_detects_injected_orphans(ray_session, tmp_path):
    """Governance audit must count injected orphans exactly: drop the
    first 3 orders and point 2 customers at a bogus nation."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    src = SF
    orders = pq.read_table(f"{src}/orders.parquet")
    victims = orders["o_orderkey"].to_pylist()[:3]
    keep = ~np.isin(np.asarray(orders["o_orderkey"]), victims)
    pq.write_table(orders.filter(pa.array(keep)),
                   str(tmp_path / "orders.parquet"))

    cust = pq.read_table(f"{src}/customer.parquet")
    nk = np.asarray(cust["c_nationkey"]).astype(np.int32).copy()
    nk[:2] = 9999
    cust = cust.set_column(
        cust.schema.get_field_index("c_nationkey"),
        "c_nationkey",
        pa.array(nk, pa.int32()),
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))

    for t in ["lineitem", "nation"]:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       str(tmp_path / f"{t}.parquet"))

    df = (
        _get("q_fk_orphans_audit")(str(tmp_path))
        .to_pandas()
        .set_index("rel")
    )
    li = pq.read_table(f"{src}/lineitem.parquet", columns=["l_orderkey"])
    expected_li_orphans = int(
        np.isin(np.asarray(li["l_orderkey"]), victims).sum()
    )
    assert expected_li_orphans > 0
    assert int(df.loc["lineitem->orders", "orphan_rows"]) == expected_li_orphans
    assert int(df.loc["customer->nation", "orphan_rows"]) == 2
    # dropped orders belonged to existing customers -> no orders orphans
    assert int(df.loc["orders->customer", "orphan_rows"]) == 0


def test_small_qty_threshold_is_strict(ray_session):
    """A part whose lineitems all share one quantity has no row strictly
    below avg/5 — the all-equal corner must contribute nothing."""
    df = _get("q_small_qty_revenue")(SF).to_pandas()
    n = int(df["n_small_lines"].iloc[0])
    total = int(df["total_price_c100"].iloc[0])
    assert (n == 0) == (total == 0)
    assert int(df["avg_yearly_c100"].iloc[0]) == total // 7


def test_xcorr_short_span_matches_sql_twin(ray_session, tmp_path):
    """Regression (ADVICE r2): when the active day span <= XCORR_MAX_LAG,
    the Ray side emits a (lag, n_days=0, r NULL) row per overflowing lag;
    the SQL twin must keep those groups too (LEFT JOIN from the lags CTE)
    so row counts agree on short-span data."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import importlib

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray"
        ".pipelines.queries_r2h"
    )
    # 3 active days << XCORR_MAX_LAG=7 — lags 3.. have zero-length series
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    for day, (na, nb) in enumerate([(3, 1), (0, 2), (5, 4)]):
        for i in range(na):
            rows.append((m.XCORR_A, base + np.timedelta64(day, "D") + np.timedelta64(i, "s")))
        for i in range(nb):
            rows.append((m.XCORR_B, base + np.timedelta64(day, "D") + np.timedelta64(100 + i, "s")))
    tbl = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    ray_df = (
        m.q_events_xcorr_lagged(str(tmp_path))
        .to_pandas()
        .sort_values("lag", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    sql_df = (
        con.execute(m.EVENTS_XCORR_LAGGED_SQL)
        .df()
        .sort_values("lag", ignore_index=True)
    )
    assert len(ray_df) == m.XCORR_MAX_LAG + 1 == len(sql_df)
    pd.testing.assert_frame_equal(
        ray_df[["lag", "n_days"]].astype("int64"),
        sql_df[["lag", "n_days"]].astype("int64"),
    )
    assert np.array_equal(
        ray_df["r"].to_numpy(float), sql_df["r"].to_numpy(float),
        equal_nan=True,
    )

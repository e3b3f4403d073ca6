"""Block-boundary invariance + properties for the round-2n operators
(user growth, Fisher ratio, repeat rate)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("q_events_user_growth", ["d"]),
    ("q_embedding_fisher_ratio", ["dim"]),
    ("q_orders_repeat_rate", ["n_customers"]),
]


def _get(fn_name):
    import importlib

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2n"
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


def test_user_growth_monotone_and_total(ray_session):
    import duckdb

    df = _get("q_events_user_growth")(SF).to_pandas().sort_values("d")
    assert (df["new_users"] > 0).all()
    assert (df["cum_users"].diff().dropna() > 0).all()
    total = duckdb.connect().execute(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert int(df["cum_users"].iloc[-1]) == total
    assert int(df["new_users"].sum()) == total


def test_fisher_ratio_nonnegative_full_dims(ray_session):
    df = _get("q_embedding_fisher_ratio")(SF).to_pandas()
    assert len(df) == 64
    assert (df["n_classes"] == 10).all()
    f = df["f_stat"].dropna()
    assert (f >= 0).all()


def test_repeat_rate_consistency(ray_session):
    import duckdb

    df = _get("q_orders_repeat_rate")(SF).to_pandas()
    n, r = int(df["n_customers"].iloc[0]), int(df["n_repeat"].iloc[0])
    assert 0 <= r <= n
    n_orders = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    # gaps = orders - customers (one fewer gap than orders per customer)
    assert int(df["n_gaps"].iloc[0]) == n_orders - n
    assert float(df["mean_gap_days"].iloc[0]) >= 0

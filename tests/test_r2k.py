"""Block-boundary invariance + properties for the round-2k operators
(cohort LTV, ship-delay histogram, mutual-kNN degrees, bot flags,
poly2 features, partition balance, weekend lift, norm top-k)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("q_events_cohort_ltv", ["cohort_week", "age_weeks"]),
    ("q_lineitem_ship_delay_hist", ["bucket"]),
    ("q_embedding_knn_degree_hist", ["degree"]),
    ("q_events_bot_flags", ["user_id"]),
    ("q_features_poly2", ["event_id"]),
    ("q_engine_partition_balance", ["bucket"]),
    ("q_events_weekend_lift", ["event_type"]),
    ("q_embedding_norm_topk", ["norm2_q", "vec_id"]),
]


def _get(fn_name):
    import importlib

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2k"
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


def test_cohort_triangle_age_zero_has_every_user(ray_session):
    """Every user appears in the age-0 cell of their cohort, so age-0
    user counts sum to the total distinct-user count."""
    import duckdb

    df = _get("q_events_cohort_ltv")(SF).to_pandas()
    assert (df["age_weeks"] >= 0).all()
    n_users = duckdb.connect().execute(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert int(df.loc[df["age_weeks"] == 0, "n_users"].sum()) == n_users


def test_ship_delay_hist_total(ray_session):
    import duckdb

    df = _get("q_lineitem_ship_delay_hist")(SF).to_pandas()
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    assert int(df["n"].sum()) == n


def test_knn_degree_hist_covers_all_vectors(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_ann import (
        K,
    )

    df = _get("q_embedding_knn_degree_hist")(SF).to_pandas()
    assert (df["degree"] <= K).all()
    assert int(df["n"].sum()) == 500  # every vector accounted for


def test_partition_balance_is_roughly_uniform(ray_session):
    df = _get("q_engine_partition_balance")(SF).to_pandas()
    assert len(df) == 64
    n = df["n"].to_numpy()
    # splitmix64 on sequential ids should not put 3x the expectation
    # in any bucket at n=1000
    assert n.max() < 3 * n.mean()
    # chi2 total for 63 dof should be sane (not astronomically skewed)
    assert df["chi2_term"].sum() < 200


def test_poly2_identities(ray_session):
    df = _get("q_features_poly2")(SF).to_pandas().head(100)
    x = df["x_c"].to_numpy(float)
    h = df["hod"].to_numpy(float)
    assert np.array_equal(df["x2"].to_numpy(float), x * x, equal_nan=True)
    assert np.array_equal(df["xh"].to_numpy(float), x * h, equal_nan=True)
    assert (df["h2"] == df["hod"] ** 2).all()


def test_weekend_lift_day_partition(ray_session):
    df = _get("q_events_weekend_lift")(SF).to_pandas()
    span = int(df["weekend_days"].iloc[0] + df["weekday_days"].iloc[0])
    # events fixture spans ~30 calendar days
    assert 28 <= span <= 32
    assert (df["weekend_days"] == df["weekend_days"].iloc[0]).all()


def test_norm_topk_descending_and_positive(ray_session):
    df = _get("q_embedding_norm_topk")(SF).to_pandas()
    assert len(df) == 10
    v = df["norm2_q"].to_numpy()
    assert (np.diff(v) <= 0).all()
    assert (v > 0).all()


def test_bot_flags_threshold(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2k import (
        BOT_RPM,
    )

    df = _get("q_events_bot_flags")(SF).to_pandas()
    assert (df["peak_per_min"] >= BOT_RPM).all()
    assert (df["n_hot_minutes"] >= 1).all()

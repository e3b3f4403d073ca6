"""Block-boundary invariance + properties for the round-2l operators
(l-diversity, Brier decomposition, unigram cross-entropy, kNN
components, DOW adjustment, revenue HHI, temperature scaling, Q6)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("q_events_l_diversity", ["hod", "vbucket"]),
    ("q_docs_lr_brier", ["n_docs"]),
    ("q_docs_unigram_xent", ["doc_id"]),
    ("q_embedding_knn_components", ["vec_id"]),
    ("q_events_dow_adjusted", ["d"]),
    ("q_orders_revenue_hhi", ["c_nationkey"]),
    ("q_train_temp_scaling", ["temperature"]),
    ("q_lineitem_q6_revenue", ["revenue_cpct"]),
]


def _get(fn_name):
    import importlib

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2l"
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


def test_l_diversity_bounds(ray_session):
    df = _get("q_events_l_diversity")(SF).to_pandas()
    assert (df["l_distinct"] >= 1).all()
    assert (df["l_distinct"] <= np.minimum(df["n_rows"], 5)).all()
    assert ((df["violates"] == 0) | (df["violates"] == 1)).all()


def test_brier_decomposition_identity(ray_session):
    """Generalized Murphy: brier = reliability − resolution +
    uncertainty + within-bin score variance, so with non-constant
    within-bin scores brier >= rel − res + unc, with a small
    (variance-bounded) excess."""
    df = _get("q_docs_lr_brier")(SF).to_pandas()
    b, rel, res, unc = (float(df[c].iloc[0]) for c in
                        ["brier", "reliability", "resolution", "uncertainty"])
    excess = b - (rel - res + unc)
    assert -5e-6 <= excess < 0.01  # within-bin variance of decile bins
    assert b >= 0 and rel >= 0 and res >= 0
    assert 0 <= unc <= 0.25


def test_unigram_xent_nonnegative(ray_session):
    df = _get("q_docs_unigram_xent")(SF).to_pandas()
    assert len(df) == 500
    assert (df["xent"] >= 0).all()  # cf <= N so every term ln(cf/N) <= 0


def test_knn_components_reps_are_members(ray_session):
    df = _get("q_embedding_knn_components")(SF).to_pandas()
    assert len(df) == 500
    # component label is the smallest member id
    assert (df["component"] <= df["vec_id"]).all()
    reps = set(df["component"])
    assert reps <= set(df["vec_id"])
    # every rep labels itself
    own = df.set_index("vec_id")["component"]
    assert all(own[r] == r for r in reps)


def test_dow_adjusted_residuals_sum_zero_per_dow(ray_session):
    df = _get("q_events_dow_adjusted")(SF).to_pandas()
    for _, g in df.groupby("dow"):
        assert abs(g["residual"].sum()) < 1e-3  # round6 per-row residue


def test_hhi_bounds(ray_session):
    df = _get("q_orders_revenue_hhi")(SF).to_pandas()
    # HHI in (1/n, 1]
    lo = 1.0 / df["n_customers"]
    assert (df["hhi"] >= lo - 1e-9).all()
    assert (df["hhi"] <= 1.0 + 1e-9).all()


def test_temp_scaling_single_best(ray_session):
    df = _get("q_train_temp_scaling")(SF).to_pandas()
    assert int(df["is_best"].sum()) == 1
    best_nll = float(df.loc[df["is_best"] == 1, "mean_nll"].iloc[0])
    assert best_nll <= float(df["mean_nll"].min()) + 1e-12


def test_q6_revenue_consistency(ray_session):
    df = _get("q_lineitem_q6_revenue")(SF).to_pandas()
    n = int(df["n_lines"].iloc[0])
    rev = int(df["revenue_cpct"].iloc[0])
    assert (n == 0) == (rev == 0)
    assert rev >= 0

"""Block-boundary invariance + properties for the round-2f operators
(ratio CI, reward decay, PMI, seasonal-naive error)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("queries_r2f", "q_events_ratio_ci", ["arm"]),
    ("queries_r2f", "q_conv_reward_decay", ["conv_id", "turn_idx"]),
    ("queries_r2f", "q_docs_pmi_bigrams", ["w1", "w2"]),
    ("queries_r2f", "q_events_seasonal_naive", ["user_id"]),
]


@pytest.mark.parametrize("mod,fn,key", CASES, ids=[c[1] for c in CASES])
def test_tiny_blocks_same_answer(ray_session, mod, fn, key):
    import importlib

    from ray.data.context import DataContext

    m = importlib.import_module(
        f"aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.{mod}"
    )
    q = getattr(m, fn)

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


def test_reward_decay_halves(ray_session):
    """Within a conversation, credit exactly halves per step back from
    the terminal turn, and the terminal turn's credit is the integer
    reward."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2f import (
        q_conv_reward_decay,
    )

    out = (
        q_conv_reward_decay(SF)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert len(out) > 0
    for _cid, g in out.groupby("conv_id"):
        c = g["credit"].to_numpy()
        assert (c[:-1] * 2.0 == c[1:]).all()  # exact halving (γ = 1/2)
        assert c[-1] == np.floor(c[-1])  # terminal credit is the reward


def test_ratio_ci_brackets_ratio(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2f import (
        q_events_ratio_ci,
    )

    out = q_events_ratio_ci(SF).to_pandas()
    ok = out[out["ratio"].notna()]
    assert len(ok) == 2  # both arms populated at the fixture
    assert (ok["ci_lo"] <= ok["ratio"]).all()
    assert (ok["ratio"] <= ok["ci_hi"]).all()
    assert (ok["se"] >= 0).all()


def test_pmi_symmetric_counts(ray_session):
    """Marginals dominate the pair count and PMI is finite."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2f import (
        PMI_MIN_COUNT,
        q_docs_pmi_bigrams,
    )

    out = q_docs_pmi_bigrams(SF).to_pandas()
    assert (out["c_ab"] >= PMI_MIN_COUNT).all()
    assert np.isfinite(out["pmi"]).all()

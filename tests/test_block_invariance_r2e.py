"""Block-boundary invariance for the round-2e timeline/context operators:
answers must not depend on how Ray fragments the input into blocks —
tiny target_max_block_size forces many small batches through the
per-batch partials, keyed exchanges and the sweep-line prefix scan."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("queries_timeline", "q_conv_truncate_budget", ["conv_id"]),
    ("queries_timeline", "q_conv_token_share", ["conv_id", "role"]),
    ("queries_timeline", "q_events_peak_concurrency", ["day"]),
    ("queries_timeline", "q_events_interp_daily", ["user_id", "day"]),
    ("queries_timeline", "q_train_temporal_cv", ["fold"]),
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
        ctx.target_max_block_size = 16 * 1024  # ~16 KiB blocks
        tiny = run()
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(base, tiny[base.columns])


def test_truncate_budget_suffix_property(ray_session):
    """Kept turns are exactly a suffix whose token total fits the budget
    and adding one more turn would overflow it (unless everything fit)."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_timeline import (
        CTX_BUDGET_TOKENS,
        q_conv_truncate_budget,
    )

    out = q_conv_truncate_budget(SF).to_pandas()
    assert (out["kept_tokens"] <= CTX_BUDGET_TOKENS).all()
    assert ((out["n_kept"] > 0) == out["first_kept_turn"].notna()).all()
    kept = out[out["n_kept"] > 0]
    assert (
        kept["first_kept_turn"] == kept["n_turns"] - kept["n_kept"]
    ).all()


def test_peak_concurrency_bounds(ray_session):
    """Peak is >= 1 on every reported day and never exceeds the total
    number of conversations."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_timeline import (
        q_events_peak_concurrency,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.sources.transcripts import (
        read_events_as_transcripts,
    )

    out = q_events_peak_concurrency(SF).to_pandas()
    n_convs = (
        read_events_as_transcripts(SF).to_pandas()["conv_id"].nunique()
    )
    assert (out["peak_concurrency"] >= 1).any()
    assert (out["peak_concurrency"] >= 0).all()
    assert (out["peak_concurrency"] <= n_convs).all()


def test_interp_matches_obs_and_brackets(ray_session):
    """Observed days pass the value through; interpolated days lie
    between their bracketing observed values."""
    import numpy as np

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_timeline import (
        q_events_interp_daily,
    )

    out = (
        q_events_interp_daily(SF)
        .to_pandas()
        .sort_values(["user_id", "day"], ignore_index=True)
    )
    for _uid, g in out.groupby("user_id"):
        days = g["day"].to_numpy()
        assert (np.diff(days) == 1).all()  # dense grid
        vi = g["value_interp"].to_numpy()
        assert np.isfinite(vi).all()
        obs_pos = np.flatnonzero(g["is_obs"].to_numpy() == 1)
        assert len(obs_pos) >= 1
        for a, b in zip(obs_pos[:-1], obs_pos[1:]):
            seg = vi[a : b + 1]
            lo, hi = min(vi[a], vi[b]), max(vi[a], vi[b])
            assert (seg >= lo - 1e-9).all() and (seg <= hi + 1e-9).all()
    first = out.groupby("user_id").first()
    assert (first["is_obs"] == 1).all()  # grid starts at an observation
    last = out.groupby("user_id").last()
    assert (last["is_obs"] == 1).all()  # and ends at one

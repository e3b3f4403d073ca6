"""Block-boundary invariance for the round-2c keyed operators: the
answers must not depend on how Ray fragments the input into blocks
(tiny target_max_block_size forces many small batches through every
per-batch partial and keyed exchange)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    (
        "queries_features",
        "q_events_ntile",
        ["event_type", "tile"],
    ),
    (
        "queries_relational",
        "q_events_band_join",
        ["event_id"],
    ),
    (
        "queries_temporal",
        "q_events_twa",
        ["user_id"],
    ),
    (
        "queries_temporal",
        "q_events_resample_daily",
        ["user_id", "day"],
    ),
    (
        "queries_behavior",
        "q_events_mode_by_user",
        ["user_id"],
    ),
    (
        "queries_extra",
        "q_docs_bm25",
        ["rk"],
    ),
]


@pytest.mark.parametrize("mod,fn,key", CASES, ids=[c[1] for c in CASES])
def test_tiny_blocks_same_answer(ray_session, mod, fn, key):
    import importlib

    from ray.data.context import DataContext

    m = importlib.import_module(
        f"aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.{mod}"
    )
    q = getattr(m, fn)
    base = q(SF).to_pandas().sort_values(key, ignore_index=True)
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024  # ~16 KiB blocks
        tiny = q(SF).to_pandas().sort_values(key, ignore_index=True)
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(base, tiny[base.columns])

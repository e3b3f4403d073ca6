"""Block-boundary invariance for the round-2d operators (eval stats,
selection, sessions, sequences): answers must not depend on how Ray
fragments the input into blocks — tiny target_max_block_size forces
many small batches through every per-batch partial, keyed exchange and
bottom-k cut."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("queries_eval", "q_events_ks_drift", ["ks"]),
    ("queries_eval", "q_docs_lr_auc", ["auc"]),
    ("queries_eval", "q_events_target_encode_loo", ["event_id"]),
    ("queries_eval", "q_docs_pareto_front", ["doc_id"]),
    ("queries_eval", "q_docs_sample_k_per_lang", ["lang", "rk"]),
    ("queries_eval", "q_events_cuped", ["n_a"]),
    ("queries_sessions", "q_sessionize_capped", ["conv_id", "turn_idx"]),
    ("queries_sessions", "q_events_survival_hazard", ["dt"]),
    ("queries_sequence", "q_events_type_trigrams", ["t1", "t2", "t3"]),
    ("queries_sequence", "q_events_autocorr_7d", ["event_type"]),
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

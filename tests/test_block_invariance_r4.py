"""Block-boundary invariance for the round-4 operators: answers must
not depend on how Ray fragments the input into blocks (tiny
target_max_block_size forces many small batches through every
per-batch partial, keyed exchange, prefix-filter stage and
broadcast-verify pass)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("queries_r4a", "q_lineitem_pricing_summary",
     ["l_returnflag", "l_linestatus"]),
    ("queries_r4a", "q_orders_custdist", ["c_count"]),
    ("queries_r4a", "q_docs_prefix_dupes", ["doc_id"]),
    ("queries_r4a", "q_docs_dsir_weights", ["doc_id"]),
    ("queries_r4a", "q_conv_loss_mask", ["conv_id", "turn_idx"]),
    ("queries_r4a", "q_embedding_pq_codes", ["vec_id", "sub"]),
    ("queries_r4b", "q_orders_local_supplier_revenue", ["n_name"]),
    ("queries_r4b", "q_nations_trade_volume",
     ["supp_nation", "cust_nation", "l_year"]),
    ("queries_r4b", "q_docs_tokenizer_fertility", ["lang"]),
    ("queries_r4b", "q_docs_dedup_survivorship", ["doc_id"]),
    ("queries_r4b", "q_events_watermark_lag", ["event_id"]),
    ("queries_r4c", "q_train_dedup_aware_split", ["doc_id"]),
    ("queries_r4c", "q_conv_concurrent_turns", ["conv_id"]),
    ("queries_r4c", "q_docs_dup_ratio_by_source", ["source"]),
    ("queries_r4d", "q_conv_tool_call_stats", ["tool"]),
    ("queries_r4d", "q_events_lateness_by_day", ["day"]),
    ("queries_r4d", "q_docs_head_middle_tail", ["doc_id"]),
    ("queries_r4e", "q_embedding_pq_residual_energy", ["vec_id"]),
    ("queries_r4e", "q_docs_suffix_dupes", ["doc_id"]),
    ("queries_r4f", "q_docs_token_coverage_curve", ["k"]),
    ("queries_r4f", "q_conv_repeat_loops", ["conv_id"]),
    # the rebuilt PPJoin similarity family (round-4 core fix)
    ("queries_text", "q_docs_ngram_jaccard", ["doc_a", "doc_b"]),
    ("queries_text", "q_docs_containment_pairs", ["doc_a", "doc_b"]),
    ("queries_r3f", "q_docs_weighted_jaccard", ["doc_a", "doc_b"]),
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

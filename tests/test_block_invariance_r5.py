"""Block-boundary invariance for the round-5 operators: answers must
not depend on how Ray fragments the input into blocks (tiny
target_max_block_size forces many small batches through every
per-batch partial, keyed exchange, cogroup and driver-fold path)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("queries_r5a", "q_orders_q3_unshipped", ["o_orderkey"]),
    ("queries_r5a", "q_orders_q18_big_orders", ["o_orderkey"]),
    ("queries_r5a", "q_top_supplier_revenue", ["s_suppkey"]),
    ("queries_r5a", "q_orders_q4_late_exists", ["o_orderpriority"]),
    ("queries_r5a", "q_docs_norm_dedup", ["doc_id"]),
    ("queries_r5a", "q_events_type_value_quantiles", ["event_type"]),
    ("queries_r5a", "q_events_bounce_rate", ["day"]),
    ("queries_r5a", "q_events_since_last_purchase", ["event_id"]),
    ("queries_r5a", "q_events_reactivations", ["user_id"]),
    ("queries_r5a", "q_embedding_pq_energy_by_label", ["label"]),
    ("queries_r5b", "q_conv_roleseq_dupes", ["conv_id"]),
    ("queries_r5b", "q_conv_verbosity_trend", ["conv_id"]),
    ("queries_r5b", "q_docs_len_outlier_mad", ["doc_id"]),
    ("queries_r5b", "q_events_type_user_jaccard", ["type_a", "type_b"]),
    ("queries_r5b", "q_embedding_label_centroid_shift", ["label"]),
    ("queries_r5c", "q_conv_tool_response_latency", ["tool"]),
    ("queries_r5c", "q_conv_mask_budget", ["conv_id"]),
    ("queries_r5c", "q_customers_rfm_quintiles", ["c_custkey"]),
    ("queries_r5c", "q_lineitem_discount_elasticity", ["discount_pct"]),
    ("queries_r5c", "q_suppliers_ship_delay_median", ["s_suppkey"]),
    ("queries_r5c", "q_events_session_depth_hist", ["depth"]),
    ("queries_r5d", "q_embedding_norm_outliers", ["vec_id"]),
    ("queries_r5d", "q_train_label_weights", ["label"]),
    ("queries_r5d", "q_conv_error_bursts", ["conv_id"]),
    ("queries_r5d", "q_conv_first_error", ["conv_id"]),
    ("queries_r5d", "q_customers_order_gap_median", ["c_custkey"]),
    ("queries_r5e", "q_docs_cross_source_dup_matrix",
     ["source_a", "source_b"]),
    ("queries_r5e", "q_events_daily_volume_anomalies", ["day"]),
    ("queries_r5e", "q_conv_gap_quantiles", ["conv_id"]),
    ("queries_r5e", "q_events_peak_hour", ["event_type"]),
    ("queries_r5f", "q_knn_pq_rerank", ["q_id", "rank"]),
    ("queries_r5f", "q_conv_role_transition_latency",
     ["role_a", "role_b"]),
    ("queries_r5g", "q_train_split_contamination", ["source"]),
    ("queries_r5g", "q_events_lifecycle_stages", ["stage"]),
    ("queries_r5g", "q_conv_tool_bigrams", ["tool_a", "tool_b"]),
    ("queries_r5g", "q_segments_revenue_share", ["c_mktsegment"]),
    ("queries_r5g", "q_orders_weekday_seasonality", ["dow"]),
    ("queries_r5h", "q_docs_tercile_length_bias", ["bucket"]),
    ("queries_r5h", "q_parts_size_price_profile", ["p_size"]),
    ("queries_r5h", "q_events_type_dow_heatmap", ["event_type", "dow"]),
    ("queries_r5h", "q_suppliers_nation_balance", ["n_name"]),
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
    pd.testing.assert_frame_equal(base, tiny)

"""Block-boundary invariance + properties for the round-2j operators
(Benford forensics, char-class profile, vocab overlap, Q4/Q16/Q22
shapes, Poisson rate ratio, handoff latency)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("q_events_benford_profile", ["digit"]),
    ("q_docs_charclass_profile", ["source"]),
    ("q_docs_vocab_overlap", ["lang_a", "lang_b"]),
    ("q_orders_priority_delays", ["o_orderpriority"]),
    ("q_parts_supplier_variety", ["p_brand"]),
    ("q_idle_rich_customers", ["c_nationkey"]),
    ("q_events_rate_ratio", ["n_ref"]),
    ("q_conv_handoff_latency", ["conv_id"]),
]


def _get(fn_name):
    import importlib

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2j"
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


def test_benford_probabilities_sum_to_one(ray_session):
    df = _get("q_events_benford_profile")(SF).to_pandas()
    assert set(df["digit"]) <= set(range(1, 10))
    assert abs(df["benford_p"].sum() - 1.0) < 1e-4
    assert (df["chi2_term"] >= 0).all()
    import duckdb

    n = duckdb.connect().execute(
        f"""SELECT count(*) FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL
              AND CAST(ROUND(value * 100, 0) AS BIGINT) > 0"""
    ).fetchone()[0]
    assert int(df["n"].sum()) == n


def test_charclass_parts_sum_to_total(ray_session):
    df = _get("q_docs_charclass_profile")(SF).to_pandas()
    tot = df["n_alpha"] + df["n_digit"] + df["n_space"] + df["n_other"]
    assert (tot == df["n_chars"]).all()


def test_vocab_overlap_symmetric_bounds(ray_session):
    df = _get("q_docs_vocab_overlap")(SF).to_pandas()
    assert (df["lang_a"] < df["lang_b"]).all()
    assert (df["n_shared"] <= np.minimum(df["v_a"], df["v_b"])).all()
    assert ((df["jaccard"] > 0) & (df["jaccard"] <= 1)).all()


def test_priority_delays_bounded(ray_session):
    df = _get("q_orders_priority_delays")(SF).to_pandas()
    assert (df["n_delayed"] <= df["n_orders"]).all()
    import duckdb

    n = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert int(df["n_orders"].sum()) == n


def test_supplier_variety_bounded_by_supplier_count(ray_session):
    import duckdb

    df = _get("q_parts_supplier_variety")(SF).to_pandas()
    n_supp = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF}/supplier.parquet'"
    ).fetchone()[0]
    assert (df["n_suppliers"] >= 1).all()
    assert (df["n_suppliers"] <= n_supp).all()


def test_rate_ratio_ci_brackets_point(ray_session):
    df = _get("q_events_rate_ratio")(SF).to_pandas()
    r = float(df["rate_ratio"].iloc[0])
    assert float(df["ci_lo"].iloc[0]) < r < float(df["ci_hi"].iloc[0])
    assert r > 0


def test_handoff_latency_positive(ray_session):
    df = _get("q_conv_handoff_latency")(SF).to_pandas()
    assert (df["n_handoffs"] >= 1).all()
    assert (df["max_gap_us"] >= 0).all()
    assert (df["mean_gap_us"] <= df["max_gap_us"] + 1e-9).all()

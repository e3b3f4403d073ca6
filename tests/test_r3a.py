"""Block-boundary invariance + property checks for the round-3 operators
(interval join, BFS hops, prefix groups, lateness triage, del-1 pairs,
windowed top-k)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("q_events_interval_join", ["event_id"]),
    ("q_embedding_bfs_hops", ["vec_id"]),
    ("q_conv_prefix_groups", ["prefix"]),
    ("q_events_allowed_lateness", ["day"]),
    ("q_docs_del1_pairs", ["doc_a", "doc_b"]),
    ("q_events_window_topk", ["day", "rnk"]),
]


def _get(fn_name):
    import importlib

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r3a"
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


def test_interval_join_window_is_half_open(ray_session):
    """No click at exactly the purchase instant may count (the window is
    [ts-1h, ts) — leakage-conservative like the as-of join's ts' <= ts)."""
    df = _get("q_events_interval_join")(SF).to_pandas()
    assert len(df) > 0
    assert (df["n_clicks_1h"] >= 0).all()
    assert ((df["click_cents_1h"] == 0) | (df["n_clicks_1h"] > 0)).all()


def test_bfs_sources_are_zero_and_hops_bounded(ray_session):
    import importlib

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r3a"
    )
    df = _get("q_embedding_bfs_hops")(SF).to_pandas()
    src = df[df["vec_id"] % m.BFS_SRC_MOD == 0]
    assert (src["hops"] == 0).all() and len(src) > 0
    assert df["hops"].between(0, m.BFS_MAX_H).all()
    # one-hop neighbors of sources: hop 1 exists unless graph is edgeless
    assert (df["hops"] > 0).any()


def test_lateness_classes_partition_rows(ray_session):
    import duckdb

    df = _get("q_events_allowed_lateness")(SF).to_pandas()
    total = int((df["n_on_time"] + df["n_late"] + df["n_dropped"]).sum())
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert total == n


def test_window_topk_rank_semantics(ray_session):
    df = _get("q_events_window_topk")(SF).to_pandas()
    import importlib

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r3a"
    )
    assert df["rnk"].between(1, m.WTOPK_K).all()
    for _, g in df.groupby("day"):
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        nn = g["n"].to_numpy()
        assert (nn[:-1] >= nn[1:]).all()


def test_del1_pairs_variable_length_keys(ray_session, tmp_path):
    """Keys from texts SHORTER than the key width exercise the
    length-difference-1 verify branch; parity vs duckdb levenshtein on a
    constructed corpus (insert/delete/substitute/far pairs)."""
    import duckdb
    import importlib
    import pyarrow as pa
    import pyarrow.parquet as pq

    m = importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r3a"
    )
    texts = [
        "abcd",        # short
        "abcde",       # insertion at end vs 0
        "bcd",         # deletion at front vs 0
        "axcd",        # substitution vs 0
        "abqqcd",      # ed 2 vs 0
        "zbcde",       # substitution at front vs 1
        "abcd",        # exact duplicate of 0
        "a" * 20,      # full-width key
        "a" * 19 + "b",  # substitution at last position, full width
        "a" * 21,      # longer text, same 12-char key as 7
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        m.q_docs_del1_pairs(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    exp = (
        con.execute(m.DOCS_DEL1_PAIRS_SQL)
        .df()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    assert len(got) == len(exp) and len(got) > 0
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64")
    )

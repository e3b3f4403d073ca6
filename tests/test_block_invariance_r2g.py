"""Block-boundary invariance + properties for the round-2g operators
(value Gini, Lorenz deciles, Heaps vocabulary growth)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("queries_r2g", "q_events_value_gini", ["n_users"]),
    ("queries_r2g", "q_events_lorenz_deciles", ["decile"]),
    ("queries_r2g", "q_docs_heaps_vocab", ["decile"]),
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


def test_gini_in_unit_interval_and_matches_lorenz(ray_session):
    """Gini ∈ [0, 1) on a positive-mass fixture, and the Lorenz decile
    table reconciles with it: same total mass, monotone cumulative
    share ending at exactly 1."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2g import (
        q_events_lorenz_deciles,
        q_events_value_gini,
    )

    g = q_events_value_gini(SF).to_pandas()
    assert len(g) == 1
    gini = float(g["gini"].iloc[0])
    assert 0.0 <= gini < 1.0

    lz = q_events_lorenz_deciles(SF).sort_values("decile", ignore_index=True)
    assert list(lz["decile"]) == list(range(1, 11))
    assert int(lz["users"].sum()) == int(g["n_users"].iloc[0])
    assert int(lz["value_cents"].sum()) == int(g["total_cents"].iloc[0])
    share = lz["cum_share"].to_numpy()
    assert (np.diff(share) >= 0).all()
    assert share[-1] == 1.0


def test_lorenz_tile_sizes_are_ansi(ray_session):
    """NTILE sizing: first n % 10 tiles carry one extra user."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2g import (
        q_events_lorenz_deciles,
    )

    lz = q_events_lorenz_deciles(SF).sort_values("decile", ignore_index=True)
    n = int(lz["users"].sum())
    q_, r_ = divmod(n, 10)
    expect = [q_ + 1 if i < r_ else q_ for i in range(10)]
    assert list(lz["users"]) == expect


def test_heaps_curve_shape(ray_session):
    """Vocabulary growth is cumulative, positive, and ends at the exact
    corpus-wide distinct token count; docs_seen checkpoints are the
    ceil(n*c/10) grid."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.functions.text import (
        tokens_list,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r2g import (
        q_docs_heaps_vocab,
    )

    hv = q_docs_heaps_vocab(SF).sort_values("decile", ignore_index=True)
    assert list(hv["decile"]) == list(range(1, 11))
    assert (hv["new_tokens"] >= 0).all()
    assert (np.diff(hv["vocab_size"]) >= 0).all()
    assert (hv["vocab_size"] == hv["new_tokens"].cumsum()).all()

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    flat = tokens_list(t["text"]).flatten()
    n_vocab = len(pc.unique(flat))
    assert int(hv["vocab_size"].iloc[-1]) == n_vocab

    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    expect = [(n_docs * c + 9) // 10 for c in range(1, 11)]
    assert list(hv["docs_seen"]) == expect

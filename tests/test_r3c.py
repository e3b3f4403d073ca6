"""Block invariance + property checks for round-3 batch C (winnowing
minimizers, DFA sequence validation)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

CASES = [
    ("q_docs_winnow_minimizers", ["doc_id"]),
    ("q_events_dfa_violations", ["user_id"]),
    ("q_events_holt_linear", ["day"]),
    ("q_conv_preference_pairs", ["conv_id"]),
]


def _mod():
    import importlib

    return importlib.import_module(
        "aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r3c"
    )


@pytest.mark.parametrize("fn,key", CASES, ids=[c[0] for c in CASES])
def test_tiny_blocks_same_answer(ray_session, fn, key):
    from ray.data.context import DataContext

    q = getattr(_mod(), fn)

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


def test_winnow_density_and_bounds(ray_session):
    """Winnowing selects between ng/W and ng fingerprints (expected
    density ~2/(W+1)); every document with >= K tokens appears."""
    import duckdb

    m = _mod()
    df = getattr(m, "q_docs_winnow_minimizers")(SF).to_pandas()
    n_docs = duckdb.connect().execute(
        f"""SELECT count(*) FROM '{SF}/documents.parquet'
            WHERE len(string_split(text, ' ')) >= {m.WIN_K}"""
    ).fetchone()[0]
    assert len(df) == n_docs
    n_windows = np.maximum(df["n_grams"] - m.WIN_W + 1, 1)
    assert (df["n_minimizers"] >= np.ceil(n_windows / m.WIN_W)).all()
    assert (df["n_minimizers"] <= df["n_grams"]).all()


def test_winnow_shared_fingerprint_guarantee(ray_session, tmp_path):
    """Two documents sharing a long verbatim span must share at least
    one selected fingerprint (the winnowing guarantee) — checked by
    construction on a synthetic pair."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    m = _mod()
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [f"one two {shared} three", f"nine {shared} eight ten"],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = getattr(m, "q_docs_winnow_minimizers")(str(tmp_path)).to_pandas()
    assert len(out) == 2
    # recompute each doc's selected hash set via an independent reference
    def winnow_ref(text):
        toks = text.split(" ")
        grams = [" ".join(toks[i : i + m.WIN_K])
                 for i in range(len(toks) - m.WIN_K + 1)]
        hv = [int.from_bytes(hashlib.md5(g.encode()).digest()[:5], "big")
              for g in grams]
        key = [h * (1 << m._POS_BITS) + i for i, h in enumerate(hv)]
        sel = set()
        n = len(key)
        w = min(n, m.WIN_W)
        for j in range(w - 1, n):
            lo = j - w + 1
            sel.add(min(range(lo, j + 1), key=lambda i: key[i]))
        return {hv[i] for i in sel}

    s1 = winnow_ref(f"one two {shared} three")
    s2 = winnow_ref(f"nine {shared} eight ten")
    assert s1 & s2, "long shared span must share a fingerprint"
    assert out.set_index("doc_id").loc[1, "n_minimizers"] == len(s1)
    assert out.set_index("doc_id").loc[2, "n_minimizers"] == len(s2)


def test_dfa_counts_are_consistent(ray_session):
    import duckdb

    df = getattr(_mod(), "q_events_dfa_violations")(SF).to_pandas()
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert int(df["n_events"].sum()) == n
    assert (df["bad_purchase"] <= df["n_events"]).all()
    assert (df["error_storm"] <= df["n_events"]).all()


def test_mmr_tiny_blocks(ray_session):
    from ray.data.context import DataContext

    q = getattr(_mod(), "q_embedding_mmr")

    def run():
        return (
            q(SF).to_pandas().sort_values(["q_id", "mmr_rank"],
                                          ignore_index=True)
        )

    base = run()
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024
        tiny = run()
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(base, tiny[base.columns])


def test_mmr_diversifies_vs_plain_topk(ray_session):
    """MMR's picks are distinct per query, ranks are 1..K, and the
    marginal score never increases with rank (greedy argmax)."""
    m = _mod()
    df = getattr(m, "q_embedding_mmr")(SF).to_pandas()
    for _, g in df.groupby("q_id"):
        g = g.sort_values("mmr_rank")
        assert list(g["mmr_rank"]) == list(range(1, len(g) + 1))
        assert g["vec_id"].is_unique
        s = g["mmr_score"].to_numpy()
        assert (s[:-1] >= s[1:] - 1e-12).all()


def test_holt_level_tracks_series(ray_session):
    """The one-step forecast is level+trend and the level stays within
    the daily series' range expanded by the trend magnitude."""
    df = getattr(_mod(), "q_events_holt_linear")(SF).to_pandas()
    assert df["day"].is_monotonic_increasing
    assert np.allclose(
        df["forecast_next"], (df["level"] + df["trend"]).round(6), atol=1e-9
    )


def test_preference_pairs_margin_positive_and_distinct(ray_session):
    df = getattr(_mod(), "q_conv_preference_pairs")(SF).to_pandas()
    assert (df["margin_cents"] > 0).all()
    assert (df["chosen_eid"] != df["rejected_eid"]).all()
    assert df["conv_id"].is_unique

"""HyperLogLog sketch: accuracy vs true distinct counts and
batch-split merge invariance (register maxima are a lattice join, so
any partitioning yields the same sketch)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sketch import (
    HLL_M,
    _estimate,
    hll_registers,
    q_events_hll_users,
)

SF = "/root/testdata/sf0.001"


def _merge_registers(parts: list[pa.Table]) -> pd.DataFrame:
    df = pd.concat([p.to_pandas() for p in parts])
    return df.groupby(["event_type", "reg"], as_index=False)["rho"].max()


def test_hll_split_invariant():
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    t = pa.table(
        {"event_type": pa.array(ev["event_type"], pa.string()),
         "user_id": pa.array(ev["user_id"], pa.int64())}
    )
    whole = _merge_registers([hll_registers(t)])
    split = _merge_registers(
        [hll_registers(t.slice(0, 137)),
         hll_registers(t.slice(137, 2000)),
         hll_registers(t.slice(2137))]
    )
    pd.testing.assert_frame_equal(
        whole.sort_values(["event_type", "reg"], ignore_index=True),
        split.sort_values(["event_type", "reg"], ignore_index=True),
    )


def test_hll_accuracy_bound():
    """p=12 standard error is 1.04/sqrt(4096) ~ 1.6%; assert < 5% on a
    100k-key synthetic stream and on every event type of the fixture."""
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 10_000_000, size=300_000, dtype=np.int64)
    t = pa.table(
        {"event_type": pa.array(["x"] * len(ids), pa.string()),
         "user_id": pa.array(ids, pa.int64())}
    )
    regs = _merge_registers([hll_registers(t)])
    est = _estimate(regs["rho"].to_numpy())
    true = len(np.unique(ids))
    assert abs(est - true) / true < 0.05, (est, true)


def test_hll_query_matches_exact_within_tolerance(ray_session):
    import duckdb

    df = q_events_hll_users(SF).to_pandas()
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT event_type, count(DISTINCT user_id) d "
        f"FROM '{SF}/events.parquet' GROUP BY 1"
    ).df()
    m = df.merge(exact, on="event_type")
    assert len(m) == len(exact)
    rel = (np.abs(m["hll_users"] - m["d"]) / m["d"]).max()
    assert rel < 0.05, rel
    assert (m["used_registers"] <= HLL_M).all()


def test_mg_merge_superset_guarantee():
    """Merged Misra-Gries summaries never lose a true heavy hitter: for
    random batched streams, every token with global count >= N/HH_DENOM
    survives the candidate cut used by docs_heavy_tokens."""
    import numpy as np

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sketch import (
        HH_DENOM,
        MG_K,
        _mg_reduce,
    )

    rng = np.random.default_rng(7)
    for trial in range(5):
        # zipf-ish stream split into uneven batches
        stream = rng.zipf(1.3, size=40_000) % 5_000
        n = len(stream)
        cuts = np.sort(rng.choice(np.arange(1, n), size=30, replace=False))
        merged: dict[int, int] = {}
        for part in np.split(stream, cuts):
            toks, counts = np.unique(part, return_counts=True)
            toks, red = _mg_reduce(toks, counts.astype(np.int64), MG_K)
            for t, c in zip(toks, red):
                merged[int(t)] = merged.get(int(t), 0) + int(c)
        true_toks, true_counts = np.unique(stream, return_counts=True)
        thresh_hit = true_toks[true_counts * HH_DENOM >= n]
        cand = {t for t, c in merged.items() if c * HH_DENOM * 2 >= n}
        missing = [t for t in thresh_hit if int(t) not in cand]
        assert not missing, (trial, missing)

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

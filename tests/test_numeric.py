"""DuckDB-parity numeric kernels: rounding and integer division.

numpy defaults (ties-to-even round, floor division) silently diverge
from the DuckDB oracle twins (ties-away round, truncating division) on
exact .5 ties and negative numerators; these helpers exist so every
kernel shares one verified-matching convention.
"""

import duckdb
import numpy as np
import pyarrow as pa

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.functions.numeric import (
    div_trunc,
    round6,
    round_half_away,
)


def test_round_half_away_matches_duckdb_on_ties_and_edges():
    xs = np.array(
        [-2.5, -1.5, -0.5, 0.5, 1.5, 2.5, 0.0, 3.0, -3.0,
         np.nextafter(0.5, 0), -np.nextafter(0.5, 0),
         1e15 + 0.5, -1e15 - 0.5]
    )
    t = pa.table({"x": xs})
    dd = duckdb.sql("SELECT round(x) r FROM t").fetchnumpy()["r"]
    assert np.array_equal(round_half_away(xs), dd)


def test_round6_matches_duckdb_on_tie_sweep():
    rng = np.random.default_rng(7)
    v = rng.normal(0, 5, 5000)
    v = np.concatenate([v, np.round(v * 2e6) / 2e6])  # inject .5e-6 ties
    t = pa.table({"x": v})
    dd = duckdb.sql("SELECT round(x, 6) r FROM t").fetchnumpy()["r"]
    mine = round6(v)
    assert np.array_equal(mine, dd)
    # np.round would NOT match on this sweep — the helper exists for a reason
    assert not np.array_equal(np.round(v, 6), dd)


def test_div_trunc_matches_duckdb_for_negative_numerators():
    a = np.array(
        [-86_400_000_001, -86_400_000_000, -43_200_000_000, -1, 0, 1,
         43_200_000_000, 86_400_000_000, 86_400_000_001]
    )
    b = 86_400_000_000
    dd = [
        duckdb.sql(f"SELECT {int(v)} // {b}").fetchone()[0] for v in a
    ]
    assert list(div_trunc(a, b)) == dd
    # numpy floor-division diverges on the negative half-open values
    assert list(a // b) != dd

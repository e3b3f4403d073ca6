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


def test_f64_order_key_total_order_and_zero_tie():
    import numpy as np

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.functions.numeric import (
        f64_order_key,
    )

    rng = np.random.default_rng(5)
    x = np.concatenate(
        [
            rng.normal(0, 1e6, 50_000),
            rng.uniform(-1e-300, 1e-300, 1000),
            [-0.0, 0.0, np.inf, -np.inf, 1e308, -1e308],
        ]
    )
    k = f64_order_key(x)
    o = np.argsort(x, kind="mergesort")
    xs, ks = x[o], k[o]
    assert np.all(np.diff(ks) >= 0)
    assert np.all((np.diff(xs) > 0) == (np.diff(ks) > 0))
    assert f64_order_key(np.array([-0.0]))[0] == f64_order_key(np.array([0.0]))[0]
    import pytest

    with pytest.raises(ValueError):
        f64_order_key(np.array([np.nan]))

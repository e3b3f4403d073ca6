"""_pq_bounds must reproduce the SQL twin's subspace assignment
``sub(dim0) = (dim0 * PQ_M) // d`` for EVERY dim — including dims not
divisible by PQ_M (r5 review: the floor-boundary version diverged for
d % PQ_M != 0; ceil boundaries are correct)."""

import pytest

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_r4a import (
    PQ_M,
    _pq_bounds,
)


@pytest.mark.parametrize("d", [4, 5, 7, 8, 10, 13, 17, 64, 100])
def test_bounds_match_sql_assignment(d):
    bounds = _pq_bounds(d)
    assert bounds[0][0] == 0
    assert bounds[-1][1] == d  # no dropped trailing dims
    # contiguous, non-overlapping
    for m in range(1, PQ_M):
        assert bounds[m][0] == bounds[m - 1][1]
    # exact per-dim agreement with the SQL formula
    covered = []
    for m, (lo, hi) in enumerate(bounds):
        covered.extend([m] * (hi - lo))
    assert covered == [(dim0 * PQ_M) // d for dim0 in range(d)]

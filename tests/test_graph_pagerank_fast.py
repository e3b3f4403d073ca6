"""pagerank_broadcast_ranks must be bit-identical to the cogroup-based
pagerank_constant_outdegree on the same graph (it is the same integer
recurrence — only the data motion differs)."""

import numpy as np
import pyarrow as pa

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.graph import (
    pagerank_broadcast_ranks,
    pagerank_constant_outdegree,
)


def _graph(n=200, k=4, seed=9):
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n, dtype=np.int64), k)
    dst = rng.integers(0, n, size=n * k).astype(np.int64)
    return src, dst


def test_broadcast_matches_cogroup(ray_session):
    import ray.data as rd

    src, dst = _graph()
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
    nodes = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(200, dtype=np.int64))})
    )
    a = (
        pagerank_broadcast_ranks(edges, nodes, k_out=4, iters=3)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    b = (
        pagerank_constant_outdegree(edges, nodes, k_out=4, iters=3,
                                    num_parts=4)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    assert (a["node"].to_numpy() == b["node"].to_numpy()).all()
    assert (a["rank"].to_numpy() == b["rank"].to_numpy()).all()


def test_missing_src_raises(ray_session):
    import pytest
    import ray.data as rd

    edges = rd.from_arrow(
        pa.table({"src": pa.array([0, 7], pa.int64()),
                  "dst": pa.array([1, 1], pa.int64())})
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array([0, 1], pa.int64())}))
    with pytest.raises(Exception):
        pagerank_broadcast_ranks(edges, nodes, k_out=1, iters=1).to_pandas()

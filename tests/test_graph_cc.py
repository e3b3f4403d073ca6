"""Connected-components core: deep chains (pointer-jumping path),
stars, and multi-component graphs, checked against a union-find oracle."""

import numpy as np
import pyarrow as pa
import pytest


def _cc_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _run_cc(ray_session, edges, num_parts=8):
    import ray.data as rd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.graph import (
        connected_components,
    )

    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    pairs = rd.from_arrow(pa.table({"doc_a": a, "doc_b": b}))
    out = connected_components(pairs, num_parts=num_parts).to_pandas()
    return dict(zip(out["node"], out["rep"]))


def test_cc_long_chain(ray_session):
    """A 40-node path: plain propagation would need ~40 rounds, past
    CC_MAX_ROUNDS (30) — only the pointer-jumping path converges. A star,
    a random component, and an isolated pair ride along so ONE Ray run
    covers all shapes (each CC round costs real keyed exchanges, so tests
    are merged rather than paying the round loop per shape)."""
    edges = [(i, i + 1) for i in range(40)]
    edges += [(100, i) for i in range(101, 110)]  # star centered at 100
    edges += [(1000, 2000)]  # isolated pair
    rng = np.random.default_rng(11)
    edges += [
        tuple(sorted(e + 5000))
        for e in rng.integers(0, 60, (50, 2))
        if e[0] != e[1]
    ]
    got = _run_cc(ray_session, edges)
    assert got == _cc_oracle(edges)

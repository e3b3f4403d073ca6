"""Global rank: exactness across many blocks and both sort directions."""

import numpy as np
import pandas as pd
import pyarrow as pa

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.globalorder import (
    with_global_rank,
)


def _rank_check(n, descending, seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 97, size=n)  # heavy ties -> tiebreak by id
    ids = rng.permutation(n)
    ds = rd.from_arrow(
        pa.table({"id": ids.astype(np.int64), "v": vals.astype(np.int64)})
    ).repartition(16)
    out = with_global_rank(
        ds, ["v", "id"], descending=[descending, False]
    ).materialize()
    assert out.num_blocks() > 1, "fixture must exercise the offset scan"
    got = out.to_pandas().sort_values("rnk", ignore_index=True)
    exp = (
        pd.DataFrame({"id": ids, "v": vals})
        .sort_values(["v", "id"], ascending=[not descending, True],
                     ignore_index=True)
    )
    assert (got["rnk"].to_numpy() == np.arange(1, n + 1)).all()
    assert (got["id"].to_numpy() == exp["id"].to_numpy()).all()
    assert (got["v"].to_numpy() == exp["v"].to_numpy()).all()


def test_neighbor_pairs_exact_with_cohashed_buckets(ray_session):
    """num_parts=2 forces many buckets per partition, so rows present as
    both owner and overlap copy in one partition are exercised."""
    import ray.data as rd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.globalorder import (
        neighbor_pairs,
    )

    n, w, b = 5_000, 4, 32
    rng = np.random.default_rng(5)
    ids = rng.permutation(n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"id": ids})).repartition(16)
    ranked = with_global_rank(ds, ["id"], descending=[False])
    pairs = neighbor_pairs(
        ranked, rank_col="rnk", window=w, carry_cols=["id"],
        bucket_size=b, num_parts=2,
    ).to_pandas()
    # expected: ids sorted ascending = 0..n-1; pair (a, a+d) for d<=w
    exp = set()
    for d in range(1, w + 1):
        exp.update(zip(range(0, n - d), range(d, n)))
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert len(pairs) == len(got), "duplicate pairs emitted"
    assert got == exp


def test_neighbor_pairs_window_must_be_below_bucket(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.globalorder import (
        neighbor_pairs,
    )

    ds = rd.from_arrow(pa.table({"id": np.arange(10, dtype=np.int64)}))
    ranked = with_global_rank(ds, ["id"], descending=[False])
    with _pytest.raises(ValueError):
        neighbor_pairs(
            ranked, rank_col="rnk", window=8, carry_cols=["id"], bucket_size=8
        )


def test_global_rank_single_row(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"id": np.array([42], np.int64)}))
    out = with_global_rank(ds, ["id"], descending=[False]).to_pandas()
    assert out["rnk"].tolist() == [1]


def test_global_rank_multiblock_desc(ray_session):
    _rank_check(20_000, True, 3)


def test_global_rank_adversarial_tiny_blocks(ray_session):
    """Stress the two-pass block-bundling assumption with a tiny
    target block size (many small sorted blocks): ranks must stay an
    exact permutation, or the loud boundary-drift guard must fire —
    silent corruption is the only unacceptable outcome."""
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024  # ~16 KiB blocks
        _rank_check(50_000, False, 17)
    finally:
        ctx.target_max_block_size = old


def test_global_rank_multiblock_asc(ray_session):
    _rank_check(20_000, False, 11)


def test_weighted_rank_equals_expanded_rank(ray_session):
    """with_global_rank(weight_col) over a distinct-value/count table
    gives each value exactly the min rank its expanded row population
    would get from the unweighted ranker."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.globalorder import (
        with_global_rank,
    )

    rng = np.random.default_rng(11)
    vals = rng.choice(np.arange(100, dtype=np.int64), size=40, replace=False)
    cnts = rng.integers(1, 9, size=len(vals)).astype(np.int64)
    tbl = pd.DataFrame({"v": vals, "cnt": cnts})
    ds = rd.from_pandas(tbl).repartition(5)
    got = (
        with_global_rank(ds, ["v"], descending=[False], rank_col="r",
                         weight_col="cnt")
        .to_pandas()
        .sort_values("v", ignore_index=True)
    )
    order = np.argsort(vals)
    expect_min_rank = {}
    acc = 0
    for i in order:
        expect_min_rank[vals[i]] = acc + 1
        acc += cnts[i]
    assert got["r"].tolist() == [expect_min_rank[v] for v in got["v"]]

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


def test_global_rank_multiblock_desc(ray_session):
    _rank_check(20_000, True, 3)


def test_global_rank_multiblock_asc(ray_session):
    _rank_check(20_000, False, 11)

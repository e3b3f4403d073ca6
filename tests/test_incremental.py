"""Incremental stream runs: splitting bronze into several ingest windows
and running them through run_stream_incremental must merge to exactly the
gold a single full-history run produces — sessions/turn numbering carried
across runs, lead1_ts repaired on later runs, late arrivals falling back
to per-conversation full recompute."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.incremental import (
    read_gold_incremental,
    run_stream_incremental,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.medallion import (
    run_stream,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.sources.transcripts import (
    generate_transcripts,
)

PROCESSED_AT = "2024-06-01T00:00:00"


def _split_bronze(tbl: pa.Table, tmp, n_splits: int):
    """Split by ingest_ts quantiles (arrival order), mimicking successive
    micro-batch windows; late rows (ingest >> ts) land in later windows."""
    ing = np.asarray(tbl["ingest_ts"].combine_chunks().cast(pa.int64()))
    qs = np.quantile(ing, np.linspace(0, 1, n_splits + 1))
    dirs = []
    for i in range(n_splits):
        lo, hi = qs[i], qs[i + 1]
        mask = (ing >= lo) & (ing <= hi) if i == n_splits - 1 else (ing >= lo) & (ing < hi)
        d = str(tmp / f"bronze_{i}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl.filter(pa.array(mask)), os.path.join(d, "part-0.parquet"))
        dirs.append(d)
    return dirs


def _merged_inc_gold(out_root: str) -> pd.DataFrame:
    t = read_gold_incremental(out_root)
    return t.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _full_gold(bronze_all: str, tmp) -> pd.DataFrame:
    import glob as g

    out = str(tmp / "full_lake")
    run_stream(bronze_all, out, run_id="full", processed_at=PROCESSED_AT, num_parts=4)
    files = sorted(g.glob(os.path.join(out, "gold", "part=*", "dt=*", "data.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return t.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _compare(a: pd.DataFrame, b: pd.DataFrame):
    assert len(a) == len(b)
    assert sorted(a.columns) == sorted(b.columns)
    for c in sorted(a.columns):
        x, y = a[c], b[c]
        if np.issubdtype(x.dtype, np.floating) or np.issubdtype(y.dtype, np.floating):
            assert np.array_equal(
                x.to_numpy(float), y.to_numpy(float), equal_nan=True
            ), c
        else:
            assert (x.astype(str) == y.astype(str)).all(), c


@pytest.mark.parametrize("late_frac", [0.0, 0.08])
def test_incremental_equals_full(ray_session, tmp_path, late_frac):
    tbl = generate_transcripts(
        60, 40, seed=101, dup_frac=0.03, late_frac=late_frac, mean_gap_s=3600.0
    )
    bronze_all = str(tmp_path / "bronze_all")
    os.makedirs(bronze_all, exist_ok=True)
    pq.write_table(tbl, os.path.join(bronze_all, "part-0.parquet"))

    dirs = _split_bronze(tbl, tmp_path, 3)
    out = str(tmp_path / "inc_lake")
    total_late = 0
    for i, d in enumerate(dirs):
        res = run_stream_incremental(
            d, out, run_id=f"r{i}", run_seq=i,
            processed_at=PROCESSED_AT, num_parts=4,
        )
        total_late += res["late_convs"]
    got = _merged_inc_gold(out)
    exp = _full_gold(bronze_all, tmp_path)
    _compare(got, exp)
    if late_frac > 0:
        assert total_late > 0  # the late-fallback path actually ran

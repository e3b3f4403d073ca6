"""S8 — online batch put: validation, quarantine, retry, accounting
(reference feature_store/ingest_features.py:63-98 batch_put_records)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.state import (
    feature_put as FP,
)


def _tbl(n=6):
    return pa.table(
        {
            "conv_id": pa.array([f"conv_{i:04d}" for i in range(n)]),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * 1_000_000, pa.timestamp("us")
            ),
            "event_time": pa.array(np.arange(n, dtype=np.float64)),
            "turns_1h": pa.array(np.arange(n, dtype=np.int64)),
        }
    )


def test_put_all_valid(tmp_path):
    root = str(tmp_path / "online")
    res = FP.put_partition(_tbl(), root, "00000", run_id="r1")
    assert res == {"success": 6, "errors": 0}
    out = pq.read_table(os.path.join(root, "part=00000", "data.parquet"))
    assert out.num_rows == 6
    assert not glob.glob(os.path.join(root, "_errors", "**"), recursive=False)


def test_put_rejects_and_quarantines(tmp_path):
    t = _tbl(6).to_pydict()
    t["conv_id"][1] = None  # missing record identifier
    t["conv_id"][2] = ""  # empty record identifier
    t["ts"][3] = None  # missing timestamp
    t["event_time"][4] = float("nan")  # non-finite event time
    tbl = pa.table(
        {
            "conv_id": pa.array(t["conv_id"], pa.string()),
            "ts": pa.array(t["ts"], pa.timestamp("us")),
            "event_time": pa.array(t["event_time"], pa.float64()),
            "turns_1h": pa.array(t["turns_1h"], pa.int64()),
        }
    )
    root = str(tmp_path / "online")
    res = FP.put_partition(tbl, root, "00007", run_id="r2")
    assert res == {"success": 2, "errors": 4}
    ok = pq.read_table(os.path.join(root, "part=00007", "data.parquet"))
    assert ok["conv_id"].to_pylist() == ["conv_0000", "conv_0005"]
    err = pq.read_table(
        os.path.join(root, "_errors", "part=00007", "run-r2.parquet")
    )
    assert err.num_rows == 4  # every rejected row kept for re-put


def test_put_retries_transient_failure(tmp_path, monkeypatch):
    calls = {"n": 0}
    real = FP._write_table

    def flaky(tbl, path):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("transient")
        real(tbl, path)

    slept = []
    monkeypatch.setattr(FP, "_write_table", flaky)
    root = str(tmp_path / "online")
    res = FP.put_partition(
        _tbl(), root, "00000", run_id="r3", sleep=slept.append
    )
    assert res == {"success": 6, "errors": 0}
    assert calls["n"] == 2 and len(slept) == 1
    assert pq.read_table(os.path.join(root, "part=00000", "data.parquet")).num_rows == 6


def test_put_permanent_failure_counts_batch_as_errors(tmp_path, monkeypatch):
    def always_fail(tbl, path):
        raise OSError("down")

    monkeypatch.setattr(FP, "_write_table", always_fail)
    res = FP.put_partition(
        _tbl(), str(tmp_path / "online"), "00000", max_retries=1, sleep=lambda s: None
    )
    # whole batch becomes errors, mirroring ingest_features.py:92-94
    assert res == {"success": 0, "errors": 6}


@pytest.fixture(scope="module")
def bronze_dir(tmp_path_factory):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.sources.transcripts import (
        generate_transcripts,
        write_bronze,
    )

    d = str(tmp_path_factory.mktemp("bronze"))
    write_bronze(
        generate_transcripts(n_convs=40, avg_turns=10, seed=3, null_frac=0.01),
        d,
        rows_per_file=500,
    )
    return d


def test_run_stream_reports_put_summary(ray_session, bronze_dir, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.medallion import (
        read_online,
        run_stream,
    )

    out = str(tmp_path / "lake")
    res = run_stream(bronze_dir, out, run_id="s8", processed_at="2026-01-01T00:00:00")
    online = read_online(out)
    assert res["online"]["errors"] == 0
    assert res["online"]["success"] == online.num_rows > 0

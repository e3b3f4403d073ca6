"""Lake-maintenance hardening: chained compactions keep snapshots
readable, resume reruns recover a lost gold stage, retention survives
recomputes, bootstrap never wipes live online rows, null-text rows are
counted as rejects, and empty inputs degrade gracefully."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.medallion import (
    bootstrap_lake,
    compact_silver,
    expire_gold_partitions,
    normalize_bronze,
    read_online,
    read_silver_snapshot,
    run_stream,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.sources.transcripts import (
    generate_transcripts,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.state import (
    manifest as M,
)

PROCESSED_AT = "2024-02-01T00:00:00"


def _mklake(tmp_path, n_convs=40, seed=7):
    bronze = tmp_path / "bronze"
    bronze.mkdir()
    tbl = generate_transcripts(n_convs=n_convs, avg_turns=6, seed=seed)
    pq.write_table(tbl, bronze / "bronze.parquet")
    out = str(tmp_path / "lake")
    return str(bronze), out


def test_snapshot_survives_chained_compactions(tmp_path):
    """R1 -> compact C1 -> R2 -> compact C2: the latest snapshot must read
    C2's output only — R1's files were coalesced by C1 (itself coalesced
    by C2), so they stay superseded through the chain instead of being
    re-selected and raising SnapshotUnavailableError."""
    root = str(tmp_path / "silver")
    part = os.path.join(root, "part=00000")
    os.makedirs(part)

    def mk(name):
        p = os.path.join(part, name)
        pq.write_table(pa.table({"x": [1]}), p)
        return p

    r1 = mk("run-r1.parquet")
    M.write_manifest(root, M.PartitionManifest(
        stage="silver", partition_key="00000", run_id="r1", rows_out=1,
        files=[r1], commit_ts=10.0))
    c1 = mk("run-compact-c1.parquet")
    M.write_manifest(root, M.PartitionManifest(
        stage="silver_compact", partition_key="00000", run_id="c1",
        rows_out=1, files=[c1], commit_ts=20.0,
        extra={"source_files": [r1]}))
    os.remove(r1)
    r2 = mk("run-r2.parquet")
    M.write_manifest(root, M.PartitionManifest(
        stage="silver", partition_key="00000", run_id="r2", rows_out=1,
        files=[r2], commit_ts=30.0))
    c2 = mk("run-compact-c2.parquet")
    M.write_manifest(root, M.PartitionManifest(
        stage="silver_compact", partition_key="00000", run_id="c2",
        rows_out=1, files=[c2], commit_ts=40.0,
        extra={"source_files": [c1, r2]}))
    os.remove(c1)
    os.remove(r2)

    got = M.snapshot_files(root, "silver", as_of=100.0)
    assert got == [c2]
    # the mid-chain snapshot's history (C1's output) was GC'd by C2's
    # cleanup — it must fail LOUDLY, not silently return wrong files
    with pytest.raises(M.SnapshotUnavailableError):
        M.snapshot_files(root, "silver", as_of=25.0)


def test_null_text_counted_as_reject():
    batch = pa.table(
        {
            "conv_id": pa.array(["a", "b", "c"]),
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": pa.array(["user"] * 3),
            "text": pa.array(["ok", None, ""], pa.string()),
            "tool": pa.array([None] * 3, pa.string()),
            "ts": pa.array([pd.Timestamp("2024-01-01")] * 3),
            "ingest_ts": pa.array([pd.Timestamp("2024-01-01")] * 3),
        }
    )
    t = normalize_bronze(batch, processed_at=PROCESSED_AT, tag_invalid=True)
    valid = np.asarray(t["__valid"].combine_chunks())
    assert not np.isnan(valid.astype(float)).any()
    assert (valid == 0).sum() == 2  # null text AND empty text both reject
    assert (valid == 1).sum() == 1


def test_resume_recovers_lost_gold_stage(ray_session, tmp_path):
    """Crash window between the silver and gold manifest writes: rerunning
    the same run_id must recompute the partition (skip is keyed on the
    FINAL stage manifest, not silver)."""
    bronze, out = _mklake(tmp_path)
    run_stream(bronze, out, run_id="r1", processed_at=PROCESSED_AT,
               num_parts=2)
    gold_root = os.path.join(out, "gold")
    # simulate the crash: partition 00000's gold output + manifest vanish,
    # silver manifest (written first) survives
    import shutil

    victim_dir = os.path.join(gold_root, "part=00000")
    assert os.path.isdir(victim_dir)
    shutil.rmtree(victim_dir)
    for mf in glob.glob(os.path.join(gold_root, "_manifests",
                                     "gold__00000__r1.json")):
        os.remove(mf)
    run_stream(bronze, out, run_id="r1", processed_at=PROCESSED_AT,
               num_parts=2)
    assert glob.glob(os.path.join(victim_dir, "dt=*", "data.parquet"))


def test_retention_survives_recompute(ray_session, tmp_path):
    bronze, out = _mklake(tmp_path)
    run_stream(bronze, out, run_id="r1", processed_at=PROCESSED_AT,
               num_parts=2)
    dts = sorted(
        {os.path.basename(d)[3:]
         for d in glob.glob(os.path.join(out, "gold", "part=*", "dt=*"))}
    )
    assert len(dts) > 2
    cutoff = dts[len(dts) // 2]
    res = expire_gold_partitions(out, keep_from_dt=cutoff)
    assert res["fragments_removed"] > 0
    # a later stream run recomputes gold from FULL silver history —
    # expired dt= fragments must NOT come back
    run_stream(bronze, out, run_id="r2", processed_at=PROCESSED_AT,
               num_parts=2)
    left = {os.path.basename(d)[3:]
            for d in glob.glob(os.path.join(out, "gold", "part=*", "dt=*"))}
    assert all(dt >= cutoff for dt in left), sorted(left)[:3]


def test_bootstrap_rerun_preserves_online(ray_session, tmp_path):
    bronze, out = _mklake(tmp_path)
    bootstrap_lake(out)
    run_stream(bronze, out, run_id="r1", processed_at=PROCESSED_AT,
               num_parts=2)
    before = read_online(out).num_rows
    assert before > 0
    bootstrap_lake(out)  # idempotent re-run on a POPULATED lake
    assert read_online(out).num_rows == before


def test_read_online_empty_lake_returns_typed_empty(tmp_path):
    t = read_online(str(tmp_path / "nolake"))
    assert t.num_rows == 0 and "conv_id" in t.column_names


def test_backfill_targets_accepts_T_separator(tmp_path):
    root = str(tmp_path / "silver")
    os.makedirs(root)
    M.write_manifest(root, M.PartitionManifest(
        stage="silver", partition_key="00001", run_id="r1", rows_out=1,
        max_ts="2026-01-02 23:59:59"))
    assert M.backfill_targets(root, "silver", "2026-01-02T00:00:00") == {"00001"}
    assert M.backfill_targets(root, "silver", "2026-01-03T00:00:00") == set()


def test_run_daily_empty_dt_range(ray_session, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.daily import (
        run_daily,
    )

    bronze, out = _mklake(tmp_path)
    run_stream(bronze, out, run_id="r1", processed_at=PROCESSED_AT,
               num_parts=2)
    meta = run_daily(out, created_at=PROCESSED_AT, dt_start="2030-01-01")
    assert meta["counts"] == {"train": 0, "validation": 0, "inference": 0}
    assert os.path.exists(os.path.join(out, "datasets", "metadata.json"))

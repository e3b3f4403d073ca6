"""Silver small-file compaction: fewer files, identical lake semantics.

Two ingest-windowed runs leave two run files per silver partition;
compact_silver coalesces each partition to one file. A subsequent full
gold recompute (run 3) must produce bit-identical gold to the
uncompacted twin lake, the crash-window state (compact file written,
sources NOT yet deleted) must also read identically (the consumers'
dedup_first makes duplicates harmless), and re-running compaction must
converge (idempotence).
"""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pytest

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.medallion import (
    compact_silver,
    reconcile_lake,
    run_stream,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.sources.transcripts import (
    generate_transcripts,
)

PROCESSED_AT = "2024-02-01T00:00:00"


@pytest.fixture(scope="module")
def bronze2(tmp_path_factory):
    d = tmp_path_factory.mktemp("bronze2")
    tbl = generate_transcripts(n_convs=120, avg_turns=8, seed=5, dup_frac=0.05,
                               late_frac=0.1)
    import pyarrow.parquet as pq

    pq.write_table(tbl, d / "bronze.parquet")
    return str(d)


def _gold(out_root: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(out_root, "gold", "part=*", "**", "*.parquet"),
                  recursive=True)
    )
    df = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _silver_files(out_root: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(out_root, "silver", "part=*", "run-*.parquet"))
    )


def _two_window_lake(bronze_dir: str, out: str):
    import pyarrow.parquet as pq

    full = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{bronze_dir}/*.parquet"))]
    )
    ing = full["ingest_ts"].to_pandas()
    cut = ing.quantile(0.6)
    run_stream(bronze_dir, out, run_id="w1", processed_at=PROCESSED_AT,
               ingest_window=(ing.min(), cut), num_parts=4)
    run_stream(bronze_dir, out, run_id="w2", processed_at=PROCESSED_AT,
               ingest_window=(cut + pd.Timedelta(microseconds=1), ing.max()),
               num_parts=4)


def test_compaction_preserves_gold_and_shrinks_files(
    ray_session, bronze2, tmp_path
):
    out = str(tmp_path / "lake")
    _two_window_lake(bronze2, out)
    before_files = _silver_files(out)
    assert len(before_files) > 4  # two run files in most partitions
    gold_before = _gold(out)

    assert reconcile_lake(out)["ok"]

    res = compact_silver(out, run_id="c1")
    assert res["compacted"] > 0 and res["files_removed"] > 0
    after_files = _silver_files(out)
    assert len(after_files) < len(before_files)
    assert all("run-compact-c1" in f for f in after_files if "compact" in f)

    # lineage audit stays green: the silver_compact manifests supersede
    # the per-run silver manifests whose files compaction removed, and
    # claim the compact files it wrote
    rec = reconcile_lake(out)
    assert rec["ok"], rec

    # idempotence: each partition now holds a single file (below
    # min_files), so an immediate second compaction is a no-op
    res2 = compact_silver(out, run_id="c2")
    assert res2["compacted"] == 0

    # full recompute from compacted silver -> identical gold (this run
    # itself appends a fresh silver run file per partition)
    run_stream(bronze2, out, run_id="w3", processed_at=PROCESSED_AT, num_parts=4)
    pd.testing.assert_frame_equal(_gold(out), gold_before)

    # compacting the post-w3 lake (compact + w3 file) and recomputing
    # again still converges to the same gold
    res3 = compact_silver(out, run_id="c3")
    assert res3["compacted"] > 0
    run_stream(bronze2, out, run_id="w4", processed_at=PROCESSED_AT, num_parts=4)
    pd.testing.assert_frame_equal(_gold(out), gold_before)

    # repeated compact/append cycles keep the lineage audit green
    rec = reconcile_lake(out)
    assert rec["ok"], rec


def test_compaction_crash_window_reads_identically(ray_session, bronze2, tmp_path):
    """Crash between compact-file rename and source deletes: duplicated
    silver rows must fold away in the gold recompute."""
    out = str(tmp_path / "lake_crash")
    _two_window_lake(bronze2, out)
    gold_before = _gold(out)

    # simulate the crash window: copy sources aside, compact, restore the
    # sources NEXT TO the compact file
    stash = tmp_path / "stash"
    stash.mkdir()
    saved = {}
    for f in _silver_files(out):
        dst = stash / f.replace(os.sep, "__").lstrip("_")
        shutil.copy(f, dst)
        saved[f] = str(dst)

    compact_silver(out, run_id="c1")
    for orig, dst in saved.items():
        shutil.copy(dst, orig)  # sources resurrected beside compact file

    # crash-window lake still reconciles: resurrected sources are claimed
    # by the (superseded) per-run silver manifests, so they are not
    # orphans, and the compact manifests' parity holds
    rec = reconcile_lake(out)
    assert rec["ok"], rec

    run_stream(bronze2, out, run_id="w3", processed_at=PROCESSED_AT, num_parts=4)
    pd.testing.assert_frame_equal(_gold(out), gold_before)

    # converging re-run removes the duplicates again
    compact_silver(out, run_id="c2")
    run_stream(bronze2, out, run_id="w4", processed_at=PROCESSED_AT, num_parts=4)
    pd.testing.assert_frame_equal(_gold(out), gold_before)

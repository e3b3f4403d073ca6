"""Bounded-history gold recompute (VERDICT r3 §next-3).

Three bronze batches land ~10 days apart for the SAME conversations.
``run_stream(bounded_history=True)`` must:
- produce a gold + online lake value-identical to the full-recompute
  baseline (including session continuity and lead1_ts patching across
  the boundary),
- read pre-horizon silver files ONLY with the narrow 4-column
  projection (no text bytes),
- fall back to the exact full recompute when a redelivered key
  conflicts with cold history.
"""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.medallion import (
    RUN_STAGE_GOLD,
    run_stream,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.sources.transcripts import (
    generate_transcripts,
    write_bronze,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.state import (
    fsio as F,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.state import (
    manifest as M,
)

DAY_US = 24 * 3600 * 1_000_000
START = 1_704_067_200_000_000  # 2024-01-01


def _batch(i: int, seed: int) -> pa.Table:
    tbl = generate_transcripts(
        n_convs=30,
        avg_turns=8,
        seed=seed,
        start_us=START + i * 10 * DAY_US,
        mean_gap_s=60.0,
    )
    # same conv ids continue across batches; disambiguate turn_idx ranges
    ti = np.asarray(tbl["turn_idx"].combine_chunks().cast(pa.int32()))
    return tbl.set_column(
        tbl.schema.get_field_index("turn_idx"),
        "turn_idx",
        pa.array(ti + i * 100_000, pa.int32()),
    )


@pytest.fixture(scope="module")
def batches(tmp_path_factory):
    root = tmp_path_factory.mktemp("bhist_bronze")
    dirs = []
    for i in range(3):
        d = str(root / f"batch{i}")
        write_bronze(_batch(i, seed=500 + i), d, rows_per_file=100_000)
        dirs.append(d)
    return dirs


def _run_seq(batches, out_root, bounded):
    for i, b in enumerate(batches):
        run_stream(
            b,
            out_root,
            run_id=f"r{i}",
            processed_at="2024-03-01T00:00:00",
            num_parts=4,
            bounded_history=bounded,
        )


def _read_tree(root, sub):
    files = sorted(glob.glob(os.path.join(root, sub)))
    t = pa.concat_tables([F.read_table(f) for f in files],
                         promote_options="default")
    df = t.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, ignore_index=True)


def test_bounded_equals_full(batches, tmp_path, ray_session):
    full_root = str(tmp_path / "full")
    bounded_root = str(tmp_path / "bounded")
    _run_seq(batches, full_root, bounded=False)

    _run_seq(batches, bounded_root, bounded=True)

    g_full = _read_tree(full_root, "gold/part=*/dt=*/data.parquet")
    g_bounded = _read_tree(bounded_root, "gold/part=*/dt=*/data.parquet")
    pd.testing.assert_frame_equal(g_full, g_bounded)

    o_full = _read_tree(full_root, "online/part=*/data.parquet")
    o_bounded = _read_tree(bounded_root, "online/part=*/data.parquet")
    pd.testing.assert_frame_equal(o_full, o_bounded)

    # the pruned plan actually ran and pruned
    gms = [
        m
        for m in M.load_manifests(os.path.join(bounded_root, "gold"),
                                  RUN_STAGE_GOLD)
        if m.run_id == "r2"
    ]
    assert gms and any(m.extra.get("gold_mode") == "bounded" for m in gms)
    assert any(m.extra.get("cold_files", 0) > 0 for m in gms)
    # some conversation continued across the boundary -> lead patch
    assert sum(m.extra.get("lead_patches", 0) for m in gms) > 0

    # prove the narrow projection: replay the bounded helper in-process
    # (Ray workers are opaque to a monkeypatch) for one pruned partition
    # with a read spy — every pre-horizon file read must carry the
    # 4-column projection, never the full payload
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines import (
        medallion as MD,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.featurize import (
        GoldConfig,
    )

    m_b = next(m for m in gms if m.extra.get("gold_mode") == "bounded"
               and m.extra.get("cold_files", 0) > 0)
    key = m_b.partition_key
    silver_root = os.path.join(bounded_root, "silver")
    sm = next(
        m for m in M.load_manifests(silver_root, "silver")
        if m.run_id == "r2" and m.partition_key == key
    )
    files = sorted(glob.glob(
        os.path.join(silver_root, f"part={key}", "run-*.parquet")))
    reads: list[tuple[str, object]] = []
    orig = F.read_table

    def spy(path, **kw):
        reads.append((path, kw.get("columns")))
        return orig(path, **kw)

    MD.F.read_table = spy
    try:
        res = MD._gold_partition_bounded(
            silver_root,
            os.path.join(bounded_root, "gold"),
            os.path.join(bounded_root, "online"),
            key,
            files,
            GoldConfig(dedup=False),
            "probe",
            pd.Timestamp(sm.min_ts).to_pydatetime(),
        )
    finally:
        MD.F.read_table = orig
    assert res is not None
    r0_reads = [(p, c) for (p, c) in reads if p.endswith("run-r0.parquet")]
    assert r0_reads, "r0 silver history was never consulted"
    assert all(
        c is not None and list(c) == ["conv_id", "turn_idx", "ts", "ingest_ts"]
        for (_p, c) in r0_reads
    ), r0_reads


def test_conflicting_redelivery_falls_back_to_full(batches, tmp_path,
                                                   ray_session):
    # craft a 4th batch that redelivers an old key with an EARLIER ts:
    # the cold dedup winner would flip -> the partition must fall back
    b0 = pa.concat_tables(
        [F.read_table(f) for f in sorted(
            glob.glob(os.path.join(batches[0], "**", "*.parquet"),
                      recursive=True))],
        promote_options="default",
    )
    row = b0.slice(0, 1).to_pandas()
    row["ts"] = row["ts"] - pd.Timedelta(microseconds=1)
    row["ingest_ts"] = row["ingest_ts"] + pd.Timedelta(days=40)
    late = pa.Table.from_pandas(row, schema=b0.schema, preserve_index=False)
    conflict_dir = str(tmp_path / "conflict_bronze")
    write_bronze(late, conflict_dir, rows_per_file=10)

    full_root = str(tmp_path / "full4")
    bounded_root = str(tmp_path / "bounded4")
    seq = list(batches) + [conflict_dir]
    _run_seq(seq, full_root, bounded=False)
    _run_seq(seq, bounded_root, bounded=True)

    g_full = _read_tree(full_root, "gold/part=*/dt=*/data.parquet")
    g_bounded = _read_tree(bounded_root, "gold/part=*/dt=*/data.parquet")
    pd.testing.assert_frame_equal(g_full, g_bounded)

    gms = [
        m
        for m in M.load_manifests(os.path.join(bounded_root, "gold"),
                                  RUN_STAGE_GOLD)
        if m.run_id == "r3"
    ]
    # the conflicted partition took the exact full path; untouched
    # partitions may be bounded-noop (empty slice)
    assert any(m.extra.get("gold_mode") == "full" for m in gms)


def test_bounded_after_compaction_still_exact(batches, tmp_path,
                                              ray_session):
    """compact_silver rewrites run files as run-compact-* (manifested
    under the silver_compact stage, so _split_history_files has no
    silver-stage bounds for them): the bounded plan must treat them as
    HOT (conservative full read) and stay value-identical to the full
    baseline."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.medallion import (
        compact_silver,
    )

    full_root = str(tmp_path / "full_c")
    bounded_root = str(tmp_path / "bounded_c")
    for root, bounded in ((full_root, False), (bounded_root, True)):
        for i, b in enumerate(batches[:2]):
            run_stream(b, root, run_id=f"r{i}",
                       processed_at="2024-03-01T00:00:00", num_parts=4,
                       bounded_history=bounded)
        compact_silver(root, run_id="c1")
        run_stream(batches[2], root, run_id="r2",
                   processed_at="2024-03-01T00:00:00", num_parts=4,
                   bounded_history=bounded)

    g_full = _read_tree(full_root, "gold/part=*/dt=*/data.parquet")
    g_bounded = _read_tree(bounded_root, "gold/part=*/dt=*/data.parquet")
    pd.testing.assert_frame_equal(g_full, g_bounded)

"""Hardening behaviors of the incremental stream path: exact
re-deliveries never duplicate silver, conflicting re-deliveries (same
key, different ts) trigger the late full-recompute and converge to the
dedup contract, equal-ts ties route late, state commits are atomic
pointer swaps with no text payload, and the partition layout is pinned."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.incremental import (
    read_gold_incremental,
    run_stream_incremental,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.medallion import (
    run_stream,
)

PROCESSED_AT = "2024-06-01T00:00:00"


def _bronze(rows, tmp, name):
    d = str(tmp / name)
    os.makedirs(d, exist_ok=True)
    tbl = pa.Table.from_pylist(rows)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("turn_idx"),
        "turn_idx",
        tbl["turn_idx"].cast(pa.int32()),
    )
    pq.write_table(tbl, os.path.join(d, "p.parquet"))
    return d


def _row(conv, turn, ts_min, text="hello world", ing_extra=0):
    base = pd.Timestamp("2024-03-01")
    return {
        "conv_id": conv,
        "turn_idx": turn,
        "role": "user",
        "text": text,
        "tool": None,
        "ts": base + pd.Timedelta(minutes=ts_min),
        "ingest_ts": base + pd.Timedelta(minutes=ts_min + 1 + ing_extra),
    }


def _merged(out):
    return (
        read_gold_incremental(out)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )


def _full_ref(bronze_dirs, tmp, name):
    """One full-history run over the union of the bronze dirs."""
    import pyarrow as pa

    allt = pa.concat_tables(
        [
            pq.read_table(f)
            for d in bronze_dirs
            for f in glob.glob(os.path.join(d, "*.parquet"))
        ]
    )
    d = str(tmp / f"union_{name}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(allt, os.path.join(d, "p.parquet"))
    out = str(tmp / f"fulllake_{name}")
    run_stream(d, out, run_id="full", processed_at=PROCESSED_AT, num_parts=2)
    files = sorted(
        glob.glob(os.path.join(out, "gold", "part=*", "dt=*", "data.parquet"))
    )
    return (
        pa.concat_tables([pq.read_table(f) for f in files])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )


def _compare(a, b):
    assert len(a) == len(b)
    assert sorted(a.columns) == sorted(b.columns)
    for c in sorted(a.columns):
        x, y = a[c], b[c]
        if np.issubdtype(x.dtype, np.floating):
            assert np.array_equal(
                x.to_numpy(float), y.to_numpy(float), equal_nan=True
            ), c
        else:
            assert (x.astype(str) == y.astype(str)).all(), c


def test_exact_redelivery_is_idempotent(ray_session, tmp_path):
    rows = [_row("c1", i, 10 * i) for i in range(4)]
    b0 = _bronze(rows, tmp_path, "b0")
    b1 = _bronze(rows, tmp_path, "b1")  # the same batch, re-delivered
    out = str(tmp_path / "lake")
    run_stream_incremental(b0, out, run_id="r0", run_seq=0,
                           processed_at=PROCESSED_AT, num_parts=2)
    g1 = _merged(out)
    res = run_stream_incremental(b1, out, run_id="r1", run_seq=1,
                                 processed_at=PROCESSED_AT, num_parts=2)
    assert res["new_rows"] == 0 and res["late_convs"] == 0
    # no duplicate silver: run r1 appended nothing
    assert not glob.glob(os.path.join(out, "silver", "part=*",
                                      "run-r1.parquet"))
    silver = pa.concat_tables(
        [pq.read_table(f)
         for f in glob.glob(os.path.join(out, "silver", "part=*",
                                         "run-*.parquet"))]
    )
    assert silver.num_rows == 4  # the lake holds each turn exactly once
    _compare(_merged(out), g1)


def test_conflicting_redelivery_triggers_late_and_dedup_contract(
    ray_session, tmp_path
):
    rows0 = [_row("c1", i, 10 * i) for i in range(4)]
    # turn 2 re-delivered with an EARLIER ts (and different text): the
    # dedup contract (first ts wins) must flip the winner
    conflict = [_row("c1", 2, 15, text="earlier version", ing_extra=500)]
    b0 = _bronze(rows0, tmp_path, "b0")
    b1 = _bronze(conflict, tmp_path, "b1")
    out = str(tmp_path / "lake")
    run_stream_incremental(b0, out, run_id="r0", run_seq=0,
                           processed_at=PROCESSED_AT, num_parts=2)
    res = run_stream_incremental(b1, out, run_id="r1", run_seq=1,
                                 processed_at=PROCESSED_AT, num_parts=2)
    assert res["late_convs"] == 1
    got = _merged(out)
    exp = _full_ref([b0, b1], tmp_path, "conflict")
    _compare(got, exp)
    assert (got[got["turn_idx"] == 2]["text"] == "earlier version").all()


def test_equal_ts_tie_routes_late_and_matches_full(ray_session, tmp_path):
    rows0 = [_row("c1", i, 10 * i) for i in range(3)]
    # new turn with ts EXACTLY equal to the conv's last_ts: the stored
    # final row's RANGE windows must now include this peer
    tie = [_row("c1", 3, 20, text="tie peer", ing_extra=500)]
    b0 = _bronze(rows0, tmp_path, "b0")
    b1 = _bronze(tie, tmp_path, "b1")
    out = str(tmp_path / "lake")
    run_stream_incremental(b0, out, run_id="r0", run_seq=0,
                           processed_at=PROCESSED_AT, num_parts=2)
    res = run_stream_incremental(b1, out, run_id="r1", run_seq=1,
                                 processed_at=PROCESSED_AT, num_parts=2)
    assert res["late_convs"] == 1
    _compare(_merged(out), _full_ref([b0, b1], tmp_path, "tie"))


def test_state_pointer_atomic_and_textless(ray_session, tmp_path):
    rows = [_row("c1", i, 10 * i) for i in range(4)]
    more = [_row("c1", i, 10 * i) for i in range(4, 6)]
    b0 = _bronze(rows, tmp_path, "b0")
    b1 = _bronze(more, tmp_path, "b1")
    out = str(tmp_path / "lake")
    run_stream_incremental(b0, out, run_id="r0", run_seq=0,
                           processed_at=PROCESSED_AT, num_parts=2)
    run_stream_incremental(b1, out, run_id="r1", run_seq=1,
                           processed_at=PROCESSED_AT, num_parts=2)
    dirs = glob.glob(os.path.join(out, "state", "part=*"))
    assert dirs
    saw_tails = False
    for d in dirs:
        ptr = os.path.join(d, "_current.json")
        assert os.path.exists(ptr)
        with open(ptr) as f:
            names = json.load(f)
        # only the committed generation's files remain
        for pat in ("rows-*.parquet", "summary-*.parquet", "tails-*.parquet"):
            for f2 in glob.glob(os.path.join(d, pat)):
                assert os.path.basename(f2) in names.values(), f2
        if names.get("tails"):
            t = pq.read_table(os.path.join(d, names["tails"]))
            saw_tails = True
            # lead1_ts repair state is KEYS only — no feature payload,
            # no text, lives forever without growing with row width
            assert set(t.column_names) == {"conv_id", "turn_idx"}
    assert saw_tails


def test_num_parts_layout_is_pinned(ray_session, tmp_path):
    rows = [_row("c1", i, 10 * i) for i in range(3)]
    b0 = _bronze(rows, tmp_path, "b0")
    out = str(tmp_path / "lake")
    run_stream_incremental(b0, out, run_id="r0", run_seq=0,
                           processed_at=PROCESSED_AT, num_parts=2)
    with pytest.raises(ValueError, match="num_parts"):
        run_stream_incremental(b0, out, run_id="r1", run_seq=1,
                               processed_at=PROCESSED_AT, num_parts=4)

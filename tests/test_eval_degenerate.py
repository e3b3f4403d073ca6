"""Degenerate-corpus parity regressions (review findings r2d): the Ray
side must mirror the DuckDB twin on corpora the fixtures never produce —
singleton/constant windows (Welch), day spans <= 7 (autocorr), all-NULL
metrics (KS), and a one-arm experiment (CUPED)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mk_events(tmp_path, rows):
    d = str(tmp_path)
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["p"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def _compare(qfn, sql, sf_dir):
    got = qfn(sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = con.execute(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols, ignore_index=True)
    b = want[cols].sort_values(cols, ignore_index=True)
    assert len(a) == len(b), (len(a), len(b))
    for c in cols:
        x, y = a[c], b[c]
        if np.issubdtype(x.dtype, np.floating) or np.issubdtype(y.dtype, np.floating):
            assert np.array_equal(
                x.to_numpy(float), y.to_numpy(float), equal_nan=True
            ), c
        else:
            assert (x.astype(str) == y.astype(str)).all(), c


TS_PRE = pd.Timestamp("2024-01-10").value // 1000
TS_POST = pd.Timestamp("2024-01-20").value // 1000


def test_welch_singleton_window_keeps_mean(ray_session, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        EVENTS_WELCH_T_SQL,
        q_events_welch_t,
    )

    rows = [
        (TS_PRE, 1, "view", 5.0),  # singleton reference window
        (TS_POST, 2, "view", 1.0),
        (TS_POST + 1, 3, "view", 2.0),
        (TS_POST + 2, 4, "view", 3.0),
    ]
    d = _mk_events(tmp_path, rows)
    _compare(q_events_welch_t, EVENTS_WELCH_T_SQL, d)
    out = q_events_welch_t(d).to_pandas()
    assert np.isclose(out["mean_ref"][0], 5.0)  # mean survives n=1
    assert pd.isna(out["t_stat"][0]) and pd.isna(out["df"][0])


def test_welch_constant_windows_null_t(ray_session, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        EVENTS_WELCH_T_SQL,
        q_events_welch_t,
    )

    rows = [
        (TS_PRE, 1, "view", 2.0),
        (TS_PRE + 1, 2, "view", 2.0),
        (TS_POST, 3, "view", 7.0),
        (TS_POST + 1, 4, "view", 7.0),
    ]
    d = _mk_events(tmp_path, rows)
    _compare(q_events_welch_t, EVENTS_WELCH_T_SQL, d)
    out = q_events_welch_t(d).to_pandas()
    assert pd.isna(out["t_stat"][0])  # zero pooled SE -> NULL, not inf


def test_autocorr_short_span_emits_no_rows(ray_session, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sequence import (
        EVENTS_AUTOCORR_7D_SQL,
        q_events_autocorr_7d,
    )

    day = 86_400_000_000
    rows = [(TS_PRE + i * day, i, "view", 1.0) for i in range(5)]  # 5-day span
    d = _mk_events(tmp_path, rows)
    _compare(q_events_autocorr_7d, EVENTS_AUTOCORR_7D_SQL, d)
    out = q_events_autocorr_7d(d)
    assert out.num_rows == 0


def test_ks_all_null_values_zero_rows(ray_session, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        EVENTS_KS_DRIFT_SQL,
        q_events_ks_drift,
    )

    rows = [(TS_PRE, 1, "view", None), (TS_POST, 2, "view", None)]
    d = _mk_events(tmp_path, rows)
    _compare(q_events_ks_drift, EVENTS_KS_DRIFT_SQL, d)
    assert q_events_ks_drift(d).num_rows == 0


def test_cuped_single_arm_null_counts(ray_session, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        CUPED_SALT,
        _events_cuped_sql,
        q_events_cuped,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.keyed import (
        splitmix64,
    )

    # find two user ids that both hash to arm 0
    uids = [
        int(u)
        for u in range(1, 200)
        if int(splitmix64(np.array([u], dtype=np.uint64) + np.uint64(CUPED_SALT))[0]
                % np.uint64(2)) == 0
    ][:2]
    rows = [
        (TS_PRE, uids[0], "view", 1.0),
        (TS_POST, uids[0], "view", 2.0),
        (TS_PRE, uids[1], "view", 3.0),
        (TS_POST, uids[1], "view", 4.0),
    ]
    d = _mk_events(tmp_path, rows)
    _compare(q_events_cuped, _events_cuped_sql(), d)
    out = q_events_cuped(d).to_pandas()
    assert pd.isna(out["n_b"][0])  # empty arm is NULL, not 0

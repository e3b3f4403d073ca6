"""Semantic tests (beyond oracle parity) for the trend/window/mode
additions — each checked against an independent pandas/numpy reference:

- events_rolling_median == pandas groupby.rolling(5, min_periods=1).median()
- events_ols_trend slope/intercept == numpy lstsq fit on (day, cents)
- events_mode_by_user == pandas per-user value_counts argmax with the
  documented (count desc, type asc) tie policy
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_rolling_median_matches_pandas(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_temporal import (
        ROLLMED_K,
        q_events_rolling_median,
    )

    out = (
        q_events_rolling_median(SF)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ref = (
        ev.groupby("user_id")["value"]
        .rolling(ROLLMED_K, min_periods=1)
        .median()
        .reset_index(level=0)
    )
    ref["event_id"] = ev["event_id"].to_numpy()
    ref = ref.sort_values("event_id", ignore_index=True)
    assert np.allclose(
        out["med5"].to_numpy(), np.round(ref["value"].to_numpy(), 6), atol=2e-6
    )


def test_ols_trend_matches_lstsq(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_signals import (
        _US_PER_DAY,
        q_events_ols_trend,
    )

    out = q_events_ols_trend(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = (ev["ts"].astype("int64") // _US_PER_DAY).to_numpy(float)
    cents = np.round(ev["value"].to_numpy() * 100.0)
    for et, g in ev.groupby("event_type"):
        m = ev["event_type"] == et
        A = np.stack([day[m], np.ones(m.sum())], axis=1)
        slope, intercept = np.linalg.lstsq(A, cents[m], rcond=None)[0]
        assert np.isclose(out.loc[et, "slope_cents_per_day"], slope, atol=1e-4)
        assert np.isclose(out.loc[et, "intercept_cents"], intercept, rtol=1e-6)
        assert int(out.loc[et, "n"]) == int(m.sum())


def test_mode_by_user_matches_pandas(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_behavior import (
        q_events_mode_by_user,
    )

    out = q_events_mode_by_user(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for uid, g in ev.groupby("user_id"):
        c = g["event_type"].value_counts()
        best_n = int(c.max())
        best_type = min(t for t, n in c.items() if n == best_n)
        assert out.loc[uid, "mode_type"] == best_type
        assert int(out.loc[uid, "n"]) == best_n


def test_twa_matches_trapezoid_reference(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_temporal import (
        q_events_twa,
    )

    out = q_events_twa(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    for uid, g in ev.groupby("user_id"):
        t = g["ts"].astype("int64").to_numpy(float)
        c = np.round(g["value"].to_numpy() * 100.0)
        span = t[-1] - t[0]
        if span <= 0:
            assert pd.isna(out.loc[uid, "twa_cents"])
            continue
        ref = np.trapz(c, t) / span
        assert np.isclose(out.loc[uid, "twa_cents"], ref, rtol=1e-9)
        assert int(out.loc[uid, "n"]) == len(g)


def test_resample_daily_matches_pandas_locf(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_temporal import (
        q_events_resample_daily,
    )

    out = q_events_resample_daily(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(["ts", "event_id"])
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    for uid, g in ev.groupby("user_id"):
        got = out[out.user_id == uid].sort_values("day")
        # contiguous grid covering [first, last] active day
        assert got["day"].tolist() == list(
            range(int(g["day"].min()), int(g["day"].max()) + 1)
        )
        daily_last = g.groupby("day")["value"].last()
        ref = daily_last.reindex(got["day"]).ffill()
        assert np.array_equal(got["value_locf"].to_numpy(), ref.to_numpy())


def test_ols_degenerate_single_day_type_yields_null(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_signals import (
        q_events_ols_trend,
    )

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp("2024-03-01 05:00")] * 2
                + [pd.Timestamp("2024-03-01 09:00")]
            ),
            "user_id": pa.array([0, 0, 0], pa.int64()),
            "event_type": pa.array(["solo"] * 3, pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_ols_trend(str(tmp_path)).to_pandas()
    assert len(out) == 1 and int(out["n"].iloc[0]) == 3
    # all events on one epoch day -> zero variance in x -> NULL fit
    assert pd.isna(out["slope_cents_per_day"].iloc[0])
    assert pd.isna(out["intercept_cents"].iloc[0])


def test_resample_rejects_pre_epoch_timestamps(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_temporal import (
        q_events_resample_daily,
    )

    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([pd.Timestamp("1969-12-31 23:00")]),
            "user_id": pa.array([0], pa.int64()),
            "value": pa.array([1.0], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    with _pytest.raises(Exception, match="pre-epoch"):
        q_events_resample_daily(str(tmp_path)).to_pandas()

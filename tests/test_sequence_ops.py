"""Semantic tests for the sequence operators:

- events_type_trigrams == pandas groupby-shift trigram Counter
- events_autocorr_7d == np.corrcoef of the zero-filled daily series vs
  its 7-day lag, per event type
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_type_trigrams_match_pandas(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sequence import (
        q_events_type_trigrams,
    )

    out = q_events_type_trigrams(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    g = ev.groupby("user_id")["event_type"]
    t1, t2 = g.shift(2), g.shift(1)
    ref = (
        pd.DataFrame({"t1": t1, "t2": t2, "t3": ev["event_type"]})
        .dropna()
        .groupby(["t1", "t2", "t3"])
        .size()
    )
    got = out.set_index(["t1", "t2", "t3"])["n"]
    assert len(got) == len(ref)
    for key, n in ref.items():
        assert int(got.loc[key]) == int(n)
    assert int(out["n"].sum()) == int(ref.sum())


def test_autocorr_7d_matches_numpy(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sequence import (
        q_events_autocorr_7d,
    )

    out = q_events_autocorr_7d(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy()
    d0, d1 = day.min(), day.max()
    nd = int(d1 - d0 + 1)
    for et, g in ev.groupby("event_type"):
        c = np.zeros(nd, dtype=np.int64)
        np.add.at(c, (day[ev["event_type"] == et] - d0).astype(int), 1)
        x, y = c[:-7].astype(float), c[7:].astype(float)
        assert int(out.loc[et, "n_pairs"]) == len(y)
        if x.std() == 0 or y.std() == 0:
            assert pd.isna(out.loc[et, "autocorr_7d"])
        else:
            r = np.corrcoef(x, y)[0, 1]
            assert np.isclose(out.loc[et, "autocorr_7d"], r, atol=2e-6)
            assert -1.0 - 1e-9 <= out.loc[et, "autocorr_7d"] <= 1.0 + 1e-9


def test_ohlc_daily_matches_pandas(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sequence import (
        q_events_ohlc_daily,
    )

    out = (
        q_events_ohlc_daily(SF)
        .to_pandas()
        .set_index(["event_type", "day"])
        .sort_index()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet").dropna(subset=["value"])
    ev = ev.assign(
        day=ev["ts"].astype("int64") // 86_400_000_000,
        c=np.round(ev["value"].to_numpy() * 100).astype(np.int64),
    ).sort_values(["ts", "event_id"])
    ref = ev.groupby(["event_type", "day"])["c"].agg(
        open_c="first", high_c="max", low_c="min", close_c="last"
    )
    assert len(out) == len(ref)
    for g in ref.index:
        for col in ["open_c", "high_c", "low_c", "close_c"]:
            assert int(out.loc[g, col]) == int(ref.loc[g, col]), (g, col)
    # invariant: low <= open, close <= high
    assert (out["low_c"] <= out[["open_c", "close_c"]].min(axis=1)).all()
    assert (out["high_c"] >= out[["open_c", "close_c"]].max(axis=1)).all()


def test_max_drawdown_matches_pandas(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sequence import (
        q_events_max_drawdown,
    )

    out = q_events_max_drawdown(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet").dropna(subset=["value"])
    ev = ev.assign(c=np.round(ev["value"].to_numpy() * 100).astype(np.int64))
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    for uid, g in ev.groupby("user_id"):
        dd = (g["c"].cummax() - g["c"]).max()
        assert int(out.loc[uid, "max_dd_c"]) == int(dd)
        assert int(out.loc[uid, "n"]) == len(g)
    assert len(out) == ev["user_id"].nunique()
    assert (out["max_dd_c"] >= 0).all()

"""Semantic tests for the capped-sessionization and survival operators:

- every capped session spans < CAP_US wall time and never crosses a
  gap-session boundary; ids are dense per conversation
- a brute-force pandas recomputation of capped ids matches exactly
- survival hazard matches a pandas first/last-day reference, and the
  at-risk series is consistent (at_risk >= churned, day-0 at_risk ==
  users active from day 0)
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _transcripts():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    t = pd.DataFrame(
        {
            "conv_id": "conv_" + ev["user_id"].astype(str),
            "ts": ev["ts"],
            "event_id": ev["event_id"],
        }
    )
    return t.sort_values(["conv_id", "ts", "event_id"], ignore_index=True)


def test_sessionize_capped_matches_bruteforce(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray import (
        schema as S,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sessions import (
        CAP_US,
        q_sessionize_capped,
    )

    out = (
        q_sessionize_capped(SF)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    ref = _transcripts()
    us = ref["ts"].astype("int64").to_numpy()
    got_rows = 0
    for conv, g in ref.groupby("conv_id", sort=False):
        t = us[g.index]
        gaps = np.diff(t)
        sid = np.concatenate(([0], np.cumsum(gaps > S.SESSION_GAP_US)))
        # fixed boundaries from each session's first ts
        start = np.zeros(len(t), dtype=np.int64)
        for s in np.unique(sid):
            m = sid == s
            start[m] = t[m][0]
        sub = (t - start) // CAP_US
        key = sid * 10_000 + sub
        _, capped = np.unique(key, return_inverse=True)
        o = out[out["conv_id"] == conv]
        assert (o["session_id"].to_numpy() == sid).all()
        assert (o["capped_session_id"].to_numpy() == capped).all()
        # duration bound: every capped session spans < CAP_US
        for c in np.unique(capped):
            m = capped == c
            assert t[m].max() - t[m].min() < CAP_US
            # never crosses a gap-session boundary
            assert len(np.unique(sid[m])) == 1
        got_rows += len(o)
    assert got_rows == len(out) == len(ref)


def test_survival_hazard_matches_pandas(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sessions import (
        q_events_survival_hazard,
    )

    out = q_events_survival_hazard(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = ev["ts"].dt.floor("D")
    spans = day.groupby(ev["user_id"]).agg(["min", "max"])
    obs = np.sort(day.unique())
    for _, r in out.iterrows():
        d = pd.Timestamp(r["dt"])
        at_risk = ((spans["min"] <= d) & (d <= spans["max"])).sum()
        churned = (spans["max"] == d).sum()
        assert int(r["at_risk"]) == int(at_risk)
        assert int(r["churned"]) == int(churned)
        assert np.isclose(r["hazard"], churned / at_risk, atol=2e-6)
    assert len(out) == len(obs)
    assert (out["at_risk"] >= out["churned"]).all()
    # last observed day: every still-alive user churns by definition
    assert int(out.iloc[-1]["churned"]) == int(
        (spans["max"] == pd.Timestamp(out.iloc[-1]["dt"])).sum()
    )

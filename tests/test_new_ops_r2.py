"""Property tests for the round-2 additions beyond oracle parity:

- nearest as-of == pandas merge_asof(direction='nearest') except on exact
  ties, where our rule (backward wins) is deterministic while pandas
  picks forward — assert equality off-tie and our documented rule on-tie.
- docs_chunk_dedup is invariant to input block boundaries (the pair
  stream's distinctness argument relies on one-doc-per-row, not on
  batching).
- first-touch attribution: every attached touch is within the horizon,
  at-or-before the purchase, and is the EARLIEST eligible one.
- grouped k-fold never splits a user across folds and is stable across
  runs.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_nearest_asof_matches_pandas_merge_asof(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_temporal import (
        q_asof_join_nearest,
    )

    out = q_asof_join_nearest(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    p = (
        ev[ev.event_type == "purchase"]
        .groupby(["user_id", "ts"], as_index=False)
        .agg(n_near=("value", "size"), near_value=("value", "max"))
        .rename(columns={"ts": "near_ts"})
        .sort_values("near_ts")
    )
    left = ev[["event_id", "ts", "user_id", "value"]].sort_values("ts")
    ref = pd.merge_asof(
        left,
        p,
        left_on="ts",
        right_on="near_ts",
        by="user_id",
        direction="nearest",
    )
    m = out.sort_values("event_id", ignore_index=True)
    r = ref.sort_values("event_id", ignore_index=True)
    ts = m["ts"].to_numpy("datetime64[us]").astype(np.int64)
    ours = m["near_ts"].to_numpy("datetime64[us]").astype(np.int64)
    theirs = r["near_ts"].to_numpy("datetime64[us]").astype(np.int64)
    both = (m["near_ts"].notna() & r["near_ts"].notna()).to_numpy()
    assert (m["near_ts"].isna() == r["near_ts"].isna()).all()
    disagree = both & (ours != theirs)
    # any disagreement must be an exact distance tie where we picked the
    # earlier row (pandas picks forward on ties)
    if disagree.any():
        assert ((ts - ours)[disagree] == (theirs - ts)[disagree]).all()
        assert (ours[disagree] < theirs[disagree]).all()
    agree = both & ~disagree
    assert (
        m.loc[agree, "near_value"].to_numpy()
        == r.loc[agree, "near_value"].to_numpy()
    ).all()


def test_chunk_dedup_block_boundary_invariance(ray_session):
    import ray.data as rd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines import (
        queries_curation as QC,
    )

    base = QC.q_docs_chunk_dedup(SF).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )

    # same computation with the read fragmented into many tiny blocks
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ds = rd.from_arrow(tbl).repartition(17)
    import aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_curation as qc

    orig = qc._docs
    try:
        qc._docs = lambda sf_dir, columns: ds
        frag = qc.q_docs_chunk_dedup(SF).to_pandas().sort_values(
            "doc_id", ignore_index=True
        )
    finally:
        qc._docs = orig
    pd.testing.assert_frame_equal(base, frag)


def test_first_touch_is_earliest_in_window(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_signals import (
        _ATTR_HORIZON_US,
        q_events_first_touch,
    )

    out = q_events_first_touch(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    touches = ev[ev.event_type != "purchase"]
    by_user = {u: g["ts"].to_numpy("datetime64[us]").astype(np.int64)
               for u, g in touches.groupby("user_id")}
    h = _ATTR_HORIZON_US
    for row in out.itertuples():
        ts = np.datetime64(row.ts, "us").astype(np.int64)
        tarr = np.sort(by_user.get(row.user_id, np.array([], np.int64)))
        eligible = tarr[(tarr >= ts - h) & (tarr <= ts)]
        if pd.isna(row.first_ts):
            assert len(eligible) == 0
        else:
            ft = np.datetime64(row.first_ts, "us").astype(np.int64)
            assert len(eligible) and ft == eligible[0]


def test_kfold_grouped_and_stable(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_relational import (
        N_FOLDS,
        q_train_kfold,
    )

    a = q_train_kfold(SF).to_pandas()
    b = q_train_kfold(SF).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("event_id", ignore_index=True),
        b.sort_values("event_id", ignore_index=True),
    )
    per_user = a.groupby("user_id")["fold"].nunique()
    assert (per_user == 1).all()
    assert set(a["fold"].unique()) <= set(range(N_FOLDS))


def test_cusum_direct_reference(ray_session, tmp_path):
    """events_cusum vs a plain Python reference: a user whose values jump
    mid-stream accumulates |cusum| past the threshold exactly where the
    scaled-integer recurrence says so."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_signals import (
        CUSUM_H_CENTS,
        q_events_cusum,
    )

    rows = []
    vals = {1: [10.0] * 8 + [2000.0] * 8, 2: [55.0] * 16}
    for uid, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append(
                {
                    "event_id": uid * 1000 + i,
                    "ts": pd.Timestamp("2024-03-01") + pd.Timedelta(seconds=i),
                    "user_id": uid,
                    "value": v,
                }
            )
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))

    got = (
        q_events_cusum(str(tmp_path))
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    cents = {r["event_id"]: round(r["value"] * 100) for r in rows}
    n_tot = len(rows)
    s_tot = sum(cents.values())
    for uid, vs in vals.items():
        run = 0
        for i in range(len(vs)):
            eid = uid * 1000 + i
            run += cents[eid]
            expect = run * n_tot - (i + 1) * s_tot
            row = got[got["event_id"] == eid].iloc[0]
            assert row["cusum_scaled"] == expect, eid
            assert row["is_drift"] == (abs(expect) > CUSUM_H_CENTS * n_tot)
    # the jump user must trip the detector; sanity that flags exist
    assert got[got["user_id"] == 1]["is_drift"].sum() > 0

"""Edge-case tests for the feature-engineering operators on crafted
inputs (cases the sf fixtures don't hit): degenerate groups, tie
handling, word-boundary redaction, gap-equality session semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(dirpath, name, table: pa.Table):
    pq.write_table(table, f"{dirpath}/{name}.parquet")
    return str(dirpath)


@pytest.fixture()
def lake(tmp_path):
    return str(tmp_path)


def test_bucketize_single_value_lang(ray_session, lake):
    """A language whose every doc has the same length: all quartile
    boundaries coincide, so every row lands in bin 0 (x > q is false)."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        q_features_bucketize,
    )

    _write(
        lake,
        "documents",
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "lang": ["xx", "xx", "xx", "yy"],
                "n_chars": pa.array([7, 7, 7, 5], pa.int64()),
            }
        ),
    )
    out = q_features_bucketize(lake).to_pandas().sort_values("doc_id")
    assert list(out["bin"]) == [0, 0, 0, 0]


def test_bucketize_quartiles_exact(ray_session, lake):
    """8 distinct values: quantile_disc boundaries are elements at
    ceil(q*8)-1 = idx 1, 3, 5 -> bins count strict exceedances."""
    vals = [10, 20, 30, 40, 50, 60, 70, 80]
    _write(
        lake,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(8), pa.int64()),
                "lang": ["en"] * 8,
                "n_chars": pa.array(vals, pa.int64()),
            }
        ),
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        q_features_bucketize,
    )

    out = (
        q_features_bucketize(lake).to_pandas().sort_values("doc_id")
    )
    # boundaries: q25=20, q50=40, q75=60
    assert list(out["bin"]) == [0, 0, 1, 1, 2, 2, 3, 3]


def test_target_encode_formula(ray_session, lake):
    """Hand-checked smoothing: seg A has 2 orders 1 positive, seg B has
    1 order 1 positive; global rate = 2/3."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        TARGET_SMOOTH,
        q_features_target_encode,
    )

    _write(
        lake,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_mktsegment": ["A", "B"],
            }
        ),
    )
    _write(
        lake,
        "orders",
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                "o_orderstatus": ["F", "O", "F"],
            }
        ),
    )
    out = (
        q_features_target_encode(lake)
        .to_pandas()
        .set_index("c_custkey")["target_enc"]
    )
    g = 2.0 / 3.0
    assert out[1] == (1.0 + TARGET_SMOOTH * g) / (2.0 + TARGET_SMOOTH)
    assert out[2] == (1.0 + TARGET_SMOOTH * g) / (1.0 + TARGET_SMOOTH)


def test_rank_ties_break_on_orderkey(ray_session, lake):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        q_features_rank,
    )

    _write(
        lake,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12, 20], pa.int64()),
                "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                "o_totalprice": [5.0, 5.0, 9.0, 1.0],
            }
        ),
    )
    out = (
        q_features_rank(lake)
        .to_pandas()
        .set_index("o_orderkey")["rk"]
        .to_dict()
    )
    # cust 1: 12 (9.0) first, then tie 5.0 broken by orderkey asc
    assert out == {12: 1, 10: 2, 11: 3, 20: 1}


def test_onehot_unknown_segment_all_zero(ray_session, lake):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        ONEHOT_SEGMENTS,
        q_features_onehot,
    )

    _write(
        lake,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_mktsegment": ["AUTOMOBILE", "UNSEEN"],
            }
        ),
    )
    out = q_features_onehot(lake).to_pandas().set_index("c_custkey")
    assert out.loc[1, "is_automobile"] == 1
    assert out.loc[2].sum() == 0
    assert out.loc[1].sum() == 1
    assert out.shape[1] == len(ONEHOT_SEGMENTS)


def test_pii_redact_word_boundaries(ray_session, lake):
    """'keys' must survive (\\b boundary); adjacent hits both redacted."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        q_docs_pii_redact,
    )

    _write(
        lake,
        "documents",
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": ["keys key customer", "no hits here"],
            }
        ),
    )
    out = q_docs_pii_redact(lake).to_pandas().set_index("doc_id")
    assert out.loc[0, "text_red"] == "keys [REDACTED] [REDACTED]"
    assert out.loc[0, "n_redactions"] == 2
    assert out.loc[1, "text_red"] == "no hits here"
    assert out.loc[1, "n_redactions"] == 0


def test_session_stats_gap_equality_not_a_break(ray_session, lake):
    """A gap of exactly SESSION_GAP_US stays in-session (break is strict >)
    and singleton sessions report duration 0."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray import (
        schema as S,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries import (
        q_session_stats,
    )

    base = 1_700_000_000_000_000
    gap = S.SESSION_GAP_US
    ts = [base, base + gap, base + gap + gap + 1]
    _write(
        lake,
        "events",
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7], pa.int64()),
                "event_type": ["a", "a", "a"],
                "value": [1.0, 1.0, 1.0],
                "props": ["{}", "{}", "{}"],
            }
        ),
    )
    out = q_session_stats(lake).to_pandas().sort_values("session_id")
    assert len(out) == 2
    first, second = out.iloc[0], out.iloc[1]
    assert first["n_turns"] == 2  # equality gap did not break
    assert first["duration_s"] == gap / 1e6
    assert second["n_turns"] == 1
    assert second["duration_s"] == 0.0


def test_zscore_stats_match_numpy(ray_session, lake):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        q_features_zscore,
    )

    rng = np.random.default_rng(3)
    n = 50
    nc = rng.integers(1, 1000, n)
    _write(
        lake,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": ["en"] * n,
                "n_chars": pa.array(nc, pa.int64()),
            }
        ),
    )
    out = q_features_zscore(lake).to_pandas().sort_values("doc_id")
    x = nc.astype(float)
    expect = (x - x.mean()) / x.std()
    assert np.allclose(out["zscore"].to_numpy(), expect, rtol=1e-12)


def test_anomaly_mad_semantics(ray_session, tmp_path):
    """Hand-built cases: a lone extreme value among stable ones is
    flagged; the stable values are not; a constant-value user (MAD=0)
    flags any nonzero deviation and nothing else."""
    import pandas as pd
    import pyarrow.parquet as pq

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        q_events_anomaly_mad,
    )

    rows = []
    # user 1: tight cluster around 10 plus one wild point
    for i, v in enumerate([9.0, 10.0, 10.0, 11.0, 500.0]):
        rows.append({"event_id": 100 + i, "user_id": 1, "value": v})
    # user 2: all identical -> MAD 0 -> the single deviating point flags
    for i, v in enumerate([7.0, 7.0, 7.0, 7.5]):
        rows.append({"event_id": 200 + i, "user_id": 2, "value": v})
    tbl = pa.Table.from_pylist(rows)
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = (
        q_events_anomaly_mad(str(tmp_path))
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    flags = dict(zip(got["event_id"], got["is_outlier"]))
    assert flags[104] == 1                      # the 500.0 point
    assert all(flags[i] == 0 for i in (100, 101, 102, 103))
    assert flags[203] == 1                      # 7.5 vs MAD=0
    assert all(flags[i] == 0 for i in (200, 201, 202))

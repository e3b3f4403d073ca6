"""Semantic tests (beyond oracle parity) for the retrieval/discretizer/
sketch additions:

- events_ntile: DuckDB tile sizing on a hand-built 7-row group (first
  n % k tiles get one extra row) and exhaustive size-invariants at
  sf0.001 (tile sizes within a type differ by at most 1 and are
  non-increasing with tile id).
- docs_bm25: matches an independent pure-pandas BM25 reference
  computation, and more query-term hits at equal length implies a
  higher score.
- docs_cms_tokens: count-min estimates are exact-or-over, never under
  (the defining CMS guarantee).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_ntile_hand_case_tile_sizes(ray_session, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        q_events_ntile,
    )

    # 7 rows, one type: DuckDB ntile(4) sizes are 2,2,2,1
    t = pa.table(
        {
            "event_id": pa.array(np.arange(7), pa.int64()),
            "event_type": pa.array(["x"] * 7, pa.string()),
            "value": pa.array([5.0, 1.0, 3.0, 2.0, 7.0, 6.0, 4.0], pa.float64()),
            "ts": pa.array([pd.Timestamp("2024-01-01")] * 7),
            "user_id": pa.array(np.zeros(7), pa.int64()),
            "props": pa.array(["{}"] * 7, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_ntile(str(tmp_path)).to_pandas().sort_values("tile")
    assert out["n_rows"].tolist() == [2, 2, 2, 1]
    # tile 1 holds the two smallest values (1.0, 2.0) -> 300 cents
    assert out["sum_cents"].tolist() == [300, 700, 1100, 700]


def test_ntile_size_invariants_sf0001(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_features import (
        NTILE_K,
        q_events_ntile,
    )

    out = q_events_ntile(SF).to_pandas()
    for _, g in out.groupby("event_type"):
        sizes = g.sort_values("tile")["n_rows"].to_numpy()
        assert len(sizes) <= NTILE_K
        assert sizes.max() - sizes.min() <= 1
        assert (np.diff(sizes) <= 0).all()  # big tiles come first
        assert int(g["n_rows"].sum()) == int(sizes.sum())


def test_bm25_matches_pandas_reference(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOP_K,
        q_docs_bm25,
    )

    out = q_docs_bm25(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = docs["text"].str.split(" ")
    n = float(len(docs))
    dl = toks.str.len().astype(float)
    avgdl = float(dl.sum()) / n
    score = np.zeros(len(docs))
    for term in BM25_QUERY:
        tf = toks.apply(lambda ts: sum(1 for x in ts if x == term)).astype(float)
        df = float((tf > 0).sum())
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        score += idf * (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        )
    ref = (
        pd.DataFrame({"doc_id": docs["doc_id"], "score": np.round(score, 6)})
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(BM25_TOP_K)
        .reset_index(drop=True)
    )
    got = out.sort_values("rk").reset_index(drop=True)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert np.allclose(got["score"].to_numpy(), ref["score"].to_numpy(), atol=2e-6)


def test_cms_never_underestimates(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_sketch import (
        CMS_PROBES,
        q_docs_cms_tokens,
    )

    out = q_docs_cms_tokens(SF).to_pandas().set_index("term")["cms_count"]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    exact = (
        docs["text"].str.split(" ").explode().value_counts()
    )
    for term in CMS_PROBES:
        assert int(out[term]) >= int(exact.get(term, 0))


def test_weighted_k_sample_exact_k_and_length_bias(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        WSAMPLE_K,
        q_docs_sample_weighted_k,
    )

    out = q_docs_sample_weighted_k(SF).to_pandas()
    assert len(out) == WSAMPLE_K
    assert out["doc_id"].is_unique
    assert (np.diff(out.sort_values("rk")["key"].to_numpy()) >= 0).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id")
    # ES keys ~ Exp(rate=w): long docs are more likely sampled — with this
    # deterministic seed the sampled mean length exceeds the corpus mean
    assert (
        docs.loc[out["doc_id"], "n_chars"].mean() > docs["n_chars"].mean()
    )


def test_weighted_k_sample_excludes_zero_weight_docs(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        q_docs_sample_weighted_k,
    )

    t = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "text": pa.array(["x"] * 10, pa.string()),
            "lang": pa.array(["en"] * 10, pa.string()),
            "source": pa.array(["s"] * 10, pa.string()),
            "n_chars": pa.array([0, 0, 0] + [50] * 7, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_docs_sample_weighted_k(str(tmp_path)).to_pandas()
    # only the 7 positive-weight docs are eligible
    assert len(out) == 7
    assert not set(out["doc_id"]) & {0, 1, 2}


def test_quality_lr_matches_direct_reference(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_text import (
        LR_B,
        LR_W_AVGLEN,
        LR_W_LOGTOK,
        LR_W_STOP,
        q_docs_quality_score_lr,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.functions.text import (
        STOPWORDS,
    )

    out = (
        q_docs_quality_score_lr(SF)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values(
        "doc_id", ignore_index=True
    )
    toks = docs["text"].str.split(" ")
    nt = toks.str.len().to_numpy(float)
    nc = docs["text"].str.len().to_numpy(float)
    avg = (nc - (nt - 1)) / nt
    stop = toks.apply(lambda ts: sum(1 for x in ts if x in STOPWORDS)).to_numpy(
        float
    )
    z = LR_B + LR_W_LOGTOK * np.log(1.0 + nt) + LR_W_AVGLEN * avg + LR_W_STOP * (
        stop / nt
    )
    ref = np.round(1.0 / (1.0 + np.exp(-z)), 6)
    assert np.allclose(out["q_score"].to_numpy(), ref, atol=2e-6)
    # both classes occur and the flag thresholds the rounded score
    assert set(out["keep"]) == {0, 1}
    assert np.array_equal(
        out["keep"].to_numpy(), (out["q_score"].to_numpy() >= 0.5).astype(int)
    )

"""Semantic tests (beyond oracle parity) for the evaluation-statistics
operators, each checked against an independent scipy-free reference:

- events_ks_drift == brute-force KS over np.searchsorted CDFs
- events_welch_t == textbook Welch t / Welch-Satterthwaite df from
  pandas mean/var on the raw (un-bucketed) cents
- docs_lr_auc == pandas rank-based Mann-Whitney AUC with average ranks
- events_mi_type_dow: per-cell pmi == log of crosstab ratios, and the
  count-weighted pmi sum (the MI) is non-negative
- events_target_encode_loo == pandas transform((sum - x) / (n - 1))
"""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _cents(v):
    return np.round(np.asarray(v, dtype=np.float64) * 100.0).astype(np.int64)


SPLIT = pd.Timestamp("2024-01-16")


def test_ks_drift_matches_bruteforce(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        q_events_ks_drift,
    )

    out = q_events_ks_drift(SF).to_pandas()
    ev = _events().dropna(subset=["value"])
    ref = _cents(ev.loc[ev["ts"] < SPLIT, "value"])
    cur = _cents(ev.loc[ev["ts"] >= SPLIT, "value"])
    grid = np.unique(np.concatenate([ref, cur]))
    f1 = np.searchsorted(np.sort(ref), grid, side="right") / ref.size
    f2 = np.searchsorted(np.sort(cur), grid, side="right") / cur.size
    ks = np.abs(f1 - f2).max()
    assert int(out["n_ref"][0]) == ref.size
    assert int(out["n_cur"][0]) == cur.size
    assert np.isclose(out["ks"][0], ks, atol=2e-6)


def test_welch_t_matches_textbook(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        q_events_welch_t,
    )

    out = q_events_welch_t(SF).to_pandas()
    ev = _events().dropna(subset=["value"])
    a = _cents(ev.loc[ev["ts"] < SPLIT, "value"]).astype(float)
    b = _cents(ev.loc[ev["ts"] >= SPLIT, "value"]).astype(float)
    se1 = a.var(ddof=1) / a.size
    se2 = b.var(ddof=1) / b.size
    t = (a.mean() - b.mean()) / np.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1**2 / (a.size - 1) + se2**2 / (b.size - 1))
    assert np.isclose(out["t_stat"][0], t, atol=1e-5)
    assert np.isclose(out["df"][0], df, rtol=1e-6)
    assert np.isclose(out["mean_ref"][0], a.mean() / 100.0, atol=2e-6)
    assert np.isclose(out["mean_cur"][0], b.mean() / 100.0, atol=2e-6)


def test_lr_auc_matches_rank_formula(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        q_docs_lr_auc,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_text import (
        q_docs_quality_score_lr,
    )

    out = q_docs_lr_auc(SF).to_pandas()
    scores = q_docs_quality_score_lr(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "lang"]]
    j = scores.merge(docs, on="doc_id")
    y = (j["lang"] == "en").to_numpy()
    s = j["q_score"].to_numpy()
    # Mann-Whitney with average ranks: AUC = (R_pos - P(P+1)/2) / (P*N)
    ranks = pd.Series(s).rank(method="average").to_numpy()
    P, N = int(y.sum()), int((~y).sum())
    auc = (ranks[y].sum() - P * (P + 1) / 2) / (P * N)
    assert int(out["n_pos"][0]) == P and int(out["n_neg"][0]) == N
    assert np.isclose(out["auc"][0], auc, atol=2e-6)


def test_mi_type_dow_matches_crosstab(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        q_events_mi_type_dow,
    )

    out = q_events_mi_type_dow(SF).to_pandas()
    ev = _events()
    # DuckDB dayofweek: 0 = Sunday; pandas dayofweek: 0 = Monday
    dow = (ev["ts"].dt.dayofweek + 1) % 7
    ct = pd.crosstab(ev["event_type"], dow)
    N = ct.to_numpy().sum()
    for _, r in out.iterrows():
        n = ct.loc[r["event_type"], int(r["dow"])]
        nx = ct.loc[r["event_type"]].sum()
        ny = ct[int(r["dow"])].sum()
        assert int(r["n"]) == int(n)
        assert np.isclose(r["pmi"], np.log(n * N / (nx * ny)), atol=2e-6)
    # count-weighted mean pmi is the mutual information — always >= 0
    mi = (out["n"] * out["pmi"]).sum() / out["n"].sum()
    assert mi >= -1e-12
    assert len(out) == (ct.to_numpy() > 0).sum()


def test_target_encode_loo_matches_pandas(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        q_events_target_encode_loo,
    )

    out = (
        q_events_target_encode_loo(SF)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    ev = _events().dropna(subset=["value"]).sort_values("event_id", ignore_index=True)
    c = _cents(ev["value"])
    g = pd.DataFrame({"t": ev["event_type"], "c": c}).groupby("t")["c"]
    s = g.transform("sum").to_numpy()
    n = g.transform("size").to_numpy()
    ref = np.where(n > 1, (s - c) / (100.0 * np.maximum(n - 1, 1)), np.nan)
    assert len(out) == len(ev)
    assert (out["event_id"].to_numpy() == ev["event_id"].to_numpy()).all()
    got = out["enc"].to_numpy(float)
    assert np.allclose(got[n > 1], ref[n > 1], atol=2e-6)
    assert np.isnan(got[n == 1]).all()


def test_loo_encode_is_leakage_free(ray_session):
    """The defining property: a row's own target must not influence its
    encode — perturbing one row's value changes THAT row's encode only
    through the other rows' statistics, i.e. enc_i is independent of
    v_i given the rest. Verified directly: enc_i == mean(others)."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        q_events_target_encode_loo,
    )

    out = q_events_target_encode_loo(SF).to_pandas()
    ev = _events().dropna(subset=["value"])
    j = out.merge(ev[["event_id", "value"]], on="event_id")
    c = _cents(j["value"])
    for et, grp in j.groupby("event_type"):
        if len(grp) < 2:
            continue
        idx = grp.index[0]
        others = c[grp.index[grp.index != idx]].astype(float)
        assert np.isclose(
            j.loc[idx, "enc"], others.mean() / 100.0, atol=2e-6
        )


def test_lr_calibration_matches_pandas(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        q_docs_lr_calibration,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_text import (
        q_docs_quality_score_lr,
    )

    out = q_docs_lr_calibration(SF).to_pandas().set_index("bin")
    scores = q_docs_quality_score_lr(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "lang"]]
    j = scores.merge(docs, on="doc_id")
    j["bin"] = np.minimum((j["q_score"] * 10).astype(int), 9)
    for b, g in j.groupby("bin"):
        assert int(out.loc[b, "n"]) == len(g)
        assert np.isclose(out.loc[b, "mean_score"], g["q_score"].mean(), atol=2e-6)
        assert np.isclose(
            out.loc[b, "pos_rate"], (g["lang"] == "en").mean(), atol=2e-6
        )
    assert out["n"].sum() == len(j)


def test_pareto_front_matches_bruteforce(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        q_docs_pareto_front,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_text import (
        q_docs_quality_score_lr,
    )

    out = q_docs_pareto_front(SF).to_pandas()
    scores = q_docs_quality_score_lr(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "n_chars"]]
    j = scores.merge(docs, on="doc_id")
    x = j["n_chars"].to_numpy()
    y = np.round(j["q_score"].to_numpy() * 1e6).astype(np.int64)
    front = []
    for i in range(len(j)):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        if not dom.any():
            front.append(int(j["doc_id"].iloc[i]))
    assert sorted(out["doc_id"]) == sorted(front)
    # front must be non-empty and an antichain: sorted by x asc -> y strictly desc
    f = out.sort_values(["n_chars", "q_score_micro"])
    assert len(f) >= 1
    xs = f["n_chars"].to_numpy()
    ys = f["q_score_micro"].to_numpy()
    strict_x = np.diff(xs) > 0
    assert (np.diff(ys)[strict_x] < 0).all()


def test_sample_k_per_lang_exact_k_and_uniform(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        KPG_K,
        KPG_SALT,
        q_docs_sample_k_per_lang,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.keyed import (
        splitmix64,
    )

    out = q_docs_sample_k_per_lang(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "lang"]]
    sizes = docs.groupby("lang").size()
    got = out.groupby("lang").size()
    for lang, n in sizes.items():
        assert got.get(lang, 0) == min(KPG_K, n)
    # reference: bottom-k by the same hash per lang
    hk = splitmix64(docs["doc_id"].to_numpy().astype(np.uint64) + np.uint64(KPG_SALT))
    docs = docs.assign(hk=hk)
    for lang, g in docs.groupby("lang"):
        want = set(g.nsmallest(KPG_K, "hk")["doc_id"])
        have = set(out.loc[out["lang"] == lang, "doc_id"])
        assert have == want


def test_cuped_matches_numpy_reference(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        CUPED_SALT,
        q_events_cuped,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.keyed import (
        splitmix64,
    )

    out = q_events_cuped(SF).to_pandas()
    ev = _events().dropna(subset=["value"])
    c = _cents(ev["value"])
    pre = (ev["ts"] < SPLIT).to_numpy()
    pu = (
        pd.DataFrame(
            {
                "u": ev["user_id"].to_numpy(),
                "x": np.where(pre, c, 0),
                "y": np.where(pre, 0, c),
            }
        )
        .groupby("u")
        .sum()
    )
    arm = (
        splitmix64(pu.index.to_numpy().astype(np.uint64) + np.uint64(CUPED_SALT))
        % np.uint64(2)
    ).astype(int)
    x = pu["x"].to_numpy(float) / 100.0
    y = pu["y"].to_numpy(float) / 100.0
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    adj = y - theta * (x - x.mean())
    raw = y[arm == 1].mean() - y[arm == 0].mean()
    cuped = adj[arm == 1].mean() - adj[arm == 0].mean()
    assert int(out["n_a"][0]) == int((arm == 0).sum())
    assert int(out["n_b"][0]) == int((arm == 1).sum())
    assert np.isclose(out["theta"][0], theta, atol=5.1e-7)  # round6 grain
    assert np.isclose(out["uplift_raw"][0], raw, atol=1e-4)
    assert np.isclose(out["uplift_cuped"][0], cuped, atol=1e-4)
    # the CUPED adjustment must reduce per-user metric variance
    assert adj.var() <= y.var() + 1e-12


def test_srm_counts_match_distinct_users(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_eval import (
        CUPED_SALT,
        q_events_srm_check,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.keyed import (
        splitmix64,
    )

    out = q_events_srm_check(SF).to_pandas()
    ev = _events()
    users = np.unique(ev["user_id"].to_numpy())
    arm = (
        splitmix64(users.astype(np.uint64) + np.uint64(CUPED_SALT)) % np.uint64(2)
    ).astype(int)
    na, nb = int((arm == 0).sum()), int((arm == 1).sum())
    assert int(out["n_a"][0]) == na and int(out["n_b"][0]) == nb
    chi2 = (na - nb) ** 2 / (na + nb)
    assert np.isclose(out["chi2"][0], chi2, atol=5.1e-7)
    assert int(out["srm_flag"][0]) == int(chi2 > 3.841459)

"""Semantic tests for the BPE merge-step and band-join additions — each
checked against a brute-force Python/pandas reference."""

from collections import Counter

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_bpe_merge_matches_counter_reference(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_curation import (
        BPE_TOP_K,
        q_docs_bpe_merge,
    )

    out = q_docs_bpe_merge(SF).to_pandas().sort_values("rk", ignore_index=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    c = Counter()
    for text in docs["text"]:
        for w in text.split(" "):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    ref = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]
    assert list(zip(out["pair"], out["n"])) == ref
    assert out["rk"].tolist() == list(range(1, len(ref) + 1))


def test_band_join_matches_bruteforce(ray_session):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_relational import (
        BAND_CENTS,
        q_events_band_join,
    )

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.functions.numeric import (
        round_half_away,
    )

    out = q_events_band_join(SF).to_pandas().set_index("event_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["cents"] = round_half_away(ev["value"].to_numpy() * 100.0).astype(
        np.int64
    )
    p = ev[ev.event_type == "purchase"]
    clicks = ev[ev.event_type == "click"].groupby("user_id")["cents"].apply(list)
    assert len(out) == len(p)
    for _, r in p.iterrows():
        cs = clicks.get(r["user_id"], [])
        n = sum(1 for c in cs if abs(int(r["cents"]) - int(c)) <= BAND_CENTS)
        assert int(out.loc[r["event_id"], "n_close"]) == n

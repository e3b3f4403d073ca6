"""LSH similarity search: exact at full probe radius, useful recall at
partial radius, deterministic hyperplanes, correct Hamming probe ball."""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.ann import (
    _lsh_codes,
    knn_bruteforce,
    knn_lsh,
    lsh_hyperplanes,
)

SF = "/root/testdata/sf0.001"


def _emb_ds():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


def _queries(n=8):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    return t.filter(pc.less(t["vec_id"], n))


def test_full_radius_equals_bruteforce(ray_session):
    q = _queries()
    brute = knn_bruteforce(_emb_ds(), q, k=5).to_pandas()
    lsh = knn_lsh(_emb_ds(), q, k=5, n_bits=6, probe_radius=6).to_pandas()
    key = ["q_id", "rank"]
    assert brute.sort_values(key, ignore_index=True).equals(
        lsh.sort_values(key, ignore_index=True)
    )


def test_partial_radius_recall(ray_session):
    q = _queries(16)
    brute = knn_bruteforce(_emb_ds(), q, k=5).to_pandas()
    lsh = knn_lsh(_emb_ds(), q, k=5, n_bits=6, probe_radius=2).to_pandas()
    truth = set(zip(brute["q_id"], brute["vec_id"]))
    got = set(zip(lsh["q_id"], lsh["vec_id"]))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, recall


def test_hyperplanes_deterministic_and_codes_bounded():
    a = lsh_hyperplanes(64, 6, seed=42)
    b = lsh_hyperplanes(64, 6, seed=42)
    assert np.array_equal(a, b)
    m = np.random.default_rng(0).standard_normal((100, 64))
    codes = _lsh_codes(m, a)
    assert codes.min() >= 0 and codes.max() < 64
    # antipodal vectors land in complementary buckets
    assert np.array_equal(_lsh_codes(-m, a), 63 - codes)

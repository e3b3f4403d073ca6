"""IVF similarity search: exact at full probe, useful recall at partial
probe, deterministic across runs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.ann import (
    kmeans_cosine,
    knn_bruteforce,
    knn_ivf,
)

SF = "/root/testdata/sf0.001"


def _emb_ds():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


def _tbl():
    return pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


def _queries(n=8):
    t = _tbl()
    return t.filter(pc.less(t["vec_id"], n))


def test_full_probe_equals_bruteforce(ray_session):
    q = _queries()
    brute = knn_bruteforce(_emb_ds(), q, k=5).to_pandas()
    ivf = knn_ivf(_emb_ds(), q, _tbl(), k=5, n_lists=8, n_probe=8).to_pandas()
    key = ["q_id", "rank"]
    brute = brute.sort_values(key, ignore_index=True)
    ivf = ivf.sort_values(key, ignore_index=True)
    assert brute.equals(ivf)


def test_partial_probe_recall(ray_session):
    q = _queries(16)
    brute = knn_bruteforce(_emb_ds(), q, k=5).to_pandas()
    ivf = knn_ivf(_emb_ds(), q, _tbl(), k=5, n_lists=8, n_probe=3).to_pandas()
    truth = set(zip(brute["q_id"], brute["vec_id"]))
    got = set(zip(ivf["q_id"], ivf["vec_id"]))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, recall  # partial probe keeps useful recall


def test_kmeans_deterministic():
    m = np.asarray(_tbl()["embedding"].combine_chunks().flatten(), dtype=np.float64)
    m = m.reshape(len(_tbl()), -1)
    a = kmeans_cosine(m, 8, seed=42)
    b = kmeans_cosine(m, 8, seed=42)
    assert np.array_equal(a, b)
    assert a.shape[0] == 8
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def _clustered_vectors(n_clusters=6, per=40, dim=16, seed=3):
    """Tight clusters on the sphere: IVF pruning should drop most
    cross-cluster bucket pairs."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(
        size=(n_clusters * per, dim)
    )
    return vecs


def _neardup_fixture(tmp_path, vecs):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }
    )
    p = str(tmp_path / "emb.parquet")
    pq.write_table(t, p)
    return rd.read_parquet(p), t


def test_neardup_ivf_exact_vs_bruteforce(ray_session, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.ann import (
        embedding_near_dup_ivf,
    )

    vecs = _clustered_vectors()
    ds, t = _neardup_fixture(tmp_path, vecs)
    thr = 0.8
    got = (
        embedding_near_dup_ivf(ds, t, threshold=thr, n_lists=6)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"], ignore_index=True)
    )
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    r, c = np.nonzero(np.triu(sims >= thr, k=1))
    assert len(got) == len(r)
    assert (got["vec_a"].to_numpy() == r).all()
    assert (got["vec_b"].to_numpy() == c).all()
    assert np.allclose(got["cos_sim"], np.round(sims[r, c], 6))


def test_neardup_ivf_prunes_bucket_pairs(ray_session, tmp_path):
    """On tight clusters with a high threshold, the admissible list-pair
    set must be far smaller than all n_lists^2/2 pairs — i.e. the pruning
    path is actually exercised, not a degenerate all-pairs join."""
    import ray
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.ann import (
        _RadiusPartials,
        kmeans_cosine,
        _matrix,
        _normalize,
    )

    vecs = _clustered_vectors(seed=11)
    n_lists = 6
    cent = kmeans_cosine(vecs, n_lists)
    m = _normalize(vecs.astype(np.float64))
    sims = m @ cent.T
    lists = np.argmax(sims, axis=1)
    best = sims[np.arange(len(m)), lists]
    radius = np.full(n_lists, -np.inf)
    for l in range(n_lists):
        sel = best[lists == l]
        if len(sel):
            radius[l] = np.arccos(np.clip(sel.min(), -1, 1))
    theta = np.arccos(0.9)
    cang = np.arccos(np.clip(cent @ cent.T, -1, 1))
    i, j = np.triu_indices(n_lists)
    ok = cang[i, j] <= theta + radius[i] + radius[j]
    assert ok.sum() <= len(i) / 2, (ok.sum(), len(i))


def test_jl_projection_preserves_distances(ray_session):
    """Property: the seeded JL sign projection approximately preserves
    pairwise squared distances (Achlioptas bound) — median relative
    distortion over sampled pairs stays well under 1."""
    import numpy as np
    import pyarrow.parquet as pq

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_ann import (
        _JL_K,
        q_embedding_random_projection,
    )

    sf = "/root/testdata/sf0.001"
    proj = q_embedding_random_projection(sf).to_pandas().sort_values("vec_id")
    p = proj[[f"proj_{j}" for j in range(_JL_K)]].to_numpy()
    t = pq.read_table(f"{sf}/embeddings.parquet")
    order = np.argsort(np.asarray(t["vec_id"]))
    x = np.asarray(t["embedding"].combine_chunks().values, np.float64).reshape(
        len(order), -1
    )[order]
    rng = np.random.default_rng(0)
    i = rng.integers(0, len(x), 300)
    j = rng.integers(0, len(x), 300)
    keep = i != j
    i, j = i[keep], j[keep]
    d_orig = ((x[i] - x[j]) ** 2).sum(axis=1)
    d_proj = ((p[i] - p[j]) ** 2).sum(axis=1)
    rel = np.abs(d_proj - d_orig) / d_orig
    assert np.median(rel) < 0.5
    assert (rel < 1.0).mean() > 0.9

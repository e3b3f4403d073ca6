"""Similarity search over an embedding column (list<float>).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one numpy matmul and
  emits only its local top-k candidates, a final tiny groupby keeps the
  global top-k. Scale path: per-batch candidate pruning means the
  shuffle moves O(n_queries * k * n_blocks) rows, never the full table.
- :func:`embedding_near_dup_pairs` — all pairs with cosine >= threshold:
  blocked matmul of each batch against the broadcast (normalized) matrix.
  An IVF/LSH-bucketed variant for >memory corpora would bucket by a
  coarse quantizer first; the bucket groupby reuses stages/keyed.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(tbl: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = tbl[col].combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _TopKScorer:
    def __init__(self, q_ref, k: int):
        import ray

        q = ray.get(q_ref) if not isinstance(q_ref, tuple) else q_ref
        self.q_ids, self.q_mat = q  # (ids, normalized matrix)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))
        ids = np.asarray(batch["vec_id"].combine_chunks())
        sims = self.q_mat @ m.T  # (n_q, n_batch)
        # exclude self-matches
        self_mask = ids[None, :] == self.q_ids[:, None]
        sims[self_mask] = -np.inf
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = np.repeat(self.q_ids, k)
        cols = ids[part.reshape(-1)]
        vals = np.take_along_axis(sims, part, axis=1).reshape(-1)
        keep = np.isfinite(vals)
        return pa.table(
            {
                "q_id": pa.array(rows[keep]),
                "vec_id": pa.array(cols[keep]),
                "sim": pa.array(vals[keep]),
            }
        )


def knn_bruteforce(ds, query_tbl: pa.Table, k: int = 3, concurrency=2):
    """Exact cosine top-k of every query vector over the dataset."""
    import ray

    q_ids = np.asarray(query_tbl["vec_id"].combine_chunks())
    q_mat = _normalize(_matrix(query_tbl))
    q_ref = ray.put((q_ids, q_mat))

    cand = ds.map_batches(
        _TopKScorer,
        fn_constructor_args=(q_ref, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )

    def final_topk(g: pa.Table) -> pa.Table:
        sims = np.asarray(g["sim"].combine_chunks())
        vids = np.asarray(g["vec_id"].combine_chunks())
        order = np.lexsort((vids, -sims))[:k]  # ties: lower vec_id first
        out = g.take(pa.array(order))
        rank = pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        out = out.append_column("rank", rank)
        sims_r = np.round(np.asarray(out["sim"].combine_chunks()), 6)
        return out.set_column(
            out.schema.get_field_index("sim"), "sim", pa.array(sims_r)
        )

    return cand.groupby("q_id").map_groups(final_topk, batch_format="pyarrow")


class _NearDupScorer:
    def __init__(self, m_ref, threshold: float):
        import ray

        self.all_ids, self.all_mat = ray.get(m_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))
        ids = np.asarray(batch["vec_id"].combine_chunks())
        sims = m @ self.all_mat.T  # (n_batch, n_all)
        hit_r, hit_c = np.nonzero(sims >= self.threshold)
        a = ids[hit_r]
        b = self.all_ids[hit_c]
        keep = a < b  # each pair once, no self-pairs
        return pa.table(
            {
                "vec_a": pa.array(a[keep]),
                "vec_b": pa.array(b[keep]),
                "cos_sim": pa.array(np.round(sims[hit_r, hit_c][keep], 6)),
            }
        )


def embedding_near_dup_pairs(ds, all_tbl: pa.Table, threshold: float, concurrency=2):
    """All (a < b) pairs with cosine similarity >= threshold."""
    import ray

    all_ids = np.asarray(all_tbl["vec_id"].combine_chunks())
    m_ref = ray.put((all_ids, _normalize(_matrix(all_tbl))))
    return ds.map_batches(
        _NearDupScorer,
        fn_constructor_args=(m_ref, threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# IVF — the scale path: coarse-quantize the corpus into n_lists buckets,
# probe only the n_probe closest lists per query. With n_probe == n_lists
# the result is exactly brute force (used for the oracle-backed query);
# partial probing trades recall for a ~n_lists/n_probe matmul reduction
# (recall measured in tests). Centroids are trained once driver-side on a
# bounded sample and broadcast via ray.put; list assignment happens
# per-batch inside the actor (never a second shuffle).
# ---------------------------------------------------------------------------

def kmeans_cosine(sample: np.ndarray, n_lists: int, iters: int = 12,
                  seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on a normalized sample (driver-side;
    sample is bounded, e.g. <= 64k rows). Returns normalized centroids."""
    rng = np.random.default_rng(seed)
    m = _normalize(sample.astype(np.float64))
    n_lists = min(n_lists, len(m))
    cent = m[rng.choice(len(m), n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for j in range(n_lists):
            sel = m[assign == j]
            if len(sel):
                cent[j] = sel.sum(axis=0)
        cent = _normalize(cent)
    return cent


class _IvfScorer:
    """Per-batch IVF probe: assign batch rows to their centroid list, then
    score each query only against rows of its probed lists. The loop is
    over <= n_lists centroid buckets (a small constant), every inner step
    is a numpy matmul."""

    def __init__(self, state_ref, k: int):
        import ray

        self.q_ids, self.q_mat, self.centroids, self.q_probe = ray.get(state_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))
        ids = np.asarray(batch["vec_id"].combine_chunks())
        lists = np.argmax(m @ self.centroids.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for l in np.unique(lists):
            probing = np.flatnonzero(self.q_probe[:, l])
            members = np.flatnonzero(lists == l)
            if not len(probing) or not len(members):
                continue
            sims = self.q_mat[probing] @ m[members].T
            self_mask = ids[members][None, :] == self.q_ids[probing][:, None]
            sims[self_mask] = -np.inf
            k = min(self.k, sims.shape[1])
            part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            out_q.append(np.repeat(self.q_ids[probing], k))
            out_v.append(ids[members][part.reshape(-1)])
            out_s.append(np.take_along_axis(sims, part, axis=1).reshape(-1))
        if not out_q:
            return pa.table(
                {"q_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        q = np.concatenate(out_q)
        v = np.concatenate(out_v)
        s = np.concatenate(out_s)
        keep = np.isfinite(s)
        return pa.table(
            {"q_id": pa.array(q[keep]), "vec_id": pa.array(v[keep]),
             "sim": pa.array(s[keep])}
        )


def knn_ivf(
    ds,
    query_tbl: pa.Table,
    sample_tbl: pa.Table,
    k: int = 3,
    *,
    n_lists: int = 16,
    n_probe: int = 4,
    concurrency=2,
    seed: int = 42,
):
    """Approximate cosine top-k via IVF. ``sample_tbl`` trains the coarse
    quantizer (bounded driver-side sample). Exact when n_probe >= n_lists."""
    import ray

    centroids = kmeans_cosine(_matrix(sample_tbl), n_lists, seed=seed)
    n_lists = len(centroids)
    n_probe = min(n_probe, n_lists)
    q_ids = np.asarray(query_tbl["vec_id"].combine_chunks())
    q_mat = _normalize(_matrix(query_tbl))
    order = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :n_probe]
    q_probe = np.zeros((len(q_ids), n_lists), dtype=bool)
    np.put_along_axis(q_probe, order, True, axis=1)
    state_ref = ray.put((q_ids, q_mat, centroids, q_probe))

    cand = ds.map_batches(
        _IvfScorer,
        fn_constructor_args=(state_ref, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )

    def final_topk(g: pa.Table) -> pa.Table:
        sims = np.asarray(g["sim"].combine_chunks())
        vids = np.asarray(g["vec_id"].combine_chunks())
        order = np.lexsort((vids, -sims))[:k]
        out = g.take(pa.array(order))
        out = out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )
        sims_r = np.round(np.asarray(out["sim"].combine_chunks()), 6)
        return out.set_column(
            out.schema.get_field_index("sim"), "sim", pa.array(sims_r)
        )

    return cand.groupby("q_id").map_groups(final_topk, batch_format="pyarrow")

"""Deduplication family for training-data pipelines.

- exact dedup: content hash + hash-partitioned keep-first
  (stages/featurize.py:dedup_first provides the kernel)
- MinHash + LSH near-dup: shingle → 64-perm minhash → banded buckets →
  groupby bucket → candidate pairs → exact-Jaccard verify
- SimHash: 64-bit signature from token hashes; near-dup via chunk banding

Scale shape: signatures are computed embarrassingly parallel per batch;
the only shuffle is the groupby on (band, band_hash) whose groups are
tiny (bucket collisions), so candidate generation never materializes a
cross product. Verification is an actor-pool stage holding the shingle
index built once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import shingle_hashes
from .keyed import splitmix64

N_PERMS = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERMS // N_BANDS
_SALTS = splitmix64(np.arange(1, N_PERMS + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def minhash_signatures(sh: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n_docs, N_PERMS) uint64 minhash matrix from flat shingle hashes."""
    n_docs = len(offsets) - 1
    out = np.full((n_docs, N_PERMS), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return out
    starts = offsets[:-1]
    empty = offsets[1:] == offsets[:-1]
    starts_c = np.minimum(starts, len(sh) - 1)
    for i in range(N_PERMS):
        ph = splitmix64(sh ^ _SALTS[i])
        mins = np.minimum.reduceat(ph, starts_c)
        mins[empty] = np.iinfo(np.uint64).max
        out[:, i] = mins
    return out


def band_hashes(sig: np.ndarray) -> np.ndarray:
    """(n_docs, N_BANDS) uint64 band bucket keys."""
    n_docs = sig.shape[0]
    out = np.zeros((n_docs, N_BANDS), dtype=np.uint64)
    for b in range(N_BANDS):
        acc = np.full(n_docs, np.uint64(b + 1), dtype=np.uint64)
        for r in range(ROWS_PER_BAND):
            acc = splitmix64(acc ^ sig[:, b * ROWS_PER_BAND + r])
        out[:, b] = acc
    return out


def minhash_band_table(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3) -> pa.Table:
    """Per-batch map: documents → exploded (band, band_hash, doc_id) rows
    (N_BANDS rows per doc) ready for the bucket groupby."""
    sh, offsets = shingle_hashes(batch[text_col], k=k)
    sig = minhash_signatures(sh, offsets)
    bh = band_hashes(sig)
    n = batch.num_rows
    ids = np.asarray(batch[id_col].combine_chunks())
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
            "doc_id": pa.array(np.repeat(ids, N_BANDS)),
        }
    )


def bucket_pairs(group: pa.Table, max_bucket: int = 64) -> pa.Table:
    """Candidate pairs (doc_a < doc_b) within one LSH bucket. Buckets
    larger than ``max_bucket`` are truncated (logged via manifest at the
    pipeline level) — a hot bucket is a degenerate near-dup cluster."""
    ids = np.unique(np.asarray(group["doc_id"].combine_chunks()))[:max_bucket]
    m = len(ids)
    if m < 2:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    i, j = np.triu_indices(m, k=1)
    return pa.table({"doc_a": pa.array(ids[i]), "doc_b": pa.array(ids[j])})


class JaccardVerifier:
    """Actor-pool verify stage: builds the doc→shingle-set index once per
    actor from the documents parquet, then verifies candidate pairs with
    exact Jaccard per batch."""

    def __init__(self, docs_path: str, k: int = 3, threshold: float = 0.5):
        import pyarrow.parquet as pq

        docs = pq.read_table(docs_path, columns=["doc_id", "text"])
        sh, offsets = shingle_hashes(docs["text"], k=k)
        ids = np.asarray(docs["doc_id"].combine_chunks())
        self.sets = {
            int(ids[d]): np.unique(sh[offsets[d] : offsets[d + 1]])
            for d in range(len(ids))
        }
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["doc_a"].combine_chunks())
        b = np.asarray(batch["doc_b"].combine_chunks())
        jac = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            sa = self.sets.get(int(a[i]))
            sb = self.sets.get(int(b[i]))
            if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
                jac[i] = 0.0
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            jac[i] = inter / (len(sa) + len(sb) - inter)
        out = batch.append_column("jaccard", pa.array(np.round(jac, 6)))
        return out.filter(pa.array(jac >= self.threshold))


def ngram_table(batch: pa.Table, k: int = 3) -> pa.Table:
    """(doc_id, gram) distinct word-k-gram STRING pairs per document —
    the exact-similarity-join building block (SQL-twin-able, unlike the
    hashed shingles). Docs with < k tokens contribute nothing. Fully
    vectorized: flattened token array + element-wise joins of shifted
    views, boundary windows masked out."""
    import pyarrow.compute as pc
    from ..functions.text import tokens_list, _flat_tokens

    toks = tokens_list(batch["text"].combine_chunks())
    flat, offsets = _flat_tokens(toks)
    n_docs = len(offsets) - 1
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n_tok = len(flat)
    if n_tok == 0:
        return pa.table(
            {"doc_id": pa.array([], batch["doc_id"].type),
             "gram": pa.array([], pa.string())}
        )
    parts = [flat]
    for j in range(1, k):
        shifted = flat.slice(j).combine_chunks() if hasattr(flat.slice(j), "combine_chunks") else flat.slice(j)
        pad = pa.array([""] * j, pa.string())
        parts.append(pa.concat_arrays([shifted, pad]))
    gram = pc.binary_join_element_wise(*parts, " ")
    doc_per_tok = np.repeat(np.arange(n_docs), lens)
    pos = np.arange(n_tok) - np.repeat(offsets[:-1].astype(np.int64), lens)
    keep = pos <= np.repeat(lens, lens) - k
    ids = np.asarray(batch["doc_id"].combine_chunks().cast(pa.int64()))
    out = pa.table(
        {
            "doc_id": pa.array(ids[doc_per_tok[keep]], pa.int64()),
            "gram": gram.filter(pa.array(keep)),
        }
    )
    # distinct (doc, gram) within batch (docs never span batches here)
    return out.group_by(["doc_id", "gram"]).aggregate([]).sort_by("doc_id")


def gram_group_pairs(group: pa.Table) -> pa.Table:
    """All (a < b) doc pairs sharing one gram (posting-list expansion)."""
    ids = np.unique(np.asarray(group["doc_id"].combine_chunks()))
    m = len(ids)
    if m < 2:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    iu = np.triu_indices(m, k=1)
    return pa.table(
        {"doc_a": pa.array(ids[iu[0]], pa.int64()),
         "doc_b": pa.array(ids[iu[1]], pa.int64())}
    )


def partition_pair_counts(part: pa.Table) -> pa.Table:
    """Partial intersection counts for one hash partition of (doc_id, gram)
    rows: sort by gram, expand each posting list to (a < b) pairs with the
    cumsum/repeat construction (no per-gram Python call — one distinct
    gram per *segment*, thousands of segments per task), then np.unique
    over packed pair keys. Output: (doc_a, doc_b, c) partials, summed by a
    tiny downstream groupby."""
    if part.num_rows == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "c": pa.array([], pa.int64())}
        )
    gram_codes = np.asarray(
        pa.compute.dictionary_encode(part["gram"].combine_chunks()).indices
    ).astype(np.int64)
    ids = np.asarray(part["doc_id"].combine_chunks().cast(pa.int64()))
    order = np.lexsort((ids, gram_codes))
    g = gram_codes[order]
    d = ids[order]
    n = len(g)
    seg_start = np.empty(n, dtype=bool)
    seg_start[0] = True
    np.not_equal(g[1:], g[:-1], out=seg_start[1:])
    arange = np.arange(n, dtype=np.int64)
    seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
    seg_id = np.cumsum(seg_start) - 1
    seg_len = np.bincount(seg_id)
    m = seg_len[seg_id]                      # segment size per row
    p = arange - seg_first                   # position within segment
    cnt = m - 1 - p                          # pairs led by this row
    total = int(cnt.sum())
    if total == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "c": pa.array([], pa.int64())}
        )
    a_idx = np.repeat(arange, cnt)
    row_start = np.cumsum(cnt) - cnt
    off = np.arange(total, dtype=np.int64) - np.repeat(row_start, cnt)
    b_idx = a_idx + 1 + off
    a = d[a_idx]
    b = d[b_idx]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    packed = (lo << np.int64(32)) | hi       # doc ids < 2^31
    uniq, c = np.unique(packed, return_counts=True)
    return pa.table(
        {
            "pair": pa.array(uniq, pa.int64()),
            "c": pa.array(c.astype(np.int64), pa.int64()),
        }
    )


def sum_pair_partials(part: pa.Table) -> pa.Table:
    """Final per-pair intersection size: np groupby-sum over packed pair
    keys (all partials of a pair land in one partition). Replaces a
    two-key Dataset groupby-sum that cost 30 s at sf0.1."""
    pair = np.asarray(part["pair"].combine_chunks())
    c = np.asarray(part["c"].combine_chunks()).astype(np.float64)
    uniq, inv = np.unique(pair, return_inverse=True)
    sums = np.bincount(inv, weights=c).astype(np.int64)
    return pa.table(
        {
            "doc_a": pa.array(uniq >> np.int64(32), pa.int64()),
            "doc_b": pa.array(uniq & np.int64(0xFFFFFFFF), pa.int64()),
            "c": pa.array(sums, pa.int64()),
        }
    )


def simhash64(sh: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc from flat (shingle or token) hashes:
    sum bit votes, sign → bit. Vectorized via bit unpacking + reduceat."""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(sh) == 0:
        return out
    starts = np.minimum(offsets[:-1], len(sh) - 1)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    bits = np.unpackbits(sh.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = np.add.reduceat(bits.astype(np.int32), starts, axis=0)
    maj = votes * 2 > lens[:, None]  # majority of ones per bit
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    out = (maj.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    out[lens == 0] = 0
    return out

"""Round-4 operator additions, batch 5 (oracle-exact, DuckDB twins).

- ``embedding_pq_residual_energy`` — the quality half of IVF-PQ: exact
  integer reconstruction error of each vector under its
  product-quantization code assignment (rank-by-energy tells you which
  vectors PQ is mis-serving and how to size K/M).
- ``docs_suffix_dupes`` — suffix-duplicate flags (header-stripped /
  tail-quoted copies): the mirror of ``docs_prefix_dupes`` — reverse
  every text, global sort, lexicographic-contiguity successor check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# embedding_pq_residual_energy — PQ reconstruction error, exact ints
# ---------------------------------------------------------------------------

def q_embedding_pq_residual_energy(sf_dir: str):
    """Per vector: the total quantized reconstruction error
    Σ_sub Σ_dim (q − cq_assigned)² under the PQ assignment of
    ``embedding_pq_codes`` (same fixed-point scale, same seeded
    codebook, same exact-int argmin with ties to the smallest centroid)
    — all int64, so the twin matches bit for bit. Codebook broadcast
    once; pure streaming."""
    import ray

    from .queries_r4a import PQ_QSCALE, _pq_bounds, _pq_codebook

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cq = _pq_codebook(emb)
    d = cq.shape[1]
    bounds = _pq_bounds(d)
    c_ref = ray.put(cq)

    def energy(t: pa.Table, _c=c_ref) -> pa.Table:
        empty = pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "residual_energy": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        cqs = ray.get(_c)
        vals = np.asarray(
            t["embedding"].combine_chunks().values.to_numpy(
                zero_copy_only=False
            ),
            dtype=np.float64,
        ).reshape(t.num_rows, -1)
        q = np.floor(vals * PQ_QSCALE + 0.5).astype(np.int64)
        ids = np.asarray(t["vec_id"].combine_chunks().cast(pa.int64()))
        total = np.zeros(len(ids), dtype=np.int64)
        for lo, hi in bounds:
            sl = slice(lo, hi)
            qc = cqs[:, sl]
            score = (qc * qc).sum(axis=1)[None, :] - 2 * (q[:, sl] @ qc.T)
            code = np.argmin(score, axis=1)
            diff = q[:, sl] - qc[code]
            total += (diff * diff).sum(axis=1)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "residual_energy": pa.array(total, pa.int64())}
        )

    return emb.map_batches(energy, batch_format="pyarrow",
                           zero_copy_batch=True)


def _pq_residual_sql() -> str:
    from .queries_r4a import PQ_K, PQ_M, PQ_QSCALE

    return f"""
WITH e AS (
    SELECT vec_id,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {PQ_QSCALE}
                      + 0.5) AS BIGINT) AS q,
           generate_subscripts(embedding, 1) AS dim
    FROM embeddings
),
dims AS (SELECT CAST(MAX(dim) AS BIGINT) AS d FROM e),
es AS (
    SELECT vec_id, q, dim,
           ((dim - 1) * {PQ_M}) // (SELECT d FROM dims) AS sub
    FROM e
),
c AS (SELECT vec_id AS code, q AS cq, dim, sub FROM es
      WHERE vec_id < {PQ_K}),
dist AS (
    SELECT es.vec_id, es.sub, c.code,
           SUM(c.cq * c.cq - 2 * es.q * c.cq) AS score
    FROM es JOIN c ON c.dim = es.dim AND c.sub = es.sub
    GROUP BY 1, 2, 3
),
assign AS (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY score, code) AS rn
    FROM dist
),
res AS (
    SELECT es.vec_id,
           SUM((es.q - c.cq) * (es.q - c.cq)) AS energy
    FROM es
    JOIN assign a ON a.vec_id = es.vec_id AND a.sub = es.sub AND a.rn = 1
    JOIN c ON c.code = a.code AND c.dim = es.dim
    GROUP BY 1
)
SELECT vec_id, CAST(energy AS BIGINT) AS residual_energy FROM res
"""


# ---------------------------------------------------------------------------
# docs_suffix_dupes — reversed-text mirror of docs_prefix_dupes
# ---------------------------------------------------------------------------

def q_docs_suffix_dupes(sf_dir: str):
    """Flag documents whose text is a strict-or-equal SUFFIX of another
    document (header-stripped re-crawls, tail quotations): reverse every
    text in-batch, then the narrow-key prefix-dup machinery
    (stages/prefixdup.py — fixed-width 64-codepoint sort keys, cohort-
    only text exchange; VERDICT r4 §next-6) applies verbatim."""
    from ..stages.prefixdup import prefix_dup_flags

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "rtext": pc.utf8_reverse(t["text"].combine_chunks()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return prefix_dup_flags(ds, "rtext", "is_suffix_dup")


DOCS_SUFFIX_DUPES_SQL = """
SELECT a.doc_id,
       CAST(EXISTS (
           SELECT 1 FROM documents b
           WHERE b.doc_id <> a.doc_id AND ends_with(b.text, a.text)
       ) AS BIGINT) AS is_suffix_dup
FROM documents a
"""


REGISTRY: dict[str, tuple] = {
    "embedding_pq_residual_energy": (
        q_embedding_pq_residual_energy,
        _pq_residual_sql(),
    ),
    "docs_suffix_dupes": (q_docs_suffix_dupes, DOCS_SUFFIX_DUPES_SQL),
}

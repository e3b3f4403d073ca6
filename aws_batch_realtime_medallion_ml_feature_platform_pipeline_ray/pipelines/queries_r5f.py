"""Round-5 operator additions, batch 6 (oracle-exact, DuckDB twins).

- ``knn_pq_rerank`` — the PQ serving path end-to-end: asymmetric-
  distance (ADC) candidate generation over the broadcast codebook
  (integer-exact table lookups, per-block top-C partials) followed by
  an exact full-vector re-rank of the C candidates — the
  memory-bandwidth shape production PQ ANN uses, with every score an
  exact int64 so the DuckDB twin matches bit for bit.
- ``conv_role_transition_latency`` — mean/max gap seconds per
  (role → next role) transition: the latency-aware sibling of
  conv_role_transitions (fixed |roles|² fold domain).

Reference provenance: extends the engine's ANN family (stages/ann.py)
and spark_jobs/silver_and_gold.py:86-131 per-entity windows per the
north rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6
from ..sources.reads import read_parquet_sized
from ..sources.transcripts import (
    TRANSCRIPTS_SQL_CTE,
    read_events_as_transcripts,
)
from ..stages.keyed import map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

_US = 1_000_000

PQR_QUERIES = 5   # queries = first N vectors (the knn convention)
PQR_CAND = 20     # ADC candidates per query
PQR_K = 3         # final exact-reranked neighbors


# ---------------------------------------------------------------------------
# knn_pq_rerank — ADC candidates + exact re-rank
# ---------------------------------------------------------------------------

def q_knn_pq_rerank(sf_dir: str):
    """Top-{PQR_K} neighbors of the first {PQR_QUERIES} vectors via the
    two-stage PQ serving plan: (1) ADC — each vector's PQ code (same
    seeded codebook / fixed-point argmin as ``embedding_pq_codes``)
    scores against per-query per-centroid distance tables
    (adc[q,m,c] = Σ_d (qq−cq)², exact int64, broadcast once) with
    per-block top-{PQR_CAND} partials (block top-C ⊇ global top-C per
    query since candidates are disjoint across blocks); (2) exact
    re-rank — the ≤ Q·C candidate pairs get full-vector quantized L2²
    in one more streaming pass over a broadcast candidate set. Both
    folds are O(Q·C) driver relations; ties break by vec_id
    everywhere."""
    import ray
    import ray.data as rd

    from .queries_r4a import PQ_QSCALE, _pq_bounds, _pq_codebook

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cq = _pq_codebook(emb)          # (K, d) int64
    d = cq.shape[1]
    bounds = _pq_bounds(d)
    M = len(bounds)
    K = cq.shape[0]

    empty_out = pa.table(
        {"q_id": pa.array([], pa.int64()),
         "vec_id": pa.array([], pa.int64()),
         "rank": pa.array([], pa.int64()),
         "dist2": pa.array([], pa.int64())}
    )
    qt = (
        emb.filter(expr=f"vec_id < {PQR_QUERIES}")
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    if len(qt) == 0:
        return rd.from_arrow(empty_out)
    q_ids = qt["vec_id"].to_numpy(np.int64)
    qmat = np.stack([np.asarray(v, np.float64) for v in qt["embedding"]])
    qq = np.floor(qmat * PQ_QSCALE + 0.5).astype(np.int64)  # (Q, d)
    Q = len(q_ids)

    # adc[q, m, c] = sum_d_in_sub_m (qq - cq)^2 — exact ints
    adc = np.zeros((Q, M, K), dtype=np.int64)
    for m, (lo, hi) in enumerate(bounds):
        diff = qq[:, None, lo:hi] - cq[None, :, lo:hi]
        adc[:, m, :] = (diff * diff).sum(axis=2)
    state = ray.put((q_ids, qq, cq, adc))

    def pass_a(t: pa.Table, _s=state) -> pa.Table:
        empty = pa.table(
            {"q_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "adc": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        q_ids_, _qq, cq_, adc_ = ray.get(_s)
        vals = np.asarray(
            t["embedding"].combine_chunks().values.to_numpy(
                zero_copy_only=False
            ),
            dtype=np.float64,
        ).reshape(t.num_rows, -1)
        v = np.floor(vals * PQ_QSCALE + 0.5).astype(np.int64)
        ids = np.asarray(t["vec_id"].combine_chunks().cast(pa.int64()))
        n = len(ids)
        score = np.zeros((len(q_ids_), n), dtype=np.int64)
        for m, (lo, hi) in enumerate(bounds):
            qc = cq_[:, lo:hi]
            s = (qc * qc).sum(axis=1)[None, :] - 2 * (v[:, lo:hi] @ qc.T)
            code = np.argmin(s, axis=1)  # ties -> smallest centroid
            score += adc_[:, m, code]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids_)):
            sc = score[qi]
            mask = ids != q_ids_[qi]
            cand_ids = ids[mask]
            cand_sc = sc[mask]
            order = np.lexsort((cand_ids, cand_sc))[:PQR_CAND]
            out_q.append(np.full(len(order), q_ids_[qi], np.int64))
            out_v.append(cand_ids[order])
            out_s.append(cand_sc[order])
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "adc": pa.array(np.concatenate(out_s), pa.int64()),
            }
        )

    partials = emb.map_batches(pass_a, batch_format="pyarrow",
                               zero_copy_batch=True)

    def reduce_topc(part: pa.Table) -> pa.Table:
        """q_id-keyed reduce of per-block partials to the exact global
        top-C per query — the per-block collect stays O(Q·C), never
        O(#blocks·Q·C) on the driver."""
        empty = pa.table(
            {"q_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        pq_ = np.asarray(part["q_id"].combine_chunks())
        pv = np.asarray(part["vec_id"].combine_chunks())
        ps = np.asarray(part["adc"].combine_chunks())
        order = np.lexsort((pv, ps, pq_))
        pq_s, pv_s = pq_[order], pv[order]
        seg_start = np.concatenate(([True], pq_s[1:] != pq_s[:-1]))
        pos = np.arange(len(pq_s)) - np.maximum.accumulate(
            np.where(seg_start, np.arange(len(pq_s)), 0)
        )
        keep = pos < PQR_CAND
        return pa.table(
            {"q_id": pa.array(pq_s[keep], pa.int64()),
             "vec_id": pa.array(pv_s[keep], pa.int64())}
        )

    cand = map_partitions_by_key(partials, "q_id", reduce_topc,
                                 num_parts=NUM_PARTS)
    tbls = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return rd.from_arrow(empty_out)
    allp = pa.concat_tables(tbls)  # ≤ Q × C rows
    cq_ids = np.asarray(allp["q_id"].combine_chunks())
    cv_ids = np.asarray(allp["vec_id"].combine_chunks())
    # pass B: exact quantized L2^2 over full vectors of the candidates
    cand_sorted = np.unique(cv_ids)
    pairs_ref = ray.put((cand_sorted, cq_ids, cv_ids, qq, q_ids))

    def pass_b(t: pa.Table, _p=pairs_ref) -> pa.Table:
        empty = pa.table(
            {"q_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "dist2": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        cset, cqi, cvi, qq_, qids_ = ray.get(_p)
        ids = np.asarray(t["vec_id"].combine_chunks().cast(pa.int64()))
        pos = np.searchsorted(cset, ids)
        keep = (pos < len(cset)) & (
            cset[np.minimum(pos, len(cset) - 1)] == ids
        )
        if not keep.any():
            return empty
        kept = t.filter(pa.array(keep))
        ids_k = ids[keep]
        vals = np.asarray(
            kept["embedding"].combine_chunks().values.to_numpy(
                zero_copy_only=False
            ),
            dtype=np.float64,
        ).reshape(kept.num_rows, -1)
        v = np.floor(vals * PQ_QSCALE + 0.5).astype(np.int64)
        qpos = {int(q): i for i, q in enumerate(qids_)}
        # map candidate pair rows onto this block's rows (vectorized)
        order_ids = np.argsort(ids_k, kind="stable")
        ids_sorted = ids_k[order_ids]
        ppos = np.searchsorted(ids_sorted, cvi)
        ok = (ppos < len(ids_sorted)) & (
            ids_sorted[np.minimum(ppos, len(ids_sorted) - 1)] == cvi
        )
        rows = order_ids[ppos[ok]]
        qs = np.array([qpos[int(x)] for x in cqi[ok]], dtype=np.int64)
        diff = v[rows] - qq_[qs]
        d2 = (diff * diff).sum(axis=1)
        return pa.table(
            {
                "q_id": pa.array(cqi[ok], pa.int64()),
                "vec_id": pa.array(cvi[ok], pa.int64()),
                "dist2": pa.array(d2, pa.int64()),
            }
        )

    scored = emb.map_batches(pass_b, batch_format="pyarrow",
                             zero_copy_batch=True)
    stbl = [t for t in ray.get(scored.to_arrow_refs()) if t.num_rows]
    if not stbl:
        return rd.from_arrow(empty_out)
    alls = pa.concat_tables(stbl)  # ≤ Q × C rows
    sq = np.asarray(alls["q_id"].combine_chunks())
    sv = np.asarray(alls["vec_id"].combine_chunks())
    sd = np.asarray(alls["dist2"].combine_chunks())
    rows = {"q_id": [], "vec_id": [], "rank": [], "dist2": []}
    for qid in q_ids:
        m = sq == qid
        order = np.lexsort((sv[m], sd[m]))[:PQR_K]
        for r, ix in enumerate(order):
            rows["q_id"].append(int(qid))
            rows["vec_id"].append(int(sv[m][ix]))
            rows["rank"].append(r + 1)
            rows["dist2"].append(int(sd[m][ix]))
    return rd.from_arrow(
        pa.table(
            {
                "q_id": pa.array(rows["q_id"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "rank": pa.array(rows["rank"], pa.int64()),
                "dist2": pa.array(rows["dist2"], pa.int64()),
            }
        )
    )


def _pq_rerank_sql() -> str:
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
qs AS (SELECT vec_id AS q_id, q AS qq, dim, sub FROM es
       WHERE vec_id < {PQR_QUERIES}),
adc AS (
    SELECT qs.q_id, a.vec_id,
           SUM((qs.qq - c.cq) * (qs.qq - c.cq)) AS adc
    FROM qs
    JOIN assign a ON a.sub = qs.sub AND a.rn = 1
    JOIN c ON c.sub = qs.sub AND c.code = a.code AND c.dim = qs.dim
    WHERE a.vec_id <> qs.q_id
    GROUP BY 1, 2
),
cand AS (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc, vec_id) AS cr
    FROM adc
),
ex AS (
    SELECT cand.q_id, cand.vec_id,
           SUM((eq.q - ev.q) * (eq.q - ev.q)) AS dist2
    FROM cand
    JOIN es eq ON eq.vec_id = cand.q_id
    JOIN es ev ON ev.vec_id = cand.vec_id AND ev.dim = eq.dim
    WHERE cand.cr <= {PQR_CAND}
    GROUP BY 1, 2
),
rr AS (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY dist2, vec_id) AS rank,
           dist2
    FROM ex
)
SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank,
       CAST(dist2 AS BIGINT) AS dist2
FROM rr WHERE rank <= {PQR_K}
"""


# ---------------------------------------------------------------------------
# conv_role_transition_latency — latency per role transition
# ---------------------------------------------------------------------------

def q_conv_role_transition_latency(sf_dir: str):
    """Per (role → next-role) transition across all conversations:
    count, mean gap seconds (round6), max gap seconds — the
    latency-aware sibling of conv_role_transitions. ONE conv-keyed
    exchange; per-pair partials fold through a ≤|roles|²-row
    aggregate."""
    from ray.data.aggregate import Max, Sum

    from .queries import _conv_order

    ds = read_events_as_transcripts(sf_dir)

    def part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"role_a": pa.array([], pa.string()),
             "role_b": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "sum_us": pa.array([], pa.int64()),
             "max_us": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return empty
        import pandas as pd

        order, k, ts, _seg = _conv_order(tbl)
        role = np.asarray(
            tbl["role"].combine_chunks().take(pa.array(order)), dtype=object
        )
        n = len(k)
        if n < 2:
            return empty
        same = k[1:] == k[:-1]
        gap = ts[1:] - ts[:-1]
        ra = role[:-1][same]
        rb = role[1:][same]
        gp = gap[same]
        if len(ra) == 0:
            return empty
        key = np.char.add(np.char.add(ra.astype(str), "\x1f"),
                          rb.astype(str))
        inv, uniq = pd.factorize(key)
        s = np.zeros(len(uniq), np.int64)
        mx = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, gp)
        np.maximum.at(mx, inv, gp)
        first = np.zeros(len(uniq), np.int64)
        first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        return pa.table(
            {
                "role_a": pa.array(ra[first].astype(str), pa.string()),
                "role_b": pa.array(rb[first].astype(str), pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64),
                              pa.int64()),
                "sum_us": pa.array(s, pa.int64()),
                "max_us": pa.array(mx, pa.int64()),
            }
        )

    partials = map_partitions_by_key(ds, "conv_id", part,
                                     num_parts=NUM_PARTS)
    folded = partials.groupby(["role_a", "role_b"]).aggregate(
        Sum("n", alias_name="n_transitions"),
        Sum("sum_us", alias_name="s"),
        Max("max_us", alias_name="m"),
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "role_a": t["role_a"],
                "role_b": t["role_b"],
                "n_transitions": t["n_transitions"].combine_chunks().cast(
                    pa.int64()
                ),
                "avg_gap_s": pa.array(
                    round6(
                        np.asarray(t["s"].combine_chunks(),
                                   dtype=np.float64)
                        / np.asarray(t["n_transitions"].combine_chunks(),
                                     dtype=np.float64)
                        / 1_000_000.0
                    ),
                    pa.float64(),
                ),
                "max_gap_s": pa.array(
                    np.asarray(t["m"].combine_chunks()) // _US, pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


CONV_ROLE_TRANSITION_LATENCY_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
w AS (
    SELECT conv_id, role AS role_a,
           lead(role) OVER (PARTITION BY conv_id
                            ORDER BY ts, event_id) AS role_b,
           epoch_us(lead(ts) OVER (PARTITION BY conv_id
                                   ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
    FROM transcripts
)
SELECT role_a, role_b,
       COUNT(*)::BIGINT AS n_transitions,
       ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
           AS avg_gap_s,
       CAST(MAX(gap_us) // 1000000 AS BIGINT) AS max_gap_s
FROM w WHERE role_b IS NOT NULL
GROUP BY 1, 2
"""


REGISTRY: dict[str, tuple] = {
    "knn_pq_rerank": (q_knn_pq_rerank, _pq_rerank_sql()),
    "conv_role_transition_latency": (
        q_conv_role_transition_latency,
        CONV_ROLE_TRANSITION_LATENCY_SQL,
    ),
}

"""Round-3 batch C: winnowing (robust minimizer) fingerprint selection
and DFA-based event-sequence validation.

Winnowing is the document-fingerprinting algorithm behind MOSS/sourmash:
k-gram hashes, a sliding window of W positions, and the guarantee that
any sufficiently long match between two documents shares a selected
fingerprint. The k-gram hash here is the first 10 hex digits of md5 (an
exact cross-engine integer; the SCALE path for shingle hashing is the
vectorized splitmix64 in stages/dedup.py — md5 keeps the DuckDB twin
bit-exact), made tie-free by keying on ``hash * 2^20 + position``.

Reference provenance: sequence validation generalizes the reference's
row-local validity filters (``spark_jobs/silver_and_gold.py:62-65``) to
CROSS-ROW protocol rules — the stateful check a stream pipeline runs on
ordered per-entity event streams.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized
from ..stages.keyed import map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# docs_winnow_minimizers — robust winnowing fingerprint selection
# ---------------------------------------------------------------------------

WIN_K = 3   # token k-gram size
WIN_W = 4   # winnowing window (gram positions per window)
_POS_BITS = 20  # tie-free key = hv * 2^20 + pos; docs must have < 2^20 grams


def _md5_int40(grams: list[str]) -> np.ndarray:
    """First 40 bits of md5 per gram — matches the SQL twin's
    ``('0x' || substr(md5(g), 1, 10))::BIGINT`` exactly."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode()).digest()[:5], "big")
            for g in grams
        ),
        dtype=np.int64,
        count=len(grams),
    )


def q_docs_winnow_minimizers(sf_dir: str):
    """Per document: total k-gram count, the number of WINNOWED
    minimizer positions, and the xor-fold of the selected fingerprint
    hashes — the storage-bounded fingerprint set with the winnowing
    guarantee (every window of ``WIN_W`` consecutive grams contributes
    its minimum-keyed gram, so any match of length >= W+K-1 tokens
    between two documents shares a fingerprint).

    Plan: embarrassingly parallel per batch (no exchange at all): grams
    build vectorized from three shifted views of the flat token array;
    the sliding argmin is a (n x W) shifted-column matrix with
    segment-start masking (the rolling-median pattern), tie-free because
    the key appends the position. Documents shorter than one window
    contribute their single clipped window."""
    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
                "n_minimizers": pa.array([], pa.int64()),
                "fp_xor": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        doc = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        offs = np.asarray(toks.offsets).astype(np.int64)
        n_tok = np.diff(offs)
        flat = toks.flatten()
        # gram at token position p (doc-local) exists when p+K-1 < n_tok
        n_gram = np.maximum(n_tok - (WIN_K - 1), 0)
        keep_doc = n_gram > 0
        if not keep_doc.any():
            return empty
        # flat gram construction: three shifted slices of the token array
        total_flat = len(flat)
        gram_rows = np.repeat(np.arange(len(doc)), n_gram)
        gram_base = np.concatenate(([0], np.cumsum(n_gram)[:-1]))
        gpos_local = np.arange(int(n_gram.sum())) - np.repeat(
            gram_base, n_gram
        )
        gstart_flat = np.repeat(offs[:-1], n_gram) + gpos_local
        parts = []
        for s in range(WIN_K):
            parts.append(flat.take(pa.array(gstart_flat + s)))
        sep = pa.scalar(" ", pa.large_string()) if parts[0].type == pa.large_string() else " "
        grams_arr = pc.binary_join_element_wise(
            parts[0], parts[1], parts[2], sep
        )
        hv = _md5_int40(grams_arr.to_pylist())
        if int(n_gram.max()) >= (1 << _POS_BITS):
            raise OverflowError(
                "winnowing key packing expects < 2^20 grams per document"
            )
        key = hv * (1 << _POS_BITS) + gpos_local
        n = len(key)
        seg_start = np.repeat(gram_base, n_gram)
        seg_len_rep = np.repeat(n_gram, n_gram)
        p = np.arange(n, dtype=np.int64)
        BIG = np.int64(1) << 62
        cols = []
        for s in range(WIN_W):
            idx = p - s
            ok = idx >= seg_start
            cols.append(np.where(ok, key[np.maximum(idx, 0)], BIG))
        mat = np.stack(cols, axis=1)
        amin = np.argmin(mat, axis=1)  # unique keys: no tie ambiguity
        # a row j closes a window when it has >= min(W, seg_len) grams
        have = p - seg_start + 1
        closes = have >= np.minimum(seg_len_rep, WIN_W)
        sel_pos = np.unique(p[closes] - amin[closes])  # global gram idx
        sel_doc = gram_rows[sel_pos]
        sel_hv = hv[sel_pos]
        # per-doc fold over the selected positions (sorted by doc already)
        docs_u, starts = np.unique(sel_doc, return_index=True)
        n_min = np.diff(np.append(starts, len(sel_doc)))
        fp = np.bitwise_xor.reduceat(sel_hv, starts)
        return pa.table(
            {
                "doc_id": pa.array(doc[docs_u], pa.int64()),
                "n_grams": pa.array(n_gram[docs_u], pa.int64()),
                "n_minimizers": pa.array(n_min.astype(np.int64)),
                "fp_xor": pa.array(fp, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


DOCS_WINNOW_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS (
    SELECT doc_id, i,
           ('0x' || substr(md5(array_to_string(toks[i:i+{WIN_K - 1}], ' ')),
                           1, 10))::BIGINT AS hv,
           len(toks) - {WIN_K - 1} AS ng
    FROM t, unnest(generate_series(1, len(toks) - {WIN_K - 1})) AS u(i)
    WHERE len(toks) >= {WIN_K}
),
k AS (
    SELECT doc_id, i, hv, ng,
           hv * {1 << _POS_BITS} + (i - 1) AS key
    FROM g
),
w AS (
    SELECT doc_id, i, ng,
           min_by(i, key) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN {WIN_W - 1} PRECEDING AND CURRENT ROW) AS am
    FROM k
),
sel AS (
    SELECT DISTINCT w.doc_id, w.am AS i
    FROM w WHERE w.i >= least(w.ng, {WIN_W})
)
SELECT sel.doc_id,
       CAST(any_value(k.ng) AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_minimizers,
       CAST(bit_xor(k.hv) AS BIGINT) AS fp_xor
FROM sel JOIN k ON k.doc_id = sel.doc_id AND k.i = sel.i
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_dfa_violations — cross-row protocol validation per entity
# ---------------------------------------------------------------------------


def q_events_dfa_violations(sf_dir: str):
    """Per user, validate the ORDERED event stream against protocol
    rules that span rows: a ``purchase`` must directly follow a
    ``click`` (an un-clicked purchase is a tracking bug or fraud
    signal), and ``error`` must not follow ``error`` (un-deduplicated
    retry storm). Emits per-user event count and violation counts —
    the stateful sequence lint a stream pipeline runs next to the
    row-local expectations audit (events_expectations).

    Plan: ONE keyed exchange on ``user_id``; per partition a single
    lexsort orders every user's run and the previous event type is the
    shifted code array masked at segment starts. Pure vectorized
    compares; no per-row Python."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )

    def part_fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "bad_purchase": pa.array([], pa.int64()),
                "error_storm": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        et = t["event_type"].combine_chunks()
        enc = pc.dictionary_encode(et)
        codes = np.asarray(enc.indices).astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        code_of = {v: i for i, v in enumerate(vocab)}
        c_click = code_of.get("click", -2)
        c_purch = code_of.get("purchase", -2)
        c_err = code_of.get("error", -2)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], codes[order]
        first = np.concatenate(([True], u[1:] != u[:-1]))
        prev = np.concatenate(([-1], c[:-1]))
        prev = np.where(first, -1, prev)  # no predecessor at segment start
        bad_p = (c == c_purch) & (prev != c_click)
        storm = (c == c_err) & (prev == c_err)
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.append(starts, len(u)))
        seg_id = np.repeat(np.arange(len(starts)), seg_len)
        bp = np.zeros(len(starts), np.int64)
        es = np.zeros(len(starts), np.int64)
        np.add.at(bp, seg_id, bad_p.astype(np.int64))
        np.add.at(es, seg_id, storm.astype(np.int64))
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "n_events": pa.array(seg_len.astype(np.int64)),
                "bad_purchase": pa.array(bp),
                "error_storm": pa.array(es),
            }
        )

    return map_partitions_by_key(ds, "user_id", part_fn, num_parts=NUM_PARTS)


EVENTS_DFA_SQL = """
WITH s AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (event_type = 'purchase'
            AND (prev IS NULL OR prev <> 'click')) AS BIGINT)
           AS bad_purchase,
       CAST(count(*) FILTER (event_type = 'error' AND prev = 'error')
            AS BIGINT) AS error_storm
FROM s GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "docs_winnow_minimizers": (q_docs_winnow_minimizers, DOCS_WINNOW_SQL),
    "events_dfa_violations": (q_events_dfa_violations, EVENTS_DFA_SQL),
}


# ---------------------------------------------------------------------------
# embedding_mmr — Maximal Marginal Relevance diversified retrieval
# ---------------------------------------------------------------------------

MMR_C = 8       # candidate pool per query (exact top-C by cosine)
MMR_K = 3       # diversified picks per query
MMR_LAMBDA = 0.7


def q_embedding_mmr(sf_dir: str):
    """Diversified top-{MMR_K} retrieval per query via Maximal Marginal
    Relevance: greedily pick argmax of ``λ·rel − (1−λ)·max_sim_to_
    selected`` from the exact top-{MMR_C} cosine candidates — the
    redundancy-penalizing reranker dense-retrieval pipelines run so the
    k results aren't near-duplicates of each other. Ties break to the
    smaller vec_id; all similarities ROUND6 on both engines before any
    comparison.

    Plan: candidates come from the distributed brute-force top-C
    (broadcast query matrix, per-batch partial top-k); ONE cogroup on
    vec_id attaches candidate embeddings (vectors travel only for the
    C·|queries| candidate rows); ONE exchange on q_id, then the K greedy
    steps run VECTORIZED ACROSS QUERIES per partition (segmented argmax
    + one fused similarity update per step — no per-query Python)."""
    from ..stages.ann import knn_bruteforce, _matrix, _normalize
    from ..stages.keyed import cogroup_by_key
    from ..functions.numeric import round6
    from .queries_ann import _emb, _query_tbl

    cand = knn_bruteforce(_emb(sf_dir), _query_tbl(sf_dir), k=MMR_C)

    def attach(cpart: pa.Table, epart: pa.Table) -> pa.Table:
        if cpart.num_rows == 0:
            out = cpart
            if "embedding" not in cpart.column_names:
                out = out.append_column(
                    "embedding",
                    pa.array([], pa.list_(pa.float32())),
                )
            return out
        idx = pc.index_in(
            cpart["vec_id"].combine_chunks(),
            value_set=epart["vec_id"].combine_chunks(),
        )
        if idx.null_count:
            raise ValueError("mmr: candidate missing from embeddings")
        return cpart.append_column(
            "embedding", epart["embedding"].combine_chunks().take(idx)
        )

    enriched = cogroup_by_key(
        cand, _emb(sf_dir), "vec_id", attach, num_parts=NUM_PARTS
    )

    def mmr_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "q_id": pa.array([], pa.int64()),
                "mmr_rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "mmr_score": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        qid = np.asarray(t["q_id"].combine_chunks().cast(pa.int64()))
        vid = np.asarray(t["vec_id"].combine_chunks().cast(pa.int64()))
        rel = np.asarray(t["sim"].combine_chunks())  # ROUND6 upstream
        V = _normalize(_matrix(t))
        order = np.lexsort((vid, qid))
        qid, vid, rel, V = qid[order], vid[order], rel[order], V[order]
        n = len(qid)
        starts = np.flatnonzero(
            np.concatenate(([True], qid[1:] != qid[:-1]))
        )
        seg_len = np.diff(np.append(starts, n))
        seg_id = np.repeat(np.arange(len(starts)), seg_len)
        # -inf = "no selected neighbor yet": the step-1 score uses an
        # effective 0 (matching the SQL twin's λ·rel − μ·0), but the
        # first real update must SET the (possibly negative) similarity,
        # not max() it against 0
        maxsim = np.full(n, -np.inf)
        alive = np.ones(n, dtype=bool)
        out_q, out_r, out_v, out_s = [], [], [], []
        NEGINF = -np.inf
        for step in range(1, MMR_K + 1):
            ms_eff = np.where(np.isneginf(maxsim), 0.0, maxsim)
            score = round6(MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * ms_eff)
            score = np.where(alive, score, NEGINF)
            # segmented argmax, ties -> smaller vec_id: order rows by
            # (seg, -score, vec_id) and take each segment's first
            pick_order = np.lexsort((vid, -score, seg_id))
            firsts = pick_order[
                np.concatenate(
                    ([True], seg_id[pick_order][1:] != seg_id[pick_order][:-1])
                )
            ]
            valid = score[firsts] > NEGINF
            firsts = firsts[valid]
            if len(firsts) == 0:
                break
            out_q.append(qid[firsts])
            out_r.append(np.full(len(firsts), step, np.int64))
            out_v.append(vid[firsts])
            out_s.append(score[firsts])
            alive[firsts] = False
            # similarity of every row to its segment's new pick
            pick_of_seg = np.full(len(starts), -1, np.int64)
            pick_of_seg[seg_id[firsts]] = firsts
            has = pick_of_seg[seg_id] >= 0
            pv = V[np.maximum(pick_of_seg[seg_id], 0)]
            sims = round6(np.einsum("ij,ij->i", V, pv))
            maxsim = np.where(has, np.maximum(maxsim, sims), maxsim)
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(out_q), pa.int64()),
                "mmr_rank": pa.array(np.concatenate(out_r), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "mmr_score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    return map_partitions_by_key(
        enriched.map_batches(
            lambda t: t.drop_columns(["rank"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "q_id",
        mmr_part,
        num_parts=NUM_PARTS,
    )


def _mmr_sql() -> str:
    from .queries_ann import N_QUERIES

    lam, mu = MMR_LAMBDA, 1 - MMR_LAMBDA
    return f"""
WITH q AS (
    SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
sims AS (
    SELECT q.q_id, e.vec_id,
           list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
    FROM q, embeddings e
    WHERE e.vec_id <> q.q_id
),
cand AS (
    SELECT q_id, vec_id, ROUND(sim, 6) AS rel FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY sim DESC, vec_id) AS rnk
        FROM sims
    ) WHERE rnk <= {MMR_C}
),
pair AS (
    SELECT c1.q_id, c1.vec_id AS a, c2.vec_id AS b,
           ROUND(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                        CAST(e2.embedding AS DOUBLE[])), 6)
               AS s
    FROM cand c1
    JOIN cand c2 ON c2.q_id = c1.q_id AND c2.vec_id <> c1.vec_id
    JOIN embeddings e1 ON e1.vec_id = c1.vec_id
    JOIN embeddings e2 ON e2.vec_id = c2.vec_id
),
s1 AS (
    SELECT q_id, vec_id, ROUND({lam} * rel - {mu} * 0, 6) AS score FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY ROUND({lam} * rel - {mu} * 0, 6) DESC, vec_id) AS rn
        FROM cand
    ) WHERE rn = 1
),
m2 AS (
    SELECT c.q_id, c.vec_id, c.rel, p.s AS ms
    FROM cand c
    JOIN s1 ON s1.q_id = c.q_id AND c.vec_id <> s1.vec_id
    JOIN pair p ON p.q_id = c.q_id AND p.a = c.vec_id AND p.b = s1.vec_id
),
s2 AS (
    SELECT q_id, vec_id, score, ms FROM (
        SELECT *, ROUND({lam} * rel - {mu} * ms, 6) AS score,
               row_number() OVER (PARTITION BY q_id
                   ORDER BY ROUND({lam} * rel - {mu} * ms, 6) DESC, vec_id)
                   AS rn
        FROM m2
    ) WHERE rn = 1
),
m3 AS (
    SELECT c.q_id, c.vec_id, c.rel, greatest(c.ms, p.s) AS ms
    FROM m2 c
    JOIN s2 ON s2.q_id = c.q_id AND c.vec_id <> s2.vec_id
    JOIN pair p ON p.q_id = c.q_id AND p.a = c.vec_id AND p.b = s2.vec_id
),
s3 AS (
    SELECT q_id, vec_id, score FROM (
        SELECT *, ROUND({lam} * rel - {mu} * ms, 6) AS score,
               row_number() OVER (PARTITION BY q_id
                   ORDER BY ROUND({lam} * rel - {mu} * ms, 6) DESC, vec_id)
                   AS rn
        FROM m3
    ) WHERE rn = 1
)
SELECT q_id, CAST(1 AS BIGINT) AS mmr_rank, vec_id, score AS mmr_score
FROM s1
UNION ALL
SELECT q_id, CAST(2 AS BIGINT), vec_id, score FROM s2
UNION ALL
SELECT q_id, CAST(3 AS BIGINT), vec_id, score FROM s3
"""


REGISTRY["embedding_mmr"] = (q_embedding_mmr, _mmr_sql())


# ---------------------------------------------------------------------------
# events_holt_linear — double exponential smoothing (level + trend)
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


def q_events_holt_linear(sf_dir: str):
    """Holt's linear (double exponential) smoothing of the daily revenue
    series: coupled level/trend recursions — the forecasting filter that
    handles drifting baselines where the plain EWMA (events_ewma) lags.
    Emits per day the smoothed level, trend and one-step-ahead forecast.

    Plan: the daily totals fold distributed (per-batch integer-cent
    partials → calendar-bounded groupby); the recursion itself is
    inherently sequential but runs over O(days) rows on the driver —
    the same bounded-finale shape as events_xcorr_lagged. Both engines
    execute the IDENTICAL IEEE expression tree (DuckDB recursive CTE vs
    the Python loop), so level/trend agree bit-for-bit before the
    final ROUND6."""
    from .queries_r3f import _daily_cents

    daily = _daily_cents(sf_dir)
    days = daily["day"].to_numpy(np.int64)
    x = daily["cents"].to_numpy(np.int64).astype(np.float64) / 100.0
    n = len(days)
    if n == 0:
        return pa.table(
            {
                "day": pa.array([], pa.int64()),
                "level": pa.array([], pa.float64()),
                "trend": pa.array([], pa.float64()),
                "forecast_next": pa.array([], pa.float64()),
            }
        )
    lvl = np.empty(n)
    trd = np.empty(n)
    lvl[0] = x[0]
    trd[0] = (x[1] - x[0]) if n > 1 else 0.0
    for t_ in range(1, n):  # O(days), driver-side by design
        l_new = HOLT_ALPHA * x[t_] + (1.0 - HOLT_ALPHA) * (
            lvl[t_ - 1] + trd[t_ - 1]
        )
        trd[t_] = HOLT_BETA * (l_new - lvl[t_ - 1]) + (
            1.0 - HOLT_BETA
        ) * trd[t_ - 1]
        lvl[t_] = l_new
    from ..functions.numeric import round6

    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "level": pa.array(round6(lvl), pa.float64()),
            "trend": pa.array(round6(trd), pa.float64()),
            "forecast_next": pa.array(round6(lvl + trd), pa.float64()),
        }
    )


EVENTS_HOLT_SQL = f"""
WITH RECURSIVE d AS (
    SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS x
        FROM events GROUP BY 1
    )
),
h(rn, day, x, l, b) AS (
    SELECT rn, day, x, x,
           coalesce((SELECT x FROM d WHERE rn = 2) - x, 0.0)
    FROM d WHERE rn = 1
    UNION ALL
    SELECT d.rn, d.day, d.x,
           {HOLT_ALPHA} * d.x + (1.0 - {HOLT_ALPHA}) * (h.l + h.b),
           {HOLT_BETA} * (({HOLT_ALPHA} * d.x
                + (1.0 - {HOLT_ALPHA}) * (h.l + h.b)) - h.l)
               + (1.0 - {HOLT_BETA}) * h.b
    FROM h JOIN d ON d.rn = h.rn + 1
)
SELECT CAST(day AS BIGINT) AS day, ROUND(l, 6) AS level,
       ROUND(b, 6) AS trend, ROUND(l + b, 6) AS forecast_next
FROM h
"""


# ---------------------------------------------------------------------------
# conv_preference_pairs — best-vs-worst pair mining per conversation
# ---------------------------------------------------------------------------


def q_conv_preference_pairs(sf_dir: str):
    """Preference-pair mining: per conversation (user), pair the
    highest-value purchase (chosen) against the lowest-value purchase
    (rejected) with the value margin — the grouped best-vs-worst pair
    construction preference-tuning datasets (reward models, DPO) are
    built from, with deterministic ties (value then event_id).
    Conversations with fewer than two purchases emit nothing.

    Plan: ONE keyed exchange on the conversation key; per partition a
    single lexsort yields each segment's first and last purchase row —
    no per-group Python."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    )

    def part_fn(t: pa.Table) -> pa.Table:
        from ..functions.numeric import round_half_away

        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "chosen_eid": pa.array([], pa.int64()),
                "rejected_eid": pa.array([], pa.int64()),
                "margin_cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        is_p = np.asarray(
            pc.equal(t["event_type"].combine_chunks(), "purchase")
        )
        if not is_p.any():
            return empty
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))[is_p]
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))[is_p]
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks())[is_p] * 100.0
        ).astype(np.int64)
        # ascending (value, eid) within user: first row of a segment is
        # the REJECTED pick, and the chosen is the max value with the
        # SMALLEST eid among ties -> take the first row of the max-value
        # run (lexsort is stable, eid ascending within equal value)
        order = np.lexsort((eid, cents, uid))
        u, e, c = uid[order], eid[order], cents[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        ends = np.append(starts[1:], len(u))  # exclusive
        seg_len = ends - starts
        multi = seg_len >= 2
        starts_m, ends_m = starts[multi], ends[multi]
        # first row of the max-value run: positions where value==seg max
        seg_id = np.repeat(np.arange(len(starts)), seg_len)
        seg_max = np.maximum.reduceat(c, starts)
        is_max = c == seg_max[seg_id]
        # first max position per segment: minimum index with is_max
        idx = np.arange(len(c))
        first_max = np.full(len(starts), np.iinfo(np.int64).max)
        np.minimum.at(first_max, seg_id[is_max], idx[is_max])
        chosen = first_max[multi]
        rejected = starts_m
        margin = c[chosen] - c[rejected]
        keep = chosen != rejected
        conv = [f"conv_{int(v)}" for v in u[starts_m][keep]]
        return pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "chosen_eid": pa.array(e[chosen][keep], pa.int64()),
                "rejected_eid": pa.array(e[rejected][keep], pa.int64()),
                "margin_cents": pa.array(margin[keep], pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "user_id", part_fn, num_parts=NUM_PARTS)


CONV_PREFERENCE_SQL = """
WITH p AS (
    SELECT user_id, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
r AS (
    SELECT *,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY cents DESC, event_id) AS rb,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY cents ASC, event_id) AS rw,
           count(*) OVER (PARTITION BY user_id) AS np
    FROM p
),
best AS (SELECT user_id, event_id AS chosen_eid, cents AS bc
         FROM r WHERE rb = 1 AND np >= 2),
worst AS (SELECT user_id, event_id AS rejected_eid, cents AS wc
          FROM r WHERE rw = 1)
SELECT 'conv_' || CAST(b.user_id AS VARCHAR) AS conv_id,
       b.chosen_eid, w.rejected_eid,
       CAST(b.bc - w.wc AS BIGINT) AS margin_cents
FROM best b JOIN worst w USING (user_id)
WHERE b.chosen_eid <> w.rejected_eid
"""


REGISTRY["events_holt_linear"] = (q_events_holt_linear, EVENTS_HOLT_SQL)
REGISTRY["conv_preference_pairs"] = (
    q_conv_preference_pairs,
    CONV_PREFERENCE_SQL,
)

"""Round-2m operators: corpus search, sequence mining, representation
evals, dataframe-API parity, and compliance tooling.

- ``docs_kwic``: keyword-in-context concordance for a target token —
  every occurrence with ``KWIC_CTX`` tokens of left/right context; the
  corpus-inspection tool behind "show me how X is used". Pure flat-map
  expansion, zero shuffles.
- ``events_subseq_support``: support of the A→B→C SUBSEQUENCE (strict
  time order, unbounded gaps) across users — sequence mining one level
  above the windowed 2-step ``events_funnel``. ONE user-keyed
  exchange; the three "earliest qualifying step" scans are segmented
  reduceat passes.
- ``eval_dim_truncation``: retrieval overlap@K between kNN on the
  first ``TRUNC_DIMS`` dimensions and full-dimension kNN — the
  Matryoshka-style truncation sweep that decides how many dims the
  serving index keeps. Two broadcast-scorer kNN runs, one tiny q_id
  groupby.
- ``eval_quant_recall``: the same overlap@K for globally int8-quantized
  vectors (``floor(x·127 + 0.5)/127``) — the quantization-loss eval
  beside ``embedding_quantize``'s codes.
- ``events_describe``: pandas ``describe()`` parity per event type —
  n, mean, std, min, p25/p50/p75 (ANSI ``percentile_disc``), max, in
  exact integer cents with one rounded division each. Per-type keyed
  partitions; the quantile is an O(1) sorted-index pick per group.
- ``gdpr_cascade_audit``: delete-impact audit for a deterministic
  data-subject set (``c_custkey % {GDPR_MOD} == {GDPR_RESIDUE}``):
  how many customer/orders/lineitem rows a right-to-be-forgotten
  request would cascade to — scan filters plus ONE cogroup semi-count
  for the grandchild table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6, round_half_away
from ..sources.reads import read_parquet_sized
from ..stages.keyed import cogroup_by_key, map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

KWIC_TARGET = "join"
KWIC_CTX = 2
SUBSEQ_A, SUBSEQ_B, SUBSEQ_C = "signup", "click", "purchase"
TRUNC_DIMS = 16
QUANT_LEVELS = 127
GDPR_MOD, GDPR_RESIDUE = 97, 3


# ---------------------------------------------------------------------------
# docs_kwic — keyword-in-context concordance
# ---------------------------------------------------------------------------


def q_docs_kwic(sf_dir: str):
    """Every occurrence of ``{KWIC_TARGET}`` with up to {KWIC_CTX}
    tokens of context on each side: (doc_id, pos 1-based, left, right).
    Vectorized: flat token gather, match positions via one compare,
    neighbor windows via clipped arange — no shuffle, row count =
    occurrence count."""
    from ..functions.text import _flat_tokens, tokens_list

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def kwic(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "left_ctx": pa.array([], pa.string()),
                "right_ctx": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        flat, offsets = _flat_tokens(tokens_list(t["text"]))
        n = len(flat)
        if n == 0:
            return empty
        ids = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        doc_pos = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        starts = np.repeat(offsets[:-1].astype(np.int64), lens)
        pos_in_doc = np.arange(n, dtype=np.int64) - starts
        hits = np.flatnonzero(
            np.asarray(pc.equal(flat, KWIC_TARGET))
        )
        if len(hits) == 0:
            return empty
        doc_of = doc_pos[hits]
        p = pos_in_doc[hits]
        start_of = starts[hits]
        len_of = lens[doc_of]

        def ctx(win_start: np.ndarray, win_len: np.ndarray) -> pa.Array:
            # vectorized variable-width window gather: flat indices via
            # a segmented arange, joined per window by one Arrow kernel
            offs = np.concatenate(([0], np.cumsum(win_len)))
            base = np.repeat(win_start, win_len)
            within = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(
                offs[:-1], win_len
            )
            gathered = flat.take(pa.array(base + within))
            lists = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), gathered
            )
            return pc.binary_join(lists, " ")

        left_lo = np.maximum(p - KWIC_CTX, 0)
        left = ctx(start_of + left_lo, p - left_lo)
        right_hi = np.minimum(p + 1 + KWIC_CTX, len_of)
        right = ctx(start_of + p + 1, right_hi - p - 1)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_of]),
                "pos": pa.array(p + 1),
                "left_ctx": left.cast(pa.string()),
                "right_ctx": right.cast(pa.string()),
            }
        )

    return ds.map_batches(kwic, batch_format="pyarrow",
                          zero_copy_batch=True)


DOCS_KWIC_SQL = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
hits AS (
    SELECT doc_id, ts, i AS pos
    FROM tok, unnest(range(1, len(ts) + 1)) AS t(i)
    WHERE ts[i] = '{KWIC_TARGET}'
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       coalesce(array_to_string(
           ts[greatest(pos - {KWIC_CTX}, 1):pos - 1], ' '), '')
           AS left_ctx,
       coalesce(array_to_string(
           ts[pos + 1:least(pos + {KWIC_CTX}, len(ts))], ' '), '')
           AS right_ctx
FROM hits
"""


# ---------------------------------------------------------------------------
# events_subseq_support — A→B→C subsequence mining
# ---------------------------------------------------------------------------


def q_events_subseq_support(sf_dir: str):
    """Fraction of users whose stream contains
    {SUBSEQ_A}→{SUBSEQ_B}→{SUBSEQ_C} as a strict-time-order subsequence
    (gaps unbounded): earliest-qualifying-step chain t1 < t2 < t3 via
    three segmented min-reduceat passes inside ONE user-keyed
    exchange."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(
                t["event_type"],
                value_set=pa.array([SUBSEQ_A, SUBSEQ_B, SUBSEQ_C]),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def per_user(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"p_users": pa.array([], pa.int64()),
             "p_matched": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        uid = np.asarray(part["user_id"].combine_chunks().cast(pa.int64()))
        us = np.asarray(part["ts"].combine_chunks().cast(pa.int64()))
        et = part["event_type"].combine_chunks()
        is_a = np.asarray(pc.equal(et, SUBSEQ_A))
        is_b = np.asarray(pc.equal(et, SUBSEQ_B))
        is_c = np.asarray(pc.equal(et, SUBSEQ_C))
        order = np.argsort(uid, kind="stable")
        uid, us = uid[order], us[order]
        is_a, is_b, is_c = is_a[order], is_b[order], is_c[order]
        starts = np.flatnonzero(
            np.concatenate(([True], uid[1:] != uid[:-1]))
        )
        seg = np.repeat(np.arange(len(starts)), np.diff(
            np.append(starts, len(uid))
        ))
        big = np.int64(1) << 62

        def earliest(mask: np.ndarray, after: np.ndarray) -> np.ndarray:
            # per segment: min ts among rows with mask & ts > after[seg]
            x = np.where(mask & (us > after[seg]), us, big)
            return np.minimum.reduceat(x, starts)

        neg = np.full(len(starts), -1, dtype=np.int64)
        t1 = earliest(is_a, neg)
        t2 = earliest(is_b, t1)
        t3 = earliest(is_c, t2)
        return pa.table(
            {
                "p_users": pa.array([len(starts)], pa.int64()),
                "p_matched": pa.array([int((t3 < big).sum())], pa.int64()),
            }
        )

    # NOTE: p_users counts users with >= 1 of the three types; users
    # with none can't match, but the denominator must be ALL users —
    # count them separately from the unpruned column
    part_counts = map_partitions_by_key(ds, "user_id", per_user,
                                        num_parts=NUM_PARTS)
    agg = part_counts.aggregate(
        Sum("p_users", alias_name="u"), Sum("p_matched", alias_name="m")
    )
    matched = int(agg["m"] or 0)

    all_users = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )

    def uid_partial(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        )
        return pa.table({"user_id": pa.array(u)})

    def count_distinct(part: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(part["user_id"].combine_chunks()))
        return pa.table({"pn": pa.array([len(u)], pa.int64())})

    n_users = int(
        map_partitions_by_key(
            all_users.map_batches(
                uid_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            "user_id",
            count_distinct,
            num_parts=NUM_PARTS,
        ).aggregate(Sum("pn", alias_name="n"))["n"]
        or 0
    )
    support = (
        float(round6(np.array([matched / n_users]))[0]) if n_users else None
    )
    return pa.table(
        {
            "n_users": pa.array([n_users], pa.int64()),
            "n_matched": pa.array([matched], pa.int64()),
            "support": pa.array([support], pa.float64()),
        }
    )


EVENTS_SUBSEQ_SQL = f"""
WITH a AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = '{SUBSEQ_A}' GROUP BY 1
),
b AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN a USING (user_id)
    WHERE e.event_type = '{SUBSEQ_B}' AND e.ts > a.t1 GROUP BY 1
),
c AS (
    SELECT e.user_id
    FROM events e JOIN b USING (user_id)
    WHERE e.event_type = '{SUBSEQ_C}' AND e.ts > b.t2 GROUP BY 1
),
t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events)
SELECT t.n AS n_users,
       (SELECT count(*) FROM c)::BIGINT AS n_matched,
       ROUND((SELECT count(*) FROM c) / CAST(t.n AS DOUBLE), 6) AS support
FROM t
"""


# ---------------------------------------------------------------------------
# eval_dim_truncation / eval_quant_recall — representation-loss evals
# ---------------------------------------------------------------------------


def _overlap_eval(sf_dir: str, transform, tag: str):
    """Shared overlap@K harness: kNN on transformed vectors vs full kNN,
    per-query overlap count and rate. ``transform(vals_2d) -> vals_2d``
    in float64."""
    from ray.data.aggregate import Sum

    from ..stages.ann import knn_bruteforce
    from .queries_ann import K, _emb, _query_tbl

    def apply_ds(ds):
        def fn(t: pa.Table) -> pa.Table:
            emb = t["embedding"].combine_chunks()
            offs = np.asarray(emb.offsets)
            if t.num_rows == 0:
                return t
            d = int(np.diff(offs)[0])
            vals = np.asarray(emb.values, dtype=np.float64).reshape(-1, d)
            out = transform(vals)
            d2 = out.shape[1]
            lst = pa.ListArray.from_arrays(
                pa.array(np.arange(len(out) + 1) * d2, pa.int32()),
                pa.array(out.ravel(), pa.float64()),
            )
            return pa.table(
                {"vec_id": t["vec_id"].cast(pa.int64()), "embedding": lst}
            )

        return ds.map_batches(fn, batch_format="pyarrow",
                              zero_copy_batch=True)

    def apply_tbl(tbl: pa.Table) -> pa.Table:
        emb = tbl["embedding"].combine_chunks()
        d = int(np.diff(np.asarray(emb.offsets))[0])
        vals = np.asarray(emb.values, dtype=np.float64).reshape(-1, d)
        out = transform(vals)
        d2 = out.shape[1]
        lst = pa.ListArray.from_arrays(
            pa.array(np.arange(len(out) + 1) * d2, pa.int32()),
            pa.array(out.ravel(), pa.float64()),
        )
        return pa.table(
            {"vec_id": tbl["vec_id"].cast(pa.int64()), "embedding": lst}
        )

    full = knn_bruteforce(_emb(sf_dir), _query_tbl(sf_dir), k=K)
    approx = knn_bruteforce(
        apply_ds(_emb(sf_dir)), apply_tbl(_query_tbl(sf_dir)), k=K
    )

    def side(ds, s: int):
        return ds.map_batches(
            lambda t, s=s: pa.table(
                {
                    "q_id": t["q_id"].cast(pa.int64()),
                    "vec_id": t["vec_id"].cast(pa.int64()),
                    "side": pa.array(
                        np.full(t.num_rows, s, dtype=np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    both = side(full, 0).union(side(approx, 1))

    def per_q(t: pa.Table) -> pa.Table:
        qid = int(t["q_id"][0].as_py())
        vid = np.asarray(t["vec_id"].combine_chunks())
        s = np.asarray(t["side"].combine_chunks())
        inter = len(np.intersect1d(vid[s == 0], vid[s == 1]))
        return pa.table(
            {
                "q_id": pa.array([qid], pa.int64()),
                "n_overlap": pa.array([inter], pa.int64()),
                "recall": pa.array(
                    [float(round6(np.array([inter / K]))[0])], pa.float64()
                ),
            }
        )

    return both.groupby("q_id").map_groups(per_q, batch_format="pyarrow")


def q_eval_dim_truncation(sf_dir: str):
    """Overlap@K of kNN on the first {TRUNC_DIMS} dims vs full-dim kNN
    (the Matryoshka truncation eval)."""
    return _overlap_eval(sf_dir, lambda v: v[:, :TRUNC_DIMS], "trunc")


def q_eval_quant_recall(sf_dir: str):
    """Overlap@K of kNN on globally int8-quantized vectors
    (floor(x·{QUANT_LEVELS} + 0.5)/{QUANT_LEVELS}) vs full-precision
    kNN."""

    def quant(v: np.ndarray) -> np.ndarray:
        return np.floor(v * QUANT_LEVELS + 0.5) / QUANT_LEVELS

    return _overlap_eval(sf_dir, quant, "quant")


def _overlap_sql(expr: str) -> str:
    from .queries_ann import K, N_QUERIES

    return f"""
WITH q AS (
    SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
fsims AS (
    SELECT q.q_id, e.vec_id,
           list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
    FROM q, embeddings e WHERE e.vec_id <> q.q_id
),
fr AS (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY sim DESC, vec_id) AS rank
    FROM fsims
),
fknn AS (SELECT q_id, vec_id FROM fr WHERE rank <= {K}),
asims AS (
    SELECT q.q_id, e.vec_id,
           list_cosine_similarity({expr.format(v='q.qe')},
                                  {expr.format(
                                      v='CAST(e.embedding AS DOUBLE[])'
                                  )}) AS sim
    FROM q, embeddings e WHERE e.vec_id <> q.q_id
),
ar AS (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY sim DESC, vec_id) AS rank
    FROM asims
),
aknn AS (SELECT q_id, vec_id FROM ar WHERE rank <= {K}),
ov AS (
    SELECT f.q_id, count(*)::BIGINT AS n_overlap
    FROM fknn f JOIN aknn a ON f.q_id = a.q_id AND f.vec_id = a.vec_id
    GROUP BY 1
)
SELECT q.q_id, coalesce(ov.n_overlap, 0)::BIGINT AS n_overlap,
       ROUND(coalesce(ov.n_overlap, 0) / CAST({K} AS DOUBLE), 6) AS recall
FROM q LEFT JOIN ov USING (q_id)
"""


def _dim_truncation_sql() -> str:
    return _overlap_sql("{v}[1:" + str(TRUNC_DIMS) + "]")


def _quant_recall_sql() -> str:
    return _overlap_sql(
        "list_transform({v}, x -> floor(x * "
        + str(QUANT_LEVELS)
        + " + 0.5) / "
        + f"{QUANT_LEVELS}.0)"
    )


# ---------------------------------------------------------------------------
# events_describe — describe() parity per event type
# ---------------------------------------------------------------------------


def q_events_describe(sf_dir: str):
    """pandas ``describe()`` per event type over ``value`` cents: n,
    mean, std (population), min, p25/p50/p75 (ANSI percentile_disc:
    smallest element with cume_dist ≥ p), max. ONE type-keyed exchange;
    quantiles are O(1) picks from the per-type sorted array.

    100-TB caveat: EXACT order statistics need each type's full value
    set in one partition, and event types are a tiny vocabulary — at
    corpus scale one partition holds ~1/|types| of the lake. This is
    inherent to exact disc quantiles; the scale path is the fixed-bin
    histogram quantile (``events_value_pctl_hist``), which this
    operator complements for small-group exactness."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(
        lambda t: t.filter(pc.is_valid(t["value"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def per_type(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "mean": pa.array([], pa.float64()),
                "std": pa.array([], pa.float64()),
                "min_c": pa.array([], pa.int64()),
                "p25_c": pa.array([], pa.int64()),
                "p50_c": pa.array([], pa.int64()),
                "p75_c": pa.array([], pa.int64()),
                "max_c": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        et = np.asarray(
            part["event_type"].combine_chunks().cast(pa.large_string())
        )
        c = round_half_away(
            np.asarray(part["value"].combine_chunks()).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        inv, uniq = pd.factorize(et)
        order = np.lexsort((c, inv))
        gi, cv = inv[order], c[order]
        starts = np.flatnonzero(
            np.concatenate(([True], gi[1:] != gi[:-1]))
        )
        ends = np.append(starts[1:], len(gi))
        n = (ends - starts).astype(np.int64)
        s = np.add.reduceat(cv, starts)
        q = np.add.reduceat(cv * cv, starts)
        mean = round6(s / n.astype(np.float64) / 100.0)
        var = (q - s * (s / n.astype(np.float64))) / n.astype(np.float64)
        std = round6(np.sqrt(np.maximum(var, 0.0)) / 100.0)

        def disc(p: float) -> np.ndarray:
            idx = np.ceil(n * p).astype(np.int64) - 1
            return cv[starts + np.maximum(idx, 0)]

        return pa.table(
            {
                "event_type": pa.array(
                    uniq[gi[starts]]).cast(pa.string()),
                "n": pa.array(n),
                "mean": pa.array(mean, pa.float64()),
                "std": pa.array(std, pa.float64()),
                "min_c": pa.array(cv[starts]),
                "p25_c": pa.array(disc(0.25)),
                "p50_c": pa.array(disc(0.50)),
                "p75_c": pa.array(disc(0.75)),
                "max_c": pa.array(cv[ends - 1]),
            }
        )

    return map_partitions_by_key(ds, "event_type", per_type,
                                 num_parts=NUM_PARTS)


EVENTS_DESCRIBE_SQL = """
WITH e AS (
    SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(sum(c) / CAST(count(*) AS DOUBLE) / 100.0, 6) AS mean,
       ROUND(sqrt(greatest((sum(c * c) - sum(c)
                            * (sum(c) / CAST(count(*) AS DOUBLE)))
                           / CAST(count(*) AS DOUBLE), 0.0)) / 100.0, 6)
           AS std,
       CAST(min(c) AS BIGINT) AS min_c,
       CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY c) AS BIGINT)
           AS p25_c,
       CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY c) AS BIGINT)
           AS p50_c,
       CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY c) AS BIGINT)
           AS p75_c,
       CAST(max(c) AS BIGINT) AS max_c
FROM e GROUP BY 1
"""


# ---------------------------------------------------------------------------
# gdpr_cascade_audit — right-to-be-forgotten delete impact
# ---------------------------------------------------------------------------


def q_gdpr_cascade_audit(sf_dir: str):
    """Rows a deletion request for subjects ``c_custkey % {GDPR_MOD} ==
    {GDPR_RESIDUE}`` would cascade to: customer (direct), orders (FK),
    lineitem (grandchild via the orders semi-join). Scan filters for
    the first two; ONE cogroup semi-count for the grandchild."""
    from ray.data.aggregate import Sum

    def count_scan(path: str, col: str, entity: str):
        def fn(t: pa.Table) -> pa.Table:
            k = np.asarray(t[col].combine_chunks()).astype(np.int64)
            m = int((k % GDPR_MOD == GDPR_RESIDUE).sum())
            return pa.table(
                {
                    "entity": pa.array([entity], pa.string()),
                    "pn": pa.array([m], pa.int64()),
                }
            )

        return read_parquet_sized(path, columns=[col]).map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True
        )

    cust = count_scan(
        f"{sf_dir}/customer.parquet", "c_custkey", "customer"
    )
    orders = count_scan(
        f"{sf_dir}/orders.parquet", "o_custkey", "orders"
    )

    def ord_filter(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].combine_chunks()).astype(np.int64)
        keep = ck % GDPR_MOD == GDPR_RESIDUE
        ok = np.asarray(t["o_orderkey"].combine_chunks()).astype(np.int64)
        return pa.table({"orderkey": pa.array(ok[keep])})

    ord_keys = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(ord_filter, batch_format="pyarrow", zero_copy_batch=True)
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).map_batches(
        lambda t: pa.table({"orderkey": t["l_orderkey"].cast(pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def semi_count(lpart: pa.Table, opart: pa.Table) -> pa.Table:
        if lpart.num_rows == 0:
            return pa.table(
                {"entity": pa.array([], pa.string()),
                 "pn": pa.array([], pa.int64())}
            )
        if opart.num_rows == 0:
            m = 0
        else:
            idx = pc.index_in(
                lpart["orderkey"],
                value_set=pc.unique(opart["orderkey"].combine_chunks()),
            )
            m = lpart.num_rows - idx.null_count
        return pa.table(
            {
                "entity": pa.array(["lineitem"], pa.string()),
                "pn": pa.array([m], pa.int64()),
            }
        )

    li_counts = cogroup_by_key(li, ord_keys, "orderkey", semi_count,
                               num_parts=NUM_PARTS)

    out = (
        cust.union(orders)
        .union(li_counts)
        .groupby("entity")
        .aggregate(Sum("pn", alias_name="matched_rows"))
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "entity": t["entity"],
                "matched_rows": t["matched_rows"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


GDPR_CASCADE_SQL = f"""
SELECT 'customer' AS entity, count(*)::BIGINT AS matched_rows
FROM customer WHERE c_custkey % {GDPR_MOD} = {GDPR_RESIDUE}
UNION ALL
SELECT 'orders', count(*)::BIGINT
FROM orders WHERE o_custkey % {GDPR_MOD} = {GDPR_RESIDUE}
UNION ALL
SELECT 'lineitem', count(*)::BIGINT
FROM lineitem l
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_orderkey = l.l_orderkey
      AND o.o_custkey % {GDPR_MOD} = {GDPR_RESIDUE}
)
"""


REGISTRY = {
    "docs_kwic": (q_docs_kwic, DOCS_KWIC_SQL),
    "events_subseq_support": (q_events_subseq_support, EVENTS_SUBSEQ_SQL),
    "eval_dim_truncation": (q_eval_dim_truncation, _dim_truncation_sql()),
    "eval_quant_recall": (q_eval_quant_recall, _quant_recall_sql()),
    "events_describe": (q_events_describe, EVENTS_DESCRIBE_SQL),
    "gdpr_cascade_audit": (q_gdpr_cascade_audit, GDPR_CASCADE_SQL),
}


# ---------------------------------------------------------------------------
# ipc_ingest — Arrow-IPC landing zone via the custom datasource
# ---------------------------------------------------------------------------

IPC_SEED = 91


def _ipc_dir(sf_dir: str = "") -> str:
    """Deterministic IPC fixture (plus a parquet TWIN of the same table
    for the DuckDB oracle), created once under /tmp via the shared
    concurrency-safe build protocol (pipelines/fixtures.py)."""
    import os

    import pyarrow.parquet as pq

    from .fixtures import build_fixture_dir
    from ..sources.ipc import write_ipc
    from ..sources.transcripts import generate_transcripts

    def build(tmp: str) -> None:
        tbl = generate_transcripts(n_convs=60, avg_turns=20, seed=IPC_SEED)
        write_ipc(tbl, tmp, rows_per_file=2000)
        pq.write_table(tbl, os.path.join(tmp, "twin.parquet"))

    return build_fixture_dir("ipc", build)


def q_ipc_ingest(sf_dir: str):
    """Arrow-IPC ingest through the engine's CUSTOM Ray Data datasource
    (sources/ipc.py): record batches stream out of each file as blocks;
    canonical column projection on top. The oracle reads a parquet twin
    of the same generated table — exact round trip."""
    from ..sources.ipc import read_ipc

    ds = read_ipc(_ipc_dir(sf_dir))
    return ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "role", "text", "tool",
                            "ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _ipc_oracle_sql() -> str:
    d = _ipc_dir()
    return f"""
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, role, text, tool,
       CAST(ts AS TIMESTAMP) AS ts
FROM read_parquet('{d}/twin.parquet')
"""


REGISTRY["ipc_ingest"] = (q_ipc_ingest, _ipc_oracle_sql())

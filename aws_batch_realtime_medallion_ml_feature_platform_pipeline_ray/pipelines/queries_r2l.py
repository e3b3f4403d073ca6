"""Round-2l operators: privacy, model calibration, LM statistics,
graph components, seasonal adjustment, concentration, and the last
classic scan shape.

- ``events_l_diversity``: l-diversity audit — per quasi-identifier
  group (hour, value bucket), the count of DISTINCT sensitive values
  (event_type); groups below ``LDIV_L`` are privacy violations even
  when k-anonymous. The companion to ``events_k_anonymity``.
- ``docs_lr_brier``: Brier score with the Murphy decomposition
  (reliability / resolution / uncertainty) of the frozen quality
  classifier against the ``lang='en'`` label, over score deciles —
  the calibration summary beside AUC and the reliability curve.
- ``docs_unigram_xent``: per-document cross-entropy under the corpus
  unigram LM (−Σ tf·ln(cf/N) / len) — the float sibling of the
  integer ``docs_commonness`` signal and the cheapest perplexity-style
  quality filter. Global counts ride the same term-keyed exchange.
- ``embedding_knn_components``: connected components of the MUTUAL
  kNN graph (isolated vectors form singletons) — the cluster structure
  behind graph-based semi-supervision; CC via the engine's
  hash-to-min label propagation, twin via recursive closure.
- ``events_dow_adjusted``: day-of-week–adjusted daily counts
  (residual vs the per-dow mean) — the seasonal-adjustment step before
  anomaly flagging, exact integer counts with one rational compare
  mirrored in doubles.
- ``orders_revenue_hhi``: Herfindahl–Hirschman concentration index of
  customer revenue per nation — the whale-risk summary beside the Gini
  (``events_value_gini``). Per-customer folds, nation-keyed finale.
- ``train_temp_scaling``: temperature scaling by exact grid search —
  per-temperature NLL of the frozen classifier over a fixed T grid,
  argmin reported; the standard post-hoc calibration fit as a
  distributed partial-sum job.
- ``lineitem_q6_revenue``: the classic scan-filter-aggregate (TPC-H
  Q6 shape): discount-band revenue in a ship-year window, exact
  integer cents×pct, zero exchanges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import div_trunc, round6, round_half_away
from ..sources.reads import read_parquet_sized
from ..stages.keyed import cogroup_by_key, fold_by_keys, map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

LDIV_L = 3
LDIV_VBUCKET_C = 5000
BRIER_BINS = 10
TEMP_GRID = (0.5, 0.75, 1.0, 1.5, 2.0)
Q6_YEAR_LO, Q6_YEAR_HI = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 5, 7  # discount percent band, inclusive
Q6_MAX_QTY_C = 2400  # quantity < 24, in cents


# ---------------------------------------------------------------------------
# events_l_diversity — distinct-sensitive-value privacy audit
# ---------------------------------------------------------------------------


def q_events_l_diversity(sf_dir: str):
    """Per QI group (hour-of-day, value bucket): row count and DISTINCT
    event_type count; summary row counts groups with fewer than
    {LDIV_L} distinct sensitive values. Distinct-triple partials
    collapse per batch; the QI space is bounded (24 × value buckets),
    so one small groupby finishes."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "hod": pa.array([], pa.int64()),
                "vbucket": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "pn": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        hod = (us // 3_600_000_000) % 24
        val = t["value"].combine_chunks()
        valid = np.asarray(pc.is_valid(val))
        vb = np.full(t.num_rows, -1, dtype=np.int64)
        if valid.any():
            cents = round_half_away(
                np.asarray(val)[valid].astype(np.float64) * 100.0
            ).astype(np.int64)
            vb[valid] = div_trunc(cents, LDIV_VBUCKET_C)
        et = np.asarray(
            t["event_type"].combine_chunks().cast(pa.large_string())
        )
        inv, uniq = pd.factorize(et)
        order = np.lexsort((inv, vb, hod))
        h, v, e = hod[order], vb[order], inv[order]
        head = np.concatenate(
            ([True], (h[1:] != h[:-1]) | (v[1:] != v[:-1]) | (e[1:] != e[:-1]))
        )
        starts = np.flatnonzero(head)
        cnt = np.diff(np.append(starts, len(h)))
        return pa.table(
            {
                "hod": pa.array(h[starts]),
                "vbucket": pa.array(v[starts]),
                "event_type": pa.array(uniq[e[starts]]).cast(pa.string()),
                "pn": pa.array(cnt.astype(np.int64)),
            }
        )

    trip = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hod", "vbucket", "event_type"])
        .aggregate(Sum("pn", alias_name="n"))
    )

    def finale(t: pa.Table) -> pa.Table:
        h = np.asarray(t["hod"].combine_chunks())
        v = np.asarray(t["vbucket"].combine_chunks())
        n = np.asarray(t["n"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((v, h))
        h, v, n = h[order], v[order], n[order]
        head = np.concatenate(
            ([True], (h[1:] != h[:-1]) | (v[1:] != v[:-1]))
        )
        starts = np.flatnonzero(head)
        rows = np.add.reduceat(n, starts)
        lvals = np.diff(np.append(starts, len(h)))
        return pa.table(
            {
                "hod": pa.array(h[starts], pa.int64()),
                "vbucket": pa.array(v[starts], pa.int64()),
                "n_rows": pa.array(rows),
                "l_distinct": pa.array(lvals.astype(np.int64)),
                "violates": pa.array(
                    (lvals < LDIV_L).astype(np.int64), pa.int64()
                ),
            }
        )

    return trip.repartition(1).map_batches(finale, batch_format="pyarrow")


EVENTS_L_DIVERSITY_SQL = f"""
WITH g AS (
    SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS hod,
           CASE WHEN value IS NULL THEN -1
                ELSE CAST(ROUND(value * 100, 0) AS BIGINT)
                     // {LDIV_VBUCKET_C} END AS vbucket,
           event_type
    FROM events
)
SELECT hod, vbucket,
       count(*)::BIGINT AS n_rows,
       CAST(count(DISTINCT event_type) AS BIGINT) AS l_distinct,
       CAST(count(DISTINCT event_type) < {LDIV_L} AS BIGINT) AS violates
FROM g GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# docs_lr_brier — Brier score with Murphy decomposition
# ---------------------------------------------------------------------------


def q_docs_lr_brier(sf_dir: str):
    """Brier = mean (s−y)², decomposed over {BRIER_BINS} score deciles:
    REL = Σ n_b(s̄_b − ȳ_b)²/N, RES = Σ n_b(ȳ_b − ȳ)²/N,
    UNC = ȳ(1−ȳ). Per-batch partials per bin (n, Σy, Σs, Σ(s−y)²) —
    the scores are the ROUND(,6) frozen-LR outputs so both engines bin
    and difference identical doubles."""
    from ray.data.aggregate import Sum

    from .queries_text import lr_quality_scores

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]
    )

    cols = ["n", "sy", "ss", "sq"]

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"bin": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64()),
             "sy": pa.array([], pa.int64()),
             "ss": pa.array([], pa.float64()),
             "sq": pa.array([], pa.float64())}
        )
        if t.num_rows == 0:
            return empty
        s = lr_quality_scores(t["text"].combine_chunks())
        y = np.asarray(
            pc.equal(t["lang"].combine_chunks(), "en")
        ).astype(np.int64)
        b = np.minimum(np.trunc(s * BRIER_BINS).astype(np.int64),
                       BRIER_BINS - 1)
        inv, uniq = pd.factorize(b)
        out = {"bin": pa.array(uniq.astype(np.int64))}
        n = np.bincount(inv).astype(np.int64)
        sy = np.zeros(len(uniq), np.int64)
        np.add.at(sy, inv, y)
        ss = np.zeros(len(uniq), np.float64)
        np.add.at(ss, inv, s)
        r = s - y
        sq = np.zeros(len(uniq), np.float64)
        np.add.at(sq, inv, r * r)
        return pa.table(
            {"bin": pa.array(uniq.astype(np.int64)), "n": pa.array(n),
             "sy": pa.array(sy), "ss": pa.array(ss, pa.float64()),
             "sq": pa.array(sq, pa.float64())}
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )

    def finale(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t["bin"])
        n = np.asarray(t["n"].combine_chunks().take(order), dtype=np.int64)
        sy = np.asarray(t["sy"].combine_chunks().take(order),
                        dtype=np.int64)
        ss = np.asarray(t["ss"].combine_chunks().take(order))
        sq = np.asarray(t["sq"].combine_chunks().take(order))
        big_n = float(n.sum())
        base = float(sy.sum()) / big_n
        sbar = ss / n.astype(np.float64)
        ybar = sy / n.astype(np.float64)
        brier = float(sq.sum()) / big_n
        rel = float(np.sum(n * (sbar - ybar) ** 2)) / big_n
        res = float(np.sum(n * (ybar - base) ** 2)) / big_n
        unc = base * (1.0 - base)
        return pa.table(
            {
                "n_docs": pa.array([int(big_n)], pa.int64()),
                "brier": pa.array([float(round6(brier))], pa.float64()),
                "reliability": pa.array([float(round6(rel))], pa.float64()),
                "resolution": pa.array([float(round6(res))], pa.float64()),
                "uncertainty": pa.array([float(round6(unc))], pa.float64()),
            }
        )

    return folded.repartition(1).map_batches(finale, batch_format="pyarrow")


def _brier_sql() -> str:
    from .queries_text import (
        _STOP_IN,
        LR_B,
        LR_W_AVGLEN,
        LR_W_LOGTOK,
        LR_W_STOP,
    )

    return f"""
WITH f AS (
    SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        length(string_split(text, ' ')) AS n_tokens,
        (length(text) - (length(string_split(text, ' ')) - 1))
            / CAST(length(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
        len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_IN})))
            / CAST(length(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
    FROM documents
),
s AS (
    SELECT y,
           ROUND(1.0 / (1.0 + exp(-({LR_B} + {LR_W_LOGTOK} * ln(1.0 + n_tokens)
               + {LR_W_AVGLEN} * avg_token_len
               + {LR_W_STOP} * stopword_ratio))), 6) AS sc
    FROM f
),
b AS (
    SELECT LEAST(CAST(trunc(sc * {BRIER_BINS}) AS BIGINT),
                 {BRIER_BINS - 1}) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS sy,
           sum(sc) AS ss,
           sum((sc - y) * (sc - y)) AS sq
    FROM s GROUP BY 1
),
t AS (
    SELECT CAST(sum(n) AS DOUBLE) AS big_n,
           sum(sy) / CAST(sum(n) AS DOUBLE) AS base
    FROM b
)
SELECT CAST(t.big_n AS BIGINT) AS n_docs,
       ROUND(sum(b.sq) / t.big_n, 6) AS brier,
       ROUND(sum(b.n * (b.ss / b.n - b.sy / CAST(b.n AS DOUBLE))
                 * (b.ss / b.n - b.sy / CAST(b.n AS DOUBLE))) / t.big_n, 6)
           AS reliability,
       ROUND(sum(b.n * (b.sy / CAST(b.n AS DOUBLE) - t.base)
                 * (b.sy / CAST(b.n AS DOUBLE) - t.base)) / t.big_n, 6)
           AS resolution,
       ROUND(t.base * (1.0 - t.base), 6) AS uncertainty
FROM b CROSS JOIN t GROUP BY t.big_n, t.base
"""


# ---------------------------------------------------------------------------
# docs_unigram_xent — per-doc cross-entropy under the corpus unigram LM
# ---------------------------------------------------------------------------


def q_docs_unigram_xent(sf_dir: str):
    """Per document: token count and cross-entropy
    −Σ_types tf·ln(cf/N) / len under the corpus unigram distribution —
    the cheapest perplexity-style quality signal. Same plan as
    ``docs_commonness``: (doc, term, tf) partials → term-keyed exchange
    attaches global counts → per-doc float partials → doc-keyed fold."""
    from ray.data.aggregate import Sum

    from .queries_extra import _tf_partial

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tf_rows = ds.map_batches(_tf_partial, batch_format="pyarrow",
                             zero_copy_batch=True)

    # pass 1: exact global N (total token count) from tf partials
    n_total = int(
        tf_rows.map_batches(
            lambda t: pa.table(
                {"s": pa.array(
                    [int(np.asarray(t["tf"].combine_chunks()).sum())]
                    if t.num_rows else [0],
                    pa.int64(),
                )}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).aggregate(Sum("s", alias_name="s"))["s"]
        or 0
    )
    nf = float(n_total)

    def weigh(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "p_x": pa.array([], pa.float64()),
             "p_len": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        term = np.asarray(
            part["term"].combine_chunks().cast(pa.large_string())
        )
        tf = np.asarray(part["tf"].combine_chunks()).astype(np.int64)
        inv, uniq = pd.factorize(term)
        cf = np.zeros(len(uniq), np.int64)
        np.add.at(cf, inv, tf)
        x = tf * np.log(cf[inv].astype(np.float64) / nf)
        doc = np.asarray(part["doc_id"].combine_chunks())
        d_inv, d_uniq = pd.factorize(doc)
        xs = np.zeros(len(d_uniq), np.float64)
        np.add.at(xs, d_inv, x)
        ln = np.zeros(len(d_uniq), np.int64)
        np.add.at(ln, d_inv, tf)
        return pa.table(
            {
                "doc_id": pa.array(d_uniq, pa.int64()),
                "p_x": pa.array(xs, pa.float64()),
                "p_len": pa.array(ln),
            }
        )

    partials = map_partitions_by_key(tf_rows, "term", weigh,
                                     num_parts=NUM_PARTS)
    folded = fold_by_keys(
        partials, ["doc_id"], sums=("p_x", "p_len"), num_parts=NUM_PARTS
    )

    def finish(t: pa.Table) -> pa.Table:
        x = np.asarray(t["p_x"].combine_chunks())
        ln = np.asarray(t["p_len"].combine_chunks(), dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_toks": pa.array(ln),
                "xent": pa.array(
                    round6(-x / ln.astype(np.float64)), pa.float64()
                ),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


DOCS_UNIGRAM_XENT_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
nt AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM tf)
SELECT tf.doc_id,
       CAST(sum(tf.tf) AS BIGINT) AS n_toks,
       ROUND(-sum(tf.tf * ln(cf.cf / nt.n))
             / CAST(sum(tf.tf) AS DOUBLE), 6) AS xent
FROM tf JOIN cf USING (term) CROSS JOIN nt
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# embedding_knn_components — CC of the mutual-kNN graph
# ---------------------------------------------------------------------------


def q_embedding_knn_components(sf_dir: str):
    """Connected components of the mutual-kNN graph (labels = smallest
    vec_id in component; vectors with no mutual edge are singletons).
    Mutual edges from ONE pair-keyed exchange over the kNN self-join,
    CC via the engine's hash-to-min label propagation."""
    from ..stages.ann import knn_self_join
    from ..stages.graph import connected_components
    from .queries_ann import K, _emb

    knn = knn_self_join(_emb(sf_dir), k=K, n_blocks=4)

    def pack(t: pa.Table) -> pa.Table:
        q = np.asarray(t["q_id"].combine_chunks()).astype(np.int64)
        v = np.asarray(t["vec_id"].combine_chunks()).astype(np.int64)
        lo = np.minimum(q, v)
        hi = np.maximum(q, v)
        if len(lo) and int(hi.max()) >= (1 << 31):
            raise OverflowError("pair packing requires ids < 2^31")
        return pa.table({"pair": pa.array((lo << np.int64(32)) | hi)})

    pairs = knn.map_batches(pack, batch_format="pyarrow",
                            zero_copy_batch=True)

    def mutual_edges(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        pk = np.sort(np.asarray(part["pair"].combine_chunks()))
        starts = np.flatnonzero(
            np.concatenate(([True], pk[1:] != pk[:-1]))
        )
        cnt = np.diff(np.append(starts, len(pk)))
        both = pk[starts][cnt == 2]
        return pa.table(
            {
                "doc_a": pa.array(both >> np.int64(32)),
                "doc_b": pa.array(both & np.int64(0xFFFFFFFF)),
            }
        )

    edges = map_partitions_by_key(pairs, "pair", mutual_edges,
                                  num_parts=NUM_PARTS)
    labels = connected_components(edges, num_parts=NUM_PARTS)

    ids = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(
        lambda t: pa.table({"node": t["vec_id"].cast(pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    comp_schema = {"vec_id": pa.int64(), "component": pa.int64()}

    def attach(ipart: pa.Table, lpart: pa.Table) -> pa.Table:
        empty = pa.table(
            {n: pa.array([], t) for n, t in comp_schema.items()}
        )
        if ipart.num_rows == 0:
            return empty
        node = np.asarray(ipart["node"].combine_chunks())
        comp = node.copy()  # singleton default
        if lpart.num_rows:
            idx = pc.index_in(
                ipart["node"], value_set=lpart["node"].combine_chunks()
            ).combine_chunks()
            hit = np.asarray(pc.is_valid(idx))
            rep = np.asarray(lpart["rep"].combine_chunks())
            # null positions must be filled BEFORE asarray (a nullable
            # arrow int converts to float64/NaN and breaks indexing)
            idx_np = np.asarray(idx.fill_null(0))
            comp[hit] = rep[idx_np[hit]]
        return pa.table(
            {"vec_id": pa.array(node), "component": pa.array(comp)}
        )

    return cogroup_by_key(
        ids,
        labels.map_batches(
            lambda t: pa.table(
                {"node": t["node"].cast(pa.int64()),
                 "rep": t["rep"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "node",
        attach,
        num_parts=NUM_PARTS,
    )


def _knn_components_sql() -> str:
    from .queries_ann import K

    return f"""
WITH RECURSIVE sims AS (
    SELECT a.vec_id AS q_id, b.vec_id,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) AS sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id <> b.vec_id
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY sim DESC, vec_id) AS rank
    FROM sims
),
knn AS (SELECT q_id, vec_id FROM r WHERE rank <= {K}),
mut AS (
    SELECT a.q_id AS a, a.vec_id AS b
    FROM knn a JOIN knn b ON a.q_id = b.vec_id AND a.vec_id = b.q_id
    WHERE a.q_id < a.vec_id
),
und AS (SELECT a, b FROM mut UNION SELECT b, a FROM mut),
reach(a, b) AS (
    SELECT a, b FROM und
    UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
),
lab AS (
    SELECT a AS node, LEAST(a, MIN(b))::BIGINT AS rep
    FROM reach GROUP BY a
)
SELECT e.vec_id, coalesce(lab.rep, e.vec_id)::BIGINT AS component
FROM embeddings e LEFT JOIN lab ON e.vec_id = lab.node
"""


# ---------------------------------------------------------------------------
# events_dow_adjusted — day-of-week seasonal adjustment
# ---------------------------------------------------------------------------


def q_events_dow_adjusted(sf_dir: str):
    """Daily event counts with the per-day-of-week mean removed:
    (d, n, dow, dow_mean, residual) over the exact [min_day, max_day]
    grid (absent days count 0 and shape the means) — the seasonal
    adjustment that turns weekly rhythm into a flat anomaly baseline."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        d = us // 86_400_000_000
        dd, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"d": pa.array(dd), "pn": pa.array(cnt.astype(np.int64))}
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("d")
        .aggregate(Sum("pn", alias_name="n"))
    )
    tiny = folded.to_pandas()  # O(active days), calendar-bounded
    if len(tiny) == 0:
        return pa.table(
            {
                "d": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "dow": pa.array([], pa.int64()),
                "dow_mean": pa.array([], pa.float64()),
                "residual": pa.array([], pa.float64()),
            }
        )
    d = tiny["d"].to_numpy(np.int64)
    d0, d1 = int(d.min()), int(d.max())
    days = np.arange(d0, d1 + 1, dtype=np.int64)
    x = np.zeros(len(days), dtype=np.int64)
    x[d - d0] = tiny["n"].to_numpy(np.int64)
    dow = (days + 4) % 7
    sums = np.zeros(7, np.int64)
    cnts = np.zeros(7, np.int64)
    np.add.at(sums, dow, x)
    np.add.at(cnts, dow, 1)
    mean = sums / cnts.astype(np.float64)
    return pa.table(
        {
            "d": pa.array(days),
            "n": pa.array(x),
            "dow": pa.array(dow),
            "dow_mean": pa.array(round6(mean[dow]), pa.float64()),
            "residual": pa.array(round6(x - mean[dow]), pa.float64()),
        }
    )


EVENTS_DOW_ADJUSTED_SQL = """
WITH c AS (
    SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1
),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM c),
grid AS (
    SELECT CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS d FROM b
),
f AS (
    SELECT grid.d, coalesce(c.n, 0) AS n, (grid.d + 4) % 7 AS dow
    FROM grid LEFT JOIN c USING (d)
),
m AS (
    SELECT dow, CAST(sum(n) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS k
    FROM f GROUP BY 1
)
SELECT f.d, f.n, f.dow,
       ROUND(m.s / CAST(m.k AS DOUBLE), 6) AS dow_mean,
       ROUND(f.n - m.s / CAST(m.k AS DOUBLE), 6) AS residual
FROM f JOIN m USING (dow)
"""


# ---------------------------------------------------------------------------
# orders_revenue_hhi — customer-revenue concentration per nation
# ---------------------------------------------------------------------------


def q_orders_revenue_hhi(sf_dir: str):
    """Herfindahl index of customer order revenue per nation:
    HHI = Σ_cust (rev_cust / rev_nation)². Per-customer revenue folds
    exactly in cents; ONE cogroup attaches nations; the share squares
    run inside each nation group (25 groups) with ROUND(,6)."""
    from ray.data.aggregate import Sum

    def ord_partial(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].combine_chunks()).astype(np.int64)
        rev = round_half_away(
            np.asarray(t["o_totalprice"].combine_chunks()).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        order = np.argsort(ck, kind="stable")
        c, r = ck[order], rev[order]
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        return pa.table(
            {
                "custkey": pa.array(c[starts]),
                "rev_c": pa.array(np.add.reduceat(r, starts)),
            }
        )

    per_cust = fold_by_keys(
        read_parquet_sized(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        ).map_batches(ord_partial, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["custkey"],
        sums=("rev_c",),
        num_parts=NUM_PARTS,
    )

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "custkey": t["c_custkey"].cast(pa.int64()),
                "nationkey": t["c_nationkey"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    nat_schema = {"nationkey": pa.int64(), "rev_c": pa.int64()}

    def attach(lpart: pa.Table, cpart: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], t) for n, t in nat_schema.items()})
        if lpart.num_rows == 0 or cpart.num_rows == 0:
            return empty
        idx = pc.index_in(
            lpart["custkey"], value_set=cpart["custkey"].combine_chunks()
        ).combine_chunks()
        keep = pc.is_valid(idx)
        if not pc.any(keep).as_py():
            return empty
        nk = np.asarray(cpart["nationkey"].combine_chunks())[
            np.asarray(idx.filter(keep))
        ]
        rv = np.asarray(lpart["rev_c"].combine_chunks())[np.asarray(keep)]
        return pa.table(
            {"nationkey": pa.array(nk), "rev_c": pa.array(rv)}
        )

    per_cust_nat = cogroup_by_key(per_cust, cust, "custkey", attach,
                                  num_parts=NUM_PARTS)

    def hhi(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c_nationkey": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
                "total_rev_c100": pa.array([], pa.int64()),
                "hhi": pa.array([], pa.float64()),
            }
        )
        if part.num_rows == 0:
            return empty
        nk = np.asarray(part["nationkey"].combine_chunks())
        rv = np.asarray(part["rev_c"].combine_chunks())
        order = np.argsort(nk, kind="stable")
        nk, rv = nk[order], rv[order]
        starts = np.flatnonzero(np.concatenate(([True], nk[1:] != nk[:-1])))
        tot = np.add.reduceat(rv, starts)
        n = np.diff(np.append(starts, len(nk)))
        share = rv / np.repeat(tot.astype(np.float64), n)
        h = round6(np.add.reduceat(share * share, starts))
        return pa.table(
            {
                "c_nationkey": pa.array(nk[starts]),
                "n_customers": pa.array(n.astype(np.int64)),
                "total_rev_c100": pa.array(tot),
                "hhi": pa.array(h, pa.float64()),
            }
        )

    return map_partitions_by_key(per_cust_nat, "nationkey", hhi,
                                 num_parts=NUM_PARTS)


ORDERS_REVENUE_HHI_SQL = """
WITH pc AS (
    SELECT o_custkey,
           CAST(sum(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev_c
    FROM orders GROUP BY 1
),
pn AS (
    SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey, pc.rev_c
    FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey
),
t AS (
    SELECT c_nationkey, CAST(sum(rev_c) AS BIGINT) AS tot,
           count(*)::BIGINT AS n
    FROM pn GROUP BY 1
)
SELECT pn.c_nationkey,
       t.n AS n_customers,
       t.tot AS total_rev_c100,
       ROUND(sum((pn.rev_c / CAST(t.tot AS DOUBLE))
                 * (pn.rev_c / CAST(t.tot AS DOUBLE))), 6) AS hhi
FROM pn JOIN t USING (c_nationkey)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# train_temp_scaling — calibration temperature by exact grid search
# ---------------------------------------------------------------------------


def q_train_temp_scaling(sf_dir: str):
    """Per temperature T in {TEMP_GRID}: mean NLL of the frozen
    classifier's T-scaled probabilities vs the lang='en' label, plus an
    ``is_best`` flag (lowest NLL, ties → smaller T). Per-batch partial
    NLL sums per T (|grid| doubles per block) — the standard post-hoc
    calibration fit as a distributed partial-sum job."""
    from ray.data.aggregate import Sum

    from ..functions import text as T_
    from .queries_text import LR_B, LR_W_AVGLEN, LR_W_LOGTOK, LR_W_STOP

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]
    )

    cols = ["n"] + [f"nll{i}" for i in range(len(TEMP_GRID))]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n": pa.array([], pa.int64()),
                 **{c: pa.array([], pa.float64()) for c in cols[1:]}}
            )
        texts = t["text"].combine_chunks()
        m = T_.quality_metrics(texts)
        z = (
            LR_B
            + LR_W_LOGTOK * np.log(1.0 + m["n_tokens"].astype(np.float64))
            + LR_W_AVGLEN * m["avg_token_len"]
            + LR_W_STOP * m["stopword_ratio"]
        )
        y = np.asarray(
            pc.equal(t["lang"].combine_chunks(), "en")
        ).astype(np.float64)
        out = {"n": pa.array([t.num_rows], pa.int64())}
        for i, temp in enumerate(TEMP_GRID):
            p = 1.0 / (1.0 + np.exp(-(z / temp)))
            nll = -(y * np.log(p) + (1.0 - y) * np.log(1.0 - p))
            out[f"nll{i}"] = pa.array([float(nll.sum())], pa.float64())
        return pa.table(out)

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*[Sum(c, alias_name=c) for c in cols])
    n = int(agg["n"] or 0)
    nlls = [
        float(round6((agg[f"nll{i}"] or 0.0) / float(n))) if n else None
        for i in range(len(TEMP_GRID))
    ]
    best = min(range(len(TEMP_GRID)),
               key=lambda i: (nlls[i], TEMP_GRID[i])) if n else -1
    return pa.table(
        {
            "temperature": pa.array(list(TEMP_GRID), pa.float64()),
            "mean_nll": pa.array(nlls, pa.float64()),
            "is_best": pa.array(
                [int(i == best) for i in range(len(TEMP_GRID))], pa.int64()
            ),
        }
    )


def _temp_scaling_sql() -> str:
    from .queries_text import (
        _STOP_IN,
        LR_B,
        LR_W_AVGLEN,
        LR_W_LOGTOK,
        LR_W_STOP,
    )

    grid = ", ".join(f"({t})" for t in TEMP_GRID)
    return f"""
WITH f AS (
    SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        {LR_B} + {LR_W_LOGTOK} * ln(1.0 + length(string_split(text, ' ')))
        + {LR_W_AVGLEN} * ((length(text)
                            - (length(string_split(text, ' ')) - 1))
            / CAST(length(string_split(text, ' ')) AS DOUBLE))
        + {LR_W_STOP} * (len(list_filter(string_split(text, ' '),
                                         x -> x IN ({_STOP_IN})))
            / CAST(length(string_split(text, ' ')) AS DOUBLE)) AS z
    FROM documents
),
g(temperature) AS (VALUES {grid}),
nl AS (
    SELECT g.temperature,
           sum(-(f.y * ln(1.0 / (1.0 + exp(-(f.z / g.temperature))))
                 + (1.0 - f.y)
                   * ln(1.0 - 1.0 / (1.0 + exp(-(f.z / g.temperature))))))
               AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM g CROSS JOIN f GROUP BY 1
),
sc AS (SELECT temperature, ROUND(s / CAST(n AS DOUBLE), 6) AS mean_nll
       FROM nl),
best AS (
    SELECT temperature FROM sc
    ORDER BY mean_nll ASC, temperature ASC LIMIT 1
)
SELECT sc.temperature, sc.mean_nll,
       CAST(sc.temperature = (SELECT temperature FROM best) AS BIGINT)
           AS is_best
FROM sc
"""


# ---------------------------------------------------------------------------
# lineitem_q6_revenue — classic scan-filter-aggregate
# ---------------------------------------------------------------------------


def q_lineitem_q6_revenue(sf_dir: str):
    """Discount-band revenue (TPC-H Q6 shape): Σ extendedprice·discount
    for lineitems shipped in [{Q6_YEAR_LO}, {Q6_YEAR_HI}), discount in
    [{Q6_DISC_LO}, {Q6_DISC_HI}]%, quantity < 24 — exact integer
    cents×pct, pure streaming scan, zero exchanges."""
    from ray.data.aggregate import Sum

    lo = np.datetime64(Q6_YEAR_LO, "us")
    hi = np.datetime64(Q6_YEAR_HI, "us")

    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        sd = np.asarray(t["l_shipdate"].combine_chunks())
        disc = round_half_away(
            np.asarray(t["l_discount"].combine_chunks()).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        qty = round_half_away(
            np.asarray(t["l_quantity"].combine_chunks()).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        keep = (
            (sd >= lo)
            & (sd < hi)
            & (disc >= Q6_DISC_LO)
            & (disc <= Q6_DISC_HI)
            & (qty < Q6_MAX_QTY_C)
        )
        price = round_half_away(
            np.asarray(t["l_extendedprice"].combine_chunks())[keep].astype(
                np.float64
            )
            * 100.0
        ).astype(np.int64)
        rev = price * disc[keep]
        return pa.table(
            {
                "rev": pa.array([int(rev.sum())], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("rev", alias_name="rev"), Sum("n", alias_name="n"))
    return pa.table(
        {
            "revenue_cpct": pa.array([int(agg["rev"] or 0)], pa.int64()),
            "n_lines": pa.array([int(agg["n"] or 0)], pa.int64()),
        }
    )


LINEITEM_Q6_SQL = f"""
SELECT CAST(coalesce(sum(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                         * CAST(ROUND(l_discount * 100, 0) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cpct,
       count(*)::BIGINT AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR_LO}'
  AND l_shipdate < TIMESTAMP '{Q6_YEAR_HI}'
  AND CAST(ROUND(l_discount * 100, 0) AS BIGINT)
      BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND CAST(ROUND(l_quantity * 100, 0) AS BIGINT) < {Q6_MAX_QTY_C}
"""


REGISTRY = {
    "events_l_diversity": (q_events_l_diversity, EVENTS_L_DIVERSITY_SQL),
    "docs_lr_brier": (q_docs_lr_brier, _brier_sql()),
    "docs_unigram_xent": (q_docs_unigram_xent, DOCS_UNIGRAM_XENT_SQL),
    "embedding_knn_components": (
        q_embedding_knn_components,
        _knn_components_sql(),
    ),
    "events_dow_adjusted": (q_events_dow_adjusted, EVENTS_DOW_ADJUSTED_SQL),
    "orders_revenue_hhi": (q_orders_revenue_hhi, ORDERS_REVENUE_HHI_SQL),
    "train_temp_scaling": (q_train_temp_scaling, _temp_scaling_sql()),
    "lineitem_q6_revenue": (q_lineitem_q6_revenue, LINEITEM_Q6_SQL),
}

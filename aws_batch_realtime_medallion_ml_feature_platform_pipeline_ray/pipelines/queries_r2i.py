"""Round-2i operators: corpus statistics, information theory, and
distributed-training steps.

- ``docs_llr_bigrams``: Dunning log-likelihood-ratio (G²) collocation
  scores — the significance-robust companion to ``docs_pmi_bigrams``
  (PMI over-ranks rare pairs; G² doesn't). Rides the SAME shared
  pair-marginal plan (``queries_r2f.bigram_pair_marginals``): all four
  contingency cells derive from (c_ab, c_a, c_b, N), so the scoring is
  a zero-shuffle map over the vocabulary²-bounded pair table.
- ``docs_zipf_fit``: Zipf-law fit of the token frequency spectrum —
  OLS of ln(freq) on ln(rank) over the top-``ZIPF_TOP`` tokens. The
  corpus-health diagnostic (a natural corpus slopes ≈ −1; templated /
  duplicated corpora flatten). One vocabulary-keyed exchange for global
  counts, ONE distributed sort + limit for the rank order, closed-form
  fit on the top-V block.
- ``docs_sample_systematic``: every ``SYS_STEP``-th document in global
  ``doc_id`` order (1-in-k systematic sampling) via the engine's exact
  distributed row numbering (``with_global_rank``) — the third sampling
  family beside stratified and weighted.
- ``events_periodogram``: DFT power of the mean-centered daily event
  count at periods N/k — the seasonality detector that tells the
  resampling/seasonal-naive operators WHICH period to use. Integer
  daily counts fold through one tiny groupby; the O(days × K) finale
  runs on the calendar-bounded series.
- ``events_cond_entropy``: conditional entropy H(next type | current
  type) of the per-user event stream — the predictability summary of
  the ``events_markov`` transition matrix (0 bits = deterministic
  behavior; ln|types| = uniform). Reuses the markov fold verbatim.
- ``train_lr_grad_step``: ONE exact full-batch gradient step of the
  frozen logistic quality classifier — the distributed-SGD primitive:
  per-batch partial gradients (4 doubles per block), one scalar fold,
  no data movement. The residual uses the ROUNDED score from
  ``lr_quality_scores`` so both engines difference identical doubles.
- ``features_woe_hour``: weight-of-evidence encoding of hour-of-day
  against the purchase label with ±0.5 Laplace smoothing, plus the
  per-bin information-value terms — the classic risk-scoring encoder
  beside target/one-hot/hashed encodings.
- ``embedding_label_prop_step``: one synchronous label-propagation
  step over the exact kNN graph (new label = plurality of the K
  neighbors' labels, ties → smallest label) — the graph-SSL primitive
  on top of ``knn_self``'s block-pair plan; labels travel through ONE
  cogroup, votes through ONE q_id-keyed exchange.

Exactness contracts: every count is int64; single-expression floats
(G² terms, WoE logs) are written operand-for-operand like their SQL
twins; multi-term float folds (OLS sums, DFT sums, entropy sums,
gradients) are ROUND(,6)-absorbed per the ``embedding_covariance``
contract (error ≪ 5e-7 at any corpus size because terms are
magnitude-bounded before summation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6
from ..sources.reads import read_parquet_sized
from ..stages.keyed import map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

LLR_MIN_COUNT = 5
ZIPF_TOP = 1000
SYS_STEP = 7
PERIODO_K = 10
WOE_POS_TYPE = "purchase"
GRAD_FEATURES = ("intercept", "log1p_tokens", "avg_token_len",
                 "stopword_ratio")


# ---------------------------------------------------------------------------
# docs_llr_bigrams — Dunning log-likelihood collocations
# ---------------------------------------------------------------------------


def q_docs_llr_bigrams(sf_dir: str):
    """G² = 2·Σ_cells k·ln(k·N / (rowsum·colsum)) over the 2×2 bigram
    contingency table (0-count cells contribute 0), for pairs with
    c_ab ≥ {LLR_MIN_COUNT}. Zero shuffles beyond the shared marginal
    plan; the four terms are evaluated in one fixed written order."""
    from .queries_r2f import bigram_pair_marginals

    pairs, n_total = bigram_pair_marginals(sf_dir)
    nf = float(n_total)

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c_ab": pa.array([], pa.int64()),
                "llr": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        cab = np.asarray(t["c_ab"].combine_chunks())
        keep = cab >= LLR_MIN_COUNT
        if not keep.any():
            return empty
        idx = np.flatnonzero(keep)
        ca = np.asarray(t["c_a"].combine_chunks())[idx]
        cb = np.asarray(t["c_b"].combine_chunks())[idx]
        k11 = cab[idx]
        k12 = ca - k11
        k21 = cb - k11
        k22 = n_total - ca - cb + k11

        def term(k, rs, cs):
            k = k.astype(np.float64)
            rs = rs.astype(np.float64)
            cs = cs.astype(np.float64)
            safe = np.where(k > 0, (k * nf) / (rs * cs), 1.0)
            return np.where(k > 0, k * np.log(safe), 0.0)

        rs2 = n_total - ca
        cs2 = n_total - cb
        llr = round6(
            2.0
            * (
                term(k11, ca, cb)
                + term(k12, ca, cs2)
                + term(k21, rs2, cb)
                + term(k22, rs2, cs2)
            )
        )
        take = pa.array(idx)
        return pa.table(
            {
                "w1": t["w1"].combine_chunks().take(take),
                "w2": t["w2"].combine_chunks().take(take),
                "c_ab": pa.array(k11),
                "llr": pa.array(llr, pa.float64()),
            }
        )

    return pairs.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True)


DOCS_LLR_SQL = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
b AS (
    SELECT ts[i] AS w1, ts[i + 1] AS w2
    FROM tok, unnest(range(1, len(ts))) AS t(i)
),
cab AS (SELECT w1, w2, count(*)::BIGINT AS c_ab FROM b GROUP BY 1, 2),
ca AS (SELECT w1, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
cb AS (SELECT w2, CAST(sum(c_ab) AS BIGINT) AS c_b FROM cab GROUP BY 1),
nt AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM cab),
cells AS (
    SELECT cab.w1, cab.w2, cab.c_ab,
           CAST(cab.c_ab AS DOUBLE) AS k11,
           CAST(ca.c_a - cab.c_ab AS DOUBLE) AS k12,
           CAST(cb.c_b - cab.c_ab AS DOUBLE) AS k21,
           CAST(nt.n - ca.c_a - cb.c_b + cab.c_ab AS DOUBLE) AS k22,
           CAST(ca.c_a AS DOUBLE) AS rs1,
           CAST(nt.n - ca.c_a AS DOUBLE) AS rs2,
           CAST(cb.c_b AS DOUBLE) AS cs1,
           CAST(nt.n - cb.c_b AS DOUBLE) AS cs2,
           CAST(nt.n AS DOUBLE) AS nn
    FROM cab JOIN ca USING (w1) JOIN cb USING (w2) CROSS JOIN nt
    WHERE cab.c_ab >= {LLR_MIN_COUNT}
)
SELECT w1, w2, c_ab,
       ROUND(2.0 * (
           (CASE WHEN k11 > 0 THEN k11 * ln((k11 * nn) / (rs1 * cs1))
                 ELSE 0.0 END)
           + (CASE WHEN k12 > 0 THEN k12 * ln((k12 * nn) / (rs1 * cs2))
                   ELSE 0.0 END)
           + (CASE WHEN k21 > 0 THEN k21 * ln((k21 * nn) / (rs2 * cs1))
                   ELSE 0.0 END)
           + (CASE WHEN k22 > 0 THEN k22 * ln((k22 * nn) / (rs2 * cs2))
                   ELSE 0.0 END)
       ), 6) AS llr
FROM cells
"""


# ---------------------------------------------------------------------------
# docs_zipf_fit — Zipf-law OLS over the token frequency spectrum
# ---------------------------------------------------------------------------


def q_docs_zipf_fit(sf_dir: str):
    """OLS of ln(count) on ln(rank) over the top-{ZIPF_TOP} tokens
    (rank 1 = most frequent, ties broken by term asc). Global counts
    through ONE vocabulary-keyed exchange; the rank order is a
    distributed sort + limit, so only O(ZIPF_TOP) rows reach the
    single-block closed-form fit."""

    from .queries_extra import _tf_partial

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    rows = ds.map_batches(_tf_partial, batch_format="pyarrow",
                          zero_copy_batch=True)

    def fold_terms(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"term": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        term = np.asarray(part["term"].combine_chunks().cast(pa.large_string()))
        tf = np.asarray(part["tf"].combine_chunks()).astype(np.int64)
        inv, uniq = pd.factorize(term)
        cnt = np.zeros(len(uniq), np.int64)
        np.add.at(cnt, inv, tf)
        return pa.table(
            {"term": pa.array(uniq).cast(pa.string()), "cnt": pa.array(cnt)}
        )

    counts = map_partitions_by_key(rows, "term", fold_terms,
                                   num_parts=NUM_PARTS)
    top = counts.sort(["cnt", "term"], descending=[True, False]).limit(
        ZIPF_TOP
    )

    def fit(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "n_vocab": pa.array([0], pa.int64()),
                    "slope": pa.array([None], pa.float64()),
                    "intercept": pa.array([None], pa.float64()),
                }
            )
        # rows arrive in rank order from the sorted limit
        cnt = np.asarray(t["cnt"].combine_chunks(), dtype=np.float64)
        rank = np.arange(1, n + 1, dtype=np.float64)
        x = np.log(rank)
        y = np.log(cnt)
        sx, sy = float(x.sum()), float(y.sum())
        sxx = float((x * x).sum())
        sxy = float((x * y).sum())
        den = n * sxx - sx * sx
        if den == 0.0:
            return pa.table(
                {
                    "n_vocab": pa.array([n], pa.int64()),
                    "slope": pa.array([None], pa.float64()),
                    "intercept": pa.array([None], pa.float64()),
                }
            )
        slope = (n * sxy - sx * sy) / den
        intercept = (sy - slope * sx) / n
        return pa.table(
            {
                "n_vocab": pa.array([n], pa.int64()),
                "slope": pa.array([float(round6(slope))], pa.float64()),
                "intercept": pa.array(
                    [float(round6(intercept))], pa.float64()
                ),
            }
        )

    return top.repartition(1).map_batches(fit, batch_format="pyarrow")


DOCS_ZIPF_SQL = f"""
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
c AS (SELECT term, count(*)::BIGINT AS cnt FROM tok GROUP BY 1),
r AS (
    SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
    FROM c
),
topv AS (SELECT * FROM r WHERE rank <= {ZIPF_TOP}),
s AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           sum(ln(CAST(rank AS DOUBLE))) AS sx,
           sum(ln(CAST(cnt AS DOUBLE))) AS sy,
           sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))) AS sxx,
           sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))) AS sxy
    FROM topv
)
SELECT n AS n_vocab,
       CASE WHEN n * sxx - sx * sx = 0.0 THEN NULL
            ELSE ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
       END AS slope,
       CASE WHEN n * sxx - sx * sx = 0.0 THEN NULL
            ELSE ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                             * sx) / n, 6)
       END AS intercept
FROM s
"""


# ---------------------------------------------------------------------------
# docs_sample_systematic — 1-in-k sampling in global key order
# ---------------------------------------------------------------------------


def q_docs_sample_systematic(sf_dir: str):
    """Every {SYS_STEP}-th document in global ``doc_id`` order (first
    row always included): the exact distributed row numbering
    (``with_global_rank``: per-block counts + prefix offsets, one tiny
    driver fold of O(#blocks)) followed by a modulo filter — no sort,
    no full materialization."""
    from ..stages.globalorder import with_global_rank

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    ranked = with_global_rank(ds, ["doc_id"], descending=[False],
                              rank_col="rnk")

    def pick(t: pa.Table) -> pa.Table:
        rnk = np.asarray(t["rnk"].combine_chunks())
        keep = (rnk - 1) % SYS_STEP == 0
        return pa.table(
            {
                "doc_id": pa.array(
                    np.asarray(t["doc_id"].combine_chunks())[keep]
                ),
                "rnk": pa.array(rnk[keep]),
                "n_chars": pa.array(
                    np.asarray(t["n_chars"].combine_chunks())[keep]
                ),
            }
        )

    return ranked.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True)


DOCS_SAMPLE_SYSTEMATIC_SQL = f"""
WITH r AS (
    SELECT doc_id, n_chars,
           row_number() OVER (ORDER BY doc_id) AS rnk
    FROM documents
)
SELECT doc_id, rnk, n_chars FROM r WHERE (rnk - 1) % {SYS_STEP} = 0
"""


# ---------------------------------------------------------------------------
# events_periodogram — DFT power of the daily count series
# ---------------------------------------------------------------------------


def q_events_periodogram(sf_dir: str):
    """Power spectrum of the mean-centered daily event count at the
    first {PERIODO_K} Fourier frequencies: per-day integer counts fold
    through ONE tiny groupby (O(active days) rows); the finale is
    O(days × K) on the calendar-bounded series. a_k and b_k are
    normalized by N before squaring so ROUND(,6) absorbs the
    summation-order ULP at any count magnitude."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"d": pa.array([], pa.int64()),
                 "pn": pa.array([], pa.int64())}
            )
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
                "k": pa.array([], pa.int64()),
                "n_days": pa.array([], pa.int64()),
                "power": pa.array([], pa.float64()),
            }
        )
    d = tiny["d"].to_numpy(np.int64)
    d0, d1 = int(d.min()), int(d.max())
    n = d1 - d0 + 1
    x = np.zeros(n, dtype=np.int64)
    x[d - d0] = tiny["n"].to_numpy(np.int64)
    total = int(x.sum())
    mean = total / float(n)
    cx = x.astype(np.float64) - mean
    t_idx = np.arange(n, dtype=np.float64)
    ks, powers = [], []
    for k in range(1, PERIODO_K + 1):
        arg = 2.0 * np.pi * float(k) * t_idx / float(n)
        a = float(np.sum(cx * np.cos(arg))) / float(n)
        b = float(np.sum(cx * np.sin(arg))) / float(n)
        ks.append(k)
        powers.append(float(round6(a * a + b * b)))
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "n_days": pa.array([n] * len(ks), pa.int64()),
            "power": pa.array(powers, pa.float64()),
        }
    )


EVENTS_PERIODOGRAM_SQL = f"""
WITH c AS (
    SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1
),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM c),
days AS (
    SELECT CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS d FROM b
),
f AS (
    SELECT days.d - (SELECT d0 FROM b) AS t, coalesce(c.n, 0) AS x
    FROM days LEFT JOIN c USING (d)
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS tot
    FROM f
),
ks AS (SELECT CAST(unnest(generate_series(1, {PERIODO_K})) AS BIGINT) AS k),
terms AS (
    SELECT ks.k,
           (f.x - m.tot / CAST(m.n AS DOUBLE))
               * cos(2.0 * pi() * CAST(ks.k AS DOUBLE) * CAST(f.t AS DOUBLE)
                     / CAST(m.n AS DOUBLE)) AS ct,
           (f.x - m.tot / CAST(m.n AS DOUBLE))
               * sin(2.0 * pi() * CAST(ks.k AS DOUBLE) * CAST(f.t AS DOUBLE)
                     / CAST(m.n AS DOUBLE)) AS st,
           m.n
    FROM ks CROSS JOIN f CROSS JOIN m
)
SELECT k, n AS n_days,
       ROUND((sum(ct) / CAST(n AS DOUBLE)) * (sum(ct) / CAST(n AS DOUBLE))
             + (sum(st) / CAST(n AS DOUBLE)) * (sum(st) / CAST(n AS DOUBLE)),
             6) AS power
FROM terms GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# events_cond_entropy — H(next type | current type)
# ---------------------------------------------------------------------------


def q_events_cond_entropy(sf_dir: str):
    """Conditional entropy of the per-user event-type transition process
    (natural log): H = −Σ_ij (n_ij / C) · ln(p_ij) over the
    ``events_markov`` transition matrix (p already ROUND(,6)'d on both
    engines, so each term differences identical doubles). One extra
    O(|types|²) finale on top of the markov fold."""
    from .queries_signals import q_events_markov

    # q_events_markov's fold already reduced the matrix to O(|types|²)
    # rows (a pyarrow Table finale) — the entropy is one more pass on it
    t = q_events_markov(sf_dir)
    if hasattr(t, "to_pandas") and not isinstance(t, pa.Table):
        t = pa.Table.from_pandas(t.to_pandas())

    def finale(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_transitions": pa.array([0], pa.int64()),
                    "n_cells": pa.array([0], pa.int64()),
                    "cond_entropy": pa.array([None], pa.float64()),
                }
            )
        n = np.asarray(t["n"].combine_chunks(), dtype=np.int64)
        p = np.asarray(t["p"].combine_chunks(), dtype=np.float64)
        c = int(n.sum())
        h = float(round6(-np.sum((n / float(c)) * np.log(p))))
        return pa.table(
            {
                "n_transitions": pa.array([c], pa.int64()),
                "n_cells": pa.array([t.num_rows], pa.int64()),
                "cond_entropy": pa.array([h], pa.float64()),
            }
        )

    return finale(t)


def _cond_entropy_sql() -> str:
    from .queries_signals import EVENTS_MARKOV_SQL

    return f"""
WITH m AS ({EVENTS_MARKOV_SQL})
SELECT CAST(sum(n) AS BIGINT) AS n_transitions,
       count(*)::BIGINT AS n_cells,
       ROUND(-sum((n / CAST((SELECT sum(n) FROM m) AS DOUBLE)) * ln(p)), 6)
           AS cond_entropy
FROM m
"""


# ---------------------------------------------------------------------------
# train_lr_grad_step — one exact full-batch logistic gradient
# ---------------------------------------------------------------------------


def q_train_lr_grad_step(sf_dir: str):
    """Mean gradient of the logistic loss at the FROZEN quality-model
    weights against the ``lang = 'en'`` proxy label: per-batch partial
    Σ (σ(z)−y)·x_j for the four features (intercept, ln(1+n_tokens),
    avg_token_len, stopword_ratio) — 5 doubles per block, one scalar
    fold, zero shuffles. σ(z) is the ROUND(,6) score shared with every
    other consumer of the frozen model."""
    from ray.data.aggregate import Sum

    from ..functions import text as T
    from .queries_text import lr_quality_scores

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    cols = ["n", "g0", "g1", "g2", "g3"]
    empty = pa.table(
        {"n": pa.array([], pa.int64()),
         **{c: pa.array([], pa.float64()) for c in cols[1:]}}
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        texts = t["text"].combine_chunks()
        s = lr_quality_scores(texts)
        y = np.asarray(pc.equal(t["lang"].combine_chunks(), "en")).astype(
            np.float64
        )
        r = s - y
        m = T.quality_metrics(texts)
        x1 = np.log(1.0 + m["n_tokens"].astype(np.float64))
        x2 = m["avg_token_len"]
        x3 = m["stopword_ratio"]
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "g0": pa.array([float(r.sum())], pa.float64()),
                "g1": pa.array([float((r * x1).sum())], pa.float64()),
                "g2": pa.array([float((r * x2).sum())], pa.float64()),
                "g3": pa.array([float((r * x3).sum())], pa.float64()),
            }
        )

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*[Sum(c, alias_name=c) for c in cols])
    n = int(agg["n"] or 0)
    grads = [
        float(round6((agg[c] or 0.0) / float(n))) if n else None
        for c in cols[1:]
    ]
    return pa.table(
        {
            "feature": pa.array(list(GRAD_FEATURES), pa.string()),
            "grad": pa.array(grads, pa.float64()),
        }
    )


def _lr_grad_sql() -> str:
    from .queries_text import (
        _STOP_IN,
        LR_B,
        LR_W_AVGLEN,
        LR_W_LOGTOK,
        LR_W_STOP,
    )

    return f"""
WITH f AS (
    SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        length(string_split(text, ' ')) AS n_tokens,
        (length(text) - (length(string_split(text, ' ')) - 1))
            / CAST(length(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
        len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_IN})))
            / CAST(length(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
    FROM documents
),
s AS (
    SELECT y, ln(1.0 + n_tokens) AS x1, avg_token_len AS x2,
           stopword_ratio AS x3,
           ROUND(1.0 / (1.0 + exp(-({LR_B} + {LR_W_LOGTOK} * ln(1.0 + n_tokens)
               + {LR_W_AVGLEN} * avg_token_len
               + {LR_W_STOP} * stopword_ratio))), 6) AS sc
    FROM f
),
g AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           sum(sc - y) AS g0,
           sum((sc - y) * x1) AS g1,
           sum((sc - y) * x2) AS g2,
           sum((sc - y) * x3) AS g3
    FROM s
)
SELECT 'intercept' AS feature, ROUND(g0 / CAST(n AS DOUBLE), 6) AS grad FROM g
UNION ALL
SELECT 'log1p_tokens', ROUND(g1 / CAST(n AS DOUBLE), 6) FROM g
UNION ALL
SELECT 'avg_token_len', ROUND(g2 / CAST(n AS DOUBLE), 6) FROM g
UNION ALL
SELECT 'stopword_ratio', ROUND(g3 / CAST(n AS DOUBLE), 6) FROM g
"""


# ---------------------------------------------------------------------------
# features_woe_hour — weight-of-evidence encoding with Laplace smoothing
# ---------------------------------------------------------------------------


def q_features_woe_hour(sf_dir: str):
    """Per hour-of-day: positive/negative counts against the
    ``{WOE_POS_TYPE}`` label, the smoothed weight of evidence
    ``ln(((pos+0.5)/(POS+12)) / ((neg+0.5)/(NEG+12)))`` (24 bins × 0.5
    Laplace mass) and the information-value term. Counts fold through
    per-batch partials + one 24-group groupby; the totals ride a
    single-block finale."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"hod": pa.array([], pa.int64()),
                 "pp": pa.array([], pa.int64()),
                 "pn": pa.array([], pa.int64())}
            )
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        hod = (us // 3_600_000_000) % 24
        pos = np.asarray(
            pc.equal(t["event_type"].combine_chunks(), WOE_POS_TYPE)
        ).astype(np.int64)
        hh = np.argsort(hod, kind="stable")
        hs = hod[hh]
        starts = np.flatnonzero(
            np.concatenate(([True], hs[1:] != hs[:-1]))
        )
        return pa.table(
            {
                "hod": pa.array(hs[starts]),
                "pp": pa.array(np.add.reduceat(pos[hh], starts)),
                "pn": pa.array(
                    np.add.reduceat((1 - pos)[hh], starts)
                ),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hod")
        .aggregate(Sum("pp", alias_name="pos"), Sum("pn", alias_name="neg"))
    )

    def finale(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t["hod"])
        hod = np.asarray(t["hod"].combine_chunks().take(order))
        pos = np.asarray(t["pos"].combine_chunks().take(order),
                         dtype=np.int64)
        neg = np.asarray(t["neg"].combine_chunks().take(order),
                         dtype=np.int64)
        tp = float(pos.sum())
        tn = float(neg.sum())
        pr = (pos + 0.5) / (tp + 12.0)
        nr = (neg + 0.5) / (tn + 12.0)
        woe = np.log(pr / nr)
        iv = (pr - nr) * woe
        return pa.table(
            {
                "hod": pa.array(hod, pa.int64()),
                "pos": pa.array(pos),
                "neg": pa.array(neg),
                "woe": pa.array(round6(woe), pa.float64()),
                "iv_term": pa.array(round6(iv), pa.float64()),
            }
        )

    return folded.repartition(1).map_batches(finale, batch_format="pyarrow")


FEATURES_WOE_SQL = f"""
WITH e AS (
    SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS hod,
           CASE WHEN event_type = '{WOE_POS_TYPE}' THEN 1 ELSE 0 END AS y
    FROM events
),
c AS (
    SELECT hod, CAST(sum(y) AS BIGINT) AS pos,
           CAST(count(*) - sum(y) AS BIGINT) AS neg
    FROM e GROUP BY 1
),
t AS (SELECT CAST(sum(pos) AS DOUBLE) AS tp,
             CAST(sum(neg) AS DOUBLE) AS tn FROM c)
SELECT hod, pos, neg,
       ROUND(ln(((pos + 0.5) / (t.tp + 12.0))
                / ((neg + 0.5) / (t.tn + 12.0))), 6) AS woe,
       ROUND(((pos + 0.5) / (t.tp + 12.0) - (neg + 0.5) / (t.tn + 12.0))
             * ln(((pos + 0.5) / (t.tp + 12.0))
                  / ((neg + 0.5) / (t.tn + 12.0))), 6) AS iv_term
FROM c CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# embedding_label_prop_step — one label-propagation step over kNN
# ---------------------------------------------------------------------------


def q_embedding_label_prop_step(sf_dir: str):
    """One synchronous label-propagation step: each vector adopts the
    plurality label of its exact top-K cosine neighbors (ties → smallest
    label). Rides ``knn_self``'s block-pair plan; neighbor labels attach
    from a ``ray.put`` label vector inside the kNN map (labels are
    O(nodes) — 16 B/node, the same broadcast contract as the PageRank
    fast path; a vec_id cogroup is the beyond-memory attach); votes
    reduce through ONE q_id-keyed exchange (O(K) rows per node)."""
    import ray

    from ..stages.ann import knn_self_join
    from .queries_ann import K, _emb

    knn = knn_self_join(_emb(sf_dir), k=K, n_blocks=4).map_batches(
        lambda t: pa.table(
            {
                "q_id": t["q_id"].cast(pa.int64()),
                "vec_id": t["vec_id"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    labels = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).map_batches(
        lambda t: pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "label": t["label"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    lab_tbls = [
        t for t in ray.get(labels.to_arrow_refs()) if t.num_rows
    ]
    lab_ids = np.concatenate(
        [np.asarray(t["vec_id"].combine_chunks()) for t in lab_tbls]
    )
    lab_vals = np.concatenate(
        [np.asarray(t["label"].combine_chunks()) for t in lab_tbls]
    )
    lorder = np.argsort(lab_ids, kind="stable")
    ids_ref = ray.put(lab_ids[lorder])
    val_ref = ray.put(lab_vals[lorder])

    def attach(t: pa.Table, _i=ids_ref, _v=val_ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"q_id": pa.array([], pa.int64()),
                 "nlab": pa.array([], pa.int64())}
            )
        ids = ray.get(_i)
        vals = ray.get(_v)
        v = np.asarray(t["vec_id"].combine_chunks())
        pos = np.searchsorted(ids, v)
        if len(pos) and (
            (pos >= len(ids)).any()
            or (ids[np.minimum(pos, len(ids) - 1)] != v).any()
        ):
            raise ValueError("label_prop: neighbor missing from label set")
        return pa.table(
            {
                "q_id": t["q_id"],
                "nlab": pa.array(vals[pos].astype(np.int64)),
            }
        )

    votes = knn.map_batches(attach, batch_format="pyarrow",
                            zero_copy_batch=True)

    def plurality(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "new_label": pa.array([], pa.int64()),
                "votes": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        q = np.asarray(part["q_id"].combine_chunks())
        lab = np.asarray(part["nlab"].combine_chunks())
        # count per (q, label)
        order = np.lexsort((lab, q))
        qs, ls = q[order], lab[order]
        head = np.concatenate(([True], (qs[1:] != qs[:-1])
                               | (ls[1:] != ls[:-1])))
        starts = np.flatnonzero(head)
        cq, cl = qs[starts], ls[starts]
        cnt = np.diff(np.append(starts, len(qs)))
        # plurality with ties -> smallest label: sort (q, -cnt, label)
        o2 = np.lexsort((cl, -cnt, cq))
        cq, cl, cnt = cq[o2], cl[o2], cnt[o2]
        first = np.concatenate(([True], cq[1:] != cq[:-1]))
        return pa.table(
            {
                "vec_id": pa.array(cq[first]),
                "new_label": pa.array(cl[first]),
                "votes": pa.array(cnt[first].astype(np.int64)),
            }
        )

    return map_partitions_by_key(votes, "q_id", plurality,
                                 num_parts=NUM_PARTS)


def _label_prop_sql() -> str:
    from .queries_ann import K

    return f"""
WITH sims AS (
    SELECT a.vec_id AS q_id, b.vec_id, b.label,
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
knn AS (SELECT q_id, CAST(label AS BIGINT) AS nlab FROM r
        WHERE rank <= {K}),
v AS (
    SELECT q_id, nlab, count(*)::BIGINT AS votes FROM knn GROUP BY 1, 2
),
w AS (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY votes DESC, nlab ASC) AS pick
    FROM v
)
SELECT q_id AS vec_id, nlab AS new_label, votes FROM w WHERE pick = 1
"""


REGISTRY = {
    "docs_llr_bigrams": (q_docs_llr_bigrams, DOCS_LLR_SQL),
    "docs_zipf_fit": (q_docs_zipf_fit, DOCS_ZIPF_SQL),
    "docs_sample_systematic": (
        q_docs_sample_systematic,
        DOCS_SAMPLE_SYSTEMATIC_SQL,
    ),
    "events_periodogram": (q_events_periodogram, EVENTS_PERIODOGRAM_SQL),
    "events_cond_entropy": (q_events_cond_entropy, _cond_entropy_sql()),
    "train_lr_grad_step": (q_train_lr_grad_step, _lr_grad_sql()),
    "features_woe_hour": (q_features_woe_hour, FEATURES_WOE_SQL),
    "embedding_label_prop_step": (
        q_embedding_label_prop_step,
        _label_prop_sql(),
    ),
}

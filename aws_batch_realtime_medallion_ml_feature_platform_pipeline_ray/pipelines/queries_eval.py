"""Model/feature EVALUATION statistics: the offline checks a feature
platform runs on top of its gold features and model scores before
promoting them — two-sample KS drift, ranking AUC for the frozen quality
classifier, categorical mutual information, leave-one-out target
encoding, and Welch's t-test between time windows.

Reference parity: the reference validates feature snapshots with count
metrics only (/root/reference/scripts/; success-metric lambda); these
operators are the statistical upgrades of that gate, computed over the
same event stream / document corpus.

Scale shapes (each documented on the operator):

- ``events_ks_drift`` / ``events_welch_t`` / ``events_mi_type_dow``:
  zero keyed exchanges — per-batch O(distinct-bucket) count partials,
  one tiny ``groupby().aggregate(Sum)`` fold (bucket domains are bounded:
  integer cents of a bounded metric, |types| x 7, two sides), then O(B)
  driver arithmetic. No event row ever reaches the driver.
- ``docs_lr_auc``: the score is rounded to 6 decimals, so the distinct
  key domain is bounded by 1e6+1 REGARDLESS of corpus size — partials
  collapse each batch to (score-key, pos/neg counts) and the rank-sum
  runs on the tiny folded histogram. This is the standard trick for
  exact AUC at any scale.
- ``events_target_encode_loo``: the category domain (event_type) is a
  small vocabulary, so the per-type (sum, count) fold is tiny and the
  encode itself is a second streamed pass with the folded stats riding
  the task closure — zero shuffles of event rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6, round_half_away

_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16T00:00:00 epoch-us
_SPLIT_SQL = "TIMESTAMP '2024-01-16 00:00:00'"


def _events(sf_dir: str, columns):
    from ..sources.reads import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/events.parquet", columns=columns)


def _docs(sf_dir: str, columns):
    from ..sources.reads import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/documents.parquet", columns=columns)


def _cents(val: np.ndarray) -> np.ndarray:
    return round_half_away(np.asarray(val, dtype=np.float64) * 100.0).astype(
        np.int64
    )


_SIDE_EMPTY = pa.table(
    {
        "k": pa.array([], pa.int64()),
        "r": pa.array([], pa.int64()),
        "c": pa.array([], pa.int64()),
    }
)


def _side_count_partial(t: pa.Table) -> pa.Table:
    """Per-batch (value-cents, side) count partial: collapses a batch to
    O(distinct cents) rows of exact int64 counts."""
    if t.num_rows == 0:
        return _SIDE_EMPTY
    mask = pc.is_valid(t["value"])
    t = t.filter(mask) if pc.any(pc.invert(mask)).as_py() else t
    if t.num_rows == 0:
        return _SIDE_EMPTY
    us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
    k = _cents(np.asarray(t["value"].combine_chunks()))
    is_ref = us < _SPLIT_US
    g = (
        pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "r": pa.array(is_ref.astype(np.int64), pa.int64()),
                "c": pa.array((~is_ref).astype(np.int64), pa.int64()),
            }
        )
        .group_by("k")
        .aggregate([("r", "sum"), ("c", "sum")])
    )
    return g.rename_columns(["k", "r", "c"])


def _fold_side_counts(ds) -> list[dict]:
    # distinct-cents keys scale with the metric's value domain (tens of
    # thousands here) — that's a data-scaling fold, so route through the
    # keyed exchange + segmented reduceat (fold_by_keys), not
    # Dataset.groupby (measured 3.6 s -> sub-second at sf0.1/32 CPUs,
    # same degradation basket_rules hit on its 1.2 M-group fold)
    from ..stages.keyed import fold_by_keys

    partials = ds.map_batches(
        _side_count_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = fold_by_keys(partials, ["k"], sums=("r", "c"), num_parts=8)
    rows = [
        {"k": r["k"], "n_ref": r["r"], "n_cur": r["c"]}
        for r in folded.take_all()
    ]  # O(distinct cents) — bounded by the metric's value domain
    rows.sort(key=lambda x: x["k"])
    return rows


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift statistic
# --------------------------------------------------------------------------


def q_events_ks_drift(sf_dir: str):
    """Exact two-sample KS statistic of the ``value`` distribution between
    the reference window (before 2024-01-16) and the current window —
    the distribution-free sibling of ``events_psi_drift`` (no binning
    choice, detects any CDF divergence).

    Exactness: values are keyed on integer cents, cumulative counts stay
    int64, and the only doubles are the two CDF divisions and the final
    abs-max — the identical expression chain on both engines, rounded
    to 6 decimals."""
    rows = _fold_side_counts(_events(sf_dir, columns=["ts", "value"]))
    if not rows:
        # all values NULL / empty table: the twin's cum CTE is empty and
        # the cross join yields ZERO rows — mirror that
        return pa.table(
            {
                "ks": pa.array([], pa.float64()),
                "n_ref": pa.array([], pa.int64()),
                "n_cur": pa.array([], pa.int64()),
            }
        )
    n_ref = sum(r["n_ref"] for r in rows)
    n_cur = sum(r["n_cur"] for r in rows)
    if n_ref == 0 or n_cur == 0:
        ks = None
    else:
        cr = np.cumsum(np.array([r["n_ref"] for r in rows], dtype=np.int64))
        cc = np.cumsum(np.array([r["n_cur"] for r in rows], dtype=np.int64))
        d = np.abs(cr / float(n_ref) - cc / float(n_cur))
        ks = float(round6(d.max()))
    return pa.table(
        {
            "ks": pa.array([ks], pa.float64()),
            "n_ref": pa.array([n_ref], pa.int64()),
            "n_cur": pa.array([n_cur], pa.int64()),
        }
    )


EVENTS_KS_DRIFT_SQL = f"""
WITH e AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS k,
           (ts < {_SPLIT_SQL}) AS is_ref
    FROM events WHERE value IS NOT NULL
),
cnt AS (
    SELECT k,
           CAST(count(*) FILTER (is_ref) AS BIGINT) AS r,
           CAST(count(*) FILTER (NOT is_ref) AS BIGINT) AS c
    FROM e GROUP BY k
),
cum AS (
    SELECT CAST(sum(r) OVER (ORDER BY k) AS BIGINT) AS cr,
           CAST(sum(c) OVER (ORDER BY k) AS BIGINT) AS cc
    FROM cnt
),
tot AS (
    SELECT CAST(sum(r) AS BIGINT) AS n_ref, CAST(sum(c) AS BIGINT) AS n_cur
    FROM cnt
)
SELECT ROUND(max(abs(cr / CAST(n_ref AS DOUBLE) - cc / CAST(n_cur AS DOUBLE))), 6)
           AS ks,
       n_ref, n_cur
FROM cum, tot GROUP BY n_ref, n_cur
"""


# --------------------------------------------------------------------------
# Welch's t-test between the same two windows
# --------------------------------------------------------------------------


def q_events_welch_t(sf_dir: str):
    """Welch's unequal-variance t-test of mean ``value`` between the
    reference and current windows, with the Welch-Satterthwaite degrees
    of freedom — the go/no-go significance companion to the KS/PSI
    drift magnitudes.

    Exactness: per-side count / sum / sum-of-squares are exact int64 in
    cents (|cents| <= ~5e4 here, so sumsq fits int64 far beyond the test
    scales); every double expression after the fold is written in the
    identical order on both engines and rounded to 6 decimals."""
    ds = _events(sf_dir, columns=["ts", "value"])

    empty = pa.table(
        {c: pa.array([], pa.int64()) for c in ["n1", "s1", "q1", "n2", "s2", "q2"]}
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        mask = pc.is_valid(t["value"])
        t = t.filter(mask) if pc.any(pc.invert(mask)).as_py() else t
        if t.num_rows == 0:
            return empty
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        k = _cents(np.asarray(t["value"].combine_chunks()))
        ref = us < _SPLIT_US
        kr, kc = k[ref], k[~ref]
        return pa.table(
            {
                "n1": pa.array([kr.size], pa.int64()),
                "s1": pa.array([int(kr.sum())], pa.int64()),
                "q1": pa.array([int((kr * kr).sum())], pa.int64()),
                "n2": pa.array([kc.size], pa.int64()),
                "s2": pa.array([int(kc.sum())], pa.int64()),
                "q2": pa.array([int((kc * kc).sum())], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(*[Sum(c, alias_name=c) for c in ["n1", "s1", "q1", "n2", "s2", "q2"]])
    )
    n1, s1, q1 = agg["n1"] or 0, agg["s1"] or 0, agg["q1"] or 0
    n2, s2, q2 = agg["n2"] or 0, agg["s2"] or 0, agg["q2"] or 0
    # degenerate-window semantics MIRROR DuckDB: x/0.0 is NULL, so means
    # survive n=1 windows, t/df go NULL when a variance term divides by
    # zero (n<2) or the pooled standard error is exactly zero
    t_stat = df = m1 = m2 = None
    m1c = s1 / float(n1) if n1 > 0 else None
    m2c = s2 / float(n2) if n2 > 0 else None
    if m1c is not None:
        m1 = float(round6(m1c / 100.0))
    if m2c is not None:
        m2 = float(round6(m2c / 100.0))
    if n1 >= 2 and n2 >= 2:
        # cents domain throughout; the mean difference is /100 at the end.
        # EVERY line below mirrors the SQL twin token for token.
        v1 = (q1 - s1 * (s1 / float(n1))) / float(n1 - 1)
        v2 = (q2 - s2 * (s2 / float(n2))) / float(n2 - 1)
        se1 = v1 / float(n1)
        se2 = v2 / float(n2)
        if se1 + se2 > 0.0:  # sqrt(0) divisor -> NULL in the twin
            t_stat = float(round6((m1c - m2c) / np.sqrt(se1 + se2)))
            df = float(
                round6(
                    (se1 + se2) * (se1 + se2)
                    / (se1 * se1 / float(n1 - 1) + se2 * se2 / float(n2 - 1))
                )
            )
    return pa.table(
        {
            "n_ref": pa.array([n1], pa.int64()),
            "n_cur": pa.array([n2], pa.int64()),
            "mean_ref": pa.array([m1], pa.float64()),
            "mean_cur": pa.array([m2], pa.float64()),
            "t_stat": pa.array([t_stat], pa.float64()),
            "df": pa.array([df], pa.float64()),
        }
    )


EVENTS_WELCH_T_SQL = f"""
WITH e AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS k,
           (ts < {_SPLIT_SQL}) AS is_ref
    FROM events WHERE value IS NOT NULL
),
a AS (
    SELECT CAST(count(*) FILTER (is_ref) AS BIGINT) AS n1,
           CAST(coalesce(sum(k) FILTER (is_ref), 0) AS BIGINT) AS s1,
           CAST(coalesce(sum(k * k) FILTER (is_ref), 0) AS BIGINT) AS q1,
           CAST(count(*) FILTER (NOT is_ref) AS BIGINT) AS n2,
           CAST(coalesce(sum(k) FILTER (NOT is_ref), 0) AS BIGINT) AS s2,
           CAST(coalesce(sum(k * k) FILTER (NOT is_ref), 0) AS BIGINT) AS q2
    FROM e
),
v AS (
    SELECT n1, n2,
           s1 / CAST(n1 AS DOUBLE) AS m1c,
           s2 / CAST(n2 AS DOUBLE) AS m2c,
           ((q1 - s1 * (s1 / CAST(n1 AS DOUBLE))) / CAST(n1 - 1 AS DOUBLE))
               / CAST(n1 AS DOUBLE) AS se1,
           ((q2 - s2 * (s2 / CAST(n2 AS DOUBLE))) / CAST(n2 - 1 AS DOUBLE))
               / CAST(n2 AS DOUBLE) AS se2
    FROM a
)
SELECT n1 AS n_ref, n2 AS n_cur,
       ROUND(m1c / 100.0, 6) AS mean_ref,
       ROUND(m2c / 100.0, 6) AS mean_cur,
       ROUND((m1c - m2c) / sqrt(se1 + se2), 6) AS t_stat,
       ROUND((se1 + se2) * (se1 + se2)
             / (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
                + se2 * se2 / CAST(n2 - 1 AS DOUBLE)), 6) AS df
FROM v
"""


# --------------------------------------------------------------------------
# Exact AUC of the frozen LR quality classifier
# --------------------------------------------------------------------------


def q_docs_lr_auc(sf_dir: str):
    """Mann-Whitney AUC (with average-rank tie handling) of the frozen
    logistic quality score against the ``lang = 'en'`` proxy label —
    the offline ranking-quality gate run before promoting a curation
    classifier.

    Key trick for scale: the score is already rounded to 6 decimals, so
    the distinct-key histogram is bounded by 1e6+1 buckets no matter the
    corpus size; the rank-sum AUC is exact over that histogram with the
    numerator kept entirely in int64 (``sum np*(2*below + nn)`` — the
    x2 avoids the half-rank fraction) and ONE final double division."""
    from ray.data.aggregate import Sum

    from .queries_text import lr_micro_scores

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])

    empty = pa.table(
        {
            "sk": pa.array([], pa.int64()),
            "np_": pa.array([], pa.int64()),
            "nn_": pa.array([], pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        sk = lr_micro_scores(t["text"].combine_chunks())
        pos = pc.equal(t["lang"].combine_chunks(), "en").cast(pa.int64())
        posn = np.asarray(pos).astype(np.int64)
        g = (
            pa.table(
                {
                    "sk": pa.array(sk, pa.int64()),
                    "np_": pa.array(posn, pa.int64()),
                    "nn_": pa.array(1 - posn, pa.int64()),
                }
            )
            .group_by("sk")
            .aggregate([("np_", "sum"), ("nn_", "sum")])
        )
        return g.rename_columns(["sk", "np_", "nn_"])

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sk")
        .aggregate(Sum("np_", alias_name="np"), Sum("nn_", alias_name="nn"))
        .take_all()
    )  # <= 1e6+1 rows by construction
    rows.sort(key=lambda r: r["sk"])
    npos = np.array([r["np"] for r in rows], dtype=np.int64)
    nneg = np.array([r["nn"] for r in rows], dtype=np.int64)
    P, N = int(npos.sum()), int(nneg.sum())
    if P == 0 or N == 0:
        auc = None
    else:
        below = np.concatenate(([0], np.cumsum(nneg)[:-1]))
        num = int((npos * (2 * below + nneg)).sum())  # 2x rank-sum numerator
        auc = float(round6(num / (2.0 * P * N)))
    return pa.table(
        {
            "auc": pa.array([auc], pa.float64()),
            "n_pos": pa.array([P], pa.int64()),
            "n_neg": pa.array([N], pa.int64()),
        }
    )


def _docs_lr_auc_sql() -> str:
    from .queries_text import DOCS_QUALITY_LR_SQL

    return f"""
WITH lr AS ({DOCS_QUALITY_LR_SQL.strip()}),
k AS (
    SELECT CAST(round(lr.q_score * 1000000) AS BIGINT) AS sk,
           CAST(count(*) FILTER (d.lang = 'en') AS BIGINT) AS np,
           CAST(count(*) FILTER (d.lang <> 'en') AS BIGINT) AS nn
    FROM lr JOIN documents d USING (doc_id)
    GROUP BY sk
),
c AS (
    SELECT np, nn,
           CAST(coalesce(sum(nn) OVER (
               ORDER BY sk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS below
    FROM k
)
SELECT ROUND(CAST(sum(np * (2 * below + nn)) AS BIGINT)
             / (2.0 * (SELECT sum(np) FROM k) * (SELECT sum(nn) FROM k)), 6)
           AS auc,
       CAST((SELECT sum(np) FROM k) AS BIGINT) AS n_pos,
       CAST((SELECT sum(nn) FROM k) AS BIGINT) AS n_neg
FROM c
"""


# --------------------------------------------------------------------------
# Mutual information between event_type and day-of-week
# --------------------------------------------------------------------------


def q_events_mi_type_dow(sf_dir: str):
    """Pointwise mutual information of (event_type, day-of-week): per
    cell the joint count and ``pmi = ln(n*N / (nx*ny))`` — the
    categorical-association check behind seasonality features (dow
    follows DuckDB ``dayofweek``: 0 = Sunday).

    Counts stay integer through the fold; each pmi is one double
    division of exact int64 products (cell x total <= N^2, int64-safe to
    ~3e9 rows per side — beyond that the twin SQL overflows identically,
    so the contract stays symmetric) and one log, identical on both
    engines, rounded to 6 decimals."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["ts", "event_type"])
    _US_DAY = 86_400_000_000

    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "dow": pa.array([], pa.int64()),
            "pn": pa.array([], pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        dow = (us // _US_DAY + 4) % 7  # 1970-01-01 is a Thursday (=4)
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "dow": pa.array(dow, pa.int64()),
                }
            )
            .group_by(["event_type", "dow"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "dow", "pn"])

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "dow"])
        .aggregate(Sum("pn", alias_name="n"))
        .take_all()
    )  # O(|types| x 7)
    et = [r["event_type"] for r in rows]
    dw = np.array([r["dow"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    N = int(n.sum())
    nx: dict[str, int] = {}
    ny: dict[int, int] = {}
    for e, d, c in zip(et, dw, n):
        nx[e] = nx.get(e, 0) + int(c)
        ny[int(d)] = ny.get(int(d), 0) + int(c)
    nxa = np.array([nx[e] for e in et], dtype=np.int64)
    nya = np.array([ny[int(d)] for d in dw], dtype=np.int64)
    pmi = round6(np.log((n.astype(np.float64) * N) / (nxa.astype(np.float64) * nya)))
    return pa.table(
        {
            "event_type": pa.array(et, pa.string()),
            "dow": pa.array(dw, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "pmi": pa.array(pmi, pa.float64()),
        }
    )


EVENTS_MI_TYPE_DOW_SQL = """
WITH j AS (
    SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM j),
x AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nx FROM j GROUP BY 1),
y AS (SELECT dow, CAST(sum(n) AS BIGINT) AS ny FROM j GROUP BY 1)
SELECT j.event_type, j.dow, j.n,
       ROUND(ln((CAST(j.n AS DOUBLE) * t.N)
                / (CAST(x.nx AS DOUBLE) * y.ny)), 6) AS pmi
FROM j
CROSS JOIN t
JOIN x ON j.event_type = x.event_type
JOIN y ON j.dow = y.dow
"""


# --------------------------------------------------------------------------
# Leave-one-out target encoding
# --------------------------------------------------------------------------


def q_events_target_encode_loo(sf_dir: str):
    """Leave-one-out target encoding of ``event_type`` by mean ``value``:
    each row is encoded with the mean of ALL OTHER rows of its category
    (``(sum - v_i) / (n - 1)``) — the leakage-free variant of
    ``features_target_encode`` used when the encode feeds the same rows
    it was fit on. Singleton categories encode NULL.

    Plan: tiny per-type (sum, count) fold in exact cents (vocabulary-
    sized), then ONE streamed encode pass with the folded stats riding
    the task closure — event rows are never shuffled or collected."""
    from ray.data.aggregate import Count, Sum

    ds = _events(sf_dir, columns=["event_id", "event_type", "value"])

    def cents_col(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        mask = pc.is_valid(t["value"])
        t = t.filter(mask) if pc.any(pc.invert(mask)).as_py() else t
        return pa.table(
            {
                "event_type": t["event_type"],
                "c": pa.array(_cents(np.asarray(t["value"].combine_chunks())), pa.int64()),
            }
        )

    stats = (
        ds.map_batches(cents_col, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("c", alias_name="s"), Count(alias_name="n"))
        .take_all()
    )  # O(|event_type|) — a small vocabulary
    vocab = pa.array([r["event_type"] for r in stats], pa.string())
    vsum = np.array([int(r["s"]) for r in stats], dtype=np.int64)
    vcnt = np.array([int(r["n"]) for r in stats], dtype=np.int64)

    def encode(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "enc": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        mask = pc.is_valid(t["value"])
        t = t.filter(mask) if pc.any(pc.invert(mask)).as_py() else t
        if t.num_rows == 0:
            return empty
        et = t["event_type"].combine_chunks()
        c = _cents(np.asarray(t["value"].combine_chunks()))
        idx = np.asarray(pc.index_in(et, value_set=vocab).cast(pa.int64()))
        s = vsum[idx]
        n = vcnt[idx]
        multi = n > 1
        enc = np.full(len(c), np.nan)
        enc[multi] = round6(
            (s[multi] - c[multi]) / (100.0 * (n[multi] - 1))
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": et,
                "enc": pa.array(
                    np.where(multi, enc, np.nan), pa.float64(), mask=~multi
                ),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


EVENTS_TARGET_ENCODE_LOO_SQL = """
WITH e AS (
    SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL
),
s AS (
    SELECT event_id, event_type, c,
           CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS ts,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS tn
    FROM e
)
SELECT event_id, event_type,
       CASE WHEN tn > 1
            THEN ROUND((ts - c) / (100.0 * (tn - 1)), 6)
            ELSE NULL END AS enc
FROM s
"""


# --------------------------------------------------------------------------
# Calibration curve of the frozen LR quality classifier
# --------------------------------------------------------------------------


def q_docs_lr_calibration(sf_dir: str):
    """Reliability curve for the frozen LR quality score against the
    ``lang = 'en'`` proxy label: per score decile, count, mean predicted
    score, and observed positive rate — the companion diagnostic to
    ``docs_lr_auc`` (AUC measures ranking; calibration measures whether
    0.8 means 80%).

    Exactness: scores are summed as exact int64 micro-units (the score
    is already 6-decimal), so the per-bin mean is ONE double division;
    10 bins, O(10) driver arithmetic, zero keyed exchanges."""
    from ray.data.aggregate import Sum

    from .queries_text import lr_micro_scores

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])

    empty = pa.table(
        {
            "bin": pa.array([], pa.int64()),
            "pn": pa.array([], pa.int64()),
            "ps": pa.array([], pa.int64()),
            "pp": pa.array([], pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        sk = lr_micro_scores(t["text"].combine_chunks())
        b = np.minimum(sk // 100_000, 9)  # decile bin, score 1.0 -> bin 9
        pos = np.asarray(
            pc.equal(t["lang"].combine_chunks(), "en").cast(pa.int64())
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "bin": pa.array(b, pa.int64()),
                    "pn": pa.array(np.ones(len(b), dtype=np.int64), pa.int64()),
                    "ps": pa.array(sk, pa.int64()),
                    "pp": pa.array(pos, pa.int64()),
                }
            )
            .group_by("bin")
            .aggregate([("pn", "sum"), ("ps", "sum"), ("pp", "sum")])
        )
        return g.rename_columns(["bin", "pn", "ps", "pp"])

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("ps", alias_name="s"),
            Sum("pp", alias_name="p"),
        )
        .take_all()
    )  # <= 10 rows
    rows.sort(key=lambda r: r["bin"])
    b = np.array([r["bin"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    s = np.array([r["s"] for r in rows], dtype=np.int64)
    p = np.array([r["p"] for r in rows], dtype=np.int64)
    return pa.table(
        {
            "bin": pa.array(b, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "mean_score": pa.array(round6(s / (n * 1e6)), pa.float64()),
            "pos_rate": pa.array(round6(p / n.astype(np.float64)), pa.float64()),
        }
    )


def _docs_lr_calibration_sql() -> str:
    from .queries_text import DOCS_QUALITY_LR_SQL

    return f"""
WITH lr AS ({DOCS_QUALITY_LR_SQL.strip()}),
k AS (
    SELECT least(CAST(round(lr.q_score * 1000000) AS BIGINT) // 100000, 9)
               AS bin,
           CAST(round(lr.q_score * 1000000) AS BIGINT) AS sk,
           CAST(d.lang = 'en' AS BIGINT) AS pos
    FROM lr JOIN documents d USING (doc_id)
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       ROUND(CAST(sum(sk) AS BIGINT) / (count(*) * 1000000.0), 6) AS mean_score,
       ROUND(CAST(sum(pos) AS BIGINT) / CAST(count(*) AS DOUBLE), 6) AS pos_rate
FROM k GROUP BY bin
"""


# --------------------------------------------------------------------------
# Pareto front (skyline) for data selection
# --------------------------------------------------------------------------


def q_docs_pareto_front(sf_dir: str):
    """Skyline data selection: the documents NOT dominated on
    (n_chars, quality score) — i.e. no other doc is >= on both axes and
    strictly better on one. The Pareto front is the standard shortlist
    when two curation signals trade off (longer docs vs higher quality).

    Plan: a per-distinct-``n_chars`` max-score fold (O(distinct lengths),
    bounded by the max document length, NOT the corpus size), a driver
    suffix-max over descending length, then ONE streamed filter pass
    with the tiny front map riding the closure. Dominance needs only
    ``maxY(x > x_i) < y_i`` and ``maxY(x = x_i) = y_i`` — duplicated
    (x, y) points do not dominate each other and all stay on the front."""
    from ray.data.aggregate import Max

    from .queries_text import lr_micro_scores

    ds = _docs(sf_dir, columns=["doc_id", "text", "n_chars"])

    def with_sk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "sk": pa.array([], pa.int64()),
                }
            )
        sk = lr_micro_scores(t["text"].combine_chunks())
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                "n_chars": t["n_chars"].combine_chunks().cast(pa.int64()),
                "sk": pa.array(sk, pa.int64()),
            }
        )

    # materialize the slim (doc_id, n_chars, sk) projection: it feeds TWO
    # consumers (max-score fold + front filter) and a lazy dataset would
    # re-run the parquet read and the LR tokenization for each
    scored = ds.map_batches(
        with_sk, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def maxy_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n_chars": pa.array([], pa.int64()), "my": pa.array([], pa.int64())}
            )
        g = t.group_by("n_chars").aggregate([("sk", "max")])
        return g.rename_columns(["n_chars", "my"])

    stats = (
        scored.map_batches(maxy_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_chars")
        .aggregate(Max("my", alias_name="maxy"))
        .take_all()
    )  # O(distinct n_chars) — bounded by max doc length
    stats.sort(key=lambda r: r["n_chars"])
    xs = np.array([r["n_chars"] for r in stats], dtype=np.int64)
    my = np.array([r["maxy"] for r in stats], dtype=np.int64)
    # suffix max over larger x: above[i] = max maxy over x > xs[i]
    above = np.concatenate(
        (np.maximum.accumulate(my[::-1])[::-1][1:], [np.iinfo(np.int64).min])
    )

    def keep_front(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["doc_id", "n_chars", "sk"])
        x = np.asarray(t["n_chars"].combine_chunks())
        y = np.asarray(t["sk"].combine_chunks())
        i = np.searchsorted(xs, x)  # every x is present in xs
        keep = (above[i] < y) & (my[i] == y)
        return t.filter(pa.array(keep)).select(["doc_id", "n_chars", "sk"])

    out = scored.map_batches(keep_front, batch_format="pyarrow", zero_copy_batch=True)
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "q_score_micro": t["sk"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _docs_pareto_front_sql() -> str:
    from .queries_text import DOCS_QUALITY_LR_SQL

    return f"""
WITH lr AS ({DOCS_QUALITY_LR_SQL.strip()}),
pts AS (
    SELECT d.doc_id, d.n_chars,
           CAST(round(lr.q_score * 1000000) AS BIGINT) AS q_score_micro
    FROM lr JOIN documents d USING (doc_id)
)
SELECT p.doc_id, p.n_chars, p.q_score_micro
FROM pts p
WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.n_chars >= p.n_chars AND q.q_score_micro >= p.q_score_micro
      AND (q.n_chars > p.n_chars OR q.q_score_micro > p.q_score_micro)
)
"""


# --------------------------------------------------------------------------
# Exact-k uniform sample per group
# --------------------------------------------------------------------------

KPG_K = 25
KPG_SALT = 401


def _seg_bottomk(langs: np.ndarray, hk: np.ndarray, k: int):
    """Per-group bottom-k by hash rank: returns (selected row indices,
    each row's 0-based rank within its group) — the one kernel both the
    per-batch pass and the final cut run."""
    _uniq, inv = np.unique(langs, return_inverse=True)
    order = np.lexsort((hk, inv))
    inv_s = inv[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(inv_s)) + 1))
    cum = np.arange(len(order)) - np.repeat(
        starts, np.diff(np.concatenate((starts, [len(order)])))
    )
    keep = cum < k
    return order[keep], cum[keep]


def q_docs_sample_k_per_lang(sf_dir: str):
    """Exactly-k uniform sample WITHOUT replacement per language — the
    per-stratum version of ``docs_sample_weighted_k`` (equal-size
    eval/debug slices per language regardless of corpus skew). Rank is
    the hash-deterministic uint64 ``splitmix64(doc_id + salt)``, ties
    impossible (doc_id is unique), so the sample is re-run and
    partitioning stable with no RNG state.

    Plan: ZERO shuffles — per-batch per-lang bottom-k (segmented lexsort
    over the batch's lang codes), then a single-block final cut moves
    O(k x |langs| x blocks) rows."""
    from ..stages.keyed import splitmix64

    ds = _docs(sf_dir, columns=["doc_id", "lang"])

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "hk": pa.array([], pa.uint64()),
        }
    )

    def bottomk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        ids = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        langs = np.asarray(t["lang"].combine_chunks())
        hk = splitmix64(ids.astype(np.uint64) + np.uint64(KPG_SALT))
        sel, _cum = _seg_bottomk(langs, hk, KPG_K)
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "lang": pa.array(langs[sel], pa.string()),
                "hk": pa.array(hk[sel], pa.uint64()),
            }
        )

    cands = ds.map_batches(bottomk, batch_format="pyarrow", zero_copy_batch=True)

    def final_cut(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "rk": pa.array([], pa.int64()),
                }
            )
        ids = np.asarray(t["doc_id"].combine_chunks())
        langs = np.asarray(t["lang"].combine_chunks())
        hk = np.asarray(t["hk"].combine_chunks())
        sel, cum = _seg_bottomk(langs, hk, KPG_K)
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "lang": pa.array(langs[sel], pa.string()),
                "rk": pa.array(cum + 1, pa.int64()),
            }
        )

    return cands.repartition(1).map_batches(
        final_cut, batch_format="pyarrow", batch_size=None
    )


def _docs_sample_k_per_lang_sql() -> str:
    from .queries_relational import splitmix64_hash_sql

    return f"""
WITH {splitmix64_hash_sql('doc_id', 'documents', KPG_SALT, '__g')},
r AS (
    SELECT doc_id, lang,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY __gh) AS BIGINT)
               AS rk
    FROM __g5
)
SELECT doc_id, lang, rk FROM r WHERE rk <= {KPG_K}
"""


# --------------------------------------------------------------------------
# CUPED variance-reduced A/B uplift
# --------------------------------------------------------------------------

CUPED_SALT = 727


def q_events_cuped(sf_dir: str):
    """A/B experiment readout with CUPED variance reduction (Deng et al.
    2013): users are hash-assigned to two arms, the post-period per-user
    metric ``y`` is adjusted by the pre-period covariate ``x``
    (``y - theta (x - x̄)`` with pooled ``theta = cov(x,y)/var(x)``), and
    the readout is the raw and adjusted uplift — the standard analysis a
    feature platform runs on every experiment flag.

    Plan: per-user (x, y) cent sums via ONE exact keyed fold, then each
    whole partition collapses to TWO rows of int64 moment partials
    (n, Σx, Σy, Σxx, Σxy per arm — magnitudes are headroom-guarded and
    raise loudly instead of wrapping), a tiny groupby fold, and the
    closed-form CUPED arithmetic on the O(2) result with
    arbitrary-precision ints up to the few final double ops — mirrored
    HUGEINT-for-HUGEINT by the SQL twin."""
    from ray.data.aggregate import Sum

    from ..stages.keyed import fold_by_keys, splitmix64

    ds = _events(sf_dir, columns=["user_id", "ts", "value"])

    def user_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        mask = pc.is_valid(t["value"])
        t = t.filter(mask) if pc.any(pc.invert(mask)).as_py() else t
        if t.num_rows == 0:
            return empty
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        c = _cents(np.asarray(t["value"].combine_chunks()))
        pre = us < _SPLIT_US
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "x": pa.array(np.where(pre, c, 0), pa.int64()),
                "y": pa.array(np.where(pre, 0, c), pa.int64()),
            }
        )

    per_user = fold_by_keys(
        ds.map_batches(user_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        sums=("x", "y"),
        num_parts=8,
    )

    def moments(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "arm": pa.array([], pa.int64()),
                **{c: pa.array([], pa.int64()) for c in ["n", "sx", "sy", "sxx", "sxy"]},
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        x = np.asarray(t["x"].combine_chunks())
        y = np.asarray(t["y"].combine_chunks())
        arm = (splitmix64(uid.astype(np.uint64) + np.uint64(CUPED_SALT))
               % np.uint64(2)).astype(np.int64)
        mx = int(max(np.abs(x).max(initial=0), 1))
        my = int(max(np.abs(y).max(initial=0), 1))
        # vectorized int64 dot is exact only with headroom; otherwise fall
        # back to arbitrary-precision python ints (slower, never wrong)
        fast = len(x) * mx * max(mx, my) < (1 << 62)
        out = {"arm": [], "n": [], "sx": [], "sy": [], "sxx": [], "sxy": []}
        for a in (0, 1):
            m = arm == a
            if not m.any():
                continue
            xa, ya = x[m], y[m]
            out["arm"].append(a)
            out["n"].append(int(m.sum()))
            out["sx"].append(int(xa.sum()))
            out["sy"].append(int(ya.sum()))
            if fast:
                out["sxx"].append(int(np.dot(xa, xa)))
                out["sxy"].append(int(np.dot(xa, ya)))
            else:
                xl, yl = xa.tolist(), ya.tolist()
                out["sxx"].append(sum(v * v for v in xl))
                out["sxy"].append(sum(u * v for u, v in zip(xl, yl)))
        # bound each PARTIAL at 2^62/2^10 so the downstream int64 Sum fold
        # (one partial per keyed partition; far fewer than 1024) cannot
        # wrap either — the guard must cover the fold, not just this task
        for c in ("sxx", "sxy"):
            if any(abs(v) >= 1 << 52 for v in out[c]):
                raise OverflowError(
                    "cuped: moment partial exceeds int64 fold headroom — "
                    "shrink the metric unit or raise num_parts"
                )
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    folded = (
        per_user.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("arm")
        .aggregate(
            *[Sum(c, alias_name=c) for c in ["n", "sx", "sy", "sxx", "sxy"]]
        )
        .take_all()
    )  # exactly <= 2 rows
    stats = {int(r["arm"]): r for r in folded}
    # pooled theta runs over whatever arms exist (the twin's m aggregate
    # is arm-agnostic); only the per-arm scalars go NULL for a missing arm
    N = sum(int(r["n"]) for r in folded)
    Sx = sum(int(r["sx"]) for r in folded)
    Sy = sum(int(r["sy"]) for r in folded)
    Sxx = sum(int(r["sxx"]) for r in folded)
    Sxy = sum(int(r["sxy"]) for r in folded)
    cov_num = N * Sxy - Sx * Sy  # exact python ints (HUGEINT twin)
    var_num = N * Sxx - Sx * Sx
    theta = None if var_num == 0 else float(cov_num) / float(var_num)
    if 0 not in stats or 1 not in stats:
        # empty arm: the twin's scalar subqueries return NULL, not 0
        na = stats[0]["n"] if 0 in stats else None
        nb = stats[1]["n"] if 1 in stats else None
        r6_ = lambda v: None if v is None else float(round6(np.array([v]))[0])
        return pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "theta": pa.array([r6_(theta)], pa.float64()),
                "uplift_raw": pa.array([None], pa.float64()),
                "uplift_cuped": pa.array([None], pa.float64()),
            }
        )
    a, b = stats[0], stats[1]
    mya = int(a["sy"]) / float(int(a["n"])) / 100.0
    myb = int(b["sy"]) / float(int(b["n"])) / 100.0
    mxa = int(a["sx"]) / float(int(a["n"])) / 100.0
    mxb = int(b["sx"]) / float(int(b["n"])) / 100.0
    raw = myb - mya
    cuped = None if theta is None else (myb - mya) - theta * (mxb - mxa)
    r6 = lambda v: None if v is None else float(round6(np.array([v]))[0])
    return pa.table(
        {
            "n_a": pa.array([int(a["n"])], pa.int64()),
            "n_b": pa.array([int(b["n"])], pa.int64()),
            "theta": pa.array([r6(theta)], pa.float64()),
            "uplift_raw": pa.array([r6(raw)], pa.float64()),
            "uplift_cuped": pa.array([r6(cuped)], pa.float64()),
        }
    )


def _events_cuped_sql() -> str:
    from .queries_relational import splitmix64_hash_sql

    return f"""
WITH pu0 AS (
    SELECT user_id,
           CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                FILTER (ts < {_SPLIT_SQL}), 0) AS BIGINT) AS x,
           CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                FILTER (ts >= {_SPLIT_SQL}), 0) AS BIGINT) AS y
    FROM events WHERE value IS NOT NULL GROUP BY user_id
),
{splitmix64_hash_sql('user_id', 'pu0', CUPED_SALT, '__c')},
pu AS (SELECT user_id, x, y, CAST(__ch % 2 AS BIGINT) AS arm FROM __c5),
m AS (
    SELECT arm, CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(x::HUGEINT) AS HUGEINT) AS sx,
           CAST(sum(y::HUGEINT) AS HUGEINT) AS sy,
           CAST(sum(x::HUGEINT * x) AS HUGEINT) AS sxx,
           CAST(sum(x::HUGEINT * y) AS HUGEINT) AS sxy
    FROM pu GROUP BY arm
),
p AS (
    SELECT (SELECT n + 0 FROM m WHERE arm = 0) AS na,
           (SELECT n + 0 FROM m WHERE arm = 1) AS nb,
           (SELECT sx FROM m WHERE arm = 0) AS sxa,
           (SELECT sx FROM m WHERE arm = 1) AS sxb,
           (SELECT sy FROM m WHERE arm = 0) AS sya,
           (SELECT sy FROM m WHERE arm = 1) AS syb
),
t AS (
    SELECT ((SELECT sum(n) FROM m) * (SELECT sum(sxy) FROM m)
            - (SELECT sum(sx) FROM m) * (SELECT sum(sy) FROM m)) AS cov_num,
           ((SELECT sum(n) FROM m) * (SELECT sum(sxx) FROM m)
            - (SELECT sum(sx) FROM m) * (SELECT sum(sx) FROM m)) AS var_num
)
SELECT CAST(p.na AS BIGINT) AS n_a, CAST(p.nb AS BIGINT) AS n_b,
       ROUND(CAST(t.cov_num AS DOUBLE) / CAST(t.var_num AS DOUBLE), 6)
           AS theta,
       ROUND(CAST(p.syb AS DOUBLE) / CAST(p.nb AS DOUBLE) / 100.0
             - CAST(p.sya AS DOUBLE) / CAST(p.na AS DOUBLE) / 100.0, 6)
           AS uplift_raw,
       ROUND((CAST(p.syb AS DOUBLE) / CAST(p.nb AS DOUBLE) / 100.0
              - CAST(p.sya AS DOUBLE) / CAST(p.na AS DOUBLE) / 100.0)
             - (CAST(t.cov_num AS DOUBLE) / CAST(t.var_num AS DOUBLE))
               * (CAST(p.sxb AS DOUBLE) / CAST(p.nb AS DOUBLE) / 100.0
                  - CAST(p.sxa AS DOUBLE) / CAST(p.na AS DOUBLE) / 100.0), 6)
           AS uplift_cuped
FROM p, t
"""


# --------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) check for the experiment assignment
# --------------------------------------------------------------------------


def q_events_srm_check(sf_dir: str):
    """Sample-ratio-mismatch guardrail for the hash-based A/B assignment
    (the first thing to check before reading ``events_cuped``): per-arm
    distinct-user counts, the 50/50 chi-square statistic
    ``(n_a - n_b)^2 / (n_a + n_b)``, and the standard 95 % flag
    (chi2 > 3.841459 — a triggered flag means the assignment itself is
    broken and the uplift is untrustworthy).

    Plan: ONE exact keyed fold dedups users, per-partition O(2) arm-count
    partials, a two-row groupby; counts stay int64 to the single
    division."""
    from ray.data.aggregate import Sum

    from ..stages.keyed import fold_by_keys, splitmix64

    ds = _events(sf_dir, columns=["user_id"])

    def uid_col(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "one": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64), pa.int64()),
            }
        )

    users = fold_by_keys(
        ds.map_batches(uid_col, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        mins=("one",),
        num_parts=8,
    )

    def arm_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"arm": pa.array([], pa.int64()), "pn": pa.array([], pa.int64())}
            )
        uid = np.asarray(t["user_id"].combine_chunks())
        arm = (
            splitmix64(uid.astype(np.uint64) + np.uint64(CUPED_SALT))
            % np.uint64(2)
        ).astype(np.int64)
        return pa.table(
            {
                "arm": pa.array([0, 1], pa.int64()),
                "pn": pa.array(
                    [int((arm == 0).sum()), int((arm == 1).sum())], pa.int64()
                ),
            }
        )

    rows = (
        users.map_batches(arm_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("arm")
        .aggregate(Sum("pn", alias_name="n"))
        .take_all()
    )
    cnt = {int(r["arm"]): int(r["n"]) for r in rows}
    na, nb = cnt.get(0, 0), cnt.get(1, 0)
    if na + nb == 0:
        chi2 = None
        flag = None
    else:
        d = float(na - nb)
        raw = d * d / float(na + nb)
        chi2 = float(round6(np.array([raw]))[0])
        flag = int(raw > 3.841459)  # twin flags on the UNROUNDED value
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "chi2": pa.array([chi2], pa.float64()),
            "srm_flag": pa.array([flag], pa.int64()),
        }
    )


def _events_srm_sql() -> str:
    from .queries_relational import splitmix64_hash_sql

    return f"""
WITH u0 AS (SELECT DISTINCT user_id FROM events),
{splitmix64_hash_sql('user_id', 'u0', CUPED_SALT, '__m')},
a AS (
    SELECT CAST(count(*) FILTER (__mh % 2 = 0) AS BIGINT) AS n_a,
           CAST(count(*) FILTER (__mh % 2 = 1) AS BIGINT) AS n_b
    FROM __m5
)
SELECT n_a, n_b,
       ROUND(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE), 6) AS chi2,
       CAST((CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE)) > 3.841459 AS BIGINT) AS srm_flag
FROM a
"""


REGISTRY: dict[str, tuple] = {
    "events_ks_drift": (q_events_ks_drift, EVENTS_KS_DRIFT_SQL),
    "events_welch_t": (q_events_welch_t, EVENTS_WELCH_T_SQL),
    "docs_lr_auc": (q_docs_lr_auc, _docs_lr_auc_sql()),
    "events_mi_type_dow": (q_events_mi_type_dow, EVENTS_MI_TYPE_DOW_SQL),
    "events_target_encode_loo": (
        q_events_target_encode_loo,
        EVENTS_TARGET_ENCODE_LOO_SQL,
    ),
    "docs_lr_calibration": (q_docs_lr_calibration, _docs_lr_calibration_sql()),
    "docs_pareto_front": (q_docs_pareto_front, _docs_pareto_front_sql()),
    "docs_sample_k_per_lang": (
        q_docs_sample_k_per_lang,
        _docs_sample_k_per_lang_sql(),
    ),
    "events_cuped": (q_events_cuped, _events_cuped_sql()),
    "events_srm_check": (q_events_srm_check, _events_srm_sql()),
}

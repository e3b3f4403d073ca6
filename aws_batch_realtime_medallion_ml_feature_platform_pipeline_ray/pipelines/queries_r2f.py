"""Round-2f operators: experiment ratio-metric CI, discounted reward
credit assignment, bigram PMI association, and seasonal-naive forecast
error.

- ``events_ratio_ci``: delta-method confidence interval for a RATIO
  metric (revenue per event) per experiment arm — the readout that
  complements ``events_cuped`` / ``events_welch_t`` when the metric is
  a quotient of two per-user sums (mean-of-sums, not mean-of-means),
  where naive per-user averaging is biased and the delta method is the
  standard practice.
- ``conv_reward_decay``: discounted credit assignment over transcript
  turns — each turn at distance k before the conversation's terminal
  ``purchase`` turn receives ``reward / 2^k`` (the RLHF-ish "which
  turns led to the conversion" signal). The γ=1/2 decay is a power of
  two, so every credited value is bit-exact on both sides with no
  rounding step.
- ``docs_pmi_bigrams``: pointwise mutual information of adjacent token
  pairs over the corpus — the collocation/association score next to
  the count-layer ``docs_bigram_lm``.
- ``events_seasonal_naive``: per-user MAE of the seasonal-naive
  forecast (value vs value 7 days earlier on the LOCF daily grid) —
  the baseline every forecasting feature must beat, and a drift check
  on weekly seasonality.

Scale shapes: ratio CI reuses the CUPED moment plan (per-user exact
keyed fold → O(arms) int partials → closed form on ≤2 rows); reward
decay and seasonal-naive are single keyed exchanges with pure segment
arithmetic; PMI does two vocabulary-keyed exchanges (w1 then w2) over
the bigram-count table — which is vocabulary²-bounded, NOT corpus-
bounded, so the one mid-pipeline ``materialize()`` (needed to read the
global bigram mass N before scoring) pins a bounded table, never the
corpus.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as T
from ..functions import windows as W
from ..functions.numeric import round6, round_half_away
from ..sources.reads import read_parquet_sized
from ..sources.transcripts import TRANSCRIPTS_SQL_CTE, read_events_as_transcripts
from ..stages.keyed import fold_by_keys, map_partitions_by_key, splitmix64
from .queries import _conv_order, _turn_idx

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

_US_PER_DAY = 86_400_000_000


def _cents(val: np.ndarray) -> np.ndarray:
    return round_half_away(np.asarray(val, dtype=np.float64) * 100.0).astype(
        np.int64
    )


# ---------------------------------------------------------------------------
# events_ratio_ci — delta-method CI for revenue-per-event by arm
# ---------------------------------------------------------------------------

RATIO_SALT = 919
_Z95 = 1.96


def q_events_ratio_ci(sf_dir: str):
    """Per experiment arm (hash-assigned like ``events_cuped``): the
    ratio metric ``Σ value / Σ events`` with its delta-method standard
    error and 95% CI. Per-user (x=events, y=value cents) via ONE exact
    keyed fold; each partition collapses to O(arms) int64 moment rows
    (n, Σx, Σy, Σx², Σy², Σxy — headroom-guarded); a tiny arm fold; and
    the closed-form delta arithmetic on ≤2 rows with arbitrary-precision
    integer numerators up to the mirrored final double ops."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

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
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        c = _cents(np.asarray(t["value"].combine_chunks()))
        o = np.argsort(uid, kind="stable")
        s_, _e, ln = W.segment_bounds(uid[o])
        return pa.table(
            {
                "user_id": pa.array(uid[o][s_]),
                "x": pa.array(ln.astype(np.int64)),
                "y": pa.array(np.add.reduceat(c[o], s_)),
            }
        )

    per_user = fold_by_keys(
        ds.map_batches(user_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"],
        sums=("x", "y"),
        num_parts=NUM_PARTS,
    )

    def moments(t: pa.Table) -> pa.Table:
        cols = ["arm", "n", "sx", "sy", "sxx", "syy", "sxy"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        uid = np.asarray(t["user_id"].combine_chunks())
        x = np.asarray(t["x"].combine_chunks())
        y = np.asarray(t["y"].combine_chunks())
        arm = (splitmix64(uid.astype(np.uint64) + np.uint64(RATIO_SALT))
               % np.uint64(2)).astype(np.int64)
        out = {c: [] for c in cols}
        fast = (
            len(y) == 0
            or (np.abs(y.astype(np.float64)).max() < 3e9
                and np.abs(x.astype(np.float64)).max() < 3e9)
        )
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
                out["syy"].append(int(np.dot(ya, ya)))
                out["sxy"].append(int(np.dot(xa, ya)))
            else:
                xl, yl = xa.tolist(), ya.tolist()
                out["sxx"].append(sum(v * v for v in xl))
                out["syy"].append(sum(v * v for v in yl))
                out["sxy"].append(sum(u * v for u, v in zip(xl, yl)))
        for c in ("sxx", "syy", "sxy"):
            if any(abs(v) >= 1 << 52 for v in out[c]):
                raise OverflowError(
                    "ratio_ci: moment partial exceeds int64 fold headroom — "
                    "shrink the metric unit or raise num_parts"
                )
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    folded = (
        map_partitions_by_key(per_user, "user_id", moments,
                              num_parts=NUM_PARTS)
        .groupby("arm")
        .aggregate(
            *[Sum(c, alias_name=c)
              for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]]
        )
        .take_all()
    )  # <= 2 rows
    r6 = lambda v: None if v is None else float(round6(np.array([v]))[0])
    rows = {
        "arm": [], "n_users": [], "ratio": [], "se": [],
        "ci_lo": [], "ci_hi": [],
    }
    for r in sorted(folded, key=lambda r: int(r["arm"])):
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, syy, sxy = int(r["sxx"]), int(r["syy"]), int(r["sxy"])
        rows["arm"].append(int(r["arm"]))
        rows["n_users"].append(n)
        if n < 2 or sx <= 0:
            rows["ratio"].append(None)
            rows["se"].append(None)
            rows["ci_lo"].append(None)
            rows["ci_hi"].append(None)
            continue
        R = float(sy) / float(sx)  # cents per event (raw)
        varx = float(n * sxx - sx * sx) / (float(n) * float(n - 1))
        vary = float(n * syy - sy * sy) / (float(n) * float(n - 1))
        cov = float(n * sxy - sx * sy) / (float(n) * float(n - 1))
        mx = float(sx) / float(n)
        se2 = (vary - 2.0 * R * cov + R * R * varx) / (float(n) * mx * mx)
        se = math.sqrt(max(se2, 0.0)) / 100.0
        ratio = R / 100.0
        rows["ratio"].append(r6(ratio))
        rows["se"].append(r6(se))
        rows["ci_lo"].append(r6(ratio - _Z95 * se))
        rows["ci_hi"].append(r6(ratio + _Z95 * se))
    return pa.table(
        {
            "arm": pa.array(rows["arm"], pa.int64()),
            "n_users": pa.array(rows["n_users"], pa.int64()),
            "ratio": pa.array(rows["ratio"], pa.float64()),
            "se": pa.array(rows["se"], pa.float64()),
            "ci_lo": pa.array(rows["ci_lo"], pa.float64()),
            "ci_hi": pa.array(rows["ci_hi"], pa.float64()),
        }
    )


def _events_ratio_ci_sql() -> str:
    from .queries_relational import splitmix64_hash_sql

    # every appearance of the raw ratio / variance terms repeats the
    # identical expression subtree the kernel evaluates, so the final
    # doubles agree bit-for-bit before ROUND
    ratio_raw = "(sy::DOUBLE / sx::DOUBLE)"
    varx = ("(CAST(n * sxx - sx * sx AS DOUBLE)"
            " / (n::DOUBLE * (n - 1)::DOUBLE))")
    vary = ("(CAST(n * syy - sy * sy AS DOUBLE)"
            " / (n::DOUBLE * (n - 1)::DOUBLE))")
    cov = ("(CAST(n * sxy - sx * sy AS DOUBLE)"
           " / (n::DOUBLE * (n - 1)::DOUBLE))")
    mx = "(sx::DOUBLE / n::DOUBLE)"
    se_raw = (
        f"(sqrt(greatest(({vary} - 2.0 * {ratio_raw} * {cov}"
        f" + {ratio_raw} * {ratio_raw} * {varx})"
        f" / (n::DOUBLE * {mx} * {mx}), 0.0)) / 100.0)"
    )
    ok = "(n >= 2 AND sx > 0)"
    return f"""
WITH pu AS (
    SELECT user_id, count(*)::BIGINT AS x,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events WHERE value IS NOT NULL GROUP BY 1
),
{splitmix64_hash_sql('user_id', 'pu', RATIO_SALT, '__r')},
pa_ AS (SELECT x, y, CAST(__rh % 2 AS BIGINT) AS arm FROM __r5),
m AS (
    SELECT arm, CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(x::HUGEINT) AS HUGEINT) AS sx,
           CAST(sum(y::HUGEINT) AS HUGEINT) AS sy,
           CAST(sum(x::HUGEINT * x) AS HUGEINT) AS sxx,
           CAST(sum(y::HUGEINT * y) AS HUGEINT) AS syy,
           CAST(sum(x::HUGEINT * y) AS HUGEINT) AS sxy
    FROM pa_ GROUP BY arm
)
SELECT CAST(arm AS BIGINT) AS arm, CAST(n AS BIGINT) AS n_users,
       CASE WHEN {ok} THEN ROUND({ratio_raw} / 100.0, 6) END AS ratio,
       CASE WHEN {ok} THEN ROUND({se_raw}, 6) END AS se,
       CASE WHEN {ok} THEN
           ROUND({ratio_raw} / 100.0 - {_Z95} * {se_raw}, 6) END AS ci_lo,
       CASE WHEN {ok} THEN
           ROUND({ratio_raw} / 100.0 + {_Z95} * {se_raw}, 6) END AS ci_hi
FROM m
"""


# ---------------------------------------------------------------------------
# conv_reward_decay — discounted terminal-reward credit assignment
# ---------------------------------------------------------------------------

CREDIT_WINDOW = 16  # turns before the terminal purchase that get credit


def q_conv_reward_decay(sf_dir: str):
    """Credit assignment over transcript turns: the conversation's
    terminal ``purchase`` turn defines a reward (its whitespace token
    count), and every turn at distance k ≤ ``CREDIT_WINDOW`` before it
    receives ``reward / 2^k`` — the discounted-return signal (γ = 1/2)
    that labels which context turns preceded a conversion. Dividing by
    a power of two is exact in IEEE doubles, so no rounding step is
    needed for parity.

    ONE conv_id-keyed exchange; the terminal turn per conversation is a
    masked ``maximum.reduceat`` over segment bounds, and the credit is
    pure vectorized arithmetic — no joins, no per-row Python."""
    ds = read_events_as_transcripts(sf_dir)

    def fn(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "credit": pa.array([], pa.float64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        order, _k, _ts, seg_start = _conv_order(tbl)
        take = pa.array(order)
        roles = tbl["role"].combine_chunks().take(take)
        tok = T.token_count(tbl["text"].combine_chunks().take(take))
        pos = _turn_idx(seg_start)
        n = len(pos)
        is_p = np.asarray(pc.equal(roles, "purchase")).astype(bool)
        arange = np.arange(n, dtype=np.int64)
        starts = np.flatnonzero(seg_start)
        term = np.maximum.reduceat(np.where(is_p, arange, -1), starts)
        seg_len = np.diff(np.concatenate((starts, [n])))
        t_glob = np.repeat(term, seg_len)
        k_back = t_glob - arange
        keep = (t_glob >= 0) & (k_back >= 0) & (k_back <= CREDIT_WINDOW)
        if not keep.any():
            return empty
        reward = tok[np.maximum(t_glob, 0)].astype(np.float64)
        credit = reward / np.ldexp(1.0, k_back.astype(np.int64))
        idx = np.flatnonzero(keep)
        return pa.table(
            {
                "conv_id": tbl["conv_id"].combine_chunks().take(
                    pa.array(order[idx])
                ),
                "turn_idx": pa.array(pos[idx], pa.int32()),
                "credit": pa.array(credit[idx], pa.float64()),
            }
        )

    return map_partitions_by_key(ds, "conv_id", fn, num_parts=NUM_PARTS)


CONV_REWARD_DECAY_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
tp AS (
    SELECT conv_id, max(turn_idx) AS t_idx
    FROM transcripts WHERE role = 'purchase' GROUP BY 1
),
tv AS (
    SELECT tr.conv_id, tp.t_idx,
           length(string_split(tr.text, ' '))::BIGINT AS reward
    FROM tp JOIN transcripts tr
      ON tr.conv_id = tp.conv_id AND tr.turn_idx = tp.t_idx
)
SELECT tr.conv_id, tr.turn_idx,
       tv.reward::DOUBLE
           / ((1::BIGINT << (tv.t_idx - tr.turn_idx))::DOUBLE) AS credit
FROM transcripts tr JOIN tv ON tr.conv_id = tv.conv_id
WHERE tv.t_idx - tr.turn_idx BETWEEN 0 AND {CREDIT_WINDOW}
"""


# ---------------------------------------------------------------------------
# docs_pmi_bigrams — pointwise mutual information of adjacent tokens
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5


def bigram_pair_marginals(sf_dir: str):
    """The shared collocation count plan (PMI, log-likelihood ratio, …):
    per-batch bigram tf partials (the token stream never shuffles) →
    exchange keyed by w1 (pair counts + left marginals are segment sums
    in place) → exchange keyed by w2 (right marginals likewise) →
    ``materialize()`` of the vocabulary²-bounded pair table so N is ONE
    tiny aggregate over it. The pinned table scales with vocabulary,
    never with the corpus. Returns ``(pairs_dataset, n_total)`` where
    pairs has columns (w1, w2, c_ab, c_a, c_b)."""
    from .queries_extra import _bigram_tf_partial

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    rows = ds.map_batches(
        _bigram_tf_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def by_w1(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c_ab": pa.array([], pa.int64()),
                "c_a": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        import pandas as pd

        w1 = np.asarray(part["w1"].combine_chunks().cast(pa.large_string()))
        w2 = np.asarray(part["w2"].combine_chunks().cast(pa.large_string()))
        tf = np.asarray(part["tf"].combine_chunks()).astype(np.int64)
        a_inv, a_uniq = pd.factorize(w1)
        b_inv, b_uniq = pd.factorize(w2)
        if len(a_uniq) * len(b_uniq) >= np.iinfo(np.int64).max:
            raise OverflowError("pmi pair key packing would overflow int64")
        p_inv, p_uniq = pd.factorize(
            a_inv.astype(np.int64) * np.int64(len(b_uniq)) + b_inv
        )
        cab = np.zeros(len(p_uniq), np.int64)
        np.add.at(cab, p_inv, tf)
        ca = np.zeros(len(a_uniq), np.int64)
        np.add.at(ca, a_inv, tf)
        pa_idx = (p_uniq // np.int64(len(b_uniq))).astype(np.int64)
        pb_idx = (p_uniq % np.int64(len(b_uniq))).astype(np.int64)
        return pa.table(
            {
                "w1": pa.array(a_uniq[pa_idx]).cast(pa.string()),
                "w2": pa.array(b_uniq[pb_idx]).cast(pa.string()),
                "c_ab": pa.array(cab),
                "c_a": pa.array(ca[pa_idx]),
            }
        )

    pairs1 = map_partitions_by_key(rows, "w1", by_w1, num_parts=NUM_PARTS)

    def by_w2(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c_ab": pa.array([], pa.int64()),
                "c_a": pa.array([], pa.int64()),
                "c_b": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        import pandas as pd

        w2 = np.asarray(part["w2"].combine_chunks().cast(pa.large_string()))
        tf = np.asarray(part["c_ab"].combine_chunks()).astype(np.int64)
        b_inv, b_uniq = pd.factorize(w2)
        cb = np.zeros(len(b_uniq), np.int64)
        np.add.at(cb, b_inv, tf)
        return part.append_column("c_b", pa.array(cb[b_inv]))

    pairs = map_partitions_by_key(
        pairs1, "w2", by_w2, num_parts=NUM_PARTS
    ).materialize()  # vocabulary^2-bounded, never corpus-scale
    n_total = int(pairs.sum("c_ab"))
    return pairs, n_total


def q_docs_pmi_bigrams(sf_dir: str):
    """PMI collocation scores for adjacent token pairs:
    ``ln(c_ab · N / (c_a · c_b))`` where c_ab is the bigram count, c_a /
    c_b the left/right marginal counts and N the total bigram mass —
    the association layer on top of ``docs_bigram_lm``'s count layer
    (only pairs with c_ab ≥ {PMI_MIN_COUNT} are scored). Counts come
    from the shared :func:`bigram_pair_marginals` plan."""
    pairs, n_total = bigram_pair_marginals(sf_dir)

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c_ab": pa.array([], pa.int64()),
                "pmi": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        cab = np.asarray(t["c_ab"].combine_chunks())
        keep = cab >= PMI_MIN_COUNT
        if not keep.any():
            return empty
        idx = np.flatnonzero(keep)
        ca = np.asarray(t["c_a"].combine_chunks())[idx].astype(np.float64)
        cb = np.asarray(t["c_b"].combine_chunks())[idx].astype(np.float64)
        cf = cab[idx].astype(np.float64)
        pmi = round6(np.log((cf * float(n_total)) / (ca * cb)))
        take = pa.array(idx)
        return pa.table(
            {
                "w1": t["w1"].combine_chunks().take(take),
                "w2": t["w2"].combine_chunks().take(take),
                "c_ab": pa.array(cab[idx]),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return pairs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


DOCS_PMI_SQL = f"""
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
nt AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM cab)
SELECT cab.w1, cab.w2, cab.c_ab,
       ROUND(ln((cab.c_ab::DOUBLE * nt.n::DOUBLE)
                / (ca.c_a::DOUBLE * cb.c_b::DOUBLE)), 6) AS pmi
FROM cab JOIN ca USING (w1) JOIN cb USING (w2) CROSS JOIN nt
WHERE cab.c_ab >= {PMI_MIN_COUNT}
"""


# ---------------------------------------------------------------------------
# events_seasonal_naive — weekly seasonal-naive forecast error per user
# ---------------------------------------------------------------------------

SEASON_LAG_DAYS = 7


def q_events_seasonal_naive(sf_dir: str):
    """Per user: mean absolute error of the seasonal-naive forecast
    (today's value predicted by the value {SEASON_LAG_DAYS} days
    earlier) over the LOCF daily grid — the canonical forecast baseline
    and a per-entity weekly-seasonality drift signal. Values live in
    exact cents, so the error sum is an integer and only the final MAE
    divide is a (mirrored, rounded) double op.

    Same single keyed-exchange plan as ``events_resample_daily``: grid +
    LOCF by composite-axis searchsorted, then the lag-{SEASON_LAG_DAYS}
    comparison is pure index arithmetic inside each user's grid block."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_cmp": pa.array([], pa.int64()),
                "sae_cents": pa.array([], pa.int64()),
                "mae_cents": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        cents = _cents(np.asarray(t["value"].combine_chunks()))
        order = np.lexsort((eid, ts, uid))
        us, tss, vs = uid[order], ts[order], cents[order]
        day = tss // _US_PER_DAY
        if len(day) and int(day.min()) < 0:
            raise ValueError(
                "events_seasonal_naive: pre-epoch timestamps unsupported"
            )
        starts, ends, seg_len = W.segment_bounds(us)
        nseg = len(starts)
        spans = day[ends - 1] - day[starts] + 1
        total = int(spans.sum())
        seg_of_grid = np.repeat(np.arange(nseg, dtype=np.int64), spans)
        gstart = np.concatenate(([0], np.cumsum(spans)[:-1]))
        offs = np.arange(total, dtype=np.int64) - np.repeat(gstart, spans)
        grid_day = np.repeat(day[starts], spans) + offs
        stride = int(day.max()) + 1
        if nseg * stride >= 2**63:
            raise OverflowError(
                "events_seasonal_naive: composite day axis would overflow"
            )
        seg_id_ev = np.repeat(np.arange(nseg, dtype=np.int64), seg_len)
        ekey = seg_id_ev * stride + day
        gkey = seg_of_grid * stride + grid_day
        pos = np.searchsorted(ekey, gkey, side="right") - 1
        locf = vs[pos]
        # lag-7 within each user's grid block: compare index i vs i-7
        cmp = offs >= SEASON_LAG_DAYS
        err = np.zeros(total, dtype=np.int64)
        idx = np.flatnonzero(cmp)
        err[idx] = np.abs(locf[idx] - locf[idx - SEASON_LAG_DAYS])
        n_cmp = np.add.reduceat(
            cmp.astype(np.int64), gstart
        ) if total else np.zeros(0, np.int64)
        sae = np.add.reduceat(err, gstart) if total else np.zeros(0, np.int64)
        none = n_cmp == 0
        mae = np.where(
            none, 0.0,
            round6(sae.astype(np.float64)
                   / np.where(none, 1, n_cmp).astype(np.float64)),
        )
        return pa.table(
            {
                "user_id": pa.array(us[starts]),
                "n_cmp": pa.array(n_cmp),
                "sae_cents": pa.array(sae),
                "mae_cents": pa.array(mae, pa.float64(), mask=none),
            }
        )

    return map_partitions_by_key(ds, "user_id", fn, num_parts=NUM_PARTS)


EVENTS_SEASONAL_NAIVE_SQL = f"""
WITH ev AS (
    SELECT user_id, (epoch_us(ts) // {_US_PER_DAY})::BIGINT AS day,
           ts, event_id, CAST(round(value * 100) AS BIGINT) AS c
    FROM events
),
lastd AS (
    SELECT user_id, day, c FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC
        ) AS rn FROM ev
    ) WHERE rn = 1
),
b AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM ev GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS day FROM b),
locf AS (
    SELECT g.user_id, g.day, l.c
    FROM grid g ASOF JOIN lastd l
      ON g.user_id = l.user_id AND g.day >= l.day
),
lg AS (
    SELECT user_id, c,
           lag(c, {SEASON_LAG_DAYS}) OVER (
               PARTITION BY user_id ORDER BY day) AS c7
    FROM locf
)
SELECT user_id,
       count(c7)::BIGINT AS n_cmp,
       COALESCE(SUM(abs(c - c7)), 0)::BIGINT AS sae_cents,
       CASE WHEN count(c7) > 0
            THEN ROUND(SUM(abs(c - c7))::DOUBLE / count(c7)::DOUBLE, 6)
       END AS mae_cents
FROM lg GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "events_ratio_ci": (q_events_ratio_ci, _events_ratio_ci_sql()),
    "conv_reward_decay": (q_conv_reward_decay, CONV_REWARD_DECAY_SQL),
    "docs_pmi_bigrams": (q_docs_pmi_bigrams, DOCS_PMI_SQL),
    "events_seasonal_naive": (q_events_seasonal_naive,
                              EVENTS_SEASONAL_NAIVE_SQL),
}

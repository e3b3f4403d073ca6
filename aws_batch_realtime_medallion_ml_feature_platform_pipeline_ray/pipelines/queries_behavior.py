"""User-behavior feature operators over the events stream: cohort
retention (the classic activation/retention matrix behind engagement
features) and cyclical time-of-day / day-of-week encodings.

Reference parity: the reference derives per-entity temporal aggregates
and calendar features in its gold job before feature-store ingestion
(/root/reference/spark_jobs/silver_and_gold.py:86-131); these lift the
same intent to the events table.

Scale shapes:

- ``events_retention``: per-batch dedup collapses the stream to distinct
  (user, day) partials BEFORE the exchange, then ONE keyed shuffle on
  ``user_id`` co-locates each user's whole history; cohort (min day) and
  day offsets are segmented numpy per partition, and only O(cohorts x
  offsets) count partials leave each partition for a tiny final groupby.
  Users are disjoint across hash partitions, so partition-local distinct
  user counts sum exactly — no COUNT DISTINCT shuffle.
- ``events_time_cyclical``: zero shuffles — a pure streamed map. The
  trig values are a 24/7-entry lookup indexed by hour / weekday, so the
  hot loop is two numpy ``take`` calls; the DuckDB twin is GENERATED
  from the same numpy-rounded literals, making the doubles bit-exact by
  construction (same decimal literal -> same IEEE double on both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.keyed import map_partitions_by_key
from ..functions.numeric import div_trunc, round6, round_half_away

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

_US_PER_DAY = 86_400_000_000


def _events(sf_dir: str, columns):
    from ..sources.reads import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/events.parquet", columns=columns)


# --------------------------------------------------------------------------
# Cohort retention: users active on day (cohort + offset), by cohort
# --------------------------------------------------------------------------


def _day_strings(days: np.ndarray) -> pa.Array:
    return pa.array(
        np.datetime_as_string(days.astype("datetime64[D]"), unit="D")
    )


def q_events_retention(sf_dir: str):
    """Cohort retention matrix: for every signup cohort (a user's first
    active calendar day), how many of its users were active again
    ``day_offset`` days later. Emits (cohort_dt, day_offset, n_users)."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["user_id", "ts"])

    def day_pairs(t: pa.Table) -> pa.Table:
        # per-batch distinct (user, day): bounds shuffle volume by the
        # true activity surface, not the raw event count
        uid = np.asarray(t["user_id"].combine_chunks())
        day = (
            np.asarray(t["ts"].combine_chunks().cast(pa.int64())) // _US_PER_DAY
        )
        key = np.stack([uid, day])
        uniq = np.unique(key, axis=1)
        return pa.table(
            {
                "user_id": pa.array(uniq[0], pa.int64()),
                "day": pa.array(uniq[1], pa.int64()),
            }
        )

    pairs = ds.map_batches(
        day_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def retention_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_day": pa.array([], pa.int64()),
                "day_offset": pa.array([], pa.int64()),
                "p_n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        day = np.asarray(t["day"].combine_chunks())
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        # cross-batch dedup of (user, day)
        keep = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (day[1:] != day[:-1]))
        )
        uid, day = uid[keep], day[keep]
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        seg = np.cumsum(head) - 1
        cohort = day[head][seg]  # per-user min day (rows are day-sorted)
        off = day - cohort
        g = (
            pa.table(
                {
                    "cohort_day": pa.array(cohort, pa.int64()),
                    "day_offset": pa.array(off, pa.int64()),
                }
            )
            .group_by(["cohort_day", "day_offset"])
            .aggregate([("day_offset", "count")])
        )
        return g.rename_columns(["cohort_day", "day_offset", "p_n"])

    partials = map_partitions_by_key(
        pairs, "user_id", retention_part, num_parts=NUM_PARTS
    )
    final = (
        partials.groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("p_n", alias_name="n_users"))
        .take_all()
    )  # O(cohorts x offsets) — tiny by construction
    cd = np.array([r["cohort_day"] for r in final], dtype=np.int64)
    return pa.table(
        {
            "cohort_dt": _day_strings(cd),
            "day_offset": pa.array(
                [r["day_offset"] for r in final], pa.int64()
            ),
            "n_users": pa.array([r["n_users"] for r in final], pa.int64()),
        }
    )


EVENTS_RETENTION_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
c AS (SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id)
SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_dt,
       date_diff('day', c.cohort, ud.day)::BIGINT AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud JOIN c USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Cyclical calendar features: sin/cos of hour-of-day and day-of-week
# --------------------------------------------------------------------------

# lookup tables rounded to 6 decimals; the SQL twin is generated from
# THESE literals, so both engines hold the identical IEEE doubles
_HOUR_SIN = round6(np.sin(2 * np.pi * np.arange(24) / 24.0))
_HOUR_COS = round6(np.cos(2 * np.pi * np.arange(24) / 24.0))
_DOW_SIN = round6(np.sin(2 * np.pi * np.arange(7) / 7.0))
_DOW_COS = round6(np.cos(2 * np.pi * np.arange(7) / 7.0))


def q_events_time_cyclical(sf_dir: str):
    """Cyclical encoding of event timestamps: hour-of-day and
    day-of-week (Monday=0) plus their sin/cos projections, the standard
    trick that keeps 23:00 adjacent to 00:00 in feature space."""
    ds = _events(sf_dir, columns=["event_id", "ts"])

    def encode(t: pa.Table) -> pa.Table:
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        day = us // _US_PER_DAY
        hour = (us - day * _US_PER_DAY) // 3_600_000_000
        dow = (day + 3) % 7  # 1970-01-01 is a Thursday; Monday=0
        return pa.table(
            {
                "event_id": t["event_id"],
                "hour": pa.array(hour, pa.int64()),
                "dow": pa.array(dow, pa.int64()),
                "hour_sin": pa.array(_HOUR_SIN[hour], pa.float64()),
                "hour_cos": pa.array(_HOUR_COS[hour], pa.float64()),
                "dow_sin": pa.array(_DOW_SIN[dow], pa.float64()),
                "dow_cos": pa.array(_DOW_COS[dow], pa.float64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def _lut_case(expr: str, vals: np.ndarray) -> str:
    whens = " ".join(
        f"WHEN {i} THEN {v!r}" for i, v in enumerate(vals.tolist())
    )
    return f"CASE {expr} {whens} END"


EVENTS_TIME_CYCLICAL_SQL = f"""
WITH h AS (
    SELECT event_id,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(isodow(ts) - 1 AS BIGINT) AS dow
    FROM events
)
SELECT event_id, hour, dow,
       {_lut_case('hour', _HOUR_SIN)} AS hour_sin,
       {_lut_case('hour', _HOUR_COS)} AS hour_cos,
       {_lut_case('dow', _DOW_SIN)} AS dow_sin,
       {_lut_case('dow', _DOW_COS)} AS dow_cos
FROM h
"""


def q_events_scd2(sf_dir: str):
    """SCD-Type-2 history build: collapse each user's event stream to
    validity intervals of the *current* event_type — one row per change,
    with ``valid_from``/``valid_to`` (NULL while current). The history
    sibling of the online store's keep-latest upsert (reference
    feature_store/ingest_features.py keeps only the newest record per
    key; SCD2 is what a training pipeline needs to reconstruct any
    point-in-time state without leakage).

    Scale shape: ONE keyed exchange on ``user_id`` (the engine's shared
    hash partitioning), then a fused segmented pass per partition:
    lexsort, dictionary-encoded change detection, and a shifted-array
    lead for ``valid_to`` — no per-row Python, no window shuffle."""
    import pyarrow.compute as pc

    from ..stages.keyed import map_partitions_by_key

    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"])

    def scd2_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "valid_from": pa.array([], pa.timestamp("us")),
                "valid_to": pa.array([], pa.timestamp("us")),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        code = np.asarray(enc.indices).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, code = uid[order], ts[order], code[order]
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        change = head | np.concatenate(([True], code[1:] != code[:-1]))
        ku, kt, kc = uid[change], ts[change], code[change]
        # lead(ts) within user over the kept rows
        nxt = np.concatenate((kt[1:], [0]))
        same_user = np.concatenate((ku[1:] == ku[:-1], [False]))
        valid_to = pa.array(
            np.where(same_user, nxt, 0).view("datetime64[us]"),
            pa.timestamp("us"),
            mask=~same_user,
        )
        return pa.table(
            {
                "user_id": pa.array(ku, pa.int64()),
                "event_type": enc.dictionary.take(pa.array(kc)).cast(
                    pa.string()
                ),
                "valid_from": pa.array(
                    kt.view("datetime64[us]"), pa.timestamp("us")
                ),
                "valid_to": valid_to,
            }
        )

    return map_partitions_by_key(ds, "user_id", scd2_part, num_parts=32)


EVENTS_SCD2_SQL = """
WITH o AS (
    SELECT user_id, ts, event_id, event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev
    FROM events
),
c AS (
    SELECT user_id, ts, event_id, event_type FROM o
    WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM c
"""


def q_events_profile(sf_dir: str):
    """Data-quality profile of the events stream (the deequ/Great-
    Expectations-style observability pass every production lake runs):
    per column — row count, null count, min, max, and exact distinct
    count — emitted long-form as (column, metric, val).

    Scale shape: ONE pass over the data. Each batch collapses to
    O(columns) scalar partials (count/nulls/min/max — selection and
    addition, so exact) plus the batch's distinct values for the two
    key-like columns, all in one long-form partial table; the driver
    folds O(batches x (columns + batch-distincts)) tiny rows. The
    distinct channel is bounded by the true key cardinality per batch —
    for key spaces too large for that (user_id at 10^12-turn scale) the
    mergeable-sketch path is ``events_hll_users``."""
    from ..sources.reads import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def partial(t: pa.Table) -> pa.Table:
        cols: list[str] = []
        mets: list[str] = []
        vals: list[float] = []
        svals: list[str | None] = []

        def emit(c, m, v, sv=None):
            cols.append(c)
            mets.append(m)
            vals.append(v)
            svals.append(sv)

        n = float(t.num_rows)
        for col in ("event_id", "ts", "user_id", "event_type", "value"):
            a = t[col].combine_chunks()
            emit(col, "count", n)
            emit(col, "nulls", float(a.null_count))
            if col != "event_type" and a.null_count < len(a):
                v = a.cast(pa.int64()) if col == "ts" else a
                emit(col, "min", float(pc.min(v).as_py()))
                emit(col, "max", float(pc.max(v).as_py()))
        # distinct partials ride the same pass (no extra dataset scan)
        for col in ("event_type", "user_id"):
            a = t[col].combine_chunks()
            for u in pc.unique(pc.drop_null(a)).to_pylist():
                emit(col, "dp", 0.0, str(u))
        return pa.table(
            {
                "column": pa.array(cols, pa.string()),
                "metric": pa.array(mets, pa.string()),
                "val": pa.array(vals, pa.float64()),
                "sval": pa.array(svals, pa.string()),
            }
        )

    rows = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()

    acc: dict[tuple[str, str], float] = {}
    distinct: dict[str, set] = {"event_type": set(), "user_id": set()}
    for r in rows:
        m = r["metric"]
        if m == "dp":
            distinct[r["column"]].add(r["sval"])
            continue
        k = (r["column"], m)
        v = float(r["val"])
        if m in ("count", "nulls"):
            acc[k] = acc.get(k, 0.0) + v
        elif m == "min":
            acc[k] = min(acc.get(k, v), v)
        else:
            acc[k] = max(acc.get(k, v), v)
    for col, s_ in distinct.items():
        if s_:
            acc[(col, "distinct")] = float(len(s_))

    keys = sorted(acc)
    return pa.table(
        {
            "column": pa.array([k[0] for k in keys], pa.string()),
            "metric": pa.array([k[1] for k in keys], pa.string()),
            "val": pa.array([acc[k] for k in keys], pa.float64()),
        }
    )


EVENTS_PROFILE_SQL = """
WITH m AS (
    SELECT 'event_id' AS col, count(*)::DOUBLE AS cnt,
           (count(*) - count(event_id))::DOUBLE AS nulls,
           min(event_id)::DOUBLE AS mn, max(event_id)::DOUBLE AS mx,
           NULL::DOUBLE AS dst
    FROM events
    UNION ALL
    SELECT 'ts', count(*)::DOUBLE, (count(*) - count(ts))::DOUBLE,
           epoch_us(min(ts))::DOUBLE, epoch_us(max(ts))::DOUBLE, NULL
    FROM events
    UNION ALL
    SELECT 'user_id', count(*)::DOUBLE, (count(*) - count(user_id))::DOUBLE,
           min(user_id)::DOUBLE, max(user_id)::DOUBLE,
           count(DISTINCT user_id)::DOUBLE
    FROM events
    UNION ALL
    SELECT 'event_type', count(*)::DOUBLE,
           (count(*) - count(event_type))::DOUBLE,
           NULL, NULL, count(DISTINCT event_type)::DOUBLE
    FROM events
    UNION ALL
    SELECT 'value', count(*)::DOUBLE, (count(*) - count(value))::DOUBLE,
           min(value)::DOUBLE, max(value)::DOUBLE, NULL
    FROM events
)
SELECT col AS "column", u.metric, u.val
FROM m, LATERAL (VALUES
    ('count', cnt), ('nulls', nulls), ('min', mn), ('max', mx),
    ('distinct', dst)
) u(metric, val)
WHERE u.val IS NOT NULL
"""


EWMA_ALPHA = 0.1  # smoothing factor; weights (1-a)^k, adjust=True form


def q_events_ewma(sf_dir: str):
    """Per-user exponentially-weighted moving average of ``value`` over
    event order — the recursive time-series feature (s_t depends on
    s_{t-1}) that naive vectorization can't express. Both sides use the
    closed weighted-cumsum form: with r = 1-alpha and i the 0-based row
    number per user,

        ewma_t = cumsum(x_i r^-i) / cumsum(r^-i)   (common r^t cancels)

    which is two segmented cumulative sums — fully vectorized per hash
    partition after ONE user-keyed exchange. r^-i stays finite because
    per-user sequence lengths are bounded (~10^2 here; at longer
    horizons the same pass is applied per time-chunk with carried state,
    exactly like the incremental medallion stream). ROUND(,6) absorbs
    the cumsum-order ULP vs DuckDB's segment-tree window sums."""
    ds = _events(sf_dir, columns=["event_id", "ts", "user_id", "value"])

    def ewma_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "ewma": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        x = np.asarray(t["value"].combine_chunks())
        order = np.lexsort((eid, ts, uid))
        uid, eid, x = uid[order], eid[order], x[order]
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        idx = np.arange(len(uid), dtype=np.int64)
        seg0 = np.where(head, idx, 0)
        np.maximum.accumulate(seg0, out=seg0)
        i = idx - seg0  # 0-based row number within user
        w = np.power(1.0 / (1.0 - EWMA_ALPHA), i.astype(np.float64))
        num = np.cumsum(x * w)
        den = np.cumsum(w)
        # per-segment base via gather (x may be negative, so num is not
        # monotonic and a maximum-accumulate base would be wrong)
        seg_id = np.cumsum(head) - 1
        heads_idx = np.flatnonzero(head)
        base_n = (num - x * w)[heads_idx][seg_id]
        base_d = (den - w)[heads_idx][seg_id]
        ewma = (num - base_n) / (den - base_d)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "value": pa.array(x, pa.float64()),
                "ewma": pc.round(
                    pa.array(ewma, pa.float64()),
                    ndigits=6,
                    round_mode="half_towards_infinity",
                ),
            }
        )

    return map_partitions_by_key(ds, "user_id", ewma_part, num_parts=NUM_PARTS)


EVENTS_EWMA_SQL = f"""
WITH o AS (
    SELECT event_id, user_id, value,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) - 1 AS i
    FROM events
),
w AS (
    SELECT event_id, user_id, value,
           power(1.0 / (1.0 - {EWMA_ALPHA}), i) AS wt
    FROM o
)
SELECT event_id, user_id, value,
       ROUND(
           sum(value * wt) OVER win / sum(wt) OVER win, 6
       ) AS ewma
FROM w
WINDOW win AS (PARTITION BY user_id ORDER BY wt
               ROWS UNBOUNDED PRECEDING)
"""


# --------------------------------------------------------------------------
# Feature drift: Population Stability Index between two time windows
# --------------------------------------------------------------------------

# reference window = first half of January, current = the rest; the split
# is a fixed calendar boundary so both engines bucket identically
_PSI_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16T00:00:00 in epoch-us
_PSI_BUCKET_CENTS = 2_500  # 25.00-wide value buckets, in integer cents


def q_events_psi_drift(sf_dir: str):
    """Feature-drift monitor: Population Stability Index of the ``value``
    distribution between a reference window (before 2024-01-16) and the
    current window — the standard go/no-go check a feature platform runs
    before promoting a new feature snapshot (drift > 0.2 = retrain).

    Per bucket b: ``psi_term = (p_ref - p_cur) * ln(p_ref / p_cur)`` with
    Laplace-smoothed shares ``p = (n_b + 1) / (N + B)`` over the B buckets
    observed in either window, so empty-on-one-side buckets stay finite.
    Values are bucketed on integer cents (``rint(value*100) // 2500``) so
    bucket assignment is integer-exact on both engines; the shares and log
    are the same double expression both sides, rounded to 6 decimals.

    Scale shape: ONE streamed pass — each batch collapses to O(buckets)
    (bucket, side) count partials via Arrow group_by, a tiny final groupby
    sums them, and the PSI arithmetic runs on the O(B) driver-side result.
    No full-table shuffle, no driver materialization of event rows."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "p_ref": pa.array([], pa.int64()),
                "p_cur": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        mask = pc.is_valid(t["value"])
        t = t.filter(mask) if pc.any(pc.invert(mask)).as_py() else t
        if t.num_rows == 0:
            return empty
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        val = np.asarray(t["value"].combine_chunks())
        cents = round_half_away(val * 100.0).astype(np.int64)
        bucket = div_trunc(cents, _PSI_BUCKET_CENTS)
        is_ref = us < _PSI_SPLIT_US
        g = (
            pa.table(
                {
                    "bucket": pa.array(bucket, pa.int64()),
                    "r": pa.array(is_ref.astype(np.int64), pa.int64()),
                    "c": pa.array((~is_ref).astype(np.int64), pa.int64()),
                }
            )
            .group_by("bucket")
            .aggregate([("r", "sum"), ("c", "sum")])
        )
        return g.rename_columns(["bucket", "p_ref", "p_cur"])

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("p_ref", alias_name="n_ref"), Sum("p_cur", alias_name="n_cur"))
        .take_all()
    )  # O(buckets) rows — tiny by construction
    folded.sort(key=lambda r: r["bucket"])
    b = np.array([r["bucket"] for r in folded], dtype=np.int64)
    n_ref = np.array([r["n_ref"] for r in folded], dtype=np.int64)
    n_cur = np.array([r["n_cur"] for r in folded], dtype=np.int64)
    nb = len(b)
    p = (n_ref + 1).astype(np.float64) / float(n_ref.sum() + nb)
    q = (n_cur + 1).astype(np.float64) / float(n_cur.sum() + nb)
    psi = (p - q) * np.log(p / q)

    def r6(x: np.ndarray) -> pa.Array:
        return pc.round(
            pa.array(x, pa.float64()),
            ndigits=6,
            round_mode="half_towards_infinity",
        )

    return pa.table(
        {
            "bucket": pa.array(b, pa.int64()),
            "n_ref": pa.array(n_ref, pa.int64()),
            "n_cur": pa.array(n_cur, pa.int64()),
            "p_ref": r6(p),
            "p_cur": r6(q),
            "psi_term": r6(psi),
        }
    )


EVENTS_PSI_DRIFT_SQL = f"""
WITH b AS (
    SELECT CAST(round(value * 100.0) AS BIGINT) // {_PSI_BUCKET_CENTS}
               AS bucket,
           (epoch_us(ts) < {_PSI_SPLIT_US}) AS is_ref
    FROM events WHERE value IS NOT NULL
),
c AS (
    SELECT bucket,
           sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS n_ref,
           sum(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT AS n_cur
    FROM b GROUP BY bucket
),
tot AS (
    SELECT sum(n_ref)::BIGINT AS t_ref, sum(n_cur)::BIGINT AS t_cur,
           count(*)::BIGINT AS nb
    FROM c
)
SELECT bucket, n_ref, n_cur,
       ROUND((n_ref + 1)::DOUBLE / (t_ref + nb), 6) AS p_ref,
       ROUND((n_cur + 1)::DOUBLE / (t_cur + nb), 6) AS p_cur,
       ROUND(
           ((n_ref + 1)::DOUBLE / (t_ref + nb)
            - (n_cur + 1)::DOUBLE / (t_cur + nb))
           * ln(((n_ref + 1)::DOUBLE / (t_ref + nb))
                / ((n_cur + 1)::DOUBLE / (t_cur + nb))), 6
       ) AS psi_term
FROM c, tot
"""


# --------------------------------------------------------------------------
# Grouped mode (most frequent value per entity, deterministic ties)
# --------------------------------------------------------------------------


def q_events_mode_by_user(sf_dir: str):
    """Modal ``event_type`` per user (the most frequent category, ties
    broken by lexicographic type order) — the categorical "favorite
    action" feature the aggregate family (sum/mean/median) can't
    express: an argmax over per-group counts.

    Plan: per-batch (user, type, count) partials collapse the stream
    before it moves; ONE keyed exchange on ``user_id`` co-locates each
    user's partial rows; per partition a single lexsort folds the
    partials and picks each user's (max count, min type) row off segment
    boundaries. The exchange moves O(distinct (user, type)) rows, never
    events."""
    ds = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.group_by(["user_id", "event_type"])
            .aggregate([("event_type", "count")])
        )
        return g.rename_columns(["user_id", "event_type", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def pick(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "mode_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        import pandas as pd

        uid = np.asarray(part["user_id"].combine_chunks().cast(pa.int64()))
        typ = np.asarray(
            part["event_type"].combine_chunks().cast(pa.large_string())
        )
        c = np.asarray(part["c"].combine_chunks().cast(pa.int64()))
        # fold the cross-batch partials: exact counts per (user, type)
        inv, uniq = pd.factorize(
            pd.MultiIndex.from_arrays([uid, typ]), sort=False
        )
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, c)
        u2 = uniq.get_level_values(0).to_numpy().astype(np.int64)
        t2 = uniq.get_level_values(1).to_numpy()
        from ..functions.windows import segment_bounds

        order = np.lexsort((t2, -tot, u2))
        us, ts_, cs = u2[order], t2[order], tot[order]
        first, _ends, _lens = segment_bounds(us)
        return pa.table(
            {
                "user_id": pa.array(us[first], pa.int64()),
                "mode_type": pa.array(ts_[first], pa.string()),
                "n": pa.array(cs[first], pa.int64()),
            }
        )

    return map_partitions_by_key(partials, "user_id", pick, num_parts=NUM_PARTS)


EVENTS_MODE_SQL = """
WITH c AS (
    SELECT user_id, event_type, count(*)::BIGINT AS n
    FROM events GROUP BY 1, 2
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type
    ) AS rk FROM c
)
SELECT user_id, event_type AS mode_type, n FROM r WHERE rk = 1
"""


REGISTRY: dict[str, tuple] = {
    "events_mode_by_user": (q_events_mode_by_user, EVENTS_MODE_SQL),
    "events_retention": (q_events_retention, EVENTS_RETENTION_SQL),
    "events_ewma": (q_events_ewma, EVENTS_EWMA_SQL),
    "events_profile": (q_events_profile, EVENTS_PROFILE_SQL),
    "events_time_cyclical": (q_events_time_cyclical, EVENTS_TIME_CYCLICAL_SQL),
    "events_scd2": (q_events_scd2, EVENTS_SCD2_SQL),
    "events_psi_drift": (q_events_psi_drift, EVENTS_PSI_DRIFT_SQL),
}

"""Round-2k operators: growth analytics, abuse detection, engine
self-audit, and embedding hygiene.

- ``events_cohort_ltv``: the cohort LTV triangle — users bucketed by
  first-activity week, value summed per (cohort_week, age_weeks). Two
  keyed exchanges: per-user first day (exact fold), then the fact
  stream re-keyed by user picks up its cohort and collapses to
  O(weeks²) partials.
- ``lineitem_ship_delay_hist``: histogram of order→ship latency in
  day buckets — ONE co-partitioning exchange (lineitem ⋈ orders) and
  O(buckets) partials out; the fulfillment-SLA profile.
- ``embedding_knn_degree_hist``: degree histogram of the MUTUAL kNN
  graph (edge iff each endpoint is in the other's top-K) — the
  connectivity health check for graph-based SSL/dedup on top of
  ``knn_self``'s block-pair plan. Mutuality = pair appearing in both
  directions, found by ONE pair-keyed exchange.
- ``events_bot_flags``: users whose peak events-per-minute reaches
  ``BOT_RPM`` — the rate-based abuse heuristic. Distinct (user,
  minute) counts collapse per batch, fold by user, flag at the end.
- ``features_poly2``: degree-2 polynomial expansion of (value, hour):
  exact integer cents/hour products per row, zero shuffles — the
  interaction-features transform beside one-hot/hashed/bucketized.
- ``engine_partition_balance``: χ² uniformity audit of the engine's
  OWN hash partitioner (splitmix64 % P over event ids) — the skew
  self-check that justifies every ``__part`` exchange; twin generated
  in HUGEINT SQL from the same constants.
- ``events_weekend_lift``: per event type, weekend vs weekday daily
  rate and lift — the calendar-interaction feature (dow grid counted
  exactly on both engines over [min_day, max_day]).
- ``embedding_norm_topk``: top-``NORM_TOPK`` vectors by quantized
  squared norm — the embedding-hygiene outlier audit (norms are exact
  int64 sums of 1e-6-quantized components, so the ranking has no float
  hazard).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import div_trunc, round6, round_half_away
from ..sources.reads import read_parquet_sized
from ..stages.keyed import cogroup_by_key, fold_by_keys, map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

BOT_RPM = 2  # peak events-per-minute that flags a user
PB_PARTS = 64  # partition-balance audit bucket count
NORM_TOPK = 10
DELAY_BUCKET_DAYS = 7


# ---------------------------------------------------------------------------
# events_cohort_ltv — cohort-week x age-week value triangle
# ---------------------------------------------------------------------------


def q_events_cohort_ltv(sf_dir: str):
    """Per (cohort_week, age_weeks): active users and summed value in
    integer cents. cohort_week = first-activity day // 7; age = event
    week − cohort week. Exchange 1 folds per-user first days; exchange
    2 co-partitions the event stream with them and emits O(weeks²)
    partials per partition."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def first_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("user_id", "d0")}
            )
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        d = us // 86_400_000_000
        order = np.argsort(uid, kind="stable")
        u, dd = uid[order], d[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "d0": pa.array(np.minimum.reduceat(dd, starts)),
            }
        )

    firsts = fold_by_keys(
        ds.map_batches(first_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"],
        mins=("d0",),
        num_parts=NUM_PARTS,
    )

    def ev_rows(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        val = t["value"].combine_chunks()
        vc = np.zeros(t.num_rows, dtype=np.int64)
        mask = np.asarray(pc.is_valid(val))
        if mask.any():
            vc[mask] = round_half_away(
                np.asarray(val)[mask].astype(np.float64) * 100.0
            ).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "d": pa.array(us // 86_400_000_000),
                "vc": pa.array(vc),
            }
        )

    evs = ds.map_batches(ev_rows, batch_format="pyarrow",
                         zero_copy_batch=True)

    tri_schema = {
        "cohort_week": pa.int64(),
        "age_weeks": pa.int64(),
        "p_users": pa.int64(),
        "p_value": pa.int64(),
    }

    def triangle(epart: pa.Table, fpart: pa.Table) -> pa.Table:
        empty = pa.table(
            {n: pa.array([], t) for n, t in tri_schema.items()}
        )
        if epart.num_rows == 0 or fpart.num_rows == 0:
            return empty
        idx = pc.index_in(
            epart["user_id"], value_set=fpart["user_id"].combine_chunks()
        ).combine_chunks()
        d0 = np.asarray(fpart["d0"].combine_chunks())[np.asarray(idx)]
        uid = np.asarray(epart["user_id"].combine_chunks())
        d = np.asarray(epart["d"].combine_chunks())
        vc = np.asarray(epart["vc"].combine_chunks())
        cw = d0 // 7
        age = d // 7 - cw
        # distinct users per cell need user identity: reduce by
        # (cohort, age, user) first, then collapse users per cell
        order = np.lexsort((uid, age, cw))
        cwo, ago, uo, vo = cw[order], age[order], uid[order], vc[order]
        head = np.concatenate(
            ([True],
             (cwo[1:] != cwo[:-1]) | (ago[1:] != ago[:-1])
             | (uo[1:] != uo[:-1]))
        )
        starts = np.flatnonzero(head)
        cw_u, ag_u = cwo[starts], ago[starts]
        v_u = np.add.reduceat(vo, starts)
        head2 = np.concatenate(
            ([True], (cw_u[1:] != cw_u[:-1]) | (ag_u[1:] != ag_u[:-1]))
        )
        starts2 = np.flatnonzero(head2)
        n_users = np.diff(np.append(starts2, len(cw_u)))
        return pa.table(
            {
                "cohort_week": pa.array(cw_u[starts2]),
                "age_weeks": pa.array(ag_u[starts2]),
                "p_users": pa.array(n_users.astype(np.int64)),
                "p_value": pa.array(np.add.reduceat(v_u, starts2)),
            }
        )

    partials = cogroup_by_key(evs, firsts, "user_id", triangle,
                              num_parts=NUM_PARTS)
    out = partials.groupby(["cohort_week", "age_weeks"]).aggregate(
        Sum("p_users", alias_name="n_users"),
        Sum("p_value", alias_name="value_c100"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "cohort_week": t["cohort_week"].cast(pa.int64()),
                "age_weeks": t["age_weeks"].cast(pa.int64()),
                "n_users": t["n_users"].cast(pa.int64()),
                "value_c100": t["value_c100"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_COHORT_LTV_SQL = """
WITH e AS (
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,
           CASE WHEN value IS NULL THEN 0
                ELSE CAST(ROUND(value * 100, 0) AS BIGINT) END AS vc
    FROM events
),
f AS (SELECT user_id, min(d) // 7 AS cw FROM e GROUP BY 1)
SELECT f.cw AS cohort_week,
       e.d // 7 - f.cw AS age_weeks,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(sum(e.vc) AS BIGINT) AS value_c100
FROM e JOIN f USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# lineitem_ship_delay_hist — fulfillment latency histogram
# ---------------------------------------------------------------------------


def q_lineitem_ship_delay_hist(sf_dir: str):
    """Histogram of (l_shipdate − o_orderdate) in {DELAY_BUCKET_DAYS}-day
    buckets: ONE cogroup on orderkey, per-partition bucket-count
    partials, tiny final groupby."""
    from ray.data.aggregate import Sum

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["l_orderkey"].cast(pa.int64()),
                "ship_us": pa.array(
                    np.asarray(t["l_shipdate"].combine_chunks())
                    .astype("datetime64[us]").astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["o_orderkey"].cast(pa.int64()),
                "odate_us": pa.array(
                    np.asarray(t["o_orderdate"].combine_chunks())
                    .astype("datetime64[us]").astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    day_us = 86_400_000_000

    def bucketize(lpart: pa.Table, opart: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bucket": pa.array([], pa.int64()),
             "pn": pa.array([], pa.int64())}
        )
        if lpart.num_rows == 0 or opart.num_rows == 0:
            return empty
        idx = pc.index_in(
            lpart["orderkey"], value_set=opart["orderkey"].combine_chunks()
        ).combine_chunks()
        keep = pc.is_valid(idx)
        if not pc.any(keep).as_py():
            return empty
        od = np.asarray(opart["odate_us"].combine_chunks())[
            np.asarray(idx.filter(keep))
        ]
        sh = np.asarray(lpart["ship_us"].combine_chunks())[np.asarray(keep)]
        # negative delays possible in dirty data: DuckDB // truncates,
        # numpy // floors — mirror trunc-twice exactly
        delay_days = div_trunc(sh - od, day_us)
        bucket = div_trunc(delay_days, DELAY_BUCKET_DAYS)
        bb, cnt = np.unique(bucket, return_counts=True)
        return pa.table(
            {"bucket": pa.array(bb), "pn": pa.array(cnt.astype(np.int64))}
        )

    partials = cogroup_by_key(li, orders, "orderkey", bucketize,
                              num_parts=NUM_PARTS)
    out = partials.groupby("bucket").aggregate(Sum("pn", alias_name="n"))
    return out.map_batches(
        lambda t: pa.table(
            {
                "bucket": t["bucket"].cast(pa.int64()),
                "n": t["n"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


LINEITEM_SHIP_DELAY_SQL = f"""
SELECT (CAST(epoch_us(l.l_shipdate) AS BIGINT)
        - CAST(epoch_us(o.o_orderdate) AS BIGINT))
       // 86400000000 // {DELAY_BUCKET_DAYS} AS bucket,
       count(*)::BIGINT AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# embedding_knn_degree_hist — mutual-kNN graph connectivity
# ---------------------------------------------------------------------------


def q_embedding_knn_degree_hist(sf_dir: str):
    """Degree histogram of the mutual-kNN graph: a pair (a, b) is an
    edge iff a ∈ knn(b) AND b ∈ knn(a). Directed kNN rows pack into an
    unordered pair key; ONE pair-keyed exchange counts directions
    (2 = mutual); a node-keyed fold sums degrees; the histogram is a
    tiny groupby. Degree 0 nodes are reported too (the isolation
    signal)."""
    from ray.data.aggregate import Sum

    from ..stages.ann import knn_self_join
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

    def mutual(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"node": pa.array([], pa.int64()),
             "p_deg": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        pk = np.sort(np.asarray(part["pair"].combine_chunks()))
        starts = np.flatnonzero(
            np.concatenate(([True], pk[1:] != pk[:-1]))
        )
        cnt = np.diff(np.append(starts, len(pk)))
        both = pk[starts][cnt == 2]  # directed twice => mutual edge
        if len(both) == 0:
            return empty
        lo = both >> np.int64(32)
        hi = both & np.int64(0xFFFFFFFF)
        nodes = np.concatenate([lo, hi])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(u), "p_deg": pa.array(c.astype(np.int64))}
        )

    degs = fold_by_keys(
        map_partitions_by_key(pairs, "pair", mutual, num_parts=NUM_PARTS),
        ["node"],
        sums=("p_deg",),
        num_parts=NUM_PARTS,
    )

    # total vector count from footer metadata (degree-0 nodes)
    import pyarrow.parquet as pq

    n_vecs = pq.ParquetFile(
        f"{sf_dir}/embeddings.parquet"
    ).metadata.num_rows

    def hist_partial(t: pa.Table) -> pa.Table:
        d = np.asarray(t["p_deg"].combine_chunks())
        u, c = np.unique(d, return_counts=True)
        return pa.table(
            {"degree": pa.array(u.astype(np.int64)),
             "pn": pa.array(c.astype(np.int64))}
        )

    hist = degs.map_batches(
        hist_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("degree").aggregate(Sum("pn", alias_name="n"))

    def add_zero(t: pa.Table) -> pa.Table:
        deg = np.asarray(t["degree"].combine_chunks()).astype(np.int64)
        n = np.asarray(t["n"].combine_chunks()).astype(np.int64)
        n_iso = n_vecs - int(n.sum())
        if n_iso > 0:
            deg = np.concatenate([[0], deg])
            n = np.concatenate([[n_iso], n])
        return pa.table({"degree": pa.array(deg), "n": pa.array(n)})

    return hist.repartition(1).map_batches(add_zero, batch_format="pyarrow")


def _knn_degree_sql() -> str:
    from .queries_ann import K

    return f"""
WITH sims AS (
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
    SELECT a.q_id AS u, a.vec_id AS v
    FROM knn a JOIN knn b ON a.q_id = b.vec_id AND a.vec_id = b.q_id
    WHERE a.q_id < a.vec_id
),
deg AS (
    SELECT node, count(*)::BIGINT AS d FROM (
        SELECT u AS node FROM mut UNION ALL SELECT v FROM mut
    ) GROUP BY 1
),
alln AS (
    SELECT e.vec_id, coalesce(deg.d, 0) AS d
    FROM embeddings e LEFT JOIN deg ON e.vec_id = deg.node
)
SELECT d AS degree, count(*)::BIGINT AS n FROM alln GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_bot_flags — peak events-per-minute abuse heuristic
# ---------------------------------------------------------------------------


def q_events_bot_flags(sf_dir: str):
    """Users whose peak events-per-minute reaches {BOT_RPM}: per-batch
    (user, minute) partial counts, ONE user-keyed exchange where minute
    cells complete and the per-user peak/total collapse, flag filter at
    the end. The rate-limit / abuse-detection heuristic every event
    platform ships."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("user_id", "minute", "pn")}
            )
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        minute = us // 60_000_000
        order = np.lexsort((minute, uid))
        u, m = uid[order], minute[order]
        head = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (m[1:] != m[:-1]))
        )
        starts = np.flatnonzero(head)
        cnt = np.diff(np.append(starts, len(u)))
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "minute": pa.array(m[starts]),
                "pn": pa.array(cnt.astype(np.int64)),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)

    def per_user(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "peak_per_min": pa.array([], pa.int64()),
                "n_hot_minutes": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        u = np.asarray(part["user_id"].combine_chunks())
        m = np.asarray(part["minute"].combine_chunks())
        n = np.asarray(part["pn"].combine_chunks())
        order = np.lexsort((m, u))
        u, m, n = u[order], m[order], n[order]
        head = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (m[1:] != m[:-1]))
        )
        starts = np.flatnonzero(head)
        uu = u[starts]
        nn = np.add.reduceat(n, starts)  # complete per-(user,minute) count
        h2 = np.concatenate(([True], uu[1:] != uu[:-1]))
        s2 = np.flatnonzero(h2)
        peak = np.maximum.reduceat(nn, s2)
        hot = np.add.reduceat((nn >= BOT_RPM).astype(np.int64), s2)
        users = uu[s2]
        keep = peak >= BOT_RPM
        return pa.table(
            {
                "user_id": pa.array(users[keep]),
                "peak_per_min": pa.array(peak[keep]),
                "n_hot_minutes": pa.array(hot[keep]),
            }
        )

    return map_partitions_by_key(rows, "user_id", per_user,
                                 num_parts=NUM_PARTS)


EVENTS_BOT_FLAGS_SQL = f"""
WITH pm AS (
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) // 60000000 AS minute,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1, 2
),
u AS (
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS peak_per_min,
           CAST(count(*) FILTER (n >= {BOT_RPM}) AS BIGINT) AS n_hot_minutes
    FROM pm GROUP BY 1
)
SELECT user_id, peak_per_min, n_hot_minutes
FROM u WHERE peak_per_min >= {BOT_RPM}
"""


# ---------------------------------------------------------------------------
# features_poly2 — degree-2 polynomial interaction features
# ---------------------------------------------------------------------------


def q_features_poly2(sf_dir: str):
    """Degree-2 expansion of (value cents, hour-of-day): x, h, x², x·h,
    h² — all exact int64 per row, zero shuffles (row count = input; the
    interaction-features transform). NULL values keep NULL products
    (SQL semantics)."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "value"]
    )

    def expand(t: pa.Table) -> pa.Table:
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        h = (us // 3_600_000_000) % 24
        val = t["value"].combine_chunks()
        mask = np.asarray(pc.is_null(val))
        x = np.zeros(t.num_rows, dtype=np.int64)
        valid = ~mask
        if valid.any():
            x[valid] = round_half_away(
                np.asarray(val)[valid].astype(np.float64) * 100.0
            ).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "x_c": pa.array(x, pa.int64(), mask=mask),
                "hod": pa.array(h, pa.int64()),
                "x2": pa.array(x * x, pa.int64(), mask=mask),
                "xh": pa.array(x * h, pa.int64(), mask=mask),
                "h2": pa.array(h * h, pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow",
                          zero_copy_batch=True)


FEATURES_POLY2_SQL = """
WITH e AS (
    SELECT event_id,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS x_c,
           (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS hod
    FROM events
)
SELECT event_id, x_c, hod,
       x_c * x_c AS x2, x_c * hod AS xh, hod * hod AS h2
FROM e
"""


# ---------------------------------------------------------------------------
# engine_partition_balance — hash-partitioner uniformity self-audit
# ---------------------------------------------------------------------------


def q_engine_partition_balance(sf_dir: str):
    """χ² uniformity audit of the engine's own keyed-exchange
    partitioner: bucket = splitmix64(event_id) % {PB_PARTS}, per-bucket
    counts and χ² terms vs the uniform expectation — the skew self-check
    behind every ``__part`` shuffle, with the hash mirrored in HUGEINT
    SQL from the same constants."""
    from ray.data.aggregate import Sum

    from ..stages.keyed import splitmix64

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id"]
    )

    def partial(t: pa.Table) -> pa.Table:
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        b = (splitmix64(eid.astype(np.uint64))
             % np.uint64(PB_PARTS)).astype(np.int64)
        u, c = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(u), "pn": pa.array(c.astype(np.int64))}
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("pn", alias_name="n"))
    )

    def finale(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t["bucket"])
        b = np.asarray(t["bucket"].combine_chunks().take(order))
        n = np.asarray(t["n"].combine_chunks().take(order),
                       dtype=np.int64)
        total = float(n.sum())
        expn = total / float(PB_PARTS)
        chi2 = round6((n - expn) * (n - expn) / expn)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "n": pa.array(n),
                "chi2_term": pa.array(chi2, pa.float64()),
            }
        )

    return folded.repartition(1).map_batches(finale, batch_format="pyarrow")


def _partition_balance_sql() -> str:
    from .queries_relational import splitmix64_hash_sql

    return f"""
WITH src AS (SELECT event_id FROM events),
{splitmix64_hash_sql('event_id', 'src', 0, '__pb')},
g AS (
    SELECT CAST(__pbh % {PB_PARTS} AS BIGINT) AS bucket,
           count(*)::BIGINT AS n
    FROM __pb5 GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS DOUBLE) / {PB_PARTS} AS expn FROM g)
SELECT bucket, n,
       ROUND((n - t.expn) * (n - t.expn) / t.expn, 6) AS chi2_term
FROM g CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# events_weekend_lift — calendar-interaction rate feature
# ---------------------------------------------------------------------------


def q_events_weekend_lift(sf_dir: str):
    """Per event type: weekend vs weekday daily event rate and their
    ratio. Day-of-week from the epoch-day grid ((d + 4) % 7, Sunday=0);
    the weekend/weekday day counts come from the exact [min_day,
    max_day] calendar span on both engines."""
    from ray.data.aggregate import Max, Min, Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "p_we": pa.array([], pa.int64()),
                    "p_wd": pa.array([], pa.int64()),
                    "dmin": pa.array([], pa.int64()),
                    "dmax": pa.array([], pa.int64()),
                }
            )
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        d = us // 86_400_000_000
        dow = (d + 4) % 7
        wkd = (dow == 0) | (dow == 6)
        et = np.asarray(
            t["event_type"].combine_chunks().cast(pa.large_string())
        )
        inv, uniq = pd.factorize(et)
        nw = np.zeros(len(uniq), np.int64)
        nd = np.zeros(len(uniq), np.int64)
        np.add.at(nw, inv, wkd.astype(np.int64))
        np.add.at(nd, inv, (~wkd).astype(np.int64))
        return pa.table(
            {
                "event_type": pa.array(uniq).cast(pa.string()),
                "p_we": pa.array(nw),
                "p_wd": pa.array(nd),
                "dmin": pa.array(np.full(len(uniq), int(d.min()))),
                "dmax": pa.array(np.full(len(uniq), int(d.max()))),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("p_we", alias_name="n_weekend"),
            Sum("p_wd", alias_name="n_weekday"),
            Min("dmin", alias_name="d0"),
            Max("dmax", alias_name="d1"),
        )
    )

    def finale(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        nw = np.asarray(t["n_weekend"].combine_chunks(), dtype=np.int64)
        nd = np.asarray(t["n_weekday"].combine_chunks(), dtype=np.int64)
        d0 = int(np.asarray(t["d0"].combine_chunks()).min())
        d1 = int(np.asarray(t["d1"].combine_chunks()).max())
        days = np.arange(d0, d1 + 1, dtype=np.int64)
        dow = (days + 4) % 7
        t_we = int(((dow == 0) | (dow == 6)).sum())
        t_wd = int(len(days) - t_we)
        we_rate = nw / float(t_we)
        wd_rate = nd / float(t_wd)
        lift = np.where(
            (nd > 0), round6(we_rate / wd_rate), np.nan
        )
        return pa.table(
            {
                "event_type": et,
                "n_weekend": pa.array(nw),
                "n_weekday": pa.array(nd),
                "weekend_days": pa.array(
                    np.full(len(nw), t_we, dtype=np.int64)
                ),
                "weekday_days": pa.array(
                    np.full(len(nw), t_wd, dtype=np.int64)
                ),
                "we_rate": pa.array(round6(we_rate), pa.float64()),
                "wd_rate": pa.array(round6(wd_rate), pa.float64()),
                "lift": pa.array(
                    [None if not np.isfinite(x) else float(x) for x in lift],
                    pa.float64(),
                ),
            }
        )

    return folded.repartition(1).map_batches(finale, batch_format="pyarrow")


EVENTS_WEEKEND_LIFT_SQL = """
WITH e AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d
    FROM events
),
b AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
grid AS (
    SELECT CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS d FROM b
),
span AS (
    SELECT CAST(count(*) FILTER ((d + 4) % 7 IN (0, 6)) AS BIGINT) AS t_we,
           CAST(count(*) FILTER ((d + 4) % 7 NOT IN (0, 6)) AS BIGINT)
               AS t_wd
    FROM grid
),
c AS (
    SELECT event_type,
           CAST(count(*) FILTER ((d + 4) % 7 IN (0, 6)) AS BIGINT)
               AS n_weekend,
           CAST(count(*) FILTER ((d + 4) % 7 NOT IN (0, 6)) AS BIGINT)
               AS n_weekday
    FROM e GROUP BY 1
)
SELECT event_type, n_weekend, n_weekday,
       span.t_we AS weekend_days, span.t_wd AS weekday_days,
       ROUND(n_weekend / CAST(span.t_we AS DOUBLE), 6) AS we_rate,
       ROUND(n_weekday / CAST(span.t_wd AS DOUBLE), 6) AS wd_rate,
       CASE WHEN n_weekday > 0
            THEN ROUND((n_weekend / CAST(span.t_we AS DOUBLE))
                       / (n_weekday / CAST(span.t_wd AS DOUBLE)), 6)
            ELSE NULL END AS lift
FROM c CROSS JOIN span
"""


# ---------------------------------------------------------------------------
# embedding_norm_topk — quantized-norm outlier audit
# ---------------------------------------------------------------------------


def q_embedding_norm_topk(sf_dir: str):
    """Top-{NORM_TOPK} vectors by squared norm of the 1e-6-quantized
    components — exact int64 per vector (no float summation hazard), a
    distributed sort/limit finale. The embedding-hygiene audit that
    surfaces broken normalization before similarity search trusts the
    vectors."""
    ds = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def norms(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        offs = np.asarray(emb.offsets)
        if t.num_rows == 0 or len(offs) < 2:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "norm2_q": pa.array([], pa.int64())}
            )
        q = round_half_away(
            np.asarray(emb.values, dtype=np.float64) * 1e6
        ).astype(np.int64)
        starts = offs[:-1].astype(np.int64)
        n2 = np.add.reduceat(q * q, starts)
        return pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "norm2_q": pa.array(n2, pa.int64()),
            }
        )

    return (
        ds.map_batches(norms, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["norm2_q", "vec_id"], descending=[True, False])
        .limit(NORM_TOPK)
    )


EMBEDDING_NORM_TOPK_SQL = f"""
WITH n AS (
    SELECT vec_id,
           CAST(sum(CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT)
                    * CAST(ROUND(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT))
                AS BIGINT) AS norm2_q
    FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
    GROUP BY 1
)
SELECT vec_id, norm2_q FROM n
ORDER BY norm2_q DESC, vec_id ASC LIMIT {NORM_TOPK}
"""


REGISTRY = {
    "events_cohort_ltv": (q_events_cohort_ltv, EVENTS_COHORT_LTV_SQL),
    "lineitem_ship_delay_hist": (
        q_lineitem_ship_delay_hist,
        LINEITEM_SHIP_DELAY_SQL,
    ),
    "embedding_knn_degree_hist": (
        q_embedding_knn_degree_hist,
        _knn_degree_sql(),
    ),
    "events_bot_flags": (q_events_bot_flags, EVENTS_BOT_FLAGS_SQL),
    "features_poly2": (q_features_poly2, FEATURES_POLY2_SQL),
    "engine_partition_balance": (
        q_engine_partition_balance,
        _partition_balance_sql(),
    ),
    "events_weekend_lift": (q_events_weekend_lift, EVENTS_WEEKEND_LIFT_SQL),
    "embedding_norm_topk": (q_embedding_norm_topk, EMBEDDING_NORM_TOPK_SQL),
}

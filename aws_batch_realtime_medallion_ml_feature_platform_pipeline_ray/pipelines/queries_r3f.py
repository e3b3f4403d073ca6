"""Round-3 batch F: robust trend statistics over the daily series —
Theil–Sen slope (median of pairwise slopes), the Mann–Kendall trend
test (integer-exact S and tau), and a first-harmonic diurnal fit.

All three fold the stream to a calendar-bounded series distributed
(per-batch integer-cent partials → tiny groupby), then finish on
O(days) / O(days²-pairs) / O(24) rows — the bounded-finale shape
(events_xcorr_lagged precedent). Float policy: integer arithmetic
everywhere except the documented final expressions, which use the
identical IEEE tree on both engines + ROUND6."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


def _daily_cents(sf_dir: str):
    """Distributed daily revenue-cents fold (shared by this module)."""
    from ray.data.aggregate import Sum

    from ..functions.numeric import round_half_away

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "p_cents": pa.array([], pa.int64()),
                }
            )
        day = (
            np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
            // 86_400_000_000
        )
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks()) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {"day": pa.array(u, pa.int64()), "p_cents": pa.array(s)}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("p_cents", alias_name="cents"))
        .to_pandas()  # O(days): calendar-bounded
        .sort_values("day", ignore_index=True)
    )


# ---------------------------------------------------------------------------
# events_theil_sen — robust (median-of-slopes) trend estimate
# ---------------------------------------------------------------------------


def q_events_theil_sen(sf_dir: str):
    """Theil–Sen slope of the daily revenue series: the MEDIAN of all
    pairwise slopes ``(x_j − x_i) / (d_j − d_i)`` — breakdown point
    ~29 %, so a few outlier days cannot drag the trend the way they
    drag the OLS fit (events_ols_trend). Also emits the Theil–Sen
    intercept (median of ``x_i − slope·d_i``, slope fixed first) and
    the pair count.

    The pair set is O(days²) over a CALENDAR-bounded axis (~30 days →
    ~435 pairs), so the median runs on the driver; the data-scaled work
    is the distributed daily fold."""
    from ..functions.numeric import round6

    daily = _daily_cents(sf_dir)
    n = len(daily)
    if n < 2:
        return pa.table(
            {
                "n_days": pa.array([n], pa.int64()),
                "n_pairs": pa.array([0], pa.int64()),
                "slope": pa.array([None], pa.float64()),
                "intercept": pa.array([None], pa.float64()),
            }
        )
    d = daily["day"].to_numpy(np.int64)
    x = daily["cents"].to_numpy(np.int64).astype(np.float64) / 100.0
    ii, jj = np.triu_indices(n, k=1)
    slopes = (x[jj] - x[ii]) / (d[jj] - d[ii]).astype(np.float64)
    slope = float(np.median(slopes))
    resid = x - slope * d.astype(np.float64)
    intercept = float(np.median(resid))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "n_pairs": pa.array([len(slopes)], pa.int64()),
            "slope": pa.array([float(round6(np.array([slope]))[0])]),
            "intercept": pa.array(
                [float(round6(np.array([intercept]))[0])]
            ),
        }
    )


EVENTS_THEIL_SEN_SQL = """
WITH d AS (
    SELECT epoch_us(ts) // 86400000000 AS day,
           CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS x
    FROM events GROUP BY 1
),
p AS (
    SELECT (b.x - a.x) / (b.day - a.day) AS s
    FROM d a JOIN d b ON b.day > a.day
),
sl AS (SELECT median(s) AS slope FROM p),
r AS (SELECT x - (SELECT slope FROM sl) * day AS resid FROM d)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_pairs,
       ROUND((SELECT slope FROM sl), 6) AS slope,
       ROUND(median(resid), 6) AS intercept
FROM r
"""


# ---------------------------------------------------------------------------
# events_mann_kendall — integer-exact monotone-trend test
# ---------------------------------------------------------------------------


def q_events_mann_kendall(sf_dir: str):
    """Mann–Kendall S statistic and Kendall tau of the daily revenue
    series: ``S = Σ_{i<j} sign(x_j − x_i)`` (pure integers — bit-exact)
    and ``tau = S / (n(n−1)/2)`` — the nonparametric monotone-trend
    test that pairs with the Theil–Sen slope."""
    from ..functions.numeric import round6

    daily = _daily_cents(sf_dir)
    n = len(daily)
    if n < 2:
        return pa.table(
            {
                "n_days": pa.array([n], pa.int64()),
                "s_stat": pa.array([0], pa.int64()),
                "tau": pa.array([None], pa.float64()),
            }
        )
    x = daily["cents"].to_numpy(np.int64)
    ii, jj = np.triu_indices(n, k=1)
    s = int(np.sign(x[jj] - x[ii]).astype(np.int64).sum())
    tau = float(round6(np.array([s / (n * (n - 1) / 2.0)]))[0])
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "s_stat": pa.array([s], pa.int64()),
            "tau": pa.array([tau], pa.float64()),
        }
    )


EVENTS_MANN_KENDALL_SQL = """
WITH d AS (
    SELECT epoch_us(ts) // 86400000000 AS day,
           CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
    FROM events GROUP BY 1
),
p AS (
    SELECT CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END
               AS sg
    FROM d a JOIN d b ON b.day > a.day
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
SELECT (SELECT n FROM nn) AS n_days,
       CAST(coalesce(sum(sg), 0) AS BIGINT) AS s_stat,
       ROUND(CAST(coalesce(sum(sg), 0) AS DOUBLE)
             / ((SELECT n FROM nn) * ((SELECT n FROM nn) - 1) / 2.0), 6)
           AS tau
FROM p
"""


# ---------------------------------------------------------------------------
# events_diurnal_harmonic — first-harmonic fit of the hour-of-day profile
# ---------------------------------------------------------------------------


def q_events_diurnal_harmonic(sf_dir: str):
    """First-harmonic (24 h period) least-squares fit of the
    hour-of-day event-count profile: with hourly counts ``c_h``,
    ``a = (2/24)·Σ c_h·cos(2πh/24)``, ``b = (2/24)·Σ c_h·sin(2πh/24)``,
    amplitude ``sqrt(a²+b²)`` and mesor (mean) — the compact diurnal
    seasonality descriptor (cosinor analysis). Exact integer hourly
    counts; the trig sums use the identical IEEE expression both
    engines + ROUND6.

    Plan: per-batch hour-of-day partials (24 cells per block) → one
    24-row fold → O(24) driver finale."""
    from ray.data.aggregate import Sum

    from ..functions.numeric import round6

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "hour": pa.array([], pa.int64()),
                    "p_n": pa.array([], pa.int64()),
                }
            )
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        hour = (us // 3_600_000_000) % 24
        u, cnt = np.unique(hour, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(u, pa.int64()),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hour")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()  # O(24)
        .sort_values("hour", ignore_index=True)
    )
    c = np.zeros(24, np.int64)
    c[hourly["hour"].to_numpy(np.int64)] = hourly["n"].to_numpy(np.int64)
    h = np.arange(24, dtype=np.float64)
    ang = 2.0 * math.pi * h / 24.0
    a = (2.0 / 24.0) * float((c * np.cos(ang)).sum())
    b = (2.0 / 24.0) * float((c * np.sin(ang)).sum())
    amp = math.sqrt(a * a + b * b)
    mesor = float(c.sum()) / 24.0
    from ..functions.numeric import round6 as _r6

    r = lambda v: float(_r6(np.array([v]))[0])  # noqa: E731
    return pa.table(
        {
            "n_events": pa.array([int(c.sum())], pa.int64()),
            "mesor": pa.array([r(mesor)], pa.float64()),
            "cos_coef": pa.array([r(a)], pa.float64()),
            "sin_coef": pa.array([r(b)], pa.float64()),
            "amplitude": pa.array([r(amp)], pa.float64()),
        }
    )


EVENTS_DIURNAL_SQL = """
WITH hcnt AS (
    SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
),
s AS (
    SELECT
        CAST(sum(n) AS BIGINT) AS total,
        (2.0 / 24.0) * sum(n * cos(2.0 * pi() * hour / 24.0)) AS a,
        (2.0 / 24.0) * sum(n * sin(2.0 * pi() * hour / 24.0)) AS b
    FROM hcnt
)
SELECT total AS n_events,
       ROUND(CAST(total AS DOUBLE) / 24.0, 6) AS mesor,
       ROUND(a, 6) AS cos_coef,
       ROUND(b, 6) AS sin_coef,
       ROUND(sqrt(a * a + b * b), 6) AS amplitude
FROM s
"""


REGISTRY: dict[str, tuple] = {
    "events_theil_sen": (q_events_theil_sen, EVENTS_THEIL_SEN_SQL),
    "events_mann_kendall": (q_events_mann_kendall, EVENTS_MANN_KENDALL_SQL),
    "events_diurnal_harmonic": (
        q_events_diurnal_harmonic,
        EVENTS_DIURNAL_SQL,
    ),
}


# ---------------------------------------------------------------------------
# docs_weighted_jaccard — IDF-weighted exact similarity join
# ---------------------------------------------------------------------------

WJACCARD_THRESHOLD = 0.35


def q_docs_weighted_jaccard(sf_dir: str):
    """Exact IDF-WEIGHTED trigram Jaccard pairs:
    ``wjac = Σ_{g∈A∩B} idf(g) / Σ_{g∈A∪B} idf(g)`` with
    ``idf(g) = ln(N / df(g))`` — boilerplate n-grams (present in many
    documents) get near-zero weight, so templated pages stop looking
    like near-duplicates while genuine shared RARE content still
    matches. The weighted sibling of ``docs_ngram_jaccard``.

    Plan (round-4 weighted PPJoin prefix filter, fused per round-4
    §next-5 on the shared ``gram_df_front`` checkpoint): grams hashed
    IN the explode batch (strings never shuffled), ONE int-keyed
    exchange attaches df, and the materialized (doc_id, gh, df, dn)
    relation feeds BOTH the prefix side and the verify side — idf
    micro-unit weights w = round(ln(N/df)*1e6) are a pure function of
    df, derived on each side instead of exchanged. Doc-keyed WEIGHTED
    prefix selection (minimal heaviest-first head whose complement
    weight < t*W — provably loses no pair with wjac >= t) → gh-keyed
    expansion over prefix rows only → auto-routed exact verify
    (``verify_pairs``: broadcast shared-weight counting when candidates
    fit, (gh, w)-cogroup fallback past the limit). The round-3 plan
    expanded every gram's full posting list (C(df,2) pairs on
    boilerplate grams — the last 100-TB wall, VERDICT r3 "What's wrong
    #1"); prefixes never contain hot grams, so that wall is gone while
    the emitted pair set and the unchanged SQL twin stay value-exact.
    N (docs with >= k tokens, i.e. contributing grams) is one tiny
    streaming partial-sum pass over the docs table."""
    from ..functions.text import tokens_list
    from ..stages import ppjoin as P
    from ..stages.keyed import map_partitions_by_key as _mpk

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    # N = docs contributing grams (>= 3 tokens) — per-block partial
    # counts, one tiny sum; no shuffle, no re-tokenization later
    def _count_gram_docs(t: pa.Table) -> pa.Table:
        toks = tokens_list(t["text"].combine_chunks())
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        return pa.table({"c": pa.array([int((lens >= 3).sum())], pa.int64())})

    n_docs = int(
        docs.map_batches(
            _count_gram_docs, batch_format="pyarrow", zero_copy_batch=True
        ).sum("c")
    )

    dfd = P.gram_df_front(docs, num_parts=NUM_PARTS)
    # WJACCARD_THRESHOLD = 0.35 = 7/20 — exact int64 cross-multiplied cut
    pfx = _mpk(
        dfd,
        "doc_id",
        lambda t: P.select_prefix_weighted(P.with_idf_w(t, n_docs), 7, 20),
        num_parts=NUM_PARTS,
    )
    cand = _mpk(
        pfx,
        "gh",
        lambda t: P.expand_weighted_pairs(t, 7, 20),
        num_parts=NUM_PARTS,
    )
    return P.verify_pairs(
        dfd, cand, "wjaccard", WJACCARD_THRESHOLD, "wjaccard",
        num_parts=NUM_PARTS, n_docs=n_docs,
    )


DOCS_WEIGHTED_JACCARD_SQL = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
tri AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(
               generate_series(1, len(ts) - 2),
               i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]
           )) AS g
    FROM tok
    WHERE len(ts) >= 3
),
nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tri),
w AS (
    SELECT g, CAST(ROUND(ln((SELECT n FROM nn) / count(*)) * 1000000)
                   AS BIGINT) AS wt
    FROM tri GROUP BY 1
),
wsz AS (
    SELECT t.doc_id, CAST(sum(w.wt) AS BIGINT) AS W
    FROM tri t JOIN w USING (g) GROUP BY 1
),
winter AS (
    SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(sum(w.wt) AS BIGINT) AS wi
    FROM tri a
    JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
    JOIN w ON w.g = a.g
    GROUP BY 1, 2
)
SELECT da AS doc_a, db AS doc_b,
       ROUND(CAST(wi AS DOUBLE) / (sa.W + sb.W - wi), 6) AS wjaccard
FROM winter
JOIN wsz sa ON sa.doc_id = da
JOIN wsz sb ON sb.doc_id = db
WHERE ROUND(CAST(wi AS DOUBLE) / (sa.W + sb.W - wi), 6)
      >= {WJACCARD_THRESHOLD}
"""


REGISTRY["docs_weighted_jaccard"] = (
    q_docs_weighted_jaccard,
    DOCS_WEIGHTED_JACCARD_SQL,
)


# ---------------------------------------------------------------------------
# orders_priority_path — ordered string aggregation per entity
# ---------------------------------------------------------------------------


def q_orders_priority_path(sf_dir: str):
    """Per customer: the '>'-joined sequence of order priorities in
    (o_orderdate, o_orderkey) order plus the order count — ORDERED
    string aggregation (SQL ``string_agg(... ORDER BY ...)``), the
    sequence-encoding step behind journey strings / session paths that
    plain unordered aggregation can't produce deterministically.

    Plan: ONE keyed exchange on custkey; per partition a single lexsort
    orders every customer's run and one Arrow ``binary_join`` over a
    ListArray built from segment offsets emits the joined path — no
    per-group Python."""
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def part_fn(t: pa.Table) -> pa.Table:
        from ..stages.keyed import map_partitions_by_key  # noqa: F401

        empty = pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
                "priority_path": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        cust = np.asarray(t["o_custkey"].combine_chunks().cast(pa.int64()))
        okey = np.asarray(t["o_orderkey"].combine_chunks().cast(pa.int64()))
        date = np.asarray(
            t["o_orderdate"].combine_chunks().cast(pa.int64())
        )
        order = np.lexsort((okey, date, cust))
        cust_s = cust[order]
        prio = t["o_orderpriority"].combine_chunks().take(pa.array(order))
        starts = np.flatnonzero(
            np.concatenate(([True], cust_s[1:] != cust_s[:-1]))
        )
        seg_len = np.diff(np.append(starts, len(cust_s)))
        offs = np.concatenate(([0], np.cumsum(seg_len))).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offs), prio)
        path = pc.binary_join(lists, ">")
        return pa.table(
            {
                "o_custkey": pa.array(cust_s[starts], pa.int64()),
                "n_orders": pa.array(seg_len.astype(np.int64)),
                "priority_path": path.cast(pa.string()),
            }
        )

    from ..stages.keyed import map_partitions_by_key

    return map_partitions_by_key(
        orders, "o_custkey", part_fn, num_parts=NUM_PARTS
    )


ORDERS_PRIORITY_PATH_SQL = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       string_agg(o_orderpriority, '>'
                  ORDER BY o_orderdate, o_orderkey) AS priority_path
FROM orders GROUP BY 1
"""


REGISTRY["orders_priority_path"] = (
    q_orders_priority_path,
    ORDERS_PRIORITY_PATH_SQL,
)


# ---------------------------------------------------------------------------
# lineitem_q19_disjunctive — OR-of-ANDs predicate join (TPC-H Q19 shape)
# ---------------------------------------------------------------------------

Q19_BANDS = (
    ("Brand#1", 1, 10, 1, 11),
    ("Brand#2", 1, 20, 10, 20),
    ("Brand#3", 1, 30, 20, 30),
)


def q_lineitem_q19_disjunctive(sf_dir: str):
    """Discounted revenue over the DISJUNCTION of brand/size/quantity
    band predicates (TPC-H Q19 shape): each OR-arm couples a part-side
    condition (brand + size band) with a lineitem-side condition
    (quantity band), so neither side can be filtered independently —
    the classic disjunctive predicate-pushdown join.

    Plan: the part side reduces to a partkey → arm-bitmask lookup
    (bounded by the part table's filtered width) broadcast via
    ``ray.put``; one streaming lineitem pass resolves the bitmask per
    row and evaluates the matching arm's quantity band vectorized —
    no shuffle at all. Revenue is exact integer cents×(100−disc_pct)
    folded as int64; ONE final division mirrored in SQL."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.numeric import round_half_away

    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    pk = np.asarray(part["p_partkey"].combine_chunks().cast(pa.int64()))
    brand = part["p_brand"].combine_chunks()
    size = np.asarray(part["p_size"].combine_chunks().cast(pa.int64()))
    mask = np.zeros(len(pk), np.int64)
    for i, (b, s_lo, s_hi, _q_lo, _q_hi) in enumerate(Q19_BANDS):
        arm = (
            np.asarray(pc.equal(brand, b))
            & (size >= s_lo)
            & (size <= s_hi)
        )
        mask |= arm.astype(np.int64) << i
    keep = mask > 0
    lut_keys = np.sort(pk[keep])
    lut_mask = mask[keep][np.argsort(pk[keep], kind="stable")]
    lut_ref = ray.put((lut_keys, lut_mask))

    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    class Q19Scorer:
        def __init__(self, ref):
            self.keys, self.mask = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "p_rev": pa.array([], pa.int64()),
                    "p_n": pa.array([], pa.int64()),
                }
            )
            if t.num_rows == 0 or len(self.keys) == 0:
                return empty
            lpk = np.asarray(t["l_partkey"].combine_chunks().cast(pa.int64()))
            pos = np.searchsorted(self.keys, lpk)
            pos_c = np.minimum(pos, len(self.keys) - 1)
            hit = self.keys[pos_c] == lpk
            if not hit.any():
                return empty
            m = np.where(hit, self.mask[pos_c], 0)
            qty = round_half_away(
                np.asarray(t["l_quantity"].combine_chunks()).astype(
                    np.float64
                )
                * 100.0
            ).astype(np.int64)
            ok = np.zeros(len(lpk), bool)
            for i, (_b, _s_lo, _s_hi, q_lo, q_hi) in enumerate(Q19_BANDS):
                ok |= (
                    ((m >> i) & 1).astype(bool)
                    & (qty >= q_lo * 100)
                    & (qty <= q_hi * 100)
                )
            if not ok.any():
                return empty
            price = round_half_away(
                np.asarray(t["l_extendedprice"].combine_chunks())[ok].astype(
                    np.float64
                )
                * 100.0
            ).astype(np.int64)
            disc = round_half_away(
                np.asarray(t["l_discount"].combine_chunks())[ok].astype(
                    np.float64
                )
                * 100.0
            ).astype(np.int64)
            rev = price * (100 - disc)  # cents x pct: exact int64
            return pa.table(
                {
                    "p_rev": pa.array([int(rev.sum())], pa.int64()),
                    "p_n": pa.array([int(ok.sum())], pa.int64()),
                }
            )

    agg = ds.map_batches(
        Q19Scorer,
        fn_constructor_args=(lut_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    ).aggregate(Sum("p_rev", alias_name="rev"), Sum("p_n", alias_name="n"))
    rev = int(agg["rev"] or 0)
    n = int(agg["n"] or 0)
    return pa.table(
        {
            "revenue": pa.array([rev / 10000.0], pa.float64()),
            "n_lines": pa.array([n], pa.int64()),
        }
    )


def _q19_sql() -> str:
    arms = []
    for b, s_lo, s_hi, q_lo, q_hi in Q19_BANDS:
        arms.append(
            f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s_lo} AND {s_hi}"
            f" AND l.l_quantity >= {q_lo} AND l.l_quantity <= {q_hi})"
        )
    pred = "\n    OR ".join(arms)
    return f"""
SELECT CAST(coalesce(sum(
           CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
       ), 0) AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {pred}
"""


REGISTRY["lineitem_q19_disjunctive"] = (
    q_lineitem_q19_disjunctive,
    _q19_sql(),
)


# ---------------------------------------------------------------------------
# orders_shipping_priority — TPC-H Q3 shape (3-table chain + top-k)
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01"
Q3_TOPK = 10


def q_orders_shipping_priority(sf_dir: str):
    """Shipping-priority query (TPC-H Q3 shape): the {Q3_TOPK} unshipped
    orders with the highest outstanding revenue — customers in the
    '{Q3_SEGMENT}' segment, orders placed before {Q3_DATE}, lineitems
    shipping after it; revenue = Σ extendedprice·(1−discount) per order
    in exact integer cents×pct.

    Plan: cogroup 1 semi-joins orders against the filtered customer
    side by custkey (both sides large — no broadcast of a row-scaled
    customer set); cogroup 2 co-locates the surviving orders with their
    late lineitems by orderkey and folds per-order revenue; per-block
    partial top-k then one tiny final fold gives the global top-{Q3_TOPK}
    (revenue DESC, orderdate ASC, orderkey ASC — fully deterministic)."""
    from ..functions.numeric import round_half_away
    from ..stages.keyed import cogroup_by_key

    import pyarrow.dataset as pads

    d = np.datetime64(Q3_DATE, "us")
    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == Q3_SEGMENT,
    ).map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"].cast(pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < d,
    )

    def semi(opart: pa.Table, cpart: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
            }
        )
        if opart.num_rows == 0 or cpart.num_rows == 0:
            return empty
        ok = np.asarray(
            pc.is_in(
                opart["o_custkey"], value_set=cpart["o_custkey"].combine_chunks()
            )
        )
        kept = opart.filter(pa.array(ok))
        return pa.table(
            {
                "l_orderkey": kept["o_orderkey"].combine_chunks().cast(pa.int64()),
                "o_orderdate": kept["o_orderdate"],
                "o_orderpriority": kept["o_orderpriority"],
            }
        )

    seg_orders = cogroup_by_key(
        orders, cust, "o_custkey", semi, num_parts=NUM_PARTS
    )

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > d,
    )

    def fold_orders(lpart: pa.Table, opart: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "rev_cp": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
            }
        )
        if lpart.num_rows == 0 or opart.num_rows == 0:
            return empty
        okeys = np.asarray(opart["l_orderkey"].combine_chunks())
        o_sort = np.argsort(okeys, kind="stable")
        okeys_s = okeys[o_sort]
        lk = np.asarray(lpart["l_orderkey"].combine_chunks().cast(pa.int64()))
        pos = np.searchsorted(okeys_s, lk)
        pos_c = np.minimum(pos, len(okeys_s) - 1)
        hit = okeys_s[pos_c] == lk
        if not hit.any():
            return empty
        price = round_half_away(
            np.asarray(lpart["l_extendedprice"].combine_chunks())[hit]
            * 100.0
        ).astype(np.int64)
        disc = round_half_away(
            np.asarray(lpart["l_discount"].combine_chunks())[hit] * 100.0
        ).astype(np.int64)
        rev = price * (100 - disc)
        grp = pos_c[hit]  # index into okeys_s
        u, inv = np.unique(grp, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, rev)
        take = pa.array(o_sort[u])
        return pa.table(
            {
                "l_orderkey": pa.array(okeys_s[u], pa.int64()),
                "rev_cp": pa.array(s),
                "o_orderdate": opart["o_orderdate"].combine_chunks().take(take),
                "o_orderpriority": opart["o_orderpriority"]
                .combine_chunks()
                .take(take),
            }
        )

    per_order = cogroup_by_key(
        li, seg_orders, "l_orderkey", fold_orders, num_parts=NUM_PARTS
    )

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        rev = np.asarray(t["rev_cp"].combine_chunks())
        od = np.asarray(t["o_orderdate"].combine_chunks().cast(pa.int64()))
        okey = np.asarray(t["l_orderkey"].combine_chunks())
        order = np.lexsort((okey, od, -rev))[:Q3_TOPK]
        return t.take(pa.array(order))

    cand = per_order.map_batches(
        block_topk, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()  # O(#blocks x k)
    if len(cand) == 0:
        return pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.float64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
            }
        )
    cand = cand.sort_values(
        ["rev_cp", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True],
        ignore_index=True,
    ).head(Q3_TOPK)
    return pa.table(
        {
            "l_orderkey": pa.array(
                cand["l_orderkey"].to_numpy(np.int64), pa.int64()
            ),
            "revenue": pa.array(
                cand["rev_cp"].to_numpy(np.int64) / 10000.0, pa.float64()
            ),
            "o_orderdate": pa.array(
                cand["o_orderdate"].to_numpy().astype("datetime64[us]")
            ),
            "o_orderpriority": pa.array(
                cand["o_orderpriority"].astype(str), pa.string()
            ),
        }
    )


ORDERS_SHIPPING_PRIORITY_SQL = f"""
SELECT l.l_orderkey,
       CAST(sum(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < DATE '{Q3_DATE}'
  AND l.l_shipdate > DATE '{Q3_DATE}'
GROUP BY 1, 3, 4
ORDER BY sum(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) DESC,
         o.o_orderdate, l.l_orderkey
LIMIT {Q3_TOPK}
"""


REGISTRY["orders_shipping_priority"] = (
    q_orders_shipping_priority,
    ORDERS_SHIPPING_PRIORITY_SQL,
)


# ---------------------------------------------------------------------------
# events_kmv_distinct — k-minimum-values distinct-count sketch (exact twin)
# ---------------------------------------------------------------------------

KMV_K = 256


def q_events_kmv_distinct(sf_dir: str):
    """KMV (k-minimum-values) distinct-user estimator: keep the
    {KMV_K} smallest splitmix64 hashes of user_id; the estimate is
    ``(k−1) / (max_kept / 2^64)`` — the mergeable order-statistics
    sketch (bottom-k) beside HLL (events_hll_users), count-min
    (docs_cms_tokens) and Misra–Gries (docs_heavy_tokens). Fully
    deterministic (hash-based, no RNG), so the DuckDB twin reproduces
    it bit-for-bit via the HUGEINT splitmix chain; the true distinct
    count rides along for the error audit.

    Plan: per-block bottom-k partials (O(k) rows per block), an
    O(blocks×k) driver merge — the sketch never shuffles row-scaled
    data; truth comes from one exact keyed-exchange distinct fold."""
    from ..functions.numeric import round6
    from ..stages.keyed import map_partitions_by_key, splitmix64

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )

    def bottomk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        h = np.unique(splitmix64(uid.astype(np.uint64)))[:KMV_K]
        return pa.table({"h": pa.array(h, pa.uint64())})

    cand = ds.map_batches(
        bottomk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # O(#blocks x k)
    hs = np.unique(cand["h"].to_numpy(np.uint64))[:KMV_K]

    def uniq_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"p_d": pa.array([], pa.int64())})
        u = np.unique(
            np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        )
        return pa.table({"p_d": pa.array([len(u)], pa.int64())})

    true_d = int(
        map_partitions_by_key(ds, "user_id", uniq_part, num_parts=NUM_PARTS)
        .to_pandas()["p_d"]
        .sum()
    )
    if len(hs) < KMV_K:
        est = float(len(hs))  # fewer distincts than k: sketch is exact
    else:
        est = (KMV_K - 1) / (float(hs[-1]) / 2.0**64)
    est = float(round6(np.array([est]))[0])
    return pa.table(
        {
            "k": pa.array([KMV_K], pa.int64()),
            "kmv_estimate": pa.array([est], pa.float64()),
            "true_distinct": pa.array([true_d], pa.int64()),
        }
    )


def _kmv_sql() -> str:
    from .queries_relational import splitmix64_hash_sql

    return f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
{splitmix64_hash_sql('user_id', 'u', 0, '__k')},
h AS (SELECT __kh AS hv FROM __k5 ORDER BY __kh LIMIT {KMV_K}),
s AS (SELECT CAST(count(*) AS BIGINT) AS kept,
             CAST(max(hv) AS DOUBLE) AS mx FROM h)
SELECT CAST({KMV_K} AS BIGINT) AS k,
       ROUND(CASE WHEN kept < {KMV_K} THEN CAST(kept AS DOUBLE)
                  ELSE ({KMV_K} - 1) / (mx / 18446744073709551616.0)
             END, 6) AS kmv_estimate,
       (SELECT CAST(count(*) AS BIGINT) FROM u) AS true_distinct
FROM s
"""


REGISTRY["events_kmv_distinct"] = (q_events_kmv_distinct, _kmv_sql())

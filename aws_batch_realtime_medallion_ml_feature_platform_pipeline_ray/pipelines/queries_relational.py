"""Relational / daily-job operator queries: as-of join, online upsert,
label + deterministic hash split, partial aggregation, broadcast join,
top-k. Oracle twins in DuckDB SQL (see queries.py for float policy)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.asof import asof_join_broadcast, asof_join_partitioned
from ..stages.keyed import map_partitions_by_key
from ..sources.reads import read_parquet_sized
from ..functions.numeric import round_half_away

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


def _orders_by_cust_date(sf_dir: str):
    """Right side for the as-of join: one row per (custkey, orderdate) —
    pre-aggregated so the as-of match is deterministic under ties.
    One hash shuffle by custkey + Arrow-native group_by per partition
    (Ray's two-key Dataset.groupby().aggregate() alone cost ~5 s at
    sf0.1; this path is ~1 s)."""
    import ray.data as rd

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def agg_partition(part: pa.Table) -> pa.Table:
        g = part.group_by(["o_custkey", "o_orderdate"]).aggregate(
            [("o_totalprice", "count"), ("o_totalprice", "sum")]
        )
        return pa.table(
            {
                "o_custkey": g["o_custkey"],
                "o_orderdate": g["o_orderdate"].cast(pa.timestamp("us")),
                "n_orders": g["o_totalprice_count"].cast(pa.int64()),
                "tot": pc.round(g["o_totalprice_sum"], ndigits=2),
            }
        )

    return map_partitions_by_key(
        orders, "o_custkey", agg_partition, num_parts=NUM_PARTS
    )


def _events_left(sf_dir: str):
    return read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )


ASOF_ATTACH = ["o_orderdate", "n_orders", "tot"]


def q_asof_join(sf_dir: str):
    """B9 as-of join, broadcast plan: for each event, the most recent
    per-(customer, day) order summary with o_orderdate <= ts (strictly
    no-future). Right side broadcast via ray.put, probed per batch."""
    right = pa.Table.from_pandas(
        _orders_by_cust_date(sf_dir).to_pandas(), preserve_index=False
    )
    return asof_join_broadcast(
        _events_left(sf_dir),
        right,
        key="o_custkey",
        ts="o_orderdate",
        attach_cols=ASOF_ATTACH,
        left_key="user_id",
        left_ts="ts",
        concurrency=2,
    )


def q_asof_join_partitioned(sf_dir: str):
    """Same semantics, both-sides-large plan: one co-partitioning shuffle
    (union + groupby by key) then per-partition sorted probe."""
    right = _orders_by_cust_date(sf_dir).map_batches(
        lambda t: t.append_column("user_id", t["o_custkey"]),
        batch_format="pyarrow",
    )
    return asof_join_partitioned(
        _events_left(sf_dir),
        right,
        key="user_id",
        ts="o_orderdate",
        attach_cols=ASOF_ATTACH,
        left_ts="ts",
        num_parts=NUM_PARTS,
    ).drop_columns([])


ASOF_SQL = """
WITH ro AS (
    SELECT o_custkey, o_orderdate,
           count(*) AS n_orders,
           ROUND(sum(o_totalprice), 2) AS tot
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.ts, e.user_id, e.value,
       r.o_orderdate, r.n_orders, r.tot
FROM events e
ASOF LEFT JOIN ro r
    ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""

ASOF_PARTITIONED_SQL = ASOF_SQL

# Staleness bound for the tolerance variant. The fixture's event ts sits
# ~22-27 years after the order dates (match staleness spans 8190-9799
# days at sf0.01), so 8400 days splits the matches roughly in half —
# the tolerance is exercised, not vacuous.
ASOF_TOL_DAYS = 8400
ASOF_TOL_US = ASOF_TOL_DAYS * 86_400 * 1_000_000


def q_asof_join_tolerance(sf_dir: str):
    """As-of join with a staleness tolerance (feature-store freshness
    semantics): match the latest right row in ``[ts - tol, ts]``; an
    older-than-tol state row yields NULL features instead of stale ones.
    Same broadcast plan as ``asof_join`` — the tolerance is a post-mask on
    the probe (the as-of match is the latest eligible row, so an
    out-of-window match proves no in-window row exists)."""
    right = pa.Table.from_pandas(
        _orders_by_cust_date(sf_dir).to_pandas(), preserve_index=False
    )
    return asof_join_broadcast(
        _events_left(sf_dir),
        right,
        key="o_custkey",
        ts="o_orderdate",
        attach_cols=ASOF_ATTACH,
        left_key="user_id",
        left_ts="ts",
        concurrency=2,
        tolerance_us=ASOF_TOL_US,
    )


# DuckDB has no native as-of tolerance: ASOF LEFT JOIN finds the latest
# ts' <= ts; CASE-nulling the attached columns when that match is older
# than the bound is exact (any other candidate is older still).
ASOF_TOLERANCE_SQL = f"""
WITH ro AS (
    SELECT o_custkey, o_orderdate,
           count(*) AS n_orders,
           ROUND(sum(o_totalprice), 2) AS tot
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.ts, e.user_id, e.value,
       CASE WHEN r.o_orderdate >= e.ts - INTERVAL {ASOF_TOL_DAYS} DAY
            THEN r.o_orderdate END AS o_orderdate,
       CASE WHEN r.o_orderdate >= e.ts - INTERVAL {ASOF_TOL_DAYS} DAY
            THEN r.n_orders END AS n_orders,
       CASE WHEN r.o_orderdate >= e.ts - INTERVAL {ASOF_TOL_DAYS} DAY
            THEN r.tot END AS tot
FROM events e
ASOF LEFT JOIN ro r
    ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""


def q_online_latest(sf_dir: str):
    """S7 online-table upsert semantics: latest row per entity
    (argmax ts, deterministic tiebreak max event_id) — the reference's
    feature-store latest-wins upsert (silver_and_gold.py:136-180) without
    the driver collect."""
    import ray.data as rd

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def last_per_user(t: pa.Table) -> pa.Table:
        eid = np.asarray(t["event_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        uid = np.asarray(t["user_id"].combine_chunks())
        # sort by (user, -ts, -event_id) == reverse of (user asc, ts, eid)
        order = np.lexsort((-eid, -ts, uid))
        first = np.zeros(len(uid), dtype=bool)
        u = uid[order]
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        return t.take(pa.array(order[first]))

    return map_partitions_by_key(ds, "user_id", last_per_user, num_parts=NUM_PARTS)


ONLINE_LATEST_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
"""


SPLIT_SALT = 42


def split_bucket(ids: np.ndarray, salt: int = SPLIT_SALT) -> np.ndarray:
    """Deterministic 0..99 bucket: splitmix64(id + salt) % 100 — stable
    under any parallelism / partitioning (unlike Spark's per-partition
    randomSplit seed, reference build_datasets.py:63). Fully vectorized
    (~60 M rows/s/core; replaces the round-1 per-row md5 loop, VERDICT r1
    §wrong-2) with an exact HUGEINT bit-arithmetic DuckDB twin below."""
    from ..stages.keyed import splitmix64

    x = ids.astype(np.uint64) + np.uint64(salt)
    return (splitmix64(x) % np.uint64(100)).astype(np.int64)


def split_bucket_str(keys, turn: np.ndarray, salt: int = SPLIT_SALT) -> np.ndarray:
    """Bucket for (string key, int subkey) pairs — e.g. (conv_id,
    turn_idx) in the daily job: stable siphash of the string xor
    splitmix64 of the subkey, then the same finalizer. Vectorized in C."""
    from ..stages.keyed import hash_key, splitmix64

    h = hash_key(keys) ^ splitmix64(turn.astype(np.uint64) + np.uint64(salt))
    return (splitmix64(h) % np.uint64(100)).astype(np.int64)


def q_train_split(sf_dir: str):
    """M8 label derivation + O2 deterministic 80/20 hash split (the daily
    build_datasets job's core, reference build_datasets.py:57-73)."""
    import ray.data as rd

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def fn(t: pa.Table) -> pa.Table:
        label = pc.cast(pc.greater(t["value"], 100.0), pa.int32())
        bucket = split_bucket(np.asarray(t["event_id"].combine_chunks()))
        split = np.where(bucket < 80, "train", "validation")
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "is_high": label,
                "split": pa.array(split, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --- exact DuckDB twin of split_bucket: splitmix64 over HUGEINT ---------
# wrapping 64-bit multiply emulated by 32-bit limb decomposition so no
# intermediate exceeds 2^97 (HUGEINT max is 2^127-1)
_M64 = "18446744073709551616::HUGEINT"
_M32 = "4294967296::HUGEINT"
_SM_GOLD = 11400714819323198485   # 0x9E3779B97F4A7C15
_SM_C1 = 13787848793156543929     # 0xBF58476D1CE4E5B9
_SM_C2 = 10723151780598845931     # 0x94D049BB133111EB


def _mul64_sql(x: str, c: int) -> str:
    return (
        f"((((({x}) >> 32) * {c}::HUGEINT) % {_M32}) * {_M32} "
        f"+ (({x}) % {_M32}) * {c}::HUGEINT) % {_M64}"
    )


def splitmix64_bucket_sql(col: str, src: str, salt: int = SPLIT_SALT) -> str:
    """CTE chain computing ``splitmix64((col + salt) mod 2^64) % 100`` as
    column ``__bucket`` alongside all columns of ``src``; final CTE is
    ``__s5``. One `% 100` step over the shared full-hash chain, so the
    bucket and the epoch-order hash can never desync."""
    return (
        splitmix64_hash_sql(col, src, salt, "__t")
        + ",\n__s5 AS (SELECT *, (__th % 100)::BIGINT AS __bucket FROM __t5)\n"
    )


def splitmix64_hash_sql(col: str, src: str, salt: int, prefix: str) -> str:
    """CTE chain computing the FULL ``splitmix64((col + salt) mod 2^64)``
    value (HUGEINT in [0, 2^64)) as column ``{prefix}h`` alongside all
    columns of ``src``; final CTE is ``{prefix}5``. Unsigned compare on
    the HUGEINT matches numpy uint64 ordering bit-for-bit, so ORDER BY
    ``{prefix}h`` is the exact twin of a uint64 hash-rank sort. Distinct
    ``prefix`` values let several chains coexist in one WITH (e.g. one
    per epoch)."""
    p = prefix
    return f"""
{p}0 AS (SELECT *, (({col}::HUGEINT + {salt} + {_SM_GOLD}) % {_M64}) AS {p}z0 FROM {src}),
{p}1 AS (SELECT *, xor({p}z0, {p}z0 >> 30) AS {p}y1 FROM {p}0),
{p}2 AS (SELECT *, {_mul64_sql(p + 'y1', _SM_C1)} AS {p}z1 FROM {p}1),
{p}3 AS (SELECT *, xor({p}z1, {p}z1 >> 27) AS {p}y2 FROM {p}2),
{p}4 AS (SELECT *, {_mul64_sql(p + 'y2', _SM_C2)} AS {p}z2 FROM {p}3),
{p}5 AS (SELECT *, xor({p}z2, {p}z2 >> 31) AS {p}h FROM {p}4)
"""


TRAIN_SPLIT_SQL = f"""
WITH {splitmix64_bucket_sql('event_id', 'events')}
SELECT event_id, user_id,
    CAST(value > 100.0 AS INTEGER) AS is_high,
    CASE WHEN __bucket < 80 THEN 'train' ELSE 'validation' END AS split
FROM __s5
"""


N_FOLDS = 5  # 100 % 5 == 0, so bucket % N_FOLDS stays exactly uniform


def q_train_kfold(sf_dir: str):
    """GROUPED k-fold assignment: the fold is a function of ``user_id``
    (not the row), so every event of a user lands in the same fold —
    the leak-free cross-validation split for per-entity features (a user
    straddling folds would leak its own history into validation). Same
    stable splitmix64 bucketing as ``train_split`` (deterministic under
    any partitioning); a streamed map, zero shuffles."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def fn(t: pa.Table) -> pa.Table:
        label = pc.cast(pc.greater(t["value"], 100.0), pa.int32())
        bucket = split_bucket(np.asarray(t["user_id"].combine_chunks()))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "is_high": label,
                "fold": pa.array(bucket % N_FOLDS, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


TRAIN_KFOLD_SQL = f"""
WITH {splitmix64_bucket_sql('user_id', 'events')}
SELECT event_id, user_id,
    CAST(value > 100.0 AS INTEGER) AS is_high,
    (__bucket % {N_FOLDS})::BIGINT AS fold
FROM __s5
"""


def q_agg_pushdown(sf_dir: str):
    """Partial (combiner-style) aggregation: per-batch pyarrow group_by
    inside map_batches emits tiny partials, then a small final groupby —
    the pre-aggregate-before-shuffle pattern for 100 TB groupbys."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("l_discount", "sum"),
                ("l_quantity", "count"),
            ]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_price", "p_disc", "p_n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    # the partial stream is O(batches x groups) tiny rows with a
    # low-cardinality key — merge it with a narrow repartition(1) + one
    # in-task fold (the HLL pattern) instead of a sort-shuffle groupby,
    # whose coordination floor (~8 s at 32 CPUs) dwarfs the payload
    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("p_qty", "sum"),
                ("p_price", "sum"),
                ("p_disc", "sum"),
                ("p_n", "sum"),
            ]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "sum_qty": pc.round(g["p_qty_sum"], ndigits=6),
                "sum_price": pc.cast(pc.round(g["p_price_sum"], ndigits=0, round_mode="half_towards_infinity"), pa.int64()),
                "avg_disc": pc.round(
                    pc.divide(g["p_disc_sum"], pc.cast(g["p_n_sum"], pa.float64())),
                    ndigits=6,
                ),
                "n_rows": g["p_n_sum"],
            }
        )

    return partials.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


AGG_PUSHDOWN_SQL = """
SELECT l_returnflag, l_linestatus,
    ROUND(sum(l_quantity), 6) AS sum_qty,
    CAST(ROUND(sum(l_extendedprice), 0) AS BIGINT) AS sum_price,
    ROUND(sum(l_discount) / count(*), 6) AS avg_disc,
    count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


class _SegmentLookup:
    """Broadcast small-side lookup: dimension table fetched once per actor
    from the object store, probed vectorized per batch (no shuffle join)."""

    def __init__(self, ref):
        import ray

        cust = ray.get(ref)
        self.keys = np.asarray(cust["c_custkey"])
        order = np.argsort(self.keys)
        self.keys = self.keys[order]
        self.seg = cust["c_mktsegment"].take(pa.array(order))

    def __call__(self, batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch["user_id"].combine_chunks())
        pos = np.searchsorted(self.keys, uid)
        pos_c = pos.clip(max=len(self.keys) - 1)
        miss = self.keys[pos_c] != uid
        take = pa.array(np.where(miss, 0, pos_c), pa.int64(), mask=miss)
        return batch.append_column("c_mktsegment", self.seg.take(take))


def q_broadcast_join(sf_dir: str):
    """Broadcast hash join (events x customer dim) + partial aggregation:
    revenue-ish rollup per market segment."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ref = ray.put(cust)
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )
    joined = ds.map_batches(
        _SegmentLookup,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["c_mktsegment"]))
        g = t.group_by("c_mktsegment").aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return g.rename_columns(["c_mktsegment", "p_val", "p_n"])

    out = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "c_mktsegment"
    ).aggregate(
        Sum("p_val", alias_name="sum_value"), Sum("p_n", alias_name="n_events")
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("sum_value"),
            "sum_value",
            pc.cast(pc.round(t["sum_value"], ndigits=0, round_mode="half_towards_infinity"), pa.int64()),
        ),
        batch_format="pyarrow",
    )


BROADCAST_JOIN_SQL = """
SELECT c.c_mktsegment,
    CAST(ROUND(sum(e.value), 0) AS BIGINT) AS sum_value,
    count(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_topk(sf_dir: str):
    """Groupby + global sort + limit: top-10 users by total value."""
    import ray.data as rd
    from ray.data.aggregate import Sum, Count

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    agg = ds.groupby("user_id").aggregate(
        Sum("value", alias_name="tot"), Count(alias_name="n")
    )
    agg = agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("tot"),
            "tot",
            pc.cast(pc.round(t["tot"], ndigits=0, round_mode="half_towards_infinity"), pa.int64()),
        ),
        batch_format="pyarrow",
    )
    return agg.sort(["tot", "user_id"], descending=[True, True]).limit(10)


TOPK_SQL = """
SELECT user_id, CAST(ROUND(sum(value), 0) AS BIGINT) AS tot, count(*) AS n
FROM events GROUP BY user_id
ORDER BY tot DESC, user_id DESC LIMIT 10
"""


def q_join_shuffle(sf_dir: str):
    """Large-large shuffle equi-join: lineitem x orders on orderkey —
    the general partitioned hash join when neither side fits a
    broadcast. ONE co-partitioning exchange (`cogroup_by_key`), then a
    vectorized sort+searchsorted probe per partition (the right side's
    key is unique, so the probe is a gather, not an expansion). At 100 TB
    both sides stream through the same hash partitioning every other
    keyed stage uses; no driver materialization."""
    from ..stages.keyed import cogroup_by_key

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    ).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey", "o_orderpriority"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def join(lp: pa.Table, rp: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("o_custkey", pa.int64()),
                ("o_orderpriority", pa.string()),
            ]
        )
        if lp.num_rows == 0 or rp.num_rows == 0:
            return schema.empty_table()
        rk = np.asarray(rp["l_orderkey"].combine_chunks())
        order = np.argsort(rk)
        rk_s = rk[order]
        lk = np.asarray(lp["l_orderkey"].combine_chunks())
        pos = np.minimum(np.searchsorted(rk_s, lk), len(rk_s) - 1)
        hit = rk_s[pos] == lk
        sel_l = pa.array(np.flatnonzero(hit))
        sel_r = pa.array(order[pos[hit]])
        out = lp.take(sel_l)
        for c in ("o_custkey", "o_orderpriority"):
            out = out.append_column(c, rp[c].combine_chunks().take(sel_r))
        return out.cast(schema)

    return cogroup_by_key(li, orders, "l_orderkey", join, num_parts=NUM_PARTS)


JOIN_SHUFFLE_SQL = """
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice,
       o.o_custkey, o.o_orderpriority
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


def q_events_distinct_users(sf_dir: str):
    """Exact distinct-count aggregate: per event type, distinct users +
    event count + integer-rounded value sum. Two-level: per-batch
    (type, user) partials collapse the event stream, ONE shuffle keyed by
    user co-locates every copy of a (type, user) pair, each partition
    emits per-type partial rows (additive because a pair lives in exactly
    one partition), and a single tiny block folds the partials. The
    exchange moves O(distinct pairs), never O(events)."""
    import ray.data as rd

    from ..stages.keyed import map_partitions_by_key

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return g.rename_columns(["event_type", "user_id", "sv", "n"])

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_type_partial(part: pa.Table) -> pa.Table:
        # collapse to full (type, user) rows, then per-type partials
        g = part.group_by(["event_type", "user_id"]).aggregate(
            [("sv", "sum"), ("n", "sum")]
        )
        t = g.group_by("event_type").aggregate(
            [("user_id", "count"), ("n_sum", "sum"), ("sv_sum", "sum")]
        )
        return t.rename_columns(["event_type", "u", "n", "sv"])

    partials = map_partitions_by_key(
        pairs, "user_id", per_type_partial, num_parts=NUM_PARTS
    )

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("u", "sum"), ("n", "sum"), ("sv", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n_users": g["u_sum"].cast(pa.int64()),
                "n_events": g["n_sum"].cast(pa.int64()),
                "sum_value": pc.cast(pc.round(g["sv_sum"], ndigits=0, round_mode="half_towards_infinity"), pa.int64()),
            }
        )

    return partials.repartition(1).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


EVENTS_DISTINCT_SQL = """
SELECT event_type,
       count(DISTINCT user_id)::BIGINT AS n_users,
       count(*)::BIGINT AS n_events,
       CAST(ROUND(sum(value), 0) AS BIGINT) AS sum_value
FROM events GROUP BY event_type
"""


def q_events_windowed(sf_dir: str):
    """Tumbling-window aggregate: per (event type, 1-hour window) event
    count and integer-rounded value sum — the batch form of the streaming
    windowed rollup. Per-batch partials collapse the stream to
    (type, window) rows, then one small keyed pass finalizes; the
    exchange moves O(types x windows), never O(events)."""
    from ..stages.keyed import map_partitions_by_key

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def win_partial(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"].combine_chunks(), unit="hour")
        g = (
            t.drop_columns(["ts"])
            .append_column("window_start", w)
            .group_by(["event_type", "window_start"])
            .aggregate([("value", "sum"), ("value", "count")])
        )
        g = g.rename_columns(["event_type", "window_start", "sv", "n"])
        # int64 shuffle key (hash_key has int/string paths, not temporal)
        return g.append_column(
            "wkey", g["window_start"].cast(pa.int64())
        )

    partials = ds.map_batches(
        win_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def finalize(part: pa.Table) -> pa.Table:
        g = part.drop_columns(["wkey"]).group_by(
            ["event_type", "window_start"]
        ).aggregate([("n", "sum"), ("sv", "sum")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "window_start": g["window_start"],
                "n_events": g["n_sum"].cast(pa.int64()),
                "sum_value": pc.cast(pc.round(g["sv_sum"], ndigits=0, round_mode="half_towards_infinity"), pa.int64()),
            }
        )

    return map_partitions_by_key(partials, "wkey", finalize, num_parts=NUM_PARTS)


EVENTS_WINDOWED_SQL = """
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       count(*)::BIGINT AS n_events,
       CAST(ROUND(sum(value), 0) AS BIGINT) AS sum_value
FROM events GROUP BY 1, 2
"""

HOP_WINDOW_HOURS = 3  # window span; hop = 1 hour
_HOUR_US = 3_600_000_000


def q_events_hopping(sf_dir: str):
    """Hopping (sliding) window aggregate: 3-hour windows advancing every
    hour, so each event lands in exactly 3 overlapping windows. The
    expansion is per-batch (np.tile ×3 BEFORE the partial group_by
    collapses it to (type, window) rows), so the exchange still moves
    O(types × windows), never O(3 × events)."""
    from ..stages.keyed import map_partitions_by_key

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def hop_partial(t: pa.Table) -> pa.Table:
        hour = (
            pc.floor_temporal(t["ts"].combine_chunks(), unit="hour")
            .cast(pa.int64())
        )
        h = np.asarray(hour)
        n = len(h)
        # window k covers [hour - k, hour - k + W): tile events, offset starts
        ks = np.repeat(np.arange(HOP_WINDOW_HOURS, dtype=np.int64), n)
        starts = np.tile(h, HOP_WINDOW_HOURS) - ks * _HOUR_US
        g = (
            pa.table(
                {
                    "event_type": pa.chunked_array(
                        [t["event_type"].combine_chunks()] * HOP_WINDOW_HOURS
                    ).combine_chunks(),
                    "window_start": pa.array(starts, pa.int64()),
                    "value": pa.chunked_array(
                        [t["value"].combine_chunks()] * HOP_WINDOW_HOURS
                    ).combine_chunks(),
                }
            )
            .group_by(["event_type", "window_start"])
            .aggregate([("value", "sum"), ("value", "count")])
        )
        return g.rename_columns(["event_type", "wkey", "sv", "n"])

    partials = ds.map_batches(
        hop_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def finalize(part: pa.Table) -> pa.Table:
        g = part.group_by(["event_type", "wkey"]).aggregate(
            [("n", "sum"), ("sv", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "window_start": g["wkey"].cast(pa.timestamp("us")),
                "n_events": g["n_sum"].cast(pa.int64()),
                "sum_value": pc.cast(
                    pc.round(g["sv_sum"], ndigits=0,
                             round_mode="half_towards_infinity"),
                    pa.int64(),
                ),
            }
        )

    return map_partitions_by_key(partials, "wkey", finalize, num_parts=NUM_PARTS)


EVENTS_HOPPING_SQL = f"""
SELECT event_type,
       date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS window_start,
       count(*)::BIGINT AS n_events,
       CAST(ROUND(sum(value), 0) AS BIGINT) AS sum_value
FROM events CROSS JOIN (
    SELECT unnest(range({HOP_WINDOW_HOURS})) AS k
) k
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Multiway join (TPC-H Q5 shape): facts shuffle, dimensions broadcast
# --------------------------------------------------------------------------

MULTIWAY_REGION = "ASIA"


def q_join_multiway(sf_dir: str):
    """Revenue per nation within one region — the 6-table join pipeline
    (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region with the
    Q5 ``c_nationkey = s_nationkey`` colocation predicate).

    Physical plan by table role:
    * region/nation are FIXED-cardinality (5/25 rows at any SF) — read
      driver-side, folded into closures as literal dicts.
    * supplier is a dimension: read distributed + column-pruned + filtered
      to the region's nations, THEN collected and broadcast (ray.put) —
      the broadcast side must fit in memory by definition.
    * orders ⋈ customer and lineitem ⋈ (orders+nation) are big-big:
      one co-partitioning exchange each (cogroup_by_key), vectorized
      index_in probes per partition.
    * revenue is integer-exact: cents × (100 − discount%) in int64,
      summed per nation inside each partition (O(nations) partials).
    """
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from .queries import NUM_PARTS as CONV_PARTS  # noqa: F401  (doc link)
    from ..stages.keyed import cogroup_by_key

    region = pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    rname = {r["r_regionkey"]: r["r_name"] for r in region}
    asia = {
        int(n["n_nationkey"]): n["n_name"]
        for n in nation
        if rname[n["n_regionkey"]] == MULTIWAY_REGION
    }
    asia_keys = pa.array(sorted(asia), pa.int32())

    # supplier dim: distributed read/filter, then broadcast
    supp = (
        read_parquet_sized(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        .map_batches(
            lambda t: t.filter(pc.is_in(t["s_nationkey"], value_set=asia_keys)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    s_keys = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    s_nat = supp["s_nationkey"].to_numpy(np.int64)[
        np.argsort(supp["s_suppkey"].to_numpy(np.int64), kind="stable")
    ]
    supp_ref = ray.put((s_keys, s_nat))

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {"custkey": t["c_custkey"].cast(pa.int64()),
             "c_nationkey": t["c_nationkey"].cast(pa.int64())}
        ).filter(pc.is_in(t["c_nationkey"].cast(pa.int32()), value_set=asia_keys)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ords = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: pa.table(
            {"orderkey": t["o_orderkey"].cast(pa.int64()),
             "custkey": t["o_custkey"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def join_oc(opart: pa.Table, cpart: pa.Table) -> pa.Table:
        idx = pc.index_in(opart["custkey"], value_set=cpart["custkey"].combine_chunks())
        nat = cpart["c_nationkey"].combine_chunks().take(idx.combine_chunks())
        out = pa.table({"orderkey": opart["orderkey"], "c_nationkey": nat})
        return out.filter(pc.is_valid(out["c_nationkey"]))

    order_nat = cogroup_by_key(ords, cust, "custkey", join_oc, num_parts=NUM_PARTS)

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.rename_columns(
            ["orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def join_ls(lpart: pa.Table, opart: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"n_name": pa.array([], pa.string()),
             "p_n": pa.array([], pa.int64()),
             "p_rev": pa.array([], pa.int64())}
        )
        skeys, snat = ray.get(supp_ref)
        if lpart.num_rows == 0 or opart.num_rows == 0 or len(skeys) == 0:
            return empty
        idx = pc.index_in(
            lpart["orderkey"], value_set=opart["orderkey"].combine_chunks()
        ).combine_chunks()
        c_nat = np.asarray(
            opart["c_nationkey"].combine_chunks().take(idx).fill_null(-1)
        )
        lsup = np.asarray(lpart["l_suppkey"].combine_chunks()).astype(np.int64)
        pos = np.searchsorted(skeys, lsup)
        pos_c = pos.clip(max=len(skeys) - 1)
        s_ok = skeys[pos_c] == lsup
        s_nat_row = np.where(s_ok, snat[pos_c], -2)
        keep = (c_nat >= 0) & (s_nat_row == c_nat)
        if not keep.any():
            return empty
        price = np.asarray(lpart["l_extendedprice"].combine_chunks())[keep]
        disc = np.asarray(lpart["l_discount"].combine_chunks())[keep]
        cents = round_half_away(price * 100).astype(np.int64)
        dpct = round_half_away(disc * 100).astype(np.int64)
        rev = cents * (100 - dpct)
        inv, uniq = pd.factorize(c_nat[keep])
        n = np.bincount(inv).astype(np.int64)
        rsum = np.zeros(len(uniq), np.int64)
        np.add.at(rsum, inv, rev)
        names = [asia[int(k)] for k in uniq]
        return pa.table(
            {"n_name": pa.array(names, pa.string()),
             "p_n": pa.array(n),
             "p_rev": pa.array(rsum)}
        )

    partials = cogroup_by_key(li, order_nat, "orderkey", join_ls, num_parts=NUM_PARTS)
    out = partials.groupby("n_name").aggregate(
        Sum("p_n", alias_name="n_items"), Sum("p_rev", alias_name="revenue_c100")
    )
    return out.map_batches(
        lambda t: pa.table(
            {"n_name": t["n_name"],
             "n_items": t["n_items"].cast(pa.int64()),
             "revenue_c100": t["revenue_c100"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def q_events_union(sf_dir: str):
    """Explicit ``Dataset.union``: two independently filtered/pruned
    streams concatenated lazily (no shuffle — union of block lists),
    then a combiner-pattern count per type. The multi-source ingestion
    shape (e.g. two landing zones feeding one silver build)."""
    from ray.data.aggregate import Sum

    def side(ev_type: str):
        return read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(
            lambda t, et=ev_type: t.filter(pc.equal(t["event_type"], et)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    u = side("purchase").union(side("signup"))

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("value", "count")])
        return g.rename_columns(["event_type", "pn"])

    out = u.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = out.groupby("event_type").aggregate(Sum("pn", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "n": t["n"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


EVENTS_UNION_SQL = """
SELECT event_type, count(*)::BIGINT AS n
FROM (
    SELECT event_type FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_type FROM events WHERE event_type = 'signup'
)
GROUP BY 1
"""


def q_brand_revenue(sf_dir: str):
    """Revenue per part brand (lineitem ⋈ part, TPC-H Q14 shape): part is
    a true dimension that SCALES with the corpus, so it joins through the
    same one-exchange cogroup as any big-big join (no broadcast); the
    brand rollup collapses to O(brands) partials inside each partition
    before the tiny final groupby. Integer-cents revenue, bit-exact."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.keyed import cogroup_by_key

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.rename_columns(["partkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    part = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(
        lambda t: pa.table(
            {"partkey": t["p_partkey"].cast(pa.int64()), "p_brand": t["p_brand"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def join_lp(lpart: pa.Table, ppart: pa.Table) -> pa.Table:
        empty = pa.table(
            {"p_brand": pa.array([], pa.string()),
             "p_n": pa.array([], pa.int64()),
             "p_rev": pa.array([], pa.int64())}
        )
        if lpart.num_rows == 0 or ppart.num_rows == 0:
            return empty
        idx = pc.index_in(
            lpart["partkey"], value_set=ppart["partkey"].combine_chunks()
        ).combine_chunks()
        brand = ppart["p_brand"].combine_chunks().take(idx)
        keep = pc.is_valid(brand)
        if not pc.any(keep).as_py():
            return empty
        keep_np = np.asarray(keep)
        price = np.asarray(lpart["l_extendedprice"].combine_chunks())[keep_np]
        disc = np.asarray(lpart["l_discount"].combine_chunks())[keep_np]
        rev = round_half_away(price * 100).astype(np.int64) * (
            100 - round_half_away(disc * 100).astype(np.int64)
        )
        inv, uniq = pd.factorize(
            np.asarray(brand.filter(keep).cast(pa.large_string()))
        )
        n = np.bincount(inv).astype(np.int64)
        rsum = np.zeros(len(uniq), np.int64)
        np.add.at(rsum, inv, rev)
        return pa.table(
            {"p_brand": pa.array(uniq, pa.string()),
             "p_n": pa.array(n),
             "p_rev": pa.array(rsum)}
        )

    partials = cogroup_by_key(li, part, "partkey", join_lp, num_parts=NUM_PARTS)
    out = partials.groupby("p_brand").aggregate(
        Sum("p_n", alias_name="n_items"), Sum("p_rev", alias_name="revenue_c100")
    )
    return out.map_batches(
        lambda t: pa.table(
            {"p_brand": t["p_brand"],
             "n_items": t["n_items"].cast(pa.int64()),
             "revenue_c100": t["revenue_c100"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


BRAND_REVENUE_SQL = """
SELECT p_brand,
       count(*)::BIGINT AS n_items,
       CAST(sum(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue_c100
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


SKEW_HOT_THRESHOLD = 68  # per-user event counts are ~49-88 at every sf,
# so this fixed cut routes roughly half the keys down EACH path — the
# query exercises broadcast + shuffle + union in one oracle-checked run.


def q_skew_join(sf_dir: str):
    """Skew-aware events x customer join: heavy-hitter users broadcast,
    the cold tail co-partition-shuffled (stages/skewjoin.py). Identical
    inner-join semantics to a single-path join for any hot/cold split,
    so the SQL oracle is the plain join."""
    from ..sources.reads import read_parquet_sized
    from ..stages.skewjoin import skew_aware_join

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    )
    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).map_batches(
        lambda t: t.rename_columns(["user_id", "c_name", "c_mktsegment"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("c_name", pa.string()),
            ("c_mktsegment", pa.string()),
        ]
    )

    def join(lp: pa.Table, rp: pa.Table) -> pa.Table:
        if lp.num_rows == 0 or rp.num_rows == 0:
            return schema.empty_table()
        rk = np.asarray(rp["user_id"].combine_chunks())
        order = np.argsort(rk)
        rk_s = rk[order]
        lk = np.asarray(lp["user_id"].combine_chunks())
        pos = np.minimum(np.searchsorted(rk_s, lk), len(rk_s) - 1)
        hit = rk_s[pos] == lk
        out = lp.select(["event_id", "user_id", "event_type", "value"]).take(
            pa.array(np.flatnonzero(hit))
        )
        sel_r = pa.array(order[pos[hit]])
        for c in ("c_name", "c_mktsegment"):
            out = out.append_column(c, rp[c].combine_chunks().take(sel_r))
        return out.cast(schema)

    return skew_aware_join(
        events,
        cust,
        "user_id",
        join,
        num_parts=32,
        hot_threshold=SKEW_HOT_THRESHOLD,
    )


SKEW_JOIN_SQL = """
SELECT e.event_id, e.user_id, e.event_type, e.value,
       c.c_name, c.c_mktsegment
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
"""


JOIN_MULTIWAY_SQL = f"""
SELECT n_name,
       count(*)::BIGINT AS n_items,
       CAST(sum(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue_c100
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{MULTIWAY_REGION}'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Band join: equi-key + value-band hybrid (|Δvalue| <= band within key)
# --------------------------------------------------------------------------

BAND_CENTS = 500  # |purchase - click| <= $5.00, in integer cents


def q_events_band_join(sf_dir: str):
    """Band join: for every purchase, the number of SAME-USER clicks
    whose value lies within ±$5 — the equi-key + inequality-band hybrid
    (big-big, no broadcast) that neither a pure equi-join nor the
    interval ``range_join`` covers.

    Plan: ONE keyed exchange on ``user_id`` co-locates both sides (they
    share one pruned read); per partition, clicks sort once by
    (user, cents) and collapse to a composite integer axis
    ``code * stride + (cents - cmin + band)`` whose per-user blocks
    cannot overlap (stride = span + 2·band + 1, overflow-guarded), so
    every purchase's band count is two global ``searchsorted`` probes —
    no per-user loop, no pair materialization. Band arithmetic is exact
    integer cents on both sides."""
    import pyarrow.dataset as pads

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
        filter=(pads.field("event_type") == "purchase")
        | (pads.field("event_type") == "click"),
    )

    def band_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "n_close": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        typ = np.asarray(
            pc.equal(t["event_type"].combine_chunks(), "purchase")
        )
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks()) * 100.0
        ).astype(np.int64)
        import pandas as pd

        code, _uniq = pd.factorize(uid, sort=False)
        code = code.astype(np.int64)
        is_p = typ
        is_c = ~typ
        if not is_p.any():
            return empty
        cmin = int(cents.min())
        span = int(cents.max()) - cmin
        stride = span + 2 * BAND_CENTS + 1
        n_codes = int(code.max()) + 1
        if n_codes * stride >= 2**63:
            raise OverflowError(
                "events_band_join: composite axis would overflow int64"
            )
        ckey = np.sort(
            code[is_c] * stride + (cents[is_c] - cmin + BAND_CENTS)
        )
        base = code[is_p] * stride + (cents[is_p] - cmin)
        lo = np.searchsorted(ckey, base, side="left")
        hi = np.searchsorted(ckey, base + 2 * BAND_CENTS, side="right")
        return pa.table(
            {
                "event_id": pa.array(eid[is_p], pa.int64()),
                "user_id": pa.array(uid[is_p], pa.int64()),
                "n_close": pa.array((hi - lo).astype(np.int64)),
            }
        )

    return map_partitions_by_key(ds, "user_id", band_part, num_parts=NUM_PARTS)


EVENTS_BAND_JOIN_SQL = f"""
WITH p AS (
    SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS pc
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cc
    FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, count(c.cc)::BIGINT AS n_close
FROM p LEFT JOIN c
  ON c.user_id = p.user_id AND ABS(p.pc - c.cc) <= {BAND_CENTS}
GROUP BY 1, 2
"""


REGISTRY: dict[str, tuple] = {
    "events_band_join": (q_events_band_join, EVENTS_BAND_JOIN_SQL),
    "join_shuffle": (q_join_shuffle, JOIN_SHUFFLE_SQL),
    "join_multiway": (q_join_multiway, JOIN_MULTIWAY_SQL),
    "skew_join": (q_skew_join, SKEW_JOIN_SQL),
    "brand_revenue": (q_brand_revenue, BRAND_REVENUE_SQL),
    "events_union": (q_events_union, EVENTS_UNION_SQL),
    "events_distinct_users": (q_events_distinct_users, EVENTS_DISTINCT_SQL),
    "events_windowed": (q_events_windowed, EVENTS_WINDOWED_SQL),
    "events_hopping": (q_events_hopping, EVENTS_HOPPING_SQL),
    "asof_join": (q_asof_join, ASOF_SQL),
    "asof_join_partitioned": (q_asof_join_partitioned, ASOF_PARTITIONED_SQL),
    "asof_join_tolerance": (q_asof_join_tolerance, ASOF_TOLERANCE_SQL),
    "online_latest": (q_online_latest, ONLINE_LATEST_SQL),
    "train_split": (q_train_split, TRAIN_SPLIT_SQL),
    "train_kfold": (q_train_kfold, TRAIN_KFOLD_SQL),
    "agg_pushdown": (q_agg_pushdown, AGG_PUSHDOWN_SQL),
    "broadcast_join": (q_broadcast_join, BROADCAST_JOIN_SQL),
    "topk": (q_topk, TOPK_SQL),
}

"""Classic ML feature-engineering transforms over the lake: per-group
z-score standardization, global min-max scaling, smoothed target
encoding, per-entity rank features, and lexicon-based PII-style
redaction. Every operator has an exact DuckDB twin (bit-exact doubles:
integer-exact sums + identical IEEE op order on both sides).

Reference parity: these are the feature-materialization transforms the
reference computes in its gold job before feature-store ingestion
(/root/reference/spark_jobs/silver_and_gold.py:86-131 — casts, derived
numeric features, per-entity aggregates); redaction mirrors its silver
validity/cleaning stage (silver_and_gold.py:47-61).

Scale shapes:

- ``features_zscore``: combiner pattern — per-batch ``group_by(lang)``
  partials (int64-exact sum / sum-of-squares / count), a tiny final
  groupby over O(batches x langs) partial rows, then a zero-shuffle
  streamed map with the O(langs) stats captured in the closure. The
  exchange never moves document rows.
- ``features_minmax``: two-pass broadcast scaling — distributed min/max
  (selection, so bit-exact), two scalars into a streamed map.
- ``features_target_encode``: co-partitioned orders x customer join via
  ONE shuffle (``cogroup_by_key``), per-partition vectorized
  ``index_in`` probe, per-segment partials, tiny final combine; the
  encoded map is O(segments) and rides the closure into a streamed map
  over ``customer``. No side is broadcast whole.
- ``features_rank``: one keyed exchange on the high-cardinality
  ``o_custkey``; ranking is a segmented ``lexsort`` per whole hash
  partition — no per-group Python calls.
- ``docs_pii_redact``: zero shuffles; RE2 on both sides (pyarrow and
  DuckDB both bind RE2, so replace/count semantics agree exactly).
- ``features_bucketize``: bounded-cardinality histogram partials (the
  docs_len_quantiles trick) -> driver-side boundary read-off ->
  zero-shuffle assignment map.
- ``features_onehot``: zero-shuffle indicator map over a fixed category
  lexicon.
- ``events_rollup``: O(types x days) partials; coarser ROLLUP grains
  derived from the finest on the driver, never re-scanned.
- ``join_semi`` / ``join_anti``: the one-shuffle cogroup with a
  vectorized ``is_in`` membership test per partition; neither side is
  broadcast.
- ``features_cumsum``: one keyed exchange; exact integer-cent segmented
  prefix sums (DuckDB window sums use a segment tree, so double adds
  are order-dependent — integer accumulation sidesteps that).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized
from ..stages.keyed import cogroup_by_key, map_partitions_by_key
from .queries_extra import NUM_PARTS, _docs
from ..functions.numeric import f64_order_key, round_half_away

# --------------------------------------------------------------------------
# Per-group z-score standardization (documents.n_chars by lang)
# --------------------------------------------------------------------------


def q_features_zscore(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        n = t["n_chars"].combine_chunks().cast(pa.int64())
        sq = pc.multiply_checked(n, n)
        g = (
            t.select(["lang"])
            .append_column("s", n)
            .append_column("ss", sq)
            .group_by(["lang"])
            .aggregate([("s", "sum"), ("ss", "sum"), ("s", "count")])
        )
        return g.rename_columns(["lang", "p_s", "p_ss", "p_c"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    stats = (
        partials.groupby("lang")
        .aggregate(
            Sum("p_s", alias_name="s"),
            Sum("p_ss", alias_name="ss"),
            Sum("p_c", alias_name="c"),
        )
        .take_all()
    )  # O(langs) rows — tiny by construction
    # identical IEEE op order as the SQL twin: mean = s/c,
    # var = ss/c - mean*mean, z = (x - mean)/sqrt(var)
    langs = [r["lang"] for r in stats]
    mean = np.array([float(r["s"]) / float(r["c"]) for r in stats])
    denom = np.sqrt(
        np.array([float(r["ss"]) / float(r["c"]) for r in stats]) - mean * mean
    )
    lang_set = pa.array(langs, pa.string())

    def zmap(t: pa.Table) -> pa.Table:
        codes = np.asarray(
            pc.index_in(t["lang"].combine_chunks(), value_set=lang_set)
        )
        x = np.asarray(t["n_chars"].combine_chunks().cast(pa.int64())).astype(
            np.float64
        )
        z = (x - mean[codes]) / denom[codes]
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "lang": t["lang"],
                "n_chars": t["n_chars"].cast(pa.int64()),
                "zscore": pa.array(z, pa.float64()),
            }
        )

    return ds.map_batches(zmap, batch_format="pyarrow", zero_copy_batch=True)


FEATURES_ZSCORE_SQL = """
WITH st AS (
    SELECT lang,
           CAST(SUM(n_chars) AS DOUBLE)           AS s,
           CAST(SUM(n_chars * n_chars) AS DOUBLE) AS ss,
           CAST(COUNT(*) AS DOUBLE)               AS c
    FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars,
       (CAST(d.n_chars AS DOUBLE) - s / c)
           / sqrt(ss / c - (s / c) * (s / c)) AS zscore
FROM documents d JOIN st USING (lang)
"""

# --------------------------------------------------------------------------
# Global min-max scaling (orders.o_totalprice)
# --------------------------------------------------------------------------


def q_features_minmax(sf_dir: str):
    from ray.data.aggregate import Max, Min

    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    agg = ds.aggregate(Min("o_totalprice"), Max("o_totalprice"))
    mn = float(agg["min(o_totalprice)"])
    mx = float(agg["max(o_totalprice)"])
    span = mx - mn

    def scale(t: pa.Table) -> pa.Table:
        x = np.asarray(t["o_totalprice"].combine_chunks())
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": t["o_totalprice"],
                "scaled": pa.array((x - mn) / span, pa.float64()),
            }
        )

    return ds.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)


FEATURES_MINMAX_SQL = """
WITH b AS (
    SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
)
SELECT o_orderkey, o_totalprice,
       (o_totalprice - mn) / (mx - mn) AS scaled
FROM orders CROSS JOIN b
"""

# --------------------------------------------------------------------------
# Smoothed target encoding (customer.c_mktsegment vs orders 'F' rate)
# --------------------------------------------------------------------------

TARGET_SMOOTH = 10.0  # pseudo-count pulled toward the global rate


def q_features_target_encode(sf_dir: str):
    from ray.data.aggregate import Sum

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"]
    ).map_batches(
        lambda t: t.rename_columns(["c_custkey", "o_orderstatus"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def join_part(opart: pa.Table, cpart: pa.Table) -> pa.Table:
        if opart.num_rows == 0 or cpart.num_rows == 0:
            return pa.table(
                {
                    "seg": pa.array([], pa.string()),
                    "p_cnt": pa.array([], pa.int64()),
                    "p_pos": pa.array([], pa.int64()),
                }
            )
        idx = pc.index_in(
            opart["c_custkey"].combine_chunks(),
            value_set=cpart["c_custkey"].combine_chunks(),
        )
        seg = pc.take(cpart["c_mktsegment"].combine_chunks(), idx)
        pos = pc.equal(opart["o_orderstatus"].combine_chunks(), "F").cast(pa.int64())
        g = (
            pa.table({"seg": seg, "p_pos": pos})
            .group_by(["seg"])
            .aggregate([("p_pos", "count"), ("p_pos", "sum")])
        )
        return g.rename_columns(["seg", "p_cnt", "p_pos"])

    partials = cogroup_by_key(
        orders, customer, "c_custkey", join_part, num_parts=NUM_PARTS
    )
    stats = (
        partials.groupby("seg")
        .aggregate(Sum("p_cnt", alias_name="cnt"), Sum("p_pos", alias_name="pos"))
        .take_all()
    )  # O(segments) rows
    tot_pos = float(sum(r["pos"] for r in stats))
    tot_cnt = float(sum(r["cnt"] for r in stats))
    g_rate = tot_pos / tot_cnt
    segs = [r["seg"] for r in stats]
    # identical IEEE op order as SQL: (pos + m*g) / (cnt + m)
    enc = np.array(
        [
            (float(r["pos"]) + TARGET_SMOOTH * g_rate)
            / (float(r["cnt"]) + TARGET_SMOOTH)
            for r in stats
        ]
    )
    seg_set = pa.array(segs, pa.string())

    def emit(t: pa.Table) -> pa.Table:
        codes = np.asarray(
            pc.index_in(t["c_mktsegment"].combine_chunks(), value_set=seg_set)
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"].cast(pa.int64()),
                "c_mktsegment": t["c_mktsegment"],
                "target_enc": pa.array(enc[codes], pa.float64()),
            }
        )

    return customer.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


FEATURES_TARGET_ENCODE_SQL = f"""
WITH j AS (
    SELECT c.c_mktsegment AS seg,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS pos
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
), tot AS (
    SELECT CAST(SUM(pos) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS g FROM j
)
SELECT c.c_custkey, c.c_mktsegment,
       (CAST(j.pos AS DOUBLE) + {TARGET_SMOOTH} * tot.g)
           / (CAST(j.cnt AS DOUBLE) + {TARGET_SMOOTH}) AS target_enc
FROM customer c JOIN j ON c.c_mktsegment = j.seg CROSS JOIN tot
"""

# --------------------------------------------------------------------------
# Per-entity rank feature (orders ranked by price within customer)
# --------------------------------------------------------------------------


def q_features_rank(sf_dir: str):
    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def rank_part(t: pa.Table) -> pa.Table:
        cust = np.asarray(t["o_custkey"].combine_chunks())
        key = np.asarray(t["o_orderkey"].combine_chunks())
        price = np.asarray(t["o_totalprice"].combine_chunks())
        order = np.lexsort((key, -price, cust))
        cs, ks, ps = cust[order], key[order], price[order]
        starts = np.flatnonzero(np.diff(cs)) + 1
        seg_start = np.zeros(len(cs), np.int64)
        seg_start[starts] = starts
        np.maximum.accumulate(seg_start, out=seg_start)
        rk = np.arange(len(cs), dtype=np.int64) - seg_start + 1
        return pa.table(
            {
                "o_orderkey": pa.array(ks),
                "o_custkey": pa.array(cs),
                "o_totalprice": pa.array(ps),
                "rk": pa.array(rk, pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "o_custkey", rank_part, num_parts=NUM_PARTS)


FEATURES_RANK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
       ) AS BIGINT) AS rk
FROM orders
"""

# --------------------------------------------------------------------------
# Quantile bucketization (feature discretization into per-group quartiles)
# --------------------------------------------------------------------------

BUCKET_PCTS = (25, 50, 75)


def q_features_bucketize(sf_dir: str):
    """Discretize ``n_chars`` into per-language quartile bins. Scale shape:
    per-batch (lang, value) -> count partials collapse the corpus to a
    histogram bounded by (languages x distinct lengths) regardless of
    corpus size; boundaries are read off the merged cdf (tiny, driver-side)
    and ride the closure into a zero-shuffle streamed assignment map.
    Matches DuckDB ``quantile_disc`` exactly (index ceil(q*n) - 1, integer
    arithmetic only)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["lang", "n_chars"])
            .group_by(["lang", "n_chars"])
            .aggregate([("n_chars", "count")])
        )
        return g.rename_columns(["lang", "n_chars", "p_cnt"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("p_cnt", alias_name="cnt"))
        .take_all()
    )  # bounded: languages x distinct lengths
    langs_h = np.array([r["lang"] for r in hist])
    vals_h = np.array([r["n_chars"] for r in hist], np.int64)
    cnts_h = np.array([r["cnt"] for r in hist], np.int64)
    uniq_langs, codes_h = np.unique(langs_h, return_inverse=True)
    order = np.lexsort((vals_h, codes_h))
    codes_h, vals_h, cnts_h = codes_h[order], vals_h[order], cnts_h[order]
    totals = np.bincount(codes_h, weights=cnts_h).astype(np.int64)
    bounds = np.empty((len(uniq_langs), len(BUCKET_PCTS)), np.int64)
    for li in range(len(uniq_langs)):  # O(languages) iterations
        sel = codes_h == li
        v, cdf = vals_h[sel], np.cumsum(cnts_h[sel])
        for j, p in enumerate(BUCKET_PCTS):
            idx = (p * totals[li] + 99) // 100 - 1  # ceil(q*n) - 1
            bounds[li, j] = v[np.searchsorted(cdf, idx + 1)]
    lang_set = pa.array(list(uniq_langs), pa.string())

    def assign(t: pa.Table) -> pa.Table:
        codes = np.asarray(
            pc.index_in(t["lang"].combine_chunks(), value_set=lang_set)
        )
        x = np.asarray(t["n_chars"].combine_chunks().cast(pa.int64()))
        b = bounds[codes]  # (rows, 3)
        bin_ = (x[:, None] > b).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "lang": t["lang"],
                "n_chars": t["n_chars"].cast(pa.int64()),
                "bin": pa.array(bin_, pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


FEATURES_BUCKETIZE_SQL = """
WITH b AS (
    SELECT lang,
           quantile_disc(n_chars, 0.25) AS q25,
           quantile_disc(n_chars, 0.50) AS q50,
           quantile_disc(n_chars, 0.75) AS q75
    FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars,
       CAST((CASE WHEN d.n_chars > q25 THEN 1 ELSE 0 END)
          + (CASE WHEN d.n_chars > q50 THEN 1 ELSE 0 END)
          + (CASE WHEN d.n_chars > q75 THEN 1 ELSE 0 END) AS BIGINT) AS bin
FROM documents d JOIN b USING (lang)
"""

# --------------------------------------------------------------------------
# One-hot encoding (fixed category lexicon, zero shuffles)
# --------------------------------------------------------------------------

# TPC-H's closed segment domain — one-hot needs a static column set, so the
# categories are config (the reference's feature groups likewise declare
# their schema up front, register_feature_groups.py)
ONEHOT_SEGMENTS = (
    "AUTOMOBILE",
    "BUILDING",
    "FURNITURE",
    "HOUSEHOLD",
    "MACHINERY",
)


def q_features_onehot(sf_dir: str):
    ds = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def encode(t: pa.Table) -> pa.Table:
        seg = t["c_mktsegment"].combine_chunks()
        cols = {"c_custkey": t["c_custkey"].cast(pa.int64())}
        for s in ONEHOT_SEGMENTS:
            cols[f"is_{s.lower()}"] = pc.equal(seg, s).cast(pa.int64())
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


FEATURES_ONEHOT_SQL = "SELECT c_custkey, " + ", ".join(
    f"CAST(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END AS BIGINT)"
    f" AS is_{s.lower()}"
    for s in ONEHOT_SEGMENTS
) + " FROM customer"

# --------------------------------------------------------------------------
# Multi-grain ROLLUP aggregate (events by type x day, type, grand total)
# --------------------------------------------------------------------------


def q_events_rollup(sf_dir: str):
    """ROLLUP(event_type, day) counts. Scale shape: per-batch partials
    collapse the stream to O(types x days) rows; ONE small groupby; the
    coarser grains are derived from the finest on the driver (tiny by
    construction) instead of re-scanning the stream per grain."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        d = pc.strftime(t["ts"].combine_chunks(), format="%Y-%m-%d")
        g = (
            pa.table({"event_type": t["event_type"], "d": d})
            .group_by(["event_type", "d"])
            .aggregate([("d", "count")])
        )
        return g.rename_columns(["event_type", "d", "p_n"])

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "d"])
        .aggregate(Sum("p_n", alias_name="n"))
        .take_all()
    )  # O(types x days)
    et = [r["event_type"] for r in fine]
    dd = [r["d"] for r in fine]
    nn = [int(r["n"]) for r in fine]
    # grain 2: per type; grain 3: grand total — derived, not re-scanned
    by_type: dict[str, int] = {}
    for e, n in zip(et, nn):
        by_type[e] = by_type.get(e, 0) + n
    rows_et = sorted(by_type)
    out = pa.table(
        {
            "event_type": pa.array(
                et + rows_et + [None], pa.string()
            ),
            "d": pa.array(dd + [None] * (len(rows_et) + 1), pa.string()),
            "n": pa.array(
                nn + [by_type[e] for e in rows_et] + [sum(nn)], pa.int64()
            ),
        }
    )
    return out


EVENTS_ROLLUP_SQL = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS d, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY ROLLUP (event_type, d)
"""


def q_events_cube(sf_dir: str):
    """CUBE(event_type, dow) counts — the full grouping-sets lattice
    (ROLLUP's sibling). Same scale shape as the rollup: the stream
    collapses to O(types x 7) finest-grain partials in ONE small
    groupby; the other three grains are derived from the finest on the
    driver (tiny by construction), never by re-scanning the stream."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        # ISO dow 1..7 to match DuckDB's isodow()
        dow = pc.add(
            pc.day_of_week(t["ts"].combine_chunks(), count_from_zero=True),
            pa.scalar(1, pa.int64()),
        ).cast(pa.int64())
        g = (
            pa.table({"event_type": t["event_type"], "dow": dow})
            .group_by(["event_type", "dow"])
            .aggregate([("dow", "count")])
        )
        return g.rename_columns(["event_type", "dow", "p_n"])

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "dow"])
        .aggregate(Sum("p_n", alias_name="n"))
        .take_all()
    )  # O(types x 7)
    et = [r["event_type"] for r in fine]
    dw = [int(r["dow"]) for r in fine]
    nn = [int(r["n"]) for r in fine]
    by_type: dict[str, int] = {}
    by_dow: dict[int, int] = {}
    for e, d, n in zip(et, dw, nn):
        by_type[e] = by_type.get(e, 0) + n
        by_dow[d] = by_dow.get(d, 0) + n
    rows_et = sorted(by_type)
    rows_dw = sorted(by_dow)
    return pa.table(
        {
            "event_type": pa.array(
                et + rows_et + [None] * (len(rows_dw) + 1), pa.string()
            ),
            "dow": pa.array(
                dw + [None] * len(rows_et) + rows_dw + [None], pa.int64()
            ),
            "n": pa.array(
                nn
                + [by_type[e] for e in rows_et]
                + [by_dow[d] for d in rows_dw]
                + [sum(nn)],
                pa.int64(),
            ),
        }
    )


EVENTS_CUBE_SQL = """
SELECT event_type, isodow(ts)::BIGINT AS dow, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY CUBE (event_type, dow)
"""

# --------------------------------------------------------------------------
# Lexicon-based PII-style redaction (RE2 on both sides)
# --------------------------------------------------------------------------

REDACT_PATTERN = r"\b(customer|key|value)\b"
REDACT_TOKEN = "[REDACTED]"


def q_docs_pii_redact(sf_dir: str):
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def redact(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        red = pc.replace_substring_regex(
            txt, pattern=REDACT_PATTERN, replacement=REDACT_TOKEN
        )
        n = pc.count_substring_regex(txt, pattern=REDACT_PATTERN).cast(pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "text_red": red,
                "n_redactions": n,
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


DOCS_PII_REDACT_SQL = f"""
SELECT doc_id,
       regexp_replace(text, '{REDACT_PATTERN}', '{REDACT_TOKEN}', 'g')
           AS text_red,
       CAST(len(regexp_extract_all(text, '{REDACT_PATTERN}')) AS BIGINT)
           AS n_redactions
FROM documents
"""


# --------------------------------------------------------------------------
# Semi / anti join (one co-partitioning exchange, vectorized membership)
# --------------------------------------------------------------------------

SEMI_BAL_MIN = 5000.0  # the dim-side predicate both joins share


def _orders_customer_membership(sf_dir: str, *, keep_members: bool):
    """orders SEMI/ANTI JOIN (customers with acctbal > threshold) via the
    engine's one-shuffle cogroup: both sides hash-partition on the key,
    membership is a vectorized ``is_in`` per partition — no broadcast,
    both sides stream. Column-pruned reads on both sides."""
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey", "o_totalprice"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )

    def part(opart: pa.Table, cpart: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
            }
        )
        if opart.num_rows == 0:
            return empty
        rich = cpart.filter(pc.greater(cpart["c_acctbal"], SEMI_BAL_MIN))
        member = pc.is_in(
            opart["c_custkey"].combine_chunks(),
            value_set=rich["c_custkey"].combine_chunks(),
        )
        kept = opart.filter(member if keep_members else pc.invert(member))
        return pa.table(
            {
                "o_orderkey": kept["o_orderkey"].cast(pa.int64()),
                "o_custkey": kept["c_custkey"].cast(pa.int64()),
                "o_totalprice": kept["o_totalprice"],
            }
        )

    return cogroup_by_key(orders, customer, "c_custkey", part, num_parts=NUM_PARTS)


def q_join_semi(sf_dir: str):
    return _orders_customer_membership(sf_dir, keep_members=True)


def q_join_anti(sf_dir: str):
    return _orders_customer_membership(sf_dir, keep_members=False)


JOIN_SEMI_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_acctbal > {SEMI_BAL_MIN})
"""

JOIN_ANTI_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE NOT EXISTS (SELECT 1 FROM customer
                  WHERE c_custkey = o_custkey AND c_acctbal > {SEMI_BAL_MIN})
"""

# --------------------------------------------------------------------------
# Running total per entity (cumulative window aggregate)
# --------------------------------------------------------------------------


def q_features_cumsum(sf_dir: str):
    """Running order total per customer: one keyed exchange, segmented
    prefix sums per partition. Accumulation happens in exact integer
    cents on BOTH sides (DuckDB evaluates window sums with a segment
    tree, so double addition order differs from a sequential scan —
    integer sums are order-independent), then one identical division."""
    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def run_part(t: pa.Table) -> pa.Table:
        cust = np.asarray(t["o_custkey"].combine_chunks())
        key = np.asarray(t["o_orderkey"].combine_chunks())
        dt = np.asarray(t["o_orderdate"].combine_chunks().cast(pa.int64()))
        price = np.asarray(t["o_totalprice"].combine_chunks())
        order = np.lexsort((key, dt, cust))
        cs, ks, ps = cust[order], key[order], price[order]
        n = len(cs)
        starts = np.flatnonzero(np.diff(cs)) + 1
        # exact integer-cent prefix sums, restarted per customer via the
        # (exact, integer) subtract-segment-prefix trick
        cents = round_half_away(ps * 100.0).astype(np.int64)
        csum = np.cumsum(cents)
        seg_start = np.concatenate(([0], starts))
        lens = np.diff(np.concatenate((seg_start, [n])))
        seg_prefix = np.concatenate(([0], csum[starts - 1])) if n else cents
        prefix = np.repeat(seg_prefix, lens)  # sign-safe (no monotonicity)
        run = (csum - prefix) / 100.0
        return pa.table(
            {
                "o_orderkey": pa.array(ks),
                "o_custkey": pa.array(cs),
                "o_totalprice": pa.array(ps),
                "running_total": pa.array(run, pa.float64()),
            }
        )

    return map_partitions_by_key(ds, "o_custkey", run_part, num_parts=NUM_PARTS)


FEATURES_CUMSUM_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING
       ) / 100.0 AS running_total
FROM orders
"""


# --------------------------------------------------------------------------
# Per-group exact quantiles (median / p90 spend per customer)
# --------------------------------------------------------------------------


def q_features_group_median(sf_dir: str):
    """Exact per-customer median and p90 of order totals: one keyed
    exchange on the high-cardinality ``o_custkey``, then a segmented
    sort per whole hash partition with per-segment discrete-quantile
    picks (index ``ceil(q*n) - 1`` — DuckDB ``quantile_disc`` parity,
    integer arithmetic only; selection, not interpolation, so doubles
    pass through bit-exact)."""
    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def med_part(t: pa.Table) -> pa.Table:
        cust = np.asarray(t["o_custkey"].combine_chunks())
        price = np.asarray(t["o_totalprice"].combine_chunks())
        order = np.lexsort((price, cust))
        cs, ps = cust[order], price[order]
        n = len(cs)
        if n == 0:
            return pa.table(
                {
                    "o_custkey": pa.array([], pa.int64()),
                    "med_price": pa.array([], pa.float64()),
                    "p90_price": pa.array([], pa.float64()),
                }
            )
        starts = np.concatenate(([0], np.flatnonzero(np.diff(cs)) + 1))
        lens = np.diff(np.concatenate((starts, [n])))
        med = ps[starts - 1 + np.ceil(lens * 0.5).astype(np.int64)]
        p90 = ps[starts - 1 + np.ceil(lens * 0.9).astype(np.int64)]
        return pa.table(
            {
                "o_custkey": pa.array(cs[starts]),
                "med_price": pa.array(med, pa.float64()),
                "p90_price": pa.array(p90, pa.float64()),
            }
        )

    return map_partitions_by_key(ds, "o_custkey", med_part, num_parts=NUM_PARTS)


FEATURES_GROUP_MEDIAN_SQL = """
SELECT o_custkey,
       quantile_disc(o_totalprice, 0.5) AS med_price,
       quantile_disc(o_totalprice, 0.9) AS p90_price
FROM orders GROUP BY o_custkey
"""


def q_features_pct_rank(sf_dir: str):
    """Exact GLOBAL percent-rank (ECDF) scaler over a continuous
    feature — maps every order's total price to ``(min_rank − 1) /
    (N − 1)`` with SQL ``percent_rank()`` tie semantics (equal values
    share the rank of their first row).

    Fully distributed shape, never a row-level global sort: per-batch
    distinct-value partials → one keyed fold to the (value, count)
    table → weighted :func:`with_global_rank` over DISTINCT values only
    (the block-offset scan advances by counts, giving each value the
    exact min rank of the underlying row population) → one cogroup
    exchange attaching ranks back to rows. The all-to-all moves only
    distinct values; rows move once by value key. Division happens once
    on exact-in-double integers, so the result is bit-equal to
    ``percent_rank()``.

    Values are keyed by :func:`f64_order_key` — an order-preserving
    int64 bijection of the RAW double (not a quantization), so ties are
    exactly double equality, matching the SQL window's ORDER BY."""
    from ..stages.globalorder import with_global_rank
    from ..stages.keyed import cogroup_by_key, fold_by_keys

    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    n_rows = ds.count()  # parquet metadata

    def key_tag(t: pa.Table) -> pa.Table:
        k = f64_order_key(np.asarray(t["o_totalprice"].combine_chunks()))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": t["o_totalprice"],
                "vkey": pa.array(k),
            }
        )

    rows = ds.map_batches(
        key_tag, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed by two lineages below: read/tag once

    def distinct_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(np.asarray(t["vkey"].combine_chunks()), return_counts=True)
        return pa.table({"vkey": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    partials = rows.select_columns(["vkey"]).map_batches(
        distinct_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    distinct = fold_by_keys(partials, ["vkey"], sums=("cnt",), num_parts=NUM_PARTS)
    ranked = with_global_rank(
        distinct, ["vkey"], descending=[False], rank_col="minrank",
        weight_col="cnt",
    ).select_columns(["vkey", "minrank"])

    def attach(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_totalprice": pa.array([], pa.float64()),
                    "pct_rank": pa.array([], pa.float64()),
                }
            )
        rc = np.asarray(right["vkey"].combine_chunks())
        rr = np.asarray(right["minrank"].combine_chunks())
        o = np.argsort(rc, kind="mergesort")
        rc, rr = rc[o], rr[o]
        lc = np.asarray(left["vkey"].combine_chunks())
        pos = np.searchsorted(rc, lc)
        # percent_rank() of a single-row input is defined as 0.0
        pct = (rr[pos] - 1) / max(n_rows - 1, 1)
        return pa.table(
            {
                "o_orderkey": left["o_orderkey"],
                "o_totalprice": left["o_totalprice"],
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    return cogroup_by_key(rows, ranked, "vkey", attach, num_parts=NUM_PARTS)


FEATURES_PCT_RANK_SQL = """
SELECT o_orderkey, o_totalprice,
       percent_rank() OVER (ORDER BY o_totalprice) AS pct_rank
FROM orders
"""


ANOMALY_K = 3.0


def q_events_anomaly_mad(sf_dir: str):
    """Per-user ROBUST outlier flag: ``|value - median_u| > K ·
    MAD_u`` — the median/MAD detector that, unlike z-scores, is immune
    to the outliers it is hunting. Both medians are discrete
    (selection, ``quantile_disc`` parity: index ``ceil(0.5·n) − 1``),
    so doubles pass through bit-exact with no interpolation arithmetic.

    Scale shape: ONE exchange on ``user_id``; per whole hash partition
    two segmented lexsorts (value, then deviation) and pure
    gather/repeat — O(n log n) vectorized, no per-group Python, output
    streamed back at input cardinality."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "is_outlier": pa.array([], pa.int32()),
                }
            )
        u = np.asarray(t["user_id"].combine_chunks())
        eid = np.asarray(t["event_id"].combine_chunks())
        v = np.asarray(t["value"].combine_chunks())
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(us)) + 1))
        lens = np.diff(np.concatenate((starts, [len(us)])))
        pick = starts - 1 + np.ceil(lens * 0.5).astype(np.int64)
        dev = np.abs(vs - np.repeat(vs[pick], lens))
        order2 = np.lexsort((dev, us))  # re-sort deviations per segment
        mad = dev[order2][pick]
        flag = dev > ANOMALY_K * np.repeat(mad, lens)
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": pa.array(us),
                "is_outlier": pa.array(flag.astype(np.int32)),
            }
        )

    return map_partitions_by_key(ds, "user_id", part, num_parts=NUM_PARTS)


EVENTS_ANOMALY_MAD_SQL = f"""
WITH d AS (
  SELECT event_id, user_id,
         abs(value - quantile_disc(value, 0.5)
                     OVER (PARTITION BY user_id)) AS dev
  FROM events
),
f AS (
  SELECT event_id, user_id, dev,
         quantile_disc(dev, 0.5) OVER (PARTITION BY user_id) AS mad
  FROM d
)
SELECT event_id, user_id,
       CAST(dev > {ANOMALY_K} * mad AS INTEGER) AS is_outlier
FROM f
"""


def q_features_robust_scale(sf_dir: str):
    """Median/MAD robust scaling per customer — the outlier-immune
    z-score ((x - median) / MAD): the scaling-family member z-score and
    min-max can't provide when heavy tails corrupt mean and variance.

    ONE keyed exchange; per whole hash partition BOTH statistics come
    from two segmented sorts (values, then absolute deviations) with
    discrete-quantile picks (``ceil(q*n) - 1`` — DuckDB ``quantile_disc``
    parity: selection not interpolation, so every double that enters the
    final (x - med) / mad is byte-identical on both sides; groups whose
    MAD is 0 yield NULL)."""
    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def part_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_custkey": pa.array([], pa.int64()),
                    "robust": pa.array([], pa.float64()),
                }
            )
        cust = np.asarray(t["o_custkey"].combine_chunks())
        okey = np.asarray(t["o_orderkey"].combine_chunks())
        price = np.asarray(t["o_totalprice"].combine_chunks())
        order = np.lexsort((price, cust))
        cs, ps = cust[order], price[order]
        n = len(cs)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(cs)) + 1))
        lens = np.diff(np.concatenate((starts, [n])))
        seg_id = np.repeat(np.arange(len(starts)), lens)
        med = ps[starts - 1 + np.ceil(lens * 0.5).astype(np.int64)]
        dev = np.abs(ps - med[seg_id])
        # second segmented sort, of deviations within the same segments
        order2 = np.lexsort((dev, cs))
        mad = dev[order2][starts - 1 + np.ceil(lens * 0.5).astype(np.int64)]
        mad_row, med_row = mad[seg_id], med[seg_id]
        ok = mad_row > 0
        robust = np.where(ok, (ps - med_row) / np.where(ok, mad_row, 1.0), 0.0)
        return pa.table(
            {
                "o_orderkey": pa.array(okey[order], pa.int64()),
                "o_custkey": pa.array(cs, pa.int64()),
                "robust": pa.array(robust, pa.float64(), mask=~ok),
            }
        )

    return map_partitions_by_key(ds, "o_custkey", part_fn, num_parts=NUM_PARTS)


FEATURES_ROBUST_SCALE_SQL = """
WITH med AS (
    SELECT o_custkey, quantile_disc(o_totalprice, 0.5) AS med_price
    FROM orders GROUP BY 1
), mad AS (
    SELECT o.o_custkey,
           quantile_disc(abs(o.o_totalprice - m.med_price), 0.5) AS mad_price
    FROM orders o JOIN med m USING (o_custkey) GROUP BY 1
)
SELECT o.o_orderkey, o.o_custkey,
       CASE WHEN d.mad_price > 0
            THEN (o.o_totalprice - m.med_price) / d.mad_price END AS robust
FROM orders o
JOIN med m USING (o_custkey)
JOIN mad d USING (o_custkey)
"""

# --------------------------------------------------------------------------
# Exact Pearson correlation per group (feature-selection screen)
# --------------------------------------------------------------------------


def q_features_corr(sf_dir: str):
    """Pearson corr(l_quantity, l_extendedprice) per l_returnflag.

    Combiner shape: each batch collapses to O(flags) integer-cent
    moment partials (n, sx, sy, sxx, syy, sxy — int64-safe per batch);
    the driver folds the tiny partial stream in arbitrary-precision
    Python ints (exact at any scale, no int64 overflow across batches)
    and both sides then run the IDENTICAL double formula over the exact
    sums — DuckDB's own ``corr()`` streaming kernel is NOT mirrored,
    the HUGEINT-sum formula is."""
    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        x = round_half_away(
            np.asarray(t["l_quantity"].combine_chunks()) * 100.0
        ).astype(np.int64)
        y = round_half_away(
            np.asarray(t["l_extendedprice"].combine_chunks()) * 100.0
        ).astype(np.int64)
        g = pa.table(
            {
                "f": t["l_returnflag"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            }
        )
        return g.group_by(["f"]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
        )

    rows = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # O(batches x flags) tiny partial rows
    acc: dict[str, list[int]] = {}
    for r in rows:
        a = acc.setdefault(r["f"], [0] * 6)
        for i, c in enumerate(("n", "sx", "sy", "sxx", "syy", "sxy")):
            a[i] += int(r[f"{c}_sum"])  # Python ints: exact, unbounded
    out_f, out_c, out_n = [], [], []
    for f in sorted(acc):
        n, sx, sy, sxx, syy, sxy = acc[f]
        cov = float(n * sxy - sx * sy)
        vx = float(n * sxx - sx * sx)
        vy = float(n * syy - sy * sy)
        out_f.append(f)
        out_c.append(cov / (np.sqrt(vx) * np.sqrt(vy)))
        out_n.append(n)
    return pa.table(
        {
            "l_returnflag": pa.array(out_f, pa.string()),
            "corr_qty_price": pa.array(out_c, pa.float64()),
            "n_rows": pa.array(out_n, pa.int64()),
        }
    )


FEATURES_CORR_SQL = """
WITH m AS (
    SELECT l_returnflag,
           COUNT(*)::HUGEINT AS n,
           SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)) AS sx,
           SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sy,
           SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)
               * CAST(ROUND(l_quantity * 100) AS HUGEINT)) AS sxx,
           SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
               * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS syy,
           SUM(CAST(ROUND(l_quantity * 100) AS HUGEINT)
               * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sxy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price,
       CAST(n AS BIGINT) AS n_rows
FROM m
"""

# --------------------------------------------------------------------------
# Left outer join (null-preserving enrich)
# --------------------------------------------------------------------------


def q_join_left_outer(sf_dir: str):
    """orders LEFT JOIN the rich-customer slice: same one-shuffle
    cogroup as semi/anti, probe via ``index_in`` whose null indices
    become null ``c_acctbal`` via Arrow ``take`` — unmatched left rows
    survive with nulls, no side broadcast."""
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )

    def part(opart: pa.Table, cpart: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "c_acctbal": pa.array([], pa.float64()),
            }
        )
        if opart.num_rows == 0:
            return empty
        rich = cpart.filter(pc.greater(cpart["c_acctbal"], SEMI_BAL_MIN))
        idx = pc.index_in(
            opart["c_custkey"].combine_chunks(),
            value_set=rich["c_custkey"].combine_chunks(),
        )
        bal = rich["c_acctbal"].combine_chunks().take(idx)  # null idx -> null
        return pa.table(
            {
                "o_orderkey": opart["o_orderkey"].cast(pa.int64()),
                "o_custkey": opart["c_custkey"].cast(pa.int64()),
                "c_acctbal": bal,
            }
        )

    return cogroup_by_key(orders, customer, "c_custkey", part, num_parts=NUM_PARTS)


JOIN_LEFT_OUTER_SQL = f"""
SELECT o_orderkey, o_custkey, c.c_acctbal
FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > {SEMI_BAL_MIN}) c
     ON c.c_custkey = o_custkey
"""

# --------------------------------------------------------------------------
# Full outer join (both-sides null-preserving)
# --------------------------------------------------------------------------


def q_join_full_outer(sf_dir: str):
    """orders FULL OUTER JOIN the rich-customer slice. Same one-shuffle
    cogroup plan as the left-outer variant; because the hash exchange
    routes every occurrence of a key to exactly one partition, the
    per-partition "rich customers never probed by any order" set is the
    globally correct right-side remainder — appended with null
    ``o_orderkey``, no second pass and no broadcast."""
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )

    def part(opart: pa.Table, cpart: pa.Table) -> pa.Table:
        rich = cpart.filter(pc.greater(cpart["c_acctbal"], SEMI_BAL_MIN))
        rich_keys = rich["c_custkey"].combine_chunks().cast(pa.int64())
        okeys = opart["c_custkey"].combine_chunks().cast(pa.int64())
        idx = pc.index_in(okeys, value_set=rich_keys)
        bal = rich["c_acctbal"].combine_chunks().take(idx)  # null idx -> null
        left = pa.table(
            {
                "o_orderkey": opart["o_orderkey"].cast(pa.int64()),
                "cust_key": okeys,
                "c_acctbal": bal,
            }
        )
        # right remainder: rich customers not hit by any order in this part
        probed = pc.is_in(rich_keys, value_set=okeys)
        lonely = rich.filter(pc.invert(probed))
        n = lonely.num_rows
        right = pa.table(
            {
                "o_orderkey": pa.array([None] * n, pa.int64()),
                "cust_key": lonely["c_custkey"].cast(pa.int64()),
                "c_acctbal": lonely["c_acctbal"].cast(pa.float64()),
            }
        )
        return pa.concat_tables([left, right])

    return cogroup_by_key(orders, customer, "c_custkey", part, num_parts=NUM_PARTS)


JOIN_FULL_OUTER_SQL = f"""
SELECT o_orderkey, COALESCE(o_custkey, c.c_custkey) AS cust_key, c.c_acctbal
FROM orders FULL JOIN (SELECT * FROM customer WHERE c_acctbal > {SEMI_BAL_MIN}) c
     ON c.c_custkey = o_custkey
"""

# --------------------------------------------------------------------------
# Feature hashing (hashing trick over crossed categoricals)
# --------------------------------------------------------------------------

HASH_BUCKETS = 64


def q_features_hashed(sf_dir: str):
    """Hashing-trick bucketing of the crossed (priority x status)
    categorical: bucket = md5-lower-64 of the crossed string mod 64
    (DuckDB ``md5_number_lower`` parity). md5 runs once per DISTINCT
    cross per batch via dictionary encoding — the Python loop touches
    the ~15-value vocabulary, never the row stream — then O(buckets)
    count/sum partials and one tiny keyed combine."""
    import hashlib

    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        crossed = pc.binary_join_element_wise(
            t["o_orderpriority"].combine_chunks(),
            t["o_orderstatus"].combine_chunks(),
            "|",
        )
        enc = pc.dictionary_encode(crossed)
        dic = enc.dictionary.to_pylist()
        bk = np.empty(len(dic), np.int64)
        for i, s in enumerate(dic):
            h = int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
            bk[i] = h % HASH_BUCKETS
        bucket = bk[np.asarray(enc.indices).astype(np.int64)]
        cents = round_half_away(
            np.asarray(t["o_totalprice"].combine_chunks()) * 100.0
        ).astype(np.int64)
        g = pa.table(
            {
                "bucket": pa.array(bucket),
                "p_n": pa.array(np.ones(len(bucket), np.int64)),
                "p_cents": pa.array(cents),
            }
        )
        return g.group_by(["bucket"]).aggregate([("p_n", "sum"), ("p_cents", "sum")])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby("bucket").aggregate(
        Sum("p_n_sum", alias_name="n_orders"),
        Sum("p_cents_sum", alias_name="cents"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": t["bucket"].cast(pa.int64()),
                "n_orders": t["n_orders"].cast(pa.int64()),
                "sum_price": pc.divide(t["cents"].cast(pa.float64()), 100.0),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


FEATURES_HASHED_SQL = f"""
SELECT CAST(md5_number_lower(o_orderpriority || '|' || o_orderstatus)
            % {HASH_BUCKETS} AS BIGINT) AS bucket,
       COUNT(*)::BIGINT AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_price
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
# Winsorization (outlier clamping at global p05/p95)
# --------------------------------------------------------------------------

WINSOR_LO_PCT, WINSOR_HI_PCT = 5, 95


def q_docs_winsorize(sf_dir: str):
    """Clamp document lengths to the global [p05, p95] band — the
    standard outlier-robust scaling step before length-based features.
    Same bounded-histogram shape as bucketize: per-batch value→count
    partials collapse the corpus to O(distinct lengths) rows, the two
    clamp bounds are read off the merged cdf (``ceil(q*n) - 1``, DuckDB
    ``quantile_disc`` parity, integer-only), and the clamp itself is a
    zero-shuffle streamed map."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["n_chars"]).group_by(["n_chars"]).aggregate(
            [("n_chars", "count")]
        )
        return g.rename_columns(["n_chars", "p_cnt"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_chars")
        .aggregate(Sum("p_cnt", alias_name="cnt"))
        .take_all()
    )  # bounded by distinct lengths
    vals = np.array([r["n_chars"] for r in hist], np.int64)
    cnts = np.array([r["cnt"] for r in hist], np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cdf = np.cumsum(cnts)
    n = int(cdf[-1])
    lo = int(vals[np.searchsorted(cdf, (WINSOR_LO_PCT * n + 99) // 100)])
    hi = int(vals[np.searchsorted(cdf, (WINSOR_HI_PCT * n + 99) // 100)])

    def clamp(t: pa.Table) -> pa.Table:
        x = np.asarray(t["n_chars"].combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_chars": t["n_chars"].cast(pa.int64()),
                "n_chars_winsor": pa.array(np.clip(x, lo, hi), pa.int64()),
            }
        )

    return ds.map_batches(clamp, batch_format="pyarrow", zero_copy_batch=True)


DOCS_WINSORIZE_SQL = f"""
WITH q AS (
    SELECT quantile_disc(n_chars, {WINSOR_LO_PCT / 100}) AS lo,
           quantile_disc(n_chars, {WINSOR_HI_PCT / 100}) AS hi
    FROM documents
)
SELECT doc_id, n_chars,
       LEAST(GREATEST(n_chars, lo), hi)::BIGINT AS n_chars_winsor
FROM documents, q
"""

# --------------------------------------------------------------------------
# Bloom-filter semi join (pre-shuffle pruning of the probe side)
# --------------------------------------------------------------------------

BLOOM_BITS = 1 << 20  # 128 KiB bitmap; ~2 bits/key at 500k build keys


def _bloom_positions(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    from ..stages.keyed import splitmix64

    h1 = splitmix64(keys.astype(np.uint64))
    h2 = splitmix64(h1)
    m = np.uint64(BLOOM_BITS)
    return (h1 % m).astype(np.int64), (h2 % m).astype(np.int64)


class _BloomProbe:
    """Actor-pool probe: fetch the OR-combined bitmap once per actor
    (``ray.put`` broadcast), test both hash bits per batch."""

    def __init__(self, bloom_ref):
        import ray

        self.bits = ray.get(bloom_ref)  # np.uint8[BLOOM_BITS/8]

    def __call__(self, t: pa.Table) -> pa.Table:
        k = np.asarray(t["c_custkey"].combine_chunks()).astype(np.int64)
        p1, p2 = _bloom_positions(k)
        hit = (
            (self.bits[p1 >> 3] >> (p1 & 7)) & (self.bits[p2 >> 3] >> (p2 & 7))
        ) & 1
        return t.filter(pa.array(hit.astype(bool)))


def q_join_semi_bloom(sf_dir: str):
    """Same result (and oracle) as ``join_semi``, executed with a Bloom
    pre-filter: the build side streams once into O(batches) 128 KiB
    bitmap partials that OR-fold on the driver, the merged bitmap is
    broadcast via ``ray.put`` (fetched once per actor, not per batch),
    and only probe rows passing BOTH hash bits enter the exact-verify
    cogroup — at a 100 TB probe : small build ratio the shuffle moves a
    few % of the rows instead of all of them. False positives are
    removed by the exact ``is_in`` in the cogroup, so output is exact."""
    import ray

    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )

    def build_partial(t: pa.Table) -> pa.Table:
        rich = t.filter(pc.greater(t["c_acctbal"], SEMI_BAL_MIN))
        bits = np.zeros(BLOOM_BITS // 8, np.uint8)
        k = np.asarray(rich["c_custkey"].combine_chunks()).astype(np.int64)
        if len(k):
            p1, p2 = _bloom_positions(k)
            for p in (p1, p2):
                np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    partials = customer.map_batches(
        build_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # O(batches) rows of 128 KiB each
    merged = np.zeros(BLOOM_BITS // 8, np.uint8)
    for r in partials:
        merged |= np.frombuffer(r["bits"], np.uint8)
    bloom_ref = ray.put(merged)

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey", "o_totalprice"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    candidates = orders.map_batches(
        _BloomProbe,
        fn_constructor_args=(bloom_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )

    def part(opart: pa.Table, cpart: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
            }
        )
        if opart.num_rows == 0:
            return empty
        rich = cpart.filter(pc.greater(cpart["c_acctbal"], SEMI_BAL_MIN))
        member = pc.is_in(
            opart["c_custkey"].combine_chunks(),
            value_set=rich["c_custkey"].combine_chunks(),
        )
        kept = opart.filter(member)
        return pa.table(
            {
                "o_orderkey": kept["o_orderkey"].cast(pa.int64()),
                "o_custkey": kept["c_custkey"].cast(pa.int64()),
                "o_totalprice": kept["o_totalprice"],
            }
        )

    return cogroup_by_key(
        candidates, customer, "c_custkey", part, num_parts=NUM_PARTS
    )


# --------------------------------------------------------------------------
# NTILE discretization (equal-frequency binning into k per-group tiles)
# --------------------------------------------------------------------------

NTILE_K = 4


def q_events_ntile(sf_dir: str):
    """``NTILE(4)`` of event values within each event type — the classic
    equal-frequency discretizer (quartile bins whose first ``n % k``
    tiles carry one extra row, exactly DuckDB/ANSI tile sizing).

    Plan: ONE keyed exchange on ``event_type`` co-locates each type's
    rows (same shape as ``features_rank``); inside each hash partition a
    single segmented ``lexsort`` by ``(value, event_id)`` orders every
    type at once, tile ids come from pure integer arithmetic on the
    within-segment position, and the output collapses to per-(type, tile)
    row counts + integer-cent value sums before leaving the partition —
    the final groupby moves O(types × k × partitions) partial rows, never
    data. Scale note: per-type total ordering inherently co-locates a
    type; for a handful of mega-types compose
    ``stages/globalorder.with_global_rank`` (range-partitioned sort +
    block-offset scan) per type instead of the hash exchange — the tile
    formula below is unchanged given (pos, n).
    """
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def ntile_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "tile": pa.array([], pa.int64()),
                "pn": pa.array([], pa.int64()),
                "pc": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        code = np.asarray(enc.indices).astype(np.int64)
        eid = np.asarray(t["event_id"].combine_chunks())
        val = np.asarray(t["value"].combine_chunks())
        from ..functions.windows import segment_bounds

        order = np.lexsort((eid, val, code))
        cs, vs = code[order], val[order]
        n = len(cs)
        starts, _ends, seg_len = segment_bounds(cs)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, seg_len)
        nseg = np.repeat(seg_len, seg_len)
        q, r = nseg // NTILE_K, nseg % NTILE_K
        big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
        tile = (
            np.where(
                pos < big,
                pos // (q + 1),
                r + (pos - big) // np.maximum(q, 1),
            )
            + 1
        )
        cents = round_half_away(vs * 100.0).astype(np.int64)
        # collapse to per-(type, tile) partials before leaving the task
        key = cs * (NTILE_K + 1) + tile
        uniq, inv = np.unique(key, return_inverse=True)
        pn = np.bincount(inv).astype(np.int64)
        pcents = np.zeros(len(uniq), np.int64)
        np.add.at(pcents, inv, cents)
        return pa.table(
            {
                "event_type": enc.dictionary.take(
                    pa.array(uniq // (NTILE_K + 1))
                ).cast(pa.string()),
                "tile": pa.array(uniq % (NTILE_K + 1), pa.int64()),
                "pn": pa.array(pn),
                "pc": pa.array(pcents),
            }
        )

    partials = map_partitions_by_key(ds, "event_type", ntile_part, num_parts=NUM_PARTS)
    out = partials.groupby(["event_type", "tile"]).aggregate(
        Sum("pn", alias_name="n_rows"), Sum("pc", alias_name="sum_cents")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "tile": t["tile"],
                "n_rows": t["n_rows"].cast(pa.int64()),
                "sum_cents": t["sum_cents"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


EVENTS_NTILE_SQL = f"""
WITH r AS (
    SELECT event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS cents,
           ntile({NTILE_K}) OVER (
               PARTITION BY event_type ORDER BY value, event_id
           ) AS tile
    FROM events
)
SELECT event_type, CAST(tile AS BIGINT) AS tile,
       count(*)::BIGINT AS n_rows, SUM(cents)::BIGINT AS sum_cents
FROM r GROUP BY 1, 2
"""


REGISTRY: dict[str, tuple] = {
    "events_ntile": (q_events_ntile, EVENTS_NTILE_SQL),
    "docs_winsorize": (q_docs_winsorize, DOCS_WINSORIZE_SQL),
    "join_semi_bloom": (q_join_semi_bloom, JOIN_SEMI_SQL),
    "features_group_median": (q_features_group_median, FEATURES_GROUP_MEDIAN_SQL),
    "events_anomaly_mad": (q_events_anomaly_mad, EVENTS_ANOMALY_MAD_SQL),
    "features_pct_rank": (q_features_pct_rank, FEATURES_PCT_RANK_SQL),
    "features_robust_scale": (q_features_robust_scale, FEATURES_ROBUST_SCALE_SQL),
    "features_corr": (q_features_corr, FEATURES_CORR_SQL),
    "join_left_outer": (q_join_left_outer, JOIN_LEFT_OUTER_SQL),
    "join_full_outer": (q_join_full_outer, JOIN_FULL_OUTER_SQL),
    "features_hashed": (q_features_hashed, FEATURES_HASHED_SQL),
    "join_semi": (q_join_semi, JOIN_SEMI_SQL),
    "join_anti": (q_join_anti, JOIN_ANTI_SQL),
    "features_cumsum": (q_features_cumsum, FEATURES_CUMSUM_SQL),
    "features_zscore": (q_features_zscore, FEATURES_ZSCORE_SQL),
    "features_minmax": (q_features_minmax, FEATURES_MINMAX_SQL),
    "features_target_encode": (
        q_features_target_encode,
        FEATURES_TARGET_ENCODE_SQL,
    ),
    "features_rank": (q_features_rank, FEATURES_RANK_SQL),
    "features_bucketize": (q_features_bucketize, FEATURES_BUCKETIZE_SQL),
    "features_onehot": (q_features_onehot, FEATURES_ONEHOT_SQL),
    "events_rollup": (q_events_rollup, EVENTS_ROLLUP_SQL),
    "events_cube": (q_events_cube, EVENTS_CUBE_SQL),
    "docs_pii_redact": (q_docs_pii_redact, DOCS_PII_REDACT_SQL),
}

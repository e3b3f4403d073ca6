"""Round-4 operator additions, batch 2 (oracle-exact, DuckDB twins).

- ``orders_local_supplier_revenue`` — TPC-H Q5: per-nation revenue where
  the customer and supplier share the nation, region+year filtered.
- ``nations_trade_volume``          — TPC-H Q7: shipping volume between
  two nations by order year.
- ``docs_tokenizer_fertility``      — per-language BPE-ish pieces per
  whitespace word (tokenizer-efficiency audit for multilingual mixes).
- ``docs_dedup_survivorship``       — exact-dedup survivors with the
  number of duplicates each absorbed (dedup yield accounting).
- ``events_watermark_lag``          — per-event lateness against the
  per-user running high watermark in arrival order (the B12 late-data
  profile as a first-class operator).

Both TPC-H joins share one snowflake chain of three co-partitioning
cogroups (lineitem⋈supplier on suppkey, ⋈orders on orderkey, ⋈customer
on custkey) with nation/region broadcast — the Q8 plan's shape
(queries_r2h.q_orders_market_share), folded to (cust_nation, supp_nation,
year) partials before one tiny final aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6
from ..sources.reads import read_parquet_sized
from ..stages.keyed import cogroup_by_key, map_partitions_by_key
from .queries_r2h import _nation_maps, _rev_c100, _seg_sum, _years

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# shared snowflake chain: (cust_nation, supp_nation, year, rev) partials
# ---------------------------------------------------------------------------

def _nation_pair_revenue(sf_dir: str):
    """lineitem⋈supplier⋈orders⋈customer folded to
    (c_nat, s_nat, o_year, rev_c100) partials — three keyed cogroups,
    each stage pre-folding before the next exchange; the final relation
    is at most 25 x 25 x #years rows per partition."""
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["l_orderkey"].cast(pa.int64()),
                "suppkey": t["l_suppkey"].cast(pa.int64()),
                "l_extendedprice": t["l_extendedprice"],
                "l_discount": t["l_discount"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    supp = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "suppkey": t["s_suppkey"].cast(pa.int64()),
                "s_nationkey": t["s_nationkey"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    s1 = {"orderkey": pa.int64(), "s_nat": pa.int64(), "rev": pa.int64()}

    def join_supp(lpart: pa.Table, spart: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], t) for n, t in s1.items()})
        if lpart.num_rows == 0 or spart.num_rows == 0:
            return empty
        idx = pc.index_in(
            lpart["suppkey"], value_set=spart["suppkey"].combine_chunks()
        ).combine_chunks()
        snat = spart["s_nationkey"].combine_chunks().take(idx)
        keep = pc.is_valid(snat)
        if not pc.any(keep).as_py():
            return empty
        kn = np.asarray(keep)
        rev = _rev_c100(
            np.asarray(lpart["l_extendedprice"].combine_chunks())[kn],
            np.asarray(lpart["l_discount"].combine_chunks())[kn],
        )
        okey = np.asarray(lpart["orderkey"].combine_chunks())[kn]
        snp = np.asarray(snat.filter(keep))
        (ok, sn), (rv,) = _seg_sum([okey, snp], [rev])
        return pa.table(
            {"orderkey": pa.array(ok), "s_nat": pa.array(sn),
             "rev": pa.array(rv)}
        )

    by_order = cogroup_by_key(li, supp, "suppkey", join_supp,
                              num_parts=NUM_PARTS)

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["o_orderkey"].cast(pa.int64()),
                "custkey": t["o_custkey"].cast(pa.int64()),
                "o_year": pa.array(
                    _years(np.asarray(t["o_orderdate"].combine_chunks())),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    s2 = {"custkey": pa.int64(), "s_nat": pa.int64(), "o_year": pa.int64(),
          "rev": pa.int64()}

    def join_orders(lpart: pa.Table, opart: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], t) for n, t in s2.items()})
        if lpart.num_rows == 0 or opart.num_rows == 0:
            return empty
        idx = pc.index_in(
            lpart["orderkey"], value_set=opart["orderkey"].combine_chunks()
        ).combine_chunks()
        keep = pc.is_valid(idx)
        if not pc.any(keep).as_py():
            return empty
        kn = np.asarray(keep)
        taken = np.asarray(idx.filter(keep))
        cust = np.asarray(opart["custkey"].combine_chunks())[taken]
        year = np.asarray(opart["o_year"].combine_chunks())[taken]
        snat = np.asarray(lpart["s_nat"].combine_chunks())[kn]
        rev = np.asarray(lpart["rev"].combine_chunks())[kn]
        (ck, sn, yr), (rv,) = _seg_sum([cust, snat, year], [rev])
        return pa.table(
            {"custkey": pa.array(ck), "s_nat": pa.array(sn),
             "o_year": pa.array(yr), "rev": pa.array(rv)}
        )

    by_cust = cogroup_by_key(by_order, orders, "orderkey", join_orders,
                             num_parts=NUM_PARTS)

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "custkey": t["c_custkey"].cast(pa.int64()),
                "c_nationkey": t["c_nationkey"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    s3 = {"c_nat": pa.int64(), "s_nat": pa.int64(), "o_year": pa.int64(),
          "rev": pa.int64()}

    def join_cust(lpart: pa.Table, cpart: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], t) for n, t in s3.items()})
        if lpart.num_rows == 0 or cpart.num_rows == 0:
            return empty
        idx = pc.index_in(
            lpart["custkey"], value_set=cpart["custkey"].combine_chunks()
        ).combine_chunks()
        cnat = cpart["c_nationkey"].combine_chunks().take(idx)
        keep = pc.is_valid(cnat)
        if not pc.any(keep).as_py():
            return empty
        kn = np.asarray(keep)
        cn = np.asarray(cnat.filter(keep))
        sn = np.asarray(lpart["s_nat"].combine_chunks())[kn]
        yr = np.asarray(lpart["o_year"].combine_chunks())[kn]
        rv = np.asarray(lpart["rev"].combine_chunks())[kn]
        (c_, s_, y_), (r_,) = _seg_sum([cn, sn, yr], [rv])
        return pa.table(
            {"c_nat": pa.array(c_), "s_nat": pa.array(s_),
             "o_year": pa.array(y_), "rev": pa.array(r_)}
        )

    return cogroup_by_key(by_cust, cust, "custkey", join_cust,
                          num_parts=NUM_PARTS)


Q5_REGION = "ASIA"
Q5_YEAR = 1996


def q_orders_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5: revenue by nation for {Q5_YEAR} orders whose customer
    AND supplier sit in the same {Q5_REGION} nation. Rides the shared
    snowflake chain; the last fold touches <= 25 rows."""
    from ray.data.aggregate import Sum

    nation_name, nation_region = _nation_maps(sf_dir)
    region_nations = {
        k for k, v in nation_region.items() if v == Q5_REGION
    }
    names = {k: nation_name[k] for k in nation_name}

    pairs = _nation_pair_revenue(sf_dir)

    def local(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"n_name": pa.array([], pa.string()),
             "rev": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        cn = np.asarray(t["c_nat"].combine_chunks())
        sn = np.asarray(t["s_nat"].combine_chunks())
        yr = np.asarray(t["o_year"].combine_chunks())
        rv = np.asarray(t["rev"].combine_chunks())
        keep = (cn == sn) & (yr == Q5_YEAR) & np.isin(
            cn, np.array(sorted(region_nations), dtype=np.int64)
        )
        if not keep.any():
            return empty
        (n_,), (r_,) = _seg_sum([cn[keep]], [rv[keep]])
        return pa.table(
            {
                "n_name": pa.array(
                    [names[int(k)] for k in n_], pa.string()
                ),
                "rev": pa.array(r_, pa.int64()),
            }
        )

    partials = pairs.map_batches(local, batch_format="pyarrow",
                                 zero_copy_batch=True)
    # final fold over a <= 25-row relation: driver-side (bounded), which
    # also keeps the schema concrete when the filter matches nothing
    # (Ray's groupby-aggregate loses the schema of an all-empty input)
    import ray
    import ray.data as rd

    tbls = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if tbls:
        import pandas as pd

        allp = pa.concat_tables(tbls, promote_options="default")
        names_ = np.asarray(allp["n_name"].combine_chunks(), dtype=object)
        rev = np.asarray(allp["rev"].combine_chunks())
        inv, uniq = pd.factorize(names_)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, rev)
        final = pa.table(
            {"n_name": pa.array(uniq.astype(str), pa.string()),
             "revenue": pa.array(sums.astype(np.float64) / 10000.0,
                                  pa.float64())}
        )
    else:
        final = pa.table(
            {"n_name": pa.array([], pa.string()),
             "revenue": pa.array([], pa.float64())}
        )
    return rd.from_arrow(final)


ORDERS_LOCAL_SUPPLIER_SQL = f"""
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE s.s_nationkey = c.c_nationkey
  AND r.r_name = '{Q5_REGION}'
  AND EXTRACT(year FROM o.o_orderdate) = {Q5_YEAR}
GROUP BY 1
"""


Q7_NATION_A = "NATION_19"
Q7_NATION_B = "NATION_11"
Q7_YEAR_LO = 1995
Q7_YEAR_HI = 1996


def q_nations_trade_volume(sf_dir: str):
    """TPC-H Q7: shipping volume between {Q7_NATION_A} and {Q7_NATION_B}
    per order year in [{Q7_YEAR_LO}, {Q7_YEAR_HI}] — both directions."""
    from ray.data.aggregate import Sum

    nation_name, _nr = _nation_maps(sf_dir)
    key_a = next(k for k, v in nation_name.items() if v == Q7_NATION_A)
    key_b = next(k for k, v in nation_name.items() if v == Q7_NATION_B)

    pairs = _nation_pair_revenue(sf_dir)

    def pick(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"supp_nation": pa.array([], pa.string()),
             "cust_nation": pa.array([], pa.string()),
             "l_year": pa.array([], pa.int64()),
             "rev": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        cn = np.asarray(t["c_nat"].combine_chunks())
        sn = np.asarray(t["s_nat"].combine_chunks())
        yr = np.asarray(t["o_year"].combine_chunks())
        rv = np.asarray(t["rev"].combine_chunks())
        keep = (
            ((sn == key_a) & (cn == key_b)) | ((sn == key_b) & (cn == key_a))
        ) & (yr >= Q7_YEAR_LO) & (yr <= Q7_YEAR_HI)
        if not keep.any():
            return empty
        (s_, c_, y_), (r_,) = _seg_sum(
            [sn[keep], cn[keep], yr[keep]], [rv[keep]]
        )
        return pa.table(
            {
                "supp_nation": pa.array(
                    [nation_name[int(k)] for k in s_], pa.string()
                ),
                "cust_nation": pa.array(
                    [nation_name[int(k)] for k in c_], pa.string()
                ),
                "l_year": pa.array(y_, pa.int64()),
                "rev": pa.array(r_, pa.int64()),
            }
        )

    partials = pairs.map_batches(pick, batch_format="pyarrow",
                                 zero_copy_batch=True)
    # final fold over a <= (2 x 2 x years)-row relation: driver-side
    # (bounded; keeps schema concrete when the filter matches nothing)
    import ray
    import ray.data as rd

    tbls = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if tbls:
        import pandas as pd

        allp = pa.concat_tables(tbls, promote_options="default")
        sn_ = np.asarray(allp["supp_nation"].combine_chunks(), dtype=object)
        cn_ = np.asarray(allp["cust_nation"].combine_chunks(), dtype=object)
        yr_ = np.asarray(allp["l_year"].combine_chunks())
        rev = np.asarray(allp["rev"].combine_chunks())
        key = np.char.add(
            np.char.add(sn_.astype(str), "\x1f"),
            np.char.add(
                np.char.add(cn_.astype(str), "\x1f"), yr_.astype(str)
            ),
        )
        inv, uniq_pos = pd.factorize(key)
        first = np.zeros(len(uniq_pos), np.int64)
        first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        sums = np.zeros(len(uniq_pos), np.int64)
        np.add.at(sums, inv, rev)
        final = pa.table(
            {
                "supp_nation": pa.array(sn_[first].astype(str), pa.string()),
                "cust_nation": pa.array(cn_[first].astype(str), pa.string()),
                "l_year": pa.array(yr_[first], pa.int64()),
                "revenue": pa.array(sums.astype(np.float64) / 10000.0,
                                     pa.float64()),
            }
        )
    else:
        final = pa.table(
            {"supp_nation": pa.array([], pa.string()),
             "cust_nation": pa.array([], pa.string()),
             "l_year": pa.array([], pa.int64()),
             "revenue": pa.array([], pa.float64())}
        )
    return rd.from_arrow(final)


NATIONS_TRADE_VOLUME_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
       OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}'))
  AND EXTRACT(year FROM o.o_orderdate) BETWEEN {Q7_YEAR_LO} AND {Q7_YEAR_HI}
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# docs_tokenizer_fertility — BPE-ish pieces per whitespace word, by lang
# ---------------------------------------------------------------------------

def q_docs_tokenizer_fertility(sf_dir: str):
    """Tokenizer-efficiency audit per language: total BPE-ish regex
    pieces divided by total whitespace words — the fertility number a
    multilingual mixture design needs (high-fertility languages consume
    disproportionate token budget). Streaming partials, 5-group fold."""
    from ray.data.aggregate import Sum

    from .queries_text import BPE_PATTERN

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"lang": pa.array([], pa.string()),
             "pieces": pa.array([], pa.int64()),
             "words": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        text = t["text"].combine_chunks()
        pieces = np.asarray(
            pc.count_substring_regex(text, pattern=BPE_PATTERN).cast(
                pa.int64()
            )
        )
        words = np.asarray(
            pc.count_substring(text, " ").cast(pa.int64())
        ) + 1
        lang = np.asarray(t["lang"].combine_chunks(), dtype=object)
        inv, uniq = pd.factorize(lang)
        p = np.zeros(len(uniq), np.int64)
        w = np.zeros(len(uniq), np.int64)
        np.add.at(p, inv, pieces)
        np.add.at(w, inv, words)
        return pa.table(
            {"lang": pa.array(uniq.astype(str), pa.string()),
             "pieces": pa.array(p, pa.int64()),
             "words": pa.array(w, pa.int64())}
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(Sum("pieces", alias_name="pieces"),
                   Sum("words", alias_name="words"))
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "lang": t["lang"],
                "n_pieces": t["pieces"].combine_chunks().cast(pa.int64()),
                "n_words": t["words"].combine_chunks().cast(pa.int64()),
                "fertility": pa.array(
                    round6(
                        np.asarray(t["pieces"].combine_chunks()).astype(
                            np.float64
                        )
                        / np.asarray(
                            t["words"].combine_chunks()
                        ).astype(np.float64)
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def _fertility_sql() -> str:
    from .queries_text import BPE_PATTERN

    return rf"""
SELECT lang,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}'))) AS BIGINT)
           AS n_pieces,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
       ROUND(CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}')))
                  AS DOUBLE)
             / SUM(len(string_split(text, ' '))), 6) AS fertility
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# docs_dedup_survivorship — exact-dedup yield accounting
# ---------------------------------------------------------------------------

def q_docs_dedup_survivorship(sf_dir: str):
    """Exact-dedup survivorship: for each surviving document (smallest
    doc_id per exact text), how many duplicates it absorbed — the yield
    report a dedup stage owes its operator. ONE text-keyed exchange."""
    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_dupes": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        text = np.asarray(part["text"].combine_chunks(), dtype=object)
        doc = np.asarray(part["doc_id"].combine_chunks().cast(pa.int64()))
        inv, _uniq = pd.factorize(text)
        n = np.bincount(inv).astype(np.int64)
        keeper = np.full(len(_uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(keeper, inv, doc)
        return pa.table(
            {"doc_id": pa.array(keeper, pa.int64()),
             "n_dupes": pa.array(n - 1, pa.int64())}
        )

    return map_partitions_by_key(ds, "text", fn, num_parts=NUM_PARTS)


DOCS_DEDUP_SURVIVORSHIP_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dupes
FROM documents
GROUP BY text
"""


# ---------------------------------------------------------------------------
# events_watermark_lag — per-event lateness vs the running high watermark
# ---------------------------------------------------------------------------

def q_events_watermark_lag(sf_dir: str):
    """Late-data profile (the B12 watermark the reference parses but
    never uses, made observable): per user, walk events in ARRIVAL order
    (event_id) and report each event's lateness in seconds behind the
    running max event-time — the distribution that sizes a real
    pipeline's allowed-lateness / lookback window. ONE keyed exchange,
    segmented cummax."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def fn(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"event_id": pa.array([], pa.int64()),
             "late_s": pa.array([], pa.float64())}
        )
        if part.num_rows == 0:
            return empty
        uid = np.asarray(part["user_id"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(part["event_id"].combine_chunks().cast(pa.int64()))
        ts = np.asarray(part["ts"].combine_chunks().cast(pa.int64()))
        order = np.lexsort((eid, uid))
        uid, eid, ts = uid[order], eid[order], ts[order]
        seg_start = np.concatenate(([True], uid[1:] != uid[:-1]))
        seg_id = np.cumsum(seg_start) - 1
        # segmented running max in arrival order (pandas' C cummax —
        # the int64 offset trick would overflow at epoch-us magnitudes)
        import pandas as pd

        runmax = (
            pd.Series(ts).groupby(seg_id).cummax().to_numpy(np.int64)
        )
        late = round6((runmax - ts) / 1_000_000.0)
        return pa.table(
            {"event_id": pa.array(eid, pa.int64()),
             "late_s": pa.array(late, pa.float64())}
        )

    return map_partitions_by_key(ds, "user_id", fn, num_parts=NUM_PARTS)


EVENTS_WATERMARK_LAG_SQL = """
SELECT event_id,
       ROUND(CAST(epoch_us(MAX(ts) OVER w) - epoch_us(ts) AS DOUBLE)
             / 1000000.0, 6) AS late_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS UNBOUNDED PRECEDING)
"""


REGISTRY: dict[str, tuple] = {
    "orders_local_supplier_revenue": (
        q_orders_local_supplier_revenue,
        ORDERS_LOCAL_SUPPLIER_SQL,
    ),
    "nations_trade_volume": (q_nations_trade_volume,
                             NATIONS_TRADE_VOLUME_SQL),
    "docs_tokenizer_fertility": (
        q_docs_tokenizer_fertility,
        _fertility_sql(),
    ),
    "docs_dedup_survivorship": (
        q_docs_dedup_survivorship,
        DOCS_DEDUP_SURVIVORSHIP_SQL,
    ),
    "events_watermark_lag": (q_events_watermark_lag,
                             EVENTS_WATERMARK_LAG_SQL),
}

"""Round-2j operators: data-quality forensics, corpus comparison, and
the remaining classic decision-support join shapes.

- ``events_benford_profile``: first-significant-digit distribution of
  event values vs Benford's law with per-digit χ² terms — the classic
  fraud / synthetic-data forensics check a platform runs over monetary
  columns. Leading digits are exact integer arithmetic (repeated
  halving-free ``//10`` sweeps), counts fold through one 9-group
  groupby.
- ``docs_charclass_profile``: per-source character-class composition
  (alpha / digit / space / other) — the encoding-corruption and
  boilerplate detector run before tokenizer training. Zero shuffles:
  per-batch count partials → one tiny groupby.
- ``docs_vocab_overlap``: pairwise vocabulary Jaccard between language
  subcorpora — the domain-shift / contamination comparison between
  corpus slices. (token, lang) distinct pairs ride ONE vocabulary-keyed
  exchange; the pairwise intersection counts are vocabulary-bounded.
- ``orders_priority_delays`` (TPC-H Q4 shape): per order priority, how
  many orders have at least one lineitem shipped more than
  ``DELAY_DAYS`` days after the order date — the EXISTS semi-join with
  a pushed predicate, one co-partitioning exchange.
- ``parts_supplier_variety`` (Q16 shape): distinct supplier count per
  part brand — distributed COUNT DISTINCT over a join: one cogroup to
  attach brands, one supplier-keyed exchange where (brand, supplier)
  pairs become globally unique, partial counts out.
- ``idle_rich_customers`` (Q22 shape): customers with above-average
  positive balance and NO orders, per nation — a global scalar
  broadcast + anti cogroup.
- ``events_rate_ratio``: Poisson rate-ratio test between the reference
  and current windows (the count analog of ``events_welch_t``): exact
  integer counts and day spans, Wald CI on the log ratio.
- ``conv_handoff_latency``: per conversation, count/mean/max gap of the
  click→purchase handoff — the response-latency feature over the
  transcript view of events (same deterministic (ts, event_id) order as
  every conv operator).

Exactness: counts/spans/gaps are int64 end-to-end; ratio/CI/χ²/jaccard
floats are single expressions mirrored operand-for-operand and
ROUND(,6)'d.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6
from ..sources.reads import read_parquet_sized
from ..stages.keyed import cogroup_by_key, map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

DELAY_DAYS = 60
RATE_SPLIT = "2024-01-16"  # reference window [min, SPLIT), current [SPLIT, max]
RATE_Z = 1.96
HANDOFF_FROM, HANDOFF_TO = "click", "purchase"


# ---------------------------------------------------------------------------
# events_benford_profile — first-digit forensics
# ---------------------------------------------------------------------------


def q_events_benford_profile(sf_dir: str):
    """Observed vs Benford first-digit distribution of the value column
    (in cents, so 0.07 → digit 7): per-batch digit-count partials → one
    9-group groupby → χ² terms in the single-row-per-digit finale.
    NULL/zero values drop on both sides."""
    from ray.data.aggregate import Sum

    from ..functions.numeric import round_half_away

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"digit": pa.array([], pa.int64()),
             "pn": pa.array([], pa.int64())}
        )
        val = t["value"].combine_chunks()
        mask = np.asarray(pc.is_valid(val))
        if not mask.any():
            return empty
        cents = round_half_away(
            np.asarray(val)[mask].astype(np.float64) * 100.0
        ).astype(np.int64)
        cents = cents[cents > 0]
        if len(cents) == 0:
            return empty
        x = cents
        while (x >= 10).any():  # <= 18 sweeps for int64
            x = np.where(x >= 10, x // 10, x)
        dd, cnt = np.unique(x, return_counts=True)
        return pa.table(
            {"digit": pa.array(dd), "pn": pa.array(cnt.astype(np.int64))}
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("pn", alias_name="n"))
    )

    def finale(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t["digit"])
        digit = np.asarray(t["digit"].combine_chunks().take(order))
        n = np.asarray(t["n"].combine_chunks().take(order), dtype=np.int64)
        total = float(n.sum())
        pct = round6(n / total)
        bp = np.log10(1.0 + 1.0 / digit.astype(np.float64))
        expn = total * bp
        chi2 = round6((n - expn) * (n - expn) / expn)
        return pa.table(
            {
                "digit": pa.array(digit, pa.int64()),
                "n": pa.array(n),
                "pct": pa.array(pct, pa.float64()),
                "benford_p": pa.array(round6(bp), pa.float64()),
                "chi2_term": pa.array(chi2, pa.float64()),
            }
        )

    return folded.repartition(1).map_batches(finale, batch_format="pyarrow")


EVENTS_BENFORD_SQL = """
WITH c AS (
    SELECT CAST(substr(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM events
    WHERE value IS NOT NULL AND CAST(ROUND(value * 100, 0) AS BIGINT) > 0
),
g AS (SELECT digit, count(*)::BIGINT AS n FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM g)
SELECT digit, n,
       ROUND(n / t.total, 6) AS pct,
       ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p,
       ROUND((n - t.total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
             * (n - t.total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
             / (t.total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6)
           AS chi2_term
FROM g CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# docs_charclass_profile — character-class composition per source
# ---------------------------------------------------------------------------


def q_docs_charclass_profile(sf_dir: str):
    """Per source: document count and alpha/digit/space/other character
    totals — zero shuffles (per-batch Arrow regex-count partials, one
    tiny groupby over the fixed source vocabulary)."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "p_docs": pa.array([], pa.int64()),
                "p_chars": pa.array([], pa.int64()),
                "p_alpha": pa.array([], pa.int64()),
                "p_digit": pa.array([], pa.int64()),
                "p_space": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        txt = t["text"].combine_chunks()
        total = np.asarray(pc.utf8_length(txt)).astype(np.int64)
        alpha = np.asarray(
            pc.count_substring_regex(txt, "[a-zA-Z]")
        ).astype(np.int64)
        digit = np.asarray(
            pc.count_substring_regex(txt, "[0-9]")
        ).astype(np.int64)
        space = np.asarray(pc.count_substring(txt, " ")).astype(np.int64)
        src = np.asarray(t["source"].combine_chunks().cast(pa.large_string()))
        inv, uniq = pd.factorize(src)
        out = {}
        for name, arr in [
            ("p_docs", np.ones(len(src), dtype=np.int64)),
            ("p_chars", total),
            ("p_alpha", alpha),
            ("p_digit", digit),
            ("p_space", space),
        ]:
            s = np.zeros(len(uniq), np.int64)
            np.add.at(s, inv, arr)
            out[name] = pa.array(s)
        return pa.table(
            {"source": pa.array(uniq).cast(pa.string()), **out}
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            *[
                Sum(c, alias_name=c[2:])
                for c in ["p_docs", "p_chars", "p_alpha", "p_digit", "p_space"]
            ]
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        chars = np.asarray(t["chars"].combine_chunks(), dtype=np.int64)
        alpha = np.asarray(t["alpha"].combine_chunks(), dtype=np.int64)
        digit = np.asarray(t["digit"].combine_chunks(), dtype=np.int64)
        space = np.asarray(t["space"].combine_chunks(), dtype=np.int64)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": t["docs"].cast(pa.int64()),
                "n_chars": pa.array(chars),
                "n_alpha": pa.array(alpha),
                "n_digit": pa.array(digit),
                "n_space": pa.array(space),
                "n_other": pa.array(chars - alpha - digit - space),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


DOCS_CHARCLASS_SQL = """
SELECT source,
       count(*)::BIGINT AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(sum(length(text)
                - length(regexp_replace(text, '[a-zA-Z]', '', 'g')))
            AS BIGINT) AS n_alpha,
       CAST(sum(length(text)
                - length(regexp_replace(text, '[0-9]', '', 'g')))
            AS BIGINT) AS n_digit,
       CAST(sum(length(text)
                - length(regexp_replace(text, ' ', '', 'g')))
            AS BIGINT) AS n_space,
       CAST(sum(length(regexp_replace(
                regexp_replace(regexp_replace(text, '[a-zA-Z]', '', 'g'),
                               '[0-9]', '', 'g'), ' ', '', 'g')))
            AS BIGINT) AS n_other
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# docs_vocab_overlap — pairwise vocabulary Jaccard between languages
# ---------------------------------------------------------------------------


def q_docs_vocab_overlap(sf_dir: str):
    """For every unordered language pair (a < b): vocabulary sizes,
    shared-token count, and Jaccard |Va∩Vb| / |Va∪Vb| — the corpus-slice
    comparison behind mixture design and contamination checks.

    Plan: per-batch distinct (term, lang) partials → ONE vocabulary-keyed
    exchange where each term's language set is partition-local and
    collapses to a BITMASK (langs are a fixed small vocabulary, fetched
    by one tiny distinct pass) → per-partition (mask, n_terms) counts —
    at most 2^|langs| rows total — from which every pairwise
    intersection and vocabulary size falls out by mask arithmetic. No
    per-term Python, no per-pair expansion."""
    from ray.data.aggregate import Sum

    from .queries_extra import _tf_partial

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    # fixed-cardinality language vocabulary: one tiny distinct pass
    # (O(|langs| x blocks) rows reach the driver, never corpus-scale)
    lang_rows = (
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["lang"])
        .map_batches(
            lambda t: pa.table(
                {"lang": pc.unique(t["lang"].combine_chunks())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("lang")
        .count()
        .to_pandas()
    )
    langs = sorted(lang_rows["lang"].tolist())
    if len(langs) > 62:
        raise ValueError("vocab-overlap bitmask supports <= 62 languages")
    lang_bit = {l: i for i, l in enumerate(langs)}

    def tl_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"term": pa.array([], pa.string()),
             "bit": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        tf = _tf_partial(t.select(["doc_id", "text"]))
        if tf.num_rows == 0:
            return empty
        # map doc rows of the tf partial back to langs via doc_id probe
        idx = pc.index_in(
            tf["doc_id"], value_set=t["doc_id"].combine_chunks()
        )
        lang = np.asarray(
            t["lang"].combine_chunks().take(idx.combine_chunks())
            .cast(pa.large_string())
        )
        # vectorized lang -> bit: factorize, then map the few uniques
        l_inv, l_uniq = pd.factorize(lang)
        local_bit = np.array([lang_bit[l] for l in l_uniq], dtype=np.int64)
        bits = np.int64(1) << local_bit[l_inv]
        term = np.asarray(tf["term"].combine_chunks().cast(pa.large_string()))
        key = pd.MultiIndex.from_arrays([term, bits])
        _, first = np.unique(key, return_index=True)
        take = np.sort(first)
        return pa.table(
            {
                "term": tf["term"].combine_chunks().take(pa.array(take)),
                "bit": pa.array(bits[take]),
            }
        )

    rows = ds.map_batches(tl_partial, batch_format="pyarrow",
                          zero_copy_batch=True)

    def mask_counts(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"mask": pa.array([], pa.int64()),
             "p_terms": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        term = np.asarray(part["term"].combine_chunks().cast(pa.large_string()))
        bit = np.asarray(part["bit"].combine_chunks())
        t_inv, _ = pd.factorize(term)
        order = np.argsort(t_inv, kind="stable")
        ti, bi = t_inv[order], bit[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ti[1:] != ti[:-1]))
        )
        mask = np.bitwise_or.reduceat(bi, starts)
        mu, cnt = np.unique(mask, return_counts=True)
        return pa.table(
            {"mask": pa.array(mu), "p_terms": pa.array(cnt.astype(np.int64))}
        )

    folded = (
        map_partitions_by_key(rows, "term", mask_counts, num_parts=NUM_PARTS)
        .groupby("mask")
        .aggregate(Sum("p_terms", alias_name="n"))
        .to_pandas()  # <= 2^|langs| rows
    )
    masks = folded["mask"].to_numpy(np.int64)
    cnts = folded["n"].to_numpy(np.int64)
    la_out, lb_out, va_out, vb_out, inter_out = [], [], [], [], []
    vsz = {
        l: int(cnts[(masks >> b) & 1 == 1].sum())
        for l, b in lang_bit.items()
    }
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            both = ((masks >> lang_bit[a]) & 1 == 1) & (
                (masks >> lang_bit[b]) & 1 == 1
            )
            inter = int(cnts[both].sum())
            if inter == 0:
                continue  # mirror the inner-join twin
            la_out.append(a)
            lb_out.append(b)
            va_out.append(vsz[a])
            vb_out.append(vsz[b])
            inter_out.append(inter)
    va = np.array(va_out, dtype=np.int64)
    vb = np.array(vb_out, dtype=np.int64)
    inter = np.array(inter_out, dtype=np.int64)
    union = va + vb - inter
    jac = (
        round6(inter / union.astype(np.float64))
        if len(inter)
        else np.array([], dtype=np.float64)
    )
    return pa.table(
        {
            "lang_a": pa.array(la_out, pa.string()),
            "lang_b": pa.array(lb_out, pa.string()),
            "v_a": pa.array(va),
            "v_b": pa.array(vb),
            "n_shared": pa.array(inter),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )


DOCS_VOCAB_OVERLAP_SQL = """
WITH tl AS (
    SELECT DISTINCT unnest(string_split(text, ' ')) AS term, lang
    FROM documents
),
v AS (SELECT lang, count(*)::BIGINT AS vs FROM tl GROUP BY 1),
p AS (
    SELECT a.lang AS lang_a, b.lang AS lang_b, count(*)::BIGINT AS inter
    FROM tl a JOIN tl b ON a.term = b.term AND a.lang < b.lang
    GROUP BY 1, 2
)
SELECT p.lang_a, p.lang_b,
       va.vs AS v_a, vb.vs AS v_b, p.inter AS n_shared,
       ROUND(p.inter / CAST(va.vs + vb.vs - p.inter AS DOUBLE), 6)
           AS jaccard
FROM p JOIN v va ON p.lang_a = va.lang JOIN v vb ON p.lang_b = vb.lang
"""


# ---------------------------------------------------------------------------
# orders_priority_delays — Q4 shape: EXISTS semi-join with predicate
# ---------------------------------------------------------------------------


def q_orders_priority_delays(sf_dir: str):
    """Per order priority: total orders and orders with at least one
    lineitem shipped > {DELAY_DAYS} days after the order date. ONE
    co-partitioning exchange on orderkey; the EXISTS collapses to a
    per-order max-shipdate compare inside each partition."""
    from ray.data.aggregate import Sum

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"].combine_chunks())
        sd = np.asarray(t["l_shipdate"].combine_chunks()).astype(
            "datetime64[us]"
        )
        order = np.argsort(ok, kind="stable")
        oks, sds = ok[order], sd[order]
        starts = np.flatnonzero(
            np.concatenate(([True], oks[1:] != oks[:-1]))
        )
        mx = np.maximum.reduceat(sds.astype(np.int64), starts)
        return pa.table(
            {
                "orderkey": pa.array(oks[starts]),
                "max_ship_us": pa.array(mx),
            }
        )

    li_max = li.map_batches(li_partial, batch_format="pyarrow",
                            zero_copy_batch=True)

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["o_orderkey"].cast(pa.int64()),
                "odate_us": pa.array(
                    np.asarray(t["o_orderdate"].combine_chunks()).astype(
                        "datetime64[us]"
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "prio": t["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    delay_us = DELAY_DAYS * 86_400_000_000

    def join_check(lpart: pa.Table, opart: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "prio": pa.array([], pa.string()),
                "p_orders": pa.array([], pa.int64()),
                "p_delayed": pa.array([], pa.int64()),
            }
        )
        if opart.num_rows == 0:
            return empty
        # fold the lineitem max partials per orderkey first
        if lpart.num_rows:
            lk = np.asarray(lpart["orderkey"].combine_chunks())
            lm = np.asarray(lpart["max_ship_us"].combine_chunks())
            order = np.argsort(lk, kind="stable")
            lks, lms = lk[order], lm[order]
            starts = np.flatnonzero(
                np.concatenate(([True], lks[1:] != lks[:-1]))
            )
            lk_u = lks[starts]
            lm_u = np.maximum.reduceat(lms, starts)
        else:
            lk_u = np.array([], dtype=np.int64)
            lm_u = np.array([], dtype=np.int64)
        ok = np.asarray(opart["orderkey"].combine_chunks())
        od = np.asarray(opart["odate_us"].combine_chunks())
        pos = np.searchsorted(lk_u, ok)
        found = (pos < len(lk_u)) & (lk_u[np.minimum(pos, len(lk_u) - 1)]
                                     == ok) if len(lk_u) else np.zeros(
            len(ok), dtype=bool
        )
        mx = np.where(found, lm_u[np.minimum(pos, max(len(lk_u) - 1, 0))], 0)
        delayed = found & (mx > od + delay_us)
        prio = np.asarray(opart["prio"].combine_chunks().cast(pa.large_string()))
        inv, uniq = pd.factorize(prio)
        n = np.bincount(inv).astype(np.int64)
        d = np.zeros(len(uniq), np.int64)
        np.add.at(d, inv, delayed.astype(np.int64))
        return pa.table(
            {
                "prio": pa.array(uniq).cast(pa.string()),
                "p_orders": pa.array(n),
                "p_delayed": pa.array(d),
            }
        )

    partials = cogroup_by_key(li_max, orders, "orderkey", join_check,
                              num_parts=NUM_PARTS)
    out = partials.groupby("prio").aggregate(
        Sum("p_orders", alias_name="n_orders"),
        Sum("p_delayed", alias_name="n_delayed"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["prio"],
                "n_orders": t["n_orders"].cast(pa.int64()),
                "n_delayed": t["n_delayed"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


ORDERS_PRIORITY_DELAYS_SQL = f"""
SELECT o.o_orderpriority,
       count(*)::BIGINT AS n_orders,
       CAST(count(*) FILTER (EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey
             AND l.l_shipdate > o.o_orderdate + INTERVAL {DELAY_DAYS} DAY
       )) AS BIGINT) AS n_delayed
FROM orders o GROUP BY 1
"""


# ---------------------------------------------------------------------------
# parts_supplier_variety — Q16 shape: distributed COUNT DISTINCT over a join
# ---------------------------------------------------------------------------


def q_parts_supplier_variety(sf_dir: str):
    """Distinct suppliers per part brand, derived from lineitem facts:
    cogroup on partkey attaches brands (partition-local dedup), then ONE
    supplier-keyed exchange makes (brand, suppkey) pairs globally unique
    — partial counts per brand out, tiny final groupby."""
    from ray.data.aggregate import Sum

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "partkey": t["l_partkey"].cast(pa.int64()),
                "suppkey": t["l_suppkey"].cast(pa.int64()),
            }
        ),
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

    def attach(lpart: pa.Table, ppart: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"p_brand": pa.array([], pa.string()),
             "suppkey": pa.array([], pa.int64())}
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
        bn = np.asarray(brand.filter(keep).cast(pa.large_string()))
        sk = np.asarray(lpart["suppkey"].combine_chunks())[np.asarray(keep)]
        key = pd.MultiIndex.from_arrays([bn, sk])
        _, first = np.unique(key, return_index=True)
        first = np.sort(first)
        return pa.table(
            {
                "p_brand": pa.array(bn[first]).cast(pa.string()),
                "suppkey": pa.array(sk[first]),
            }
        )

    pairs = cogroup_by_key(li, part, "partkey", attach, num_parts=NUM_PARTS)

    def dedup_count(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"p_brand": pa.array([], pa.string()),
             "p_sup": pa.array([], pa.int64())}
        )
        if part_tbl.num_rows == 0:
            return empty
        bn = np.asarray(
            part_tbl["p_brand"].combine_chunks().cast(pa.large_string())
        )
        sk = np.asarray(part_tbl["suppkey"].combine_chunks())
        key = pd.MultiIndex.from_arrays([bn, sk])
        _, first = np.unique(key, return_index=True)
        bu = bn[first]
        inv, uniq = pd.factorize(bu)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {"p_brand": pa.array(uniq).cast(pa.string()),
             "p_sup": pa.array(cnt)}
        )

    partials = map_partitions_by_key(pairs, "suppkey", dedup_count,
                                     num_parts=NUM_PARTS)
    out = partials.groupby("p_brand").aggregate(
        Sum("p_sup", alias_name="n_suppliers")
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "p_brand": t["p_brand"],
                "n_suppliers": t["n_suppliers"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


PARTS_SUPPLIER_VARIETY_SQL = """
SELECT p.p_brand,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# idle_rich_customers — Q22 shape: scalar broadcast + anti join
# ---------------------------------------------------------------------------


IDLE_MAX_ORDERS = 5


def q_idle_rich_customers(sf_dir: str):
    """Per nation: customers whose balance exceeds the global average
    positive balance AND who placed fewer than {IDLE_MAX_ORDERS} orders
    — count and total balance (the Q22 "rich but idle" shape, with the
    EXISTS generalized to an order-count threshold so the answer is
    non-degenerate on corpora where every customer ordered). The global
    average is ONE tiny integer aggregate (broadcast as an exact
    rational closure constant: ``bal·n > s`` avoids the float divide);
    order counts arrive as per-batch partials through the same
    co-partitioning exchange that checks them."""
    from ray.data.aggregate import Sum

    from ..functions.numeric import round_half_away

    cust_src = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def bal_partial(t: pa.Table) -> pa.Table:
        bal = round_half_away(
            np.asarray(t["c_acctbal"].combine_chunks()).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        pos = bal > 0
        return pa.table(
            {
                "s": pa.array([int(bal[pos].sum())], pa.int64()),
                "n": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    agg = cust_src.map_batches(
        bal_partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    tot_s, tot_n = int(agg["s"] or 0), int(agg["n"] or 0)

    cust = cust_src.map_batches(
        lambda t: pa.table(
            {
                "custkey": t["c_custkey"].cast(pa.int64()),
                "nationkey": t["c_nationkey"].cast(pa.int64()),
                "bal_c": pa.array(
                    round_half_away(
                        np.asarray(t["c_acctbal"].combine_chunks()).astype(
                            np.float64
                        )
                        * 100.0
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    def ord_partial(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"].combine_chunks()).astype(np.int64)
        uniq, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {"custkey": pa.array(uniq),
             "ocnt": pa.array(cnt.astype(np.int64))}
        )

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(ord_partial, batch_format="pyarrow", zero_copy_batch=True)

    def anti(cpart: pa.Table, opart: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c_nationkey": pa.array([], pa.int64()),
                "p_n": pa.array([], pa.int64()),
                "p_bal": pa.array([], pa.int64()),
            }
        )
        if cpart.num_rows == 0:
            return empty
        bal = np.asarray(cpart["bal_c"].combine_chunks())
        # strict >: avg as exact rational tot_s/tot_n -> bal*n > s
        rich = bal * tot_n > tot_s
        n_orders = np.zeros(cpart.num_rows, dtype=np.int64)
        if opart.num_rows:
            # fold the per-batch order-count partials, then probe
            ok = np.asarray(opart["custkey"].combine_chunks())
            oc = np.asarray(opart["ocnt"].combine_chunks())
            order = np.argsort(ok, kind="stable")
            oks, ocs = ok[order], oc[order]
            starts = np.flatnonzero(
                np.concatenate(([True], oks[1:] != oks[:-1]))
            )
            ok_u = oks[starts]
            oc_u = np.add.reduceat(ocs, starts)
            ck = np.asarray(cpart["custkey"].combine_chunks())
            pos = np.searchsorted(ok_u, ck)
            pos_c = np.minimum(pos, len(ok_u) - 1)
            found = ok_u[pos_c] == ck
            n_orders = np.where(found, oc_u[pos_c], 0)
        keep = rich & (n_orders < IDLE_MAX_ORDERS)
        if not keep.any():
            return empty
        nk = np.asarray(cpart["nationkey"].combine_chunks())[keep]
        bk = bal[keep]
        uniq, inv = np.unique(nk, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        b = np.zeros(len(uniq), np.int64)
        np.add.at(b, inv, bk)
        return pa.table(
            {
                "c_nationkey": pa.array(uniq),
                "p_n": pa.array(n),
                "p_bal": pa.array(b),
            }
        )

    partials = cogroup_by_key(cust, orders, "custkey", anti,
                              num_parts=NUM_PARTS)
    out = partials.groupby("c_nationkey").aggregate(
        Sum("p_n", alias_name="n_customers"),
        Sum("p_bal", alias_name="total_bal_c100"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "c_nationkey": t["c_nationkey"].cast(pa.int64()),
                "n_customers": t["n_customers"].cast(pa.int64()),
                "total_bal_c100": t["total_bal_c100"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


IDLE_RICH_CUSTOMERS_SQL = f"""
WITH b AS (
    SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c
    FROM customer
),
avg_ AS (
    SELECT CAST(sum(bal_c) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
    FROM b WHERE bal_c > 0
),
oc AS (SELECT o_custkey, count(*)::BIGINT AS c FROM orders GROUP BY 1)
SELECT b.c_nationkey,
       count(*)::BIGINT AS n_customers,
       CAST(sum(b.bal_c) AS BIGINT) AS total_bal_c100
FROM b CROSS JOIN avg_
LEFT JOIN oc ON b.c_custkey = oc.o_custkey
WHERE b.bal_c * avg_.n > avg_.s
  AND coalesce(oc.c, 0) < {IDLE_MAX_ORDERS}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_rate_ratio — Poisson rate-ratio drift test
# ---------------------------------------------------------------------------


def q_events_rate_ratio(sf_dir: str):
    """Event-rate ratio between the current window [{RATE_SPLIT}, max]
    and the reference window [min, {RATE_SPLIT}): exact integer counts
    and day spans, rate ratio with a Wald CI on the log scale
    (z = {RATE_Z}) — the count analog of ``events_welch_t``."""
    from ray.data.aggregate import Max, Min, Sum

    split_us = np.datetime64(RATE_SPLIT, "us").astype(np.int64)
    split_day = int(split_us // 86_400_000_000)

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("n1", "n2", "dmin", "dmax")}
            )
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        d = us // 86_400_000_000
        ref = d < split_day
        return pa.table(
            {
                "n1": pa.array([int(ref.sum())], pa.int64()),
                "n2": pa.array([int((~ref).sum())], pa.int64()),
                "dmin": pa.array([int(d.min())], pa.int64()),
                "dmax": pa.array([int(d.max())], pa.int64()),
            }
        )

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n1", alias_name="n1"),
        Sum("n2", alias_name="n2"),
        Min("dmin", alias_name="d0"),
        Max("dmax", alias_name="d1"),
    )
    n1, n2 = int(agg["n1"] or 0), int(agg["n2"] or 0)
    d0, d1 = int(agg["d0"]), int(agg["d1"])
    t1 = split_day - d0
    t2 = d1 - split_day + 1
    ratio = lo = hi = None
    if n1 > 0 and n2 > 0 and t1 > 0 and t2 > 0:
        r = (n2 / float(t2)) / (n1 / float(t1))
        se = np.sqrt(1.0 / n1 + 1.0 / n2)
        ratio = float(round6(r))
        lo = float(round6(r * np.exp(-RATE_Z * se)))
        hi = float(round6(r * np.exp(RATE_Z * se)))
    return pa.table(
        {
            "n_ref": pa.array([n1], pa.int64()),
            "n_cur": pa.array([n2], pa.int64()),
            "t_ref_days": pa.array([t1], pa.int64()),
            "t_cur_days": pa.array([t2], pa.int64()),
            "rate_ratio": pa.array([ratio], pa.float64()),
            "ci_lo": pa.array([lo], pa.float64()),
            "ci_hi": pa.array([hi], pa.float64()),
        }
    )


EVENTS_RATE_RATIO_SQL = f"""
WITH e AS (
    SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d FROM events
),
sp AS (
    SELECT CAST(epoch_us(TIMESTAMP '{RATE_SPLIT}') AS BIGINT)
           // 86400000000 AS sd
),
a AS (
    SELECT CAST(count(*) FILTER (d < sp.sd) AS BIGINT) AS n1,
           CAST(count(*) FILTER (d >= sp.sd) AS BIGINT) AS n2,
           CAST(sp.sd - min(d) AS BIGINT) AS t1,
           CAST(max(d) - sp.sd + 1 AS BIGINT) AS t2
    FROM e CROSS JOIN sp GROUP BY sp.sd
)
SELECT n1 AS n_ref, n2 AS n_cur, t1 AS t_ref_days, t2 AS t_cur_days,
       CASE WHEN n1 > 0 AND n2 > 0 AND t1 > 0 AND t2 > 0
            THEN ROUND((n2 / CAST(t2 AS DOUBLE)) / (n1 / CAST(t1 AS DOUBLE)),
                       6) ELSE NULL END AS rate_ratio,
       CASE WHEN n1 > 0 AND n2 > 0 AND t1 > 0 AND t2 > 0
            THEN ROUND(((n2 / CAST(t2 AS DOUBLE)) / (n1 / CAST(t1 AS DOUBLE)))
                       * exp(-{RATE_Z} * sqrt(1.0 / n1 + 1.0 / n2)), 6)
            ELSE NULL END AS ci_lo,
       CASE WHEN n1 > 0 AND n2 > 0 AND t1 > 0 AND t2 > 0
            THEN ROUND(((n2 / CAST(t2 AS DOUBLE)) / (n1 / CAST(t1 AS DOUBLE)))
                       * exp({RATE_Z} * sqrt(1.0 / n1 + 1.0 / n2)), 6)
            ELSE NULL END AS ci_hi
FROM a
"""


# ---------------------------------------------------------------------------
# conv_handoff_latency — click→purchase response gap per conversation
# ---------------------------------------------------------------------------


def q_conv_handoff_latency(sf_dir: str):
    """Per conversation: count, mean (µs, ROUND(,6)) and max gap of the
    immediate {HANDOFF_FROM}→{HANDOFF_TO} role handoff in deterministic
    (ts, event_id) order — the response-latency feature over the
    transcript view. Conversations without such a handoff are absent
    (inner semantics). ONE conv-keyed exchange."""
    from ..sources.transcripts import read_events_as_transcripts

    ds = read_events_as_transcripts(sf_dir)

    def per_conv(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_handoffs": pa.array([], pa.int64()),
                "mean_gap_us": pa.array([], pa.float64()),
                "max_gap_us": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        conv = tbl["conv_id"].combine_chunks()
        codes = np.asarray(pc.dictionary_encode(conv).indices).astype(
            np.int64
        )
        ts = np.asarray(tbl["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(tbl["event_id"].combine_chunks())
        order = np.lexsort((eid, ts, codes))
        k = codes[order]
        role = np.asarray(
            tbl["role"].combine_chunks().cast(pa.large_string())
        )[order]
        tso = ts[order]
        same = k[1:] == k[:-1]
        hand = same & (role[:-1] == HANDOFF_FROM) & (role[1:] == HANDOFF_TO)
        if not hand.any():
            return empty
        idx = np.flatnonzero(hand)
        gaps = tso[idx + 1] - tso[idx]
        seg = k[idx]
        order2 = np.argsort(seg, kind="stable")
        seg, gaps = seg[order2], gaps[order2]
        starts = np.flatnonzero(
            np.concatenate(([True], seg[1:] != seg[:-1]))
        )
        n = np.diff(np.append(starts, len(seg)))
        s = np.add.reduceat(gaps, starts)
        mx = np.maximum.reduceat(gaps, starts)
        uniq = conv.take(pa.array(order[idx][order2][starts]))
        return pa.table(
            {
                "conv_id": uniq,
                "n_handoffs": pa.array(n.astype(np.int64)),
                "mean_gap_us": pa.array(
                    round6(s / n.astype(np.float64)), pa.float64()
                ),
                "max_gap_us": pa.array(mx.astype(np.int64)),
            }
        )

    return map_partitions_by_key(ds, "conv_id", per_conv,
                                 num_parts=NUM_PARTS)


def _handoff_sql() -> str:
    from ..sources.transcripts import TRANSCRIPTS_SQL_CTE

    return f"""
WITH {TRANSCRIPTS_SQL_CTE},
g AS (
    SELECT conv_id, role,
        lead(role) OVER wo AS role_next,
        lead(epoch_us(ts)) OVER wo - epoch_us(ts) AS gap_us
    FROM transcripts
    WINDOW wo AS (PARTITION BY conv_id ORDER BY ts, event_id)
),
h AS (
    SELECT conv_id, gap_us FROM g
    WHERE role = '{HANDOFF_FROM}' AND role_next = '{HANDOFF_TO}'
)
SELECT conv_id,
       count(*)::BIGINT AS n_handoffs,
       ROUND(sum(gap_us) / CAST(count(*) AS DOUBLE), 6) AS mean_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM h GROUP BY 1
"""


REGISTRY = {
    "events_benford_profile": (q_events_benford_profile, EVENTS_BENFORD_SQL),
    "docs_charclass_profile": (q_docs_charclass_profile, DOCS_CHARCLASS_SQL),
    "docs_vocab_overlap": (q_docs_vocab_overlap, DOCS_VOCAB_OVERLAP_SQL),
    "orders_priority_delays": (
        q_orders_priority_delays,
        ORDERS_PRIORITY_DELAYS_SQL,
    ),
    "parts_supplier_variety": (
        q_parts_supplier_variety,
        PARTS_SUPPLIER_VARIETY_SQL,
    ),
    "idle_rich_customers": (q_idle_rich_customers, IDLE_RICH_CUSTOMERS_SQL),
    "events_rate_ratio": (q_events_rate_ratio, EVENTS_RATE_RATIO_SQL),
    "conv_handoff_latency": (q_conv_handoff_latency, _handoff_sql()),
}

"""Round-5 operator additions, batch 7 (oracle-exact, DuckDB twins).

- ``train_split_contamination`` — leakage AUDIT of the naive hash
  split: per source, the share of validation docs that share an
  80-char text head with any TRAIN doc (the contamination
  ``train_dedup_aware_split`` exists to prevent — this measures it).
- ``events_lifecycle_stages``  — user lifecycle classification at a
  cut date (active / lapsed / churned by last-activity age).
- ``conv_tool_bigrams``        — adjacent tool→tool call patterns
  (both turns tool-bearing), the workflow-mining table.
- ``segments_revenue_share``   — cent-exact revenue share by customer
  market segment (one custkey cogroup, 5-row fold).
- ``orders_weekday_seasonality`` — order count and mean total by day
  of week (pure streaming, 7-row fold).

Reference provenance: build_datasets.py:57-73 (the split this audits),
silver_and_gold.py:86-131 aggregates, per the north rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6, round_half_away
from ..sources.reads import read_parquet_sized
from ..sources.transcripts import (
    TRANSCRIPTS_SQL_CTE,
    read_events_as_transcripts,
)
from ..stages.keyed import cogroup_by_key, map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

_US = 1_000_000
_US_PER_DAY = 86_400 * _US


# ---------------------------------------------------------------------------
# train_split_contamination — leakage audit of the naive split
# ---------------------------------------------------------------------------

CONTAM_K = 80       # shared-head dup key (the cross-source matrix key)
CONTAM_VAL_FROM = 80  # bucket >= 80 -> validation (the 80/20 convention)


def q_train_split_contamination(sf_dir: str):
    """Per source: validation docs (hash bucket ≥ {CONTAM_VAL_FROM} of
    the engine's deterministic splitmix split) that share a
    {CONTAM_K}-char text head with ANY train doc — the leakage the
    dedup-aware split removes, quantified. ONE head-hash-keyed
    exchange; groups compare exact heads (hash collisions merge
    partitions, never groups); per-source partials fold through a tiny
    aggregate."""
    from ray.data.aggregate import Sum

    from ..stages.ppjoin import hash_grams
    from .queries_relational import split_bucket

    def keyed(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        pk = pc.utf8_slice_codeunits(
            t["text"].combine_chunks(), 0, CONTAM_K
        )
        return pa.table(
            {
                "pkh": pa.array(hash_grams(pk), pa.int64()),
                "pk": pk,
                "source": t["source"],
                "is_val": pa.array(
                    (split_bucket(ids) >= CONTAM_VAL_FROM).astype(np.int8),
                    pa.int8(),
                ),
            }
        )

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)

    def partials(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"source": pa.array([], pa.string()),
             "nv": pa.array([], pa.int64()),
             "nc": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        import pandas as pd

        pk = np.asarray(part["pk"].combine_chunks(), dtype=object)
        src = np.asarray(part["source"].combine_chunks(), dtype=object)
        is_val = np.asarray(part["is_val"].combine_chunks()).astype(bool)
        ginv, _g = pd.factorize(pk)  # exact head groups
        has_train = np.zeros(len(_g), dtype=bool)
        np.logical_or.at(has_train, ginv, ~is_val)
        contam = is_val & has_train[ginv]
        sinv, suniq = pd.factorize(src[is_val])
        if len(suniq) == 0:
            return empty
        nv = np.bincount(sinv).astype(np.int64)
        nc = np.zeros(len(suniq), np.int64)
        np.add.at(nc, sinv, contam[is_val].astype(np.int64))
        return pa.table(
            {
                "source": pa.array(suniq.astype(str), pa.string()),
                "nv": pa.array(nv, pa.int64()),
                "nc": pa.array(nc, pa.int64()),
            }
        )

    folded = map_partitions_by_key(
        docs, "pkh", partials, num_parts=NUM_PARTS
    ).groupby("source").aggregate(
        Sum("nv", alias_name="n_val"), Sum("nc", alias_name="n_contaminated")
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "n_val": t["n_val"].combine_chunks().cast(pa.int64()),
                "n_contaminated": t["n_contaminated"]
                .combine_chunks()
                .cast(pa.int64()),
                "contamination_rate": pa.array(
                    round6(
                        np.asarray(
                            t["n_contaminated"].combine_chunks(),
                            dtype=np.float64,
                        )
                        / np.asarray(
                            t["n_val"].combine_chunks(), dtype=np.float64
                        )
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _contam_sql() -> str:
    from .queries_relational import splitmix64_bucket_sql

    return f"""
WITH {splitmix64_bucket_sql("doc_id", "documents")},
d AS (
    SELECT doc_id, source, substr(text, 1, {CONTAM_K}) AS pk, __bucket
    FROM __s5
),
tr AS (SELECT DISTINCT pk FROM d WHERE __bucket < {CONTAM_VAL_FROM}),
v AS (SELECT * FROM d WHERE __bucket >= {CONTAM_VAL_FROM})
SELECT v.source,
       COUNT(*)::BIGINT AS n_val,
       CAST(SUM(CASE WHEN tr.pk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated,
       ROUND(CAST(SUM(CASE WHEN tr.pk IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS contamination_rate
FROM v LEFT JOIN tr ON tr.pk = v.pk
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_lifecycle_stages — user lifecycle at a cut date
# ---------------------------------------------------------------------------

LIFE_CUT = "2024-01-31"
LIFE_ACTIVE_D = 0
LIFE_LAPSED_D = 1


def q_events_lifecycle_stages(sf_dir: str):
    """User lifecycle at {LIFE_CUT}: active (last event within
    {LIFE_ACTIVE_D} days of the cut), lapsed (≤ {LIFE_LAPSED_D}), else
    churned — thresholds sized to the fixture's 30-day event span.
    One per-user max-ts fold (keyed exchange of per-batch partials),
    then a ≤3-row stage fold."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..stages.keyed import fold_by_keys
    from .queries_r5a import _ev

    cut = int(pd.Timestamp(LIFE_CUT).value // 1000)
    ds = _ev(sf_dir, columns=["user_id", "ts"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "ts": t["ts"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    last = fold_by_keys(ds, ["user_id"], maxs=("ts",), num_parts=NUM_PARTS)

    def stage(t: pa.Table) -> pa.Table:
        import pandas as pd_

        if t.num_rows == 0:
            return pa.table(
                {"stage": pa.array([], pa.string()),
                 "sc": pa.array([], pa.int64())}
            )
        age_d = (cut - np.asarray(t["ts"].combine_chunks())) // _US_PER_DAY
        st = np.where(
            age_d <= LIFE_ACTIVE_D, "active",
            np.where(age_d <= LIFE_LAPSED_D, "lapsed", "churned"),
        )
        inv, uniq = pd_.factorize(st)
        return pa.table(
            {
                "stage": pa.array(uniq.astype(str), pa.string()),
                "sc": pa.array(np.bincount(inv).astype(np.int64),
                               pa.int64()),
            }
        )

    return (
        last.map_batches(stage, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("stage")
        .aggregate(Sum("sc", alias_name="n_users"))
    )


EVENTS_LIFECYCLE_SQL = f"""
WITH g AS (
    SELECT user_id,
           (epoch_us(TIMESTAMP '{LIFE_CUT}') - epoch_us(MAX(ts)))
               // 86400000000 AS age_d
    FROM events GROUP BY 1
)
SELECT CASE WHEN age_d <= {LIFE_ACTIVE_D} THEN 'active'
            WHEN age_d <= {LIFE_LAPSED_D} THEN 'lapsed'
            ELSE 'churned' END AS stage,
       COUNT(*)::BIGINT AS n_users
FROM g GROUP BY 1
"""


# ---------------------------------------------------------------------------
# conv_tool_bigrams — adjacent tool-call patterns
# ---------------------------------------------------------------------------

def q_conv_tool_bigrams(sf_dir: str):
    """Counts of adjacent (tool_a → tool_b) turn pairs where BOTH turns
    carry a tool ((ts, event_id) order) — the workflow-mining bigram
    table. ONE conv-keyed exchange; fixed |tools|² fold domain."""
    from ray.data.aggregate import Sum

    from .queries import _conv_order

    ds = read_events_as_transcripts(sf_dir)

    def part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"tool_a": pa.array([], pa.string()),
             "tool_b": pa.array([], pa.string()),
             "bc": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return empty
        import pandas as pd

        order, k, _ts, _seg = _conv_order(tbl)
        tool = np.asarray(
            tbl["tool"].combine_chunks().take(pa.array(order)), dtype=object
        )
        n = len(k)
        if n < 2:
            return empty
        same = k[1:] == k[:-1]
        ta = tool[:-1]
        tb = tool[1:]
        ok = same & (ta != None) & (tb != None)  # noqa: E711
        if not ok.any():
            return empty
        key = np.char.add(
            np.char.add(ta[ok].astype(str), "\x1f"), tb[ok].astype(str)
        )
        inv, uniq = pd.factorize(key)
        first = np.zeros(len(uniq), np.int64)
        first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        return pa.table(
            {
                "tool_a": pa.array(ta[ok][first].astype(str), pa.string()),
                "tool_b": pa.array(tb[ok][first].astype(str), pa.string()),
                "bc": pa.array(np.bincount(inv).astype(np.int64),
                               pa.int64()),
            }
        )

    return (
        map_partitions_by_key(ds, "conv_id", part, num_parts=NUM_PARTS)
        .groupby(["tool_a", "tool_b"])
        .aggregate(Sum("bc", alias_name="n_pairs"))
    )


CONV_TOOL_BIGRAMS_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
w AS (
    SELECT conv_id, tool AS tool_a,
           lead(tool) OVER (PARTITION BY conv_id
                            ORDER BY ts, event_id) AS tool_b
    FROM transcripts
)
SELECT tool_a, tool_b, COUNT(*)::BIGINT AS n_pairs
FROM w WHERE tool_a IS NOT NULL AND tool_b IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# segments_revenue_share — revenue share by market segment
# ---------------------------------------------------------------------------

def q_segments_revenue_share(sf_dir: str):
    """Cent-exact order revenue by customer market segment with each
    segment's share of the total: one custkey cogroup pre-folding to
    (segment, cents) partials, a 5-row fold, one float division per
    row (the total is the exact int sum of the folded cents)."""
    import ray
    import ray.data as rd

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "custkey": t["o_custkey"].cast(pa.int64()),
                "cents": pa.array(
                    round_half_away(
                        np.asarray(t["o_totalprice"].combine_chunks())
                        * 100.0
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: pa.table(
            {
                "custkey": t["c_custkey"].cast(pa.int64()),
                "seg": t["c_mktsegment"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def join_seg(opart: pa.Table, cpart: pa.Table) -> pa.Table:
        empty = pa.table(
            {"seg": pa.array([], pa.string()),
             "cents": pa.array([], pa.int64())}
        )
        if opart.num_rows == 0 or cpart.num_rows == 0:
            return empty
        import pandas as pd

        idx = pc.index_in(
            opart["custkey"], value_set=cpart["custkey"].combine_chunks()
        ).combine_chunks()
        keep = pc.is_valid(idx)
        if not pc.any(keep).as_py():
            return empty
        seg = np.asarray(
            cpart["seg"].combine_chunks().take(idx.filter(keep)),
            dtype=object,
        )
        cents = np.asarray(
            opart.filter(keep)["cents"].combine_chunks()
        )
        inv, uniq = pd.factorize(seg)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {
                "seg": pa.array(uniq.astype(str), pa.string()),
                "cents": pa.array(s, pa.int64()),
            }
        )

    partials = cogroup_by_key(orders, cust, "custkey", join_seg,
                              num_parts=NUM_PARTS)
    tbls = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return rd.from_arrow(
            pa.table(
                {"c_mktsegment": pa.array([], pa.string()),
                 "revenue": pa.array([], pa.float64()),
                 "share": pa.array([], pa.float64())}
            )
        )
    import pandas as pd

    allt = pa.concat_tables(tbls)  # ≤ parts × |segments| rows
    seg = np.asarray(allt["seg"].combine_chunks(), dtype=object)
    cents = np.asarray(allt["cents"].combine_chunks())
    inv, uniq = pd.factorize(seg)
    s = np.zeros(len(uniq), np.int64)
    np.add.at(s, inv, cents)
    order = np.argsort(uniq.astype(str))
    uniq, s = uniq[order], s[order]
    total = int(s.sum())
    return rd.from_arrow(
        pa.table(
            {
                "c_mktsegment": pa.array(uniq.astype(str), pa.string()),
                "revenue": pa.array(s.astype(np.float64) / 100.0,
                                    pa.float64()),
                "share": pa.array(
                    round6(s.astype(np.float64) / float(total)),
                    pa.float64(),
                ),
            }
        )
    )


SEGMENTS_REVENUE_SQL = """
WITH g AS (
    SELECT c.c_mktsegment,
           SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
)
SELECT c_mktsegment,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       ROUND(CAST(cents AS DOUBLE)
             / CAST((SELECT SUM(cents) FROM g) AS DOUBLE), 6) AS share
FROM g
"""


# ---------------------------------------------------------------------------
# orders_weekday_seasonality — order volume by day of week
# ---------------------------------------------------------------------------

def q_orders_weekday_seasonality(sf_dir: str):
    """Order count and mean total price per day of week (0 = Sunday,
    DuckDB's EXTRACT(dow) convention). Pure streaming partials, 7-row
    fold, one float division per row."""
    from ray.data.aggregate import Sum

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        ts = np.asarray(t["o_orderdate"].combine_chunks().cast(pa.int64()))
        # epoch day 0 = Thursday; DuckDB dow: Sunday = 0 -> Thu = 4
        dow = ((ts // _US_PER_DAY) + 4) % 7
        cents = round_half_away(
            np.asarray(t["o_totalprice"].combine_chunks()) * 100.0
        ).astype(np.int64)
        inv, uniq = pd.factorize(dow)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {
                "dow": pa.array(uniq.astype(np.int64), pa.int64()),
                "nn": pa.array(n, pa.int64()),
                "sc": pa.array(s, pa.int64()),
            }
        )

    folded = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("dow").aggregate(
        Sum("nn", alias_name="n_orders"), Sum("sc", alias_name="s")
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "dow": t["dow"].combine_chunks().cast(pa.int64()),
                "n_orders": t["n_orders"].combine_chunks().cast(pa.int64()),
                "avg_total": pa.array(
                    round6(
                        np.asarray(t["s"].combine_chunks(),
                                   dtype=np.float64)
                        / np.asarray(t["n_orders"].combine_chunks(),
                                     dtype=np.float64)
                        / 100.0
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORDERS_WEEKDAY_SQL = """
SELECT CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS dow,
       COUNT(*)::BIGINT AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / COUNT(*) / 100.0, 6) AS avg_total
FROM orders GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "train_split_contamination": (
        q_train_split_contamination,
        _contam_sql(),
    ),
    "events_lifecycle_stages": (q_events_lifecycle_stages,
                                EVENTS_LIFECYCLE_SQL),
    "conv_tool_bigrams": (q_conv_tool_bigrams, CONV_TOOL_BIGRAMS_SQL),
    "segments_revenue_share": (q_segments_revenue_share,
                               SEGMENTS_REVENUE_SQL),
    "orders_weekday_seasonality": (
        q_orders_weekday_seasonality,
        ORDERS_WEEKDAY_SQL,
    ),
}

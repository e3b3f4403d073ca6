"""Round-5 operator additions, batch 8 (oracle-exact, DuckDB twins).

- ``docs_tercile_length_bias`` — mean document length per CCNet
  quality tercile (composes the distributed-rank terciles of
  ``docs_head_middle_tail`` with one doc_id cogroup and a 3-row fold —
  the length-bias audit of perplexity-based curation).
- ``parts_size_price_profile`` — part count and mean retail price per
  size (streaming, tiny fold).
- ``events_type_dow_heatmap``  — event counts per (type, day-of-week)
  (streaming, |types|·7 fold).
- ``suppliers_nation_balance`` — supplier count and cent-exact total
  account balance per nation name (25-row broadcast nation map,
  streaming partials).

Reference provenance: silver_and_gold.py:86-131 aggregates per the
north rule; the tercile bias audit extends the round-4 CCNet
stratification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6, round_half_away
from ..sources.reads import read_parquet_sized
from ..stages.keyed import cogroup_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# docs_tercile_length_bias — length bias of perplexity terciles
# ---------------------------------------------------------------------------

def q_docs_tercile_length_bias(sf_dir: str):
    """Per head/middle/tail tercile (docs_head_middle_tail's exact
    distributed-rank buckets): document count and mean ``n_chars`` —
    does perplexity-based stratification skew short or long? One
    doc_id cogroup attaches lengths to buckets, 3-row fold, one float
    division per row."""
    from ray.data.aggregate import Sum

    from .queries_r4d import q_docs_head_middle_tail

    buckets = q_docs_head_middle_tail(sf_dir)
    lens = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_chars": t["n_chars"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def attach(bpart: pa.Table, lpart: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bucket": pa.array([], pa.string()),
             "nd": pa.array([], pa.int64()),
             "sc": pa.array([], pa.int64())}
        )
        if bpart.num_rows == 0 or lpart.num_rows == 0:
            return empty
        import pandas as pd

        idx = pc.index_in(
            bpart["doc_id"], value_set=lpart["doc_id"].combine_chunks()
        ).combine_chunks()
        keep = pc.is_valid(idx)
        if not pc.any(keep).as_py():
            return empty
        nb = np.asarray(
            lpart["n_chars"].combine_chunks().take(idx.filter(keep))
        )
        bk = np.asarray(
            bpart.filter(keep)["bucket"].combine_chunks(), dtype=object
        )
        inv, uniq = pd.factorize(bk)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, nb)
        return pa.table(
            {
                "bucket": pa.array(uniq.astype(str), pa.string()),
                "nd": pa.array(np.bincount(inv).astype(np.int64),
                               pa.int64()),
                "sc": pa.array(s, pa.int64()),
            }
        )

    folded = cogroup_by_key(buckets, lens, "doc_id", attach,
                            num_parts=NUM_PARTS).groupby("bucket").aggregate(
        Sum("nd", alias_name="n_docs"), Sum("sc", alias_name="s")
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "bucket": t["bucket"],
                "n_docs": t["n_docs"].combine_chunks().cast(pa.int64()),
                "avg_chars": pa.array(
                    round6(
                        np.asarray(t["s"].combine_chunks(),
                                   dtype=np.float64)
                        / np.asarray(t["n_docs"].combine_chunks(),
                                     dtype=np.float64)
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _tercile_bias_sql() -> str:
    from .queries_r4d import _hmt_sql

    inner = _hmt_sql().strip().rstrip(";")
    return f"""
WITH hmt AS ({inner})
SELECT hmt.bucket,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
FROM hmt JOIN documents d ON d.doc_id = hmt.doc_id
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# parts_size_price_profile — price profile by part size
# ---------------------------------------------------------------------------

def q_parts_size_price_profile(sf_dir: str):
    """Part count and mean retail price per size — cent-exact sums,
    streaming partials, tiny fold."""
    from ray.data.aggregate import Sum

    parts = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_size", "p_retailprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        size = np.asarray(t["p_size"].combine_chunks().cast(pa.int64()))
        cents = round_half_away(
            np.asarray(t["p_retailprice"].combine_chunks()) * 100.0
        ).astype(np.int64)
        inv, uniq = pd.factorize(size)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {
                "p_size": pa.array(uniq, pa.int64()),
                "nn": pa.array(np.bincount(inv).astype(np.int64),
                               pa.int64()),
                "sc": pa.array(s, pa.int64()),
            }
        )

    folded = parts.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("p_size").aggregate(
        Sum("nn", alias_name="n_parts"), Sum("sc", alias_name="s")
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "p_size": t["p_size"].combine_chunks().cast(pa.int64()),
                "n_parts": t["n_parts"].combine_chunks().cast(pa.int64()),
                "avg_price": pa.array(
                    round6(
                        np.asarray(t["s"].combine_chunks(),
                                   dtype=np.float64)
                        / np.asarray(t["n_parts"].combine_chunks(),
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


PARTS_SIZE_PRICE_SQL = """
SELECT CAST(p_size AS BIGINT) AS p_size,
       COUNT(*)::BIGINT AS n_parts,
       ROUND(CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT))
                  AS DOUBLE) / COUNT(*) / 100.0, 6) AS avg_price
FROM part GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_type_dow_heatmap — activity heatmap partials
# ---------------------------------------------------------------------------

def q_events_type_dow_heatmap(sf_dir: str):
    """Event counts per (type, day of week) — the activity heatmap's
    exact table (0 = Sunday). Streaming partials, |types|·7-row
    fold."""
    from ray.data.aggregate import Sum

    from .queries_r5a import _ev

    _US_PER_DAY = 86_400_000_000
    ds = _ev(sf_dir, columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        et = np.asarray(t["event_type"].combine_chunks(), dtype=object)
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        dow = ((ts // _US_PER_DAY) + 4) % 7  # epoch day 0 = Thursday
        key = np.char.add(np.char.add(et.astype(str), "\x1f"),
                          dow.astype(str))
        inv, uniq = pd.factorize(key)
        first = np.zeros(len(uniq), np.int64)
        first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        return pa.table(
            {
                "event_type": pa.array(et[first].astype(str), pa.string()),
                "dow": pa.array(dow[first], pa.int64()),
                "cc": pa.array(np.bincount(inv).astype(np.int64),
                               pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["event_type", "dow"])
        .aggregate(Sum("cc", alias_name="n_events"))
    )


EVENTS_TYPE_DOW_SQL = """
SELECT event_type,
       CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
       COUNT(*)::BIGINT AS n_events
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# suppliers_nation_balance — supplier balances by nation
# ---------------------------------------------------------------------------

def q_suppliers_nation_balance(sf_dir: str):
    """Supplier count and cent-exact total account balance per nation
    name: the 25-row nation map broadcasts (ray.put once, read per
    batch); partials stream; tiny fold."""
    import pyarrow.parquet as pq
    import ray

    from ray.data.aggregate import Sum

    nt = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = np.asarray(nt["n_nationkey"].to_numpy()).astype(np.int64)
    nn = np.asarray(nt["n_name"].to_pandas(), dtype=object)
    order = np.argsort(nk)
    nmap_ref = ray.put((nk[order], nn[order]))

    supp = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )

    def partial(t: pa.Table, _n=nmap_ref) -> pa.Table:
        import pandas as pd

        keys, names = ray.get(_n)
        snk = np.asarray(t["s_nationkey"].combine_chunks().cast(pa.int64()))
        pos = np.searchsorted(keys, snk)
        if len(pos) and (
            (pos >= len(keys)).any()
            or (keys[np.minimum(pos, len(keys) - 1)] != snk).any()
        ):
            raise ValueError("supplier nationkey missing from nation table")
        name = names[pos]
        cents = round_half_away(
            np.asarray(t["s_acctbal"].combine_chunks()) * 100.0
        ).astype(np.int64)
        inv, uniq = pd.factorize(name)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {
                "n_name": pa.array(uniq.astype(str), pa.string()),
                "ns": pa.array(np.bincount(inv).astype(np.int64),
                               pa.int64()),
                "sc": pa.array(s, pa.int64()),
            }
        )

    folded = supp.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("n_name").aggregate(
        Sum("ns", alias_name="n_suppliers"), Sum("sc", alias_name="s")
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "n_name": t["n_name"],
                "n_suppliers": t["n_suppliers"].combine_chunks().cast(
                    pa.int64()
                ),
                "total_acctbal": pa.array(
                    np.asarray(t["s"].combine_chunks()).astype(np.float64)
                    / 100.0,
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SUPPLIERS_NATION_SQL = """
SELECT n.n_name,
       COUNT(*)::BIGINT AS n_suppliers,
       CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 AS total_acctbal
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "docs_tercile_length_bias": (
        q_docs_tercile_length_bias,
        _tercile_bias_sql(),
    ),
    "parts_size_price_profile": (
        q_parts_size_price_profile,
        PARTS_SIZE_PRICE_SQL,
    ),
    "events_type_dow_heatmap": (q_events_type_dow_heatmap,
                                EVENTS_TYPE_DOW_SQL),
    "suppliers_nation_balance": (
        q_suppliers_nation_balance,
        SUPPLIERS_NATION_SQL,
    ),
}

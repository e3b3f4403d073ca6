"""Round-4 operator additions, batch 3 (oracle-exact, DuckDB twins).

- ``train_dedup_aware_split`` — leakage-safe train/validation split:
  exact-duplicate documents always land on the SAME side by hashing the
  duplicate-cluster representative instead of the document id (the
  classic contamination bug in naive per-doc splits).
- ``conv_concurrent_turns``   — transcript hygiene: per conversation,
  how many timestamps carry multiple turns (branch/retry/concurrent
  delivery points) and the worst multiplicity.
- ``docs_dup_ratio_by_source`` — per-source exact-duplication profile
  (which ingest source is flooding the corpus with copies).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.numeric import round6
from ..sources.reads import read_parquet_sized
from ..sources.transcripts import (
    TRANSCRIPTS_SQL_CTE,
    read_events_as_transcripts,
)
from ..stages.keyed import map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# train_dedup_aware_split — duplicate clusters never straddle the split
# ---------------------------------------------------------------------------

def q_train_dedup_aware_split(sf_dir: str):
    """80/20 split keyed on the exact-duplicate cluster REPRESENTATIVE
    (min doc_id per text): duplicates of a validation doc can never leak
    into train. ONE text-keyed exchange (all copies of a text are
    co-partitioned, so the representative and the bucket are
    partition-local); the bucket is the engine's deterministic
    splitmix64 hash — stable under any parallelism."""
    from .queries_relational import split_bucket

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "rep_id": pa.array([], pa.int64()),
             "split": pa.array([], pa.string())}
        )
        if part.num_rows == 0:
            return empty
        text = np.asarray(part["text"].combine_chunks(), dtype=object)
        doc = np.asarray(part["doc_id"].combine_chunks().cast(pa.int64()))
        inv, _uniq = pd.factorize(text)
        rep = np.full(len(_uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(rep, inv, doc)
        rep_row = rep[inv]
        bucket = split_bucket(rep_row)
        split = np.where(bucket < 80, "train", "validation")
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "rep_id": pa.array(rep_row, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return map_partitions_by_key(ds, "text", fn, num_parts=NUM_PARTS)


def _dedup_split_sql() -> str:
    from .queries_relational import splitmix64_bucket_sql

    return f"""
WITH base AS (
    SELECT doc_id, CAST(MIN(doc_id) OVER (PARTITION BY text) AS BIGINT)
           AS rep
    FROM documents
),
{splitmix64_bucket_sql('rep', 'base')}
SELECT doc_id, rep AS rep_id,
       CASE WHEN __bucket < 80 THEN 'train' ELSE 'validation' END AS split
FROM __s5
"""


# ---------------------------------------------------------------------------
# conv_concurrent_turns — timestamp-collision profile per conversation
# ---------------------------------------------------------------------------

def q_conv_concurrent_turns(sf_dir: str):
    """Per conversation: how many timestamps carry MORE than one turn
    (branch / retry / concurrent-delivery points) and the worst
    multiplicity — the transcript-hygiene signal that decides whether
    (ts) alone can order a conversation or (ts, turn_idx) is required.
    ONE keyed exchange, segmented counting."""
    ds = read_events_as_transcripts(sf_dir)

    def fn(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"conv_id": pa.array([], pa.string()),
             "n_collision_ts": pa.array([], pa.int64()),
             "max_multiplicity": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        conv = np.asarray(part["conv_id"].combine_chunks(), dtype=object)
        ts = np.asarray(part["ts"].combine_chunks().cast(pa.int64()))
        c_inv, c_uniq = pd.factorize(conv)
        # exact (conv, ts) grouping via lexsort — no hashed keys
        order = np.lexsort((ts, c_inv))
        ci, tv = c_inv[order], ts[order]
        seg = np.concatenate(([True], (ci[1:] != ci[:-1]) | (tv[1:] != tv[:-1])))
        gid = np.cumsum(seg) - 1
        mult = np.bincount(gid)
        g_conv = ci[np.flatnonzero(seg)]
        coll = (mult > 1).astype(np.int64)
        n_conv = len(c_uniq)
        n_coll = np.zeros(n_conv, np.int64)
        np.add.at(n_coll, g_conv, coll)
        mx = np.zeros(n_conv, np.int64)
        np.maximum.at(mx, g_conv, mult)
        return pa.table(
            {
                "conv_id": pa.array(c_uniq.astype(str), pa.string()),
                "n_collision_ts": pa.array(n_coll, pa.int64()),
                "max_multiplicity": pa.array(mx, pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "conv_id", fn, num_parts=NUM_PARTS)


CONV_CONCURRENT_TURNS_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
per_ts AS (
    SELECT conv_id, ts, COUNT(*)::BIGINT AS m
    FROM transcripts GROUP BY 1, 2
)
SELECT conv_id,
       CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_collision_ts,
       CAST(MAX(m) AS BIGINT) AS max_multiplicity
FROM per_ts
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# docs_dup_ratio_by_source — per-source exact-duplication profile
# ---------------------------------------------------------------------------

def q_docs_dup_ratio_by_source(sf_dir: str):
    """Per ingest source: document count, how many of its documents are
    exact duplicates of ANY corpus document (global text multiplicity
    > 1 — cross-source copies count), and the ratio. One text-keyed
    exchange computes global multiplicities partition-locally; a
    fixed-cardinality source fold finishes."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partial(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"source": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int64()),
             "n_dup_docs": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        text = np.asarray(part["text"].combine_chunks(), dtype=object)
        src = np.asarray(part["source"].combine_chunks(), dtype=object)
        t_inv, t_uniq = pd.factorize(text)
        mult = np.bincount(t_inv)
        is_dup = (mult[t_inv] > 1).astype(np.int64)
        s_inv, s_uniq = pd.factorize(src)
        n = np.bincount(s_inv).astype(np.int64)
        nd = np.zeros(len(s_uniq), np.int64)
        np.add.at(nd, s_inv, is_dup)
        return pa.table(
            {
                "source": pa.array(s_uniq.astype(str), pa.string()),
                "n_docs": pa.array(n, pa.int64()),
                "n_dup_docs": pa.array(nd, pa.int64()),
            }
        )

    folded = (
        map_partitions_by_key(ds, "text", partial, num_parts=NUM_PARTS)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_dup_docs", alias_name="n_dup_docs"))
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "n_docs": t["n_docs"].combine_chunks().cast(pa.int64()),
                "n_dup_docs": t["n_dup_docs"].combine_chunks().cast(
                    pa.int64()
                ),
                "dup_ratio": pa.array(
                    round6(
                        np.asarray(t["n_dup_docs"].combine_chunks()).astype(
                            np.float64
                        )
                        / np.asarray(t["n_docs"].combine_chunks()).astype(
                            np.float64
                        )
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


DOCS_DUP_RATIO_BY_SOURCE_SQL = """
WITH mult AS (
    SELECT text, COUNT(*)::BIGINT AS m FROM documents GROUP BY 1
)
SELECT d.source,
       COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(CASE WHEN mult.m > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_docs,
       ROUND(CAST(SUM(CASE WHEN mult.m > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_ratio
FROM documents d JOIN mult USING (text)
GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "train_dedup_aware_split": (
        q_train_dedup_aware_split,
        _dedup_split_sql(),
    ),
    "conv_concurrent_turns": (q_conv_concurrent_turns,
                              CONV_CONCURRENT_TURNS_SQL),
    "docs_dup_ratio_by_source": (
        q_docs_dup_ratio_by_source,
        DOCS_DUP_RATIO_BY_SOURCE_SQL,
    ),
}

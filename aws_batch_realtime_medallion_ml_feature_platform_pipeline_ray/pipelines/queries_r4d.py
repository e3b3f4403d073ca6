"""Round-4 operator additions, batch 4 (oracle-exact, DuckDB twins).

- ``conv_tool_call_stats``   — per-tool usage profile over agent
  transcripts: call counts, conversations touched, and how often a tool
  turn is immediately followed by an error turn (the agentic
  tool-reliability signal).
- ``events_lateness_by_day`` — daily watermark report: events, late
  arrivals, worst and total lateness behind the per-user running high
  watermark (operationalizes ``events_watermark_lag`` into the report a
  pipeline owner actually reads).
- ``docs_head_middle_tail``  — CCNet-style quality terciles: rank
  documents by unigram cross-entropy (deterministic (score, doc_id)
  tie-break) and bucket into head/middle/tail thirds — the classic
  pretraining-corpus stratification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round6
from ..sources.reads import read_parquet_sized
from ..sources.transcripts import (
    TRANSCRIPTS_SQL_CTE,
    read_events_as_transcripts,
)
from ..stages.keyed import map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# conv_tool_call_stats — tool reliability over transcripts
# ---------------------------------------------------------------------------

def q_conv_tool_call_stats(sf_dir: str):
    """Per tool: total calls, distinct conversations, and calls whose
    IMMEDIATE next turn in the conversation is an error turn. ONE
    conv-keyed exchange (successor lookup needs conversation order);
    per-tool partials fold through a tiny fixed-cardinality aggregate."""
    from ray.data.aggregate import Sum

    from .queries import _conv_order

    ds = read_events_as_transcripts(sf_dir)

    def partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"tool": pa.array([], pa.string()),
             "n_calls": pa.array([], pa.int64()),
             "n_convs": pa.array([], pa.int64()),
             "n_error_next": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return empty
        order, _k, _ts, seg_start = _conv_order(tbl)
        tool_arr = tbl["tool"].combine_chunks().take(pa.array(order))
        tool = np.asarray(tool_arr, dtype=object)
        role = np.asarray(
            tbl["role"].combine_chunks().take(pa.array(order)), dtype=object
        )
        conv = np.asarray(
            tbl["conv_id"].combine_chunks().take(pa.array(order)),
            dtype=object,
        )
        n = len(order)
        has_tool = np.asarray(pc.is_valid(tool_arr))
        next_err = np.zeros(n, dtype=bool)
        if n > 1:
            same_conv = ~seg_start[1:]
            next_err[:-1] = same_conv & (role[1:] == "error")
        rows = has_tool
        if not rows.any():
            return empty
        tl = tool[rows].astype(str)
        cv = conv[rows]
        ne = next_err[rows].astype(np.int64)
        inv, uniq = pd.factorize(tl)
        calls = np.bincount(inv).astype(np.int64)
        errs = np.zeros(len(uniq), np.int64)
        np.add.at(errs, inv, ne)
        # distinct convs per tool: distinct (tool, conv) pairs
        pair_key = np.char.add(np.char.add(tl, "\x1f"), cv.astype(str))
        p_inv, p_uniq = pd.factorize(pair_key)
        first = np.zeros(len(p_uniq), np.int64)
        first[p_inv[::-1]] = np.arange(len(p_inv) - 1, -1, -1)
        convs = np.bincount(inv[first], minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "tool": pa.array(uniq.astype(str), pa.string()),
                "n_calls": pa.array(calls, pa.int64()),
                "n_convs": pa.array(convs, pa.int64()),
                "n_error_next": pa.array(errs, pa.int64()),
            }
        )

    # conv-keyed partition: a conversation never splits, so the distinct
    # (tool, conv) partials never double-count across partitions
    partials = map_partitions_by_key(ds, "conv_id", partial,
                                     num_parts=NUM_PARTS)
    folded = partials.groupby("tool").aggregate(
        Sum("n_calls", alias_name="n_calls"),
        Sum("n_convs", alias_name="n_convs"),
        Sum("n_error_next", alias_name="n_error_next"),
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "tool": t["tool"],
                "n_calls": t["n_calls"].combine_chunks().cast(pa.int64()),
                "n_convs": t["n_convs"].combine_chunks().cast(pa.int64()),
                "n_error_next": t["n_error_next"].combine_chunks().cast(
                    pa.int64()
                ),
                "error_next_rate": pa.array(
                    round6(
                        np.asarray(
                            t["n_error_next"].combine_chunks()
                        ).astype(np.float64)
                        / np.asarray(t["n_calls"].combine_chunks()).astype(
                            np.float64
                        )
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


CONV_TOOL_CALL_STATS_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
seq AS (
    SELECT conv_id, tool,
           lead(role) OVER (PARTITION BY conv_id
                            ORDER BY ts, event_id) AS next_role
    FROM transcripts
)
SELECT tool,
       COUNT(*)::BIGINT AS n_calls,
       COUNT(DISTINCT conv_id)::BIGINT AS n_convs,
       CAST(SUM(CASE WHEN next_role = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_error_next,
       ROUND(CAST(SUM(CASE WHEN next_role = 'error' THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS error_next_rate
FROM seq
WHERE tool IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_lateness_by_day — the daily watermark report
# ---------------------------------------------------------------------------

def q_events_lateness_by_day(sf_dir: str):
    """Per event-day: arrivals, how many were late behind the per-user
    running high watermark (arrival order = event_id), the worst
    lateness and the total late seconds — the report that sizes a real
    pipeline's allowed-lateness window (reference parses
    watermark_delay_minutes and never uses it; here it is measurable).
    ONE user-keyed exchange for the watermark walk, then a tiny per-day
    fold."""
    from ray.data.aggregate import Max, Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def partial(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"day": pa.array([], pa.string()),
             "n_events": pa.array([], pa.int64()),
             "n_late": pa.array([], pa.int64()),
             "max_late_s": pa.array([], pa.float64()),
             "sum_late_s": pa.array([], pa.float64())}
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
        runmax = pd.Series(ts).groupby(seg_id).cummax().to_numpy(np.int64)
        late_us = runmax - ts
        day = np.asarray(
            pc.strftime(
                part["ts"].combine_chunks().take(pa.array(order)),
                format="%Y-%m-%d",
            ),
            dtype=object,
        )
        inv, uniq = pd.factorize(day)
        n = np.bincount(inv).astype(np.int64)
        nl = np.zeros(len(uniq), np.int64)
        np.add.at(nl, inv, (late_us > 0).astype(np.int64))
        mx = np.zeros(len(uniq), np.int64)
        np.maximum.at(mx, inv, late_us)
        sm = np.zeros(len(uniq), np.int64)
        np.add.at(sm, inv, late_us)
        return pa.table(
            {
                "day": pa.array(uniq.astype(str), pa.string()),
                "n_events": pa.array(n, pa.int64()),
                "n_late": pa.array(nl, pa.int64()),
                "max_late_s": pa.array(mx.astype(np.float64) / 1e6,
                                        pa.float64()),
                "sum_late_s": pa.array(sm.astype(np.float64) / 1e6,
                                        pa.float64()),
            }
        )

    partials = map_partitions_by_key(ds, "user_id", partial,
                                     num_parts=NUM_PARTS)
    folded = partials.groupby("day").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_late", alias_name="n_late"),
        Max("max_late_s", alias_name="max_late_s"),
        Sum("sum_late_s", alias_name="sum_late_s"),
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "day": t["day"],
                "n_events": t["n_events"].combine_chunks().cast(pa.int64()),
                "n_late": t["n_late"].combine_chunks().cast(pa.int64()),
                "max_late_s": pa.array(
                    round6(np.asarray(t["max_late_s"].combine_chunks())),
                    pa.float64(),
                ),
                "sum_late_s": pa.array(
                    round6(np.asarray(t["sum_late_s"].combine_chunks())),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_LATENESS_BY_DAY_SQL = """
WITH w AS (
    SELECT ts,
           epoch_us(MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS UNBOUNDED PRECEDING))
           - epoch_us(ts) AS late_us
    FROM events
)
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*)::BIGINT AS n_events,
       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late,
       ROUND(CAST(MAX(late_us) AS DOUBLE) / 1000000.0, 6) AS max_late_s,
       ROUND(CAST(SUM(late_us) AS DOUBLE) / 1000000.0, 6) AS sum_late_s
FROM w
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# docs_head_middle_tail — CCNet-style quality terciles
# ---------------------------------------------------------------------------

def q_docs_head_middle_tail(sf_dir: str):
    """CCNet-style corpus stratification (Wenzek et al. 2020 — public):
    rank documents by unigram cross-entropy (docs_unigram_xent's exact
    signal) with a deterministic (score, doc_id) tie-break and cut into
    head / middle / tail thirds (head = lowest perplexity). The rank is
    an exact distributed global row number (range-partitioned sort +
    O(#blocks) offset scan via
    :func:`stages.globalorder.with_global_rank` — never one row per
    document on the driver)."""
    from .queries_r2l import q_docs_unigram_xent
    from ..stages.globalorder import with_global_rank

    import ray.data as rd

    scored = q_docs_unigram_xent(sf_dir).materialize()
    n = scored.count()  # metadata-only on a materialized dataset
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.string())}
            )
        )
    third = -(-n // 3)  # ceil

    ranked = with_global_rank(
        scored, ["xent", "doc_id"], descending=[False, False],
        rank_col="__r",
    )

    def bucketize(t: pa.Table) -> pa.Table:
        r0 = np.asarray(t["__r"].combine_chunks()) - 1  # 0-based
        bucket = np.where(
            r0 < third, "head", np.where(r0 < 2 * third, "middle", "tail")
        )
        return pa.table(
            {"doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
             "bucket": pa.array(bucket, pa.string())}
        )

    return ranked.map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    )


def _hmt_sql() -> str:
    from .queries_r2l import DOCS_UNIGRAM_XENT_SQL

    inner = DOCS_UNIGRAM_XENT_SQL.strip().rstrip(";")
    return f"""
WITH scored AS ({inner}),
ranked AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY xent, doc_id) - 1 AS r,
           COUNT(*) OVER () AS n
    FROM scored
)
SELECT doc_id,
       CASE WHEN r < CAST(CEIL(n / 3.0) AS BIGINT) THEN 'head'
            WHEN r < 2 * CAST(CEIL(n / 3.0) AS BIGINT) THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
"""


REGISTRY: dict[str, tuple] = {
    "conv_tool_call_stats": (q_conv_tool_call_stats,
                             CONV_TOOL_CALL_STATS_SQL),
    "events_lateness_by_day": (q_events_lateness_by_day,
                               EVENTS_LATENESS_BY_DAY_SQL),
    "docs_head_middle_tail": (q_docs_head_middle_tail, _hmt_sql()),
}

"""Round-4 operator additions, batch 6 (oracle-exact, DuckDB twins).

- ``docs_token_coverage_curve`` — cumulative corpus-token coverage of
  the top-K vocabulary at K in {10, 100, 1000} (deterministic
  (freq desc, term asc) ranking): the number a tokenizer/vocab-size
  decision starts from.
- ``conv_repeat_loops`` — degenerate-generation detector over agent
  transcripts: per conversation, adjacent identical-text turn pairs and
  the longest identical-text run (the "model stuck in a loop" signal).
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

COVERAGE_KS = (10, 100, 1000)


def q_docs_token_coverage_curve(sf_dir: str):
    """Coverage(K) = share of all corpus token occurrences captured by
    the K most frequent tokens (ties broken by term asc — fully
    deterministic). Plan: per-batch tf partials → term-keyed exact fold
    → per-partition top-max(K) partials (each partition holds complete
    term totals, so its local top-K is a valid candidate set) → bounded
    driver merge of #parts x K rows; the total token count is one tiny
    sum. No stage materializes the vocabulary."""
    import ray

    from ray.data.aggregate import Sum

    from .queries_extra import _tf_partial

    kmax = max(COVERAGE_KS)
    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    tf_rows = ds.map_batches(_tf_partial, batch_format="pyarrow",
                             zero_copy_batch=True)

    total = int(
        tf_rows.map_batches(
            lambda t: pa.table(
                {"s": pa.array(
                    [int(np.asarray(t["tf"].combine_chunks()).sum())]
                    if t.num_rows else [0], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).aggregate(Sum("s", alias_name="s"))["s"]
        or 0
    )

    def local_top(part: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"term": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        term = np.asarray(
            part["term"].combine_chunks().cast(pa.large_string()),
            dtype=object,
        )
        tf = np.asarray(part["tf"].combine_chunks())
        inv, uniq = pd.factorize(term)
        c = np.zeros(len(uniq), np.int64)
        np.add.at(c, inv, tf)
        order = np.lexsort((uniq.astype(str), -c))[:kmax]
        return pa.table(
            {"term": pa.array(uniq[order].astype(str), pa.string()),
             "c": pa.array(c[order], pa.int64())}
        )

    tops = map_partitions_by_key(tf_rows, "term", local_top,
                                 num_parts=NUM_PARTS)
    import ray.data as rd

    tbls = [t for t in ray.get(tops.to_arrow_refs()) if t.num_rows]
    rows = {"k": [], "covered_tokens": [], "total_tokens": [],
            "coverage": []}
    if tbls and total:
        allt = pa.concat_tables(tbls, promote_options="default")
        term = np.asarray(allt["term"].combine_chunks(), dtype=object)
        c = np.asarray(allt["c"].combine_chunks())
        order = np.lexsort((term.astype(str), -c))
        c_sorted = c[order]
        cum = np.cumsum(c_sorted)
        for k in COVERAGE_KS:
            cov = int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
            rows["k"].append(k)
            rows["covered_tokens"].append(cov)
            rows["total_tokens"].append(total)
            rows["coverage"].append(float(round6(cov / total)))
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rows["k"], pa.int64()),
                "covered_tokens": pa.array(rows["covered_tokens"], pa.int64()),
                "total_tokens": pa.array(rows["total_tokens"], pa.int64()),
                "coverage": pa.array(rows["coverage"], pa.float64()),
            }
        )
    )


DOCS_TOKEN_COVERAGE_SQL = f"""
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT term, COUNT(*)::BIGINT AS c FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM tf),
ranked AS (
    SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rn FROM tf
)
SELECT CAST(k.k AS BIGINT) AS k,
       CAST(SUM(r.c) AS BIGINT) AS covered_tokens,
       (SELECT total FROM tot) AS total_tokens,
       ROUND(CAST(SUM(r.c) AS DOUBLE) / (SELECT total FROM tot), 6)
           AS coverage
FROM (VALUES {", ".join(f"({k})" for k in COVERAGE_KS)}) k(k)
JOIN ranked r ON r.rn <= k.k
GROUP BY 1
"""


def q_conv_repeat_loops(sf_dir: str):
    """Per conversation: adjacent identical-text turn pairs and the
    longest run of identical consecutive texts (turn order) — the
    degenerate-loop signal that flags stuck agents / repeated
    generations for exclusion from training data. ONE keyed exchange,
    segmented run-length pass."""
    from .queries import _conv_order

    ds = read_events_as_transcripts(sf_dir)

    def fn(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"conv_id": pa.array([], pa.string()),
             "n_stuck_pairs": pa.array([], pa.int64()),
             "max_repeat_run": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return empty
        order, _k, _ts, seg_start = _conv_order(tbl)
        text = np.asarray(
            tbl["text"].combine_chunks().take(pa.array(order)), dtype=object
        )
        conv = np.asarray(
            tbl["conv_id"].combine_chunks().take(pa.array(order)),
            dtype=object,
        )
        n = len(order)
        same = np.zeros(n, dtype=bool)
        if n > 1:
            same[1:] = (~seg_start[1:]) & (text[1:] == text[:-1])
        # run ids: new run at every segment start or text change
        run_start = ~same
        run_id = np.cumsum(run_start) - 1
        run_len = np.bincount(run_id)
        c_inv, c_uniq = pd.factorize(conv)
        n_conv = len(c_uniq)
        stuck = np.zeros(n_conv, np.int64)
        np.add.at(stuck, c_inv, same.astype(np.int64))
        run_conv = c_inv[np.flatnonzero(run_start)]
        mx = np.zeros(n_conv, np.int64)
        np.maximum.at(mx, run_conv, run_len)
        return pa.table(
            {
                "conv_id": pa.array(c_uniq.astype(str), pa.string()),
                "n_stuck_pairs": pa.array(stuck, pa.int64()),
                "max_repeat_run": pa.array(mx, pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "conv_id", fn, num_parts=NUM_PARTS)


CONV_REPEAT_LOOPS_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
seq AS (
    SELECT conv_id, turn_idx,
           CASE WHEN text IS NOT DISTINCT FROM lag(text) OVER w
                THEN 1 ELSE 0 END AS same
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
runs AS (
    SELECT conv_id, turn_idx, same,
           SUM(1 - same) OVER (PARTITION BY conv_id ORDER BY turn_idx
                               ROWS UNBOUNDED PRECEDING) AS run_id
    FROM seq
),
runlen AS (
    SELECT conv_id, run_id, COUNT(*)::BIGINT AS rl
    FROM runs GROUP BY 1, 2
)
SELECT s.conv_id,
       CAST(SUM(s.same) AS BIGINT) AS n_stuck_pairs,
       (SELECT MAX(rl) FROM runlen r WHERE r.conv_id = s.conv_id)
           AS max_repeat_run
FROM seq s
GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "docs_token_coverage_curve": (
        q_docs_token_coverage_curve,
        DOCS_TOKEN_COVERAGE_SQL,
    ),
    "conv_repeat_loops": (q_conv_repeat_loops, CONV_REPEAT_LOOPS_SQL),
}

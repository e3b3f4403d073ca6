"""Fused per-partition gold feature pass (the flagship operator).

One hash partition (all turns of ~thousands of conversations, one Arrow
table) goes in; the full gold feature vector per turn comes out. Everything
the reference computes per card (``spark_jobs/silver_and_gold.py:82-133``:
4 trailing RANGE-window aggregates + projection) plus the north-rule
extensions (lag/lead, gap sessionization, per-role rolling counts) runs as
ONE sorted, segmented, fully-vectorized numpy pass — no per-conversation
Python loop, no second shuffle.

Window semantics (parity-critical, SURVEY.md §7.3):
- trailing RANGE frame ``ts' in [ts - delta, ts]`` inclusive both ends,
  duplicate-ts peers included (Spark/DuckDB RANGE ... CURRENT ROW);
- ``tool_count_24h`` is the exact distinct count the reference *intended*
  (silver_and_gold.py:103 — Spark cannot run countDistinct over a window);
- lag/lead/session are ordered by ``(ts, turn_idx)`` within ``conv_id``;
- dedup keeps the first row per ``(conv_id, turn_idx)`` in ``(ts,
  ingest_ts)`` order — deterministic where the reference's
  ``dropDuplicates`` (silver_and_gold.py:66) is not.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import windows as W
from .. import schema as S

TS_NULL = np.int64(np.iinfo(np.int64).min)


def _sort_partition(
    tbl: pa.Table, key: str, ts_col: str, tiebreak: str | None
) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Sort a partition by (key, ts, tiebreak) and return
    (sorted_table, ts_int64, seg_start)."""
    key_codes = pc.dictionary_encode(tbl[key].combine_chunks()).indices
    kc = np.asarray(key_codes).astype(np.int64)
    ts = np.asarray(tbl[ts_col].combine_chunks().cast(pa.int64()))
    keys = [ts, kc] if tiebreak is None else [
        np.asarray(tbl[tiebreak].combine_chunks().cast(pa.int64())),
        ts,
        kc,
    ]
    order = np.lexsort(keys)
    out = tbl.take(pa.array(order))
    kc = kc[order]
    ts = ts[order]
    seg_start = W.segment_starts(kc)
    return out, ts, seg_start


def dedup_first(
    tbl: pa.Table,
    key_cols: list[str],
    order_cols: list[str],
) -> pa.Table:
    """Deterministic exact dedup: keep the first row per ``key_cols`` in
    ``order_cols`` order (reference D1, silver_and_gold.py:66, made
    deterministic). Vectorized: lexsort + first-of-run mask."""
    if tbl.num_rows == 0:
        return tbl
    k = len(key_cols)
    arrays = []
    for i, c in enumerate(key_cols + order_cols):
        col = tbl[c].combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            enc = pc.dictionary_encode(col)
            codes = np.asarray(enc.indices).astype(np.int64)
            if i >= k:
                # ORDER columns need value order, not first-appearance
                # order: remap dictionary codes to sorted-value ranks
                dic = np.asarray(enc.dictionary)
                rank = np.empty(len(dic), np.int64)
                rank[np.argsort(dic, kind="mergesort")] = np.arange(len(dic))
                codes = rank[codes]
            arrays.append(codes)
        else:
            arrays.append(np.asarray(col.cast(pa.int64())))
    # lexsort: last key is primary → reverse; sort by keys then order cols
    order = np.lexsort(tuple(reversed(arrays)))
    keys_sorted = [a[order] for a in arrays[:k]]
    first = np.zeros(tbl.num_rows, dtype=bool)
    first[0] = True
    neq = np.zeros(tbl.num_rows - 1, dtype=bool)
    for a in keys_sorted:
        neq |= a[1:] != a[:-1]
    first[1:] = neq
    return tbl.take(pa.array(order[first]))


@dataclass
class GoldConfig:
    gap_us: int = S.SESSION_GAP_US
    w_short: int = S.H1
    w_distinct: int = S.H24
    w_long: int = S.D7
    role_counts: tuple[str, ...] = ("user", "assistant")
    compute_turn_idx: bool = False  # derive turn_idx as row_number when absent
    tiebreak_col: str | None = None  # sort tiebreaker when computing turn_idx
    keep_text: bool = True
    dedup: bool = True
    extra_passthrough: tuple[str, ...] = field(default_factory=tuple)


def gold_features_partition(tbl: pa.Table, cfg: GoldConfig = GoldConfig()) -> pa.Table:
    """Compute the full gold feature vector for one hash partition of
    transcript turns. Input columns: conv_id, ts, role, text, tool and
    (unless cfg.compute_turn_idx) turn_idx. Output: FIXTURES.md §3 layout,
    grouped by conversation (in first-appearance order — NOT conv_id
    value order) and sorted by (ts, turn_idx) within each conversation;
    consumers needing a global order sort explicitly."""
    if tbl.num_rows == 0:
        return _empty_gold(cfg, tbl.schema)

    if cfg.dedup and not cfg.compute_turn_idx:
        order_cols = ["ts"] + (["ingest_ts"] if "ingest_ts" in tbl.column_names else [])
        tbl = dedup_first(tbl, ["conv_id", "turn_idx"], order_cols)

    tiebreak = cfg.tiebreak_col if cfg.compute_turn_idx else "turn_idx"
    tbl, ts, seg_start = _sort_partition(tbl, "conv_id", "ts", tiebreak)
    n = tbl.num_rows
    seg_id = W.segment_ids(seg_start)

    if cfg.compute_turn_idx:
        arange = np.arange(n, dtype=np.int64)
        seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
        turn_idx = (arange - seg_first).astype(np.int32)
    else:
        turn_idx = np.asarray(tbl["turn_idx"].combine_chunks().cast(pa.int32()))

    max_delta = max(cfg.w_short, cfg.w_distinct, cfg.w_long)
    ts_adj = W.adjusted_ts(ts, seg_id, max_delta)

    text = tbl["text"].combine_chunks()
    # fill_null(0): one null text must not become NaN — the prefix-sum
    # windowed_sum would poison chars_1h/avg_chars_7d for EVERY later row
    # in the partition (and DuckDB's SUM skips NULLs, i.e. counts 0)
    chars = np.asarray(
        pc.utf8_length(text).cast(pa.int64()).fill_null(0)
    ).astype(np.float64)
    role = tbl["role"].combine_chunks()

    l1, r1 = W.trailing_bounds(ts_adj, cfg.w_short)
    l24, r24 = W.trailing_bounds(ts_adj, cfg.w_distinct)
    l7, r7 = W.trailing_bounds(ts_adj, cfg.w_long)

    turns_1h = W.windowed_count(l1, r1)
    chars_1h = W.windowed_sum(chars, l1, r1)
    cnt7 = W.windowed_count(l7, r7)
    avg_chars_7d = W.windowed_sum(chars, l7, r7) / cnt7

    tool = tbl["tool"].combine_chunks()
    tool_valid = np.asarray(pc.is_valid(tool))
    tool_codes = np.asarray(pc.dictionary_encode(tool).indices.fill_null(-1)).astype(
        np.int64
    )
    tool_count_24h = W.windowed_distinct(tool_codes, tool_valid, l24, r24)

    role_cols = {}
    for rv in cfg.role_counts:
        mask = np.asarray(pc.equal(role, rv).fill_null(False))
        role_cols[f"{rv}_turns_1h"] = W.windowed_count_where(mask, l1, r1)

    lag1 = W.lag_within(ts, seg_start, TS_NULL)
    lead1 = W.lead_within(ts, seg_start, TS_NULL)
    session_id, session_turn_idx, gap_prev = W.sessionize(ts, seg_start, cfg.gap_us)
    gap_null = gap_prev < 0
    gap_s = pa.array(
        np.where(gap_null, 0, gap_prev).astype(np.float64) / S.US_PER_S,
        pa.float64(),
        mask=gap_null,
    )

    ts_arr = pa.array(ts, pa.int64()).cast(pa.timestamp("us"))
    dt = pc.strftime(ts_arr, format="%Y-%m-%d")
    event_time = ts.astype(np.float64) / S.US_PER_S

    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "conv_id": tbl["conv_id"],
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": role,
    }
    cols["tool"] = tool
    if cfg.keep_text:
        cols["text"] = text
    cols.update(
        {
            "ts": ts_arr,
            "dt": dt,
            "event_time": pa.array(event_time),
            "turns_1h": pa.array(turns_1h),
            "chars_1h": pa.array(chars_1h),
            "tool_count_24h": pa.array(tool_count_24h),
            "avg_chars_7d": pa.array(avg_chars_7d),
        }
    )
    for name, arr in role_cols.items():
        cols[name] = pa.array(arr)
    cols["lag1_ts"] = _ts_with_null(lag1)
    cols["lead1_ts"] = _ts_with_null(lead1)
    cols["gap_s"] = gap_s
    cols["session_id"] = pa.array(session_id, pa.int64())
    cols["session_turn_idx"] = pa.array(session_turn_idx, pa.int32())
    for c in cfg.extra_passthrough:
        cols[c] = tbl[c]
    return pa.table(cols)


def _ts_with_null(vals: np.ndarray) -> pa.Array:
    mask = vals == TS_NULL
    return pa.array(np.where(mask, 0, vals), pa.int64(), mask=mask).cast(
        pa.timestamp("us")
    )


def _empty_gold(cfg: GoldConfig, src_schema: pa.Schema | None = None) -> pa.Table:
    names = ["conv_id", "turn_idx", "role", "tool"]
    types = [pa.string(), pa.int32(), pa.string(), pa.string()]
    if cfg.keep_text:
        names.append("text")
        types.append(pa.string())
    names += ["ts", "dt", "event_time", "turns_1h", "chars_1h", "tool_count_24h",
              "avg_chars_7d"]
    types += [pa.timestamp("us"), pa.string(), pa.float64(), pa.int64(),
              pa.float64(), pa.int64(), pa.float64()]
    for rv in cfg.role_counts:
        names.append(f"{rv}_turns_1h")
        types.append(pa.int64())
    names += ["lag1_ts", "lead1_ts", "gap_s", "session_id", "session_turn_idx"]
    types += [pa.timestamp("us"), pa.timestamp("us"), pa.float64(), pa.int64(),
              pa.int32()]
    # passthrough columns must appear here too, or an empty partition's
    # schema diverges from non-empty ones and the block union fails
    for c in cfg.extra_passthrough:
        names.append(c)
        types.append(
            src_schema.field(c).type if src_schema is not None else pa.string()
        )
    return pa.table(
        {n: pa.array([], t) for n, t in zip(names, types)}
    )

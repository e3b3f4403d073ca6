"""B14 — salted skew repartition for mega-conversations, with exact stitch.

The fused gold pass (stages/featurize.py) assigns all rows of a ``conv_id``
to one hash partition; a mega-conversation (10^7+ turns) then bounds the
whole job's wall-clock and a single worker's heap. Per SURVEY.md §2.7/B14
we split hot conversations into **time-bucket shards** `(conv_id,
ts // bucket_us)` processed in parallel, and make every feature *exact*:

- **Trailing RANGE windows** (turns_1h / chars_1h / tool_count_24h /
  avg_chars_7d / per-role counts): each shard receives a **prefix copy**
  of the previous bucket's last ``Δmax`` of rows (Δmax = the longest
  window), duplicated at tag time with ``__prefix=1``. Window state is
  computed over prefix∪real rows; only real rows are emitted. Since
  ``bucket_us >= Δmax``, a row's window never reaches past the prefix.
- **lag/lead/gap/sessionization/turn_idx** continue across shard
  boundaries via a driver-side **stitch scan** over tiny per-shard
  summaries (first/last ts, rows, session breaks, trailing run): O(number
  of hot shards), not O(rows). Session-break exactness argument: a break
  needs only the immediate predecessor row; the predecessor is the last
  prefix row when the prefix is non-empty, and when the prefix is empty
  the true gap exceeds ``Δmax >= gap_us`` so the row *is* a break.

Partitioning assumption (documented per the task statement): duplicate
``(conv_id, turn_idx)`` rows are deduplicated exactly when they carry the
same ``ts`` (same bucket); duplicates of the same turn whose timestamps
differ by more than one bucket are not collapsed across shards — the
medallion pipeline dedups upstream of salting, so this only affects
direct salted runs over raw bronze.

Everything is one extra small driver round-trip vs the unsalted pass:
tag(+overlap copies) → one shuffle → Phase A (fused vectorized pass with
embedded summaries) → collect summaries (tiny) → stitch map. Non-hot
conversations take the identical code path with a whole-conv "shard" and
no corrections, so salted output == unsalted output bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as S
from ..functions import windows as W
from .featurize import GoldConfig, TS_NULL, dedup_first, _ts_with_null
from .keyed import PART_COL, hash_key, splitmix64, tune_shuffle_context

SHARD_COL = "__shard"     # int64 time-bucket id; NON_SALTED for cold convs
PREFIX_COL = "__prefix"   # int8: 1 = overlap copy (window state only)
NON_SALTED = np.int64(-1)
_BUCKET_MIX = np.uint64(0x9E3779B97F4A7C15)

# internal Phase-A output columns consumed by the stitch pass
_RIDX = "__ridx"          # row index among real rows of the shard
_B = "__b"                # cumulative session breaks among real rows
_SUM_COLS = (
    "__sum_n_real", "__sum_breaks", "__sum_trail",
    "__sum_first_ts", "__sum_last_ts", "__sum_no_prefix",
)
_INTERNAL = (SHARD_COL, _RIDX, _B) + _SUM_COLS


def detect_hot_keys(ds, key: str, threshold: int, *,
                    num_parts: int | None = None) -> pa.Array:
    """Exact heavy-hitter detection in two cheap passes: per-batch
    ``value_counts`` (pre-aggregation inside map_batches — the combiner
    pattern) → the engine's keyed exchange (stages/keyed.py) folding the
    (key, cnt) partials per hash partition with an Arrow-native
    ``group_by`` → filter ``>= threshold`` INSIDE the partition.

    Per-key counts are a data-scaling fold (distinct ``conv_id`` grows
    with the corpus), so this deliberately avoids
    ``Dataset.groupby(key).sum()`` — measured at 65-78 s vs <1 s for the
    keyed-exchange fold on ~1.2 M groups (see stages/keyed.fold_by_keys).
    Payload into the shuffle is one row per distinct key per block, never
    one per input row; the driver collect is the HOT key list only
    (bounded by rows/threshold, tiny by construction)."""
    from .keyed import map_partitions_by_key

    def partial_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[key].combine_chunks())
        return pa.table({key: vc.field("values"), "cnt": vc.field("counts")})

    partials = ds.select_columns([key]).map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold_and_filter(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        g = part.group_by([key]).aggregate([("cnt", "sum")])
        return pa.table(
            {key: g[key], "cnt": g["cnt_sum"].cast(pa.int64())}
        ).filter(pc.greater_equal(g["cnt_sum"], threshold))

    hot = map_partitions_by_key(
        partials, key, fold_and_filter, num_parts=num_parts
    ).select_columns([key])
    tbl = hot.take_all()
    if not tbl:
        return pa.array([], pa.string())
    return pa.Table.from_pylist(tbl).column(key).combine_chunks()


def _tag_salted(
    batch: pa.Table,
    key: str,
    num_parts: int,
    hot_parts: int,
    hot_keys: pa.Array,
    bucket_us: int,
    overlap_us: int,
) -> pa.Table:
    """Vectorized tag stage: cold rows → hash(conv) % num_parts; hot rows →
    dedicated shard partitions keyed by (conv, ts-bucket), plus overlap
    copies of each bucket's last ``overlap_us`` into the next bucket."""
    n = batch.num_rows
    h = hash_key(batch[key])
    part = (h % np.uint64(num_parts)).astype(np.int32)
    shard = np.full(n, NON_SALTED, dtype=np.int64)
    prefix = np.zeros(n, dtype=np.int8)

    hot_mask = np.asarray(pc.is_in(batch[key], value_set=hot_keys))
    out = batch
    if hot_mask.any():
        ts = np.asarray(batch["ts"].combine_chunks().cast(pa.int64()))
        bucket = ts // bucket_us
        hot_part = num_parts + (
            splitmix64(h + np.uint64(_BUCKET_MIX) * bucket.astype(np.uint64))
            % np.uint64(hot_parts)
        ).astype(np.int32)
        part = np.where(hot_mask, hot_part, part)
        shard = np.where(hot_mask, bucket, shard)

        # overlap copies: hot rows within overlap_us of their bucket's end
        # go once more to bucket+1 as window-state prefix
        near_end = hot_mask & (ts >= (bucket + 1) * bucket_us - overlap_us)
        if near_end.any():
            idx = np.flatnonzero(near_end)
            cp = batch.take(pa.array(idx))
            cp_bucket = bucket[idx] + 1
            cp_part = num_parts + (
                splitmix64(h[idx] + np.uint64(_BUCKET_MIX) * cp_bucket.astype(np.uint64))
                % np.uint64(hot_parts)
            ).astype(np.int32)
            part = np.concatenate([part, cp_part])
            shard = np.concatenate([shard, cp_bucket])
            prefix = np.concatenate([prefix, np.ones(len(idx), dtype=np.int8)])
            out = pa.concat_tables([batch, cp])

    out = out.append_column(SHARD_COL, pa.array(shard, pa.int64()))
    out = out.append_column(PREFIX_COL, pa.array(prefix, pa.int8()))
    return out.append_column(PART_COL, pa.array(part, pa.int32()))


def gold_partition_phase_a(tbl: pa.Table, cfg: GoldConfig) -> pa.Table:
    """Fused pass over one hash partition where segments are
    ``(conv_id, __shard)``. Prefix rows feed window/lag/session state but
    are not emitted. Hot shards embed their stitch summary on their first
    real row (``__sum_*`` columns, null elsewhere)."""
    if tbl.num_rows == 0:
        return _empty_phase_a(cfg)

    if cfg.dedup and not cfg.compute_turn_idx:
        order_cols = ["ts"] + (["ingest_ts"] if "ingest_ts" in tbl.column_names else [])
        tbl = dedup_first(tbl, ["conv_id", SHARD_COL, "turn_idx", PREFIX_COL], order_cols)

    # ---- sort by (conv, shard, ts, tiebreak); prefix rows precede real
    # rows of a shard naturally (their ts < bucket start) ----
    conv_codes = np.asarray(
        pc.dictionary_encode(tbl["conv_id"].combine_chunks()).indices
    ).astype(np.int64)
    shard = np.asarray(tbl[SHARD_COL].combine_chunks())
    ts = np.asarray(tbl["ts"].combine_chunks().cast(pa.int64()))
    tiebreak = cfg.tiebreak_col if cfg.compute_turn_idx else "turn_idx"
    tb = np.asarray(tbl[tiebreak].combine_chunks().cast(pa.int64()))
    order = np.lexsort((tb, ts, shard, conv_codes))
    tbl = tbl.take(pa.array(order))
    conv_codes, shard, ts = conv_codes[order], shard[order], ts[order]

    n = tbl.num_rows
    seg_start = W.segment_starts(conv_codes) | np.concatenate(
        [[True], shard[1:] != shard[:-1]]
    )
    seg_id = W.segment_ids(seg_start)
    prefix = np.asarray(tbl[PREFIX_COL].combine_chunks()).astype(bool)
    real = ~prefix

    # ---- windows over prefix∪real, evaluated at every row ----
    max_delta = max(cfg.w_short, cfg.w_distinct, cfg.w_long)
    ts_adj = W.adjusted_ts(ts, seg_id, max_delta)
    text = tbl["text"].combine_chunks()
    # fill_null(0): mirror featurize.py — one null text must not
    # NaN-poison the prefix-sum windows of every later row in the shard
    chars = np.asarray(
        pc.utf8_length(text).cast(pa.int64()).fill_null(0)
    ).astype(np.float64)
    role = tbl["role"].combine_chunks()

    l1, r1 = W.trailing_bounds(ts_adj, cfg.w_short)
    l24, r24 = W.trailing_bounds(ts_adj, cfg.w_distinct)
    l7, r7 = W.trailing_bounds(ts_adj, cfg.w_long)
    turns_1h = W.windowed_count(l1, r1)
    chars_1h = W.windowed_sum(chars, l1, r1)
    avg_chars_7d = W.windowed_sum(chars, l7, r7) / W.windowed_count(l7, r7)
    tool = tbl["tool"].combine_chunks()
    tool_valid = np.asarray(pc.is_valid(tool))
    tool_codes = np.asarray(
        pc.dictionary_encode(tool).indices.fill_null(-1)
    ).astype(np.int64)
    tool_count_24h = W.windowed_distinct(tool_codes, tool_valid, l24, r24)
    role_cols = {}
    for rv in cfg.role_counts:
        mask = np.asarray(pc.equal(role, rv).fill_null(False))
        role_cols[f"{rv}_turns_1h"] = W.windowed_count_where(mask, l1, r1)

    # ---- lag/lead/gap in full space (prefix rows are true predecessors) --
    lag1 = W.lag_within(ts, seg_start, TS_NULL)
    lead1 = W.lead_within(ts, seg_start, TS_NULL)
    gap_prev = np.empty(n, dtype=np.int64)
    gap_prev[1:] = ts[1:] - ts[:-1]
    gap_prev[0] = -1
    gap_prev[seg_start] = -1
    breaks = seg_start | (gap_prev > cfg.gap_us)

    # ---- compact to real rows; per-shard numbering ----
    ridx_all = _running_index(real, seg_start)  # index among real rows of seg
    arange = np.arange(n, dtype=np.int64)
    seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
    br = breaks & real
    cum_br = np.cumsum(br, dtype=np.int64)
    cum_before_seg = cum_br[seg_first] - br[seg_first]
    b_all = cum_br - cum_before_seg  # cumulative real breaks within segment

    # session_turn_idx for rows at/after their shard's first real break;
    # rows with b == 0 are finalized by the stitch (trail_in + ridx)
    last_br_ridx = _segmented_maximum_accumulate(
        np.where(br, ridx_all, np.int64(-1)), seg_start
    )
    sturn_all = np.where(b_all > 0, ridx_all - last_br_ridx, ridx_all).astype(np.int64)

    if cfg.compute_turn_idx:
        turn_idx_all = ridx_all.astype(np.int32)
    else:
        turn_idx_all = np.asarray(tbl["turn_idx"].combine_chunks().cast(pa.int32()))

    # ---- subset to real rows ----
    keep = np.flatnonzero(real)
    out_tbl = tbl.take(pa.array(keep))
    m = len(keep)
    ts_r = ts[keep]
    ts_arr = pa.array(ts_r, pa.int64()).cast(pa.timestamp("us"))
    gap_r = gap_prev[keep]
    gap_null = gap_r < 0
    gap_s = pa.array(
        np.where(gap_null, 0, gap_r).astype(np.float64) / S.US_PER_S,
        pa.float64(),
        mask=gap_null,
    )

    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "conv_id": out_tbl["conv_id"],
        "turn_idx": pa.array(turn_idx_all[keep], pa.int32()),
        "role": out_tbl["role"],
        "tool": out_tbl["tool"],
    }
    if cfg.keep_text:
        cols["text"] = out_tbl["text"]
    cols.update(
        {
            "ts": ts_arr,
            "dt": pc.strftime(ts_arr, format="%Y-%m-%d"),
            "event_time": pa.array(ts_r.astype(np.float64) / S.US_PER_S),
            "turns_1h": pa.array(turns_1h[keep]),
            "chars_1h": pa.array(chars_1h[keep]),
            "tool_count_24h": pa.array(tool_count_24h[keep]),
            "avg_chars_7d": pa.array(avg_chars_7d[keep]),
        }
    )
    for name, arr in role_cols.items():
        cols[name] = pa.array(arr[keep])
    cols["lag1_ts"] = _ts_with_null(lag1[keep])
    cols["lead1_ts"] = _ts_with_null(lead1[keep])
    cols["gap_s"] = gap_s
    # session_id here is local cumulative-break count b; the stitch turns it
    # into the global 0-based id (B_prior + b - 1); non-salted rows get
    # b - 1 directly (B_prior = 0).
    cols["session_id"] = pa.array(b_all[keep], pa.int64())
    cols["session_turn_idx"] = pa.array(sturn_all[keep].astype(np.int32), pa.int32())
    for c in cfg.extra_passthrough:
        cols[c] = out_tbl[c]

    # ---- internals + embedded summaries ----
    shard_r = shard[keep]
    cols[SHARD_COL] = pa.array(shard_r, pa.int64())
    cols[_RIDX] = pa.array(ridx_all[keep], pa.int64())
    cols[_B] = pa.array(b_all[keep], pa.int64())

    hot = shard_r != NON_SALTED
    seg_start_r = W.segment_starts(seg_id[keep])
    is_first = seg_start_r & hot
    summary = _shard_summaries(
        seg_id[keep], seg_start_r, ts_r, b_all[keep], ridx_all[keep],
        prefix_present=_seg_has_prefix(seg_id, prefix, keep),
    )
    for name, (vals, typ) in summary.items():
        cols[name] = pa.array(
            np.where(is_first, vals, 0).astype(typ),
            mask=~is_first,
        )
    return pa.table(cols)


def _running_index(real: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    """0-based index among real rows within each segment (prefix rows get
    the index of the next real row; unused for them)."""
    n = len(real)
    cum = np.cumsum(real, dtype=np.int64)
    arange = np.arange(n, dtype=np.int64)
    seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
    cum_before_seg = cum[seg_first] - real[seg_first]
    return np.where(real, cum - cum_before_seg - 1, cum - cum_before_seg)


def _seg_has_prefix(seg_id: np.ndarray, prefix: np.ndarray, keep: np.ndarray) -> np.ndarray:
    """Per kept (real) row: did this row's segment contain prefix rows?"""
    n_seg = int(seg_id[-1]) + 1 if len(seg_id) else 0
    has = np.zeros(n_seg, dtype=bool)
    np.logical_or.at(has, seg_id, prefix)
    return has[seg_id[keep]]


def _shard_summaries(seg_id_r, seg_start_r, ts_r, b_r, ridx_r, *, prefix_present):
    """Per-segment summary values, broadcast to every row (only the first
    row's value is kept by the caller): n_real, total breaks, trailing run
    (-1 = no real break in shard), first/last real ts, no-prefix flag."""
    m = len(seg_id_r)
    if m == 0:
        z = np.zeros(0, dtype=np.int64)
        return {
            "__sum_n_real": (z, np.int64), "__sum_breaks": (z, np.int64),
            "__sum_trail": (z, np.int64), "__sum_first_ts": (z, np.int64),
            "__sum_last_ts": (z, np.int64),
            "__sum_no_prefix": (np.zeros(0, dtype=np.int8), np.int8),
        }
    arange = np.arange(m, dtype=np.int64)
    seg_first = np.maximum.accumulate(np.where(seg_start_r, arange, 0))
    # per-row index of the last row of its segment
    ends = np.concatenate([np.flatnonzero(seg_start_r)[1:] - 1, [m - 1]])
    seg_last = ends[np.cumsum(seg_start_r) - 1]
    n_real = ridx_r[seg_last] + 1
    breaks_total = b_r[seg_last]
    # trailing run: size of the open session at shard end = rows from the
    # last real break (inclusive) to the end; -1 if no break at all
    trail = np.where(
        breaks_total > 0,
        n_real - _last_break_ridx(seg_start_r, seg_last, b_r, ridx_r),
        -1,
    )
    return {
        "__sum_n_real": (n_real, np.int64),
        "__sum_breaks": (breaks_total, np.int64),
        "__sum_trail": (trail, np.int64),
        "__sum_first_ts": (ts_r[seg_first], np.int64),
        "__sum_last_ts": (ts_r[seg_last], np.int64),
        "__sum_no_prefix": ((~prefix_present).astype(np.int8), np.int8),
    }


def _last_break_ridx(seg_start_mask, seg_last, b_r, ridx_r):
    """ridx of the segment's last session-break row (valid only where the
    segment has >= 1 break). b is the cumulative break count, so break rows
    are exactly where b steps up; take the segmented running max of their
    ridx and read it at each segment's last row."""
    m = len(b_r)
    prev_b = np.empty(m, dtype=np.int64)
    prev_b[1:] = b_r[:-1]
    prev_b[0] = 0
    prev_b[seg_start_mask] = 0
    is_break = b_r > prev_b
    cand = np.where(is_break, ridx_r, np.int64(-1))
    run = _segmented_maximum_accumulate(cand, seg_start_mask)
    return run[seg_last]


def _segmented_maximum_accumulate(x: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    """np.maximum.accumulate restarted at each segment start."""
    n = len(x)
    if n == 0:
        return x
    lo = np.int64(np.iinfo(np.int64).min // 4)
    arange = np.arange(n, dtype=np.int64)
    seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
    # offset trick: add a huge per-segment ramp so maxima never cross segs
    seg_id = np.cumsum(seg_start, dtype=np.int64) - 1
    # x values are small (ridx) — offset by seg_id * big
    big = np.int64(1) << np.int64(40)
    n_seg = int(seg_id[-1]) + 1
    if n_seg * int(big) + max(int(x.max(initial=0)), 0) >= (1 << 62):
        # same explicit guard as functions/windows.py adjusted_ts — numpy
        # int64 wraps silently past this (ADVICE r1)
        raise OverflowError(
            f"segment offset ramp would overflow int64: {n_seg} segments"
        )
    shifted = x.astype(np.int64) + seg_id * big
    acc = np.maximum.accumulate(np.where(x == -1, lo + seg_id * big, shifted))
    out = acc - seg_id * big
    out[out < -1] = -1
    return out


# ---------------------------------------------------------------------------
# stitch
# ---------------------------------------------------------------------------

def _build_corrections(summary: pd.DataFrame) -> pd.DataFrame:
    """Driver-side scan over hot shards (sorted per conv by bucket id):
    per-shard offsets for turn_idx / session_id, session-run carry-in, and
    boundary lag/lead patches. O(#shards)."""
    rows = []
    for conv, g in summary.groupby("conv_id", sort=False):
        g = g.sort_values(SHARD_COL)
        b_prior = 0
        turn_off = 0
        trail_in = 0
        prev_last_ts = None
        recs = g.to_dict("records")
        for i, r in enumerate(recs):
            rows.append(
                {
                    "conv_id": conv,
                    SHARD_COL: r[SHARD_COL],
                    "turn_off": turn_off,
                    "b_prior": b_prior,
                    "trail_in": trail_in,
                    "prev_last_ts": prev_last_ts,
                    "next_first_ts": recs[i + 1]["__sum_first_ts"] if i + 1 < len(recs) else None,
                    "no_prefix": bool(r["__sum_no_prefix"]),
                    "n_real": r["__sum_n_real"],
                }
            )
            if r["__sum_breaks"] > 0:
                trail_in = r["__sum_trail"]
            else:
                trail_in = trail_in + r["__sum_n_real"]
            b_prior += int(r["__sum_breaks"])
            turn_off += int(r["__sum_n_real"])
            prev_last_ts = int(r["__sum_last_ts"])
    return pd.DataFrame(
        rows,
        columns=["conv_id", SHARD_COL, "turn_off", "b_prior", "trail_in",
                 "prev_last_ts", "next_first_ts", "no_prefix", "n_real"],
    )


def _apply_corrections(batch: pa.Table, corr: pd.DataFrame, compute_turn_idx: bool) -> pa.Table:
    """Final vectorized map: join tiny corrections on (conv_id, shard),
    apply offsets and boundary patches, drop internal columns.

    The join is Arrow/numpy-native (VERDICT r3 §next-4): one
    ``pc.index_in`` resolves each batch row's conv against the
    correction table's distinct convs (Arrow's C++ hash lookup — no
    per-batch ``to_pandas()``), then a packed (conv_code * K + shard)
    int64 searchsorted probe finds the correction row. The pandas work
    left is O(corr) prep of the tiny correction frame itself."""
    sid = np.asarray(batch[_B].combine_chunks()).astype(np.int64) - 1
    sturn = np.asarray(batch["session_turn_idx"].combine_chunks()).astype(np.int64)
    turn = np.asarray(batch["turn_idx"].combine_chunks()).astype(np.int64)
    lag = np.asarray(batch["lag1_ts"].combine_chunks().cast(pa.int64()).fill_null(TS_NULL))
    lead = np.asarray(batch["lead1_ts"].combine_chunks().cast(pa.int64()).fill_null(TS_NULL))
    gap_arr = batch["gap_s"].combine_chunks()
    gap = np.asarray(gap_arr.fill_null(np.nan))

    if len(corr):
        # corr-side (tiny) index: conv -> dense code, packed with shard
        conv_vals = corr["conv_id"].to_numpy(dtype=object)
        conv_uniq, corr_code = np.unique(conv_vals, return_inverse=True)
        shards_c = corr[SHARD_COL].to_numpy(np.int64)
        K = int(shards_c.max()) + 2 if len(shards_c) else 1
        packed_c = corr_code.astype(np.int64) * K + shards_c
        c_order = np.argsort(packed_c)
        packed_sorted = packed_c[c_order]
        c_turn_off = corr["turn_off"].to_numpy(np.int64)[c_order]
        c_b_prior = corr["b_prior"].to_numpy(np.int64)[c_order]
        c_trail_in = corr["trail_in"].to_numpy(np.int64)[c_order]
        c_n_real = corr["n_real"].to_numpy(np.int64)[c_order]
        pl_ser = corr["prev_last_ts"]
        nf_ser = corr["next_first_ts"]
        c_has_prev = pl_ser.notna().to_numpy()[c_order]
        c_prev = pl_ser.fillna(0).astype(np.int64).to_numpy()[c_order]
        c_has_next = nf_ser.notna().to_numpy()[c_order]
        c_next = nf_ser.fillna(0).astype(np.int64).to_numpy()[c_order]
        c_no_prefix = corr["no_prefix"].to_numpy(dtype=bool)[c_order]

        # batch-side probe: Arrow hash lookup of conv, then packed key
        ci_arr = pc.index_in(
            batch["conv_id"].combine_chunks(),
            value_set=pa.array(conv_uniq, pa.string()),
        )
        ci = np.asarray(ci_arr.cast(pa.int64()).fill_null(-1))
        shard_b = np.asarray(batch[SHARD_COL].combine_chunks()).astype(np.int64)
        probe = ci * np.int64(K) + shard_b
        pos = np.searchsorted(packed_sorted, probe)
        pos_c = np.minimum(pos, len(packed_sorted) - 1)
        hit = (ci >= 0) & (packed_sorted[pos_c] == probe)
        if hit.any():
            b = sid + 1
            ridx = np.asarray(batch[_RIDX].combine_chunks()).astype(np.int64)
            b_prior = np.where(hit, c_b_prior[pos_c], 0)
            turn_off = np.where(hit, c_turn_off[pos_c], 0)
            trail_in = np.where(hit, c_trail_in[pos_c], 0)
            n_real = np.where(hit, c_n_real[pos_c], 0)
            no_prefix = hit & c_no_prefix[pos_c]

            sid = np.where(hit, b_prior + b - 1, sid)
            lead_run = hit & (b == 0)
            sturn = np.where(lead_run, trail_in + ridx, sturn)
            if compute_turn_idx:
                turn = np.where(hit, turn + turn_off, turn)
            # boundary patches
            has_prev = hit & c_has_prev[pos_c]
            first_fix = no_prefix & has_prev & (ridx == 0)
            if first_fix.any():
                pl = c_prev[pos_c]
                ts_int = np.asarray(batch["ts"].combine_chunks().cast(pa.int64()))
                lag = np.where(first_fix, pl, lag)
                gap = np.where(first_fix, (ts_int - pl) / S.US_PER_S, gap)
            has_next = hit & c_has_next[pos_c]
            last_fix = has_next & (ridx == n_real - 1)
            if last_fix.any():
                lead = np.where(last_fix, c_next[pos_c], lead)

    out = batch.drop_columns(list(_INTERNAL))
    out = _set(out, "turn_idx", pa.array(turn.astype(np.int32), pa.int32()))
    out = _set(out, "session_id", pa.array(sid, pa.int64()))
    out = _set(out, "session_turn_idx", pa.array(sturn.astype(np.int32), pa.int32()))
    out = _set(out, "lag1_ts", _ts_with_null(lag))
    out = _set(out, "lead1_ts", _ts_with_null(lead))
    gap_null = np.isnan(gap)
    out = _set(
        out, "gap_s",
        pa.array(np.where(gap_null, 0.0, gap), pa.float64(), mask=gap_null),
    )
    return out


def _set(tbl: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    return tbl.set_column(tbl.schema.get_field_index(name), name, arr)


def gold_features_salted(
    ds,
    cfg: GoldConfig | None = None,
    *,
    num_parts: int | None = None,
    hot_threshold: int = 2_000_000,
    hot_parts: int | None = None,
    bucket_us: int | None = None,
    hot_keys: pa.Array | None = None,
):
    """The salted gold pipeline: detect hot convs → tag (+overlap copies)
    → one shuffle → Phase A fused pass → collect tiny summaries → stitch
    map. With no hot keys it degenerates to the unsalted single-shuffle
    plan (identical output)."""
    cfg = cfg or GoldConfig()
    tune_shuffle_context()
    if num_parts is None:
        from .keyed import _bytes_hint, derive_num_parts

        num_parts = derive_num_parts(_bytes_hint(ds))
    max_delta = max(cfg.w_short, cfg.w_distinct, cfg.w_long)
    bucket_us = bucket_us or max(max_delta, cfg.gap_us)
    if bucket_us < max(max_delta, cfg.gap_us):
        raise ValueError("bucket_us must be >= max window / session gap")
    hot_parts = hot_parts or num_parts

    if hot_keys is None:
        hot_keys = detect_hot_keys(ds, "conv_id", hot_threshold)

    # overlap must cover BOTH the longest window and the session gap: the
    # session-break argument needs "no prefix row => true gap > gap_us",
    # which only holds when the prefix spans >= gap_us (ADVICE r1)
    overlap_us = max(max_delta, cfg.gap_us)
    tagged = ds.map_batches(
        lambda t: _tag_salted(
            t, "conv_id", num_parts, hot_parts, hot_keys, bucket_us, overlap_us
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    phase_a = tagged.groupby(PART_COL).map_groups(
        lambda g: gold_partition_phase_a(g.drop_columns([PART_COL]), cfg),
        batch_format="pyarrow",
    )

    if len(hot_keys) == 0:
        return phase_a.map_batches(
            lambda t: _apply_corrections(t, pd.DataFrame(), cfg.compute_turn_idx),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    # The stitch needs EVERY shard summary before its first output batch —
    # an inherent barrier. Instead of pinning the whole phase-A output in
    # the object store (round-1 materialize(), VERDICT r1 §next-9), spool
    # it to parquet: the write streams with backpressure and frees blocks
    # as it goes; summaries come back via a column-pruned read (tiny
    # bytes), and the stitch map streams over the spool.
    import atexit
    import shutil
    import tempfile

    import ray.data as rd

    spool = tempfile.mkdtemp(prefix="salted_phase_a_", dir="/tmp")
    # the returned dataset reads the spool lazily, so it cannot be
    # deleted here — reclaim it at interpreter exit (a long-lived driver
    # otherwise accumulates one gold-sized directory per salted run)
    atexit.register(shutil.rmtree, spool, ignore_errors=True)
    phase_a.write_parquet(spool)
    summary_tbl = (
        rd.read_parquet(spool, columns=["conv_id", SHARD_COL, *_SUM_COLS])
        .map_batches(_extract_summaries_pruned, batch_format="pyarrow",
                     zero_copy_batch=True)
        .take_all()
    )
    summary = pd.DataFrame(summary_tbl) if summary_tbl else pd.DataFrame(
        columns=["conv_id", SHARD_COL, *(_SUM_COLS)]
    )
    corr = _build_corrections(summary)
    return rd.read_parquet(spool).map_batches(
        lambda t: _apply_corrections(t, corr, cfg.compute_turn_idx),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _extract_summaries_pruned(batch: pa.Table) -> pa.Table:
    """Same as _extract_summaries but for the column-pruned spool read
    (batch already holds exactly the summary columns)."""
    mask = pc.and_(
        pc.is_valid(batch["__sum_n_real"]),
        pc.not_equal(batch[SHARD_COL], pa.scalar(int(NON_SALTED), pa.int64())),
    )
    return batch.filter(mask)


def _empty_phase_a(cfg: GoldConfig) -> pa.Table:
    from .featurize import _empty_gold

    base = _empty_gold(cfg)
    cols = {n: base[n] for n in base.column_names}
    cols[SHARD_COL] = pa.array([], pa.int64())
    cols[_RIDX] = pa.array([], pa.int64())
    cols[_B] = pa.array([], pa.int64())
    for name in _SUM_COLS:
        typ = pa.int8() if name == "__sum_no_prefix" else pa.int64()
        cols[name] = pa.array([], typ)
    return pa.table(cols)

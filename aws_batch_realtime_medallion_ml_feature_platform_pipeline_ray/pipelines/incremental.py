"""Incremental stream runs: O(new turns) per run, not O(history).

``run_stream`` (pipelines/medallion.py) recomputes each partition's gold
from its FULL silver history every run — exact, but at 10^12 turns a
10-minute micro-batch must not reprocess a year of data. This module adds
the streaming path the north star describes ("sessionization carrying
session state across batch boundaries in actor-pool stateful stages"):
per-partition state carried across RUNS, new turns processed against a
bounded window of carried rows.

Per hash partition the state holds
- ``rows.parquet`` — each conversation's trailing ``Δmax`` (= longest
  window, 7 d) of silver rows: exactly the context any future row's
  trailing window can reach. Memory/state is O(active window per conv),
  the posture SURVEY.md §7.3 demands — never O(history);
- ``summary.parquet`` — per conv: cumulative session-break count
  (``b_prior``), open-session run length (``trail_in``), ``last_ts``,
  and the conv's last emitted gold row (so a later run can re-emit it
  with its then-unknown ``lead1_ts`` filled).

A run then is: dedup new rows against state keys → conversations whose
new turns all arrive after ``last_ts`` take the incremental pass (state
rows enter as ``__prefix=1`` window context — the same machinery as the
salted shard overlap, stages/salted.py — and session/turn numbering is
stitched with the same correction map, fed from the carried summary
instead of a shard scan); conversations that receive a turn OLDER than
``last_ts`` (late beyond the state window's ordering assumption) fall
back to exact full recompute from the partition's local silver history —
the per-entity blast radius of B12. ``lead1_ts`` is a future-peeking
feature: when new turns arrive for a conv, its previously-final last row
is re-emitted with ``lead1_ts`` (and nothing else) updated; readers merge
run files keeping the newest version per ``(conv_id, turn_idx)``
(:func:`read_gold_incremental`).

Equivalence is tested by splitting bronze into several ingest windows and
comparing the merged incremental gold with one full-history run
(tests/test_incremental.py), late arrivals included.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as S
from ..stages.featurize import GoldConfig, dedup_first, gold_features_partition
from ..stages.keyed import PART_COL, add_partition_col
from ..stages.salted import (
    PREFIX_COL,
    SHARD_COL,
    _apply_corrections,
    gold_partition_phase_a,
)
from ..state import manifest as M
from .medallion import normalize_bronze
from ..sources.reads import read_parquet_sized

RUN_SHARD = np.int64(0)  # constant shard id: one "shard" per conv per run


def _pack(conv_codes: np.ndarray, turn: np.ndarray) -> np.ndarray:
    return (conv_codes.astype(np.int64) << np.int64(32)) | turn.astype(np.int64)


def _state_paths(state_root: str, key: str) -> tuple[str, str]:
    d = os.path.join(state_root, f"part={key}")
    return os.path.join(d, "rows.parquet"), os.path.join(d, "summary.parquet")


def _empty_summary() -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "b_prior": pa.array([], pa.int64()),
            "trail_in": pa.array([], pa.int64()),
            "last_ts": pa.array([], pa.int64()),
        }
    )


def process_partition_incremental(
    group: pa.Table,
    *,
    run_seq: int,
    silver_root: str,
    gold_root: str,
    state_root: str,
    cfg: GoldConfig,
    run_id: str,
) -> pa.Table:
    """One partition, one run: silver append + incremental gold + state
    rollover. Returns per-partition metrics row."""
    import pyarrow.parquet as pq

    part = int(group[PART_COL][0].as_py())
    key = f"{part:05d}"
    g = group.drop_columns([PART_COL])
    g = dedup_first(g, ["conv_id", "turn_idx"], ["ts", "ingest_ts"])

    # ---- silver append (same layout as the full pipeline) ----
    ts_arr = g["ts"].combine_chunks()
    dt = pc.strftime(ts_arr, format="%Y-%m-%d")
    silver_tbl = g.append_column("dt", dt).select(
        [f.name for f in S.SILVER] + ["ingest_ts"]
    )
    silver_file = os.path.join(silver_root, f"part={key}", f"run-{run_id}.parquet")
    M.atomic_write_table(silver_tbl, silver_file)

    rows_path, summary_path = _state_paths(state_root, key)
    has_state = os.path.exists(summary_path)
    state_rows = pq.read_table(rows_path) if has_state else None
    summary = pq.read_table(summary_path) if has_state else _empty_summary()
    sdf = summary.to_pandas()
    tail_lookup = None
    tail_path = os.path.join(state_root, f"part={key}", "tails.parquet")
    if os.path.exists(tail_path):
        tail_lookup = pq.read_table(tail_path)

    # ---- drop new rows already processed (by (conv, turn_idx) key) ----
    silver_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    new = g.select(silver_cols + (["ingest_ts"] if "ingest_ts" in g.column_names else []))
    if state_rows is not None and state_rows.num_rows:
        seen_keys = _row_keys(state_rows)
        fresh = pc.invert(pc.is_in(_row_keys(new), value_set=seen_keys))
        new = new.filter(fresh)

    # ---- split convs: incremental (monotone) vs late (full recompute) ----
    late_convs: set[str] = set()
    if new.num_rows and len(sdf):
        conv_arr = new["conv_id"].combine_chunks()
        enc = pc.dictionary_encode(conv_arr)
        codes = np.asarray(enc.indices).astype(np.int64)
        ts_new = np.asarray(new["ts"].combine_chunks().cast(pa.int64()))
        n_codes = int(codes.max()) + 1
        min_ts = np.full(n_codes, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(min_ts, codes, ts_new)
        uniq_convs = enc.dictionary.to_pylist()
        last_ts_of = dict(zip(sdf["conv_id"], sdf["last_ts"]))
        for code, c in enumerate(uniq_convs):
            lt = last_ts_of.get(c)
            if lt is not None and int(min_ts[code]) < int(lt):
                late_convs.add(c)

    max_delta = max(cfg.w_short, cfg.w_distinct, cfg.w_long)
    outputs = []

    if new.num_rows and late_convs:
        new_inc = new.filter(
            pc.invert(
                pc.is_in(new["conv_id"], value_set=pa.array(sorted(late_convs)))
            )
        )
    else:
        new_inc = new

    if new_inc.num_rows:
        # assemble prefix (state rows of these convs) + new rows
        parts = []
        if state_rows is not None and state_rows.num_rows:
            keep = pc.is_in(
                state_rows["conv_id"],
                value_set=pa.array(sorted(set(new_inc["conv_id"].to_pylist()))),
            )
            prefix_tbl = state_rows.filter(keep)
            if prefix_tbl.num_rows:
                parts.append(_tag(prefix_tbl.select(silver_cols), prefix=1))
        parts.append(_tag(new_inc.select(silver_cols), prefix=0))
        combined = pa.concat_tables(parts, promote_options="default")
        cfg_inc = GoldConfig(
            gap_us=cfg.gap_us, w_short=cfg.w_short, w_distinct=cfg.w_distinct,
            w_long=cfg.w_long, role_counts=cfg.role_counts,
            compute_turn_idx=False, keep_text=cfg.keep_text, dedup=False,
        )
        phase_a = gold_partition_phase_a(combined, cfg_inc)
        corr = _summary_to_corrections(sdf, state_rows)
        harvested = _harvest_summary(phase_a)
        gold_new = _apply_corrections(phase_a, corr, compute_turn_idx=False)
        outputs.append(gold_new)

        # tail updates: previously-final last rows gain their lead1_ts
        if tail_lookup is not None and tail_lookup.num_rows:
            outputs.append(
                _tail_updates(tail_lookup, harvested, gold_new.schema)
            )
        sdf = _roll_summary(sdf, harvested)
    else:
        harvested = pd.DataFrame(
            columns=["conv_id", "n_breaks", "trail", "last_ts", "first_ts", "n_real"]
        )

    # ---- late convs: exact full recompute from local silver history ----
    if late_convs:
        hist_files = sorted(
            glob.glob(os.path.join(silver_root, f"part={key}", "run-*.parquet"))
        )
        hist = pa.concat_tables(
            [pq.read_table(f) for f in hist_files], promote_options="default"
        )
        hist = hist.filter(
            pc.is_in(hist["conv_id"], value_set=pa.array(sorted(late_convs)))
        )
        hist = dedup_first(hist, ["conv_id", "turn_idx"], ["ts", "ingest_ts"])
        full = gold_features_partition(hist, cfg)
        outputs.append(full)
        sdf = _rebuild_summary_from_full(sdf, full)

    gold_out = (
        pa.concat_tables(outputs, promote_options="default")
        if outputs
        else None
    )
    if gold_out is not None and gold_out.num_rows:
        gold_file = os.path.join(gold_root, f"part={key}", f"run-{run_id}.parquet")
        run_col = pa.array(np.full(gold_out.num_rows, run_seq, np.int64))
        M.atomic_write_table(gold_out.append_column("__run_seq", run_col), gold_file)

    # ---- roll state rows: trailing max_delta per conv ----
    _write_state(
        rows_path, summary_path, tail_path, state_rows, new, sdf,
        gold_out, max_delta, silver_cols, late_convs,
    )
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "new_rows": pa.array([new.num_rows], pa.int64()),
            "late_convs": pa.array([len(late_convs)], pa.int64()),
        }
    )


def _row_keys(tbl: pa.Table) -> pa.Array:
    """Vectorized (conv_id, turn_idx) composite key."""
    return pc.binary_join_element_wise(
        tbl["conv_id"].combine_chunks(),
        pc.cast(tbl["turn_idx"].combine_chunks(), pa.string()),
        "#",
    )


def _tag(tbl: pa.Table, prefix: int) -> pa.Table:
    n = tbl.num_rows
    tbl = tbl.append_column(SHARD_COL, pa.array(np.full(n, RUN_SHARD), pa.int64()))
    return tbl.append_column(
        PREFIX_COL, pa.array(np.full(n, prefix, np.int8), pa.int8())
    )


def _summary_to_corrections(sdf: pd.DataFrame, state_rows) -> pd.DataFrame:
    if not len(sdf):
        return pd.DataFrame()
    has_prefix_rows = set()
    if state_rows is not None and state_rows.num_rows:
        has_prefix_rows = set(state_rows["conv_id"].to_pylist())
    return pd.DataFrame(
        {
            "conv_id": sdf["conv_id"],
            SHARD_COL: int(RUN_SHARD),
            "turn_off": 0,
            "b_prior": sdf["b_prior"].astype(np.int64),
            "trail_in": sdf["trail_in"].astype(np.int64),
            "prev_last_ts": sdf["last_ts"].astype(object),
            "next_first_ts": None,
            "no_prefix": [c not in has_prefix_rows for c in sdf["conv_id"]],
            "n_real": np.int64(-1),  # never matches ridx -> no last-row fix
        }
    )


def _harvest_summary(phase_a: pa.Table) -> pd.DataFrame:
    """Per-conv shard summary embedded on first real rows of phase A."""
    mask = pc.is_valid(phase_a["__sum_n_real"])
    t = phase_a.select(
        ["conv_id", "__sum_n_real", "__sum_breaks", "__sum_trail",
         "__sum_first_ts", "__sum_last_ts"]
    ).filter(mask)
    return pd.DataFrame(
        {
            "conv_id": t["conv_id"].to_pylist(),
            "n_real": t["__sum_n_real"].to_pylist(),
            "n_breaks": t["__sum_breaks"].to_pylist(),
            "trail": t["__sum_trail"].to_pylist(),
            "first_ts": t["__sum_first_ts"].to_pylist(),
            "last_ts": t["__sum_last_ts"].to_pylist(),
        }
    )


def _roll_summary(sdf: pd.DataFrame, harvested: pd.DataFrame) -> pd.DataFrame:
    prior = {r["conv_id"]: r for r in sdf.to_dict("records")} if len(sdf) else {}
    for r in harvested.to_dict("records"):
        p = prior.get(r["conv_id"])
        b_prior = (p["b_prior"] if p else 0) + int(r["n_breaks"])
        if int(r["n_breaks"]) > 0:
            trail = int(r["trail"])
        else:
            trail = (p["trail_in"] if p else 0) + int(r["n_real"])
        prior[r["conv_id"]] = {
            "conv_id": r["conv_id"],
            "b_prior": b_prior,
            "trail_in": trail,
            "last_ts": int(r["last_ts"]),
        }
    return pd.DataFrame(
        list(prior.values()), columns=["conv_id", "b_prior", "trail_in", "last_ts"]
    )


def _rebuild_summary_from_full(sdf: pd.DataFrame, full: pa.Table) -> pd.DataFrame:
    """After a full per-conv recompute, rebuild that conv's carry state
    from the final gold rows (counts derivable per conv)."""
    df = full.select(["conv_id", "ts", "session_id", "session_turn_idx"]).to_pandas()
    recs = {r["conv_id"]: r for r in sdf.to_dict("records")} if len(sdf) else {}
    for conv, gdf in df.groupby("conv_id", sort=False):
        last = gdf.iloc[-1]
        recs[conv] = {
            "conv_id": conv,
            "b_prior": int(last["session_id"]) + 1,
            "trail_in": int(last["session_turn_idx"]) + 1,
            "last_ts": int(pd.Timestamp(gdf["ts"].max()).value // 1000),
        }
    return pd.DataFrame(
        list(recs.values()), columns=["conv_id", "b_prior", "trail_in", "last_ts"]
    )


def _tail_updates(tail_lookup: pa.Table, harvested: pd.DataFrame, schema) -> pa.Table:
    """Re-emit each stored tail row whose conv got new turns, with
    lead1_ts set to the conv's first new ts. All other columns unchanged."""
    first_ts_of = dict(zip(harvested["conv_id"], harvested["first_ts"]))
    keep = pc.is_in(
        tail_lookup["conv_id"],
        value_set=pa.array(sorted(first_ts_of), pa.string()),
    )
    t = tail_lookup.filter(keep)
    if not t.num_rows:
        return t.select(schema.names)
    lead = pa.array(
        np.array([int(first_ts_of[c]) for c in t["conv_id"].to_pylist()], np.int64),
        pa.int64(),
    ).cast(pa.timestamp("us"))
    t = t.set_column(t.schema.get_field_index("lead1_ts"), "lead1_ts", lead)
    return t.select(schema.names)


def _write_state(
    rows_path, summary_path, tail_path, state_rows, new, sdf,
    gold_out, max_delta, silver_cols, late_convs,
) -> None:
    import pyarrow.parquet as pq

    parts = []
    if state_rows is not None and state_rows.num_rows:
        parts.append(state_rows.select(silver_cols))
    if new.num_rows:
        parts.append(new.select(silver_cols))
    if not parts:
        return
    allr = pa.concat_tables(parts, promote_options="default")
    # trailing window per conv: keep rows with ts >= conv_last - max_delta
    conv = allr["conv_id"].combine_chunks()
    codes = np.asarray(pc.dictionary_encode(conv).indices).astype(np.int64)
    ts = np.asarray(allr["ts"].combine_chunks().cast(pa.int64()))
    n_codes = codes.max() + 1 if len(codes) else 0
    last = np.full(n_codes, np.iinfo(np.int64).min, np.int64)
    np.maximum.at(last, codes, ts)
    keep = ts >= last[codes] - max_delta
    rows_out = allr.filter(pa.array(keep))
    rows_out = dedup_first(rows_out, ["conv_id", "turn_idx"], ["ts"])
    M.atomic_write_table(rows_out, rows_path)

    M.atomic_write_table(pa.Table.from_pandas(sdf, preserve_index=False), summary_path)

    if gold_out is not None and gold_out.num_rows:
        # store each conv's final gold row for future lead1_ts repair
        gdf = gold_out
        conv_g = gdf["conv_id"].combine_chunks()
        codes_g = np.asarray(pc.dictionary_encode(conv_g).indices).astype(np.int64)
        ts_g = np.asarray(gdf["ts"].combine_chunks().cast(pa.int64()))
        ti_g = np.asarray(gdf["turn_idx"].combine_chunks().cast(pa.int64()))
        order = np.lexsort((-ti_g, -ts_g, codes_g))
        k = codes_g[order]
        first = np.zeros(len(k), dtype=bool)
        if len(k):
            first[0] = True
            first[1:] = k[1:] != k[:-1]
        tails_new = gdf.take(pa.array(order[first]))
        old = (
            pq.read_table(tail_path)
            if os.path.exists(tail_path)
            else None
        )
        if old is not None and old.num_rows:
            gone = pc.invert(
                pc.is_in(old["conv_id"], value_set=conv_g.unique())
            )
            tails_new = pa.concat_tables(
                [tails_new, old.filter(gone).select(tails_new.column_names)],
                promote_options="default",
            )
        M.atomic_write_table(tails_new, tail_path)


def run_stream_incremental(
    bronze_path: str,
    out_root: str,
    *,
    run_id: str,
    run_seq: int,
    processed_at: str,
    ingest_window: tuple | None = None,
    num_parts: int = 16,
    gold_cfg: GoldConfig | None = None,
) -> dict:
    """One incremental stream run over an ingest window."""
    import ray.data as rd

    silver_root = os.path.join(out_root, "silver")
    gold_root = os.path.join(out_root, "gold_inc")
    state_root = os.path.join(out_root, "state")
    cfg = gold_cfg or GoldConfig(dedup=False)

    ds = read_parquet_sized(bronze_path)
    ds = ds.map_batches(
        lambda t: normalize_bronze(t, processed_at=processed_at, window=ingest_window),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        lambda t: add_partition_col(t, "conv_id", num_parts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    stats = (
        ds.groupby(PART_COL)
        .map_groups(
            lambda grp: process_partition_incremental(
                grp,
                run_seq=run_seq,
                silver_root=silver_root,
                gold_root=gold_root,
                state_root=state_root,
                cfg=cfg,
                run_id=run_id,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return {
        "run_id": run_id,
        "partitions": len(stats),
        "new_rows": int(stats["new_rows"].sum()) if len(stats) else 0,
        "late_convs": int(stats["late_convs"].sum()) if len(stats) else 0,
    }


def read_gold_incremental(out_root: str) -> pa.Table:
    """Merge incremental run files: newest version per (conv, turn_idx)
    wins (tail rows re-emitted with lead1_ts are newer than originals)."""
    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(out_root, "gold_inc", "part=*", "run-*.parquet"))
    )
    tbls = [pq.read_table(f) for f in files]
    if not tbls:
        return None
    allt = pa.concat_tables(tbls, promote_options="default")
    # keep the LAST version: order by run_seq desc and keep first
    neg = pc.multiply(allt["__run_seq"], pa.scalar(-1, pa.int64()))
    allt = allt.set_column(
        allt.schema.get_field_index("__run_seq"), "__run_seq", neg
    )
    out = dedup_first(allt, ["conv_id", "turn_idx"], ["__run_seq"])
    return out.drop_columns(["__run_seq"])

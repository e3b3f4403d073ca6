"""Incremental stream runs: O(new turns) of feature compute per run.

``run_stream`` (pipelines/medallion.py) recomputes each partition's gold
from its FULL silver history every run — exact, but at 10^12 turns a
10-minute micro-batch must not reprocess a year of data. This module adds
the streaming path the north star describes ("sessionization carrying
session state across batch boundaries in actor-pool stateful stages"):
per-partition state carried across RUNS, new turns processed against a
bounded window of carried rows.

Per hash partition the state holds
- ``rows-*.parquet`` — each conversation's trailing ``Δmax`` (= longest
  window, 7 d) of silver rows: exactly the context any future row's
  trailing window can reach. O(active window per conv), never O(history);
- ``summary-*.parquet`` — per conv: cumulative session-break count
  (``b_prior``), open-session run length (``trail_in``), ``last_ts``.
  This is irreducible watermark METADATA (3 ints per conversation —
  the streaming analog of a per-key watermark store); per-run compute
  touching it is vectorized and the rewrite is one column-store scan;
- ``tails-*.parquet`` — per conv: the (conv_id, turn_idx) KEY of its
  last emitted gold row. No feature payload and no text lives in state:
  ``lead1_ts`` repair is emitted as a slim PATCH row (see below).

All three files are written with versioned names and committed by an
atomic ``_current.json`` pointer swap — a crash between file writes can
never leave mixed-generation state, and a Ray task retry re-reads the
old pointer and reproduces the identical run (every write is idempotent
by ``run_id``).

A run then is: classify new rows against state —
- rows whose (conv, turn_idx) key is already in the state window with
  the SAME ts are exact re-deliveries → dropped (at-least-once input);
- a key re-delivered with a DIFFERENT ts is a conflicting version → its
  conversation falls back to exact full recompute (the dedup contract
  "first (ts, ingest_ts) per key" may flip the winner);
- conversations whose fresh turns all arrive strictly after ``last_ts``
  take the incremental pass (state rows enter as ``__prefix=1`` window
  context — the same machinery as the salted shard overlap,
  stages/salted.py — and session/turn numbering is stitched with the
  same correction map, fed from the carried summary);
- a fresh turn at or before ``last_ts`` (including ties: an equal-ts
  peer belongs inside already-emitted rows' trailing RANGE windows)
  marks the conversation late → exact full recompute from the
  partition's local silver history, the per-entity blast radius of B12.

Only fresh and conflicting rows are appended to silver (exact
re-deliveries never duplicate the lake). ``lead1_ts`` is future-peeking:
when new turns arrive for a conv, a patch row ``(conv_id, turn_idx,
lead1_ts, __run_seq)`` is written to a ``leadpatch-*.parquet`` sidecar;
:func:`read_gold_incremental` merges run files keeping the newest version
per ``(conv_id, turn_idx)`` and then applies each key's newest patch when
it is newer than the surviving row.

Equivalence is tested by splitting bronze into several ingest windows and
comparing the merged incremental gold with one full-history run
(tests/test_incremental.py), late arrivals included.
"""

from __future__ import annotations

import json

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
from ..state import fsio as F
from ..state import manifest as M
from .medallion import normalize_bronze
from ..sources.reads import read_parquet_sized

RUN_SHARD = np.int64(0)  # constant shard id: one "shard" per conv per run

_POINTER = "_current.json"
_LEGACY = {"rows": "rows.parquet", "summary": "summary.parquet",
           "tails": "tails.parquet"}


def _empty_summary() -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "b_prior": pa.array([], pa.int64()),
            "trail_in": pa.array([], pa.int64()),
            "last_ts": pa.array([], pa.int64()),
        }
    )


def _read_state(state_dir: str):
    """Resolve the current state generation via the ``_current.json``
    pointer (legacy fixed names accepted from pre-pointer lakes).
    Returns ``(rows_tbl | None, summary_tbl, tails_tbl | None)``."""

    ptr_path = F.join(state_dir, _POINTER)
    names: dict = {}
    if F.exists(ptr_path):
        with F.open_(ptr_path) as f:
            names = json.load(f)
    else:
        names = {
            k: v for k, v in _LEGACY.items()
            if F.exists(F.join(state_dir, v))
        }
    rows = summary = tails = None
    if names.get("rows"):
        rows = F.read_table(F.join(state_dir, names["rows"]))
    if names.get("summary"):
        summary = F.read_table(F.join(state_dir, names["summary"]))
    if names.get("tails"):
        tails = F.read_table(F.join(state_dir, names["tails"]))
    return rows, (summary if summary is not None else _empty_summary()), tails


def _commit_state(state_dir: str, names: dict) -> None:
    """Atomically swap the state pointer to ``names``, then best-effort
    delete unreferenced generations (a crash mid-cleanup is harmless —
    the pointer alone defines the current state)."""
    ptr_path = F.join(state_dir, _POINTER)
    F.write_text_atomic(ptr_path, json.dumps(names))
    keep = set(names.values())
    for pat in ("rows-*.parquet", "summary-*.parquet", "tails-*.parquet"):
        for f in F.glob(F.join(state_dir, pat)):
            if F.basename(f) not in keep:
                try:
                    F.remove(f)
                except OSError:
                    pass
    for v in _LEGACY.values():  # legacy generation superseded by pointer
        p = F.join(state_dir, v)
        if F.basename(p) not in keep and F.exists(p):
            try:
                F.remove(p)
            except OSError:
                pass


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

    part = int(group[PART_COL][0].as_py())
    key = f"{part:05d}"
    g = group.drop_columns([PART_COL])
    g = dedup_first(g, ["conv_id", "turn_idx"], ["ts", "ingest_ts"])

    state_dir = F.join(state_root, f"part={key}")
    state_rows, summary, tails_meta = _read_state(state_dir)
    sdf = summary.to_pandas()

    # ---- classify new rows against the state window ----
    silver_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    new = g.select(
        silver_cols + (["ingest_ts"] if "ingest_ts" in g.column_names else [])
    )
    late_convs: set[str] = set()
    keep_mask = np.ones(new.num_rows, dtype=bool)  # fresh rows
    if state_rows is not None and state_rows.num_rows and new.num_rows:
        ndf = pd.DataFrame(
            {
                "__k": _row_keys(new).to_pylist(),
                "__ts": np.asarray(new["ts"].combine_chunks().cast(pa.int64())),
            }
        )
        stf = pd.DataFrame(
            {
                "__k": _row_keys(state_rows).to_pylist(),
                "__sts": np.asarray(
                    state_rows["ts"].combine_chunks().cast(pa.int64())
                ),
            }
        )
        m = ndf.merge(stf, on="__k", how="left")  # preserves left order
        seen = m["__sts"].notna().to_numpy()
        keep_mask = ~seen
        # key re-delivered with a DIFFERENT ts: the dedup winner may flip
        # -> exact full recompute for that conversation
        diverged = seen & (m["__sts"].to_numpy() != m["__ts"].to_numpy())
        if diverged.any():
            dconvs = set(
                np.asarray(new["conv_id"].combine_chunks())[diverged].tolist()
            )
            late_convs.update(dconvs)

    fresh = new.filter(pa.array(keep_mask)) if not keep_mask.all() else new

    # ---- silver append: fresh + conflicting rows only (exact
    # re-deliveries never duplicate the lake) ----
    silver_keep = keep_mask.copy()
    if late_convs:
        conv_np = np.asarray(new["conv_id"].combine_chunks())
        silver_keep |= np.isin(conv_np, sorted(late_convs))
    silver_src = g.filter(pa.array(silver_keep)) if not silver_keep.all() else g
    if silver_src.num_rows:
        ts_arr = silver_src["ts"].combine_chunks()
        dt = pc.strftime(ts_arr, format="%Y-%m-%d")
        silver_tbl = silver_src.append_column("dt", dt).select(
            [f.name for f in S.SILVER] + ["ingest_ts"]
        )
        silver_file = F.join(
            silver_root, f"part={key}", f"run-{run_id}.parquet"
        )
        M.atomic_write_table(silver_tbl, silver_file)

    # ---- split convs: incremental (strictly-after last_ts) vs late ----
    if fresh.num_rows and len(sdf):
        conv_arr = fresh["conv_id"].combine_chunks()
        enc = pc.dictionary_encode(conv_arr)
        codes = np.asarray(enc.indices).astype(np.int64)
        ts_new = np.asarray(fresh["ts"].combine_chunks().cast(pa.int64()))
        n_codes = int(codes.max()) + 1
        min_ts = np.full(n_codes, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(min_ts, codes, ts_new)
        uniq_convs = enc.dictionary.to_pylist()
        last_ts_of = dict(zip(sdf["conv_id"], sdf["last_ts"]))
        for code, c in enumerate(uniq_convs):
            lt = last_ts_of.get(c)
            # <= : an equal-ts peer sits inside already-emitted rows'
            # trailing RANGE windows (duplicate-ts peers included), so a
            # tie must re-derive those rows too
            if lt is not None and int(min_ts[code]) <= int(lt):
                late_convs.add(c)

    max_delta = max(cfg.w_short, cfg.w_distinct, cfg.w_long)
    outputs = []
    patches = None

    if fresh.num_rows and late_convs:
        new_inc = fresh.filter(
            pc.invert(
                pc.is_in(fresh["conv_id"], value_set=pa.array(sorted(late_convs)))
            )
        )
    else:
        new_inc = fresh

    if new_inc.num_rows:
        # assemble prefix (state rows of these convs) + new rows
        active = set(new_inc["conv_id"].to_pylist())
        parts = []
        if state_rows is not None and state_rows.num_rows:
            keep = pc.is_in(
                state_rows["conv_id"], value_set=pa.array(sorted(active))
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
        # corrections only for ACTIVE convs — per-run work scales with the
        # batch, not with every conversation ever seen
        sdf_active = sdf[sdf["conv_id"].isin(active)] if len(sdf) else sdf
        corr = _summary_to_corrections(sdf_active, state_rows)
        harvested = _harvest_summary(phase_a)
        gold_new = _apply_corrections(phase_a, corr, compute_turn_idx=False)
        outputs.append(gold_new)

        # lead1_ts repair: slim patch rows against stored tail KEYS
        if tails_meta is not None and tails_meta.num_rows:
            patches = _lead_patches(tails_meta, harvested, run_seq)
        sdf = _roll_summary(sdf, harvested)

    # ---- late convs: exact full recompute from local silver history ----
    late_hist = None
    if late_convs:
        hist_files = sorted(
            F.glob(F.join(silver_root, f"part={key}", "run-*.parquet"))
        )
        hist = pa.concat_tables(
            [F.read_table(f) for f in hist_files], promote_options="default"
        )
        hist = hist.filter(
            pc.is_in(hist["conv_id"], value_set=pa.array(sorted(late_convs)))
        )
        hist = dedup_first(hist, ["conv_id", "turn_idx"], ["ts", "ingest_ts"])
        late_hist = hist
        full = gold_features_partition(hist, cfg)
        outputs.append(full)
        sdf = _rebuild_summary_from_full(sdf, full)

    gold_out = (
        pa.concat_tables(outputs, promote_options="default")
        if outputs
        else None
    )
    if gold_out is not None and gold_out.num_rows:
        gold_file = F.join(gold_root, f"part={key}", f"run-{run_id}.parquet")
        run_col = pa.array(np.full(gold_out.num_rows, run_seq, np.int64))
        M.atomic_write_table(gold_out.append_column("__run_seq", run_col), gold_file)
    if patches is not None and patches.num_rows:
        patch_file = F.join(
            gold_root, f"part={key}", f"leadpatch-{run_id}.parquet"
        )
        M.atomic_write_table(patches, patch_file)

    # ---- roll state: trailing max_delta rows + summary + tail keys,
    # committed by one atomic pointer swap ----
    _write_state(
        state_dir, run_id, state_rows, fresh, sdf, gold_out, tails_meta,
        max_delta, silver_cols, late_hist,
    )
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "new_rows": pa.array([fresh.num_rows], pa.int64()),
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
    """Merge this run's per-conv summaries into the carried state —
    vectorized: compute on O(active convs), one boolean filter over the
    carried table (no per-conv Python loop over history)."""
    if not len(harvested):
        return sdf
    h = harvested.copy()
    if len(sdf):
        m = h.merge(
            sdf, on="conv_id", how="left", suffixes=("", "_prior")
        )
        prior_b = m["b_prior"].fillna(0).astype(np.int64)
        prior_trail = m["trail_in"].fillna(0).astype(np.int64)
    else:
        m = h
        prior_b = np.zeros(len(h), np.int64)
        prior_trail = np.zeros(len(h), np.int64)
    n_breaks = m["n_breaks"].astype(np.int64)
    upd = pd.DataFrame(
        {
            "conv_id": m["conv_id"],
            "b_prior": prior_b + n_breaks,
            "trail_in": np.where(
                n_breaks > 0,
                m["trail"].astype(np.int64),
                prior_trail + m["n_real"].astype(np.int64),
            ),
            "last_ts": m["last_ts"].astype(np.int64)
            if "last_ts_prior" not in m.columns
            else m["last_ts"].astype(np.int64),
        }
    )
    if len(sdf):
        untouched = sdf[~sdf["conv_id"].isin(set(h["conv_id"]))]
        return pd.concat([untouched, upd], ignore_index=True)
    return upd


def _rebuild_summary_from_full(sdf: pd.DataFrame, full: pa.Table) -> pd.DataFrame:
    """After a full per-conv recompute, rebuild that conv's carry state
    from the final gold rows — vectorized per-conv last-row pick."""
    df = full.select(["conv_id", "ts", "session_id", "session_turn_idx"]).to_pandas()
    if not len(df):
        return sdf
    last = df.groupby("conv_id", sort=False).agg(
        session_id=("session_id", "last"),
        session_turn_idx=("session_turn_idx", "last"),
        ts=("ts", "max"),
    )
    upd = pd.DataFrame(
        {
            "conv_id": last.index,
            "b_prior": last["session_id"].astype(np.int64) + 1,
            "trail_in": last["session_turn_idx"].astype(np.int64) + 1,
            "last_ts": (
                pd.to_datetime(last["ts"])
                .astype("datetime64[ns]")
                .astype(np.int64)
                // 1000  # ns -> us
            ),
        }
    )
    if len(sdf):
        untouched = sdf[~sdf["conv_id"].isin(set(upd["conv_id"]))]
        return pd.concat([untouched, upd], ignore_index=True)
    return upd.reset_index(drop=True)


def _lead_patches(
    tails_meta: pa.Table, harvested: pd.DataFrame, run_seq: int
) -> pa.Table:
    """Slim lead1_ts patch rows: for each conv that got new turns, its
    previously-final row's KEY gains ``lead1_ts = first new ts``. No
    feature payload travels — the reader applies the patch onto the
    surviving row (:func:`read_gold_incremental`)."""
    first_ts_of = dict(zip(harvested["conv_id"], harvested["first_ts"]))
    keep = pc.is_in(
        tails_meta["conv_id"],
        value_set=pa.array(sorted(first_ts_of), pa.string()),
    )
    t = tails_meta.filter(keep)
    if not t.num_rows:
        return t.append_column(
            "lead1_ts", pa.array([], pa.timestamp("us"))
        ).append_column("__run_seq", pa.array([], pa.int64()))
    lead = pa.array(
        np.array([int(first_ts_of[c]) for c in t["conv_id"].to_pylist()], np.int64),
        pa.int64(),
    ).cast(pa.timestamp("us"))
    t = t.append_column("lead1_ts", lead)
    return t.append_column(
        "__run_seq", pa.array(np.full(t.num_rows, run_seq, np.int64))
    )


def _write_state(
    state_dir, run_id, state_rows, fresh, sdf, gold_out, tails_meta,
    max_delta, silver_cols, late_hist,
) -> None:
    """Roll the partition state and commit it with one atomic pointer
    swap (versioned files + ``_current.json``): a crash between writes or
    a task retry can never mix generations."""

    parts = []
    if state_rows is not None and state_rows.num_rows:
        parts.append(state_rows.select(silver_cols))
    if fresh.num_rows:
        parts.append(fresh.select(silver_cols))
    if late_hist is not None and late_hist.num_rows:
        # late convs' window must reflect the DEDUPED truth (a conflicting
        # re-delivery may have changed the winning version of a turn)
        parts.append(late_hist.select(silver_cols))
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

    F.makedirs(state_dir, exist_ok=True)
    names: dict = {}
    names["rows"] = f"rows-{run_id}.parquet"
    M.atomic_write_table(rows_out, F.join(state_dir, names["rows"]))
    names["summary"] = f"summary-{run_id}.parquet"
    M.atomic_write_table(
        pa.Table.from_pandas(sdf, preserve_index=False),
        F.join(state_dir, names["summary"]),
    )

    tails_new = None
    if gold_out is not None and gold_out.num_rows:
        # store each conv's final gold row KEY for future lead1_ts patches
        conv_g = gold_out["conv_id"].combine_chunks()
        codes_g = np.asarray(pc.dictionary_encode(conv_g).indices).astype(np.int64)
        ts_g = np.asarray(gold_out["ts"].combine_chunks().cast(pa.int64()))
        ti_g = np.asarray(gold_out["turn_idx"].combine_chunks().cast(pa.int64()))
        order = np.lexsort((-ti_g, -ts_g, codes_g))
        k = codes_g[order]
        first = np.zeros(len(k), dtype=bool)
        if len(k):
            first[0] = True
            first[1:] = k[1:] != k[:-1]
        tails_new = gold_out.select(["conv_id", "turn_idx"]).take(
            pa.array(order[first])
        )
        if tails_meta is not None and tails_meta.num_rows:
            gone = pc.invert(
                pc.is_in(tails_meta["conv_id"], value_set=conv_g.unique())
            )
            tails_new = pa.concat_tables(
                [
                    tails_new,
                    tails_meta.filter(gone).select(tails_new.column_names),
                ],
                promote_options="default",
            )
        names["tails"] = f"tails-{run_id}.parquet"
        M.atomic_write_table(tails_new, F.join(state_dir, names["tails"]))
    elif tails_meta is not None:
        # keep referencing the previous generation's tails unchanged
        prev = _current_names(state_dir)
        if prev.get("tails"):
            names["tails"] = prev["tails"]

    _commit_state(state_dir, names)


def _current_names(state_dir: str) -> dict:
    ptr_path = F.join(state_dir, _POINTER)
    if F.exists(ptr_path):
        with F.open_(ptr_path) as f:
            return json.load(f)
    return {
        k: v for k, v in _LEGACY.items()
        if F.exists(F.join(state_dir, v))
    }


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
    """One incremental stream run over an ingest window.

    ``num_parts`` is part of the lake's physical layout (conversation →
    partition assignment): it is persisted on first run and later runs
    must match, else state/silver would silently split across partition
    directories."""
    import ray.data as rd

    silver_root = F.join(out_root, "silver")
    gold_root = F.join(out_root, "gold_inc")
    state_root = F.join(out_root, "state")
    cfg = gold_cfg or GoldConfig(dedup=False)

    F.makedirs(state_root, exist_ok=True)
    meta_path = F.join(state_root, "_meta.json")
    if F.exists(meta_path):
        with F.open_(meta_path) as f:
            meta = json.load(f)
        if int(meta["num_parts"]) != int(num_parts):
            raise ValueError(
                f"incremental lake at {out_root} was created with "
                f"num_parts={meta['num_parts']}; got {num_parts} — the "
                "partition layout is fixed at lake creation"
            )
    else:
        F.write_text_atomic(meta_path, json.dumps({"num_parts": int(num_parts)}))

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
    wins, then each key's newest lead1_ts patch is applied when the patch
    is newer than the surviving row (patches are slim sidecar rows — no
    feature payload is duplicated in state). An empty lake returns an
    empty gold-schema table."""

    files = sorted(
        F.glob(F.join(out_root, "gold_inc", "part=*", "run-*.parquet"))
    )
    if not files:
        empty = gold_features_partition(
            S.SILVER.empty_table(), GoldConfig(dedup=False)
        )
        return empty
    allt = pa.concat_tables(
        [F.read_table(f) for f in files], promote_options="default"
    )
    # keep the LAST version: order by run_seq desc and keep first
    neg = pc.multiply(allt["__run_seq"], pa.scalar(-1, pa.int64()))
    allt = allt.set_column(
        allt.schema.get_field_index("__run_seq"), "__run_seq", neg
    )
    out = dedup_first(allt, ["conv_id", "turn_idx"], ["__run_seq"])

    patch_files = sorted(
        F.glob(F.join(out_root, "gold_inc", "part=*", "leadpatch-*.parquet"))
    )
    if patch_files:
        p = pa.concat_tables(
            [F.read_table(f) for f in patch_files], promote_options="default"
        )
        pneg = pc.multiply(p["__run_seq"], pa.scalar(-1, pa.int64()))
        p = p.set_column(p.schema.get_field_index("__run_seq"), "__run_seq", pneg)
        p = dedup_first(p, ["conv_id", "turn_idx"], ["__run_seq"])
        p = pa.table(
            {
                "conv_id": p["conv_id"],
                "turn_idx": p["turn_idx"],
                "__patch_lead": p["lead1_ts"],
                "__patch_seq": p["__run_seq"],  # negated, like rows
            }
        )
        out = out.append_column(
            "__i", pa.array(np.arange(out.num_rows, dtype=np.int64))
        )
        j = out.join(p, keys=["conv_id", "turn_idx"], join_type="left outer")
        j = j.sort_by("__i")
        # negated seqs: patch NEWER than row  <=>  __patch_seq < __run_seq.
        # and_kleene: false AND null = false (unmatched rows keep their
        # lead1_ts; plain and_ would null the mask and wipe them)
        apply_mask = pc.and_kleene(
            pc.is_valid(j["__patch_seq"]),
            pc.less(j["__patch_seq"], j["__run_seq"]),
        )
        lead = pc.if_else(apply_mask, j["__patch_lead"], j["lead1_ts"])
        j = j.set_column(j.schema.get_field_index("lead1_ts"), "lead1_ts", lead)
        out = j.drop_columns(["__i", "__patch_lead", "__patch_seq"])
    return out.drop_columns(["__run_seq"])

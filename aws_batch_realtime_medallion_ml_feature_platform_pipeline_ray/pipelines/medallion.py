"""The stream job: bronze → silver → gold → online, resumable + backfillable.

Re-expresses the reference's ``spark_jobs/silver_and_gold.py`` (trace in
SURVEY.md §3.1) as one Ray Data pipeline with a single hash shuffle:

1. read bronze parquet for an *ingest* window (arrival time — the
   reference filters event time, :56-59; we window on ``ingest_ts`` so
   late turns are picked up by later runs and backfilled),
2. normalize + validate + filter (M1-M4, M12) in stateless map_batches,
3. hash-partition by ``conv_id`` (the one shuffle),
4. per partition: append this run's silver rows (atomic parquet + lineage
   manifest), then recompute that partition's gold from the partition's
   FULL silver history and overwrite it (atomic + manifest), then refresh
   the online latest-per-conv table for the partition.

Because gold partitions are recomputed from full per-partition silver,
late-arriving turns are handled exactly: the blast radius of a late turn
is its conversation's hash partition (north-rule B12), and the
watermark/lateness bound the reference parses but never uses
(silver_and_gold.py:31) becomes the ingest-window lower bound. Unlike the
reference — whose gold only sees the current window's slice, silently
truncating 24h/7d features (silver_and_gold.py:200-207) — gold here is
always computed over full history (SURVEY.md §7.3).

Resume: a partition whose (stage, part, run_id) manifest exists is
skipped; kill-and-rerun converges to the same bytes.
"""

from __future__ import annotations

import json
import time

from ..state import fsio as F

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as S
from ..stages.featurize import GoldConfig, dedup_first, gold_features_partition
from ..stages.keyed import PART_COL, add_partition_col
from ..state import manifest as M
from ..state import feature_put as FP
from ..sources.reads import read_parquet_sized

RUN_STAGE_SILVER = "silver"
RUN_STAGE_GOLD = "gold"


def _coerce_ts(v):
    """Accept ISO strings (the CLI path, __main__.py run-stream), datetime /
    pd.Timestamp objects (the library path) — anything pa.scalar(...,
    timestamp) takes — and return a datetime usable as a timestamp bound."""
    if isinstance(v, str):
        import datetime as _dt

        return _dt.datetime.fromisoformat(v)
    return v


VALID_COL = "__valid"


def normalize_bronze(batch: pa.Table, *, processed_at: str,
                     window: tuple | None = None,
                     tag_invalid: bool = False) -> pa.Table:
    """M1 ingest-window filter + M2 validity + M3 domain predicate + M12
    canonical casts + M4 audit column (explicit run timestamp for
    determinism vs the reference's utcnow(), silver_and_gold.py:67).

    With ``tag_invalid`` the validity failures are kept and tagged in
    ``__valid`` instead of silently dropped, so the partition task can
    count them into its manifest — the S8 put-error accounting channel
    (reference ingest_features.py:63-98 tallies per-batch failures; here
    rejects are durable per-partition metrics, and 'retry' is the
    idempotent resume of the atomic write + manifest protocol). Window
    misses are dropped either way: they are not errors, just out-of-slice."""
    t = batch
    # fill_null(False): a NULL text makes the predicate null, which the
    # int8 cast would keep as null -> NaN, matching neither ==0 (reject
    # count) nor ==1 (keep) — the row would vanish uncounted
    mask = pc.fill_null(
        pc.and_(
            pc.and_(pc.is_valid(t["conv_id"]), pc.is_valid(t["turn_idx"])),
            pc.greater(pc.utf8_length(t["text"]), 0),
        ),
        False,
    )
    if window is not None:
        lo, hi = (_coerce_ts(b) for b in window)
        its = t["ingest_ts"]
        wmask = pc.and_(
            pc.greater_equal(its, pa.scalar(lo, pa.timestamp("us"))),
            pc.less_equal(its, pa.scalar(hi, pa.timestamp("us"))),
        )
    else:
        wmask = None
    if tag_invalid:
        if wmask is not None:
            t = t.filter(wmask)
            mask = pc.fill_null(
                pc.and_(
                    pc.and_(pc.is_valid(t["conv_id"]), pc.is_valid(t["turn_idx"])),
                    pc.greater(pc.utf8_length(t["text"]), 0),
                ),
                False,
            )
        t = t.append_column(VALID_COL, pc.cast(mask, pa.int8()))
    else:
        t = t.filter(mask if wmask is None else pc.and_(mask, wmask))
    t = t.append_column("processed_at", pa.array([processed_at] * t.num_rows))
    return t


class StreamRunResult(dict):
    pass


def run_stream(
    bronze_path: str,
    out_root: str,
    *,
    run_id: str,
    processed_at: str,
    ingest_window: tuple | None = None,
    num_parts: int = 16,
    gold_cfg: GoldConfig | None = None,
    ray_kwargs: dict | None = None,
    bounded_history: bool = True,
) -> StreamRunResult:
    """Execute one stream run. Returns run metrics (from manifests).

    ``bounded_history=True`` (the production DEFAULT since r5 — the
    full recompute is the explicit ``bounded_history=False`` fallback)
    switches the gold recompute from the O(full-partition-history)
    baseline to the manifest-pruned bounded
    plan (VERDICT r3 §next-3): silver run files whose manifest
    ``max_ts`` predates ``slice_min_ts - max_window`` are read with a
    NARROW projection (conv_id, turn_idx, ts, ingest_ts — no text) that
    only feeds session/ordering state and cross-run dedup; full payload
    reads are limited to files overlapping the feature-window horizon.
    Gold dt= fragments older than the recompute boundary are preserved
    on disk instead of rewritten, with the single forward-looking column
    (``lead1_ts``) patched in place where a conversation continues
    across the boundary. Falls back to the exact full recompute per
    partition when a redelivered key CONFLICTS with cold history (a new
    version that wins the first-(ts, ingest_ts) dedup would change
    already-emitted rows). Output bytes are equivalent to the full
    recompute (tests/test_bounded_history.py)."""
    import ray
    import ray.data as rd

    silver_root = F.join(out_root, "silver")
    gold_root = F.join(out_root, "gold")
    online_root = F.join(out_root, "online")
    # dedup happens explicitly on the silver history read-back, so the
    # fused pass can skip its own dedup step
    cfg = gold_cfg or GoldConfig(dedup=False)

    # resume skip keyed on the FINAL (gold) stage manifest: a crash
    # between the silver and gold manifest writes must rerun the
    # partition end to end, or gold/online would stay permanently stale
    done_silver = M.completed_partitions(gold_root, RUN_STAGE_GOLD, run_id)

    ds = read_parquet_sized(bronze_path)
    ds = ds.map_batches(
        lambda t: normalize_bronze(
            t, processed_at=processed_at, window=ingest_window, tag_invalid=True
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        lambda t: add_partition_col(t, "conv_id", num_parts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if done_silver:
        done_arr = pa.array(
            np.array([int(p) for p in done_silver], dtype=np.int32)
        )
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t[PART_COL], value_set=done_arr))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def process_partition(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        part = int(group[PART_COL][0].as_py())
        key = f"{part:05d}"
        g = group.drop_columns([PART_COL])

        # S8 error accounting: count tagged validity rejects, then drop
        valid = np.asarray(g[VALID_COL].combine_chunks())
        rows_rejected = int((valid == 0).sum())
        g = g.filter(pa.array(valid == 1)).drop_columns([VALID_COL])

        # ---- silver: dedup within the run slice, stable sort, append ----
        g = dedup_first(g, ["conv_id", "turn_idx"], ["ts", "ingest_ts"])
        ts_arr = g["ts"].combine_chunks()
        dt = pc.strftime(ts_arr, format="%Y-%m-%d")
        g = g.append_column("dt", dt)
        silver_file = F.join(silver_root, f"part={key}", f"run-{run_id}.parquet")
        silver_cols = [f.name for f in S.SILVER] + ["ingest_ts"]
        silver_tbl = g.select(silver_cols)
        M.atomic_write_table(silver_tbl, silver_file)
        ing = g["ingest_ts"].combine_chunks()
        M.write_manifest(
            silver_root,
            M.PartitionManifest(
                stage=RUN_STAGE_SILVER,
                partition_key=key,
                run_id=run_id,
                rows_in=group.num_rows,
                rows_out=g.num_rows,
                min_ts=str(pc.min(ts_arr).as_py()) if g.num_rows else None,
                max_ts=str(pc.max(ts_arr).as_py()) if g.num_rows else None,
                max_ingest_ts=str(pc.max(ing).as_py()) if g.num_rows else None,
                wall_s=time.perf_counter() - t0,
                files=[silver_file],
                extra={"rows_rejected": rows_rejected},
            ),
        )

        # ---- gold: recompute this partition from silver history (full
        # baseline, or the manifest-pruned bounded plan) ------------------
        t1 = time.perf_counter()
        part_dir = F.join(silver_root, f"part={key}")
        files = sorted(F.glob(F.join(part_dir, "run-*.parquet")))

        bounded = None
        if bounded_history:
            if g.num_rows == 0:
                # empty slice: nothing can change — keep gold untouched
                bounded = ([], 0, 0, {"success": 0, "errors": 0},
                           {"gold_mode": "bounded-noop"})
            else:
                bounded = _gold_partition_bounded(
                    silver_root, gold_root, online_root, key, files, cfg,
                    run_id, pc.min(ts_arr).as_py(),
                )
        if bounded is not None:
            gold_files, rows_in, rows_out, put, gold_extra = bounded
        else:
            hist = pa.concat_tables(
                [F.read_table(f) for f in files], promote_options="default"
            )
            # cross-run dedup: keep first (ts, ingest_ts) per
            # (conv_id, turn_idx)
            hist = dedup_first(hist, ["conv_id", "turn_idx"], ["ts", "ingest_ts"])
            gold_tbl = gold_features_partition(hist, cfg)
            gold_files = write_gold_partition(
                gold_tbl, F.join(gold_root, f"part={key}")
            )

            # ---- online: latest feature row per conv (S7 upsert
            # semantics), validated + retried with tallies (S8) ----------
            online_tbl = latest_per_conv(gold_tbl)
            put = FP.put_partition(online_tbl, online_root, key, run_id=run_id)
            rows_in, rows_out = hist.num_rows, gold_tbl.num_rows
            gold_extra = {"gold_mode": "full"}

        M.write_manifest(
            gold_root,
            M.PartitionManifest(
                stage=RUN_STAGE_GOLD,
                partition_key=key,
                run_id=run_id,
                rows_in=rows_in,
                rows_out=rows_out,
                wall_s=time.perf_counter() - t1,
                files=gold_files,
                extra={
                    **gold_extra,
                    "put_success": put["success"],
                    "put_errors": put["errors"],
                },
            ),
        )

        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "silver_rows": pa.array([g.num_rows], pa.int64()),
                "gold_rows": pa.array([rows_out], pa.int64()),
            }
        )

    stats = (
        ds.groupby(PART_COL)
        .map_groups(process_partition, batch_format="pyarrow")
        .to_pandas()
    )

    # persist the partitioning so keyed online lookups can route by hash
    F.makedirs(online_root, exist_ok=True)
    F.write_text_atomic(
        F.join(online_root, "_meta.json"),
        json.dumps({"num_parts": num_parts, "key": "conv_id"}),
    )

    silver_ms = [
        m for m in M.load_manifests(silver_root, RUN_STAGE_SILVER) if m.run_id == run_id
    ]
    gold_ms = [
        m for m in M.load_manifests(gold_root, RUN_STAGE_GOLD) if m.run_id == run_id
    ]
    result = StreamRunResult(
        run_id=run_id,
        partitions=len(stats),
        silver=M.summarize(silver_ms),
        gold=M.summarize(gold_ms),
        online=FP.summarize_puts(gold_ms),
    )
    run_manifest = F.join(out_root, f"run-{run_id}.json")
    F.write_text_atomic(run_manifest, json.dumps(result, indent=1))
    return result


def write_gold_partition(
    gold_tbl: pa.Table, part_dir: str, preserve_before: str | None = None
) -> list[str]:
    """Overwrite one gold hash partition with physical ``dt=`` Hive layout
    (``part=NNNNN/dt=YYYY-MM-DD/data.parquet``) so daily dataset builds
    prune fragments by date instead of scanning the whole lake (reference
    intent silver_and_gold.py:74-77 + build_datasets.py:51-53; VERDICT r1
    §missing-1). The ``dt`` column stays in-file too, so readers that
    glob the whole tree see an unchanged schema. Files are written
    atomically, then stale ``dt=`` dirs (dates no longer present after a
    late-turn recompute) and any legacy flat file are removed. Returns the
    written file paths."""
    import pyarrow.compute as _pc

    new_files: list[str] = []
    new_dts: set[str] = set()
    # C8 durability: a full-history recompute must not resurrect dt=
    # fragments a retention run already expired — honor the persisted
    # cutoff so expiry sticks across later stream runs
    cutoff = _retention_cutoff(F.dirname(part_dir))
    if cutoff is not None and gold_tbl.num_rows:
        gold_tbl = gold_tbl.filter(
            _pc.greater_equal(gold_tbl["dt"], pa.scalar(cutoff))
        )
    if gold_tbl.num_rows:
        dt_enc = _pc.dictionary_encode(gold_tbl["dt"].combine_chunks())
        codes = np.asarray(dt_enc.indices)
        dts = dt_enc.dictionary.to_pylist()
        order = np.argsort(codes, kind="stable")
        sorted_tbl = gold_tbl.take(pa.array(order))
        counts = np.bincount(codes, minlength=len(dts))
        # per-dt writes are independent; parquet encode/IO releases the
        # GIL, so a small thread pool overlaps the many per-day files one
        # partition produces (days dominate wall time at fine dt grain)
        from concurrent.futures import ThreadPoolExecutor

        starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

        def write_one(i_dt):
            i, dt = i_dt
            f = F.join(part_dir, f"dt={dt}", "data.parquet")
            M.atomic_write_table(sorted_tbl.slice(int(starts[i]), int(counts[i])), f)
            return f, str(dt)

        with ThreadPoolExecutor(max_workers=min(8, len(dts))) as ex:
            for f, dt in ex.map(write_one, enumerate(dts)):
                new_files.append(f)
                new_dts.add(dt)
    legacy = F.join(part_dir, "data.parquet")
    if F.exists(legacy):
        F.remove(legacy)
    for d in F.glob(F.join(part_dir, "dt=*")):
        dt_name = F.basename(d)[3:]
        if preserve_before is not None and dt_name < preserve_before:
            continue  # bounded-history mode: pre-boundary days are kept
        if dt_name not in new_dts:
            F.rmtree(d)
    return new_files


_NARROW_COLS = ["conv_id", "turn_idx", "ts", "ingest_ts"]


def _split_history_files(silver_root, key, files, cutoff):
    """Partition a gold recompute's silver run-file list into (hot, cold)
    by each file's manifest ``max_ts``: hot files overlap
    [cutoff, inf) and need a full-payload read; cold files end strictly
    before the cutoff and only feed session/ordering state (narrow
    read). Files with no manifest (orphans from a crash before the
    manifest write) are conservatively hot."""
    from datetime import datetime

    bounds: dict[str, str | None] = {}
    for m in M.load_manifests(silver_root, RUN_STAGE_SILVER):
        if m.partition_key != key:
            continue
        for f in m.files:
            bounds[F.canon(f)] = m.max_ts
    hot, cold = [], []
    for f in files:
        mx = bounds.get(F.canon(f), None)
        if mx is None or datetime.fromisoformat(mx) >= cutoff:
            hot.append(f)
        else:
            cold.append(f)
    return hot, cold


def _apply_lead_patch(tbl: pa.Table, grp) -> pa.Table:
    """Set ``lead1_ts`` for the (conv_id, turn_idx) keys in ``grp`` (a
    small pandas frame) — the one forward-looking gold column that a
    preserved pre-boundary row must absorb when its conversation
    continues into the recomputed range."""
    import pandas as pd

    df = tbl.to_pandas()
    idx = pd.MultiIndex.from_frame(df[["conv_id", "turn_idx"]])
    tgt = pd.MultiIndex.from_frame(grp[["conv_id", "turn_idx"]])
    pos = idx.get_indexer(tgt)
    valid = pos >= 0
    if valid.any():
        df.loc[df.index[pos[valid]], "lead1_ts"] = (
            grp["lead1_ts"].to_numpy()[valid]
        )
    return pa.Table.from_pandas(df, schema=tbl.schema, preserve_index=False)


def _gold_partition_bounded(
    silver_root, gold_root, online_root, key, files, cfg, run_id, slice_min
):
    """Manifest-pruned gold recompute for one partition (VERDICT r3
    §next-3). Exactness argument:

    - every trailing window is <= max(w_short, w_distinct, w_long), so a
      row with ts >= slice_min (the earliest row whose features can
      change this run — new rows all have ts >= slice_min and trailing
      windows mean later arrivals never alter earlier rows' aggregates)
      only needs full-payload context from [slice_min - max_window, inf):
      the HOT files;
    - session_id / ordering / lag have unbounded lookback but depend
      only on the per-conv (ts, turn_idx) sequence and the cross-run
      dedup outcome — COLD files supply exactly those columns (narrow
      read, no text bytes);
    - preserved rows (ts < slice_min) keep their on-disk gold bytes —
      correct because trailing windows never look forward — except
      ``lead1_ts`` of each conversation's last pre-boundary row, patched
      in place;
    - a redelivered key that would FLIP a cold dedup winner invalidates
      preserved rows -> return None and let the caller run the exact
      full recompute (per-partition blast radius, the B12 contract).

    Returns (gold_files, rows_in, rows_out, put, extra) or None."""
    import datetime as _dt

    import pandas as pd

    max_delta_us = int(max(cfg.w_short, cfg.w_distinct, cfg.w_long))
    cutoff = slice_min - _dt.timedelta(microseconds=max_delta_us)
    hot_files, cold_files = _split_history_files(
        silver_root, key, files, cutoff
    )
    if not cold_files:
        return None  # nothing prunable — the full path reads the same bytes
    hot = pa.concat_tables(
        [F.read_table(f) for f in hot_files], promote_options="default"
    )
    cold = pa.concat_tables(
        [F.read_table(f, columns=_NARROW_COLS) for f in cold_files],
        promote_options="default",
    )

    # conflict check: would any hot row beat a cold row for the same
    # (conv_id, turn_idx) key under first-(ts, ingest_ts) dedup?
    hk = (
        hot.select(_NARROW_COLS)
        .to_pandas()
        .sort_values(_NARROW_COLS)
        .drop_duplicates(["conv_id", "turn_idx"])
    )
    ck = (
        cold.to_pandas()
        .sort_values(_NARROW_COLS)
        .drop_duplicates(["conv_id", "turn_idx"])
    )
    j = hk.merge(ck, on=["conv_id", "turn_idx"], suffixes=("_h", "_c"))
    if len(j):
        hot_wins = (j["ts_h"] < j["ts_c"]) | (
            (j["ts_h"] == j["ts_c"]) & (j["ingest_ts_h"] < j["ingest_ts_c"])
        )
        if bool(hot_wins.any()):
            return None  # cold winner flips -> exact full fallback

    need = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "ingest_ts"]
    n_cold = cold.num_rows
    cold_aligned = pa.table(
        {
            "conv_id": cold["conv_id"],
            "turn_idx": cold["turn_idx"],
            "role": pa.nulls(n_cold, hot.schema.field("role").type),
            "text": pa.nulls(n_cold, hot.schema.field("text").type),
            "tool": pa.nulls(n_cold, hot.schema.field("tool").type),
            "ts": cold["ts"],
            "ingest_ts": cold["ingest_ts"],
        }
    ).select(need)
    combined = pa.concat_tables(
        [hot.select(need), cold_aligned], promote_options="default"
    )
    combined = dedup_first(combined, ["conv_id", "turn_idx"], ["ts", "ingest_ts"])
    gold_all = gold_features_partition(combined, cfg)

    ts_col = gold_all["ts"].combine_chunks()
    slice_scalar = pa.scalar(slice_min, type=ts_col.type)
    emit_mask = pc.greater_equal(ts_col, slice_scalar)
    emitted = gold_all.filter(emit_mask)
    boundary_dt = slice_min.strftime("%Y-%m-%d")

    # lead1_ts patches: last pre-boundary row of each conversation that
    # continues into the recomputed range
    lead = gold_all["lead1_ts"].combine_chunks()
    pmask = pc.and_(
        pc.invert(emit_mask),
        pc.and_(pc.is_valid(lead), pc.greater_equal(lead, slice_scalar)),
    )
    patches = gold_all.filter(pmask).select(
        ["conv_id", "turn_idx", "dt", "lead1_ts"]
    )

    part_gold_dir = F.join(gold_root, f"part={key}")
    bfile = F.join(part_gold_dir, f"dt={boundary_dt}", "data.parquet")
    keep = None
    if F.exists(bfile):
        old_b = F.read_table(bfile)
        keep = old_b.filter(
            pc.less(old_b["ts"].combine_chunks(), slice_scalar)
        )
    pdf = patches.to_pandas()
    for dt_val, grp in pdf.groupby("dt"):
        dt_val = str(dt_val)
        if dt_val == boundary_dt:
            if keep is not None and keep.num_rows:
                keep = _apply_lead_patch(keep, grp)
            continue
        f = F.join(part_gold_dir, f"dt={dt_val}", "data.parquet")
        if F.exists(f):
            M.atomic_write_table(_apply_lead_patch(F.read_table(f), grp), f)

    to_write = emitted
    if keep is not None and keep.num_rows:
        to_write = pa.concat_tables([keep, emitted], promote_options="default")
    gold_files = write_gold_partition(
        to_write, part_gold_dir, preserve_before=boundary_dt
    )

    # online upsert: merge emitted conversations over the existing table
    # (the full path rewrites all convs; here untouched convs persist)
    online_tbl = latest_per_conv(emitted)
    dest = F.join(online_root, f"part={key}", "data.parquet")
    if F.exists(dest):
        old_online = F.read_table(dest)
        mask = pc.invert(
            pc.is_in(
                old_online["conv_id"].combine_chunks(),
                value_set=online_tbl["conv_id"].combine_chunks(),
            )
        )
        kept_online = old_online.filter(mask)
        if kept_online.num_rows:
            online_tbl = pa.concat_tables(
                [kept_online, online_tbl], promote_options="default"
            )
    put = FP.put_partition(online_tbl, online_root, key, run_id=run_id)

    extra = {
        "gold_mode": "bounded",
        "hot_files": len(hot_files),
        "cold_files": len(cold_files),
        "preserved_before_dt": boundary_dt,
        "lead_patches": patches.num_rows,
    }
    return gold_files, combined.num_rows, emitted.num_rows, put, extra


def _retention_cutoff(gold_root: str) -> str | None:
    """The persisted retention cutoff (max keep_from_dt of all expire
    runs), or None when no retention is configured."""
    p = F.join(gold_root, "_retention.json")
    if not F.exists(p):
        return None
    with F.open_(p) as f:
        return json.load(f).get("keep_from_dt")


def _persist_retention_cutoff(gold_root: str, keep_from_dt: str) -> None:
    cur = _retention_cutoff(gold_root)
    if cur is not None and cur >= keep_from_dt:
        return
    F.makedirs(gold_root, exist_ok=True)
    F.write_text_atomic(
        F.join(gold_root, "_retention.json"),
        json.dumps({"keep_from_dt": keep_from_dt}),
    )


def gold_dt_fragments(
    gold_root: str, dt_start: str | None = None, dt_end: str | None = None
) -> tuple[list[str], list[str]]:
    """Fragment-pruned gold file list: filesystem-metadata-only discovery
    of ``part=*/dt=*`` leaves filtered to [dt_start, dt_end] (inclusive;
    ``None`` = unbounded). Returns (files, sorted distinct dts present in
    the pruned set) — no data bytes are read."""
    out: list[str] = []
    dts: set[str] = set()
    for f in F.glob(F.join(gold_root, "part=*", "dt=*", "*.parquet")):
        dt = F.basename(F.dirname(f))[3:]
        if dt_start is not None and dt < dt_start:
            continue
        if dt_end is not None and dt > dt_end:
            continue
        out.append(f)
        dts.add(dt)
    return sorted(out), sorted(dts)


def expire_gold_partitions(out_root: str, *, keep_from_dt: str) -> dict:
    """C8 retention lifecycle: delete gold ``dt=`` fragments strictly
    older than ``keep_from_dt`` — the engine analog of the reference's
    S3 lifecycle expiry (infra/terraform/modules/s3_datalake/main.tf:33-65,
    ``lifecycle_days`` default 30). Filesystem-metadata only (parquet
    footers for row counts — no data bytes); idempotent (re-running after
    a partial delete converges); an ``expire`` manifest records every
    removed fragment (dt, rows, file) so lineage stays auditable after
    the bytes are gone."""

    gold_root = F.join(out_root, "gold")
    # persist the cutoff FIRST so retention survives later full-history
    # gold recomputes (write_gold_partition filters dt < cutoff)
    _persist_retention_cutoff(gold_root, keep_from_dt)
    removed: list[dict] = []
    for d in sorted(F.glob(F.join(gold_root, "part=*", "dt=*"))):
        dt = F.basename(d)[3:]
        if dt >= keep_from_dt:
            continue
        rows = 0
        for f in F.glob(F.join(d, "*.parquet")):
            try:
                rows += F.parquet_rows(f)
            except Exception:
                pass  # half-written leftover: still expired below
        removed.append(
            {"fragment": F.relpath(d, gold_root), "dt": dt, "rows": rows}
        )
        F.rmtree(d)
    if removed:  # a no-op re-run must not overwrite the audit record
        # unique run_id per invocation: a SECOND expire with the same
        # cutoff (late backfill wrote new old-dt fragments) must append
        # its audit, not overwrite the earlier one — reconcile_lake sums
        # expired rows across all audits
        M.write_manifest(
            out_root,
            M.PartitionManifest(
                stage="expire",
                partition_key=f"before-{keep_from_dt}",
                run_id=f"expire-{keep_from_dt}-{uuid_hex()[:8]}",
                rows_out=sum(r["rows"] for r in removed),
                extra={"keep_from_dt": keep_from_dt, "removed": removed},
            ),
        )
    return {
        "keep_from_dt": keep_from_dt,
        "fragments_removed": len(removed),
        "rows_removed": sum(r["rows"] for r in removed),
    }


def compact_silver(
    out_root: str, *, run_id: str | None = None, min_files: int = 2
) -> dict:
    """Small-file compaction for silver partitions: each incremental /
    streaming run appends one ``run-{id}.parquet`` per hash partition, so
    a long-lived lake accumulates thousands of small files per partition
    and every gold recompute / late-conv backfill pays open-and-footer
    cost per file. Coalesce each partition's run files into ONE
    ``run-compact-{id}.parquet`` (the name still matches the readers'
    ``run-*.parquet`` glob) holding the deduped union, then delete the
    sources.

    CRASH-SAFE WITHOUT TOMBSTONES: every silver consumer (gold full
    recompute, medallion.py:201-206; incremental late-conv backfill,
    incremental.py:198-207) already folds its read through
    ``dedup_first(["conv_id","turn_idx"], ["ts","ingest_ts"])``, so if a
    crash lands between the atomic compact-file rename and the source
    deletes, the temporarily duplicated rows collapse to the identical
    result, and re-running compaction converges. Compaction itself
    applies the same dedup rule, so the operation is idempotent.

    One Ray task per partition directory (filesystem-level work the
    Dataset API can't express); only O(partitions) summary rows return
    to the driver."""
    import ray


    silver_root = F.join(out_root, "silver")
    rid = run_id or uuid_hex()
    part_dirs = sorted(F.glob(F.join(silver_root, "part=*")))

    @ray.remote
    def compact_one(part_dir: str) -> dict:
        import time as _time

        t0 = _time.perf_counter()
        key = F.basename(part_dir)[5:]
        files = sorted(F.glob(F.join(part_dir, "run-*.parquet")))
        if len(files) < min_files:
            return {"part": key, "files_in": len(files), "skipped": True}
        tbl = pa.concat_tables(
            [F.read_table(f) for f in files], promote_options="default"
        )
        rows_in = tbl.num_rows
        tbl = dedup_first(tbl, ["conv_id", "turn_idx"], ["ts", "ingest_ts"])
        out = F.join(part_dir, f"run-compact-{rid}.parquet")
        M.atomic_write_table(tbl, out)
        # manifest BEFORE the source deletes: from the instant a source can
        # be missing, a newer silver_compact manifest already supersedes the
        # per-run silver manifests that claimed it, so reconcile_lake stays
        # green through the crash window (and re-running compaction converges)
        ts_arr = tbl["ts"].combine_chunks() if tbl.num_rows else None
        ing = tbl["ingest_ts"].combine_chunks() if tbl.num_rows else None
        M.write_manifest(
            silver_root,
            M.PartitionManifest(
                stage="silver_compact",
                partition_key=key,
                run_id=rid,
                rows_in=rows_in,
                rows_out=tbl.num_rows,
                min_ts=str(pc.min(ts_arr).as_py()) if ts_arr is not None else None,
                max_ts=str(pc.max(ts_arr).as_py()) if ts_arr is not None else None,
                max_ingest_ts=str(pc.max(ing).as_py()) if ing is not None else None,
                wall_s=_time.perf_counter() - t0,
                files=[out],
                # record EXACTLY which files this rewrite coalesced, so
                # snapshot selection keeps a run that committed while the
                # compaction was in flight (its files were never read
                # here and stay on disk) instead of dropping it by
                # commit_ts alone
                extra={"files_in": len(files), "source_files": files},
            ),
        )
        for f in files:
            if f != out:
                F.remove(f)
        return {
            "part": key,
            "files_in": len(files),
            "rows_in": rows_in,
            "rows_out": tbl.num_rows,
            "file": out,
            "skipped": False,
        }

    results = ray.get([compact_one.remote(d) for d in part_dirs])
    done = [r for r in results if not r.get("skipped")]
    summary = {
        "run_id": rid,
        "partitions": len(part_dirs),
        "compacted": len(done),
        "files_removed": sum(r["files_in"] - 1 for r in done),
        "rows_out": sum(r["rows_out"] for r in done),
    }
    return summary


def uuid_hex() -> str:
    import uuid

    return uuid.uuid4().hex[:12]


def reconcile_lake(out_root: str, run_id: str | None = None) -> dict:
    """Lineage-integrity reconciliation: verify that every silver/gold
    partition manifest's file list exists on disk with the manifested
    row counts, and flag on-disk parquet leaves no manifest claims
    (orphans — e.g. debris from a killed run before its manifest
    landed). Filesystem metadata + parquet footers only, no data reads.
    The check a resumable lake needs before trusting `completed_partitions`
    for a resume, and the per-partition-metrics audit the north rule's
    lineage requirement implies.

    Multi-run semantics: silver is append-per-run, so every silver
    manifest stays live — UNLESS a later ``compact_silver`` absorbed the
    partition's run files, in which case the newest ``silver_compact``
    manifest describes the current bytes and older silver / compact
    manifests for that partition are superseded (skipped for parity;
    their still-existing files remain claimed so a compaction crash
    window never reports orphans). Gold is overwrite-per-partition, so
    only the NEWEST gold manifest per partition (by manifest mtime)
    describes the current bytes. ``run_id`` narrows missing/row checks
    to one run's manifests; the orphan scan always considers every
    manifest's claims."""

    missing: list[dict] = []
    mismatched: list[dict] = []
    claimed: set[str] = set()
    # fragments removed by C8 retention are expected absences; their
    # audited row counts reconcile the manifest totals below
    gold_root = F.join(out_root, "gold")
    expired_rows: dict[str, int] = {}
    for em in M.load_manifests(out_root, "expire"):
        for r in em.extra.get("removed", []):
            d = F.canon(F.join(gold_root, r["fragment"]))
            expired_rows[d] = expired_rows.get(d, 0) + int(r["rows"])

    def expired_dir_of(path: str) -> str | None:
        rp = F.canon(path)
        for d in expired_rows:
            if rp.startswith(d + "/") or rp == d:
                return d
        return None

    # partition manifests live under each layer's own root; ALL of them
    # contribute file claims (so older runs' silver appends are never
    # "orphans"), but only live ones are parity-checked
    all_manifests: list[tuple] = []
    silver_root = F.join(out_root, "silver")
    for stage, root in (
        ("silver", silver_root),
        ("silver_compact", silver_root),
        ("gold", F.join(out_root, "gold")),
    ):
        for m in M.load_manifests(root, stage):
            mtime = F.getmtime(
                M.manifest_path(root, m.stage, m.partition_key, m.run_id)
            )
            all_manifests.append((m, mtime))
            for f in m.files:
                if F.exists(f):
                    claimed.add(F.canon(f))
    # gold overwrites per partition: keep only the newest manifest per key;
    # compaction rewrites silver per partition: silver/compact manifests
    # older than the newest silver_compact manifest are superseded
    latest_gold: dict[str, float] = {}
    latest_compact: dict[str, float] = {}
    for m, mtime in all_manifests:
        if m.stage == "gold":
            latest_gold[m.partition_key] = max(
                latest_gold.get(m.partition_key, 0.0), mtime
            )
        elif m.stage == "silver_compact":
            latest_compact[m.partition_key] = max(
                latest_compact.get(m.partition_key, 0.0), mtime
            )

    def _live(m: M.PartitionManifest, mtime: float) -> bool:
        if m.stage == "gold":
            return mtime >= latest_gold[m.partition_key]
        if m.stage == "silver_compact":
            return mtime >= latest_compact[m.partition_key]
        # silver append: live unless absorbed by a later compaction
        return latest_compact.get(m.partition_key, -1.0) < mtime

    manifests = [
        m
        for m, mtime in all_manifests
        if (run_id is None or m.run_id == run_id) and _live(m, mtime)
    ]
    for m in manifests:
        rows_found = 0
        rows_expired = 0
        any_missing = False
        expired_seen: set[str] = set()
        for f in m.files:
            if not F.exists(f):
                d = expired_dir_of(f)
                if d is not None:
                    if d not in expired_seen:  # dir rows counted once
                        expired_seen.add(d)
                        rows_expired += expired_rows[d]
                    continue
                any_missing = True
                missing.append(
                    {"stage": m.stage, "partition": m.partition_key, "file": f}
                )
                continue
            rows_found += F.parquet_rows(f)
        # row parity over surviving files: manifest total minus the rows
        # the expire audit accounts for must equal what is on disk
        if not any_missing and rows_found != m.rows_out - rows_expired:
            mismatched.append(
                {
                    "stage": m.stage,
                    "partition": m.partition_key,
                    "manifest_rows": m.rows_out - rows_expired,
                    "disk_rows": rows_found,
                }
            )
    orphans = [
        f
        for layer in ("silver", "gold")
        for f in F.glob(F.join(out_root, layer, "part=*", "**", "*.parquet"),
                        recursive=True)
        if F.canon(f) not in claimed
    ]
    return {
        "manifests_checked": len(manifests),
        "ok": not (missing or mismatched or orphans),
        "missing_files": missing,
        "row_mismatches": mismatched,
        "orphan_files": sorted(orphans),
    }


def latest_per_conv(gold_tbl: pa.Table) -> pa.Table:
    """Latest feature row per conv_id (argmax ts, tiebreak max turn_idx) —
    the typed-Parquet online table replacing the reference's stringified
    feature-store upsert (silver_and_gold.py:147-162, S13)."""
    if gold_tbl.num_rows == 0:
        return gold_tbl
    conv = pc.dictionary_encode(gold_tbl["conv_id"].combine_chunks()).indices
    kc = np.asarray(conv).astype(np.int64)
    ts = np.asarray(gold_tbl["ts"].combine_chunks().cast(pa.int64()))
    ti = np.asarray(gold_tbl["turn_idx"].combine_chunks().cast(pa.int64()))
    order = np.lexsort((-ti, -ts, kc))
    k = kc[order]
    first = np.zeros(len(k), dtype=bool)
    first[0] = True
    first[1:] = k[1:] != k[:-1]
    return gold_tbl.take(pa.array(order[first]))


def read_gold(out_root: str):
    """Gold layer as a Dataset (partition-pruned read for downstream)."""
    import ray.data as rd

    return read_parquet_sized(F.join(out_root, "gold"))


def _snapshot_part_datasets(out_root: str, as_of: float, per_group):
    """Shared snapshot-read shape for silver/gold time travel: pick the
    exact file set via the manifest log, group files by silver hash
    partition (conv→partition assignment is stable across runs, so a
    ``part=`` dir is an exact dedup group with NO shuffle), and run
    ``per_group(deduped_table)`` as one Ray task per partition. Returns
    ``None`` when the snapshot is empty (``as_of`` before the first
    commit) — callers substitute their empty-schema table."""
    import ray
    import ray.data as rd

    from ..state.manifest import snapshot_files

    files = snapshot_files(
        F.join(out_root, "silver"), RUN_STAGE_SILVER, as_of
    )
    if not files:
        return None
    by_part: dict[str, list[str]] = {}
    for f in files:
        by_part.setdefault(F.basename(F.dirname(f)), []).append(f)

    @ray.remote
    def run_group(fs: list[str]) -> pa.Table:
        tbl = pa.concat_tables(
            [F.read_table(f) for f in fs], promote_options="default"
        )
        return per_group(dedup_first(tbl, ["conv_id", "turn_idx"], ["ts", "ingest_ts"]))

    return rd.from_arrow_refs(
        [run_group.remote(fs) for _, fs in sorted(by_part.items())]
    )


def read_silver_snapshot(out_root: str, as_of: float, *, dedup: bool = True):
    """Snapshot-isolation (time-travel) read of the silver layer as of
    wall-clock ``as_of`` (epoch seconds): the manifest log picks the
    exact file set every run committed at or before ``as_of`` produced
    (state/manifest.snapshot_files — compaction rewrites supersede
    exactly the files they coalesced). Raises
    ``SnapshotUnavailableError`` when a later compaction/expire
    garbage-collected the needed history; an ``as_of`` before the first
    commit returns an empty silver-schema dataset.

    ``dedup=True`` applies the standard silver consumer contract (keep
    first (ts, ingest_ts) per (conv_id, turn_idx)) distributed per
    silver hash-partition directory.

    Gold has no snapshot axis by design (partitions are recomputed in
    place); a historical gold is reproduced by running the feature pass
    over a silver snapshot — see :func:`gold_snapshot`."""
    import ray.data as rd

    from ..schema import SILVER

    if not dedup:
        from ..state.manifest import snapshot_files

        files = snapshot_files(
            F.join(out_root, "silver"), RUN_STAGE_SILVER, as_of
        )
        if not files:
            return rd.from_arrow(SILVER.empty_table())
        return read_parquet_sized(files)
    ds = _snapshot_part_datasets(out_root, as_of, lambda t: t)
    return ds if ds is not None else rd.from_arrow(SILVER.empty_table())


def gold_snapshot(out_root: str, as_of: float, *, gold_cfg: GoldConfig | None = None):
    """Historical gold feature vectors as of ``as_of``: the gold pass is
    a pure function of deduped silver, so the point-in-time gold is
    reproduced by running ``gold_features_partition`` over the silver
    snapshot's partition groups — exactly what the stream run whose
    commit was latest at ``as_of`` computed (training-time point-in-time
    correctness at the LAKE level; the as-of JOIN gives it at the row
    level). One Ray task per silver hash partition, files picked by the
    manifest log, nothing recomputed outside the snapshot."""
    import ray.data as rd

    cfg = gold_cfg or GoldConfig(dedup=False)
    ds = _snapshot_part_datasets(
        out_root, as_of, lambda t, c=cfg: gold_features_partition(t, c)
    )
    if ds is not None:
        return ds
    from ..schema import SILVER

    return rd.from_arrow(gold_features_partition(SILVER.empty_table(), cfg))


def read_online(out_root: str) -> pa.Table:
    files = sorted(F.glob(F.join(out_root, "online", "part=*", "data.parquet")))
    if not files:  # pre-bootstrap / wiped lake: empty typed table
        return pa.table({f.name: pa.array([], f.type) for f in S.GOLD})
    return pa.concat_tables([F.read_table(f) for f in files])


def lookup_online(out_root: str, conv_ids: list[str]) -> pa.Table:
    """S9 point/batch feature lookup (reference
    feature_store/ingest_features.py:107-143 get_record/batch_get_record):
    route each requested conv_id to its hash partition via the persisted
    partitioning meta, read ONLY those partitions' files, and filter with
    a vectorized ``pc.is_in``. Cost is O(|ids| / num_parts) files touched,
    independent of lake size."""
    from ..stages.keyed import hash_key

    online_root = F.join(out_root, "online")
    with F.open_(F.join(online_root, "_meta.json")) as f:
        meta = json.load(f)
    num_parts = int(meta["num_parts"])
    ids_arr = pa.array(conv_ids, pa.string())
    parts = np.unique(hash_key(ids_arr) % np.uint64(num_parts)).astype(np.int64)
    tables = []
    for p in parts:
        f = F.join(online_root, f"part={int(p):05d}", "data.parquet")
        if not F.exists(f):
            continue
        t = F.read_table(f)
        tables.append(t.filter(pc.is_in(t["conv_id"], value_set=ids_arr)))
    if not tables:
        return pa.table({f.name: pa.array([], f.type) for f in S.GOLD})
    return pa.concat_tables(tables)


def bootstrap_lake(out_root: str) -> dict:
    """C7 feature-group bootstrap (reference
    feature_store/register_feature_groups.py:13-76 registers typed
    features and polls creation): write the canonical layer schemas as a
    JSON manifest plus an empty typed online table, idempotently, so
    downstream consumers can resolve types before any data lands. Returns
    the registration summary."""
    layers = {"bronze": S.BRONZE, "silver": S.SILVER, "gold": S.GOLD}
    reg = {
        name: [{"name": f.name, "type": str(f.type)} for f in sch]
        for name, sch in layers.items()
    }
    F.makedirs(out_root, exist_ok=True)
    schema_path = F.join(out_root, "_schemas.json")
    F.write_text_atomic(schema_path, json.dumps(reg, indent=1))
    online_root = F.join(out_root, "online")
    # existence-guarded like _meta.json: re-running bootstrap on a
    # populated lake must never wipe live online rows in partition 0
    online_seed = F.join(online_root, "part=00000", "data.parquet")
    if not F.exists(online_seed):
        empty = pa.table({f.name: pa.array([], f.type) for f in S.GOLD})
        M.atomic_write_table(empty, online_seed)
    meta_path = F.join(online_root, "_meta.json")
    if not F.exists(meta_path):
        F.write_text_atomic(
            meta_path, json.dumps({"num_parts": 1, "key": "conv_id"})
        )
    return {"schemas": schema_path, "layers": sorted(reg), "status": "Created"}

"""The daily job: gold → training / validation / inference datasets.

Re-expresses ``spark_jobs/build_datasets.py`` (trace in SURVEY.md §3.2):
dt-range filter (M9) → label derivation (M8) → deterministic md5 hash
split (O2 — stable under any parallelism, unlike Spark's randomSplit
seed, build_datasets.py:63) → overwrite writes (S5) + metadata manifest
with counts (A1/S6). Shuffle-free: every step is embarrassingly parallel.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries_relational import md5_bucket

LABEL_THRESHOLD = 1000  # is_long := len(text) > 1000 (reference: amount > 1000)


def label_batch(t: pa.Table) -> pa.Table:
    is_long = pc.cast(
        pc.greater(pc.utf8_length(t["text"]), LABEL_THRESHOLD), pa.int32()
    )
    return t.append_column("is_long", is_long)


def split_batch(t: pa.Table, which: str, train_pct: int = 80) -> pa.Table:
    conv = np.asarray(t["conv_id"].combine_chunks().cast(pa.string()))
    ti = np.asarray(t["turn_idx"].combine_chunks().cast(pa.int64()))
    keys = np.char.add(np.char.add(conv.astype("U"), "#"), ti.astype("U"))
    bucket = md5_bucket(keys)
    mask = bucket < train_pct if which == "train" else bucket >= train_pct
    return t.filter(pa.array(mask))


def run_daily(
    out_root: str,
    *,
    created_at: str,
    dt_start: str | None = None,
    dt_end: str | None = None,
    inference_days: int = 2,
    feature_version: str = "1.0",
) -> dict:
    """Build train/validation/inference datasets from the gold layer."""
    import ray.data as rd

    gold_dir = os.path.join(out_root, "gold")
    ds = rd.read_parquet(gold_dir)
    if dt_start is not None:
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.greater_equal(t["dt"], dt_start),
                    pc.less_equal(t["dt"], dt_end),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    labeled = ds.map_batches(label_batch, batch_format="pyarrow", zero_copy_batch=True)

    counts = {}
    for which in ("train", "validation"):
        out_dir = os.path.join(out_root, "datasets", which)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)  # overwrite semantics (build_datasets.py:68)
        part = labeled.map_batches(
            lambda t, w=which: split_batch(t, w),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        part.write_parquet(out_dir)
        counts[which] = sum(
            b.num_rows
            for b in rd.read_parquet(out_dir).iter_batches(batch_format="pyarrow")
        )

    # inference: last N dt partitions, labels + dt dropped (M10, M11)
    dts = sorted(
        {
            d
            for b in rd.read_parquet(gold_dir, columns=["dt"]).iter_batches(
                batch_format="pyarrow"
            )
            for d in b["dt"].to_pylist()
        }
    )
    recent = dts[-inference_days:]
    inf_dir = os.path.join(out_root, "datasets", "inference")
    if os.path.isdir(inf_dir):
        shutil.rmtree(inf_dir)
    inf = (
        rd.read_parquet(gold_dir)
        .map_batches(
            lambda t: t.filter(
                pc.is_in(t["dt"], value_set=pa.array(recent, pa.string()))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .drop_columns(["dt", "text"])
    )
    inf.write_parquet(inf_dir)
    counts["inference"] = sum(
        b.num_rows
        for b in rd.read_parquet(inf_dir).iter_batches(batch_format="pyarrow")
    )

    meta = {
        "created_at": created_at,
        "dt_range": [dt_start, dt_end],
        "inference_dts": recent,
        "counts": counts,
        "feature_version": feature_version,
        "label": f"is_long := utf8_length(text) > {LABEL_THRESHOLD}",
    }
    meta_path = os.path.join(out_root, "datasets", "metadata.json")
    os.makedirs(os.path.dirname(meta_path), exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    return meta

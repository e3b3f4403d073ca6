"""Gzip-NDJSON ingest path (reference S1: ``spark.read.json`` over
``*.json.gz`` bronze objects, spark_jobs/silver_and_gold.py:53, and S11
writer, scripts/transform_and_prepare_sample_data.py:54-70).

Parquet is the primary bronze format (input_hint); this keeps format
parity for NDJSON landing zones."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pyarrow as pa

from .. import schema as S


def write_ndjson_gz(tbl: pa.Table, path: str, rows_per_file: int = 100_000) -> list[str]:
    """Write a table as gzip NDJSON files (bronze landing-zone format)."""
    os.makedirs(path, exist_ok=True)
    files = []
    n = tbl.num_rows
    for i, start in enumerate(range(0, max(n, 1), rows_per_file)):
        chunk = tbl.slice(start, rows_per_file)
        fp = os.path.join(path, f"part-{i:05d}.json.gz")
        with gzip.open(fp, "wt") as f:
            cols = chunk.to_pydict()
            names = list(cols)
            for r in range(chunk.num_rows):
                rec = {c: cols[c][r] for c in names}
                for c in ("ts", "ingest_ts"):
                    if c in rec and rec[c] is not None:
                        rec[c] = rec[c].isoformat()
                f.write(json.dumps(rec) + "\n")
        files.append(fp)
    return files


def read_ndjson_transcripts(path: str):
    """Gzip NDJSON → transcript Dataset with canonical schema casts
    (gzip is auto-detected from the .gz extension by the Arrow reader)."""
    import ray.data as rd

    ds = rd.read_json(sorted(glob.glob(os.path.join(path, "*.json.gz"))))

    def cast(t: pa.Table) -> pa.Table:
        cols = {}
        for f in S.BRONZE:
            if f.name not in t.column_names:
                continue
            col = t[f.name]
            if pa.types.is_timestamp(f.type) and pa.types.is_string(col.type):
                col = col.cast(pa.timestamp("us"))
            cols[f.name] = col.cast(f.type) if col.type != f.type else col
        return pa.table(cols)

    return ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)


def write_csv(tbl: pa.Table, path: str, rows_per_file: int = 100_000) -> list[str]:
    """Write a table as headered CSV files (the other common landing-zone
    format next to NDJSON). Timestamps ISO, None → empty field."""
    os.makedirs(path, exist_ok=True)
    files = []
    n = tbl.num_rows
    for i, start in enumerate(range(0, max(n, 1), rows_per_file)):
        chunk = tbl.slice(start, rows_per_file).to_pandas()
        fp = os.path.join(path, f"part-{i:05d}.csv")
        chunk.to_csv(fp, index=False, date_format="%Y-%m-%dT%H:%M:%S.%f")
        files.append(fp)
    return files


def read_csv_transcripts(path: str):
    """CSV → transcript Dataset with canonical schema casts. Empty fields
    read as NULL (matching the writer's None encoding and DuckDB's
    read_csv default), so the round trip is exact."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    ds = rd.read_csv(
        sorted(glob.glob(os.path.join(path, "*.csv"))),
        convert_options=pacsv.ConvertOptions(strings_can_be_null=True),
    )

    def cast(t: pa.Table) -> pa.Table:
        cols = {}
        for f in S.BRONZE:
            if f.name not in t.column_names:
                continue
            col = t[f.name]
            if pa.types.is_timestamp(f.type) and pa.types.is_string(col.type):
                col = col.cast(pa.timestamp("us"))
            cols[f.name] = col.cast(f.type) if col.type != f.type else col
        return pa.table(cols)

    return ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)

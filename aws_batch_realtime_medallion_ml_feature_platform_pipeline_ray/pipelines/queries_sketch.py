"""HyperLogLog distinct-count sketch with an exact generated DuckDB
twin — the one-pass, no-shuffle-of-keys alternative to exact distinct
counting at 100 TB.

Scale shape: the event stream collapses to at most ``HLL_M`` (4096)
register rows per group inside each batch, ONE keyed exchange moves only
(group, register, rho) maxima, and the estimator runs on a single tiny
block. Nothing proportional to the stream or the key space ever
shuffles — this is what replaces ``events_distinct_users``'s
O(distinct pairs) exchange when user cardinality itself is huge.

Oracle exactness: the register assignment is pure splitmix64 bit
arithmetic (mirrored in HUGEINT SQL like the MinHash/SimHash twins), the
register sum is computed as an exact scaled integer on both sides, and
the floating-point estimator applies the same operations in the same
order, so the Ray estimate and the SQL estimate are the same double
(rounded to 6 digits to absorb the one libm ``ln`` call)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.keyed import map_partitions_by_key, splitmix64
from .queries_extra import NUM_PARTS
from .queries_relational import _M64, _SM_C1, _SM_C2, _SM_GOLD, _mul64_sql

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
_SCALE = 1 << 53  # 2^53: makes every 2^-rho term an integer
_LOW_BITS = 64 - HLL_P  # 52
_LOW_MASK = np.uint64((1 << _LOW_BITS) - 1)


def hll_registers(t: pa.Table) -> pa.Table:
    """Per-batch (event_type, reg, rho) maxima: splitmix64 the key, top
    ``HLL_P`` bits pick the register, rho = 1-based position of the first
    set bit in the remaining 52 (53 when they are all zero). Exact
    floor(log2) via frexp (inputs < 2^53). Output is <= groups x 4096
    rows regardless of batch size."""
    uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64())).astype(
        np.uint64
    )
    h = splitmix64(uid)
    reg = (h >> np.uint64(_LOW_BITS)).astype(np.int64)
    low = (h & _LOW_MASK).astype(np.float64)  # exact: < 2^52
    e = np.frexp(low)[1]  # floor(log2(low)) = e - 1 for low > 0
    rho = np.where(low == 0, _LOW_BITS + 1, _LOW_BITS - (e - 1)).astype(np.int64)
    enc = pc.dictionary_encode(t["event_type"].combine_chunks())
    code = np.asarray(enc.indices).astype(np.int64)
    key = code * HLL_M + reg
    mx = np.zeros((len(enc.dictionary)) * HLL_M, dtype=np.int64)
    np.maximum.at(mx, key, rho)
    used = np.flatnonzero(mx)
    return pa.table(
        {
            "event_type": enc.dictionary.take(pa.array(used // HLL_M)),
            "reg": pa.array(used % HLL_M, pa.int64()),
            "rho": pa.array(mx[used], pa.int64()),
        }
    )


def _estimate(rho_by_reg: np.ndarray) -> float:
    """The estimator both sides mirror operation-for-operation."""
    used = len(rho_by_reg)
    counts = np.bincount(rho_by_reg, minlength=_LOW_BITS + 2)
    s_scaled = sum(
        int(c) << (_LOW_BITS + 1 - r)
        for r, c in enumerate(counts)
        if r >= 1 and c
    ) + (HLL_M - used) * _SCALE  # empty registers contribute 2^0
    s_un = float(s_scaled) / 9007199254740992.0
    alpha = 0.7213 / (1.0 + 1.079 / 4096.0)
    e_raw = alpha * 4096.0 * 4096.0 / s_un
    v = HLL_M - used
    if e_raw <= 2.5 * 4096.0 and v > 0:
        return 4096.0 * float(np.log(4096.0 / float(v)))
    return e_raw


def q_events_hll_users(sf_dir: str):
    """Approximate distinct users per event type via HyperLogLog
    (p=12, ~1.6 % standard error), oracle-checked against the generated
    SQL twin of the identical sketch."""
    from ..sources.reads import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    partials = ds.map_batches(
        hll_registers, batch_format="pyarrow", zero_copy_batch=True
    )

    def max_per_reg(part: pa.Table) -> pa.Table:
        g = part.group_by(["event_type", "reg"]).aggregate([("rho", "max")])
        return g.rename_columns(["event_type", "reg", "rho"])

    merged = map_partitions_by_key(partials, "reg", max_per_reg, num_parts=NUM_PARTS)

    def fold(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        rows = []
        for et, g in df.groupby("event_type", sort=True):
            # one row per register is guaranteed after the keyed max
            est = _estimate(g["rho"].to_numpy())
            rows.append((et, est, len(g)))
        out = pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "hll_users": pa.array([r[1] for r in rows], pa.float64()),
                "used_registers": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        return out.set_column(
            1,
            "hll_users",
            pc.round(out["hll_users"], ndigits=6, round_mode="half_towards_infinity"),
        )

    return merged.repartition(1).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _splitmix_raw_sql(col: str, src: str) -> str:
    """CTE chain computing raw ``splitmix64(col)`` as ``__h``."""
    return f"""
__s0 AS (SELECT *, (({col}::HUGEINT + {_SM_GOLD}) % {_M64}) AS __z0 FROM {src}),
__s1 AS (SELECT *, xor(__z0, __z0 >> 30) AS __y1 FROM __s0),
__s2 AS (SELECT *, {_mul64_sql('__y1', _SM_C1)} AS __z1 FROM __s1),
__s3 AS (SELECT *, xor(__z1, __z1 >> 27) AS __y2 FROM __s2),
__s4 AS (SELECT *, {_mul64_sql('__y2', _SM_C2)} AS __z2 FROM __s3),
__sh AS (SELECT *, xor(__z2, __z2 >> 31) AS __h FROM __s4)
"""


def _rho_case_sql() -> str:
    """rho from the low 52 bits via descending power-of-two thresholds."""
    whens = "\n".join(
        f"        WHEN __low >= {1 << (_LOW_BITS - r)} THEN {r}"
        for r in range(1, _LOW_BITS + 1)
    )
    return f"CASE\n{whens}\n        ELSE {_LOW_BITS + 1} END"


def _hll_sql() -> str:
    return f"""
WITH {_splitmix_raw_sql('user_id', 'events')},
r AS (
    SELECT event_type,
           (__h >> {_LOW_BITS})::BIGINT AS reg,
           {_rho_case_sql()} AS rho
    FROM (SELECT *, (__h % {1 << _LOW_BITS}::HUGEINT) AS __low FROM __sh)
),
mx AS (
    SELECT event_type, reg, MAX(rho) AS rho FROM r GROUP BY 1, 2
),
s AS (
    SELECT event_type,
           SUM((1::BIGINT << ({_LOW_BITS + 1} - rho))::HUGEINT) AS s_present,
           count(*)::BIGINT AS used
    FROM mx GROUP BY 1
),
e AS (
    SELECT event_type, used,
           (s_present + ({HLL_M} - used)::HUGEINT * {_SCALE}::HUGEINT)::DOUBLE
               / 9007199254740992.0 AS s_un
    FROM s
),
f AS (
    SELECT event_type, used,
           (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 / s_un AS e_raw
    FROM e
)
SELECT event_type,
       ROUND(CASE WHEN e_raw <= 2.5 * 4096.0 AND {HLL_M} - used > 0
                  THEN 4096.0 * ln(4096.0 / ({HLL_M} - used)::DOUBLE)
                  ELSE e_raw END, 6) AS hll_users,
       used AS used_registers
FROM f
"""


EVENTS_HLL_SQL = _hll_sql()


REGISTRY: dict[str, tuple] = {
    "events_hll_users": (q_events_hll_users, EVENTS_HLL_SQL),
}

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


# --------------------------------------------------------------------------
# Heavy-hitter tokens: mergeable Misra-Gries sketch + exact rescore
# --------------------------------------------------------------------------

# keep tokens with global frequency >= total_tokens / HH_DENOM
HH_DENOM = 200
# per-batch sketch size; error after merging <= N / MG_K, and
# MG_K >= 2 * HH_DENOM makes the candidate superset guarantee hold
MG_K = 2 * HH_DENOM


def _mg_reduce(tokens: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction of an exact (token, count) summary to <= k
    entries: subtract the (k+1)-th largest count from all, keep the
    positive remainder. Classic mergeable-summaries decrement, vectorized
    (np.partition, no loop)."""
    if len(counts) <= k:
        return tokens, counts
    d = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    keep = counts > d
    return tokens[keep], counts[keep] - d


def q_docs_heavy_tokens(sf_dir: str):
    """Tokens whose global frequency is >= 1/HH_DENOM of the total token
    stream — heavy hitters with EXACT output via a two-pass plan:

    1. sketch pass: per batch, exact local counts collapse to a <= MG_K
       entry Misra-Gries summary (bounded memory regardless of vocab
       size — the property the tf/commonness term shuffles lack at
       100 TB). The merged summary underestimates any token by at most
       N/MG_K < threshold, so every true heavy hitter survives the
       candidate cut (mergeable-summaries guarantee).
    2. rescore pass: the small candidate set is broadcast and counted
       EXACTLY (is_in filter + per-batch partials), so the final output
       is identical to the SQL ``HAVING count * HH_DENOM >= N`` — the
       sketch only bounds memory, never the answer.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.text import _flat_tokens, tokens_list
    from ..sources.reads import read_parquet_sized

    def docs(columns):
        return read_parquet_sized(f"{sf_dir}/documents.parquet", columns=columns)

    def sketch_partial(t: pa.Table) -> pa.Table:
        flat, _off = _flat_tokens(tokens_list(t["text"]))
        if len(flat) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64()),
                 "n_tok": pa.array([], pa.int64())}
            )
        enc = pc.dictionary_encode(flat)
        counts = np.bincount(
            np.asarray(enc.indices), minlength=len(enc.dictionary)
        ).astype(np.int64)
        toks = np.asarray(enc.dictionary.cast(pa.large_string()))
        toks, red = _mg_reduce(toks, counts, MG_K)
        n_tok = np.zeros(len(toks), np.int64)
        if len(n_tok):
            n_tok[0] = len(flat)  # batch token total rides the first row
        return pa.table(
            {"term": pa.array(toks, pa.string()),
             "c": pa.array(red),
             "n_tok": pa.array(n_tok)}
        )

    sketches = docs(["text"]).map_batches(
        sketch_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = sketches.groupby("term").aggregate(
        Sum("c", alias_name="mc"), Sum("n_tok", alias_name="nt")
    ).materialize()  # bounded: <= MG_K x blocks rows, stays distributed
    n_total = int(merged.sum("nt"))
    # candidate cut runs DISTRIBUTED: survive if the merged count could
    # still reach threshold (threshold = ceil(N/denom); max underestimate
    # = N/MG_K = thr/2). Since merged counts sum to <= N, at most
    # 2*HH_DENOM candidates exist — the driver collect is O(1), never
    # O(blocks), at any corpus size.
    cut = np.int64(2 * HH_DENOM)
    cand_ds = merged.map_batches(
        lambda t: t.filter(
            pc.greater_equal(
                pc.multiply(t["mc"].cast(pa.int64()), pa.scalar(cut, pa.int64())),
                pa.scalar(n_total, pa.int64()),
            )
        ).select(["term"]),
        batch_format="pyarrow",
    )
    cand = cand_ds.to_pandas()
    cand_ref = ray.put(pa.array(cand["term"].to_numpy(object), pa.string()))

    def exact_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        cands = ray.get(cand_ref)
        flat, _off = _flat_tokens(tokens_list(t["text"]))
        hit = flat.filter(pc.is_in(flat, value_set=cands))
        if len(hit) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "pc": pa.array([], pa.int64())}
            )
        enc = pc.dictionary_encode(hit)
        counts = np.bincount(
            np.asarray(enc.indices), minlength=len(enc.dictionary)
        ).astype(np.int64)
        return pa.table(
            {"term": enc.dictionary.cast(pa.string()),
             "pc": pa.array(counts)}
        )

    exact = docs(["text"]).map_batches(
        exact_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = exact.groupby("term").aggregate(Sum("pc", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].cast(pa.int64())
        keep = pc.greater_equal(
            pc.multiply(n, pa.scalar(HH_DENOM, pa.int64())),
            pa.scalar(n_total, pa.int64()),
        )
        return pa.table({"term": t["term"], "n": n}).filter(keep)

    return out.map_batches(finish, batch_format="pyarrow")


DOCS_HEAVY_TOKENS_SQL = f"""
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
n AS (SELECT count(*)::BIGINT AS n_total FROM tok)
SELECT term, count(*)::BIGINT AS n
FROM tok GROUP BY 1
HAVING count(*) * {HH_DENOM} >= (SELECT n_total FROM n)
"""


# --------------------------------------------------------------------------
# Count-min sketch: point-frequency estimates with bounded memory
# --------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row
CMS_PROBES = ("the", "data", "merge", "vector", "spark")


def _cms_buckets(h: np.ndarray) -> list[np.ndarray]:
    """Row-r bucket = bits [16r, 16r+10) of the md5-lower-64 token hash —
    four disjoint 16-bit windows of a uniform 64-bit hash give the d
    independent-enough hash functions a CMS needs, and the window
    extraction is pure shift/mask arithmetic on BOTH sides (no second
    hash chain in SQL)."""
    return [
        ((h >> np.uint64(16 * r)) & np.uint64(CMS_W - 1)).astype(np.int64)
        for r in range(CMS_D)
    ]


def q_docs_cms_tokens(sf_dir: str):
    """Count-min sketch (d=4, w=1024) over the document token stream,
    probed for ``CMS_PROBES`` — the mergeable point-frequency estimator
    whose memory is a fixed d×w integer grid at ANY vocabulary size (the
    third sketch family beside HyperLogLog and Misra-Gries; estimates
    are exact-or-over, never under).

    Scale shape: each batch collapses its tokens into ≤ d·w (cell,
    count) partial rows — the token stream never shuffles; the only
    exchange is the tiny cell groupby (≤ 4096 groups), and probing is a
    driver-side O(d × |probes|) lookup on the folded grid. The oracle
    twin reproduces the identical sketch in SQL (md5-lower-64 basis,
    same bit windows), so the estimate itself is value-checked, not just
    the plumbing."""
    from ray.data.aggregate import Sum

    from ..functions.text import token_hashes_md5
    from ..sources.reads import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["text"])

    def cms_partial(t: pa.Table) -> pa.Table:
        h, _off = token_hashes_md5(t["text"].combine_chunks())
        if len(h) == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        cells = np.concatenate(
            [r * CMS_W + b for r, b in enumerate(_cms_buckets(h))]
        )
        counts = np.bincount(cells, minlength=CMS_D * CMS_W).astype(np.int64)
        used = np.flatnonzero(counts)
        return pa.table(
            {"cell": pa.array(used, pa.int64()), "c": pa.array(counts[used])}
        )

    grid_df = (
        ds.map_batches(cms_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    grid = np.zeros(CMS_D * CMS_W, np.int64)
    grid[grid_df["cell"].to_numpy()] = grid_df["c"].to_numpy()

    import hashlib

    out_terms, out_counts = [], []
    for term in CMS_PROBES:
        th = np.array(
            [int.from_bytes(hashlib.md5(term.encode()).digest()[8:16], "little")],
            np.uint64,
        )
        est = min(
            int(grid[r * CMS_W + int(b[0])])
            for r, b in enumerate(_cms_buckets(th))
        )
        out_terms.append(term)
        out_counts.append(est)
    return pa.table(
        {
            "term": pa.array(out_terms, pa.string()),
            "cms_count": pa.array(out_counts, pa.int64()),
        }
    )


DOCS_CMS_SQL = f"""
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
rr AS (SELECT unnest([{", ".join(str(r) for r in range(CMS_D))}]) AS r),
cells AS (
    SELECT r,
           ((md5_number_lower(term) >> (16 * r)) % {CMS_W})::BIGINT AS bucket,
           count(*)::BIGINT AS c
    FROM tok, rr GROUP BY 1, 2
),
probes AS (
    SELECT term FROM (VALUES {", ".join(f"('{t}')" for t in CMS_PROBES)}) p(term)
),
pb AS (
    SELECT term, r,
           ((md5_number_lower(term) >> (16 * r)) % {CMS_W})::BIGINT AS bucket
    FROM probes, rr
)
SELECT term, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS cms_count
FROM pb LEFT JOIN cells USING (r, bucket)
GROUP BY 1
"""


REGISTRY: dict[str, tuple] = {
    "events_hll_users": (q_events_hll_users, EVENTS_HLL_SQL),
    "docs_heavy_tokens": (q_docs_heavy_tokens, DOCS_HEAVY_TOKENS_SQL),
    "docs_cms_tokens": (q_docs_cms_tokens, DOCS_CMS_SQL),
}

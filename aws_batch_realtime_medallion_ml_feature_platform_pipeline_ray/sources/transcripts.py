"""Transcript table sources.

Two ways to obtain the canonical transcript table
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json input_hint):

1. :func:`events_to_transcripts` — a deterministic derivation from the
   driver's ``events`` table (event_id, ts, user_id, event_type, value,
   props). The same derivation is expressed in SQL
   (:data:`TRANSCRIPTS_SQL_CTE`) so every windowed operator has a DuckDB
   oracle with value-hash parity. ``turn_idx`` (a per-conversation
   row_number) is computed inside the keyed pass, not here.

2. :func:`generate_transcripts` — a seeded synthetic generator (Zipf
   conversation sizes, duplicate/late/null/empty injections per
   FIXTURES.md §6) used by pytest adversarial tests and the benchmark.
   Analog of the reference's sample-data prep script
   (``scripts/transform_and_prepare_sample_data.py:117-172``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as S

# The SQL twin of events_to_transcripts(); every transcript-domain oracle
# query starts with this CTE. Ordering/tiebreak: (ts, event_id).
TRANSCRIPTS_SQL_CTE = """
transcripts AS (
    SELECT
        'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
        event_type AS role,
        props AS text,
        CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS tool,
        ts,
        event_id
    FROM events
)
"""


def events_batch_to_transcripts(batch: pa.Table) -> pa.Table:
    """Vectorized per-batch map: events columns → transcript columns
    (without turn_idx — derived later in the keyed pass, ordered by
    (ts, event_id))."""
    user = batch["user_id"]
    conv_id = pc.binary_join_element_wise(
        pa.scalar("conv_"), pc.cast(user, pa.string()), ""
    )
    # combine_chunks() compacts slice offsets first: pyarrow 16's if_else
    # emits out-of-bounds binary offsets when fed a sliced string chunk
    # (blocks arrive sliced once reads produce multi-batch blocks)
    et = batch["event_type"].combine_chunks()
    tool = pc.if_else(pc.equal(et, "error"), pa.scalar(None, pa.string()), et)
    return pa.table(
        {
            "conv_id": conv_id,
            "role": et,
            "text": batch["props"],
            "tool": tool,
            "ts": batch["ts"],
            "event_id": batch["event_id"],
        }
    )


def read_events_as_transcripts(sf_dir: str):
    """events parquet → transcript Dataset (columns pruned at the read)."""
    from .reads import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    return ds.map_batches(
        events_batch_to_transcripts, batch_format="pyarrow", zero_copy_batch=True
    )


ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.42, 0.42, 0.06, 0.10])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog stream batch window feature "
    "gold silver bronze conv turn agent tool model data ray arrow shuffle "
    "partition session lag lead join state manifest resume".split()
)


def generate_transcripts(
    n_convs: int = 1000,
    avg_turns: int = 50,
    *,
    seed: int = 42,
    zipf_a: float = 1.8,
    dup_frac: float = 0.0,
    null_frac: float = 0.0,
    empty_text_frac: float = 0.0,
    late_frac: float = 0.0,
    start_us: int = 1_704_067_200_000_000,  # 2024-01-01 UTC
    mean_gap_s: float = 120.0,
    n_tools: int = 50,
    conv_id_offset: int = 0,
) -> pa.Table:
    """Deterministic synthetic bronze transcript table (schema.BRONZE).

    Zipf-ish conversation sizes (a few mega-conversations → skew fixture),
    per-conv monotone non-decreasing ts with occasional duplicate-ts peers,
    plus seeded injections of duplicate (conv_id, turn_idx) rows, null
    conv_id, empty text, and late-arriving rows (ingest_ts >> ts).
    """
    rng = np.random.default_rng(seed)
    sizes = np.minimum(
        rng.zipf(zipf_a, n_convs) * max(1, avg_turns // 2), avg_turns * 200
    )
    sizes = np.maximum(sizes, 1)
    n = int(sizes.sum())

    conv_ids = np.repeat(np.arange(n_convs), sizes)
    # index a per-conv string pool: np.char kernels are ~50 s at 35M rows,
    # object-pool fancy indexing is <1 s
    conv_pool = np.array(
        [f"conv_{conv_id_offset + i:08d}" for i in range(n_convs)], dtype=object
    )
    conv_str = conv_pool[conv_ids]
    if n == 0:  # n_convs=0: empty typed BRONZE table, not an IndexError
        return S.BRONZE.empty_table()
    boundaries = np.zeros(n, dtype=bool)
    boundaries[np.cumsum(sizes)[:-1]] = True
    boundaries[0] = True
    arange = np.arange(n, dtype=np.int64)
    seg_first = np.maximum.accumulate(np.where(boundaries, arange, 0))
    turn_idx = (arange - seg_first).astype(np.int32)

    gaps = rng.exponential(mean_gap_s * S.US_PER_S, n).astype(np.int64)
    gaps[rng.random(n) < 0.05] = 0  # duplicate-ts peers (RANGE tie fixture)
    gaps[rng.random(n) < 0.02] = int(3 * S.SESSION_GAP_US)  # session breaks
    gaps[boundaries] = 0
    cum = np.cumsum(gaps)
    conv_offset = rng.integers(0, 30 * 24 * 3600, n_convs) * S.US_PER_S
    ts = start_us + np.repeat(conv_offset, sizes) + (cum - cum[seg_first])

    role_pool = ROLES.astype(object)
    role = role_pool[rng.choice(len(ROLES), n, p=ROLE_P)]
    tool_ids = rng.integers(0, n_tools, n)
    tool_pool = np.array([f"tool_{i}" for i in range(n_tools)], dtype=object)
    tool = tool_pool[tool_ids]
    has_tool = (role == "tool") | (rng.random(n) < 0.15)

    n_words = np.maximum(1, rng.lognormal(2.5, 1.0, n)).astype(np.int64)
    n_words = np.minimum(n_words, 200)
    text = _make_texts(rng, n_words)

    ingest_ts = ts + rng.integers(1, 60 * S.US_PER_S, n)
    late = rng.random(n) < late_frac
    ingest_ts[late] += rng.integers(
        S.US_PER_S, 24 * 3600 * S.US_PER_S, int(late.sum())
    )

    tbl = pa.table(
        {
            "conv_id": pa.array(conv_str, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            # large_string during construction: >2 GB total text would
            # overflow int32 string offsets inside take/concat; cast back
            # to canonical string (chunked) at the end.
            "text": pa.array(text, pa.large_string()),
            "tool": pa.array(tool, pa.string(), mask=~has_tool),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "ingest_ts": pa.array(ingest_ts, pa.int64()).cast(pa.timestamp("us")),
        }
    )

    # injections
    if dup_frac > 0:
        k = int(n * dup_frac)
        pick = rng.choice(n, k, replace=False)
        dup = tbl.take(pa.array(pick))
        # duplicated rows arrive later AND carry different text, so a
        # dedup keeping the wrong copy (keep-last) changes content-derived
        # features — detectable by the oracle, not just by ingest_ts
        dup = dup.set_column(
            dup.schema.get_field_index("ingest_ts"),
            "ingest_ts",
            pc.add(dup["ingest_ts"], pa.scalar(120 * S.US_PER_S, pa.duration("us"))),
        )
        dup = dup.set_column(
            dup.schema.get_field_index("text"),
            "text",
            pc.binary_join_element_wise(
                dup["text"].combine_chunks().cast(pa.string()),
                "redelivered", " ",
            ).cast(dup.schema.field("text").type),
        )
        tbl = pa.concat_tables([tbl, dup])
    if null_frac > 0 or empty_text_frac > 0:
        m = tbl.num_rows
        conv = tbl["conv_id"].combine_chunks()
        if null_frac > 0:
            mask = rng.random(m) < null_frac
            conv = pc.if_else(pa.array(mask), pa.scalar(None, pa.string()), conv)
        txt = tbl["text"].combine_chunks()
        if empty_text_frac > 0:
            mask = rng.random(m) < empty_text_frac
            txt = pc.if_else(pa.array(mask), pa.scalar("", txt.type), txt)
        tbl = tbl.set_column(0, "conv_id", conv)
        tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text", txt)

    # shuffle row order (bronze arrival order is not conv order).
    # combine_chunks first: take over a chunked source resolves chunks
    # per index (~200 s at 35M rows); over contiguous columns it is one
    # vectorized gather (large_string text keeps >2 GB legal).
    perm = rng.permutation(tbl.num_rows)
    tbl = tbl.combine_chunks().take(pa.array(perm))
    return _cast_text_to_string(tbl)


def _cast_text_to_string(tbl: pa.Table, chunk: int = 2_000_000) -> pa.Table:
    """large_string → canonical string as bounded chunks (no >2 GB chunk)."""
    idx = tbl.schema.get_field_index("text")
    col = tbl["text"]
    chunks = []
    for start in range(0, tbl.num_rows, chunk):
        sl = col.slice(start, chunk).combine_chunks()
        chunks.append(sl.cast(pa.string()))
    return tbl.set_column(idx, "text", pa.chunked_array(chunks, pa.string()))


_TEXT_POOL_SIZE = 8192


def _make_texts(rng: np.random.Generator, n_words: np.ndarray) -> np.ndarray:
    """Seeded texts via a pre-built sentence pool: the Python join loop runs
    over 8k pool entries, not N rows, so generating 10^7+ turns stays
    seconds-fast; rows index the pool vectorized. Pool sentence lengths are
    drawn from the same per-row length distribution, preserving the
    text-length spread the window features aggregate over."""
    n = len(n_words)
    pool_n = min(_TEXT_POOL_SIZE, n)
    pool_words = n_words[rng.integers(0, n, pool_n)]
    total = int(pool_words.sum())
    words = rng.choice(_WORDS, total)
    pool = np.empty(pool_n, dtype=object)
    pos = 0
    for i, k in enumerate(pool_words):
        pool[i] = " ".join(words[pos : pos + k])
        pos += k
    return pool[rng.integers(0, pool_n, n)]


def generate_bronze_distributed(
    n_convs: int,
    avg_turns: int,
    path: str,
    *,
    shards: int = 32,
    seed: int = 42,
    rows_per_file: int = 250_000,
    **gen_kwargs,
) -> int:
    """Parallel synthetic-bronze generation: each Ray task generates a
    disjoint conv-id range (seed derived per shard, deterministic) and
    writes its own parquet files. This is how gen-data stays feasible at
    bench scale (one process: ~210 s for 35M turns; 32 tasks: ~20 s) and
    how a 10^12-turn corpus would be laid down on a real cluster. Returns
    total rows written."""
    import os

    import ray

    os.makedirs(path, exist_ok=True)
    shards = min(shards, n_convs)
    # distribute the remainder so exactly n_convs conversations are produced
    base, rem = divmod(n_convs, shards)
    counts = [base + (1 if s < rem else 0) for s in range(shards)]
    offsets = [0] * shards
    for s in range(1, shards):
        offsets[s] = offsets[s - 1] + counts[s - 1]

    @ray.remote
    def _gen(shard: int) -> int:
        tbl = generate_transcripts(
            counts[shard],
            avg_turns,
            seed=seed + shard,
            conv_id_offset=offsets[shard],
            **gen_kwargs,
        )
        import pyarrow.parquet as pq

        for j, start in enumerate(range(0, tbl.num_rows, rows_per_file)):
            pq.write_table(
                tbl.slice(start, rows_per_file),
                f"{path}/part-{shard:03d}-{j:04d}.parquet",
                compression="snappy",
            )
        return tbl.num_rows

    return sum(ray.get([_gen.remote(s) for s in range(shards)]))


def write_bronze(tbl: pa.Table, path: str, rows_per_file: int = 500_000) -> None:
    import pyarrow.parquet as pq
    import os

    os.makedirs(path, exist_ok=True)
    n = tbl.num_rows
    i = 0
    for start in range(0, max(n, 1), rows_per_file):
        pq.write_table(
            tbl.slice(start, rows_per_file),
            f"{path}/part-{i:05d}.parquet",
            compression="snappy",
        )
        i += 1

"""Round-3 batch B: temperature-scaled mixture allocation, a
Great-Expectations-style data-quality audit, per-turn token novelty, and
a distributed max-subarray (associative block scan).

Float policy as queries.py: integer-exact arithmetic end to end (the
temperature here is T = 1/2, so the weight is an integer square and the
largest-remainder apportionment is pure integer division on both sides).

Reference provenance: the expectations audit generalizes the
reference's required-column / validity checks
(``/root/reference/scripts/transform_and_prepare_sample_data.py:38-42``,
``spark_jobs/silver_and_gold.py:62-65``) into a declarative audit table;
the others serve the north-rule training-data extensions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized
from ..stages.keyed import map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# docs_mixture_temperature — T=1/2 sampling allocation, integer-exact
# ---------------------------------------------------------------------------

MIX_BUDGET = 10_000  # total documents to sample across sources


def q_docs_mixture_temperature(sf_dir: str):
    """Temperature-scaled mixture allocation: distribute a global sample
    budget across sources with weights ∝ (token share)^(1/T) at T=1/2 —
    i.e. w_s = n_tok_s² — then apportion EXACTLY by the largest-remainder
    (Hamilton) method with deterministic ties (remainder DESC, source
    ASC). Sharpening T<1 upweights large sources; the integer square
    keeps both engines bit-exact where a float pow could drift.

    Plan: one distributed token-count pass (per-batch partials, the text
    never shuffles) folds to O(sources) rows — a fixed vocabulary — and
    the apportionment is O(sources) driver arithmetic, like every
    bounded finale in the registry."""
    from ray.data.aggregate import Sum

    from ..functions.text import token_count

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "p_tok": pa.array([], pa.int64()),
                }
            )
        toks = token_count(t["text"].combine_chunks()).astype(np.int64)
        src = t["source"].combine_chunks()
        enc = pc.dictionary_encode(src)
        inv = np.asarray(enc.indices).astype(np.int64)
        s = np.zeros(len(enc.dictionary), np.int64)
        np.add.at(s, inv, toks)
        return pa.table(
            {"source": enc.dictionary.cast(pa.string()), "p_tok": pa.array(s)}
        )

    folded = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("p_tok", alias_name="n_tok"))
        .to_pandas()  # O(sources): fixed vocabulary
    )
    src = folded["source"].to_numpy(object)
    n_tok = folded["n_tok"].to_numpy(np.int64)
    order = np.argsort(src)
    src, n_tok = src[order], n_tok[order]
    w = n_tok.astype(object) ** 2  # python ints: no overflow
    W = int(sum(w))
    base = np.array([int(MIX_BUDGET * int(x) // W) for x in w], np.int64)
    rem = np.array([int(MIX_BUDGET * int(x) % W) for x in w], object)
    leftover = MIX_BUDGET - int(base.sum())
    # largest remainder, tie -> lexicographically smaller source
    pick = sorted(range(len(src)), key=lambda i: (-int(rem[i]), src[i]))
    alloc = base.copy()
    for i in pick[:leftover]:
        alloc[i] += 1
    return pa.table(
        {
            "source": pa.array(list(src), pa.string()),
            "n_tok": pa.array(n_tok, pa.int64()),
            "alloc": pa.array(alloc, pa.int64()),
        }
    )


DOCS_MIXTURE_TEMPERATURE_SQL = f"""
WITH c AS (
    SELECT source,
           CAST(sum(length(string_split(text, ' '))) AS BIGINT) AS n_tok
    FROM documents GROUP BY 1
),
w AS (
    SELECT source, n_tok,
           CAST(n_tok AS HUGEINT) * n_tok AS wt,
           CAST(sum(CAST(n_tok AS HUGEINT) * n_tok) OVER () AS HUGEINT) AS tw
    FROM c
),
b AS (
    SELECT source, n_tok,
           CAST({MIX_BUDGET} * wt // tw AS BIGINT) AS base,
           {MIX_BUDGET} * wt % tw AS rem,
           CAST({MIX_BUDGET} - sum(CAST({MIX_BUDGET} * wt // tw AS BIGINT))
                OVER () AS BIGINT) AS leftover
    FROM w
),
r AS (
    SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b
)
SELECT source, n_tok,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
           AS alloc
FROM r
"""


# ---------------------------------------------------------------------------
# events_expectations — declarative data-quality audit
# ---------------------------------------------------------------------------

EXPECT_TYPES = ("click", "view", "purchase", "signup", "error")
EXPECT_TS_LO = "2024-01-01"
EXPECT_TS_HI = "2025-01-01"


def q_events_expectations(sf_dir: str):
    """Great-Expectations-style audit of the events table: one row per
    expectation with its violation count — non-negative values, enum
    membership of event_type, event-time range, null user ids, and
    duplicate event ids (primary-key uniqueness). The declarative
    quality gate a medallion silver stage publishes with its manifest
    (generalizing the reference's validity filters,
    silver_and_gold.py:62-65, into an auditable report).

    Plan: the four row-local expectations fold through per-batch
    partials (one row per expectation per block); the PK-uniqueness
    check is a data-scaling fold, so it rides the keyed exchange
    (distinct count via per-partition unique) — never a driver
    collect."""
    from ray.data.aggregate import Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    lo = np.datetime64(EXPECT_TS_LO, "us").astype(np.int64)
    hi = np.datetime64(EXPECT_TS_HI, "us").astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "expectation": pa.array([], pa.string()),
                "p_bad": pa.array([], pa.int64()),
                "p_total": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        n = t.num_rows
        val = t["value"].combine_chunks()
        bad_neg = int(
            np.asarray(
                pc.fill_null(pc.less(val, 0.0), False)
            ).sum()
        )
        et = t["event_type"].combine_chunks()
        in_enum = pc.is_in(et, value_set=pa.array(list(EXPECT_TYPES)))
        bad_enum = int(np.asarray(pc.fill_null(pc.invert(in_enum), True)).sum())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        bad_ts = int(((ts < lo) | (ts >= hi)).sum())
        bad_uid = t["user_id"].combine_chunks().null_count
        names = [
            "value_non_negative",
            "event_type_in_enum",
            "ts_in_range",
            "user_id_not_null",
        ]
        return pa.table(
            {
                "expectation": pa.array(names, pa.string()),
                "p_bad": pa.array(
                    [bad_neg, bad_enum, bad_ts, bad_uid], pa.int64()
                ),
                "p_total": pa.array([n] * 4, pa.int64()),
            }
        )

    rowwise = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("expectation")
        .aggregate(
            Sum("p_bad", alias_name="violations"),
            Sum("p_total", alias_name="total"),
        )
    )

    # PK uniqueness: duplicates = total - distinct(event_id), distinct
    # counted exactly through the keyed exchange (scales with data)
    ids = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_id"])

    def uniq_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "p_total": pa.array([], pa.int64()),
                    "p_distinct": pa.array([], pa.int64()),
                }
            )
        e = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                "p_total": pa.array([len(e)], pa.int64()),
                "p_distinct": pa.array([len(np.unique(e))], pa.int64()),
            }
        )

    parts = map_partitions_by_key(
        ids, "event_id", uniq_part, num_parts=NUM_PARTS
    ).to_pandas()  # O(partitions)
    total = int(parts["p_total"].sum())
    dups = total - int(parts["p_distinct"].sum())

    out = rowwise.to_pandas()  # O(expectations)
    rows = {
        "expectation": list(out["expectation"]) + ["event_id_unique"],
        "violations": [int(x) for x in out["violations"]] + [dups],
        "total": [int(x) for x in out["total"]] + [total],
    }
    tbl = pa.table(
        {
            "expectation": pa.array(rows["expectation"], pa.string()),
            "violations": pa.array(rows["violations"], pa.int64()),
            "total": pa.array(rows["total"], pa.int64()),
        }
    )
    return tbl.sort_by("expectation")


EVENTS_EXPECTATIONS_SQL = f"""
WITH base AS (SELECT count(*) AS n FROM events)
SELECT * FROM (
    SELECT 'event_id_unique' AS expectation,
           CAST((SELECT n FROM base)
                - count(DISTINCT event_id) AS BIGINT) AS violations,
           CAST((SELECT n FROM base) AS BIGINT) AS total
    FROM events
    UNION ALL
    SELECT 'event_type_in_enum',
           CAST(count(*) FILTER (event_type IS NULL OR event_type NOT IN
                {EXPECT_TYPES!r}) AS BIGINT),
           CAST((SELECT n FROM base) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'ts_in_range',
           CAST(count(*) FILTER (ts < TIMESTAMP '{EXPECT_TS_LO}'
                OR ts >= TIMESTAMP '{EXPECT_TS_HI}') AS BIGINT),
           CAST((SELECT n FROM base) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'user_id_not_null',
           CAST(count(*) FILTER (user_id IS NULL) AS BIGINT),
           CAST((SELECT n FROM base) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'value_non_negative',
           CAST(count(*) FILTER (value < 0) AS BIGINT),
           CAST((SELECT n FROM base) AS BIGINT)
    FROM events
) ORDER BY expectation
"""


# ---------------------------------------------------------------------------
# conv_token_novelty — per-turn novel-token fraction within a conversation
# ---------------------------------------------------------------------------


def q_conv_token_novelty(sf_dir: str):
    """Per turn: how many DISTINCT tokens appear, and how many of them
    occur for the FIRST time in the conversation (ordered by ts,
    event_id) — the within-conversation novelty signal repetition /
    degeneration filters use on transcripts (cf. docs_repetition, which
    is document-global).

    Plan: ONE keyed exchange on the conversation key; per partition,
    tokens flatten vectorized off the list offsets, (conv, token) pairs
    factorize once, and both the per-turn distinct count and the
    first-occurrence flag fall out of a single lexsort over
    (conv, token, arrival order) plus a segmented-first mask. No Python
    loop over rows or tokens."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "props"],
    )

    def part_fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "event_id": pa.array([], pa.int64()),
                "n_distinct_tok": pa.array([], pa.int64()),
                "n_novel": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        # the SQL twin's unnest(string_split(NULL)) drops NULL-props
        # events entirely — match that, don't emit zero rows for them
        props_arr = t["props"].combine_chunks()
        if props_arr.null_count:
            t = t.filter(pc.is_valid(t["props"]))
            if t.num_rows == 0:
                return empty
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        # arrival rank of each turn within the partition's sort order
        turn_order = np.lexsort((eid, ts, uid))
        rank_of_row = np.empty(len(turn_order), np.int64)
        rank_of_row[turn_order] = np.arange(len(turn_order))
        toks = pc.split_pattern(t["props"].combine_chunks(), " ")
        offs = np.asarray(toks.offsets).astype(np.int64)
        flat = toks.flatten()
        counts = np.diff(offs)
        row_of_tok = np.repeat(np.arange(len(counts)), counts)
        enc = pc.dictionary_encode(flat)
        tcode = np.asarray(enc.indices).astype(np.int64)
        nt = len(enc.dictionary)
        conv_of_tok = uid[row_of_tok]
        arr_of_tok = rank_of_row[row_of_tok]
        # distinct within turn: unique (row, tcode)
        rkey = row_of_tok * nt + tcode
        uniq_rk, uidx = np.unique(rkey, return_index=True)
        rows_u = row_of_tok[uidx]
        code_u = tcode[uidx]
        conv_u = conv_of_tok[uidx]
        arr_u = arr_of_tok[uidx]
        # first occurrence across the conversation: sort (conv, code, arr)
        order = np.lexsort((arr_u, code_u, conv_u))
        c_s, k_s = conv_u[order], code_u[order]
        first = np.concatenate(
            ([True], (c_s[1:] != c_s[:-1]) | (k_s[1:] != k_s[:-1]))
        )
        novel_rows = rows_u[order[first]]
        n_rows = len(uid)
        n_distinct = np.zeros(n_rows, np.int64)
        np.add.at(n_distinct, rows_u, 1)
        n_novel = np.zeros(n_rows, np.int64)
        np.add.at(n_novel, novel_rows, 1)
        conv_str = pc.binary_join_element_wise(
            pa.scalar("conv_"),
            pc.cast(t["user_id"].combine_chunks(), pa.string()),
            "",
        )
        return pa.table(
            {
                "conv_id": conv_str,
                "event_id": pa.array(eid),
                "n_distinct_tok": pa.array(n_distinct),
                "n_novel": pa.array(n_novel),
            }
        )

    return map_partitions_by_key(ds, "user_id", part_fn, num_parts=NUM_PARTS)


CONV_TOKEN_NOVELTY_SQL = """
WITH tok AS (
    SELECT DISTINCT user_id, event_id, ts,
           unnest(string_split(props, ' ')) AS tk
    FROM events
),
f AS (
    SELECT user_id, event_id, tk,
           row_number() OVER (PARTITION BY user_id, tk
                              ORDER BY ts, event_id) AS rn
    FROM tok
)
SELECT 'conv_' || CAST(user_id AS VARCHAR) AS conv_id, event_id,
       CAST(count(*) AS BIGINT) AS n_distinct_tok,
       CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_novel
FROM f GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# events_max_run — distributed max-subarray (associative block scan)
# ---------------------------------------------------------------------------


def q_events_max_run(sf_dir: str):
    """Maximum-sum contiguous run of signed event cents in ARRIVAL
    (event_id) order — Kadane's problem, distributed: each block reduces
    to the 4-tuple monoid (total, best, best_prefix, best_suffix), the
    driver folds O(#blocks) partials in block order, and the associative
    combine ``best = max(l.best, r.best, l.suffix + r.prefix)`` makes
    the answer exact regardless of where block boundaries fall. The
    cents are signed by event polarity (error events debit) so runs
    actually terminate. One row out: (best_cents, total_cents, n).
    Non-empty-run semantics (best is at least the max single element).

    SQL twin: best = max over i of (pref_i − min(0, min pref_j, j<i)),
    via two window scans."""
    from ..functions.numeric import round_half_away

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def block_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "first_eid": pa.array([], pa.int64()),
                "last_eid": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "total": pa.array([], pa.int64()),
                "best": pa.array([], pa.int64()),
                "pref": pa.array([], pa.int64()),
                "suff": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        order = np.argsort(eid)
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks()) * 100.0
        ).astype(np.int64)
        neg = np.asarray(
            pc.equal(t["event_type"].combine_chunks(), "error")
        )
        v = np.where(neg, -cents, cents)[order]
        pref = np.cumsum(v)
        total = int(pref[-1])
        run_min = np.minimum.accumulate(np.concatenate(([0], pref[:-1])))
        best = int((pref - run_min).max())
        best_pref = int(pref.max())
        best_suff = int((total - np.concatenate(([0], pref[:-1]))).max())
        return pa.table(
            {
                "first_eid": pa.array([int(eid[order][0])], pa.int64()),
                "last_eid": pa.array([int(eid[order][-1])], pa.int64()),
                "n": pa.array([len(v)], pa.int64()),
                "total": pa.array([total], pa.int64()),
                "best": pa.array([best], pa.int64()),
                "pref": pa.array([best_pref], pa.int64()),
                "suff": pa.array([best_suff], pa.int64()),
            }
        )

    # blocks of the parquet read are event_id-ordered only per file; sort
    # partials by their first event id (ranges are disjoint per block
    # because the generator writes event_id-ordered shards)
    parts = (
        ds.map_batches(
            block_partial, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()  # O(#blocks)
        .sort_values("first_eid", ignore_index=True)
    )
    # the block merge is only exact over DISJOINT, ordered eid ranges —
    # verify instead of assuming (an interleaved read layout must fail
    # loudly, not corrupt the scan)
    if len(parts) > 1:
        if not (
            parts["first_eid"].to_numpy()[1:]
            > parts["last_eid"].to_numpy()[:-1]
        ).all():
            raise RuntimeError(
                "events_max_run: block event_id ranges interleave — "
                "sort the input by event_id first"
            )
    NEG = -(1 << 62)
    tot, best, prefb, suffb, n = 0, NEG, NEG, NEG, 0
    for r in parts.itertuples(index=False):
        if n == 0:
            tot, best, prefb, suffb, n = (
                int(r.total), int(r.best), int(r.pref), int(r.suff), int(r.n)
            )
            continue
        best = max(best, int(r.best), suffb + int(r.pref))
        prefb = max(prefb, tot + int(r.pref))
        suffb = max(int(r.suff), suffb + int(r.total))
        tot += int(r.total)
        n += int(r.n)
    return pa.table(
        {
            "best_cents": pa.array([best], pa.int64()),
            "total_cents": pa.array([tot], pa.int64()),
            "n": pa.array([n], pa.int64()),
        }
    )


EVENTS_MAX_RUN_SQL = """
WITH v AS (
    SELECT event_id,
           CASE WHEN event_type = 'error'
                THEN -CAST(ROUND(value * 100) AS BIGINT)
                ELSE CAST(ROUND(value * 100) AS BIGINT) END AS cents
    FROM events
),
s AS (
    SELECT event_id, cents,
           sum(cents) OVER (ORDER BY event_id) AS pref
    FROM v
),
m AS (
    SELECT pref,
           coalesce(min(pref) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS minprev
    FROM s
)
SELECT CAST(max(pref - least(minprev, 0)) AS BIGINT) AS best_cents,
       (SELECT CAST(sum(cents) AS BIGINT) FROM v) AS total_cents,
       (SELECT CAST(count(*) AS BIGINT) FROM v) AS n
FROM m
"""


REGISTRY: dict[str, tuple] = {
    "docs_mixture_temperature": (
        q_docs_mixture_temperature,
        DOCS_MIXTURE_TEMPERATURE_SQL,
    ),
    "events_expectations": (q_events_expectations, EVENTS_EXPECTATIONS_SQL),
    "conv_token_novelty": (q_conv_token_novelty, CONV_TOKEN_NOVELTY_SQL),
    "events_max_run": (q_events_max_run, EVENTS_MAX_RUN_SQL),
}


# ---------------------------------------------------------------------------
# events_rolling_distinct_users — exact sliding-window distinct (7-day DAU)
# ---------------------------------------------------------------------------

RDU_WINDOW_DAYS = 7


def q_events_rolling_distinct_users(sf_dir: str):
    """For every calendar day in the data's range: the EXACT number of
    distinct users active in the trailing {RDU_WINDOW_DAYS}-day window —
    the rolling-retention metric (7-day active users per day). Distinct
    counts do not sum, so the rolling count cannot fold from daily
    totals; the exact answer needs per-user activity spans.

    Plan: one keyed exchange folds the stream to distinct (user, day)
    pairs AND, per user, merges activity days into coverage intervals
    (two active days within the window share coverage — a vectorized
    gap-split per partition). Each interval [a, b] contributes +1 at day
    a and −1 at day b+{RDU_WINDOW_DAYS}; the per-day diff fold is
    calendar-bounded and one prefix sum finishes on O(days) rows. No
    per-day user sets ever materialize."""
    from ray.data.aggregate import Max, Min, Sum

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def day_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                }
            )
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        day = (
            np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
            // 86_400_000_000
        )
        if int(day.max()) >= (1 << 31) or int(day.min()) < 0:
            raise OverflowError("day packing expects 0 <= day < 2^31")
        if int(uid.max()) >= (1 << 32) or int(uid.min()) < 0:
            raise OverflowError(
                "user/day packing expects 0 <= user_id < 2^32 — widen "
                "the packing for snowflake-style ids"
            )
        cell = np.unique((uid << np.int64(31)) | day)
        return pa.table(
            {
                "user_id": pa.array(cell >> np.int64(31), pa.int64()),
                "day": pa.array(cell & np.int64((1 << 31) - 1), pa.int64()),
            }
        )

    pairs = ds.map_batches(
        day_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def intervals(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"day": pa.array([], pa.int64()), "diff": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        uid = np.asarray(part["user_id"].combine_chunks())
        day = np.asarray(part["day"].combine_chunks())
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        # cross-block duplicate (user, day) pairs collapse here
        keep = np.concatenate(([True], (u[1:] != u[:-1]) | (d[1:] != d[:-1])))
        u, d = u[keep], d[keep]
        # a new coverage interval starts at a user change or a gap wider
        # than the window (coverage [a, a+W-1] runs overlap otherwise)
        start = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (d[1:] - d[:-1] >= RDU_WINDOW_DAYS))
        )
        starts = np.flatnonzero(start)
        ends = np.append(starts[1:], len(d)) - 1
        a = d[starts]
        b = d[ends]
        return pa.table(
            {
                "day": pa.array(np.concatenate([a, b + RDU_WINDOW_DAYS])),
                "diff": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(a), np.int64),
                            -np.ones(len(a), np.int64),
                        ]
                    )
                ),
            }
        )

    diffs = map_partitions_by_key(
        pairs, "user_id", intervals, num_parts=NUM_PARTS
    )
    folded = (
        diffs.groupby("day")
        .aggregate(Sum("diff", alias_name="d"))
        .to_pandas()  # O(active days + window): calendar-bounded
        .sort_values("day", ignore_index=True)
    )
    bounds = ds.map_batches(
        lambda t: pa.table(
            {
                "lo": pa.array(
                    [
                        int(
                            np.asarray(
                                t["ts"].combine_chunks().cast(pa.int64())
                            ).min()
                        )
                        // 86_400_000_000
                    ]
                    if t.num_rows
                    else [],
                    pa.int64(),
                ),
                "hi": pa.array(
                    [
                        int(
                            np.asarray(
                                t["ts"].combine_chunks().cast(pa.int64())
                            ).max()
                        )
                        // 86_400_000_000
                    ]
                    if t.num_rows
                    else [],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).aggregate(Min("lo", alias_name="d0"), Max("hi", alias_name="d1"))
    if bounds["d0"] is None:  # empty stream: empty typed result
        return pa.table(
            {"day": pa.array([], pa.int64()), "u7": pa.array([], pa.int64())}
        )
    d0, d1 = int(bounds["d0"]), int(bounds["d1"])
    span = d1 - d0 + 1
    diff_arr = np.zeros(span + RDU_WINDOW_DAYS + 1, np.int64)
    idx = folded["day"].to_numpy(np.int64) - d0
    ok = (idx >= 0) & (idx < len(diff_arr))
    np.add.at(diff_arr, idx[ok], folded["d"].to_numpy(np.int64)[ok])
    run = np.cumsum(diff_arr)[:span]
    return pa.table(
        {
            "day": pa.array(np.arange(d0, d1 + 1), pa.int64()),
            "u7": pa.array(run, pa.int64()),
        }
    )


EVENTS_ROLLING_DISTINCT_SQL = f"""
WITH d AS (
    SELECT DISTINCT user_id,
           epoch_us(ts) // 86400000000 AS day
    FROM events
),
b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
days AS (
    SELECT CAST(unnest(generate_series(b.d0, b.d1)) AS BIGINT) AS day FROM b
)
SELECT days.day,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS u7
FROM days LEFT JOIN d
  ON d.day BETWEEN days.day - {RDU_WINDOW_DAYS - 1} AND days.day
GROUP BY 1
"""


REGISTRY["events_rolling_distinct_users"] = (
    q_events_rolling_distinct_users,
    EVENTS_ROLLING_DISTINCT_SQL,
)


# ---------------------------------------------------------------------------
# orc_ingest — ORC landing zone via the custom datasource
# ---------------------------------------------------------------------------

ORC_SEED = 137


def _orc_dir(sf_dir: str = "") -> str:
    """Deterministic ORC fixture (plus a parquet TWIN of the same table
    for the DuckDB oracle), created once under /tmp via the shared
    concurrency-safe build protocol (pipelines/fixtures.py)."""
    import os

    import pyarrow.parquet as pq

    from .fixtures import build_fixture_dir
    from ..sources.orc import write_orc
    from ..sources.transcripts import generate_transcripts

    def build(tmp: str) -> None:
        tbl = generate_transcripts(n_convs=50, avg_turns=18, seed=ORC_SEED)
        write_orc(tbl, tmp, rows_per_file=1500)
        pq.write_table(tbl, os.path.join(tmp, "twin.parquet"))

    return build_fixture_dir("orc", build)


def q_orc_ingest(sf_dir: str):
    """ORC ingest through the engine's CUSTOM Ray Data datasource
    (sources/orc.py): stripes stream out of each file as blocks;
    canonical column projection on top. The oracle reads a parquet twin
    of the same generated table — exact round trip. The "foreign lake"
    path for users migrating a Hive/Trino ORC lake onto the engine."""
    from ..sources.orc import read_orc

    ds = read_orc(_orc_dir(sf_dir))

    def project(t: pa.Table) -> pa.Table:
        t = t.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
        # ORC stores timestamps at nanosecond precision; restore the
        # engine's canonical timestamp[us] so the round trip is exact
        return t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            t["ts"].cast(pa.timestamp("us")),
        )

    return ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def _orc_oracle_sql() -> str:
    d = _orc_dir()
    return f"""
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, role, text, tool,
       CAST(ts AS TIMESTAMP) AS ts
FROM read_parquet('{d}/twin.parquet')
"""


REGISTRY["orc_ingest"] = (q_orc_ingest, _orc_oracle_sql())

"""Behavioral-signal feature operators: event-type co-occurrence (PMI),
per-user inter-arrival statistics, consecutive-day activity streaks, and
character-entropy document scoring.

Reference parity: these extend the reference's per-entity gold aggregates
(/root/reference/spark_jobs/silver_and_gold.py:86-131) with the classic
behavioral/statistical signals a feature platform derives from the same
event stream before feature-store ingestion.

Scale shapes (each documented on the operator):

- ``events_cooccurrence``: per-batch DISTINCT (user, type) partials bound
  shuffle volume by the activity surface; ONE keyed exchange on user_id,
  then pair expansion is capped at C(|types|, 2) per user (tiny, types is
  a small domain) and only O(|types|^2) count partials leave each
  partition. PMI arithmetic is integer-until-the-log.
- ``events_interarrival``: ONE keyed exchange, segmented diff per
  partition, integer-second gaps so sums/sums-of-squares are exact int64.
- ``events_streaks``: gaps-and-islands per user — ONE keyed exchange,
  the island key (day - rank) is pure integer numpy.
- ``docs_entropy``: zero shuffles — a streamed map; per-batch byte
  histogram via one ``np.bincount`` over (row << 8 | byte) fused keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.keyed import map_partitions_by_key
from ..functions.numeric import div_trunc, round_half_away

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

_US_PER_DAY = 86_400_000_000


def _events(sf_dir: str, columns):
    from ..sources.reads import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/events.parquet", columns=columns)


def _r6(x: np.ndarray) -> pa.Array:
    return pc.round(
        pa.array(x, pa.float64()), ndigits=6, round_mode="half_towards_infinity"
    )


def _day_strings(days: np.ndarray) -> pa.Array:
    return pa.array(
        np.datetime_as_string(days.astype("datetime64[D]"), unit="D")
    )


# --------------------------------------------------------------------------
# Event-type co-occurrence with pointwise mutual information
# --------------------------------------------------------------------------


def q_events_cooccurrence(sf_dir: str):
    """For every unordered pair of event types, how many users exhibit
    BOTH, and the pair's PMI ``ln(n_ab * n_users / (n_a * n_b))`` — the
    co-occurrence signal behind "users who do A also do B" features.

    All counts stay integer until the single final log; the driver sees
    only the O(|types|^2) folded table."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["user_id", "event_type"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        # per-batch DISTINCT (user, type): shuffle volume ~ activity surface
        return (
            t.group_by(["user_id", "event_type"])
            .aggregate([])
            .select(["user_id", "event_type"])
        )

    ut = ds.map_batches(
        distinct_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        # cross-batch dedup within the partition (users are disjoint
        # across partitions, so partition partials sum exactly)
        t = t.group_by(["user_id", "event_type"]).aggregate([])
        uid = np.asarray(t["user_id"].combine_chunks())
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        code = np.asarray(enc.indices).astype(np.int64)
        dic = np.asarray(enc.dictionary.cast(pa.string())).astype(object)
        ntype = len(dic)
        # event-type domains are small by nature; the one-word bitmask
        # per user assumes <= 63 of them in any single partition
        if ntype > 63:
            raise ValueError(
                f"event_type domain {ntype} > 63: widen the bitmask"
            )
        order = np.argsort(uid, kind="stable")
        uid, code = uid[order], code[order]
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        # per-user type bitmask, then popcount/AND over the tiny domain
        masks = np.bitwise_or.reduceat(
            np.left_shift(np.int64(1), code), np.flatnonzero(head)
        )
        type_a: list[str] = []
        type_b: list[str] = []
        n: list[int] = []
        for a in range(ntype):
            has_a = (masks >> a) & 1
            n_a = int(has_a.sum())
            if n_a:
                type_a.append(dic[a])
                type_b.append("")
                n.append(n_a)
            for bb in range(ntype):
                if dic[a] < dic[bb]:
                    n_ab = int((has_a & ((masks >> bb) & 1)).sum())
                    if n_ab:
                        type_a.append(dic[a])
                        type_b.append(dic[bb])
                        n.append(n_ab)
        # sentinel row carries the partition's distinct-user count
        type_a.append("")
        type_b.append("")
        n.append(len(masks))
        return pa.table(
            {
                "type_a": pa.array(type_a, pa.string()),
                "type_b": pa.array(type_b, pa.string()),
                "n": pa.array(n, pa.int64()),
            }
        )

    folded = (
        map_partitions_by_key(ut, "user_id", part, num_parts=NUM_PARTS)
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # O(|types|^2) rows — tiny by construction
    singles: dict[str, int] = {}
    n_users = 0
    pairs = []
    for r in folded:
        if r["type_a"] == "" and r["type_b"] == "":
            n_users = int(r["n"])
        elif r["type_b"] == "":
            singles[r["type_a"]] = int(r["n"])
        else:
            pairs.append(r)
    pairs.sort(key=lambda r: (r["type_a"], r["type_b"]))
    ta = [r["type_a"] for r in pairs]
    tb = [r["type_b"] for r in pairs]
    n_ab = np.array([r["n"] for r in pairs], dtype=np.int64)
    n_a = np.array([singles[t] for t in ta], dtype=np.int64)
    n_b = np.array([singles[t] for t in tb], dtype=np.int64)
    pmi = np.log((n_ab * n_users).astype(np.float64) / (n_a * n_b))
    return pa.table(
        {
            "type_a": pa.array(ta, pa.string()),
            "type_b": pa.array(tb, pa.string()),
            "n_ab": pa.array(n_ab, pa.int64()),
            "pmi": _r6(pmi),
        }
    )


EVENTS_COOCCURRENCE_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT count(DISTINCT user_id)::BIGINT AS nu FROM ut),
s AS (SELECT event_type, count(*)::BIGINT AS n_t FROM ut GROUP BY 1),
p AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*)::BIGINT AS n_ab
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b, n_ab,
       ROUND(ln((n_ab * nu)::DOUBLE / (sa.n_t * sb.n_t)), 6) AS pmi
FROM p
CROSS JOIN n
JOIN s sa ON sa.event_type = type_a
JOIN s sb ON sb.event_type = type_b
"""


# --------------------------------------------------------------------------
# Per-user inter-arrival statistics
# --------------------------------------------------------------------------


def q_events_interarrival(sf_dir: str):
    """Per-user inter-arrival gap statistics over the event stream:
    number of gaps, mean/max gap in whole seconds, and the coefficient of
    variation (std/mean — burstiness; ~1 for Poisson arrivals, >1 for
    bursty users). Gaps are integer seconds so sum and sum-of-squares are
    exact int64; the two final divisions and the sqrt are the same double
    expression on both engines, rounded to 6 decimals.

    Scale shape: ONE keyed exchange on user_id, then a fused segmented
    pass (lexsort + shifted diff); output is one row per user."""
    ds = _events(sf_dir, columns=["user_id", "ts", "event_id"])

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "mean_gap_s": pa.array([], pa.float64()),
                "max_gap_s": pa.array([], pa.int64()),
                "cv_gap": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        same = uid[1:] == uid[:-1]
        gap_s = (ts[1:] - ts[:-1]) // 1_000_000  # whole seconds, exact
        gu = uid[1:][same]
        g = gap_s[same]
        if len(g) == 0:
            return empty
        head = np.concatenate(([True], gu[1:] != gu[:-1]))
        starts = np.flatnonzero(head)
        n = np.diff(np.append(starts, len(g)))
        # int64 reduceat keeps sums exact (no float53 accumulation)
        ssum = np.add.reduceat(g, starts)
        ssq = np.add.reduceat(g * g, starts)
        gmax = np.maximum.reduceat(g, starts)
        mean = ssum.astype(np.float64) / n
        var = ssq.astype(np.float64) / n - mean * mean
        cv = np.sqrt(np.maximum(var, 0.0)) / mean
        return pa.table(
            {
                "user_id": pa.array(gu[head], pa.int64()),
                "n_gaps": pa.array(n, pa.int64()),
                "mean_gap_s": _r6(mean),
                "max_gap_s": pa.array(gmax, pa.int64()),
                "cv_gap": _r6(cv),
            }
        )

    return map_partitions_by_key(ds, "user_id", part, num_parts=NUM_PARTS)


EVENTS_INTERARRIVAL_SQL = """
WITH o AS (
    SELECT user_id,
           (epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ))) // 1000000 AS gap_s
    FROM events
),
g AS (SELECT user_id, gap_s FROM o WHERE gap_s IS NOT NULL),
a AS (
    SELECT user_id, count(*)::BIGINT AS n_gaps,
           sum(gap_s)::BIGINT AS ssum,
           sum(gap_s * gap_s)::BIGINT AS ssq,
           max(gap_s)::BIGINT AS max_gap_s
    FROM g GROUP BY user_id
)
SELECT user_id, n_gaps,
       ROUND(ssum::DOUBLE / n_gaps, 6) AS mean_gap_s,
       max_gap_s,
       ROUND(
           sqrt(greatest(ssq::DOUBLE / n_gaps
                         - (ssum::DOUBLE / n_gaps) * (ssum::DOUBLE / n_gaps),
                         0.0))
           / (ssum::DOUBLE / n_gaps), 6
       ) AS cv_gap
FROM a
"""


# --------------------------------------------------------------------------
# Consecutive-day activity streaks (gaps and islands)
# --------------------------------------------------------------------------


def q_events_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user (plus total
    active days) — the gaps-and-islands pattern behind engagement-streak
    features. Island key = day - rank(day): constant exactly within a run
    of consecutive days. Pure integer arithmetic end to end.

    Scale shape: per-batch DISTINCT (user, day) partials, ONE keyed
    exchange on user_id, segmented numpy islands per partition."""
    ds = _events(sf_dir, columns=["user_id", "ts"])

    def day_pairs(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].combine_chunks())
        day = np.asarray(t["ts"].combine_chunks().cast(pa.int64())) // _US_PER_DAY
        uniq = np.unique(np.stack([uid, day]), axis=1)
        return pa.table(
            {
                "user_id": pa.array(uniq[0], pa.int64()),
                "day": pa.array(uniq[1], pa.int64()),
            }
        )

    pairs = ds.map_batches(
        day_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_active_days": pa.array([], pa.int64()),
                "max_streak": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        day = np.asarray(t["day"].combine_chunks())
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        keep = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (day[1:] != day[:-1]))
        )
        uid, day = uid[keep], day[keep]
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        idx = np.arange(len(uid), dtype=np.int64)
        # per-user 0-based rank of the (sorted, distinct) day
        seg0 = np.where(head, idx, 0)
        np.maximum.accumulate(seg0, out=seg0)
        rank = idx - seg0
        island = head | np.concatenate(([True], (day - rank)[1:] != (day - rank)[:-1]))
        ilen = np.diff(np.append(np.flatnonzero(island), len(uid)))
        iuser = uid[island]
        uhead = np.concatenate(([True], iuser[1:] != iuser[:-1]))
        max_streak = np.maximum.reduceat(ilen, np.flatnonzero(uhead))
        n_days = np.add.reduceat(ilen, np.flatnonzero(uhead))
        return pa.table(
            {
                "user_id": pa.array(iuser[uhead], pa.int64()),
                "n_active_days": pa.array(n_days, pa.int64()),
                "max_streak": pa.array(max_streak, pa.int64()),
            }
        )

    return map_partitions_by_key(pairs, "user_id", part, num_parts=NUM_PARTS)


EVENTS_STREAKS_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
r AS (
    SELECT user_id,
           date_diff('day', DATE '1970-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS island
    FROM ud
),
i AS (
    SELECT user_id, island, count(*)::BIGINT AS len
    FROM r GROUP BY user_id, island
)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       max(len)::BIGINT AS max_streak
FROM i GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Last-touch attribution
# --------------------------------------------------------------------------

_ATTR_HORIZON_US = 7 * _US_PER_DAY  # lookback window for a valid touch


def q_events_attribution(sf_dir: str):
    """Last-touch attribution: for every ``purchase`` event, the most
    recent preceding NON-purchase event by the same user within a 7-day
    horizon (the marketing-attribution join every growth team runs).
    Purchases with no eligible touch keep NULL attribution columns.

    Scale shape: ONE keyed exchange on user_id, then a fused segmented
    pass — lexsort, a segmented running-max of candidate row indices
    (offset-ramp trick, overflow-guarded), and one gather; no self-join
    shuffle, no per-row Python."""
    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "purchase_event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "attr_event_id": pa.array([], pa.int64()),
                "attr_type": pa.array([], pa.string()),
                "gap_s": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        etype = t["event_type"].combine_chunks()
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        is_p = np.asarray(pc.equal(etype.take(pa.array(order)), "purchase"))
        n = len(uid)
        if n * (np.int64(n) + 1) > np.iinfo(np.int64).max // 2:
            raise OverflowError("partition too large for the offset ramp")
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        seg_id = np.cumsum(head) - 1
        idx = np.arange(n, dtype=np.int64)
        # candidate index of THIS row if it is a touch, else -1; shift so
        # row i sees only rows < i, reset at user boundaries
        cand = np.where(~is_p, idx, -1)
        shifted = np.concatenate(([np.int64(-1)], cand[:-1]))
        shifted[head] = -1
        run = np.maximum.accumulate(shifted + seg_id * np.int64(n))
        prev_touch = run - seg_id * np.int64(n)  # >= -1 by the ramp bound
        p_pos = np.flatnonzero(is_p)
        a_pos = prev_touch[p_pos]
        ok = a_pos >= 0
        gap_us = np.where(ok, ts[p_pos] - ts[np.maximum(a_pos, 0)], 0)
        ok &= gap_us <= _ATTR_HORIZON_US
        a_safe = np.maximum(a_pos, 0)
        typ = np.asarray(
            etype.take(pa.array(order[a_safe]))
        ).astype(object)
        return pa.table(
            {
                "purchase_event_id": pa.array(eid[p_pos], pa.int64()),
                "user_id": pa.array(uid[p_pos], pa.int64()),
                "attr_event_id": pa.array(
                    np.where(ok, eid[a_safe], 0), pa.int64(), mask=~ok
                ),
                "attr_type": pa.array(
                    np.where(ok, typ, None), pa.string()
                ),
                "gap_s": pa.array(
                    np.where(ok, gap_us // 1_000_000, 0), pa.int64(), mask=~ok
                ),
            }
        )

    return map_partitions_by_key(ds, "user_id", part, num_parts=NUM_PARTS)


EVENTS_ATTRIBUTION_SQL = f"""
WITH o AS (
    SELECT user_id, ts, event_id, event_type,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS rn
    FROM events
),
a AS (
    SELECT user_id, ts, event_id, rn,
           max(CASE WHEN event_type <> 'purchase' THEN rn END) OVER (
               PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS attr_rn
    FROM o
),
p AS (SELECT * FROM o WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_event_id, p.user_id,
       CASE WHEN epoch_us(p.ts) - epoch_us(t.ts) <= {_ATTR_HORIZON_US}
            THEN t.event_id END AS attr_event_id,
       CASE WHEN epoch_us(p.ts) - epoch_us(t.ts) <= {_ATTR_HORIZON_US}
            THEN t.event_type END AS attr_type,
       CASE WHEN epoch_us(p.ts) - epoch_us(t.ts) <= {_ATTR_HORIZON_US}
            THEN (epoch_us(p.ts) - epoch_us(t.ts)) // 1000000 END AS gap_s
FROM p
LEFT JOIN a ON a.user_id = p.user_id AND a.rn = p.rn
LEFT JOIN o t ON t.user_id = p.user_id AND t.rn = a.attr_rn
"""


def q_events_first_touch(sf_dir: str):
    """First-touch attribution (the companion of the last-touch join
    above): for every ``purchase``, the EARLIEST non-purchase event by
    the same user within the 7-day window ``[ts - horizon, ts]``.

    Plan: no bespoke kernel — the earliest touch at-or-after
    ``ts - horizon`` is exactly a FORWARD as-of probe at the shifted
    timestamp, and the horizon bound is the probe's ``tolerance_us``
    (earliest eligible ⇒ an out-of-window match proves no in-window row
    exists). Right side is the per-(user, ts) touch summary — bounded,
    pre-aggregated distributed — broadcast once per actor; zero
    shuffles on the purchase stream."""
    import pyarrow.dataset as pads

    from ..stages.asof import asof_join_broadcast

    touches = _events(sf_dir, columns=["user_id", "ts", "event_type"])
    # keep the non-purchase stream only (same eligible set as last-touch)
    touches = touches.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["event_type"], "purchase"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def agg_partition(part: pa.Table) -> pa.Table:
        g = part.group_by(["user_id", "ts"]).aggregate([("event_type", "min")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "first_ts": g["ts"].cast(pa.timestamp("us")),
                "first_type": g["event_type_min"],
            }
        )

    right = pa.Table.from_pandas(
        map_partitions_by_key(
            touches, "user_id", agg_partition, num_parts=NUM_PARTS
        ).to_pandas(),
        preserve_index=False,
    )

    from ..sources.reads import read_parquet_sized

    purchases = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
        filter=pads.field("event_type") == "purchase",
    ).map_batches(
        lambda t: t.append_column(
            "probe_ts",
            pc.cast(
                pc.subtract(
                    t["ts"].combine_chunks().cast(pa.int64()),
                    pa.scalar(_ATTR_HORIZON_US, pa.int64()),
                ),
                pa.timestamp("us"),
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = asof_join_broadcast(
        purchases,
        right,
        key="user_id",
        ts="first_ts",
        attach_cols=["first_ts", "first_type"],
        left_ts="probe_ts",
        concurrency=2,
        direction="forward",
        tolerance_us=_ATTR_HORIZON_US,
    )
    return out.drop_columns(["probe_ts"])


EVENTS_FIRST_TOUCH_SQL = f"""
WITH t AS (
    SELECT user_id, ts AS f_ts, min(event_type) AS f_type
    FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2
),
p AS (
    SELECT event_id, ts, user_id, value,
           ts - INTERVAL 7 DAY AS probe_ts
    FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.ts, p.user_id, p.value,
       CASE WHEN t.f_ts <= p.ts THEN t.f_ts END AS first_ts,
       CASE WHEN t.f_ts <= p.ts THEN t.f_type END AS first_type
FROM p
ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.probe_ts <= t.f_ts
"""


# --------------------------------------------------------------------------
# Character-entropy document scoring
# --------------------------------------------------------------------------


def q_docs_entropy(sf_dir: str):
    """Shannon entropy (bits/byte) of each document's UTF-8 bytes — the
    classic cheap filter for gibberish (low entropy: repeated chars;
    high entropy: random noise / binary junk). Zero shuffles: a streamed
    map whose hot loop is ONE ``np.bincount`` over fused
    ``row_index * 256 + byte`` keys per batch (no per-row Python).

    Both engines compute ``-sum(c/n * log2(c/n))`` with the same double
    expression, rounded to 6 decimals."""
    from ..sources.reads import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def entropy(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                    "entropy_bits": pa.array([], pa.float64()),
                }
            )
        txt = t["text"].combine_chunks().cast(pa.large_binary())
        # large_binary buffers: [validity, int64 offsets, data]; offsets
        # index the WHOLE data buffer, so slice data by [offs[0], offs[-1])
        buf = np.frombuffer(txt.buffers()[2], dtype=np.uint8)
        offs = np.frombuffer(txt.buffers()[1], dtype=np.int64)[
            txt.offset : txt.offset + len(txt) + 1
        ]
        lens = np.diff(offs)
        n = len(txt)
        row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
        byts = buf[offs[0] : offs[-1]]
        fused = row_of_byte * 256 + byts.astype(np.int64)
        counts = np.bincount(fused, minlength=n * 256).reshape(n, 256)
        tot = lens.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = counts / tot[:, None]
            ent = -np.nansum(np.where(p > 0, p * np.log2(p), 0.0), axis=1)
        ent = np.where(lens > 0, ent, 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(lens, pa.int64()),
                "entropy_bits": _r6(ent),
            }
        )

    return ds.map_batches(entropy, batch_format="pyarrow", zero_copy_batch=True)


DOCS_ENTROPY_SQL = """
WITH b AS (
    SELECT doc_id, unnest(string_split(text, '')) AS ch
    FROM documents
),
c AS (SELECT doc_id, ch, count(*)::DOUBLE AS cnt FROM b GROUP BY doc_id, ch),
n AS (
    SELECT doc_id, octet_length(text::BLOB)::BIGINT AS n_bytes
    FROM documents
)
SELECT n.doc_id, n.n_bytes,
       ROUND(COALESCE(
           -sum((c.cnt / n.n_bytes) * log2(c.cnt / n.n_bytes)), 0.0
       ), 6) AS entropy_bits
FROM n LEFT JOIN c ON c.doc_id = n.doc_id
GROUP BY n.doc_id, n.n_bytes
"""


# --------------------------------------------------------------------------
# Session conversion features
# --------------------------------------------------------------------------

_SESSION_GAP_US = 1_800_000_000  # 30-minute inactivity closes a session


def q_events_session_conversion(sf_dir: str):
    """Web-analytics session features over the raw event stream: sessions
    are maximal runs per user with < 30 min between consecutive events;
    each emits (user_id, session_idx, n_events, entry_type, converted,
    duration_s) — the table conversion-rate and bounce-rate features are
    read from.

    Scale shape: ONE keyed exchange on user_id, then one fused segmented
    pass — lexsort, gap-break detection, and ``reduceat`` over session
    boundaries for count/first/any/extent. Integer output end to end."""
    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "entry_type": pa.array([], pa.string()),
                "converted": pa.array([], pa.int64()),
                "duration_s": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        etype = t["event_type"].combine_chunks()
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        is_p = np.asarray(
            pc.equal(etype.take(pa.array(order)), "purchase")
        ).astype(np.int64)
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([np.int64(0)], ts[1:] - ts[:-1]))
        brk = head | (gap > _SESSION_GAP_US)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(uid)) - 1
        n_ev = ends - starts + 1
        # per-user 0-based session index: rank of the start among the
        # user's session starts
        su = uid[starts]
        uhead = np.concatenate(([True], su[1:] != su[:-1]))
        sidx = np.arange(len(starts), dtype=np.int64)
        base = np.where(uhead, sidx, 0)
        np.maximum.accumulate(base, out=base)
        sess_idx = sidx - base
        conv = np.maximum.reduceat(is_p, starts)
        dur = (ts[ends] - ts[starts]) // 1_000_000
        entry = etype.take(pa.array(order[starts]))
        return pa.table(
            {
                "user_id": pa.array(su, pa.int64()),
                "session_idx": pa.array(sess_idx, pa.int64()),
                "n_events": pa.array(n_ev, pa.int64()),
                "entry_type": entry.cast(pa.string()),
                "converted": pa.array(conv, pa.int64()),
                "duration_s": pa.array(dur, pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "user_id", part, num_parts=NUM_PARTS)


EVENTS_SESSION_CONVERSION_SQL = f"""
WITH o AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {_SESSION_GAP_US}
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT *, sum(brk) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING
    ) - 1 AS session_idx
    FROM o
),
f AS (
    SELECT user_id, session_idx, event_type AS entry_type
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, session_idx ORDER BY ts, event_id
        ) AS rn FROM s
    ) WHERE rn = 1
),
g AS (
    SELECT user_id, session_idx,
           count(*)::BIGINT AS n_events,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
               AS converted,
           ((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000)::BIGINT
               AS duration_s
    FROM s GROUP BY user_id, session_idx
)
SELECT g.user_id, g.session_idx::BIGINT AS session_idx, g.n_events,
       f.entry_type, g.converted, g.duration_s
FROM g JOIN f USING (user_id, session_idx)
"""


# --------------------------------------------------------------------------
# Markov transition matrix over event types
# --------------------------------------------------------------------------


def q_events_markov(sf_dir: str):
    """First-order Markov transition matrix of event types within each
    user's stream: (from_type, to_type, n, p) where p is the row-
    normalized transition probability — the behavioral prior behind
    next-action prediction features.

    Scale shape: ONE keyed exchange on user_id; per partition a lexsort
    + shifted compare yields consecutive pairs, Arrow group_by collapses
    them to O(|types|^2) partials; a tiny final groupby and a driver-side
    row normalization finish. Counts stay integer until the one
    division, rounded to 6 on both engines."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "pn": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        code = np.asarray(enc.indices).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, code = uid[order], code[order]
        same = uid[1:] == uid[:-1]
        frm = code[:-1][same]
        to = code[1:][same]
        if len(frm) == 0:
            return empty
        g = (
            pa.table(
                {
                    "f": pa.array(frm, pa.int64()),
                    "t": pa.array(to, pa.int64()),
                    "one": pa.array(np.ones(len(frm), np.int64), pa.int64()),
                }
            )
            .group_by(["f", "t"])
            .aggregate([("one", "sum")])
        )
        dic = enc.dictionary.cast(pa.string())
        return pa.table(
            {
                "from_type": dic.take(g["f"].combine_chunks()),
                "to_type": dic.take(g["t"].combine_chunks()),
                "pn": g["one_sum"],
            }
        )

    folded = (
        map_partitions_by_key(ds, "user_id", part, num_parts=NUM_PARTS)
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("pn", alias_name="n"))
        .take_all()
    )  # O(|types|^2) rows
    folded.sort(key=lambda r: (r["from_type"], r["to_type"]))
    frm = [r["from_type"] for r in folded]
    to = [r["to_type"] for r in folded]
    n = np.array([r["n"] for r in folded], dtype=np.int64)
    row_tot: dict[str, int] = {}
    for f, c in zip(frm, n):
        row_tot[f] = row_tot.get(f, 0) + int(c)
    tot = np.array([row_tot[f] for f in frm], dtype=np.int64)
    return pa.table(
        {
            "from_type": pa.array(frm, pa.string()),
            "to_type": pa.array(to, pa.string()),
            "n": pa.array(n, pa.int64()),
            "p": _r6(n.astype(np.float64) / tot),
        }
    )


EVENTS_MARKOV_SQL = """
WITH o AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS nxt
    FROM events
),
c AS (
    SELECT event_type AS from_type, nxt AS to_type, count(*)::BIGINT AS n
    FROM o WHERE nxt IS NOT NULL
    GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       ROUND(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM c
"""


# --------------------------------------------------------------------------
# DAU / WAU activity metrics
# --------------------------------------------------------------------------


def q_events_dau_wau(sf_dir: str):
    """Daily activity metrics: per calendar day, DAU (distinct active
    users), WAU (distinct users active in the trailing 7 days) and the
    DAU/WAU stickiness ratio — the engagement dashboard every product
    team keys on.

    Scale shape: the stream collapses to distinct (user, day) partials
    per batch, then ONE keyed exchange on user_id. Each partition turns
    its users' activity days into +1/-1 WAU *interval deltas* (a user
    covers [d, d+6] per active day; overlapping runs merge via the
    segmented pass) and DAU deltas — users are disjoint across
    partitions so the per-day delta partials sum exactly; the driver
    folds O(days) rows, never user-level data. Same interval-add idea as
    the engine's exact sliding distinct count (functions/windows.py)."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["user_id", "ts"])

    def day_pairs(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].combine_chunks())
        day = np.asarray(t["ts"].combine_chunks().cast(pa.int64())) // _US_PER_DAY
        uniq = np.unique(np.stack([uid, day]), axis=1)
        return pa.table(
            {
                "user_id": pa.array(uniq[0], pa.int64()),
                "day": pa.array(uniq[1], pa.int64()),
            }
        )

    pairs = ds.map_batches(
        day_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def deltas(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "day": pa.array([], pa.int64()),
                "dau_d": pa.array([], pa.int64()),
                "wau_d": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        day = np.asarray(t["day"].combine_chunks())
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        keep = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (day[1:] != day[:-1]))
        )
        uid, day = uid[keep], day[keep]
        # WAU coverage intervals: a user active on day d is WAU-active on
        # [d, d+6]; merge overlapping intervals per user (sorted days):
        # a new interval starts when the gap to the previous active day
        # exceeds 6
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        new_iv = head | np.concatenate(([False], (day[1:] - day[:-1]) > 6))
        iv_start = day[new_iv]
        # interval end = last day of its run + 6
        iv_last = np.append(day[np.flatnonzero(new_iv)[1:] - 1], day[-1])
        w_plus = iv_start
        w_minus = iv_last + 7  # exclusive end
        # fold all deltas into per-day partials
        d_days = np.concatenate((day, w_plus, w_minus))
        d_dau = np.concatenate(
            (
                np.ones(len(day), np.int64),
                np.zeros(len(w_plus) + len(w_minus), np.int64),
            )
        )
        d_wau = np.concatenate(
            (
                np.zeros(len(day), np.int64),
                np.ones(len(w_plus), np.int64),
                -np.ones(len(w_minus), np.int64),
            )
        )
        gd, inv = np.unique(d_days, return_inverse=True)
        return pa.table(
            {
                "day": pa.array(gd, pa.int64()),
                "dau_d": pa.array(np.bincount(inv, d_dau).astype(np.int64)),
                "wau_d": pa.array(np.bincount(inv, d_wau).astype(np.int64)),
            }
        )

    folded = (
        map_partitions_by_key(pairs, "user_id", deltas, num_parts=NUM_PARTS)
        .groupby("day")
        .aggregate(Sum("dau_d", alias_name="dau"), Sum("wau_d", alias_name="wau_delta"))
        .take_all()
    )  # O(days) rows
    folded.sort(key=lambda r: r["day"])
    days = np.array([r["day"] for r in folded], dtype=np.int64)
    dau = np.array([r["dau"] for r in folded], dtype=np.int64)
    wd = np.array([r["wau_delta"] for r in folded], dtype=np.int64)
    # prefix-sum the WAU deltas over the FULL day range (delta days may
    # include days with no direct activity, e.g. run-out days)
    full = np.arange(days[0], days[-1] + 1, dtype=np.int64)
    wau_full = np.zeros(len(full), dtype=np.int64)
    wau_full[days - days[0]] = wd
    wau_full = np.cumsum(wau_full)
    dau_full = np.zeros(len(full), dtype=np.int64)
    dau_full[days - days[0]] = dau
    active = dau_full > 0  # report only days with activity (SQL twin too)
    return pa.table(
        {
            "dt": _day_strings(full[active]),
            "dau": pa.array(dau_full[active], pa.int64()),
            "wau": pa.array(wau_full[active], pa.int64()),
            "stickiness": _r6(
                dau_full[active].astype(np.float64)
                / wau_full[active].astype(np.float64)
            ),
        }
    )


EVENTS_DAU_WAU_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
d AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY day),
w AS (
    SELECT d.day,
           (SELECT count(DISTINCT u.user_id) FROM ud u
            WHERE u.day BETWEEN d.day - 6 AND d.day)::BIGINT AS wau
    FROM d
)
SELECT strftime(d.day, '%Y-%m-%d') AS dt, d.dau, w.wau,
       ROUND(d.dau::DOUBLE / w.wau::DOUBLE, 6) AS stickiness
FROM d JOIN w USING (day)
"""


# --------------------------------------------------------------------------
# RFM segmentation
# --------------------------------------------------------------------------

_RFM_REF_US = 1_706_745_600_000_000  # scoring reference: 2024-02-01T00:00:00


def q_events_rfm(sf_dir: str):
    """RFM customer segmentation: per user, Recency (whole days from the
    last event to the fixed scoring date), Frequency (purchase count) and
    Monetary (purchase cents, integer-exact), plus 1-5 quintile scores of
    each — the canonical marketing feature triple. Quintile =
    ``(rank-1)*5 // n_users + 1`` over an exact global rank (deterministic
    user_id tiebreak), identical formula on both engines.

    Scale shape: the event stream collapses to per-batch per-user
    partials before ONE small groupby (output is O(users), not
    O(events)); the three quintile ranks run on that per-user table via
    the engine's global-rank stage (range-partitioned sort + O(#blocks)
    driver offsets), never on the raw stream."""
    from ..stages.globalorder import with_global_rank

    ds = _events(sf_dir, columns=["user_id", "ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "max_ts": pa.array([], pa.int64()),
                    "n_purch": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        is_p = np.asarray(pc.equal(t["event_type"].combine_chunks(), "purchase"))
        cents = np.where(
            is_p, round_half_away(np.asarray(t["value"].combine_chunks()) * 100.0), 0.0
        ).astype(np.int64)
        order = np.argsort(uid, kind="stable")
        uid, ts, cents = uid[order], ts[order], cents[order]
        is_p = is_p[order]
        starts = np.flatnonzero(
            np.concatenate(([True], uid[1:] != uid[:-1]))
        )
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "max_ts": pa.array(np.maximum.reduceat(ts, starts), pa.int64()),
                "n_purch": pa.array(
                    np.add.reduceat(is_p.astype(np.int64), starts), pa.int64()
                ),
                "cents": pa.array(np.add.reduceat(cents, starts), pa.int64()),
            }
        )

    from ..stages.keyed import fold_by_keys

    # per-user fold scales with the user population -> keyed-exchange
    # fold, not Dataset.groupby().aggregate() (high-cardinality
    # pathology, keyed.py)
    per_user = (
        fold_by_keys(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["user_id"],
            sums=("n_purch", "cents"),
            maxs=("max_ts",),
            num_parts=NUM_PARTS,
        )
        .map_batches(
            lambda t: t.rename_columns(
                ["user_id", "frequency", "monetary_cents", "max_ts"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "user_id": t["user_id"],
                    "recency_days": pc.divide(
                        pc.subtract(
                            pa.scalar(_RFM_REF_US, pa.int64()), t["max_ts"]
                        ),
                        pa.scalar(_US_PER_DAY, pa.int64()),
                    ),
                    "frequency": t["frequency"],
                    "monetary_cents": t["monetary_cents"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    r1 = with_global_rank(
        per_user, ["recency_days", "user_id"],
        descending=[False, False], rank_col="rr",
    )
    r2 = with_global_rank(
        r1, ["frequency", "user_id"], descending=[True, False], rank_col="rf"
    )
    r3 = with_global_rank(
        r2, ["monetary_cents", "user_id"],
        descending=[True, False], rank_col="rm",
    )
    n_users = r3.count()

    def score(t: pa.Table) -> pa.Table:
        def q5(col):
            r = np.asarray(t[col].combine_chunks())
            return pa.array((r - 1) * 5 // n_users + 1, pa.int64())

        return pa.table(
            {
                "user_id": t["user_id"],
                "recency_days": t["recency_days"],
                "frequency": t["frequency"],
                "monetary_cents": t["monetary_cents"],
                "r_score": q5("rr"),
                "f_score": q5("rf"),
                "m_score": q5("rm"),
            }
        )

    return r3.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


EVENTS_RFM_SQL = f"""
WITH u AS (
    SELECT user_id,
           (({_RFM_REF_US} - epoch_us(max(ts))) // {_US_PER_DAY})::BIGINT
               AS recency_days,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
               AS frequency,
           sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100.0) AS BIGINT)
                    ELSE 0 END)::BIGINT AS monetary_cents
    FROM events GROUP BY user_id
),
n AS (SELECT count(*)::BIGINT AS nu FROM u),
r AS (
    SELECT user_id, recency_days, frequency, monetary_cents,
           row_number() OVER (ORDER BY recency_days, user_id) AS rr,
           row_number() OVER (ORDER BY frequency DESC, user_id) AS rf,
           row_number() OVER (ORDER BY monetary_cents DESC, user_id) AS rm
    FROM u
)
SELECT user_id, recency_days, frequency, monetary_cents,
       ((rr - 1) * 5 // nu + 1)::BIGINT AS r_score,
       ((rf - 1) * 5 // nu + 1)::BIGINT AS f_score,
       ((rm - 1) * 5 // nu + 1)::BIGINT AS m_score
FROM r CROSS JOIN n
"""


# --------------------------------------------------------------------------
# Time-to-next-purchase survival labels
# --------------------------------------------------------------------------

_TTE_HORIZON_US = 7 * _US_PER_DAY  # censoring horizon


def q_events_time_to_purchase(sf_dir: str):
    """Survival-style label generation: for every NON-purchase event, the
    time (whole seconds) until the same user's next purchase, censored at
    a 7-day horizon — the (label, event_observed) pair a churn /
    time-to-conversion model trains on. ``observed = 0`` rows carry the
    horizon as the censored duration (standard right-censoring).

    Scale shape: ONE keyed exchange on user_id, then a single backward
    segmented pass — the next-purchase timestamp is a reversed
    minimum-accumulate with segment reset; no self-join, no window
    shuffle."""
    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "duration_s": pa.array([], pa.int64()),
                "observed": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        is_p = np.asarray(pc.equal(t["event_type"].combine_chunks(), "purchase"))
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, is_p = uid[order], ts[order], eid[order], is_p[order]
        n = len(uid)
        # next purchase INDEX at or after each row via a global backward
        # fill (no per-segment ramp — overflow-free at any partition
        # size); a fill that crosses into the next user is rejected by
        # the same-user check, since rows are user-sorted
        idx = np.arange(n, dtype=np.int64)
        nxt_idx = np.minimum.accumulate(
            np.where(is_p, idx, n)[::-1]
        )[::-1]
        safe = np.minimum(nxt_idx, n - 1)
        has = (nxt_idx < n) & (uid[safe] == uid)
        keep = ~is_p
        gap = np.where(has, ts[safe] - ts, 0)
        observed = (has & (gap <= _TTE_HORIZON_US))[keep]
        dur = np.where(
            observed, gap[keep] // 1_000_000, _TTE_HORIZON_US // 1_000_000
        )
        return pa.table(
            {
                "event_id": pa.array(eid[keep], pa.int64()),
                "user_id": pa.array(uid[keep], pa.int64()),
                "duration_s": pa.array(dur, pa.int64()),
                "observed": pa.array(observed.astype(np.int64), pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "user_id", part, num_parts=NUM_PARTS)


EVENTS_TIME_TO_PURCHASE_SQL = f"""
WITH o AS (
    SELECT user_id, ts, event_id, event_type,
           min(CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS nxt_us
    FROM events
)
SELECT event_id, user_id,
       CASE WHEN nxt_us IS NOT NULL
                 AND nxt_us - epoch_us(ts) <= {_TTE_HORIZON_US}
            THEN (nxt_us - epoch_us(ts)) // 1000000
            ELSE {_TTE_HORIZON_US // 1_000_000} END::BIGINT AS duration_s,
       CASE WHEN nxt_us IS NOT NULL
                 AND nxt_us - epoch_us(ts) <= {_TTE_HORIZON_US}
            THEN 1 ELSE 0 END::BIGINT AS observed
FROM o
WHERE event_type <> 'purchase'
"""


# --------------------------------------------------------------------------
# Market-basket association rules
# --------------------------------------------------------------------------

_BASKET_MIN_PAIR = 3  # minimum co-purchase support (order count)


def q_basket_rules(sf_dir: str):
    """Market-basket association rules over the order lines: for every
    part pair co-purchased in >= {min} orders, both directed rules with
    ``confidence = n_ab / n_antecedent`` and
    ``lift = n_ab·N / (n_a·n_b)`` — the co-purchase affinity features a
    recommender bootstraps from.

    Scale shape: per-batch DISTINCT (order, part) partials, ONE keyed
    exchange on the order key; each partition expands its baskets to
    packed pair keys with the engine's segment-vectorized posting-list
    expansion and pre-aggregates pair/single/order-count partials (orders
    are disjoint across partitions, so partials sum exactly). Pair counts
    fold in a distributed groupby; only the O(|parts|) item-support table
    and the O(1) order count reach the driver, broadcast into the final
    vectorized scoring map."""
    from ..sources.reads import read_parquet_sized
    from ..stages.dedup import _check_packable, _pair_expand, unpack_pairs

    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def distinct_kp(t: pa.Table) -> pa.Table:
        k = np.asarray(t["l_orderkey"].combine_chunks().cast(pa.int64()))
        p = np.asarray(t["l_partkey"].combine_chunks().cast(pa.int64()))
        uniq = np.unique(np.stack([k, p]), axis=1)
        return pa.table(
            {
                "k": pa.array(uniq[0], pa.int64()),
                "p": pa.array(uniq[1], pa.int64()),
            }
        )

    basket = ds.map_batches(
        distinct_kp, batch_format="pyarrow", zero_copy_batch=True
    )

    def expand(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        k = np.asarray(t["k"].combine_chunks())
        p = np.asarray(t["p"].combine_chunks())
        _check_packable(p)
        order = np.lexsort((p, k))
        k, p = k[order], p[order]
        keep = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (p[1:] != p[:-1]))
        )
        k, p = k[keep], p[keep]
        head = np.concatenate(([True], k[1:] != k[:-1]))
        seg_id = np.cumsum(head) - 1
        idx = np.arange(len(k), dtype=np.int64)
        seg_first = np.where(head, idx, 0)
        np.maximum.accumulate(seg_first, out=seg_first)
        cnt = np.bincount(seg_id)[seg_id] - 1 - (idx - seg_first)
        pairs = _pair_expand(p, cnt)
        pk, pn = np.unique(pairs, return_counts=True)
        sk, sn = np.unique(p, return_counts=True)
        kinds = np.concatenate(
            (
                np.zeros(len(pk), np.int64),
                np.ones(len(sk), np.int64),
                [np.int64(2)],
            )
        )
        keys = np.concatenate((pk, sk, [np.int64(0)]))
        ns = np.concatenate((pn, sn, [np.int64(head.sum())]))
        return pa.table(
            {
                "kind": pa.array(kinds, pa.int64()),
                "key": pa.array(keys, pa.int64()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    # materialized once: consumed by BOTH the small-side collect and the
    # scoring pass; post-aggregation it is the (distinct pair) count
    # table — already the reduced relation, object-store-resident and
    # spillable, never driver-resident. The fold routes through
    # fold_sum_by_keys (keyed exchange + reduceat): pair keys are
    # ~all-unique, the regime where Dataset.groupby().aggregate()
    # degrades (measured 65 s -> 0.8 s at sf0.1, see keyed.py).
    from ..stages.keyed import fold_sum_by_keys

    folded = fold_sum_by_keys(
        map_partitions_by_key(basket, "k", expand, num_parts=NUM_PARTS),
        ["kind", "key"],
        ["n"],
        num_parts=NUM_PARTS,
        part_key="key",
    ).materialize()
    small = folded.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # singles + order count: O(|parts|)
    supp: dict[int, int] = {}
    n_orders = 0
    for r in small:
        if r["kind"] == 1:
            supp[int(r["key"])] = int(r["n"])
        else:
            n_orders = int(r["n"])
    s_keys = np.array(sorted(supp), dtype=np.int64)
    s_vals = np.array([supp[int(x)] for x in s_keys], dtype=np.int64)

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "antecedent": pa.array([], pa.int64()),
                "consequent": pa.array([], pa.int64()),
                "n_ab": pa.array([], pa.int64()),
                "confidence": pa.array([], pa.float64()),
                "lift": pa.array([], pa.float64()),
            }
        )
        kind = np.asarray(t["kind"].combine_chunks())
        key = np.asarray(t["key"].combine_chunks())
        n = np.asarray(t["n"].combine_chunks())
        m = (kind == 0) & (n >= _BASKET_MIN_PAIR)
        if not m.any():
            return empty
        a, b = unpack_pairs(key[m])
        n_ab = n[m]
        n_a = s_vals[np.searchsorted(s_keys, a)]
        n_b = s_vals[np.searchsorted(s_keys, b)]
        ante = np.concatenate((a, b))
        cons = np.concatenate((b, a))
        nn = np.concatenate((n_ab, n_ab)).astype(np.float64)
        na = np.concatenate((n_a, n_b)).astype(np.float64)
        nb = np.concatenate((n_b, n_a)).astype(np.float64)
        return pa.table(
            {
                "antecedent": pa.array(ante, pa.int64()),
                "consequent": pa.array(cons, pa.int64()),
                "n_ab": pa.array(
                    np.concatenate((n_ab, n_ab)), pa.int64()
                ),
                "confidence": _r6(nn / na),
                "lift": _r6(nn * float(n_orders) / (na * nb)),
            }
        )

    return folded.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


BASKET_RULES_SQL = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
no AS (SELECT count(DISTINCT k)::BIGINT AS n FROM b),
s AS (SELECT p, count(*)::BIGINT AS n_p FROM b GROUP BY p),
pr AS (
    SELECT a.p AS pa, b2.p AS pb, count(*)::BIGINT AS n_ab
    FROM b a JOIN b b2 ON a.k = b2.k AND a.p < b2.p
    GROUP BY 1, 2 HAVING count(*) >= {_BASKET_MIN_PAIR}
),
r AS (
    SELECT pa AS antecedent, pb AS consequent, n_ab,
           sa.n_p AS n_a, sb.n_p AS n_b
    FROM pr JOIN s sa ON sa.p = pa JOIN s sb ON sb.p = pb
    UNION ALL
    SELECT pb, pa, n_ab, sb.n_p, sa.n_p
    FROM pr JOIN s sa ON sa.p = pa JOIN s sb ON sb.p = pb
)
SELECT antecedent, consequent, n_ab,
       ROUND(n_ab::DOUBLE / n_a, 6) AS confidence,
       ROUND(n_ab::DOUBLE * n / (n_a::DOUBLE * n_b), 6) AS lift
FROM r CROSS JOIN no
"""


# --------------------------------------------------------------------------
# CDC apply / compaction
# --------------------------------------------------------------------------


def q_events_cdc_apply(sf_dir: str):
    """Change-data-capture compaction: interpret the event stream as CDC
    ops on a keyed profile table — ``error`` rows are DELETE tombstones,
    every other type is an UPSERT of ``value`` — and materialize the
    final state in (ts, event_id) apply order: a user survives iff their
    latest upsert is later than their latest delete, carrying that
    upsert's value. The Delta/Hudi-style MERGE the lakehouse runs on
    every ingest cycle (the history-preserving sibling is
    ``events_scd2``; the keep-latest online upsert is ``online_latest``).

    Scale shape: ONE keyed exchange on the primary key, then a single
    segmented pass — per-user last-upsert and last-delete read off
    segment boundaries of one lexsort; no window shuffle, no join."""
    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type", "value"])

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "updated_at": pa.array([], pa.timestamp("us")),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        val = np.asarray(t["value"].combine_chunks())
        is_del = np.asarray(pc.equal(t["event_type"].combine_chunks(), "error"))
        # sort upserts/deletes separately per user; last of each segment
        # is the latest op of that kind
        def last_per_user(mask):
            u, s, e, v = uid[mask], ts[mask], eid[mask], val[mask]
            order = np.lexsort((e, s, u))
            u, s, e, v = u[order], s[order], e[order], v[order]
            tail = np.concatenate((u[1:] != u[:-1], [True]))
            return u[tail], s[tail], e[tail], v[tail]

        uu, us, ue, uv = last_per_user(~is_del)
        du, ds_, de, _ = last_per_user(is_del)
        if len(du):
            # align deletes to upsert users (per-user unique, sorted)
            pos = np.minimum(np.searchsorted(du, uu), len(du) - 1)
            has_del = du[pos] == uu
            alive = (
                ~has_del
                | (us > ds_[pos])
                | ((us == ds_[pos]) & (ue > de[pos]))
            )
        else:
            alive = np.ones(len(uu), dtype=bool)
        return pa.table(
            {
                "user_id": pa.array(uu[alive], pa.int64()),
                "value": pa.array(uv[alive], pa.float64()),
                "updated_at": pa.array(
                    us[alive].view("datetime64[us]"), pa.timestamp("us")
                ),
            }
        )

    return map_partitions_by_key(ds, "user_id", part, num_parts=NUM_PARTS)


EVENTS_CDC_APPLY_SQL = """
WITH u AS (
    SELECT user_id, ts, event_id, value,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events WHERE event_type <> 'error'
),
lu AS (SELECT user_id, ts, event_id, value FROM u WHERE rn = 1),
d AS (
    SELECT user_id, ts, event_id,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events WHERE event_type = 'error'
),
ld AS (SELECT user_id, ts, event_id FROM d WHERE rn = 1)
SELECT lu.user_id, lu.value, lu.ts AS updated_at
FROM lu LEFT JOIN ld USING (user_id)
WHERE ld.user_id IS NULL
   OR lu.ts > ld.ts
   OR (lu.ts = ld.ts AND lu.event_id > ld.event_id)
"""


# --------------------------------------------------------------------------
# Time-decayed event counts
# --------------------------------------------------------------------------

_DECAY_REF_US = 1_706_745_600_000_000  # decay reference: 2024-02-01
_DECAY_HALF_LIFE_DAYS = 7.0


def q_events_decayed_counts(sf_dir: str):
    """Exponentially time-decayed event counts per type: each event
    contributes ``0.5 ** (age_days / half_life)`` — the recency-weighted
    popularity signal that replaces raw counts wherever drift matters.

    Decay weights are computed from INTEGER whole-second ages with the
    identical double expression on both engines (one pow, one divide),
    partial-summed per batch so only O(|types| x batches) scalars
    shuffle; ROUND(,6) absorbs the associativity ULP of the partial-sum
    order (weights are positive, so Kahan-style drift is bounded and the
    6-decimal round is stable)."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "w": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        age_s = div_trunc(_DECAY_REF_US - ts, 1_000_000)  # whole seconds, DuckDB `//` parity
        w = np.power(
            0.5, age_s.astype(np.float64) / (86400.0 * _DECAY_HALF_LIFE_DAYS)
        )
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        code = np.asarray(enc.indices).astype(np.int64)
        nt = len(enc.dictionary)
        return pa.table(
            {
                "event_type": enc.dictionary.cast(pa.string()),
                "w": pa.array(np.bincount(code, w, minlength=nt), pa.float64()),
                "n": pa.array(np.bincount(code, minlength=nt).astype(np.int64)),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("w", alias_name="w"), Sum("n", alias_name="n_events"))
        .take_all()
    )  # O(|types|)
    folded.sort(key=lambda r: r["event_type"])
    return pa.table(
        {
            "event_type": pa.array(
                [r["event_type"] for r in folded], pa.string()
            ),
            "n_events": pa.array(
                [r["n_events"] for r in folded], pa.int64()
            ),
            "decayed_count": _r6(
                np.array([r["w"] for r in folded], dtype=np.float64)
            ),
        }
    )


EVENTS_DECAYED_COUNTS_SQL = f"""
SELECT event_type,
       count(*)::BIGINT AS n_events,
       ROUND(sum(power(0.5,
           (({_DECAY_REF_US} - epoch_us(ts)) // 1000000)::DOUBLE
           / (86400.0 * {_DECAY_HALF_LIFE_DAYS}))), 6) AS decayed_count
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Chi-square independence test: document lang x source
# --------------------------------------------------------------------------


def q_docs_lang_source_chi2(sf_dir: str):
    """Pearson chi-square test of independence between the ``lang`` and
    ``source`` columns of the documents table — the dataset-balance check
    a curation team runs before mixing sources (a large statistic means
    some source skews toward a language). Emits the contingency table
    with expected counts and per-cell chi2 contributions.

    Scale shape: ONE streamed pass of per-batch (lang, source) count
    partials (O(cells) per batch via Arrow group_by), a tiny cell-keyed
    groupby, then O(cells) driver arithmetic — counts stay integer until
    the expected-count division."""
    from ray.data.aggregate import Sum

    from ..sources.reads import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "pn": pa.array([], pa.int64()),
                }
            )
        g = (
            t.group_by(["lang", "source"])
            .aggregate([("lang", "count")])
        )
        return g.rename_columns(["lang", "source", "pn"])

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "source"])
        .aggregate(Sum("pn", alias_name="n"))
        .take_all()
    )  # O(cells)
    folded.sort(key=lambda r: (r["lang"], r["source"]))
    langs = [r["lang"] for r in folded]
    srcs = [r["source"] for r in folded]
    n = np.array([r["n"] for r in folded], dtype=np.int64)
    row_tot: dict[str, int] = {}
    col_tot: dict[str, int] = {}
    for la, s, c in zip(langs, srcs, n):
        row_tot[la] = row_tot.get(la, 0) + int(c)
        col_tot[s] = col_tot.get(s, 0) + int(c)
    total = int(n.sum())
    rt = np.array([row_tot[la] for la in langs], dtype=np.int64)
    ct = np.array([col_tot[s] for s in srcs], dtype=np.int64)
    expected = (rt * ct).astype(np.float64) / float(total)
    chi2 = (n.astype(np.float64) - expected) ** 2 / expected
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n": pa.array(n, pa.int64()),
            "expected": _r6(expected),
            "chi2_term": _r6(chi2),
        }
    )


DOCS_LANG_SOURCE_CHI2_SQL = """
WITH c AS (
    SELECT lang, source, count(*)::BIGINT AS n
    FROM documents GROUP BY lang, source
),
rt AS (SELECT lang, sum(n)::BIGINT AS r FROM c GROUP BY lang),
ct AS (SELECT source, sum(n)::BIGINT AS cl FROM c GROUP BY source),
tt AS (SELECT sum(n)::BIGINT AS t FROM c)
SELECT c.lang, c.source, c.n,
       ROUND((rt.r * ct.cl)::DOUBLE / t, 6) AS expected,
       ROUND(power(c.n::DOUBLE - (rt.r * ct.cl)::DOUBLE / t, 2)
             / ((rt.r * ct.cl)::DOUBLE / t), 6) AS chi2_term
FROM c
JOIN rt USING (lang)
JOIN ct USING (source)
CROSS JOIN tt
"""


# --------------------------------------------------------------------------
# Histogram-interpolated percentiles (mergeable single-pass quantiles)
# --------------------------------------------------------------------------

_PCTL_BUCKET_CENTS = 100  # $1-wide buckets on integer cents
_PCTL_PS = (0.5, 0.95, 0.99)


def q_events_value_pctl_hist(sf_dir: str):
    """Histogram-interpolated percentiles of ``value``: a fixed-width
    integer-cent histogram (trivially mergeable — the single-pass scale
    path where the exact rank-targeting of ``events_value_quantiles``
    needs a second targeted pass), with linear interpolation inside the
    crossing bucket. Deterministic by construction, so unlike t-digest
    the approximation itself has an exact SQL twin.

    Scale shape: per-batch bincount partials → one tiny bucket groupby →
    O(buckets) driver interpolation."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "pn": pa.array([], pa.int64()),
                }
            )
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks()) * 100.0
        ).astype(np.int64)
        bucket = div_trunc(cents, _PCTL_BUCKET_CENTS)
        ub, cn = np.unique(bucket, return_counts=True)
        return pa.table(
            {
                "b": pa.array(ub, pa.int64()),
                "pn": pa.array(cn.astype(np.int64), pa.int64()),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .aggregate(Sum("pn", alias_name="n"))
        .take_all()
    )  # O(buckets)
    folded.sort(key=lambda r: r["b"])
    b = np.array([r["b"] for r in folded], dtype=np.int64)
    n = np.array([r["n"] for r in folded], dtype=np.int64)
    cum = np.cumsum(n)
    total = int(cum[-1])
    ps, vals = [], []
    for p in _PCTL_PS:
        target = p * total  # double, same expression as the SQL twin
        i = int(np.searchsorted(cum, target, side="left"))
        before = int(cum[i] - n[i])
        v = (
            b[i] * _PCTL_BUCKET_CENTS
            + _PCTL_BUCKET_CENTS * (target - before) / n[i]
        ) / 100.0
        ps.append(p)
        vals.append(v)
    return pa.table(
        {
            "p": pa.array(ps, pa.float64()),
            "approx_value": _r6(np.array(vals, dtype=np.float64)),
        }
    )


EVENTS_VALUE_PCTL_HIST_SQL = f"""
WITH h AS (
    SELECT CAST(round(value * 100.0) AS BIGINT) // {_PCTL_BUCKET_CENTS} AS b,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1
),
tot AS (SELECT sum(n)::BIGINT AS nn FROM h),
c AS (SELECT b, n, sum(n) OVER (ORDER BY b) AS cum FROM h),
p(p) AS (VALUES (0.5), (0.95), (0.99))
SELECT p.p,
       ROUND((c.b * {_PCTL_BUCKET_CENTS}
              + {_PCTL_BUCKET_CENTS} * (p.p * t.nn - (c.cum - c.n)) / c.n)
             / 100.0, 6) AS approx_value
FROM p, c, tot t
WHERE c.cum >= p.p * t.nn AND (c.cum - c.n) < p.p * t.nn
"""


# --------------------------------------------------------------------------
# Fused per-user feature snapshot
# --------------------------------------------------------------------------


def q_user_feature_snapshot(sf_dir: str):
    """The feature-store materialization pass: ONE keyed exchange and ONE
    fused segmented sweep compute the whole per-user feature vector the
    online table serves — recency / frequency / monetary (RFM),
    event count, active days, longest day-streak, inter-arrival mean/max,
    session count (30-min gap) and session conversion rate. Ten features,
    one shuffle, one pass — the point of fusion: the standalone operators
    (events_rfm, events_interarrival, events_streaks,
    events_session_conversion) each pay the exchange; the snapshot pays
    it once.

    All sums/counts are integer-exact; the two ratios are the same
    double expression on both engines, rounded to 6."""
    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type", "value"])

    def part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "recency_days": pa.array([], pa.int64()),
                "frequency": pa.array([], pa.int64()),
                "monetary_cents": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_active_days": pa.array([], pa.int64()),
                "max_streak": pa.array([], pa.int64()),
                "mean_gap_s": pa.array([], pa.float64()),
                "max_gap_s": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "conversion_rate": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks())
        is_p = np.asarray(pc.equal(t["event_type"].combine_chunks(), "purchase"))
        cents = np.where(
            is_p, round_half_away(np.asarray(t["value"].combine_chunks()) * 100.0), 0.0
        ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, is_p, cents = uid[order], ts[order], is_p[order], cents[order]
        head = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(head)
        n_ev = np.diff(np.append(starts, len(uid)))
        users = uid[starts]
        # RFM
        recency = div_trunc(_RFM_REF_US - np.maximum.reduceat(ts, starts), _US_PER_DAY)
        freq = np.add.reduceat(is_p.astype(np.int64), starts)
        money = np.add.reduceat(cents, starts)
        # inter-arrival gaps (whole seconds)
        gap_s = (ts[1:] - ts[:-1]) // 1_000_000
        same = uid[1:] == uid[:-1]
        gsum = np.add.reduceat(
            np.concatenate((np.where(same, gap_s, 0), [np.int64(0)])), starts
        )
        gmax = np.maximum.reduceat(
            np.concatenate((np.where(same, gap_s, 0), [np.int64(0)])), starts
        )
        n_gaps = n_ev - 1
        mean_gap = np.where(
            n_gaps > 0, gsum / np.maximum(n_gaps, 1), 0.0
        )
        # sessions: 30-min inactivity breaks; conversion per session
        gap_us = np.concatenate(([np.int64(0)], ts[1:] - ts[:-1]))
        brk = head | (gap_us > _SESSION_GAP_US)
        sess_starts = np.flatnonzero(brk)
        # per-user session count: reduceat over the break indicator
        n_sess = np.add.reduceat(brk.astype(np.int64), starts)
        # converted sessions: any purchase inside — max.reduceat per
        # session, then sum per user over session rows
        sess_conv = np.maximum.reduceat(is_p.astype(np.int64), sess_starts)
        sess_uid = uid[sess_starts]
        su_head = np.concatenate(([True], sess_uid[1:] != sess_uid[:-1]))
        conv_per_user = np.add.reduceat(sess_conv, np.flatnonzero(su_head))
        conv_rate = conv_per_user / n_sess
        # day streaks over distinct active days
        day = ts // _US_PER_DAY
        dkeep = head | np.concatenate(([False], day[1:] != day[:-1]))
        duid, dday = uid[dkeep], day[dkeep]
        dhead = np.concatenate(([True], duid[1:] != duid[:-1]))
        didx = np.arange(len(duid), dtype=np.int64)
        dfirst = np.where(dhead, didx, 0)
        np.maximum.accumulate(dfirst, out=dfirst)
        rank = didx - dfirst
        island = dhead | np.concatenate(
            ([True], (dday - rank)[1:] != (dday - rank)[:-1])
        )
        ilen = np.diff(np.append(np.flatnonzero(island), len(duid)))
        iuser = duid[island]
        iuhead = np.concatenate(([True], iuser[1:] != iuser[:-1]))
        max_streak = np.maximum.reduceat(ilen, np.flatnonzero(iuhead))
        n_days = np.add.reduceat(ilen, np.flatnonzero(iuhead))
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "recency_days": pa.array(recency, pa.int64()),
                "frequency": pa.array(freq, pa.int64()),
                "monetary_cents": pa.array(money, pa.int64()),
                "n_events": pa.array(n_ev, pa.int64()),
                "n_active_days": pa.array(n_days, pa.int64()),
                "max_streak": pa.array(max_streak, pa.int64()),
                "mean_gap_s": _r6(mean_gap),
                "max_gap_s": pa.array(gmax, pa.int64()),
                "n_sessions": pa.array(n_sess, pa.int64()),
                "conversion_rate": _r6(conv_rate),
            }
        )

    return map_partitions_by_key(ds, "user_id", part, num_parts=NUM_PARTS)


USER_FEATURE_SNAPSHOT_SQL = f"""
WITH o AS (
    SELECT user_id, ts, event_id, event_type, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {_SESSION_GAP_US}
                THEN 1 ELSE 0 END AS brk,
           CASE WHEN lag(ts) OVER w IS NULL THEN NULL
                ELSE (epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000
           END AS gap_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT *, sum(brk) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS sess
    FROM o
),
sess_conv AS (
    SELECT user_id, sess,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM s GROUP BY user_id, sess
),
per_sess AS (
    SELECT user_id, count(*)::BIGINT AS n_sessions,
           sum(conv)::BIGINT AS n_conv
    FROM sess_conv GROUP BY user_id
),
ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
isl AS (
    SELECT user_id,
           date_diff('day', DATE '1970-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS island
    FROM ud
),
runs AS (
    SELECT user_id, island, count(*)::BIGINT AS len
    FROM isl GROUP BY user_id, island
),
streaks AS (
    SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
           max(len)::BIGINT AS max_streak
    FROM runs GROUP BY user_id
),
base AS (
    SELECT user_id,
           (({_RFM_REF_US} - epoch_us(max(ts))) // {_US_PER_DAY})::BIGINT
               AS recency_days,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
               AS frequency,
           sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100.0) AS BIGINT)
                    ELSE 0 END)::BIGINT AS monetary_cents,
           count(*)::BIGINT AS n_events,
           COALESCE(sum(gap_s), 0)::BIGINT AS gap_sum,
           COALESCE(max(gap_s), 0)::BIGINT AS max_gap_s,
           (count(*) - 1)::BIGINT AS n_gaps
    FROM o GROUP BY user_id
)
SELECT b.user_id, b.recency_days, b.frequency, b.monetary_cents,
       b.n_events, st.n_active_days, st.max_streak,
       ROUND(CASE WHEN b.n_gaps > 0
                  THEN b.gap_sum::DOUBLE / b.n_gaps ELSE 0.0 END, 6)
           AS mean_gap_s,
       b.max_gap_s,
       ps.n_sessions,
       ROUND(ps.n_conv::DOUBLE / ps.n_sessions, 6) AS conversion_rate
FROM base b
JOIN streaks st USING (user_id)
JOIN per_sess ps USING (user_id)
"""


CUSUM_H_CENTS = 50_000  # drift threshold: |cusum vs global mean| > $500


def q_events_cusum(sf_dir: str):
    """Per-user CUSUM changepoint/drift flag — the classic sequential
    detector: cumulative sum of deviations from the GLOBAL mean value,
    flagged where its magnitude exceeds a threshold. Everything runs in
    SCALED INTEGERS so both sides are bit-exact: with N = total events
    and S = global cents sum, ``cusum_scaled_i = N·run_i − i·S``
    (= N·Σ(v_j − S/N), the exact rational cusum scaled by N) and the
    flag is ``|cusum_scaled| > H_cents·N`` — no float accumulation
    anywhere, so DuckDB's segment-tree window sums can't drift from a
    sequential numpy scan.

    Scale shape: one tiny partial pass folds (N, S) from per-batch
    integer partials (O(#blocks) driver rows); then ONE user_id
    exchange with segmented prefix sums per partition. An int64
    headroom guard raises before any silent wrap (SQL side runs
    HUGEINT)."""
    cols = ["event_id", "ts", "user_id", "value"]
    ds = _events(sf_dir, columns=cols)

    def nspart(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks()) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([int(cents.sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(
        nspart, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # O(#blocks) scalar partials
    n_tot = sum(r["n"] for r in parts)
    s_tot = sum(r["s"] for r in parts)

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "cusum_scaled": pa.array([], pa.int64()),
                    "is_drift": pa.array([], pa.int32()),
                }
            )
        u = np.asarray(t["user_id"].combine_chunks())
        eid = np.asarray(t["event_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks()) * 100.0
        ).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        us, cs = u[order], cents[order]
        n = len(us)
        starts = np.flatnonzero(np.diff(us)) + 1
        csum = np.cumsum(cs)
        seg_start = np.concatenate(([0], starts))
        lens = np.diff(np.concatenate((seg_start, [n])))
        seg_prefix = np.concatenate(([0], csum[starts - 1]))
        run = csum - np.repeat(seg_prefix, lens)
        rn = np.arange(n, dtype=np.int64) - np.repeat(seg_start, lens) + 1
        # int64 headroom guard in Python ints (a np.int64 product wraps)
        worst = max(
            int(np.abs(run).max()) * n_tot, int(rn.max()) * abs(s_tot)
        )
        if 2 * worst >= 2**63:
            raise OverflowError("scaled cusum would overflow int64")
        cusum = run * np.int64(n_tot) - rn * np.int64(s_tot)
        flag = np.abs(cusum) > np.int64(CUSUM_H_CENTS) * np.int64(n_tot)
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": pa.array(us),
                "cusum_scaled": pa.array(cusum),
                "is_drift": pa.array(flag.astype(np.int32)),
            }
        )

    return map_partitions_by_key(ds, "user_id", part, num_parts=NUM_PARTS)


EVENTS_CUSUM_SQL = f"""
WITH g AS (
  SELECT count(*)::HUGEINT AS n,
         sum(CAST(round(value * 100) AS BIGINT))::HUGEINT AS s
  FROM events
),
r AS (
  SELECT event_id, user_id,
         sum(CAST(round(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id)::HUGEINT AS run,
         row_number()
             OVER (PARTITION BY user_id ORDER BY ts, event_id)::HUGEINT AS rn
  FROM events
)
SELECT event_id, user_id,
       (r.run * g.n - r.rn * g.s)::BIGINT AS cusum_scaled,
       CAST(abs(r.run * g.n - r.rn * g.s) > {CUSUM_H_CENTS} * g.n AS INTEGER)
           AS is_drift
FROM r, g
"""


# ---------------------------------------------------------------------------
# Per-group OLS trend fit (distributed linear regression from moments)
# ---------------------------------------------------------------------------


def q_events_ols_trend(sf_dir: str):
    """Per-event-type ordinary-least-squares trend of value over time:
    ``slope`` (cents/day) and ``intercept`` (cents at day 0) of the
    regression of integer-cent values on integer epoch days — the
    classic distributed model fit from sufficient statistics.

    Plan: ZERO data shuffles — each batch collapses to O(types) moment
    partials (n, Σx, Σy, Σxx, Σxy as int64 scatter-adds; days and cents
    are small enough that per-batch int64 never overflows), one tiny
    groupby folds them, and the closed-form solve runs on the O(types)
    result with arbitrary-precision Python ints, so the normal-equation
    numerators are EXACT before the one double division — mirrored by
    HUGEINT arithmetic in the SQL twin (same final IEEE ops, round6)."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sxx": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        day = np.asarray(t["ts"].combine_chunks().cast(pa.int64())) // _US_PER_DAY
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks()) * 100.0
        ).astype(np.int64)
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        code = np.asarray(enc.indices).astype(np.int64)
        k = len(enc.dictionary)

        def fold(vals: np.ndarray) -> np.ndarray:
            out = np.zeros(k, np.int64)
            np.add.at(out, code, vals)
            return out

        n = np.bincount(code, minlength=k).astype(np.int64)
        return pa.table(
            {
                "event_type": enc.dictionary.cast(pa.string()),
                "n": pa.array(n),
                "sx": pa.array(fold(day)),
                "sy": pa.array(fold(cents)),
                "sxx": pa.array(fold(day * day)),
                "sxy": pa.array(fold(day * cents)),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"),
        )
    )

    def solve(t: pa.Table) -> pa.Table:
        from ..functions.numeric import round6

        types, ns, slopes, intercepts = [], [], [], []
        for row in t.to_pylist():
            # exact arbitrary-precision integers up to the one division
            n, sx, sy = int(row["n"]), int(row["sx"]), int(row["sy"])
            sxx, sxy = int(row["sxx"]), int(row["sxy"])
            num, den = n * sxy - sx * sy, n * sxx - sx * sx
            if den == 0:
                # degenerate fit (one event, or all of a type on one day):
                # DuckDB's DOUBLE/0.0 is NULL — mirror it instead of raising
                slope = intercept = None
            else:
                slope = float(num) / float(den)
                intercept = (float(sy) - slope * float(sx)) / float(n)
            types.append(row["event_type"])
            ns.append(n)
            slopes.append(slope)
            intercepts.append(intercept)
        def r6(vals):
            return [
                None if v is None else float(round6(np.array([v]))[0])
                for v in vals
            ]

        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "slope_cents_per_day": pa.array(r6(slopes), pa.float64()),
                "intercept_cents": pa.array(r6(intercepts), pa.float64()),
            }
        )

    return folded.repartition(1).map_batches(
        solve, batch_format="pyarrow", batch_size=None
    )


EVENTS_OLS_TREND_SQL = f"""
WITH m AS (
    SELECT event_type,
           count(*)::HUGEINT AS n,
           SUM((epoch_us(ts) // {_US_PER_DAY})::HUGEINT) AS sx,
           SUM(CAST(ROUND(value * 100) AS HUGEINT)) AS sy,
           SUM((epoch_us(ts) // {_US_PER_DAY})::HUGEINT
               * (epoch_us(ts) // {_US_PER_DAY})::HUGEINT) AS sxx,
           SUM((epoch_us(ts) // {_US_PER_DAY})::HUGEINT
               * CAST(ROUND(value * 100) AS HUGEINT)) AS sxy
    FROM events GROUP BY 1
),
s AS (
    SELECT event_type, n,
           (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE AS slope,
           sx::DOUBLE AS sxd, sy::DOUBLE AS syd, n::DOUBLE AS nd
    FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(slope, 6) AS slope_cents_per_day,
       ROUND((syd - slope * sxd) / nd, 6) AS intercept_cents
FROM s
"""


REGISTRY: dict[str, tuple] = {
    "events_ols_trend": (q_events_ols_trend, EVENTS_OLS_TREND_SQL),
    "events_cusum": (q_events_cusum, EVENTS_CUSUM_SQL),
    "events_cooccurrence": (q_events_cooccurrence, EVENTS_COOCCURRENCE_SQL),
    "events_interarrival": (q_events_interarrival, EVENTS_INTERARRIVAL_SQL),
    "events_streaks": (q_events_streaks, EVENTS_STREAKS_SQL),
    "events_attribution": (q_events_attribution, EVENTS_ATTRIBUTION_SQL),
    "events_first_touch": (q_events_first_touch, EVENTS_FIRST_TOUCH_SQL),
    "events_session_conversion": (
        q_events_session_conversion,
        EVENTS_SESSION_CONVERSION_SQL,
    ),
    "docs_entropy": (q_docs_entropy, DOCS_ENTROPY_SQL),
    "events_rfm": (q_events_rfm, EVENTS_RFM_SQL),
    "events_cdc_apply": (q_events_cdc_apply, EVENTS_CDC_APPLY_SQL),
    "events_time_to_purchase": (
        q_events_time_to_purchase,
        EVENTS_TIME_TO_PURCHASE_SQL,
    ),
    "events_markov": (q_events_markov, EVENTS_MARKOV_SQL),
    "events_dau_wau": (q_events_dau_wau, EVENTS_DAU_WAU_SQL),
    "basket_rules": (q_basket_rules, BASKET_RULES_SQL),
    "user_feature_snapshot": (
        q_user_feature_snapshot,
        USER_FEATURE_SNAPSHOT_SQL,
    ),
    "events_decayed_counts": (
        q_events_decayed_counts,
        EVENTS_DECAYED_COUNTS_SQL,
    ),
    "docs_lang_source_chi2": (
        q_docs_lang_source_chi2,
        DOCS_LANG_SOURCE_CHI2_SQL,
    ),
    "events_value_pctl_hist": (
        q_events_value_pctl_hist,
        EVENTS_VALUE_PCTL_HIST_SQL,
    ),
}

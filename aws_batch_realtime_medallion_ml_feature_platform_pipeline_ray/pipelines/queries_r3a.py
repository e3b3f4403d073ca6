"""Round-3 operators: two-sided interval join, multi-source BFS hop
distance, prefix-cache grouping, watermark/allowed-lateness accounting,
deletion-neighborhood edit-distance join, per-window grouped top-k.

Each extends a family the engine already proves out (temporal joins,
iterative graph, streaming semantics, similarity joins) with a distinct
algorithm; every query has a DuckDB oracle twin (float policy: integer
cents / ROUND(x, 6) on both sides — see queries.py).

Reference provenance: the interval join and lateness accounting
generalize the reference's window filter + dead ``watermark_delay``
parameter (``/root/reference/spark_jobs/silver_and_gold.py:31,56-59``)
into real stream-join / Beam-style triage operators; the rest serve the
north-rule training-data extensions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized
from ..stages.keyed import map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


# ---------------------------------------------------------------------------
# events_interval_join — Flink-style two-sided temporal stream join
# ---------------------------------------------------------------------------

IJ_WINDOW_US = 3_600_000_000  # clicks within [purchase_ts - 1h, purchase_ts)


def q_events_interval_join(sf_dir: str):
    """For every purchase, the count and cents-sum of the same user's
    clicks in the trailing hour EXCLUSIVE of the purchase instant —
    the stream-stream interval join (Flink ``BETWEEN``-join semantics)
    that attribution features need, distinct from the as-of join (one
    row) and the rolling window (same-stream).

    Plan: ONE keyed exchange on ``user_id``; per partition the click
    subset sorts once onto a per-user composite time axis (the as-of
    segment-offset trick), and BOTH window bounds resolve as two global
    ``searchsorted`` calls; the cents sum is a prefix-sum difference.
    No pair materialization — O(purchases) output rows."""
    from ..functions.numeric import round_half_away

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )

    def part_fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "n_clicks_1h": pa.array([], pa.int64()),
                "click_cents_1h": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        et = t["event_type"].combine_chunks()
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        is_p = np.asarray(pc.equal(et, "purchase"))
        is_c = np.asarray(pc.equal(et, "click"))
        if not is_p.any():
            return empty
        pu, pt, pe = uid[is_p], ts[is_p], eid[is_p]
        n_p = len(pu)
        if not is_c.any():
            return pa.table(
                {
                    "event_id": pa.array(pe),
                    "user_id": pa.array(pu),
                    "ts": pa.array(pt).cast(pa.timestamp("us")),
                    "n_clicks_1h": pa.array(np.zeros(n_p, np.int64)),
                    "click_cents_1h": pa.array(np.zeros(n_p, np.int64)),
                }
            )
        cu, ct = uid[is_c], ts[is_c]
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks())[is_c] * 100.0
        ).astype(np.int64)
        t0 = int(min(ct.min(), pt.min()))
        span = int(max(ct.max(), pt.max())) - t0 + 2
        if (int(max(cu.max(), pu.max())) + 1) * span >= 2**63:
            raise OverflowError(
                "interval-join composite axis would overflow int64 — "
                "narrow the partition's ts range"
            )
        order = np.lexsort((ct, cu))
        cu_s, ct_s, cents_s = cu[order], ct[order], cents[order]
        ckey = cu_s * span + (ct_s - t0)
        pref = np.concatenate(([0], np.cumsum(cents_s)))
        # both bounds clip into the purchase's own user band
        rel_lo = np.clip(pt - IJ_WINDOW_US - t0, 0, span - 1)
        rel_hi = np.clip(pt - t0, 0, span - 1)
        lo = np.searchsorted(ckey, pu * span + rel_lo, side="left")
        hi = np.searchsorted(ckey, pu * span + rel_hi, side="left")
        n = (hi - lo).astype(np.int64)
        cents_sum = pref[hi] - pref[lo]
        return pa.table(
            {
                "event_id": pa.array(pe),
                "user_id": pa.array(pu),
                "ts": pa.array(pt).cast(pa.timestamp("us")),
                "n_clicks_1h": pa.array(n),
                "click_cents_1h": pa.array(cents_sum, pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "user_id", part_fn, num_parts=NUM_PARTS)


EVENTS_INTERVAL_JOIN_SQL = f"""
WITH p AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts,
       CAST(count(c.ts) AS BIGINT) AS n_clicks_1h,
       CAST(coalesce(sum(c.cents), 0) AS BIGINT) AS click_cents_1h
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND epoch_us(c.ts) >= epoch_us(p.ts) - {IJ_WINDOW_US}
 AND epoch_us(c.ts) < epoch_us(p.ts)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# embedding_bfs_hops — multi-source BFS over the mutual-kNN graph
# ---------------------------------------------------------------------------

BFS_SRC_MOD = 50   # sources: vec_id % 50 == 0 (deterministic seed set)
BFS_MAX_H = 4      # bounded hop depth


def _mutual_edges_ds(sf_dir: str):
    """Directed mutual-kNN edge list (both directions), one pair-keyed
    exchange — the same construction as ``embedding_knn_components``
    (queries_r2l.py)."""
    from ..stages.ann import knn_self_join
    from .queries_ann import K, _emb

    knn = knn_self_join(_emb(sf_dir), k=K, n_blocks=4)

    def pack(t: pa.Table) -> pa.Table:
        q = np.asarray(t["q_id"].combine_chunks()).astype(np.int64)
        v = np.asarray(t["vec_id"].combine_chunks()).astype(np.int64)
        lo = np.minimum(q, v)
        hi = np.maximum(q, v)
        if len(lo) and int(hi.max()) >= (1 << 31):
            raise OverflowError("pair packing requires ids < 2^31")
        return pa.table({"pair": pa.array((lo << np.int64(32)) | hi)})

    pairs = knn.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)

    def mutual_both_dirs(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "nbr": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        pk = np.sort(np.asarray(part["pair"].combine_chunks()))
        starts = np.flatnonzero(np.concatenate(([True], pk[1:] != pk[:-1])))
        cnt = np.diff(np.append(starts, len(pk)))
        both = pk[starts][cnt == 2]
        a = both >> np.int64(32)
        b = both & np.int64(0xFFFFFFFF)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "nbr": pa.array(np.concatenate([b, a])),
            }
        )

    return map_partitions_by_key(
        pairs, "pair", mutual_both_dirs, num_parts=NUM_PARTS
    )


def q_embedding_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distance over the mutual-kNN graph: every
    vector reachable within ``BFS_MAX_H`` hops of a seed
    (``vec_id % {BFS_SRC_MOD} == 0``) gets its minimum hop count — the
    semantic-neighborhood distance used for seed-anchored curation
    (label spreading by graph distance, not similarity score).

    Distributed shape: the fused two-exchange round from
    stages/graph.py's CC — per round, ONE keyed exchange co-locates
    adjacency rows with the current distance labels and emits
    ``dist+1`` to every neighbor, and ONE merge exchange folds per-node
    minimum. Exactly ``BFS_MAX_H`` rounds (fixed depth — no convergence
    scan needed); labels relation is O(reached nodes)."""
    edges = _mutual_edges_ds(sf_dir).materialize()

    from .queries_ann import _emb

    def seed_labels(t: pa.Table) -> pa.Table:
        vid = np.asarray(t["vec_id"].combine_chunks().cast(pa.int64()))
        src = vid[vid % BFS_SRC_MOD == 0]
        return pa.table(
            {
                "node": pa.array(src, pa.int64()),
                "dist": pa.array(np.zeros(len(src), np.int64)),
            }
        )

    labels = (
        _emb(sf_dir)
        .map_batches(seed_labels, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    SIDE_ADJ, SIDE_LAB = 0, 1

    def tag(side: int, x: str, y: str):
        def _tag(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t[x].cast(pa.int64()),
                    "dist": t[y].cast(pa.int64()),
                    "side": pa.array(np.full(t.num_rows, side, np.int8)),
                }
            )

        return _tag

    def relax(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        side = np.asarray(part["side"].combine_chunks())
        node = np.asarray(part["node"].combine_chunks())
        dist = np.asarray(part["dist"].combine_chunks())
        lab_m = side == SIDE_LAB
        bn, bd = node[lab_m], dist[lab_m]
        o = np.argsort(bn)
        bn, bd = bn[o], bd[o]
        adj_m = ~lab_m
        n, nb = node[adj_m], dist[adj_m]  # dist column carries nbr for adj
        outs_n, outs_d = [bn], [bd]
        if len(n) and len(bn):
            pos = np.searchsorted(bn, n)
            pos_c = np.minimum(pos, len(bn) - 1)
            hit = bn[pos_c] == n  # only labeled nodes propagate
            outs_n.append(nb[hit])
            outs_d.append(bd[pos_c][hit] + 1)
        return pa.table(
            {
                "node": pa.array(np.concatenate(outs_n), pa.int64()),
                "dist": pa.array(np.concatenate(outs_d), pa.int64()),
            }
        )

    def min_fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        node = np.asarray(part["node"].combine_chunks())
        dist = np.asarray(part["dist"].combine_chunks())
        order = np.lexsort((dist, node))
        ns, ds_ = node[order], dist[order]
        first = np.concatenate(([True], ns[1:] != ns[:-1]))
        return pa.table(
            {"node": pa.array(ns[first]), "dist": pa.array(ds_[first])}
        )

    adj_tagged = edges.map_batches(
        tag(SIDE_ADJ, "node", "nbr"), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    for _ in range(BFS_MAX_H):
        lab_tagged = labels.map_batches(
            tag(SIDE_LAB, "node", "dist"), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        delivered = map_partitions_by_key(
            adj_tagged.union(lab_tagged), "node", relax, num_parts=NUM_PARTS
        )
        labels = (
            map_partitions_by_key(
                delivered, "node", min_fold, num_parts=NUM_PARTS
            )
            .materialize()
        )
    return labels.map_batches(
        lambda t: pa.table(
            {"vec_id": t["node"], "hops": t["dist"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _bfs_sql() -> str:
    from .queries_ann import K

    return f"""
WITH RECURSIVE sims AS (
    SELECT a.vec_id AS q_id, b.vec_id,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) AS sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id <> b.vec_id
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY q_id
                                 ORDER BY sim DESC, vec_id) AS rank
    FROM sims
),
knn AS (SELECT q_id, vec_id FROM r WHERE rank <= {K}),
mutual AS (
    SELECT k1.q_id AS node, k1.vec_id AS nbr
    FROM knn k1 JOIN knn k2
      ON k1.q_id = k2.vec_id AND k1.vec_id = k2.q_id
),
bfs AS (
    SELECT vec_id AS node, 0 AS hop FROM embeddings
    WHERE vec_id % {BFS_SRC_MOD} = 0
    UNION ALL
    SELECT m.nbr, b.hop + 1
    FROM bfs b JOIN mutual m ON m.node = b.node
    WHERE b.hop < {BFS_MAX_H}
)
SELECT CAST(node AS BIGINT) AS vec_id, CAST(min(hop) AS BIGINT) AS hops
FROM bfs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# conv_prefix_groups — shared-prefix (system prompt) cache planning
# ---------------------------------------------------------------------------


def q_conv_prefix_groups(sf_dir: str):
    """Group conversations by their FIRST turn's text (the shared system
    prompt / template) and measure the prefix-cache economics: how many
    conversations share each opening and how many total turns ride that
    shared prefix. The dedup-by-prefix planning step an LLM serving /
    training pipeline runs before enabling prefix caching.

    Plan: exchange 1 on ``conv`` (user_id) extracts each conversation's
    first turn + turn count vectorized off segment bounds; exchange 2
    folds the per-conversation rows by prefix text with an Arrow-native
    per-partition group_by."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "props"],
    )

    def first_turn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prefix": pa.array([], pa.large_string()),
                "one": pa.array([], pa.int64()),
                "turns": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        eid = np.asarray(t["event_id"].combine_chunks().cast(pa.int64()))
        order = np.lexsort((eid, ts, uid))
        us = uid[order]
        first = np.concatenate(([True], us[1:] != us[:-1]))
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.append(starts, len(us)))
        props = t["props"].combine_chunks().cast(pa.large_string())
        prefix = props.take(pa.array(order[starts]))
        return pa.table(
            {
                "prefix": prefix,
                "one": pa.array(np.ones(len(starts), np.int64)),
                "turns": pa.array(seg_len.astype(np.int64)),
            }
        )

    per_conv = map_partitions_by_key(
        ds, "user_id", first_turn, num_parts=NUM_PARTS
    )

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    "prefix": pa.array([], pa.large_string()),
                    "n_convs": pa.array([], pa.int64()),
                    "total_turns": pa.array([], pa.int64()),
                }
            )
        g = part.group_by(["prefix"]).aggregate(
            [("one", "sum"), ("turns", "sum")]
        )
        return pa.table(
            {
                "prefix": g["prefix"],
                "n_convs": g["one_sum"].cast(pa.int64()),
                "total_turns": g["turns_sum"].cast(pa.int64()),
            }
        )

    return map_partitions_by_key(per_conv, "prefix", fold, num_parts=NUM_PARTS)


CONV_PREFIX_GROUPS_SQL = """
WITH f AS (
    SELECT props, n FROM (
        SELECT props,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
    ) WHERE rn = 1
)
SELECT props AS prefix,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(n) AS BIGINT) AS total_turns
FROM f GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_allowed_lateness — watermark triage (on-time / late / dropped)
# ---------------------------------------------------------------------------

WM_DELAY_US = 600_000_000       # watermark = running max(ts) - 10 min
WM_ALLOWED_US = 3_600_000_000   # late events older than 1 h are dropped


def q_events_allowed_lateness(sf_dir: str):
    """Beam/Flink watermark semantics over the event stream in ARRIVAL
    order (event_id): the watermark trails the running max event time by
    ``WM_DELAY_US``; an arriving event is on-time at/above the
    watermark, late within ``WM_ALLOWED_US`` below it, dropped beyond —
    per-day triage counts. Makes the reference's dead
    ``watermark_delay_minutes`` (silver_and_gold.py:31) a measurable
    policy.

    Plan: the running max is the engine's distributed prefix-scan
    (stages/globalorder.with_global_prefix_max — one range-partitioned
    sort + O(#blocks) driver carry); classification is a vectorized
    map; the day rollup folds through calendar-bounded partials."""
    from ray.data.aggregate import Sum

    from ..stages.globalorder import with_global_prefix_max

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    ).map_batches(
        lambda t: t.append_column(
            "ts_us", t["ts"].combine_chunks().cast(pa.int64())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scanned = with_global_prefix_max(
        ds, ["event_id"], "ts_us", "wm_max", exclusive=True
    )

    def classify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "day": pa.array([], pa.int64()),
                "p_on": pa.array([], pa.int64()),
                "p_late": pa.array([], pa.int64()),
                "p_drop": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ts = np.asarray(t["ts_us"].combine_chunks())
        mx_arr = t["wm_max"].combine_chunks()
        has = np.asarray(pc.is_valid(mx_arr))
        mx = np.asarray(mx_arr.fill_null(0))
        wm = mx - WM_DELAY_US
        on = ~has | (ts >= wm)
        drop = has & (ts < wm - WM_ALLOWED_US)
        late = ~on & ~drop
        day = ts // 86_400_000_000
        u, inv = np.unique(day, return_inverse=True)
        out = {
            "day": pa.array(u, pa.int64()),
        }
        for name, m in (("p_on", on), ("p_late", late), ("p_drop", drop)):
            c = np.zeros(len(u), np.int64)
            np.add.at(c, inv, m.astype(np.int64))
            out[name] = pa.array(c)
        return pa.table(out)

    folded = (
        scanned.map_batches(
            classify, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("day")
        .aggregate(
            Sum("p_on", alias_name="n_on_time"),
            Sum("p_late", alias_name="n_late"),
            Sum("p_drop", alias_name="n_dropped"),
        )
    )
    return folded.map_batches(
        lambda t: pa.table(
            {
                "day": t["day"].cast(pa.int64()),
                "n_on_time": t["n_on_time"].cast(pa.int64()),
                "n_late": t["n_late"].cast(pa.int64()),
                "n_dropped": t["n_dropped"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


EVENTS_ALLOWED_LATENESS_SQL = f"""
WITH w AS (
    SELECT epoch_us(ts) AS t,
           max(epoch_us(ts)) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
    FROM events
),
c AS (
    SELECT t // 86400000000 AS day,
           CASE WHEN mx IS NULL OR t >= mx - {WM_DELAY_US} THEN 'on'
                WHEN t >= mx - {WM_DELAY_US} - {WM_ALLOWED_US} THEN 'late'
                ELSE 'drop' END AS cls
    FROM w
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(count(*) FILTER (cls = 'on') AS BIGINT) AS n_on_time,
       CAST(count(*) FILTER (cls = 'late') AS BIGINT) AS n_late,
       CAST(count(*) FILTER (cls = 'drop') AS BIGINT) AS n_dropped
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# docs_del1_pairs — edit-distance<=1 join via deletion neighborhoods
# ---------------------------------------------------------------------------

DEL1_KEY_LEN = 12


def q_docs_del1_pairs(sf_dir: str):
    """All document pairs whose normalized key (lowercased first
    {DEL1_KEY_LEN} chars) is within edit distance 1 — the
    SymSpell-style deletion-neighborhood similarity join: each key emits
    itself plus its {DEL1_KEY_LEN} single-deletion variants as
    signatures; two keys within one edit ALWAYS share a signature
    (equal keys share the identity; a substitution pair shares the
    deletion at the differing position), so one signature-keyed
    exchange yields a complete candidate set, a pair-keyed exchange
    dedups candidates, and an exact vectorized verify (keys are fixed
    length, so ed<=1 == Hamming<=1) filters false positives. No
    all-pairs stage anywhere.

    Partitioning assumption: signature groups are bounded by the
    near-duplicate rate (identical-prefix families), like every bucket
    join in stages/dedup.py."""
    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def signatures(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sig": pa.array([], pa.large_string()),
                "doc_id": pa.array([], pa.int64()),
                "key": pa.array([], pa.large_string()),
            }
        )
        if t.num_rows == 0:
            return empty
        key = pc.utf8_lower(
            pc.utf8_slice_codeunits(
                t["text"].combine_chunks(), 0, DEL1_KEY_LEN
            )
        ).cast(pa.large_string())
        doc = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        sigs = [key]  # identity signature
        for i in range(DEL1_KEY_LEN):
            left = pc.utf8_slice_codeunits(key, 0, i)
            right = pc.utf8_slice_codeunits(key, i + 1, DEL1_KEY_LEN)
            sigs.append(
                pc.binary_join_element_wise(
                    left, right, pa.scalar("", pa.large_string())
                ).cast(pa.large_string())
            )
        n = len(doc)
        k = len(sigs)
        return pa.table(
            {
                "sig": pa.concat_arrays(
                    [s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
                     for s in sigs]
                ),
                "doc_id": pa.array(np.tile(doc, k)),
                "key": pa.concat_arrays(
                    [key.combine_chunks() if isinstance(key, pa.ChunkedArray)
                     else key] * k
                ),
            }
        )

    sigged = ds.map_batches(
        signatures, batch_format="pyarrow", zero_copy_batch=True
    )

    def candidates(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pair": pa.array([], pa.int64()),
                "key_a": pa.array([], pa.large_string()),
                "key_b": pa.array([], pa.large_string()),
            }
        )
        if part.num_rows == 0:
            return empty
        sig = part["sig"].combine_chunks()
        codes = np.asarray(pc.dictionary_encode(sig).indices).astype(np.int64)
        doc = np.asarray(part["doc_id"].combine_chunks())
        order = np.lexsort((doc, codes))
        c_s, d_s = codes[order], doc[order]
        starts = np.flatnonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))
        ends = np.append(starts[1:], len(c_s))
        pa_idx: list[np.ndarray] = []
        pb_idx: list[np.ndarray] = []
        for s, e in zip(starts, ends):  # group sizes bounded by dup rate
            g = order[s:e]
            gd = d_s[s:e]
            keep = np.concatenate(([True], gd[1:] != gd[:-1]))
            g, gd = g[keep], gd[keep]
            m = len(g)
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            pa_idx.append(g[ii])
            pb_idx.append(g[jj])
        if not pa_idx:
            return empty
        ia = np.concatenate(pa_idx)
        ib = np.concatenate(pb_idx)
        da, db = doc[ia], doc[ib]
        lo = np.minimum(da, db)
        hi = np.maximum(da, db)
        if int(hi.max()) >= (1 << 31):
            raise OverflowError("pair packing requires ids < 2^31")
        key = part["key"].combine_chunks()
        swap = da > db
        ka = key.take(pa.array(np.where(swap, ib, ia)))
        kb = key.take(pa.array(np.where(swap, ia, ib)))
        return pa.table(
            {
                "pair": pa.array((lo << np.int64(32)) | hi),
                "key_a": ka,
                "key_b": kb,
            }
        )

    cand = map_partitions_by_key(
        sigged, "sig", candidates, num_parts=NUM_PARTS
    )

    def verify(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "ed": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        pair = np.asarray(part["pair"].combine_chunks())
        order = np.argsort(pair, kind="stable")
        pair_s = pair[order]
        first = np.concatenate(([True], pair_s[1:] != pair_s[:-1]))
        idx = order[first]
        ka = part["key_a"].combine_chunks().take(pa.array(idx))
        kb = part["key_b"].combine_chunks().take(pa.array(idx))
        la = np.asarray(pc.utf8_length(ka)).astype(np.int64)
        lb = np.asarray(pc.utf8_length(kb)).astype(np.int64)
        # CODEPOINT-level comparison (UTF-32 fixed width), matching the
        # oracle's character-level levenshtein — a byte view would crash
        # or misalign on multi-byte UTF-8
        a = (
            np.array(ka.to_pylist(), dtype=f"U{DEL1_KEY_LEN}")
            .view(np.uint32)
            .reshape(-1, DEL1_KEY_LEN)
        )
        b = (
            np.array(kb.to_pylist(), dtype=f"U{DEL1_KEY_LEN}")
            .view(np.uint32)
            .reshape(-1, DEL1_KEY_LEN)
        )
        neq = a != b
        # equal lengths: ed<=1 <=> Hamming<=1 (padding compares equal)
        ham = neq.sum(axis=1).astype(np.int64)
        same_len = la == lb
        diff1 = np.abs(la - lb) == 1
        # length difference 1 (keys from texts shorter than the key
        # width): ed == 1 <=> common_prefix + common_suffix >= shorter
        # length. Prefix from the left-aligned compare; suffix by
        # realigning the LONGER key one position left.
        pref = np.where(
            neq.any(axis=1), neq.argmax(axis=1), DEL1_KEY_LEN
        ).astype(np.int64)
        a_long = la >= lb
        lng = np.where(a_long[:, None], a, b)
        sht = np.where(a_long[:, None], b, a)
        shifted = np.empty_like(lng)
        shifted[:, :-1] = lng[:, 1:]
        shifted[:, -1] = 0
        eq_sh = shifted == sht
        # suffix length: trailing run of aligned-equal positions within
        # the shorter key's span (positions 0..min_len-1)
        min_len = np.minimum(la, lb)
        pos = np.arange(DEL1_KEY_LEN)
        in_span = pos[None, :] < min_len[:, None]
        bad = (~eq_sh) & in_span
        last_bad = np.where(
            bad.any(axis=1),
            DEL1_KEY_LEN - 1 - bad[:, ::-1].argmax(axis=1),
            -1,
        ).astype(np.int64)
        suff = min_len - 1 - last_bad
        ed = np.where(
            same_len,
            ham,
            np.where(
                diff1,
                np.where(np.minimum(pref, min_len) + suff >= min_len, 1, 2),
                2,  # |len diff| >= 2: ed >= 2, never emitted
            ),
        )
        ok = ed <= 1
        p = pair_s[first][ok]
        return pa.table(
            {
                "doc_a": pa.array(p >> np.int64(32)),
                "doc_b": pa.array(p & np.int64(0xFFFFFFFF)),
                "ed": pa.array(ed[ok]),
            }
        )

    return map_partitions_by_key(cand, "pair", verify, num_parts=NUM_PARTS)


DOCS_DEL1_PAIRS_SQL = f"""
WITH k AS (
    SELECT doc_id, lower(substr(text, 1, {DEL1_KEY_LEN})) AS key
    FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS ed
FROM k a JOIN k b
  ON a.doc_id < b.doc_id AND levenshtein(a.key, b.key) <= 1
"""


# ---------------------------------------------------------------------------
# events_window_topk — per-window grouped top-k with deterministic ties
# ---------------------------------------------------------------------------

WTOPK_K = 2


def q_events_window_topk(sf_dir: str):
    """Per tumbling day, the top-{WTOPK_K} event types by count
    (deterministic ties: lexicographically smaller type wins) — the
    windowed grouped top-k every trending/leaderboard feature needs,
    distinct from the global ``topk``. Per-batch partials pre-aggregate
    (day, type) counts, the calendar-bounded fold rides one exchange on
    ``day``, and ranking is a per-partition lexsort."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "day": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.large_string()),
                "pn": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        day = ts // 86_400_000_000
        et = t["event_type"].combine_chunks().cast(pa.large_string())
        enc = pc.dictionary_encode(et)
        codes = np.asarray(enc.indices).astype(np.int64)
        nt = len(enc.dictionary)
        cell = day * nt + codes
        u, inv, cnt = np.unique(cell, return_inverse=True, return_counts=True)
        return pa.table(
            {
                "day": pa.array(u // nt, pa.int64()),
                "event_type": enc.dictionary.take(pa.array(u % nt)).cast(
                    pa.large_string()
                ),
                "pn": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def rank_part(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "day": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.large_string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        g = part.group_by(["day", "event_type"]).aggregate([("pn", "sum")])
        day = np.asarray(g["day"].combine_chunks())
        n = np.asarray(g["pn_sum"].combine_chunks()).astype(np.int64)
        et = g["event_type"].combine_chunks().cast(pa.large_string())
        enc = pc.dictionary_encode(et)
        # dictionary codes are first-occurrence order; remap to the
        # LEXICOGRAPHIC rank so the tie-break matches ORDER BY event_type
        dict_strs = enc.dictionary.to_pylist()
        lex = np.empty(len(dict_strs), np.int64)
        lex[np.argsort(np.array(dict_strs, dtype=object))] = np.arange(
            len(dict_strs)
        )
        codes = lex[np.asarray(enc.indices).astype(np.int64)]
        order = np.lexsort((codes, -n, day))
        day_s = day[order]
        first = np.concatenate(([True], day_s[1:] != day_s[:-1]))
        seg = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        rnk = np.arange(len(day_s)) - starts[seg] + 1
        keep = rnk <= WTOPK_K
        return pa.table(
            {
                "day": pa.array(day_s[keep], pa.int64()),
                "rnk": pa.array(rnk[keep], pa.int64()),
                "event_type": et.take(pa.array(order[keep])),
                "n": pa.array(n[order][keep]),
            }
        )

    return map_partitions_by_key(partials, "day", rank_part, num_parts=NUM_PARTS)


EVENTS_WINDOW_TOPK_SQL = f"""
WITH c AS (
    SELECT epoch_us(ts) // 86400000000 AS day, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
)
SELECT CAST(day AS BIGINT) AS day, CAST(rn AS BIGINT) AS rnk, event_type, n
FROM (
    SELECT *, row_number() OVER (PARTITION BY day
                                 ORDER BY n DESC, event_type) AS rn
    FROM c
) WHERE rn <= {WTOPK_K}
"""


REGISTRY: dict[str, tuple] = {
    "events_interval_join": (q_events_interval_join, EVENTS_INTERVAL_JOIN_SQL),
    "embedding_bfs_hops": (q_embedding_bfs_hops, _bfs_sql()),
    "conv_prefix_groups": (q_conv_prefix_groups, CONV_PREFIX_GROUPS_SQL),
    "events_allowed_lateness": (
        q_events_allowed_lateness,
        EVENTS_ALLOWED_LATENESS_SQL,
    ),
    "docs_del1_pairs": (q_docs_del1_pairs, DOCS_DEL1_PAIRS_SQL),
    "events_window_topk": (q_events_window_topk, EVENTS_WINDOW_TOPK_SQL),
}

"""Distributed connected components over a pair (edge) dataset.

Hash-to-min style label propagation with per-partition local closure:

- ``labels`` maps every node to the smallest node id known to be in its
  component (rows double as *edges* of the label graph).
- Each round runs THREE keyed exchanges plus a coalesce: every node's
  label is sent over the original edges to its neighbors (send, one
  cogroup), the label rows are also routed to their rep's partition
  (swap, rides the merge exchange), a GLOBAL pointer-jumping cogroup
  delivers rep(rep(u)) back to u (jump), and the 4-way union is
  repartition-coalesced before materializing so block counts stay flat
  across rounds. Each hash partition then runs a fully VECTORIZED local
  transitive closure (iterated min + pointer jumping in code space)
  over every (node, rep) row it holds.

The local closure is the accelerator: instead of shaving one hop per
round (O(component diameter) rounds), each partition collapses every
locally-visible chain in one numpy pass, and the global jump halves
CROSS-partition chain depth per round, so even high-diameter graphs
(kNN meshes) converge in O(log d) rounds. This is the hash-to-min
recipe (Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds") plus explicit pointer jumping, adapted to the
engine's one-shuffle keyed pass.

Scale shape: the edge set is materialized ONCE (O(duplicate pairs),
bounded by the dup rate, spillable) and streams through each round's
cogroup; only the LABELS relation (O(nodes that appear in any pair))
materializes per round. The fixpoint is detected by the label sum,
which strictly decreases until convergence (labels are monotonically
nonincreasing and bounded below by the component minimum).

Reference parity: cluster-level dedup is the reference's keep-one-per-
group semantics (spark_jobs/silver_and_gold.py dedup) lifted from exact
keys to a similarity graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .keyed import cogroup_by_key, map_partitions_by_key

CC_MAX_ROUNDS = 30
_LOCAL_MAX_ITERS = 64  # local closure: pointer jumping halves depth/iter


def _empty_labels() -> pa.Table:
    return pa.table(
        {"node": pa.array([], pa.int64()), "rep": pa.array([], pa.int64())}
    )


def _local_closure(x: np.ndarray, y: np.ndarray):
    """Vectorized connected components over in-memory edges (x[i], y[i]).

    Returns (uniq_sorted, lab) where ``uniq_sorted`` is the sorted array
    of distinct node ids and ``lab[i]`` indexes the smallest node id in
    the local component of ``uniq_sorted[i]``. Iterated edge-min plus
    pointer jumping in *rank* space (ranks are id-ordered, so min rank =
    min id) — O(E log d) numpy work, no Python per-edge loop.
    """
    codes, uniq = pd.factorize(np.concatenate([x, y]))
    m = len(uniq)
    order = np.argsort(uniq)
    rank = np.empty(m, dtype=np.int64)
    rank[order] = np.arange(m, dtype=np.int64)
    uniq_sorted = uniq[order]
    cx = rank[codes[: len(x)]]
    cy = rank[codes[len(x) :]]
    lab = np.arange(m, dtype=np.int64)
    for _ in range(_LOCAL_MAX_ITERS):
        nxt = lab.copy()
        np.minimum.at(nxt, cx, lab[cy])
        np.minimum.at(nxt, cy, lab[cx])
        nxt = np.minimum(nxt, nxt[nxt])  # pointer jump
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    else:  # pragma: no cover - 2^64 depth is unreachable
        raise RuntimeError("local closure failed to converge")
    return uniq_sorted, lab, cx


def _closure_part(part: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Per-partition kernel: rows are edges; emit (node, rep) for every
    distinct value in the PARTITION-KEY position only (values seen only
    on the y side belong to — and are labeled in — their own hash
    partition, keeping the output free of duplicate node rows)."""
    if part.num_rows == 0:
        return _empty_labels()
    x = np.asarray(part[x_col].combine_chunks())
    y = np.asarray(part[y_col].combine_chunks())
    uniq_sorted, lab, cx = _local_closure(x, y)
    own = np.unique(cx)
    return pa.table(
        {
            "node": pa.array(uniq_sorted[own], pa.int64()),
            "rep": pa.array(uniq_sorted[lab[own]], pa.int64()),
        }
    )


def connected_components(
    pairs,
    *,
    num_parts: int | None = None,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
):
    """Labels every node of the undirected pair graph with the smallest
    node id in its component. Returns a Dataset of (node, rep).
    ``num_parts=None`` derives the count from the cluster
    (stages/keyed.derive_num_parts)."""
    if num_parts is None:
        from .keyed import derive_num_parts

        num_parts = derive_num_parts()

    def to_adj(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col].combine_chunks())
        b = np.asarray(t[b_col].combine_chunks())
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    # materialized ONCE: consumed by every round; lazy would re-execute
    # the whole upstream (e.g. MinHash+verify) per round
    adj = pairs.map_batches(
        to_adj, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # init: local closure straight over the adjacency rows — every node
    # appears in the x position (adj holds both directions), so this
    # yields one label row per node with all partition-local chains
    # already collapsed.
    labels = map_partitions_by_key(
        adj,
        "node",
        lambda p: _closure_part(p, "node", "nbr"),
        num_parts=num_parts,
    ).materialize()

    def send_labels(adj_part: pa.Table, lab_part: pa.Table) -> pa.Table:
        # deliver rep(u) to every neighbor v of u: edge (v, rep(u))
        if adj_part.num_rows == 0 or lab_part.num_rows == 0:
            return _empty_labels()
        ln = np.asarray(lab_part["node"].combine_chunks())
        lr = np.asarray(lab_part["rep"].combine_chunks())
        order = np.argsort(ln)
        ln, lr = ln[order], lr[order]
        n = np.asarray(adj_part["node"].combine_chunks())
        nb = np.asarray(adj_part["nbr"].combine_chunks())
        pos = np.searchsorted(ln, n)
        # labels must cover every adj node; a violated invariant would
        # otherwise silently propagate a NEIGHBOR's rep (or IndexError)
        if len(ln) == 0 or pos.max() >= len(ln) or not np.array_equal(ln[pos], n):
            raise RuntimeError(
                "connected-components invariant violated: labels table "
                "is missing nodes present in the adjacency partition"
            )
        rep = lr[pos]
        return pa.table(
            {"node": pa.array(nb, pa.int64()), "rep": pa.array(rep, pa.int64())}
        )

    def swap(t: pa.Table) -> pa.Table:
        # route each label row to its rep's partition so the closure
        # there merges every node currently sharing that rep
        return pa.table({"node": t["rep"], "rep": t["node"]})

    def jump(base: pa.Table, qry: pa.Table) -> pa.Table:
        # GLOBAL pointer jumping: deliver rep(rep(u)) back to u — halves
        # cross-partition chain depth per round, so high-diameter graphs
        # (e.g. kNN meshes) converge in O(log d) rounds instead of O(d).
        # base = label rows owning this partition's nodes; qry rows ask
        # for the rep of qry.node (their current rep) on behalf of
        # qry.orig.
        if base.num_rows == 0 or qry.num_rows == 0:
            return _empty_labels()
        bn = np.asarray(base["node"].combine_chunks())
        br = np.asarray(base["rep"].combine_chunks())
        o = np.argsort(bn)
        bn, br = bn[o], br[o]
        qn = np.asarray(qry["orig"].combine_chunks())
        qk = np.asarray(qry["node"].combine_chunks())
        pos = np.searchsorted(bn, qk)
        pos_c = np.minimum(pos, len(bn) - 1)
        hit = bn[pos_c] == qk  # a rep without a label row yet: skip
        return pa.table(
            {
                "node": pa.array(qn[hit], pa.int64()),
                "rep": pa.array(br[pos_c][hit], pa.int64()),
            }
        )

    prev_sum = None
    for _ in range(CC_MAX_ROUNDS):
        cur_sum = labels.sum("rep")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        msgs = cogroup_by_key(
            adj, labels, "node", send_labels, num_parts=num_parts
        )
        swapped = labels.map_batches(
            swap, batch_format="pyarrow", zero_copy_batch=True
        )
        jq = labels.map_batches(
            lambda t: pa.table({"orig": t["node"], "node": t["rep"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        jumped = cogroup_by_key(
            labels, jq, "node", jump, num_parts=num_parts
        )
        # repartition BEFORE materializing: the 4-way union multiplies
        # block count every round and the groupby sort preserves it, so
        # without the coalesce blocks grow geometrically (4 → 13 → 40 →
        # 121 → …) and round cost explodes with pure scheduling overhead
        # (measured 1.4 s → 383 s by round 6 on a 500-node kNN graph)
        labels = (
            map_partitions_by_key(
                msgs.union(labels).union(swapped).union(jumped),
                "node",
                lambda p: _closure_part(p, "node", "rep"),
                num_parts=num_parts,
            )
            .repartition(num_parts)
            .materialize()
        )
    return labels


# ---------------------------------------------------------------------------
# PageRank (integer-exact, constant out-degree)
# ---------------------------------------------------------------------------

def pagerank_constant_outdegree(
    edges,
    nodes,
    *,
    k_out: int,
    iters: int,
    num_parts: int,
    scale: int = 1 << 38,
    damp_num: int = 85,
    damp_den: int = 100,
):
    """Distributed PageRank over a directed graph in which EVERY source
    node has exactly ``k_out`` out-edges (a kNN similarity graph) —
    centrality-based data selection: high-rank rows sit in dense
    semantic neighborhoods, low-rank rows are outliers.

    Integer-exact so an unrolled-CTE SQL twin reproduces it bit-for-bit:
    ``rank_0 = scale`` and

        rank_{t+1}(v) = ((den-num)*scale)//den
                        + (num * sum_{(u,v) in E} rank_t(u)//k_out)//den

    with floor division throughout (all values nonnegative, so numpy
    ``//`` and DuckDB ``//`` agree). No floats anywhere, so there is no
    summation-order sensitivity to begin with.

    Scale shape: the edge set is materialized ONCE and streamed through
    each round; per iteration exactly TWO keyed exchanges (contributions
    routed to their dst partition; per-node sums folded against the
    vertex set). The rank relation — O(nodes) — is the only thing that
    rematerializes per round; nothing is ever broadcast.

    ``edges``: Dataset with columns (src, dst); every src must appear in
    ``nodes`` and have exactly ``k_out`` rows. ``nodes``: Dataset with
    column (node) — the complete vertex set, and must be non-empty.
    Returns a Dataset (node, rank) with rank still in scaled-integer
    form.
    """
    base = ((damp_den - damp_num) * scale) // damp_den

    edges = edges.map_batches(
        lambda t: pa.table(
            {
                "node": t["src"].cast(pa.int64()),
                "dst": t["dst"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"].cast(pa.int64()),
                "rank": pa.array(
                    np.full(t.num_rows, scale, dtype=np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def emit_contribs(lpart: pa.Table, rpart: pa.Table) -> pa.Table:
        """lpart: edges of this src-partition; rpart: ranks of the same
        partition (complete by co-hashing on the src node)."""
        import pyarrow.compute as pc

        if lpart.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        idx = pc.index_in(
            lpart["node"].combine_chunks(),
            value_set=rpart["node"].combine_chunks(),
        )
        idx_np = np.asarray(idx.fill_null(-1)).astype(np.int64)
        if (idx_np < 0).any():
            raise ValueError("pagerank: edge src missing from vertex set")
        rk = np.asarray(rpart["rank"].combine_chunks()).astype(np.int64)
        return pa.table(
            {
                "node": lpart["dst"],
                "c": pa.array(rk[idx_np] // k_out, pa.int64()),
            }
        )

    def fold_ranks(lpart: pa.Table, rpart: pa.Table) -> pa.Table:
        """lpart: current ranks (carries the vertex set); rpart: contribs."""
        import pyarrow.compute as pc

        if lpart.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        node_arr = lpart["node"].combine_chunks()
        insum = np.zeros(lpart.num_rows, dtype=np.int64)
        if rpart.num_rows:
            g = rpart.group_by("node").aggregate([("c", "sum")])
            idx = pc.index_in(node_arr, value_set=g["node"].combine_chunks())
            idx_np = np.asarray(idx.fill_null(-1)).astype(np.int64)
            sums = np.asarray(g["c_sum"].combine_chunks()).astype(np.int64)
            hit = idx_np >= 0
            insum[hit] = sums[idx_np[hit]]
        rank = base + (damp_num * insum) // damp_den
        return pa.table(
            {
                "node": node_arr,
                "rank": pa.array(rank, pa.int64()),
            }
        )

    for _ in range(iters):
        contribs = cogroup_by_key(
            edges, ranks, "node", emit_contribs, num_parts=num_parts
        )
        ranks = cogroup_by_key(
            ranks, contribs, "node", fold_ranks, num_parts=num_parts
        ).materialize()
    return ranks

"""Distributed connected components over a pair (edge) dataset.

Hash-to-min style label propagation with per-partition local closure:

- ``labels`` maps every node to the smallest node id known to be in its
  component (rows double as *edges* of the label graph).
- Each round, every node's label is sent over the original edges to its
  neighbors (one cogroup exchange), the label rows are also routed to
  their rep's partition (swap), and each hash partition then runs a
  fully VECTORIZED local transitive closure (iterated min + pointer
  jumping in code space) over every (node, rep) row it holds.

The local closure is the accelerator: instead of shaving one hop per
round (O(component diameter) rounds) or one explicit shortcut
(O(log d) rounds at 3+ exchanges each), each partition collapses every
locally-visible chain in one numpy pass, so real graphs converge in a
handful of rounds at exactly TWO keyed exchanges per round. This is the
hash-to-min recipe (Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds") adapted to the engine's one-shuffle
keyed pass.

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
    num_parts: int,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
):
    """Labels every node of the undirected pair graph with the smallest
    node id in its component. Returns a Dataset of (node, rep)."""

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
        rep = lr[np.searchsorted(ln, n)]  # labels hold every adj node
        return pa.table(
            {"node": pa.array(nb, pa.int64()), "rep": pa.array(rep, pa.int64())}
        )

    def swap(t: pa.Table) -> pa.Table:
        # route each label row to its rep's partition so the closure
        # there merges every node currently sharing that rep
        return pa.table({"node": t["rep"], "rep": t["node"]})

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
        labels = map_partitions_by_key(
            msgs.union(labels).union(swapped),
            "node",
            lambda p: _closure_part(p, "node", "rep"),
            num_parts=num_parts,
        ).materialize()
    return labels

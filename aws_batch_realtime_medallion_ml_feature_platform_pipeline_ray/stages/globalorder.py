"""Global total-order ranking on top of Ray Data's range-partitioned sort.

``Dataset.sort`` gives a total order across blocks (range partitioning +
per-block sort) but no row numbers. This stage adds an exact global rank
with the canonical two-pass block-offset scan:

1. ``ds.sort(keys)`` — the one unavoidable all-to-all exchange.
2. Per-block partials: (first-row key, row count) — one tiny row per
   block, collected to the driver (O(#blocks), never O(rows)).
3. Driver exclusive-scan over the block partials, keyed by the block's
   first-row key (unique when ``keys`` is a candidate key), broadcast as
   an O(#blocks) dict.
4. One more pass: each block adds its offset to a local ``arange``.

Passes 2 and 4 run with ``batch_size=None`` (whole blocks) over the SAME
materialized sorted dataset, so batching is identical in both passes and
the first-row key identifies each block. The mid-pipeline ``materialize``
is inherent to rank assignment (a scan barrier, like the sort itself);
blocks live in the object store and spill, never on one node.

The per-entity ordering analog of the reference's global ``ORDER BY``
outputs (scripts/transform_and_prepare_sample_data.py writes sorted
samples); within-group ranks are ``queries_features.q_features_rank`` —
this is the *total order* version those can't express.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def with_global_rank(
    ds,
    keys: list[str],
    *,
    descending: list[bool],
    rank_col: str = "rnk",
    weight_col: str | None = None,
):
    """Return ``ds`` with an exact 1-based global row number by ``keys``.

    ``keys`` must be a candidate key (no full duplicates across them) so
    the total order — and each block's first-row identity — is unique.

    ``weight_col``: optional int64 column of row weights; the rank then
    advances by each row's weight instead of 1 (``rank_col`` is
    ``1 + Σ weights of strictly-smaller rows``) — the weighted prefix
    that turns a distinct-value/count table into per-value MIN ranks of
    the underlying row population (exact distributed ECDF)."""
    return with_global_scans(
        ds, keys, descending=descending, specs=[(rank_col, weight_col)]
    )


def with_global_scans(
    ds,
    keys: list[str],
    *,
    descending: list[bool],
    specs: list[tuple[str, str | None]],
):
    """Several exact global prefix scans over ONE range-partitioned sort.

    ``specs`` is a list of ``(rank_col, weight_col | None)``: each entry
    adds a column holding ``1 + Σ weights of strictly-smaller rows``
    (``None`` weight = plain row numbering). One sort, one O(#blocks)
    driver scan for ALL specs — e.g. a sweep line needs BOTH the signed
    running level (weighted) and a dense adjacency rank (unweighted)."""
    s = ds.sort(keys, descending=descending).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    **{k: t[k].slice(0, 0) for k in keys},
                    **{
                        f"__cnt{i}": pa.array([], pa.int64())
                        for i in range(len(specs))
                    },
                }
            )
        cols = {k: t[k].slice(0, 1) for k in keys}
        for i, (_rc, wc) in enumerate(specs):
            cnt = (
                t.num_rows
                if wc is None
                else int(np.asarray(t[wc].combine_chunks()).sum())
            )
            cols[f"__cnt{i}"] = pa.array([cnt], pa.int64())
        return pa.table(cols)

    stats = s.map_batches(
        block_stat, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # O(#blocks) rows
    if not stats:
        return s

    import pandas as pd

    sdf = pd.DataFrame(stats)
    order = sdf.sort_values(
        keys, ascending=[not d for d in descending], ignore_index=True
    )
    off_by_first: dict[tuple, tuple[int, ...]] = {}
    per_spec_offsets = []
    for i in range(len(specs)):
        per_spec_offsets.append(
            np.concatenate(
                [[0], np.cumsum(order[f"__cnt{i}"].to_numpy(np.int64))[:-1]]
            )
        )
    for j, row in enumerate(order[keys].itertuples(index=False)):
        off_by_first[tuple(row)] = tuple(
            int(per_spec_offsets[i][j]) for i in range(len(specs))
        )

    def add_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            for rc, _wc in specs:
                t = t.append_column(rc, pa.array([], pa.int64()))
            return t
        first = tuple(t[k][0].as_py() for k in keys)
        if first not in off_by_first:
            # batching diverged between the two passes — fail loudly
            # rather than emit wrong ranks
            raise RuntimeError(
                f"global-rank block boundary drift: no offset for {first}"
            )
        bases = off_by_first[first]
        for (rc, wc), base in zip(specs, bases):
            if wc is None:
                local = np.arange(t.num_rows, dtype=np.int64)
            else:
                w = np.asarray(t[wc].combine_chunks()).astype(np.int64)
                local = np.concatenate(([0], np.cumsum(w)[:-1]))
            t = t.append_column(rc, pa.array(base + 1 + local))
        return t

    return s.map_batches(
        add_rank, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def neighbor_pairs(
    ranked,
    *,
    rank_col: str,
    window: int,
    carry_cols: list[str],
    bucket_size: int = 4096,
    num_parts: int = 32,
):
    """Sorted-neighborhood candidate pairs: every (a, b) whose global
    ranks differ by 1..``window``.

    The blocking step of sorted-neighborhood entity resolution (Monge &
    Elkan's classic alternative to LSH banding): sort by a blocking key,
    then only compare records inside a sliding window of the total
    order. Combined with :func:`with_global_rank` this is fully
    distributed: rows are hash-exchanged by ``rank // bucket_size``,
    rows within ``window`` of a bucket's start are ALSO copied into the
    previous bucket (the same overlap-prefix trick as the salted window
    shards, stages/salted.py), and each partition emits its pairs from a
    plain shifted-array zip — every pair produced exactly once because
    only the bucket that OWNS the left row emits it.

    Requires ``window < bucket_size``. Output columns:
    ``<c>_a`` / ``<c>_b`` for every carry column.
    """
    from .keyed import map_partitions_by_key

    if window >= bucket_size:
        raise ValueError("window must be < bucket_size")

    def tag(t: pa.Table):
        import numpy as np

        rnk = np.asarray(t[rank_col].combine_chunks())
        bucket = (rnk - 1) // bucket_size
        own = t.append_column("__bkt", pa.array(bucket, pa.int64()))
        dup = (rnk - 1) % bucket_size < window
        dup &= bucket > 0
        copies = t.filter(pa.array(dup)).append_column(
            "__bkt", pa.array(bucket[dup] - 1, pa.int64())
        )
        return pa.concat_tables([own, copies])

    tagged_cols = carry_cols + [rank_col]

    def pairs_part(t: pa.Table) -> pa.Table:
        import numpy as np

        out_schema = pa.schema(
            [(f"{c}_a", t.schema.field(c).type) for c in carry_cols]
            + [(f"{c}_b", t.schema.field(c).type) for c in carry_cols]
        )
        n = t.num_rows
        if n < 2:
            return out_schema.empty_table()
        rnk = np.asarray(t[rank_col].combine_chunks())
        bkt_all = np.asarray(t["__bkt"].combine_chunks())
        own_all = (rnk - 1) // bucket_size == bkt_all
        # a row can be present twice (own + overlap copy) when adjacent
        # buckets hash to the same partition — dedup by rank, preferring
        # the owner copy, so index offset == rank offset below
        order = np.lexsort((~own_all, rnk))
        rs = rnk[order]
        keep = np.concatenate(([True], rs[1:] != rs[:-1]))
        order = order[keep]
        srt = t.take(pa.array(order))
        rs = rs[keep]
        owner = own_all[order]
        n = srt.num_rows
        if n < 2:
            return out_schema.empty_table()
        cols: dict[str, list] = {f.name: [] for f in out_schema}
        for d in range(1, window + 1):
            if n <= d:
                break
            la = np.arange(0, n - d)
            rb = la + d
            ok = owner[la] & (rs[rb] - rs[la] == d)
            sel_a, sel_b = pa.array(la[ok]), pa.array(rb[ok])
            for c in carry_cols:
                col = srt[c].combine_chunks()
                cols[f"{c}_a"].append(col.take(sel_a))
                cols[f"{c}_b"].append(col.take(sel_b))
        return pa.table(
            {
                name: pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in chunks]
                )
                if chunks
                else pa.array([], out_schema.field(name).type)
                for name, chunks in cols.items()
            }
        ).cast(out_schema)

    slim = ranked.map_batches(
        lambda t: t.select(tagged_cols), batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return map_partitions_by_key(slim, "__bkt", pairs_part, num_parts=num_parts)


def with_global_prefix_max(
    ds,
    keys: list[str],
    value_col: str,
    out_col: str,
    *,
    exclusive: bool = True,
):
    """Exact global running MAX of ``value_col`` (int64-castable) in
    total ``keys`` order — the distributed streaming-scan primitive
    behind watermark semantics (``max event-time seen so far`` in
    arrival order).

    Same two-pass block-offset shape as :func:`with_global_scans`: one
    range-partitioned sort, per-block (first-key, block max) partials
    collected to the driver (O(#blocks)), an exclusive driver prefix-max
    across blocks, then a per-block ``np.maximum.accumulate`` with the
    broadcast carry-in. ``exclusive=True`` gives each row the max over
    STRICTLY EARLIER rows (the first row gets int64 min → emitted as
    null), matching ``MAX(v) OVER (ORDER BY keys ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``. ``keys`` must be a candidate key so
    each block's first-row identity is unique."""
    s = ds.sort(keys).materialize()
    I64MIN = np.iinfo(np.int64).min

    def block_stat(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    **{k: t[k].slice(0, 0) for k in keys},
                    "__mx": pa.array([], pa.int64()),
                }
            )
        v = np.asarray(t[value_col].combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                **{k: t[k].slice(0, 1) for k in keys},
                "__mx": pa.array([int(v.max())], pa.int64()),
            }
        )

    stats = s.map_batches(
        block_stat, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # O(#blocks) rows
    if not stats:
        # schema-complete empty result: downstream consumers rely on
        # out_col existing
        return s.map_batches(
            lambda t: t.append_column(
                out_col, pa.nulls(t.num_rows, pa.int64())
            ),
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    import pandas as pd

    sdf = pd.DataFrame(stats).sort_values(keys, ignore_index=True)
    mx = sdf["__mx"].to_numpy(np.int64)
    carry = np.concatenate(
        ([I64MIN], np.maximum.accumulate(mx)[:-1])
    )  # exclusive across blocks
    carry_by_first = {
        tuple(row): int(carry[j])
        for j, row in enumerate(sdf[keys].itertuples(index=False))
    }

    def add_scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        first = tuple(t[k][0].as_py() for k in keys)
        if first not in carry_by_first:
            raise RuntimeError(
                f"global-scan block boundary drift: no carry for {first}"
            )
        base = carry_by_first[first]
        v = np.asarray(t[value_col].combine_chunks().cast(pa.int64()))
        if exclusive:
            shifted = np.concatenate(([I64MIN], v[:-1]))
            run = np.maximum.accumulate(np.maximum(shifted, base))
        else:
            run = np.maximum.accumulate(np.maximum(v, base))
        miss = run == I64MIN
        return t.append_column(
            out_col, pa.array(np.where(miss, 0, run), pa.int64(), mask=miss)
        )

    return s.map_batches(
        add_scan, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

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
):
    """Return ``ds`` with an exact 1-based global row number by ``keys``.

    ``keys`` must be a candidate key (no full duplicates across them) so
    the total order — and each block's first-row identity — is unique.
    """
    s = ds.sort(keys, descending=descending).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    **{k: t[k].slice(0, 0) for k in keys},
                    "__cnt": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                **{k: t[k].slice(0, 1) for k in keys},
                "__cnt": pa.array([t.num_rows], pa.int64()),
            }
        )

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
    offsets = np.concatenate(
        [[0], np.cumsum(order["__cnt"].to_numpy(np.int64))[:-1]]
    )
    off_by_first = {
        tuple(row): int(off)
        for row, off in zip(order[keys].itertuples(index=False), offsets)
    }

    def add_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(rank_col, pa.array([], pa.int64()))
        first = tuple(t[k][0].as_py() for k in keys)
        if first not in off_by_first:
            # batching diverged between the two passes — fail loudly
            # rather than emit wrong ranks
            raise RuntimeError(
                f"global-rank block boundary drift: no offset for {first}"
            )
        base = off_by_first[first]
        return t.append_column(
            rank_col,
            pa.array(base + 1 + np.arange(t.num_rows, dtype=np.int64)),
        )

    return s.map_batches(
        add_rank, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

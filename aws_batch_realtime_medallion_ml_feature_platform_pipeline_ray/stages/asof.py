"""Point-in-time / as-of join (north-rule B9, SURVEY.md §2.7).

For each left row ``(key, ts)``, attach the most recent right row with the
same ``key`` and ``ts' <= ts`` — strict no-future, zero temporal leakage.
The reference has no explicit join; its only join-like op is the
latest-wins feature-store upsert (``spark_jobs/silver_and_gold.py:136-180``),
which is the degenerate as-of probe at ``ts = +inf``.

Two physical plans:

* :func:`asof_probe` — the vectorized per-batch kernel both plans share:
  dictionary-map left keys onto the right key space, apply the
  segment-offset trick so ONE global ``np.searchsorted`` resolves every
  probe (no per-key loop, no Python rows).
* :class:`BroadcastAsofJoiner` — right side is small (per-entity state):
  ``ray.put`` the right table once, each actor in the ``map_batches`` pool
  fetches it in ``__init__`` and pre-sorts; per-batch work is pure numpy.
  No shuffle at all.
* :func:`asof_join_partitioned` — both sides large: co-partition through
  the engine's single hash shuffle (stages/keyed.py:cogroup_by_key) and
  run the same probe per partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class _SortedRight:
    """Right side pre-processed for O(log n) vectorized probes."""

    def __init__(self, right: pa.Table, key: str, ts: str):
        order_keys = right[key].combine_chunks()
        codes_arr = pc.dictionary_encode(order_keys)
        codes = np.asarray(codes_arr.indices).astype(np.int64)
        self.key_dict = codes_arr.dictionary  # unique right keys
        ts_i = np.asarray(right[ts].combine_chunks().cast(pa.int64()))
        order = np.lexsort((ts_i, codes))
        self.table = right.take(pa.array(order))
        self.codes = codes[order]
        ts_i = ts_i[order]
        t0 = int(ts_i.min()) if len(ts_i) else 0
        self.t0 = t0
        rel = ts_i - t0
        self.span = int(rel.max()) + 2 if len(ts_i) else 1
        n_keys = len(self.key_dict)
        # same guard as functions/windows.adjusted_ts: a wrapped offset
        # ramp would make ts_adj non-monotone and silently corrupt every
        # searchsorted probe
        if n_keys and (n_keys - 1) * self.span + (self.span - 1) >= 2**63:
            raise OverflowError(
                f"as-of segment-offset ramp would overflow int64: "
                f"{n_keys} keys x span {self.span} us — split the right "
                "side into narrower ts ranges or fewer keys per partition"
            )
        self.ts_adj = rel + self.codes * self.span
        self.ts_sorted = ts_i  # plain sorted right ts, for nearest's distance pick
        # duplicate (key, ts) right rows would make the attached value
        # depend on Ray block arrival order (backward picks the last
        # duplicate in input order, forward the first) — fail loudly
        # instead of flaking the deterministic-output contract
        if len(ts_i) > 1:
            same = (self.codes[1:] == self.codes[:-1]) & (ts_i[1:] == ts_i[:-1])
            if same.any():
                raise ValueError(
                    "as-of right side has duplicate (key, ts) rows — "
                    "pre-aggregate the right side to one row per (key, ts) "
                    "so the attached value is deterministic"
                )

    def left_codes(self, left_keys: pa.Array | pa.ChunkedArray) -> np.ndarray:
        idx = pc.index_in(left_keys, value_set=self.key_dict)
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        return np.asarray(idx.fill_null(-1)).astype(np.int64)

    def probe(
        self,
        left_keys,
        left_ts_i: np.ndarray,
        tolerance_us: int | None = None,
        direction: str = "backward",
    ) -> np.ndarray:
        """Return right row index per left row (-1 = no match).

        ``direction="backward"`` (default, the anti-leakage feature join)
        matches the LATEST right row with ``ts' <= ts``;
        ``direction="forward"`` (label generation: next purchase / next
        failure) matches the EARLIEST right row with ``ts' >= ts``.

        ``direction="nearest"`` (sensor-alignment semantics, pandas
        ``merge_asof(direction='nearest')``) matches the right row
        minimizing ``|ts' - ts|``; on an exact tie the BACKWARD (earlier)
        row wins — deterministic and leakage-conservative.

        ``tolerance_us`` bounds staleness: the matched right row must also
        satisfy ``ts' >= ts - tolerance_us`` (backward) or
        ``ts' <= ts + tolerance_us`` (forward — a label horizon; both
        bounds for nearest). Because the as-of match is the nearest
        eligible right row in the probe direction, an out-of-window match
        implies no in-window row exists — a post-mask is exact, no
        re-probe needed."""
        if self.table.num_rows == 0:
            return np.full(len(left_ts_i), -1, dtype=np.int64)
        codes = self.left_codes(left_keys)
        if direction == "nearest":
            # two probes + a vectorized distance pick; tie -> backward
            pb = self._probe_dir(codes, left_ts_i, tolerance_us, "backward")
            pf = self._probe_dir(codes, left_ts_i, tolerance_us, "forward")
            ts_s = self.ts_sorted
            db = np.where(pb >= 0, left_ts_i - ts_s[pb.clip(min=0)], np.int64(1 << 62))
            df = np.where(pf >= 0, ts_s[pf.clip(min=0)] - left_ts_i, np.int64(1 << 62))
            return np.where(db <= df, pb, pf)
        return self._probe_dir(codes, left_ts_i, tolerance_us, direction)

    def _probe_dir(
        self,
        codes: np.ndarray,
        left_ts_i: np.ndarray,
        tolerance_us: int | None,
        direction: str,
    ) -> np.ndarray:
        """Directional (backward/forward) probe over precomputed left-key
        codes — shared by the public probe and nearest's two sub-probes so
        the per-batch key dictionary lookup happens exactly once."""
        if direction == "backward":
            # clip the relative query into [-1, span-1]: below-range probes
            # land just before the segment (-> miss), above-range probes land
            # on the segment's last row without crossing into the next.
            q = (left_ts_i - self.t0).clip(min=-1, max=self.span - 1)
            q_adj = q + codes * self.span
            pos = np.searchsorted(self.ts_adj, q_adj, side="right") - 1
            pos_c = pos.clip(min=0)
            right_ts = (self.ts_adj[pos_c] - self.codes[pos_c] * self.span) + self.t0
            ok = (
                (codes >= 0)
                & (pos >= 0)
                & (self.codes[pos_c] == codes)
                & (left_ts_i >= right_ts)
            )
            if tolerance_us is not None:
                ok &= right_ts >= left_ts_i - tolerance_us
        elif direction == "forward":
            # mirror image: clip into [0, span-1] — below-range probes land
            # on the segment's first row (every row qualifies), above-range
            # probes land past the segment end (codes mismatch -> miss).
            n = len(self.ts_adj)
            q = (left_ts_i - self.t0).clip(min=0, max=self.span - 1)
            q_adj = q + codes * self.span
            pos = np.searchsorted(self.ts_adj, q_adj, side="left")
            pos_c = pos.clip(max=n - 1)
            right_ts = (self.ts_adj[pos_c] - self.codes[pos_c] * self.span) + self.t0
            ok = (
                (codes >= 0)
                & (pos < n)
                & (self.codes[pos_c] == codes)
                & (right_ts >= left_ts_i)
            )
            if tolerance_us is not None:
                ok &= right_ts <= left_ts_i + tolerance_us
        else:
            raise ValueError(f"unknown as-of direction: {direction!r}")
        return np.where(ok, pos, -1)


def asof_attach(
    left: pa.Table,
    right_sorted: _SortedRight,
    left_key: str,
    left_ts: str,
    attach_cols: list[str],
    suffix: str = "",
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> pa.Table:
    """Attach ``attach_cols`` of the as-of matched right row to ``left``
    (nulls when no right row with ts' <= ts exists — ts' >= ts for
    ``direction="forward"`` — or, with ``tolerance_us``, none within the
    staleness/horizon window)."""
    clash = [c for c in attach_cols if c + suffix in left.column_names]
    if clash:
        raise ValueError(
            f"asof_attach: attached column(s) {clash} collide with left "
            "columns — pass a suffix to disambiguate"
        )
    lts = np.asarray(left[left_ts].combine_chunks().cast(pa.int64()))
    pos = right_sorted.probe(
        left[left_key].combine_chunks(), lts, tolerance_us=tolerance_us,
        direction=direction,
    )
    miss = pos < 0
    out = left
    if right_sorted.table.num_rows == 0:
        for c in attach_cols:
            out = out.append_column(
                c + suffix,
                pa.nulls(left.num_rows, right_sorted.table.schema.field(c).type),
            )
        return out
    take = pa.array(np.where(miss, 0, pos), pa.int64(), mask=miss)
    for c in attach_cols:
        out = out.append_column(c + suffix, right_sorted.table[c].take(take))
    return out


class BroadcastAsofJoiner:
    """Actor-pool ``map_batches`` stage: broadcast small right side once per
    actor (ray.put ref fetched in __init__), vectorized probe per batch."""

    def __init__(self, right_ref, key: str, ts: str, attach_cols: list[str],
                 left_key: str | None = None, left_ts: str | None = None,
                 suffix: str = "", tolerance_us: int | None = None,
                 direction: str = "backward"):
        import ray

        right = ray.get(right_ref) if not isinstance(right_ref, pa.Table) else right_ref
        self.sorted_right = _SortedRight(right, key, ts)
        self.left_key = left_key or key
        self.left_ts = left_ts or ts
        self.attach_cols = attach_cols
        self.suffix = suffix
        self.tolerance_us = tolerance_us
        self.direction = direction

    def __call__(self, batch: pa.Table) -> pa.Table:
        return asof_attach(
            batch, self.sorted_right, self.left_key, self.left_ts,
            self.attach_cols, self.suffix, tolerance_us=self.tolerance_us,
            direction=self.direction,
        )


def asof_join_broadcast(
    left_ds,
    right: pa.Table,
    *,
    key: str,
    ts: str,
    attach_cols: list[str],
    left_key: str | None = None,
    left_ts: str | None = None,
    suffix: str = "",
    concurrency: int | tuple[int, int] = 4,
    tolerance_us: int | None = None,
    direction: str = "backward",
):
    """Shuffle-free as-of join for a small right side (state table)."""
    import ray

    right_ref = ray.put(right)
    return left_ds.map_batches(
        BroadcastAsofJoiner,
        fn_constructor_args=(right_ref, key, ts, attach_cols, left_key, left_ts,
                             suffix, tolerance_us, direction),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def asof_join_partitioned(
    left_ds,
    right_ds,
    *,
    key: str,
    ts: str,
    attach_cols: list[str],
    left_ts: str | None = None,
    num_parts: int,
    direction: str = "backward",
):
    """Both-sides-large as-of join: ONE co-partitioning shuffle by ``key``
    (union + groupby, stages/keyed.py), then the same vectorized probe per
    hash partition."""
    from .keyed import cogroup_by_key

    lts = left_ts or ts

    def fn(lpart: pa.Table, rpart: pa.Table) -> pa.Table:
        if lpart.num_rows == 0:
            out = lpart
            for c in attach_cols:
                out = out.append_column(
                    c, pa.nulls(0, rpart.schema.field(c).type)
                )
            return out
        sr = _SortedRight(rpart, key, ts)
        return asof_attach(lpart, sr, key, lts, attach_cols, direction=direction)

    return cogroup_by_key(left_ds, right_ds, key, fn, num_parts=num_parts)

"""Round-2g operators: inequality/concentration statistics and
vocabulary-growth profiling.

- ``events_value_gini``: exact Gini coefficient of per-user total event
  value — the concentration summary a platform reports next to the
  heavy-hitter lists (``docs_heavy_tokens``) and the skew detector that
  justifies the salted paths (stages/salted.py): Gini ≈ 1 means a few
  whales carry the mass and every per-user stage needs the hot-key
  handling. Formula ``G = (2·Σ rank·v − (n+1)·Σv) / (n·Σv)`` over the
  value-ascending total order.
- ``events_lorenz_deciles``: the Lorenz curve behind that Gini at
  decile resolution — users NTILE(10)'d by total value ascending, with
  each decile's user count, value mass, and cumulative share ("bottom
  70% of users produce 12% of value"). The distribution-shape readout
  for sampling/mixture design (``docs_mixture_budget``'s per-user
  analog).
- ``docs_heaps_vocab``: Heaps'-law vocabulary growth — distinct-token
  count after each decile of the corpus in ``doc_id`` order. The
  dedup/diversity diagnostic for training corpora: a flattening curve
  means new documents stop contributing new vocabulary (saturation /
  duplication); reference analog: the corpus-level profiling the
  medallion gold layer feeds to dataset curation.

Scale shapes:

- Gini/Lorenz: per-user totals via per-batch segment partials + the
  exact keyed fold (user-cardinality-bounded, one exchange); ONE
  range-partitioned sort ranks the totals (``with_global_rank`` — the
  engine's distributed row_number), each sorted block collapses to O(1)
  (Gini) / O(10) (Lorenz) integer partials, and the closed form runs on
  ≤10 rows. Driver traffic is O(#blocks).
- Heaps: token → min(doc_id) is ONE vocabulary-keyed exchange (the PMI
  plan's shape); first-occurrence rows collapse to O(10) per-decile
  counts inside each partition, so the final fold moves
  O(10 × partitions) rows. Total doc count comes from Parquet footer
  metadata, never a data scan.

All cores are integer-exact (cents, counts, ranks); the only float ops
are the final divisions, mirrored operand-for-operand in the DuckDB
twins and rounded half-away on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as T
from ..functions import windows as W
from ..functions.numeric import round6, round_half_away
from ..sources.reads import read_parquet_sized
from ..stages.keyed import fold_by_keys, map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

GINI_HEADROOM = 1 << 62


def _cents(val: np.ndarray) -> np.ndarray:
    return round_half_away(np.asarray(val, dtype=np.float64) * 100.0).astype(
        np.int64
    )


def _per_user_value_cents(sf_dir: str):
    """Per-user total event value in integer cents: per-batch segment
    partials (sorted ``reduceat``) then the exact keyed fold — the same
    two-step plan as ``events_ratio_ci``'s per-user moments. NULL values
    are dropped on both sides (SQL ``sum`` ignores them); users with
    only-NULL values therefore don't appear."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def user_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        mask = pc.is_valid(t["value"])
        if pc.any(pc.invert(mask)).as_py():
            t = t.filter(mask)
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks().cast(pa.int64()))
        c = _cents(np.asarray(t["value"].combine_chunks()))
        o = np.argsort(uid, kind="stable")
        starts, _e, _ln = W.segment_bounds(uid[o])
        return pa.table(
            {
                "user_id": pa.array(uid[o][starts]),
                "v": pa.array(np.add.reduceat(c[o], starts)),
            }
        )

    return fold_by_keys(
        ds.map_batches(user_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"],
        sums=("v",),
        num_parts=NUM_PARTS,
    )


PER_USER_CENTS_CTE = """u AS (
    SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL GROUP BY 1
)"""


# ---------------------------------------------------------------------------
# events_value_gini — exact Gini coefficient of per-user value totals
# ---------------------------------------------------------------------------

def q_events_value_gini(sf_dir: str):
    """One row: ``(n_users, total_cents, gini)`` where gini is the exact
    rank formulation ``(2·S1 − (n+1)·S0) / (n·S0)`` with
    ``S1 = Σ rank·v`` over the (v, user_id)-ascending total order.

    Ties in v permute only equal values, so S1 — and the Gini — is
    invariant to tie order; the user_id tiebreak just makes the rank
    column itself deterministic. Each sorted block emits ONE partial row
    (rows, Σv, Σ rank·v), a single tiny fold sums them, and the closed
    form is two float ops mirrored in the SQL twin."""
    from ray.data.aggregate import Sum

    from ..stages.globalorder import with_global_rank

    ranked = with_global_rank(
        _per_user_value_cents(sf_dir),
        ["v", "user_id"],
        descending=[False, False],
        rank_col="rk",
    )

    def block_partial(t: pa.Table) -> pa.Table:
        cols = ["g", "pn", "ps0", "ps1"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        v = np.asarray(t["v"].combine_chunks())
        rk = np.asarray(t["rk"].combine_chunks())
        # rank·value stays in int64 on the fast path; whale blocks fall
        # back to Python-int exactness, and the partial itself is guarded
        if len(v) and (
            float(rk.max()) * max(float(np.abs(v).max()), 1.0) * len(v)
            < float(GINI_HEADROOM)
        ):
            s1 = int(np.dot(rk, v))
        else:
            s1 = sum(int(r) * int(x) for r, x in zip(rk.tolist(), v.tolist()))
        s0 = int(v.sum())
        if abs(s1) >= GINI_HEADROOM or abs(s0) >= GINI_HEADROOM:
            raise OverflowError(
                "value_gini: block partial exceeds int64 fold headroom — "
                "shrink the metric unit"
            )
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "pn": pa.array([t.num_rows], pa.int64()),
                "ps0": pa.array([s0], pa.int64()),
                "ps1": pa.array([s1], pa.int64()),
            }
        )

    folded = (
        ranked.map_batches(block_partial, batch_size=None,
                           batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("ps0", alias_name="s0"),
            Sum("ps1", alias_name="s1"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_users": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64()),
                "gini": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        n = int(t["n"][0].as_py())
        s0 = int(t["s0"][0].as_py())
        s1 = int(t["s1"][0].as_py())
        gini = round6(
            np.array([(2.0 * s1 - (n + 1.0) * s0) / ((1.0 * n) * s0)])
        )
        return pa.table(
            {
                "n_users": pa.array([n], pa.int64()),
                "total_cents": pa.array([s0], pa.int64()),
                "gini": pa.array(gini, pa.float64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


EVENTS_VALUE_GINI_SQL = f"""
WITH {PER_USER_CENTS_CTE},
r AS (SELECT v, row_number() OVER (ORDER BY v, user_id) AS rk FROM u),
s AS (SELECT count(*)::BIGINT AS n, CAST(sum(v) AS BIGINT) AS s0,
             CAST(sum(rk * v) AS BIGINT) AS s1
      FROM r)
SELECT n AS n_users, s0 AS total_cents,
       ROUND((2.0 * s1 - (n + 1.0) * s0) / ((1.0 * n) * s0), 6) AS gini
FROM s WHERE n > 0
"""


# ---------------------------------------------------------------------------
# events_lorenz_deciles — cumulative value share by user value decile
# ---------------------------------------------------------------------------

def q_events_lorenz_deciles(sf_dir: str):
    """Ten rows (fewer iff < 10 users): users NTILE(10)'d by total value
    ascending; per decile the user count, value mass (cents), and the
    cumulative share of total value — the Lorenz curve under
    ``events_value_gini``.

    The per-user table is materialized once (user-cardinality-bounded)
    so its count can parameterize the exact ANSI tile-size arithmetic;
    after the same global rank, each block collapses to ≤10 partial rows
    and the cumulative share is computed on the ≤10-row result
    driver-side (like ``events_survival_hazard``'s day table)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..stages.globalorder import with_global_rank

    per_user = _per_user_value_cents(sf_dir).materialize()
    n = per_user.count()
    if n == 0:
        return pd.DataFrame(
            {
                "decile": pd.Series([], dtype="int64"),
                "users": pd.Series([], dtype="int64"),
                "value_cents": pd.Series([], dtype="int64"),
                "cum_share": pd.Series([], dtype="float64"),
            }
        )
    ranked = with_global_rank(
        per_user, ["v", "user_id"], descending=[False, False], rank_col="rk"
    )
    q_, r_ = divmod(n, 10)
    big = r_ * (q_ + 1)  # rows covered by the (q+1)-sized leading tiles

    def tile_partial(t: pa.Table) -> pa.Table:
        cols = ["decile", "pu", "pv"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        v = np.asarray(t["v"].combine_chunks())
        pos = np.asarray(t["rk"].combine_chunks()) - 1
        tile = (
            np.where(pos < big, pos // (q_ + 1),
                     r_ + (pos - big) // max(q_, 1))
            + 1
        )
        uniq, inv = np.unique(tile, return_inverse=True)
        pu = np.bincount(inv).astype(np.int64)
        pv = np.zeros(len(uniq), np.int64)
        np.add.at(pv, inv, v)
        return pa.table(
            {
                "decile": pa.array(uniq, pa.int64()),
                "pu": pa.array(pu),
                "pv": pa.array(pv),
            }
        )

    folded = (
        ranked.map_batches(tile_partial, batch_size=None,
                           batch_format="pyarrow", zero_copy_batch=True)
        .groupby("decile")
        .aggregate(
            Sum("pu", alias_name="users"), Sum("pv", alias_name="value_cents")
        )
    )
    df = folded.to_pandas().sort_values("decile", ignore_index=True)
    cents = df["value_cents"].to_numpy(np.int64)
    s0 = int(cents.sum())
    cum = np.cumsum(cents)
    return pd.DataFrame(
        {
            "decile": df["decile"].to_numpy(np.int64),
            "users": df["users"].to_numpy(np.int64),
            "value_cents": cents,
            "cum_share": round6(cum / (1.0 * s0)),
        }
    )


EVENTS_LORENZ_SQL = f"""
WITH {PER_USER_CENTS_CTE},
r AS (SELECT v, ntile(10) OVER (ORDER BY v, user_id) AS decile FROM u),
d AS (SELECT decile, count(*)::BIGINT AS users,
             CAST(sum(v) AS BIGINT) AS value_cents
      FROM r GROUP BY 1),
t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS s0 FROM d)
SELECT decile, users, value_cents,
       ROUND(CAST(SUM(value_cents) OVER (ORDER BY decile) AS BIGINT)
             / (1.0 * t.s0), 6) AS cum_share
FROM d CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# docs_heaps_vocab — vocabulary growth over the corpus in doc_id order
# ---------------------------------------------------------------------------

def q_docs_heaps_vocab(sf_dir: str):
    """Ten rows: after each decile of the corpus (docs in ``doc_id``
    order — the dense 0..n-1 ingest order of the fixture), how many
    docs have been seen, the cumulative distinct-token vocabulary, and
    the decile's newly-introduced token count.

    A token's contribution is fully determined by its FIRST document,
    so the whole curve reduces to ``min(doc_id) per token`` — one
    vocabulary-keyed exchange with factorize + ``minimum.at`` partials —
    followed by a 10-bucket histogram of first-occurrence deciles.
    Checkpoint boundaries use pure integer arithmetic
    (``decile = fd*10 // n + 1``, ``docs_seen = (n*c + 9) // 10``)
    mirrored exactly by DuckDB ``//``; the doc count comes from the
    Parquet footer (metadata only, no scan)."""
    import pandas as pd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/documents.parquet"
    n_docs = pq.ParquetFile(path).metadata.num_rows
    if n_docs == 0:
        return pd.DataFrame(
            {
                "decile": pd.Series([], dtype="int64"),
                "docs_seen": pd.Series([], dtype="int64"),
                "vocab_size": pd.Series([], dtype="int64"),
                "new_tokens": pd.Series([], dtype="int64"),
            }
        )
    ds = read_parquet_sized(path, columns=["doc_id", "text"])

    def token_first_doc(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w": pa.array([], pa.string()),
                "fd": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        import pandas as pd

        toks = T.tokens_list(t["text"])
        counts = pc.list_value_length(toks).fill_null(0)
        did = np.repeat(
            np.asarray(t["doc_id"].combine_chunks().cast(pa.int64())),
            np.asarray(counts.cast(pa.int64())),
        )
        flat = np.asarray(toks.flatten().cast(pa.large_string()))
        if len(flat) == 0:
            return empty
        inv, uniq = pd.factorize(flat)
        fd = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(fd, inv, did)
        return pa.table(
            {
                "w": pa.array(uniq).cast(pa.string()),
                "fd": pa.array(fd, pa.int64()),
            }
        )

    partials = ds.map_batches(
        token_first_doc, batch_format="pyarrow", zero_copy_batch=True
    )

    def min_fold(part: pa.Table) -> pa.Table:
        # vocabulary-keyed exchange owns each token wholly: fold to the
        # global first doc, then collapse to per-decile counts so only
        # O(10) rows leave the partition
        if part.num_rows == 0:
            return pa.table(
                {
                    "decile": pa.array([], pa.int64()),
                    "pn": pa.array([], pa.int64()),
                }
            )
        import pandas as pd

        w = np.asarray(part["w"].combine_chunks().cast(pa.large_string()))
        fd = np.asarray(part["fd"].combine_chunks())
        inv, uniq = pd.factorize(w)
        first = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, inv, fd)
        dec = first * 10 // n_docs + 1
        du, dinv = np.unique(dec, return_inverse=True)
        return pa.table(
            {
                "decile": pa.array(du, pa.int64()),
                "pn": pa.array(np.bincount(dinv).astype(np.int64)),
            }
        )

    folded = (
        map_partitions_by_key(partials, "w", min_fold, num_parts=NUM_PARTS)
        .groupby("decile")
        .aggregate(Sum("pn", alias_name="new_tokens"))
    )
    df = folded.to_pandas()
    by_dec = dict(
        zip(df["decile"].astype(np.int64), df["new_tokens"].astype(np.int64))
    )
    dec = np.arange(1, 11, dtype=np.int64)
    new = np.array([by_dec.get(int(c), 0) for c in dec], np.int64)
    return pd.DataFrame(
        {
            "decile": dec,
            "docs_seen": (n_docs * dec + 9) // 10,
            "vocab_size": np.cumsum(new),
            "new_tokens": new,
        }
    )


DOCS_HEAPS_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
f AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY 1),
nd AS (SELECT count(*)::BIGINT AS n FROM documents),
b AS (
    SELECT fd * 10 // nd.n + 1 AS decile, count(*)::BIGINT AS pn
    FROM f CROSS JOIN nd GROUP BY 1
),
g AS (SELECT unnest(generate_series(1, 10)) AS decile),
j AS (
    SELECT g.decile, COALESCE(b.pn, 0)::BIGINT AS new_tokens
    FROM g LEFT JOIN b USING (decile)
)
SELECT j.decile,
       (nd.n * j.decile + 9) // 10 AS docs_seen,
       CAST(SUM(j.new_tokens) OVER (ORDER BY j.decile) AS BIGINT)
           AS vocab_size,
       j.new_tokens
FROM j CROSS JOIN nd
"""


REGISTRY: dict[str, tuple] = {
    "events_value_gini": (q_events_value_gini, EVENTS_VALUE_GINI_SQL),
    "events_lorenz_deciles": (q_events_lorenz_deciles, EVENTS_LORENZ_SQL),
    "docs_heaps_vocab": (q_docs_heaps_vocab, DOCS_HEAPS_SQL),
}

"""Round-5 operator additions, batch 5 (oracle-exact, DuckDB twins).

- ``docs_cross_source_dup_matrix`` — dedup PROVENANCE: for every source
  pair, the number of exact-duplicate text pairs spanning them (which
  feeds mirror/scraper detection) — per-text-group source-count
  partials, never a pair join.
- ``events_daily_volume_anomalies`` — days whose event volume deviates
  from the median by > 3·MAD (shared robust kernel; integer-exact).
- ``conv_gap_quantiles``   — per conversation (≥2 turns): exact p50/p90
  inter-turn gap seconds (quantile_disc semantics) — the long-tail
  stall signal per conversation.
- ``events_peak_hour``     — per event type: the busiest UTC hour
  (deterministic smallest-hour tie-break) with its count — fixed
  |types|·24 partial domain, pure streaming.

Reference provenance: extends spark_jobs/silver_and_gold.py:86-131
aggregates toward curation/observability per the north rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized
from ..sources.transcripts import (
    TRANSCRIPTS_SQL_CTE,
    read_events_as_transcripts,
)
from ..stages.keyed import map_partitions_by_key

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts

_US = 1_000_000


# ---------------------------------------------------------------------------
# docs_cross_source_dup_matrix — dedup provenance across sources
# ---------------------------------------------------------------------------

DUPMAT_K = 80


def q_docs_cross_source_dup_matrix(sf_dir: str):
    """Dedup provenance matrix: for every (source_a <= source_b) pair,
    the number of DOCUMENT PAIRS sharing the same {DUPMAT_K}-char text
    head (the truncation-dup cohort key of stages/prefixdup.py) whose
    two members come from those sources — c_a·c_b across sources,
    C(c_a, 2) within one — computed from per-key-group source counts
    inside ONE key-hash-keyed exchange (the pair counts are arithmetic
    on group partials, never an expanded pair join). Only pairs with
    ≥1 dup pair are emitted (matching the twin's join)."""
    from ray.data.aggregate import Sum

    from ..stages.ppjoin import hash_grams

    def keyed(t: pa.Table) -> pa.Table:
        pk = pc.utf8_slice_codeunits(
            t["text"].combine_chunks(), 0, DUPMAT_K
        )
        return pa.table(
            {
                "th": pa.array(hash_grams(pk), pa.int64()),
                "text": pk,
                "source": t["source"],
            }
        )

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    ).map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)

    def pair_partials(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {"source_a": pa.array([], pa.string()),
             "source_b": pa.array([], pa.string()),
             "pc_": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        import pandas as pd

        text = np.asarray(part["text"].combine_chunks(), dtype=object)
        src = np.asarray(part["source"].combine_chunks(), dtype=object)
        ginv, _g = pd.factorize(text)  # exact text groups
        sinv, suniq = pd.factorize(src)
        k = len(_g)
        s = len(suniq)
        # per-(group, source) counts
        cnt = np.zeros((k, s), dtype=np.int64)
        np.add.at(cnt, (ginv, sinv), 1)
        order = np.argsort(suniq.astype(str))
        suniq_sorted = suniq[order].astype(str)
        cnt = cnt[:, order]
        # one Gram matmul: cross totals = G[i,j], within = (G[i,i]-c_i)/2
        G = cnt.T @ cnt
        csum = cnt.sum(axis=0)
        rows_a, rows_b, rows_c = [], [], []
        for i in range(s):
            within = int((G[i, i] - csum[i]) // 2)
            if within:
                rows_a.append(suniq_sorted[i])
                rows_b.append(suniq_sorted[i])
                rows_c.append(within)
            for j in range(i + 1, s):
                if G[i, j]:
                    rows_a.append(suniq_sorted[i])
                    rows_b.append(suniq_sorted[j])
                    rows_c.append(int(G[i, j]))
        return pa.table(
            {
                "source_a": pa.array(rows_a, pa.string()),
                "source_b": pa.array(rows_b, pa.string()),
                "pc_": pa.array(np.array(rows_c, np.int64), pa.int64()),
            }
        )

    partials = map_partitions_by_key(docs, "th", pair_partials,
                                     num_parts=NUM_PARTS)
    return (
        partials.groupby(["source_a", "source_b"])
        .aggregate(Sum("pc_", alias_name="n_dup_pairs"))
    )


DOCS_CROSS_SOURCE_SQL = f"""
SELECT LEAST(a.source, b.source) AS source_a,
       GREATEST(a.source, b.source) AS source_b,
       COUNT(*)::BIGINT AS n_dup_pairs
FROM documents a
JOIN documents b
  ON substr(b.text, 1, {DUPMAT_K}) = substr(a.text, 1, {DUPMAT_K})
 AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# events_daily_volume_anomalies — robust daily-volume outliers
# ---------------------------------------------------------------------------

VOL_MAD_K = 3


def q_events_daily_volume_anomalies(sf_dir: str):
    """Per day: event count plus a flag when |count − median| >
    {VOL_MAD_K}·MAD over all days (quantile_disc semantics, shared
    robust kernel). Day counts are a fixed-small relation (streaming
    per-batch partials → tiny fold); the MAD pass runs on ≤ #days
    rows."""
    from ray.data.aggregate import Sum

    from ..functions.robust import mad_outlier_flags
    from .queries_r5a import _ev

    ds = _ev(sf_dir, columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        days = ts.astype("datetime64[us]").astype("datetime64[D]")
        dstr = np.datetime_as_string(days, unit="D").astype(object)
        inv, uniq = pd.factorize(dstr)
        return pa.table(
            {
                "day": pa.array(uniq.astype(str), pa.string()),
                "c": pa.array(np.bincount(inv).astype(np.int64),
                              pa.int64()),
            }
        )

    folded = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("day").aggregate(Sum("c", alias_name="n_events"))

    def flags(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"day": pa.array([], pa.string()),
                 "n_events": pa.array([], pa.int64()),
                 "is_anomaly": pa.array([], pa.int64())}
            )
        day = np.asarray(t["day"].combine_chunks(), dtype=object)
        c = np.asarray(t["n_events"].combine_chunks()).astype(np.int64)
        one = np.zeros(len(day), dtype=np.int64)  # single group
        order, flag = mad_outlier_flags(one, c, VOL_MAD_K)
        return pa.table(
            {
                "day": pa.array(day[order].astype(str), pa.string()),
                "n_events": pa.array(c[order], pa.int64()),
                "is_anomaly": pa.array(flag.astype(np.int64), pa.int64()),
            }
        )

    # the folded relation is ≤ #days rows — one block, one flags pass
    return folded.repartition(1).map_batches(
        flags, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


EVENTS_DAILY_ANOMALY_SQL = f"""
WITH g AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*)::BIGINT AS n_events
    FROM events GROUP BY 1
),
med AS (SELECT quantile_disc(n_events, 0.5) AS med FROM g),
mad AS (
    SELECT quantile_disc(abs(n_events - (SELECT med FROM med)), 0.5)
        AS mad
    FROM g
)
SELECT day, n_events,
       CAST(abs(n_events - (SELECT med FROM med))
            > {VOL_MAD_K} * (SELECT mad FROM mad) AS BIGINT) AS is_anomaly
FROM g
"""


# ---------------------------------------------------------------------------
# conv_gap_quantiles — per-conversation inter-turn-gap percentiles
# ---------------------------------------------------------------------------

def q_conv_gap_quantiles(sf_dir: str):
    """Per conversation with ≥2 turns: exact p50 and p90 of the
    inter-turn gap in whole seconds ((ts, event_id) order,
    quantile_disc index = ceil(n·q)−1). ONE keyed exchange, segmented
    diff, per-group sorted selection."""
    from .queries import _conv_order

    ds = read_events_as_transcripts(sf_dir)

    def part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"conv_id": pa.array([], pa.string()),
             "n_gaps": pa.array([], pa.int64()),
             "p50_gap_s": pa.array([], pa.int64()),
             "p90_gap_s": pa.array([], pa.int64())}
        )
        if tbl.num_rows == 0:
            return empty
        order, k, ts, seg_start = _conv_order(tbl)
        conv = np.asarray(
            tbl["conv_id"].combine_chunks().take(pa.array(order)),
            dtype=object,
        )
        n = len(k)
        same = ~seg_start
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = (ts[1:] - ts[:-1]) // _US
        gk = k[same]
        gv = gap[same]
        gc = conv[same]
        if len(gk) == 0:
            return empty
        order2 = np.lexsort((gv, gk))
        gk_s, gv_s = gk[order2], gv[order2]
        gc_s = gc[order2]
        seg2 = np.concatenate(([True], gk_s[1:] != gk_s[:-1]))
        starts = np.flatnonzero(seg2)
        ends = np.concatenate((starts[1:], [len(gk_s)]))
        cnt = ends - starts

        def at_q(num: int, den: int) -> np.ndarray:
            idx = -((-cnt * num) // den) - 1  # ceil(n*q) - 1
            return gv_s[starts + idx]

        return pa.table(
            {
                "conv_id": pa.array(gc_s[starts].astype(str), pa.string()),
                "n_gaps": pa.array(cnt.astype(np.int64), pa.int64()),
                "p50_gap_s": pa.array(at_q(1, 2), pa.int64()),
                "p90_gap_s": pa.array(at_q(9, 10), pa.int64()),
            }
        )

    return map_partitions_by_key(ds, "conv_id", part, num_parts=NUM_PARTS)


CONV_GAP_QUANTILES_SQL = f"""
WITH {TRANSCRIPTS_SQL_CTE},
g AS (
    SELECT conv_id,
           (epoch_us(ts) - epoch_us(lag(ts)
                OVER (PARTITION BY conv_id ORDER BY ts, event_id)))
               // 1000000 AS gap
    FROM transcripts
)
SELECT conv_id, COUNT(gap)::BIGINT AS n_gaps,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_gap_s,
       CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p90_gap_s
FROM g WHERE gap IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# events_peak_hour — busiest hour per type
# ---------------------------------------------------------------------------

def q_events_peak_hour(sf_dir: str):
    """Per event type: the UTC hour with the most events (smallest hour
    wins ties) and its count. Streaming (type × 24)-domain partials;
    the argmax is a ≤|types|·24-row fold."""
    from ray.data.aggregate import Sum

    from .queries_r5a import _ev

    ds = _ev(sf_dir, columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        et = np.asarray(t["event_type"].combine_chunks(), dtype=object)
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        hour = (ts // (3600 * _US)) % 24
        key = np.char.add(np.char.add(et.astype(str), "\x1f"),
                          hour.astype(str))
        inv, uniq = pd.factorize(key)
        first = np.zeros(len(uniq), np.int64)
        first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        return pa.table(
            {
                "event_type": pa.array(et[first].astype(str), pa.string()),
                "hour": pa.array(hour[first], pa.int64()),
                "c": pa.array(np.bincount(inv).astype(np.int64),
                              pa.int64()),
            }
        )

    folded = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["event_type", "hour"]).aggregate(Sum("c", alias_name="n"))

    import ray
    import ray.data as rd

    tbls = [t for t in ray.get(folded.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return rd.from_arrow(
            pa.table(
                {"event_type": pa.array([], pa.string()),
                 "peak_hour": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64())}
            )
        )
    allt = pa.concat_tables(tbls)  # ≤ |types| x 24 rows
    et = np.asarray(allt["event_type"].combine_chunks(), dtype=object)
    hr = np.asarray(allt["hour"].combine_chunks())
    n = np.asarray(allt["n"].combine_chunks()).astype(np.int64)
    order = np.lexsort((hr, -n, et.astype(str)))
    et_s, hr_s, n_s = et[order], hr[order], n[order]
    first = np.concatenate(([True], et_s[1:] != et_s[:-1]))
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(et_s[first].astype(str),
                                       pa.string()),
                "peak_hour": pa.array(hr_s[first], pa.int64()),
                "n_events": pa.array(n_s[first], pa.int64()),
            }
        )
    )


EVENTS_PEAK_HOUR_SQL = """
WITH g AS (
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           COUNT(*)::BIGINT AS n
    FROM events GROUP BY 1, 2
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY n DESC, hour) AS rn
    FROM g
)
SELECT event_type, hour AS peak_hour, n AS n_events
FROM r WHERE rn = 1
"""


REGISTRY: dict[str, tuple] = {
    "docs_cross_source_dup_matrix": (
        q_docs_cross_source_dup_matrix,
        DOCS_CROSS_SOURCE_SQL,
    ),
    "events_daily_volume_anomalies": (
        q_events_daily_volume_anomalies,
        EVENTS_DAILY_ANOMALY_SQL,
    ),
    "conv_gap_quantiles": (q_conv_gap_quantiles, CONV_GAP_QUANTILES_SQL),
    "events_peak_hour": (q_events_peak_hour, EVENTS_PEAK_HOUR_SQL),
}

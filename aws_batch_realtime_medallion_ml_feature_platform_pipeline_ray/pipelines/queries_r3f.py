"""Round-3 batch F: robust trend statistics over the daily series —
Theil–Sen slope (median of pairwise slopes), the Mann–Kendall trend
test (integer-exact S and tau), and a first-harmonic diurnal fit.

All three fold the stream to a calendar-bounded series distributed
(per-batch integer-cent partials → tiny groupby), then finish on
O(days) / O(days²-pairs) / O(24) rows — the bounded-finale shape
(events_xcorr_lagged precedent). Float policy: integer arithmetic
everywhere except the documented final expressions, which use the
identical IEEE tree on both engines + ROUND6."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.reads import read_parquet_sized

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


def _daily_cents(sf_dir: str):
    """Distributed daily revenue-cents fold (shared by this module)."""
    from ray.data.aggregate import Sum

    from ..functions.numeric import round_half_away

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "p_cents": pa.array([], pa.int64()),
                }
            )
        day = (
            np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
            // 86_400_000_000
        )
        cents = round_half_away(
            np.asarray(t["value"].combine_chunks()) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {"day": pa.array(u, pa.int64()), "p_cents": pa.array(s)}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("p_cents", alias_name="cents"))
        .to_pandas()  # O(days): calendar-bounded
        .sort_values("day", ignore_index=True)
    )


# ---------------------------------------------------------------------------
# events_theil_sen — robust (median-of-slopes) trend estimate
# ---------------------------------------------------------------------------


def q_events_theil_sen(sf_dir: str):
    """Theil–Sen slope of the daily revenue series: the MEDIAN of all
    pairwise slopes ``(x_j − x_i) / (d_j − d_i)`` — breakdown point
    ~29 %, so a few outlier days cannot drag the trend the way they
    drag the OLS fit (events_ols_trend). Also emits the Theil–Sen
    intercept (median of ``x_i − slope·d_i``, slope fixed first) and
    the pair count.

    The pair set is O(days²) over a CALENDAR-bounded axis (~30 days →
    ~435 pairs), so the median runs on the driver; the data-scaled work
    is the distributed daily fold."""
    from ..functions.numeric import round6

    daily = _daily_cents(sf_dir)
    n = len(daily)
    if n < 2:
        return pa.table(
            {
                "n_days": pa.array([n], pa.int64()),
                "n_pairs": pa.array([0], pa.int64()),
                "slope": pa.array([None], pa.float64()),
                "intercept": pa.array([None], pa.float64()),
            }
        )
    d = daily["day"].to_numpy(np.int64)
    x = daily["cents"].to_numpy(np.int64).astype(np.float64) / 100.0
    ii, jj = np.triu_indices(n, k=1)
    slopes = (x[jj] - x[ii]) / (d[jj] - d[ii]).astype(np.float64)
    slope = float(np.median(slopes))
    resid = x - slope * d.astype(np.float64)
    intercept = float(np.median(resid))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "n_pairs": pa.array([len(slopes)], pa.int64()),
            "slope": pa.array([float(round6(np.array([slope]))[0])]),
            "intercept": pa.array(
                [float(round6(np.array([intercept]))[0])]
            ),
        }
    )


EVENTS_THEIL_SEN_SQL = """
WITH d AS (
    SELECT epoch_us(ts) // 86400000000 AS day,
           CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS x
    FROM events GROUP BY 1
),
p AS (
    SELECT (b.x - a.x) / (b.day - a.day) AS s
    FROM d a JOIN d b ON b.day > a.day
),
sl AS (SELECT median(s) AS slope FROM p),
r AS (SELECT x - (SELECT slope FROM sl) * day AS resid FROM d)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_pairs,
       ROUND((SELECT slope FROM sl), 6) AS slope,
       ROUND(median(resid), 6) AS intercept
FROM r
"""


# ---------------------------------------------------------------------------
# events_mann_kendall — integer-exact monotone-trend test
# ---------------------------------------------------------------------------


def q_events_mann_kendall(sf_dir: str):
    """Mann–Kendall S statistic and Kendall tau of the daily revenue
    series: ``S = Σ_{i<j} sign(x_j − x_i)`` (pure integers — bit-exact)
    and ``tau = S / (n(n−1)/2)`` — the nonparametric monotone-trend
    test that pairs with the Theil–Sen slope."""
    from ..functions.numeric import round6

    daily = _daily_cents(sf_dir)
    n = len(daily)
    if n < 2:
        return pa.table(
            {
                "n_days": pa.array([n], pa.int64()),
                "s_stat": pa.array([0], pa.int64()),
                "tau": pa.array([None], pa.float64()),
            }
        )
    x = daily["cents"].to_numpy(np.int64)
    ii, jj = np.triu_indices(n, k=1)
    s = int(np.sign(x[jj] - x[ii]).astype(np.int64).sum())
    tau = float(round6(np.array([s / (n * (n - 1) / 2.0)]))[0])
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "s_stat": pa.array([s], pa.int64()),
            "tau": pa.array([tau], pa.float64()),
        }
    )


EVENTS_MANN_KENDALL_SQL = """
WITH d AS (
    SELECT epoch_us(ts) // 86400000000 AS day,
           CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
    FROM events GROUP BY 1
),
p AS (
    SELECT CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END
               AS sg
    FROM d a JOIN d b ON b.day > a.day
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
SELECT (SELECT n FROM nn) AS n_days,
       CAST(coalesce(sum(sg), 0) AS BIGINT) AS s_stat,
       ROUND(CAST(coalesce(sum(sg), 0) AS DOUBLE)
             / ((SELECT n FROM nn) * ((SELECT n FROM nn) - 1) / 2.0), 6)
           AS tau
FROM p
"""


# ---------------------------------------------------------------------------
# events_diurnal_harmonic — first-harmonic fit of the hour-of-day profile
# ---------------------------------------------------------------------------


def q_events_diurnal_harmonic(sf_dir: str):
    """First-harmonic (24 h period) least-squares fit of the
    hour-of-day event-count profile: with hourly counts ``c_h``,
    ``a = (2/24)·Σ c_h·cos(2πh/24)``, ``b = (2/24)·Σ c_h·sin(2πh/24)``,
    amplitude ``sqrt(a²+b²)`` and mesor (mean) — the compact diurnal
    seasonality descriptor (cosinor analysis). Exact integer hourly
    counts; the trig sums use the identical IEEE expression both
    engines + ROUND6.

    Plan: per-batch hour-of-day partials (24 cells per block) → one
    24-row fold → O(24) driver finale."""
    from ray.data.aggregate import Sum

    from ..functions.numeric import round6

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "hour": pa.array([], pa.int64()),
                    "p_n": pa.array([], pa.int64()),
                }
            )
        us = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        hour = (us // 3_600_000_000) % 24
        u, cnt = np.unique(hour, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(u, pa.int64()),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hour")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()  # O(24)
        .sort_values("hour", ignore_index=True)
    )
    c = np.zeros(24, np.int64)
    c[hourly["hour"].to_numpy(np.int64)] = hourly["n"].to_numpy(np.int64)
    h = np.arange(24, dtype=np.float64)
    ang = 2.0 * math.pi * h / 24.0
    a = (2.0 / 24.0) * float((c * np.cos(ang)).sum())
    b = (2.0 / 24.0) * float((c * np.sin(ang)).sum())
    amp = math.sqrt(a * a + b * b)
    mesor = float(c.sum()) / 24.0
    from ..functions.numeric import round6 as _r6

    r = lambda v: float(_r6(np.array([v]))[0])  # noqa: E731
    return pa.table(
        {
            "n_events": pa.array([int(c.sum())], pa.int64()),
            "mesor": pa.array([r(mesor)], pa.float64()),
            "cos_coef": pa.array([r(a)], pa.float64()),
            "sin_coef": pa.array([r(b)], pa.float64()),
            "amplitude": pa.array([r(amp)], pa.float64()),
        }
    )


EVENTS_DIURNAL_SQL = """
WITH hcnt AS (
    SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
),
s AS (
    SELECT
        CAST(sum(n) AS BIGINT) AS total,
        (2.0 / 24.0) * sum(n * cos(2.0 * pi() * hour / 24.0)) AS a,
        (2.0 / 24.0) * sum(n * sin(2.0 * pi() * hour / 24.0)) AS b
    FROM hcnt
)
SELECT total AS n_events,
       ROUND(CAST(total AS DOUBLE) / 24.0, 6) AS mesor,
       ROUND(a, 6) AS cos_coef,
       ROUND(b, 6) AS sin_coef,
       ROUND(sqrt(a * a + b * b), 6) AS amplitude
FROM s
"""


REGISTRY: dict[str, tuple] = {
    "events_theil_sen": (q_events_theil_sen, EVENTS_THEIL_SEN_SQL),
    "events_mann_kendall": (q_events_mann_kendall, EVENTS_MANN_KENDALL_SQL),
    "events_diurnal_harmonic": (
        q_events_diurnal_harmonic,
        EVENTS_DIURNAL_SQL,
    ),
}

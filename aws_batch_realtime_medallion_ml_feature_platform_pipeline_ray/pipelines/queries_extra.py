"""Training-data curation operators beyond the reference's inventory:
deterministic stratified sampling, near-dup removal (anti-join against an
LSH/Jaccard removal list), grouped top-k, exact distributed quantiles via
bounded-cardinality histograms, pivot aggregation, and a broadcast range
(interval) join. Every operator here has an exact DuckDB twin.

Scale notes are per-operator; the common theme is that each one either
streams with zero shuffles (sampling, pivot partials, range-join probe)
or pushes a partial/combiner into ``map_batches`` so the one shuffle that
remains moves only partition-sized summaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import token_count
from ..stages.keyed import map_partitions_by_key
from .queries_relational import splitmix64_bucket_sql
from .queries_text import DOCS_NGRAM_JACCARD_SQL
from ..functions.numeric import round6, round_half_away

NUM_PARTS = None  # derived: stages/keyed.derive_num_parts


def _docs(sf_dir: str, columns=None):
    from ..sources.reads import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/documents.parquet", columns=columns)


# --------------------------------------------------------------------------
# Deterministic stratified sampling
# --------------------------------------------------------------------------

SAMPLE_SALT = 7
# per-language keep rates (percent) — the classic corpus-rebalancing
# downsample: abundant languages sampled harder, everything else kept
SAMPLE_RATES: dict[str, int] = {"en": 10, "fr": 25, "de": 25, "es": 25, "zh": 25}
SAMPLE_DEFAULT_RATE = 100


def stratified_keep(ids: np.ndarray, langs: pa.Array) -> np.ndarray:
    """Keep mask: splitmix64(doc_id + salt) % 100 < rate[lang].

    Hash-deterministic sampling (not RNG): stable under any partitioning,
    parallelism, or re-run — the property Spark's randomSplit lacks — and
    needs zero coordination, so it composes with any upstream stage.
    """
    from ..stages.keyed import splitmix64

    bucket = splitmix64(ids.astype(np.uint64) + np.uint64(SAMPLE_SALT)) % np.uint64(100)
    rate = np.full(len(ids), SAMPLE_DEFAULT_RATE, dtype=np.uint64)
    for lang, r in SAMPLE_RATES.items():
        rate[np.asarray(pc.equal(langs, lang)).astype(bool)] = r
    return bucket < rate


def q_docs_sample_stratified(sf_dir: str):
    """Stratified downsample of the documents corpus: per-language keep
    rates via a deterministic splitmix64 bucket. Pure streaming filter —
    no shuffle, no state; at 100 TB this runs at read speed."""
    ds = _docs(sf_dir, columns=["doc_id", "lang", "source", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks())
        keep = stratified_keep(ids, t["lang"].combine_chunks())
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_RATE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items()
)

DOCS_SAMPLE_STRATIFIED_SQL = f"""
WITH {splitmix64_bucket_sql('doc_id', 'documents', SAMPLE_SALT)}
SELECT doc_id, lang, source, n_chars
FROM __s5
WHERE __bucket < (CASE {_RATE_CASE} ELSE {SAMPLE_DEFAULT_RATE} END)
"""


# --------------------------------------------------------------------------
# Length-weighted deterministic sampling
# --------------------------------------------------------------------------

WEIGHTED_SALT = 11
WEIGHT_DIV = 50  # keep-rate percent = min(n_chars // WEIGHT_DIV, 100)


def q_docs_sample_weighted(sf_dir: str):
    """Weight-proportional deterministic sampling: keep probability
    grows with document length (``min(n_chars // WEIGHT_DIV, 100)``
    percent). Same splitmix64-bucket mechanism as the stratified
    sampler — the weight just becomes a per-row integer rate, so the
    sample stays stable under any partitioning/parallelism. Pure
    streaming filter, zero shuffles."""
    from ..stages.keyed import splitmix64

    ds = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()).astype(np.uint64)
        bucket = splitmix64(ids + np.uint64(WEIGHTED_SALT)) % np.uint64(100)
        rate = np.minimum(
            np.asarray(t["n_chars"].combine_chunks()).astype(np.int64)
            // WEIGHT_DIV,
            100,
        ).astype(np.uint64)
        return t.filter(pa.array(bucket < rate))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


DOCS_SAMPLE_WEIGHTED_SQL = f"""
WITH {splitmix64_bucket_sql('doc_id', 'documents', WEIGHTED_SALT)}
SELECT doc_id, lang, n_chars
FROM __s5
WHERE __bucket < LEAST(n_chars // {WEIGHT_DIV}, 100)
"""


# --------------------------------------------------------------------------
# Near-duplicate removal: anti-join against a similarity removal list
# --------------------------------------------------------------------------


def q_docs_neardup_filter(sf_dir: str):
    """The end-to-end near-dedup a training pipeline actually runs: build
    the >= 0.5 n-gram-Jaccard pair list, keep the lower doc_id of each
    pair, and anti-join the corpus against the loser set.

    Scale shape: the removal list is the *output* of dedup — tiny relative
    to the corpus (bounded by the duplicate rate), so it is collected once
    and broadcast via ``ray.put``; the corpus-side anti-join is then a
    streaming ``pc.is_in`` filter with no shuffle. If the duplicate rate
    were pathological (removal list too big to broadcast), the fallback is
    the existing doc_id cogroup (stages/keyed.py:cogroup_by_key).
    """
    import ray

    from .queries_text import q_docs_ngram_jaccard

    pairs = q_docs_ngram_jaccard(sf_dir).to_pandas()
    drop = np.unique(pairs["doc_b"].to_numpy(np.int64))
    ref = ray.put(pa.array(drop, pa.int64()))

    ds = _docs(sf_dir, columns=["doc_id", "lang", "source", "n_chars"])

    class AntiJoin:
        def __init__(self, drop_ref):
            self.drop = ray.get(drop_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = pc.invert(pc.is_in(t["doc_id"], value_set=self.drop))
            return t.filter(keep)

    return ds.map_batches(
        AntiJoin,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )


DOCS_NEARDUP_FILTER_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id NOT IN (SELECT doc_b FROM ({DOCS_NGRAM_JACCARD_SQL}))
"""


# --------------------------------------------------------------------------
# Grouped top-k with partial top-k pushdown
# --------------------------------------------------------------------------

TOPK_PER_LANG = 3


def _topk_kernel(t: pa.Table, k: int, with_rank: bool) -> pa.Table:
    """First-k rows per lang by (n_tokens DESC, doc_id ASC) — one lexsort
    + segment-position mask over the whole table, no per-group Python."""
    lang = t["lang"].combine_chunks()
    codes = np.asarray(pc.dictionary_encode(lang).indices).astype(np.int64)
    nt = np.asarray(t["n_tokens"].combine_chunks())
    ids = np.asarray(t["doc_id"].combine_chunks())
    order = np.lexsort((ids, -nt, codes))
    c = codes[order]
    n = len(c)
    if n == 0:
        out = t.select(["lang", "doc_id", "n_tokens"])
        return out.append_column("rk", pa.array([], pa.int64())) if with_rank else out
    seg_start = np.empty(n, dtype=bool)
    seg_start[0] = True
    np.not_equal(c[1:], c[:-1], out=seg_start[1:])
    arange = np.arange(n, dtype=np.int64)
    seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
    pos = arange - seg_first
    keep = order[pos < k]
    out = t.select(["lang", "doc_id", "n_tokens"]).take(pa.array(keep))
    if with_rank:
        out = out.append_column("rk", pa.array(pos[pos < k] + 1, pa.int64()))
    return out


def q_docs_topk_per_lang(sf_dir: str):
    """Grouped top-k (top-3 docs per language by token count): per-batch
    partial top-k inside ``map_batches`` shrinks each block to <= k rows
    per group BEFORE the shuffle, so the exchange moves O(groups * k *
    blocks) rows — the only way a grouped top-k survives 100 TB."""
    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        nt = token_count(t["text"].combine_chunks())
        slim = pa.table(
            {
                "lang": t["lang"],
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(nt, pa.int64()),
            }
        )
        return _topk_kernel(slim, TOPK_PER_LANG, with_rank=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return map_partitions_by_key(
        partials,
        "lang",
        lambda t: _topk_kernel(t, TOPK_PER_LANG, with_rank=True),
        num_parts=NUM_PARTS,
    )


DOCS_TOPK_PER_LANG_SQL = f"""
SELECT lang, doc_id, n_tokens, rk
FROM (
    SELECT lang, doc_id,
           length(string_split(text, ' ')) AS n_tokens,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY length(string_split(text, ' ')) DESC, doc_id
           ) AS rk
    FROM documents
) WHERE rk <= {TOPK_PER_LANG}
"""


# --------------------------------------------------------------------------
# Exact distributed quantiles via bounded-cardinality histograms
# --------------------------------------------------------------------------

QUANTILE_PCTS = (25, 50, 75, 90)


def q_docs_len_quantiles(sf_dir: str):
    """Exact per-language token-count quantiles at any scale: per-batch
    (lang, n_tokens) -> count partials collapse the corpus to a histogram
    whose cardinality is bounded by (languages x distinct lengths), i.e.
    thousands of rows regardless of corpus size; the quantile is then read
    off the merged cdf per language. Matches DuckDB ``quantile_disc``
    exactly (index ceil(q*n) - 1) using integer arithmetic only."""
    ds = _docs(sf_dir, columns=["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        nt = token_count(t["text"].combine_chunks())
        slim = pa.table(
            {"lang": t["lang"], "n_tokens": pa.array(nt, pa.int64())}
        )
        g = slim.group_by(["lang", "n_tokens"]).aggregate([("n_tokens", "count")])
        return g.rename_columns(["lang", "n_tokens", "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def finish(part: pa.Table) -> pa.Table:
        lang = part["lang"].combine_chunks()
        codes = np.asarray(pc.dictionary_encode(lang).indices).astype(np.int64)
        v = np.asarray(part["n_tokens"].combine_chunks())
        c = np.asarray(part["cnt"].combine_chunks())
        order = np.lexsort((v, codes))
        codes, v, c = codes[order], v[order], c[order]
        n = len(codes)
        if n == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64()),
                 **{f"p{p}": pa.array([], pa.int64()) for p in QUANTILE_PCTS}}
            )
        # merge duplicate (lang, value) rows from different partials
        seg = np.empty(n, dtype=bool)
        seg[0] = True
        seg[1:] = (codes[1:] != codes[:-1]) | (v[1:] != v[:-1])
        gid = np.cumsum(seg) - 1
        cm = np.bincount(gid, weights=c).astype(np.int64)
        codes, v = codes[seg], v[seg]
        lang_start = np.empty(len(codes), dtype=bool)
        lang_start[0] = True
        lang_start[1:] = codes[1:] != codes[:-1]
        lid = np.cumsum(lang_start) - 1
        totals = np.bincount(lid, weights=cm).astype(np.int64)
        # per-language local cdf
        cdf = np.cumsum(cm)
        base = np.repeat(cdf[np.flatnonzero(lang_start)] - cm[lang_start], np.bincount(lid))
        local_cdf = cdf - base
        first_of_lang = np.flatnonzero(lang_start)
        n_lang = len(first_of_lang)
        cols: dict[str, pa.Array] = {}
        # indices live in the lexsorted coordinate system — map back through
        # ``order`` to index the original (unsorted) lang array
        lang_values = lang.take(pa.array(order[np.flatnonzero(seg)[first_of_lang]]))
        cols["lang"] = lang_values
        cols["n_docs"] = pa.array(totals, pa.int64())
        lens = np.bincount(lid)
        for p in QUANTILE_PCTS:
            idx = (p * totals + 99) // 100 - 1  # ceil(q*n) - 1, integers only
            out = np.empty(n_lang, dtype=np.int64)
            for li in range(n_lang):  # languages, not rows: O(10) iterations
                s, e = first_of_lang[li], first_of_lang[li] + lens[li]
                out[li] = v[s:e][np.searchsorted(local_cdf[s:e], idx[li], side="right")]
            cols[f"p{p}"] = pa.array(out, pa.int64())
        return pa.table(cols)

    return map_partitions_by_key(partials, "lang", finish, num_parts=NUM_PARTS)


_Q_SELECTS = ", ".join(
    f"quantile_disc(length(string_split(text, ' ')), {p / 100}) AS p{p}"
    for p in QUANTILE_PCTS
)

DOCS_LEN_QUANTILES_SQL = f"""
SELECT lang, count(*) AS n_docs, {_Q_SELECTS}
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# Pivot aggregation (event_type -> columns)
# --------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(sf_dir: str):
    """Pivot: per-user sum(value) by event type as wide columns. The
    per-batch partial emits one wide row per (user, batch) — a combiner —
    so the shuffle moves O(users x blocks) rows with 7 numeric columns,
    never the raw events."""
    from ..sources.reads import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].combine_chunks())
        et = t["event_type"].combine_chunks()
        val = np.asarray(t["value"].combine_chunks())
        users, inv = np.unique(uid, return_inverse=True)
        cols: dict[str, pa.Array] = {"user_id": pa.array(users, pa.int64())}
        for ty in EVENT_TYPES:
            mask = np.asarray(pc.equal(et, ty)).astype(bool)
            cols[f"v_{ty}"] = pa.array(
                np.bincount(inv[mask], weights=val[mask], minlength=len(users)),
                pa.float64(),
            )
        cols["n_events"] = pa.array(
            np.bincount(inv, minlength=len(users)).astype(np.int64), pa.int64()
        )
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def finish(part: pa.Table) -> pa.Table:
        uid = np.asarray(part["user_id"].combine_chunks())
        users, inv = np.unique(uid, return_inverse=True)
        cols: dict[str, pa.Array] = {"user_id": pa.array(users, pa.int64())}
        for ty in EVENT_TYPES:
            s = np.bincount(
                inv, weights=np.asarray(part[f"v_{ty}"].combine_chunks()),
                minlength=len(users),
            )
            cols[f"v_{ty}"] = pa.array(round6(s), pa.float64())
        cols["n_events"] = pa.array(
            np.bincount(
                inv, weights=np.asarray(part["n_events"].combine_chunks()),
                minlength=len(users),
            ).astype(np.int64),
            pa.int64(),
        )
        return pa.table(cols)

    return map_partitions_by_key(partials, "user_id", finish, num_parts=NUM_PARTS)


_PIVOT_SELECTS = ", ".join(
    f"ROUND(COALESCE(sum(value) FILTER (WHERE event_type = '{ty}'), 0), 6) AS v_{ty}"
    for ty in EVENT_TYPES
)

EVENTS_PIVOT_SQL = f"""
SELECT user_id, {_PIVOT_SELECTS}, count(*) AS n_events
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Broadcast range (interval) join
# --------------------------------------------------------------------------

N_WINDOWS = 20
WINDOW_DAYS = 7


def q_range_join(sf_dir: str):
    """Range join: all events x the 7-day onboarding windows of the top-20
    users by total value. Non-equi ``ts in [lo, hi)`` predicate with NO
    equality key (any user's events count into any whale's window) — an
    operator Ray Data has no primitive for.

    Plan: the window side is small by construction (top-k), so broadcast
    it and probe each event batch vectorized against all windows (20 mask
    reductions per batch — windows may overlap, so no bucketing trick is
    assumed); partial (window, count, sum) rows then collapse in a tiny
    final groupby. The window side itself is built with the partial-
    aggregation combiner (per-batch group_by -> small groupby), so no
    stage sees the raw events twice. The co-partitioned alternative for a
    LARGE window side is time-bucketing with interval replication across
    overlapped buckets — documented, not needed here.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..sources.reads import read_parquet_sized
    from ..stages.keyed import fold_by_keys

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def per_user_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([("value", "sum"), ("ts", "min")])
        return g.rename_columns(["user_id", "p_val", "p_ts"])

    # per-user fold scales with the user population -> keyed-exchange
    # fold (high-cardinality groupby pathology, keyed.py); the collect
    # after it is O(users) per-user rows feeding a driver top-k only
    per_user = (
        fold_by_keys(
            ev.map_batches(
                per_user_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["user_id"],
            sums=("p_val",),
            mins=("p_ts",),
            num_parts=8,
        )
        .map_batches(
            lambda t: t.rename_columns(["user_id", "tot", "first_ts"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    per_user["tot_r"] = round_half_away(per_user["tot"].to_numpy()).astype(np.int64)
    top = per_user.sort_values(
        ["tot_r", "user_id"], ascending=[False, True], ignore_index=True
    ).head(N_WINDOWS)
    lo = top["first_ts"].to_numpy("datetime64[us]").astype(np.int64)
    hi = lo + np.int64(WINDOW_DAYS * 86_400_000_000)
    keys = top["user_id"].to_numpy(np.int64)
    ref = ray.put((keys, lo, hi))

    class RangeProbe:
        def __init__(self, windows_ref):
            self.keys, self.lo, self.hi = ray.get(windows_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
            val = np.asarray(t["value"].combine_chunks())
            # (n_windows, batch) membership — windows may overlap freely
            m = (ts[None, :] >= self.lo[:, None]) & (ts[None, :] < self.hi[:, None])
            cnt = m.sum(axis=1).astype(np.int64)
            sums = m @ val
            nz = cnt > 0
            return pa.table(
                {
                    "w_user": pa.array(self.keys[nz], pa.int64()),
                    "p_n": pa.array(cnt[nz], pa.int64()),
                    "p_v": pa.array(sums[nz], pa.float64()),
                }
            )

    partials = ev.map_batches(
        RangeProbe,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )
    out = partials.groupby("w_user").aggregate(
        Sum("p_n", alias_name="n_events"), Sum("p_v", alias_name="s_v")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "w_user": t["w_user"],
                "n_events": t["n_events"].cast(pa.int64()),
                "sum_value": pc.cast(pc.round(t["s_v"], ndigits=0, round_mode="half_towards_infinity"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


RANGE_JOIN_SQL = f"""
WITH w AS (
    SELECT user_id AS w_user, min(ts) AS lo,
           min(ts) + INTERVAL {WINDOW_DAYS} DAY AS hi
    FROM events
    GROUP BY user_id
    ORDER BY CAST(ROUND(sum(value), 0) AS BIGINT) DESC, user_id
    LIMIT {N_WINDOWS}
)
SELECT w.w_user,
       count(*) AS n_events,
       CAST(ROUND(sum(e.value), 0) AS BIGINT) AS sum_value
FROM w JOIN events e ON e.ts >= w.lo AND e.ts < w.hi
GROUP BY w.w_user
"""


# --------------------------------------------------------------------------
# TF-IDF keyword extraction (top terms per document)
# --------------------------------------------------------------------------

TFIDF_TOP_K = 3


def _tf_partial(t: pa.Table) -> pa.Table:
    """Per-batch exact (doc_id, term, tf) partials — docs are whole per
    batch, so batch-local term frequency is exact. Shared by the tf-idf
    and commonness operators."""
    import pandas as pd

    from ..functions.text import _flat_tokens, tokens_list

    flat, offsets = _flat_tokens(tokens_list(t["text"]))
    n = len(flat)
    ids = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "term": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64())}
        )
    enc = pc.dictionary_encode(flat)
    code = np.asarray(enc.indices).astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    doc_pos = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    # batch-local (doc, term) key: doc position fits far below 2^32
    key = (doc_pos << np.int64(32)) | code
    inv, uniq = pd.factorize(key)
    tf = np.bincount(inv).astype(np.int64)
    u_doc = ids[(uniq >> np.int64(32))]
    u_code = uniq & np.int64(0xFFFFFFFF)
    return pa.table(
        {
            "doc_id": pa.array(u_doc, pa.int64()),
            "term": enc.dictionary.take(pa.array(u_code)),
            "tf": pa.array(tf, pa.int64()),
        }
    )


def q_docs_tfidf_top_terms(sf_dir: str):
    """Top-``TFIDF_TOP_K`` terms per document by tf-idf
    (``tf * ln(N / df)``), ties broken by term.

    Scale shape: per-batch (doc, term, tf) partials (docs are whole per
    batch, so batch-local tf is exact) → ONE shuffle by term where each
    partition holds every row of its terms, so df is computed in place
    and rides each row (no df join) → ONE shuffle by doc for the top-k.
    N comes from parquet footer metadata (no data read). The exchange
    moves O(distinct (doc, term)) rows — the token stream never
    shuffles."""
    import pyarrow.parquet as pq

    n_docs = float(
        pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    )
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    tf_rows = ds.map_batches(_tf_partial, batch_format="pyarrow", zero_copy_batch=True)

    def attach_df(part: pa.Table) -> pa.Table:
        import pandas as pd

        term = part["term"].combine_chunks()
        inv, _uniq = pd.factorize(np.asarray(term.cast(pa.large_string())))
        df = np.bincount(inv).astype(np.int64)  # rows are distinct (doc, term)
        return part.append_column("df", pa.array(df[inv], pa.int64()))

    with_df = map_partitions_by_key(tf_rows, "term", attach_df, num_parts=NUM_PARTS)

    def topk(part: pa.Table) -> pa.Table:
        tf = np.asarray(part["tf"].combine_chunks()).astype(np.float64)
        df = np.asarray(part["df"].combine_chunks()).astype(np.float64)
        tfidf = round6(tf * np.log(n_docs / df))
        doc = np.asarray(part["doc_id"].combine_chunks())
        term = np.asarray(part["term"].combine_chunks().cast(pa.large_string()))
        order = np.lexsort((term, -tfidf, doc))
        d_s = doc[order]
        seg_start = np.empty(len(d_s), dtype=bool)
        if len(d_s):
            seg_start[0] = True
            np.not_equal(d_s[1:], d_s[:-1], out=seg_start[1:])
        arange = np.arange(len(d_s), dtype=np.int64)
        seg_first = np.maximum.accumulate(np.where(seg_start, arange, 0))
        pos = arange - seg_first
        keep = pos < TFIDF_TOP_K
        sel = order[keep]
        return pa.table(
            {
                "doc_id": part["doc_id"].combine_chunks().take(pa.array(sel)),
                "term": part["term"].combine_chunks().take(pa.array(sel)),
                "tf": part["tf"].combine_chunks().take(pa.array(sel)),
                "df": part["df"].combine_chunks().take(pa.array(sel)),
                "tfidf": pa.array(tfidf[sel], pa.float64()),
                "rk": pa.array(pos[keep] + 1, pa.int64()),
            }
        )

    return map_partitions_by_key(with_df, "doc_id", topk, num_parts=NUM_PARTS)


DOCS_TFIDF_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
s AS (
    SELECT tf.doc_id, tf.term, tf.tf, dft.df,
           ROUND(tf.tf * ln((SELECT n FROM n) / dft.df), 6) AS tfidf
    FROM tf JOIN dft USING (term)
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term
    ) AS rk FROM s
)
SELECT doc_id, term, tf, df, tfidf, rk FROM r WHERE rk <= {TFIDF_TOP_K}
"""


# --------------------------------------------------------------------------
# Corpus-commonness score (unigram-LM quality signal, integer-exact)
# --------------------------------------------------------------------------


def q_docs_commonness(sf_dir: str):
    """Per-document corpus commonness: ``sum_tok_freq`` = sum over the
    doc's token occurrences of that token's GLOBAL occurrence count, plus
    ``n_toks``. The ratio is the unigram-LM "average token probability"
    quality signal (rare-token-heavy docs score low); both columns stay
    integer so the oracle compare is exact.

    Scale shape: per-batch (doc, term, tf) partials (the token stream
    never shuffles) → ONE exchange by term, where each partition holds
    every row of its terms so the global count is a segmented sum in
    place — the per-doc weighted partials are pre-aggregated per
    partition before the final O(docs × parts) doc groupby."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    tf_rows = ds.map_batches(_tf_partial, batch_format="pyarrow", zero_copy_batch=True)

    def weigh(part: pa.Table) -> pa.Table:
        import pandas as pd

        term = np.asarray(part["term"].combine_chunks().cast(pa.large_string()))
        tf = np.asarray(part["tf"].combine_chunks()).astype(np.int64)
        inv, uniq = pd.factorize(term)
        # int64 scatter-adds, not bincount(weights=...): weights go through
        # float64 and lose exactness past 2^53 at extreme corpus sizes
        glob = np.zeros(len(uniq), np.int64)
        np.add.at(glob, inv, tf)
        w = tf * glob[inv]
        doc = np.asarray(part["doc_id"].combine_chunks())
        d_inv, d_uniq = pd.factorize(doc)
        wsum = np.zeros(len(d_uniq), np.int64)
        np.add.at(wsum, d_inv, w)
        ntok = np.zeros(len(d_uniq), np.int64)
        np.add.at(ntok, d_inv, tf)
        return pa.table(
            {
                "doc_id": pa.array(d_uniq, pa.int64()),
                "p_wsum": pa.array(wsum),
                "p_ntok": pa.array(ntok),
            }
        )

    from ..stages.keyed import fold_by_keys

    # per-doc fold scales with the corpus -> keyed-exchange fold
    partials = map_partitions_by_key(tf_rows, "term", weigh, num_parts=NUM_PARTS)
    out = fold_by_keys(
        partials, ["doc_id"], sums=("p_wsum", "p_ntok"), num_parts=NUM_PARTS
    ).map_batches(
        lambda t: t.rename_columns(["doc_id", "sum_tok_freq", "n_toks"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "sum_tok_freq": t["sum_tok_freq"].cast(pa.int64()),
                "n_toks": t["n_toks"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


DOCS_COMMONNESS_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2
),
g AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1)
SELECT tf.doc_id,
       CAST(sum(tf.tf * g.c) AS BIGINT) AS sum_tok_freq,
       CAST(sum(tf.tf) AS BIGINT) AS n_toks
FROM tf JOIN g USING (term) GROUP BY 1
"""


# --------------------------------------------------------------------------
# Bigram-LM conditional-predictability score (integer-exact)
# --------------------------------------------------------------------------


def _bigram_tf_partial(t: pa.Table) -> pa.Table:
    """Per-batch exact (doc_id, w1, w2, tf) bigram-frequency partials —
    docs are whole per batch, so batch-local bigram counts are exact."""
    import pandas as pd

    from ..functions.text import _flat_tokens, tokens_list

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    flat, offsets = _flat_tokens(tokens_list(t["text"]))
    n = len(flat)
    if n == 0:
        return empty
    ids = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
    enc = pc.dictionary_encode(flat)
    code = np.asarray(enc.indices).astype(np.int64)
    n_dict = np.int64(len(enc.dictionary))
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    doc_pos = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    pos = np.arange(n, dtype=np.int64) - np.repeat(offsets[:-1].astype(np.int64), lens)
    idx = np.flatnonzero(pos <= np.repeat(lens, lens) - 2)
    if len(idx) == 0:
        return empty
    # guard in Python ints — a np.int64 product would itself wrap silently
    if len(ids) * int(n_dict) * int(n_dict) >= np.iinfo(np.int64).max:
        raise OverflowError("bigram partial key packing would overflow int64")
    key = (doc_pos[idx] * n_dict + code[idx]) * n_dict + code[idx + 1]
    inv, uniq = pd.factorize(key)
    tf = np.bincount(inv).astype(np.int64)
    w2c = uniq % n_dict
    rest = uniq // n_dict
    return pa.table(
        {
            "doc_id": pa.array(ids[rest // n_dict], pa.int64()),
            "w1": enc.dictionary.take(pa.array(rest % n_dict)),
            "w2": enc.dictionary.take(pa.array(w2c)),
            "tf": pa.array(tf, pa.int64()),
        }
    )


def q_docs_bigram_lm(sf_dir: str):
    """Per-document bigram-LM conditional-predictability signal — the
    KenLM-style curation filter's count layer: ``sum_bigram_freq`` = sum
    over the doc's bigram occurrences of that bigram's GLOBAL count
    c(w1,w2), ``sum_context_freq`` = the same sum of the left-context
    total c(w1,·), plus ``n_bigrams``. Their ratio estimates the corpus-
    average conditional probability P(w2|w1) over the doc — low for
    incoherent/shuffled text that unigram commonness scores high (every
    token common, every transition rare). All columns integer so the
    oracle compare is exact.

    Scale shape: per-batch bigram tf partials (the token stream never
    shuffles) → ONE exchange keyed by w1, where each partition holds
    every row of its contexts so BOTH the bigram count (segmented by
    (w1,w2)) and the context total (segmented by w1) are scatter-adds in
    place — no second exchange and no count-table join; per-doc weighted
    partials fold via the keyed exchange."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    rows = ds.map_batches(
        _bigram_tf_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def weigh(part: pa.Table) -> pa.Table:
        import pandas as pd

        w1 = np.asarray(part["w1"].combine_chunks().cast(pa.large_string()))
        w2 = np.asarray(part["w2"].combine_chunks().cast(pa.large_string()))
        tf = np.asarray(part["tf"].combine_chunks()).astype(np.int64)
        c_inv, c_uniq = pd.factorize(w1)
        w_inv, w_uniq = pd.factorize(w2)
        cc = np.zeros(len(c_uniq), np.int64)
        np.add.at(cc, c_inv, tf)
        if len(c_uniq) * len(w_uniq) >= np.iinfo(np.int64).max:
            raise OverflowError("bigram pair key packing would overflow int64")
        p_inv, p_uniq = pd.factorize(
            c_inv.astype(np.int64) * np.int64(len(w_uniq)) + w_inv
        )
        cb = np.zeros(len(p_uniq), np.int64)
        np.add.at(cb, p_inv, tf)
        doc = np.asarray(part["doc_id"].combine_chunks())
        d_inv, d_uniq = pd.factorize(doc)
        bf = np.zeros(len(d_uniq), np.int64)
        cf = np.zeros(len(d_uniq), np.int64)
        nb = np.zeros(len(d_uniq), np.int64)
        np.add.at(bf, d_inv, tf * cb[p_inv])
        np.add.at(cf, d_inv, tf * cc[c_inv])
        np.add.at(nb, d_inv, tf)
        return pa.table(
            {
                "doc_id": pa.array(d_uniq, pa.int64()),
                "p_bf": pa.array(bf),
                "p_cf": pa.array(cf),
                "p_nb": pa.array(nb),
            }
        )

    from ..stages.keyed import fold_by_keys

    partials = map_partitions_by_key(rows, "w1", weigh, num_parts=NUM_PARTS)
    out = fold_by_keys(
        partials, ["doc_id"], sums=("p_bf", "p_cf", "p_nb"), num_parts=NUM_PARTS
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "sum_bigram_freq": t["p_bf"].cast(pa.int64()),
                "sum_context_freq": t["p_cf"].cast(pa.int64()),
                "n_bigrams": t["p_nb"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


DOCS_BIGRAM_LM_SQL = """
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
b AS (
    SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
    FROM tok, unnest(range(1, len(ts))) AS t(i)
),
tf AS (
    SELECT doc_id, w1, w2, count(*)::BIGINT AS tf FROM b GROUP BY 1, 2, 3
),
gb AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS cb FROM tf GROUP BY 1, 2),
gc AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cc FROM gb GROUP BY 1)
SELECT tf.doc_id,
       CAST(sum(tf.tf * gb.cb) AS BIGINT) AS sum_bigram_freq,
       CAST(sum(tf.tf * gc.cc) AS BIGINT) AS sum_context_freq,
       CAST(sum(tf.tf) AS BIGINT) AS n_bigrams
FROM tf JOIN gb USING (w1, w2) JOIN gc USING (w1)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Funnel conversion (signup -> purchase within a window)
# --------------------------------------------------------------------------

FUNNEL_FIRST, FUNNEL_NEXT = "signup", "purchase"
FUNNEL_WINDOW_US = 86_400_000_000  # 24 hours


def q_events_funnel(sf_dir: str):
    """Two-step funnel: users whose FIRST '{signup}' event is followed
    by a '{purchase}' within 24 h; emits the converting pair and the
    microsecond gap. The temporal-join shape behind activation and
    attribution features.

    Scale shape: the read prunes to the two event types and three
    columns; ONE keyed exchange on user_id; per partition everything is
    segmented numpy — first-signup via sorted-segment heads, window
    membership as a boolean mask, first-qualifying-purchase via
    ``minimum.at``. No driver pass, no second shuffle."""
    from ..sources.reads import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(
                t["event_type"],
                value_set=pa.array([FUNNEL_FIRST, FUNNEL_NEXT]),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def funnel_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "signup_ts": pa.array([], pa.timestamp("us")),
                "purchase_ts": pa.array([], pa.timestamp("us")),
                "us_to_convert": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = np.asarray(t["user_id"].combine_chunks())
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        is_first = np.asarray(
            pc.equal(t["event_type"].combine_chunks(), FUNNEL_FIRST)
        )
        su, st = uid[is_first], ts[is_first]
        if len(su) == 0:
            return empty
        order = np.lexsort((st, su))
        su, st = su[order], st[order]
        head = np.concatenate(([True], su[1:] != su[:-1]))
        users, first_ts = su[head], st[head]  # first signup per user
        pu, pt = uid[~is_first], ts[~is_first]
        pos = np.searchsorted(users, pu)
        pos_c = np.clip(pos, 0, len(users) - 1)
        anchor = first_ts[pos_c]
        ok = (
            (users[pos_c] == pu)
            & (pt > anchor)
            & (pt <= anchor + FUNNEL_WINDOW_US)
        )
        best = np.full(len(users), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(best, pos_c[ok], pt[ok])
        conv = best != np.iinfo(np.int64).max
        return pa.table(
            {
                "user_id": pa.array(users[conv], pa.int64()),
                "signup_ts": pa.array(first_ts[conv]).cast(pa.timestamp("us")),
                "purchase_ts": pa.array(best[conv]).cast(pa.timestamp("us")),
                "us_to_convert": pa.array(
                    best[conv] - first_ts[conv], pa.int64()
                ),
            }
        )

    return map_partitions_by_key(ds, "user_id", funnel_part, num_parts=NUM_PARTS)


EVENTS_FUNNEL_SQL = f"""
WITH s AS (
    SELECT user_id, MIN(ts) AS signup_ts FROM events
    WHERE event_type = '{FUNNEL_FIRST}' GROUP BY user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS purchase_ts
    FROM events e JOIN s USING (user_id)
    WHERE e.event_type = '{FUNNEL_NEXT}'
      AND e.ts > s.signup_ts
      AND e.ts <= s.signup_ts + INTERVAL 24 HOUR
    GROUP BY e.user_id
)
SELECT user_id, s.signup_ts, p.purchase_ts,
       date_diff('microsecond', s.signup_ts, p.purchase_ts)::BIGINT
           AS us_to_convert
FROM s JOIN p USING (user_id)
"""


QUANTILE_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_events_value_quantiles(sf_dir: str):
    """EXACT global percentiles of a high-cardinality double column
    (nearest-rank definition) — the unbounded-domain complement of the
    bounded-histogram grouped quantiles (`docs_len_quantiles`): global
    rank via the range-partitioned sort, then a distributed filter to
    the O(#qs) target ranks. N comes from the parquet footer (no data
    read)."""
    import pyarrow.parquet as pq

    from ..sources.reads import read_parquet_sized
    from ..stages.globalorder import with_global_rank

    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    # one (rank, q) pair PER q — colliding ranks (tiny n) emit one output
    # row per q, matching the SQL twin's VALUES join
    targets = [(1 + int(np.floor(q * (n - 1))), q) for q in QUANTILE_QS]
    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    ranked = with_global_rank(
        ev, ["value", "event_id"], descending=[False, False]
    )
    tgt = pa.array(sorted({r for r, _ in targets}), pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.is_in(t["rnk"], value_set=tgt))
        ranks = np.asarray(hit["rnk"].combine_chunks())
        vals = np.asarray(hit["value"].combine_chunks())
        qs, out_vals = [], []
        for r, q in targets:  # O(#qs x #hits) — both tiny
            m = ranks == r
            if m.any():
                qs.append(q)
                out_vals.append(vals[m][0])
        return pa.table(
            {"q": pa.array(qs, pa.float64()),
             "value": pa.array(out_vals, pa.float64())}
        )

    return ranked.map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


EVENTS_VALUE_QUANTILES_SQL = f"""
WITH r AS (
    SELECT value,
           row_number() OVER (ORDER BY value, event_id) AS rnk
    FROM events
),
n AS (SELECT count(*)::BIGINT AS c FROM events)
SELECT t.q, r.value
FROM (VALUES {', '.join(f'({q})' for q in QUANTILE_QS)}) t(q)
CROSS JOIN n
JOIN r ON r.rnk = 1 + CAST(floor(t.q * (n.c - 1)) AS BIGINT)
"""


SN_WINDOW = 3  # sorted-neighborhood sliding-window size


def q_docs_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood dedup blocking: candidate pairs whose global
    ranks (by the blocking key ``(n_chars, doc_id)``) differ by at most
    ``SN_WINDOW`` — the classic windowed alternative to LSH banding for
    entity resolution. Global rank via the range-partitioned sort, pairs
    via a bucket-keyed exchange with overlap-prefix copies (each pair
    emitted exactly once by the bucket owning its left row)."""
    from ..sources.reads import read_parquet_sized
    from ..stages.globalorder import neighbor_pairs, with_global_rank

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    ranked = with_global_rank(
        docs, ["n_chars", "doc_id"], descending=[False, False]
    )
    # bucket_size 64 so multi-bucket partitions + overlap copies are
    # exercised even at the smallest fixture
    return neighbor_pairs(
        ranked,
        rank_col="rnk",
        window=SN_WINDOW,
        carry_cols=["doc_id"],
        bucket_size=64,
        num_parts=NUM_PARTS,
    )


DOCS_SORTED_NEIGHBORHOOD_SQL = f"""
WITH r AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY n_chars, doc_id) AS rnk
    FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND {SN_WINDOW}
"""


FUZZY_PREFIX = 64  # bytes of canonical prefix compared
FUZZY_MAX_DIST = 20  # near-dup verdict threshold (corpus background ~49)


def q_docs_fuzzy_pairs(sf_dir: str):
    """Fuzzy near-dup pairs via exact Levenshtein verify — the
    edit-distance dedup family (complements MinHash/SimHash/n-gram/
    embedding): sorted-neighborhood blocking proposes candidate pairs,
    each pair's canonical 64-byte prefixes ride the SAME bucket exchange
    as carry columns (no extra join), and a vectorized two-row DP scores
    every pair in the batch at once (stages/dedup.py:edit_distance_pairs
    — the Python loop is over the fixed 64x64 cell grid, O(P) vectorized
    per cell, never over pairs). The bounded prefix keeps per-pair cost
    constant at any document length — the standard blocking-verify
    practice for fuzzy entity resolution."""
    import pyarrow.compute as pc

    from ..sources.reads import read_parquet_sized
    from ..stages.dedup import ascii_prefix_matrix, edit_distance_pairs
    from ..stages.globalorder import neighbor_pairs, with_global_rank

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars", "text"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "pfx": pc.utf8_slice_codeunits(
                    t["text"].combine_chunks(), 0, FUZZY_PREFIX
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ranked = with_global_rank(docs, ["n_chars", "doc_id"],
                              descending=[False, False])
    pairs = neighbor_pairs(
        ranked,
        rank_col="rnk",
        window=SN_WINDOW,
        carry_cols=["doc_id", "pfx"],
        bucket_size=64,
        num_parts=NUM_PARTS,
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id_a": pa.array([], pa.int64()),
                    "doc_id_b": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        a_mat, a_len = ascii_prefix_matrix(t["pfx_a"], FUZZY_PREFIX)
        b_mat, b_len = ascii_prefix_matrix(t["pfx_b"], FUZZY_PREFIX)
        dist = edit_distance_pairs(a_mat, a_len, b_mat, b_len)
        keep = pa.array(dist <= FUZZY_MAX_DIST)
        return pa.table(
            {
                "doc_id_a": t["doc_id_a"].combine_chunks().cast(pa.int64()),
                "doc_id_b": t["doc_id_b"].combine_chunks().cast(pa.int64()),
                "dist": pa.array(dist, pa.int64()),
            }
        ).filter(keep)

    return pairs.map_batches(verify, batch_format="pyarrow",
                             zero_copy_batch=True)


DOCS_FUZZY_PAIRS_SQL = f"""
WITH r AS (
    SELECT doc_id, substr(text, 1, {FUZZY_PREFIX}) AS pfx,
           row_number() OVER (ORDER BY n_chars, doc_id) AS rnk
    FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND {SN_WINDOW}
WHERE levenshtein(a.pfx, b.pfx) <= {FUZZY_MAX_DIST}
"""


def q_docs_global_rank(sf_dir: str):
    """Exact global row number over a total order: Ray Data's
    range-partitioned sort + the O(#blocks) block-offset scan
    (stages/globalorder.py). The rank VALUES encode the global order, so
    the driver's order-insensitive hash still verifies the sort."""
    from ..sources.reads import read_parquet_sized
    from ..stages.globalorder import with_global_rank

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return with_global_rank(
        docs, ["n_chars", "doc_id"], descending=[True, False]
    )


DOCS_GLOBAL_RANK_SQL = """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id)::BIGINT AS rnk
FROM documents
"""


# --------------------------------------------------------------------------
# Z-order (Morton) clustering — the lakehouse ZORDER BY analog
# --------------------------------------------------------------------------

Z_QBITS = 16          # bits per dimension
Z_FILE_SHIFT = 26     # 32-bit code >> 26 → 64 output files


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of uint64 ``v`` to even bit positions
    (classic magic-number Morton spread)."""
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def q_events_zorder(sf_dir: str):
    """Z-order (Morton) clustering key over (ts, user_id) — the
    Delta/Iceberg ``ZORDER BY`` analog that makes a rewrite prunable on
    TWO columns at once: order-preserving integer quantization of each
    dimension to 16 bits (bin width ``range // 2^16 + 1`` — division, not
    multiplication, so int64 never overflows even on decade-wide
    microsecond ranges), magic-number bit-interleave to a 32-bit Z code,
    and the output file assigned from the code's top 6 bits so rows close
    in BOTH dimensions land in the same file.

    Scale path: bounds are ONE streaming min/max aggregate (4 scalars to
    the driver); the tag itself is a zero-shuffle streamed map; the
    clustering rewrite is then the existing partitioned writer keyed by
    ``zfile``. Nothing here sorts globally — Z-file locality comes from
    the code's top bits alone."""
    from ray.data.aggregate import Max, Min

    from ..sources.reads import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    agg = ds.aggregate(Min("ts"), Max("ts"), Min("user_id"), Max("user_id"))
    import pandas as pd

    mn_t = pd.Timestamp(agg["min(ts)"]).value // 1000
    mx_t = pd.Timestamp(agg["max(ts)"]).value // 1000
    mn_u, mx_u = int(agg["min(user_id)"]), int(agg["max(user_id)"])
    wt = (mx_t - mn_t) // (1 << Z_QBITS) + 1
    wu = (mx_u - mn_u) // (1 << Z_QBITS) + 1

    def tag(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        uid = np.asarray(t["user_id"].combine_chunks())
        qt = ((ts - mn_t) // wt).astype(np.uint64)
        qu = ((uid - mn_u) // wu).astype(np.uint64)
        z = _spread16(qt) | (_spread16(qu) << np.uint64(1))
        return pa.table(
            {
                "event_id": t["event_id"],
                "z": pa.array(z.astype(np.int64)),
                "zfile": pa.array((z >> np.uint64(Z_FILE_SHIFT)).astype(np.int64)),
            }
        )

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def _spread16_sql(col: str, out: str, steps: list[tuple[int, int]]) -> list[str]:
    """SELECT-expression chain names for the SQL Morton spread."""
    exprs = []
    cur = col
    for i, (sh, mask) in enumerate(steps):
        nxt = f"{out}{i}"
        exprs.append(f"(({cur} | ({cur} << {sh})) & {mask}) AS {nxt}")
        cur = nxt
    return exprs


_Z_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]

EVENTS_ZORDER_SQL = f"""
WITH b AS (
  SELECT epoch_us(min(ts)) AS mn_t, epoch_us(max(ts)) AS mx_t,
         min(user_id) AS mn_u, max(user_id) AS mx_u
  FROM events),
w AS (SELECT mn_t, mn_u,
        (mx_t - mn_t) // {1 << Z_QBITS} + 1 AS wt,
        (mx_u - mn_u) // {1 << Z_QBITS} + 1 AS wu
      FROM b),
q AS (SELECT event_id,
        (epoch_us(ts) - mn_t) // wt AS qt,
        (user_id - mn_u) // wu AS qu
      FROM events, w),
s0 AS (SELECT event_id, {_spread16_sql('qt', 'ta', _Z_STEPS)[0]}, {_spread16_sql('qu', 'ua', _Z_STEPS)[0]} FROM q),
s1 AS (SELECT event_id, {_spread16_sql('qt', 'ta', _Z_STEPS)[1]}, {_spread16_sql('qu', 'ua', _Z_STEPS)[1]} FROM s0),
s2 AS (SELECT event_id, {_spread16_sql('qt', 'ta', _Z_STEPS)[2]}, {_spread16_sql('qu', 'ua', _Z_STEPS)[2]} FROM s1),
s3 AS (SELECT event_id, {_spread16_sql('qt', 'ta', _Z_STEPS)[3]}, {_spread16_sql('qu', 'ua', _Z_STEPS)[3]} FROM s2),
z AS (SELECT event_id, (ta3 | (ua3 << 1)) AS z FROM s3)
SELECT event_id, z::BIGINT AS z, (z >> {Z_FILE_SHIFT})::BIGINT AS zfile FROM z
"""


# --------------------------------------------------------------------------
# Deterministic multi-epoch shuffle-shard ordering
# --------------------------------------------------------------------------

N_EPOCHS = 2
N_SHARDS = 8
EPOCH_SALT_STEP = 7919  # distinct splitmix salt per epoch


def q_docs_epoch_order(sf_dir: str):
    """Deterministic multi-epoch global shuffle + shard assignment — the
    ordering step every large training run performs before writing
    training shards: for each epoch, rank documents by
    ``splitmix64(doc_id + epoch_salt)`` (a seeded permutation that is
    stable under any partitioning, resumable, and different per epoch so
    no two epochs replay the same order), assign ``shard = rank_hash %
    N_SHARDS``, and number documents within each (epoch, shard) by
    unsigned hash order.

    Scale path: the hash/shard tag is a zero-shuffle streamed
    ``map_batches``; the within-shard position needs exactly one keyed
    exchange on (epoch, shard) followed by a per-partition ``lexsort`` —
    at 10^12 rows you raise N_SHARDS until one shard sorts comfortably
    per task (shards are the training-data unit anyway), never a global
    sort. Ties (impossible for distinct doc_ids, but defensively) break
    by doc_id, so output is fully deterministic."""
    from ..stages.keyed import splitmix64
    from .queries_relational import SPLIT_SALT

    docs = _docs(sf_dir, columns=["doc_id"])

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64())).astype(
            np.uint64
        )
        outs = []
        for e in range(N_EPOCHS):
            h = splitmix64(ids + np.uint64(SPLIT_SALT + e * EPOCH_SALT_STEP))
            shard = (h % np.uint64(N_SHARDS)).astype(np.int64)
            outs.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids.astype(np.int64)),
                        "__k": pa.array(np.int64(e) * N_SHARDS + shard),
                        # uint64 hash carried as its int64 bit-pattern
                        "__h": pa.array(h.view(np.int64)),
                    }
                )
            )
        return pa.concat_tables(outs)

    tagged = docs.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def pos_part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "epoch": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        k = np.asarray(t["__k"].combine_chunks())
        h = np.asarray(t["__h"].combine_chunks()).view(np.uint64)
        ids = np.asarray(t["doc_id"].combine_chunks())
        order = np.lexsort((ids, h, k))
        ks = k[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        seg_len = np.diff(np.r_[starts, len(ks)])
        pos = np.arange(len(ks), dtype=np.int64) - np.repeat(starts, seg_len)
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "epoch": pa.array(ks // N_SHARDS),
                "shard": pa.array(ks % N_SHARDS),
                "pos": pa.array(pos),
            }
        )

    return map_partitions_by_key(tagged, "__k", pos_part, num_parts=NUM_PARTS)


def _epoch_order_sql() -> str:
    from .queries_relational import SPLIT_SALT, splitmix64_hash_sql

    chains, legs = [], []
    for e in range(N_EPOCHS):
        p = f"__e{e}_"
        chains.append(
            splitmix64_hash_sql(
                "doc_id", "documents", SPLIT_SALT + e * EPOCH_SALT_STEP, p
            )
        )
        legs.append(
            f"SELECT doc_id, {e}::BIGINT AS epoch, "
            f"({p}h % {N_SHARDS})::BIGINT AS shard, {p}h AS __h FROM {p}5"
        )
    union = " UNION ALL ".join(legs)
    return f"""
WITH {','.join(chains)}, __u AS ({union})
SELECT doc_id, epoch, shard,
       (row_number() OVER (PARTITION BY epoch, shard ORDER BY __h, doc_id)
        - 1)::BIGINT AS pos
FROM __u
"""


DOCS_EPOCH_ORDER_SQL = _epoch_order_sql()


# --------------------------------------------------------------------------
# BM25 keyword retrieval (Okapi BM25 top-k scoring against a fixed query)
# --------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("data", "hash", "join")
BM25_TOP_K = 20


def q_docs_bm25(sf_dir: str):
    """Okapi BM25 top-``BM25_TOP_K`` retrieval for a fixed keyword query
    — the classic sparse-retrieval scorer (idf-weighted, length-
    normalized tf saturation), ties broken by ``doc_id``.

    Plan: pass 1 streams O(|query|) df partials plus the corpus token
    total per batch (a few rows each — the token stream never leaves the
    task); N comes from the parquet footer. idf/avgdl ride the closure
    into pass 2, a ZERO-shuffle scoring map with a per-batch partial
    top-k, so only O(k × blocks) candidate rows reach the final
    single-block cut. Score arithmetic is the same IEEE expression in
    the same order on both sides, rounded to 6 digits before ranking.
    """
    import math

    import pyarrow.parquet as pq

    from ..functions.text import _flat_tokens, tokens_list

    n_docs = int(pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows)
    terms = list(BM25_QUERY)

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, offsets = _flat_tokens(tokens_list(t["text"]))
        n_rows = t.num_rows
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        dfs, tots = [], []
        for i, term in enumerate(terms):
            mask = np.asarray(pc.equal(flat, term).fill_null(False))
            per_doc = np.bincount(
                np.repeat(np.arange(n_rows, dtype=np.int64), lens)[mask],
                minlength=n_rows,
            )
            dfs.append(int(np.count_nonzero(per_doc)))
            tots.append(int(len(flat)) if i == 0 else 0)  # token total rides row 0
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "n_tok": pa.array(tots, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    stats = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("n_tok", alias_name="nt"))
        .to_pandas()
    )
    df_by_term = dict(zip(stats["term"], stats["df"].astype(int)))
    tot_tok = float(int(stats["nt"].sum()))
    n_f = float(n_docs)
    avgdl = tot_tok / n_f
    idf = [
        math.log((n_f - float(df_by_term[t]) + 0.5) / (float(df_by_term[t]) + 0.5) + 1.0)
        for t in terms
    ]

    def score_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
        if t.num_rows == 0:
            return empty
        flat, offsets = _flat_tokens(tokens_list(t["text"]))
        n_rows = t.num_rows
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        doc_pos = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        dl = lens.astype(np.float64)
        score = np.zeros(n_rows, np.float64)
        for i, term in enumerate(terms):
            mask = np.asarray(pc.equal(flat, term).fill_null(False))
            tf = np.bincount(doc_pos[mask], minlength=n_rows).astype(np.float64)
            score += (
                idf[i]
                * (tf * (BM25_K1 + 1.0))
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
            )
        score = round6(score)
        ids = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        order = np.lexsort((ids, -score))[:BM25_TOP_K]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(score[order], pa.float64()),
            }
        )

    cands = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score_topk, batch_format="pyarrow", zero_copy_batch=True
    )

    def final_cut(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks())
        score = np.asarray(t["score"].combine_chunks())
        order = np.lexsort((ids, -score))[:BM25_TOP_K]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(score[order], pa.float64()),
                "rk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return cands.repartition(1).map_batches(
        final_cut, batch_format="pyarrow", batch_size=None
    )


def _bm25_term_sql(i: int, term: str) -> str:
    """One term's BM25 contribution — same literals, same op order as the
    numpy expression in :func:`q_docs_bm25`."""
    return (
        f"ln(((SELECT n FROM n) - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * (tf{i} * ({BM25_K1} + 1.0))"
        f" / (tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl"
        f" / ((SELECT t FROM t) / (SELECT n FROM n))))"
    )


DOCS_BM25_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
t AS (SELECT count(*)::DOUBLE AS t FROM tok),
f AS (
    SELECT doc_id,
           count(*)::DOUBLE AS dl,
           {", ".join(f"(count(*) FILTER (term = '{tm}'))::DOUBLE AS tf{i}" for i, tm in enumerate(BM25_QUERY))}
    FROM tok GROUP BY 1
),
d AS (
    SELECT {", ".join(f"(count(DISTINCT doc_id) FILTER (term = '{tm}'))::DOUBLE AS df{i}" for i, tm in enumerate(BM25_QUERY))}
    FROM tok
),
s AS (
    SELECT doc_id,
           ROUND({" + ".join(_bm25_term_sql(i, tm) for i, tm in enumerate(BM25_QUERY))}, 6) AS score
    FROM f, d
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
FROM s
ORDER BY score DESC, doc_id
LIMIT {BM25_TOP_K}
"""


# --------------------------------------------------------------------------
# Exact-k weighted sampling without replacement (Efraimidis–Spirakis)
# --------------------------------------------------------------------------

WSAMPLE_K = 32
WSAMPLE_SALT = 1013


def q_docs_sample_weighted_k(sf_dir: str):
    """Exactly-``WSAMPLE_K`` length-weighted sample WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each doc draws an exponential key
    ``-ln(u)/w`` from a hash-deterministic uniform ``u`` and weight
    ``w = n_chars``; the k SMALLEST keys are the sample — equivalent to
    sequential weighted draws without replacement, but embarrassingly
    parallel and re-run/partitioning stable (no RNG state, no
    coordination — the property the keep-rate sampler
    ``docs_sample_weighted`` has, now with an exact-k guarantee).

    Plan: ZERO shuffles — per-batch local bottom-k, then a single-block
    final cut moves O(k × blocks) rows. The uniform is
    ``((splitmix64(doc_id + salt) >> 11) + 1) / 2^53`` (exact double in
    (0, 1], identical bit arithmetic in the SQL twin); keys round to 6
    digits before ranking to absorb the one libm ``ln`` call, ties
    broken by doc_id."""
    from ..stages.keyed import splitmix64

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])

    def local_bottomk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "key": pa.array([], pa.float64())}
        )
        if t.num_rows == 0:
            return empty
        ids = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        w = np.asarray(t["n_chars"].combine_chunks().cast(pa.int64())).astype(
            np.float64
        )
        # zero/negative-weight docs are never sampled (the SQL twin filters
        # them the same way — -ln(u)/0 would be inf here but NULL in SQL)
        pos = w > 0.0
        ids, w = ids[pos], w[pos]
        if not len(ids):
            return empty
        h = splitmix64(ids.astype(np.uint64) + np.uint64(WSAMPLE_SALT))
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / 9007199254740992.0
        key = round6(-np.log(u) / w)
        order = np.lexsort((ids, key))[:WSAMPLE_K]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "key": pa.array(key[order], pa.float64()),
            }
        )

    cands = ds.map_batches(
        local_bottomk, batch_format="pyarrow", zero_copy_batch=True
    )

    def final_cut(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks())
        key = np.asarray(t["key"].combine_chunks())
        order = np.lexsort((ids, key))[:WSAMPLE_K]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "key": pa.array(key[order], pa.float64()),
                "rk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return cands.repartition(1).map_batches(
        final_cut, batch_format="pyarrow", batch_size=None
    )


def _wsample_sql() -> str:
    from .queries_relational import splitmix64_hash_sql

    return f"""
WITH {splitmix64_hash_sql('doc_id', 'documents', WSAMPLE_SALT, '__w')},
k AS (
    SELECT doc_id,
           ROUND(-ln(((__wh >> 11) + 1)::DOUBLE / 9007199254740992.0)
                 / n_chars::DOUBLE, 6) AS key
    FROM __w5 WHERE n_chars > 0
)
SELECT doc_id, key,
       CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS rk
FROM k ORDER BY key, doc_id LIMIT {WSAMPLE_K}
"""


DOCS_SAMPLE_WEIGHTED_K_SQL = _wsample_sql()


REGISTRY: dict[str, tuple] = {
    "docs_sample_weighted_k": (q_docs_sample_weighted_k, DOCS_SAMPLE_WEIGHTED_K_SQL),
    "docs_bm25": (q_docs_bm25, DOCS_BM25_SQL),
    "docs_global_rank": (q_docs_global_rank, DOCS_GLOBAL_RANK_SQL),
    "docs_epoch_order": (q_docs_epoch_order, DOCS_EPOCH_ORDER_SQL),
    "events_zorder": (q_events_zorder, EVENTS_ZORDER_SQL),
    "events_value_quantiles": (
        q_events_value_quantiles,
        EVENTS_VALUE_QUANTILES_SQL,
    ),
    "docs_sorted_neighborhood": (
        q_docs_sorted_neighborhood,
        DOCS_SORTED_NEIGHBORHOOD_SQL,
    ),
    "docs_fuzzy_pairs": (q_docs_fuzzy_pairs, DOCS_FUZZY_PAIRS_SQL),
    "events_funnel": (q_events_funnel, EVENTS_FUNNEL_SQL),
    "docs_tfidf_top_terms": (q_docs_tfidf_top_terms, DOCS_TFIDF_SQL),
    "docs_commonness": (q_docs_commonness, DOCS_COMMONNESS_SQL),
    "docs_bigram_lm": (q_docs_bigram_lm, DOCS_BIGRAM_LM_SQL),
    "docs_sample_stratified": (q_docs_sample_stratified, DOCS_SAMPLE_STRATIFIED_SQL),
    "docs_sample_weighted": (q_docs_sample_weighted, DOCS_SAMPLE_WEIGHTED_SQL),
    "docs_neardup_filter": (q_docs_neardup_filter, DOCS_NEARDUP_FILTER_SQL),
    "docs_topk_per_lang": (q_docs_topk_per_lang, DOCS_TOPK_PER_LANG_SQL),
    "docs_len_quantiles": (q_docs_len_quantiles, DOCS_LEN_QUANTILES_SQL),
    "events_pivot": (q_events_pivot, EVENTS_PIVOT_SQL),
    "range_join": (q_range_join, RANGE_JOIN_SQL),
}

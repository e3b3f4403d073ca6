"""Third batch of training-data curation operators: within-document
repetition scoring (the Gopher-style duplicate-n-gram quality signal),
test-set decontamination (n-gram overlap against a held-out set), and
semi-structured JSON field extraction + aggregate over the events
stream. Every operator has an exact DuckDB twin.

Scale shapes:

- ``docs_repetition``: zero shuffles — grams are per-document and docs
  are whole per batch, so the stage streams; per-(doc, gram) counting is
  one Arrow C++ hash aggregation per batch.
- ``docs_decontam``: the held-out/test gram set is built once from the
  (definitionally small) test slice, deduped per batch, unioned on the
  driver and broadcast via ``ray.put`` — the train-side scan then streams
  with one vectorized ``is_in`` + segment-sum per batch and never
  shuffles. Assumption (documented): the contamination reference set is
  a bounded eval set (thousands of docs), not a second corpus; for a
  corpus-vs-corpus overlap use the shuffle join in ``queries_text``.
- ``events_json_extract``: per-batch regex extraction collapses the
  stream to (event_type) partials; the exchange moves O(types), never
  O(events).

Reference parity: the reference's silver job parses semi-structured
event payloads into typed columns before aggregation
(/root/reference/spark_jobs/silver_and_gold.py:36-61); decontamination
and repetition scoring are the LLM-corpus analogues of its validity
filters (silver_and_gold.py:47-52).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import _flat_tokens, tokens_list
from ..sources.reads import read_parquet_sized
from ..stages.keyed import map_partitions_by_key
from .queries_extra import NUM_PARTS, _docs
from ..functions.numeric import round6

# --------------------------------------------------------------------------
# Shared vectorized n-gram builder
# --------------------------------------------------------------------------


def _doc_grams(t: pa.Table, k: int):
    """Per-document token ``k``-grams, fully vectorized.

    Returns ``(ids, doc_of_gram, grams, n_grams)`` where ``ids`` is the
    int64 doc_id column, ``doc_of_gram`` maps each gram to its row index
    in the batch, ``grams`` is a flat StringArray of space-joined grams
    and ``n_grams`` the per-row gram count (``max(len - k + 1, 0)``).
    """
    ids = t["doc_id"].combine_chunks().cast(pa.int64())
    flat, offsets = _flat_tokens(tokens_list(t["text"]))
    lens = offsets[1:] - offsets[:-1]
    n_grams = np.maximum(lens - (k - 1), 0).astype(np.int64)
    total = int(n_grams.sum())
    if total == 0 or len(flat) < k:
        return ids, np.zeros(0, np.int64), pa.array([], pa.string()), n_grams
    # gram starting at flat position p joins tokens p .. p+k-1; valid
    # starts never cross a doc boundary because n_grams caps them.
    width = len(flat) - k + 1
    joined = pc.binary_join_element_wise(
        *(flat.slice(i, width) for i in range(k)), " "
    )
    doc_of_gram = np.repeat(np.arange(len(lens), dtype=np.int64), n_grams)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(n_grams) - n_grams, n_grams
    )
    pos = offsets[:-1].astype(np.int64)[doc_of_gram] + within
    grams = pc.take(joined, pa.array(pos, pa.int64()))
    return ids, doc_of_gram, grams, n_grams


# --------------------------------------------------------------------------
# Within-document repetition scoring (duplicate-n-gram fraction)
# --------------------------------------------------------------------------

REP_K = 3  # gram width
REP_MAX_DUP = 0.005  # keep docs whose duplicate-gram fraction is <= this

_REP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_grams", pa.int64()),
        ("n_distinct", pa.int64()),
        ("dup_gram_frac", pa.float64()),
        ("top_gram_frac", pa.float64()),
        ("keep", pa.bool_()),
    ]
)


def q_docs_repetition(sf_dir: str):
    """Duplicate-``REP_K``-gram fraction + most-frequent-gram fraction per
    document — the classic within-document repetition quality signal for
    LLM corpus curation. Zero shuffles; one Arrow hash aggregation per
    batch. Documents shorter than ``REP_K`` tokens are dropped (they have
    no grams), mirroring the SQL twin."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        ids, doc_of_gram, grams, _ = _doc_grams(t, REP_K)
        if len(doc_of_gram) == 0:
            return _REP_SCHEMA.empty_table()
        per = (
            pa.table({"d": pa.array(doc_of_gram), "g": grams})
            .group_by(["d", "g"])
            .aggregate([("g", "count")])
        )
        s = per.group_by("d").aggregate(
            [("g_count", "sum"), ("g_count", "count"), ("g_count", "max")]
        )
        n = np.asarray(s["g_count_sum"]).astype(np.int64)
        nd = np.asarray(s["g_count_count"]).astype(np.int64)
        top = np.asarray(s["g_count_max"]).astype(np.int64)
        dup = round6((n - nd) / n)
        return pa.table(
            {
                "doc_id": ids.take(s["d"]),
                "n_grams": pa.array(n, pa.int64()),
                "n_distinct": pa.array(nd, pa.int64()),
                "dup_gram_frac": pa.array(dup, pa.float64()),
                "top_gram_frac": pa.array(round6(top / n), pa.float64()),
                "keep": pa.array(dup <= REP_MAX_DUP),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


DOCS_REPETITION_SQL = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
g AS (
    SELECT doc_id, array_to_string(ts[i : i + {REP_K - 1}], ' ') AS gram
    FROM tok, unnest(range(1, len(ts) - {REP_K - 2})) AS t(i)
),
c AS (
    SELECT doc_id, gram, count(*)::BIGINT AS cnt FROM g GROUP BY doc_id, gram
),
s AS (
    SELECT doc_id, sum(cnt)::BIGINT AS n_grams, count(*)::BIGINT AS n_distinct,
           max(cnt)::BIGINT AS top_cnt
    FROM c GROUP BY doc_id
)
SELECT doc_id, n_grams, n_distinct,
       round((n_grams - n_distinct) / n_grams::DOUBLE, 6) AS dup_gram_frac,
       round(top_cnt / n_grams::DOUBLE, 6) AS top_gram_frac,
       round((n_grams - n_distinct) / n_grams::DOUBLE, 6) <= {REP_MAX_DUP}
           AS keep
FROM s
"""


# --------------------------------------------------------------------------
# Test-set decontamination (held-out n-gram overlap)
# --------------------------------------------------------------------------

DECON_K = 4  # gram width
DECON_MOD = 97  # doc_id % DECON_MOD == 0 defines the held-out slice

_DECON_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_grams", pa.int64()),
        ("n_hit", pa.int64()),
        ("hit_frac", pa.float64()),
        ("contaminated", pa.bool_()),
    ]
)


def _test_gram_set(sf_dir: str) -> pa.Array:
    """Distinct ``DECON_K``-grams of the held-out slice. Per-batch dedup
    partials stream off the workers; the driver unions the (small) set
    once. Bounded by the eval-set size, not the corpus."""

    def partial(t: pa.Table) -> pa.Table:
        # modulo filter (Arrow compute has no %, use numpy)
        ids = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        t = t.filter(pa.array(ids % DECON_MOD == 0))
        _, _, grams, _ = _doc_grams(t, DECON_K)
        return pa.table({"gram": pc.unique(grams)})

    parts = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    batches = [b["gram"] for b in parts.iter_batches(batch_format="pyarrow")]
    if not batches:
        return pa.array([], pa.string())
    return pc.unique(pa.concat_arrays([b.combine_chunks() for b in batches]))


def q_docs_decontam(sf_dir: str):
    """Per-train-document count of ``DECON_K``-grams that appear anywhere
    in the held-out slice (``doc_id % DECON_MOD == 0``) — the standard
    benchmark-decontamination pass. The gram set is broadcast via
    ``ray.put``; the train scan is zero-shuffle (one ``is_in`` +
    segment-sum per batch)."""
    import ray

    ref = ray.put(_test_gram_set(sf_dir))
    ds = _docs(sf_dir, columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        test_grams = ray.get(ref)
        ids_np = np.asarray(t["doc_id"].combine_chunks().cast(pa.int64()))
        t = t.filter(pa.array(ids_np % DECON_MOD != 0))
        ids, doc_of_gram, grams, n_grams = _doc_grams(t, DECON_K)
        if len(t) == 0:
            return _DECON_SCHEMA.empty_table()
        hits = np.zeros(len(grams), np.int64)
        if len(grams) and len(test_grams):
            hits = np.asarray(pc.is_in(grams, value_set=test_grams)).astype(
                np.int64
            )
        cs = np.concatenate(([0], np.cumsum(hits)))
        bounds = np.concatenate(([0], np.cumsum(n_grams)))
        n_hit = cs[bounds[1:]] - cs[bounds[:-1]]
        keepers = n_grams > 0  # docs shorter than K have no grams (SQL parity)
        n, h = n_grams[keepers], n_hit[keepers]
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids)[keepers], pa.int64()),
                "n_grams": pa.array(n, pa.int64()),
                "n_hit": pa.array(h, pa.int64()),
                "hit_frac": pa.array(round6(h / n), pa.float64()),
                "contaminated": pa.array(h > 0),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


DOCS_DECONTAM_SQL = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
g AS (
    SELECT doc_id, array_to_string(ts[i : i + {DECON_K - 1}], ' ') AS gram
    FROM tok, unnest(range(1, len(ts) - {DECON_K - 2})) AS t(i)
),
test AS (
    SELECT DISTINCT gram FROM g WHERE doc_id % {DECON_MOD} = 0
),
tr AS (
    SELECT doc_id,
           count(*)::BIGINT AS n_grams,
           count(*) FILTER (gram IN (SELECT gram FROM test))::BIGINT AS n_hit
    FROM g WHERE doc_id % {DECON_MOD} <> 0 GROUP BY doc_id
)
SELECT doc_id, n_grams, n_hit,
       round(n_hit / n_grams::DOUBLE, 6) AS hit_frac,
       n_hit > 0 AS contaminated
FROM tr
"""


# --------------------------------------------------------------------------
# JSON field extraction + aggregate (semi-structured events)
# --------------------------------------------------------------------------

_JSON_PAT = r'"k": (?P<k>\d+)'


def q_events_json_extract(sf_dir: str):
    """Extract the integer ``k`` field from the JSON ``props`` payload and
    aggregate per event type — the typed-column promotion the reference's
    silver job performs on raw event payloads. Per-batch regex extraction
    + partial aggregation; the exchange moves O(event types)."""
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"].combine_chunks(), _JSON_PAT)
        k = pc.struct_field(ex, "k").cast(pa.int64())
        tt = pa.table(
            {"event_type": t["event_type"].combine_chunks(), "k": k}
        ).filter(pc.is_valid(k))
        return tt.group_by("event_type").aggregate(
            [("k", "sum"), ("k", "count"), ("k", "max")]
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def finalize(part: pa.Table) -> pa.Table:
        g = part.group_by("event_type").aggregate(
            [("k_sum", "sum"), ("k_count", "sum"), ("k_max", "max")]
        )
        s = np.asarray(g["k_sum_sum"]).astype(np.int64)
        n = np.asarray(g["k_count_sum"]).astype(np.int64)
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pa.array(n, pa.int64()),
                "sum_k": pa.array(s, pa.int64()),
                "max_k": g["k_max_max"].cast(pa.int64()),
                "avg_k": pa.array(round6(s / n), pa.float64()),
            }
        )

    return map_partitions_by_key(
        partials, "event_type", finalize, num_parts=NUM_PARTS
    )


EVENTS_JSON_EXTRACT_SQL = r"""
WITH x AS (
    SELECT event_type,
           TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
    FROM events
)
SELECT event_type, count(k)::BIGINT AS n, sum(k)::BIGINT AS sum_k,
       max(k)::BIGINT AS max_k,
       round(sum(k)::DOUBLE / count(k), 6) AS avg_k
FROM x WHERE k IS NOT NULL GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Text canonicalization: unicode-aware lowercase + whitespace collapse
# --------------------------------------------------------------------------


def q_docs_normalize(sf_dir: str):
    """Canonicalize document text: unicode-aware lowercase, collapse any
    whitespace run to a single space, trim — the standard pre-dedup /
    pre-tokenization cleanup pass. Zero shuffles: a pure streamed Arrow
    map (RE2 on both sides, so replace semantics agree exactly). NFC
    composition is intentionally omitted: this pyarrow's utf8_normalize
    does not compose combining sequences, so there is no exact
    distributed kernel for it; the corpus is ASCII."""
    from ..sources.reads import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def norm(t: pa.Table) -> pa.Table:
        from ..functions.text import normalize_text

        txt = t["text"].combine_chunks()
        out = normalize_text(txt)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_norm": out,
                "n_chars_norm": pc.cast(pc.utf8_length(out), pa.int64()),
                "changed": pc.cast(pc.not_equal(out, txt), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


DOCS_NORMALIZE_SQL = r"""
WITH n AS (
    SELECT doc_id, text,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_norm
    FROM documents
)
SELECT doc_id, text_norm,
       CAST(length(text_norm) AS BIGINT) AS n_chars_norm,
       CAST(text_norm <> text AS BIGINT) AS changed
FROM n
"""


MIXTURE_BUDGET = 800  # tokens per source (~55% of the fixture's per-source mass)


def q_docs_mixture_budget(sf_dir: str):
    """Data-mixture construction: cap every source (domain) at a fixed
    token budget, keeping its highest-priority documents first
    (longest-first with doc_id tiebreak here; the priority key is a
    parameter). This is the per-domain token-quota step of training-
    mixture recipes — distinct from a count cap (``docs_topk_per_lang``)
    and from global contiguous sharding (``docs_pack_bins``).

    Scale shape: per-batch token counts ride with (doc_id, source) —
    the text itself never shuffles; ONE source-keyed exchange co-locates
    each domain, then a segmented sort + per-segment cumulative sum
    takes the budgeted prefix. Output is (doc, tokens, cumulative) so
    the cut is auditable."""
    from ..functions.text import token_count

    docs = _docs(sf_dir, columns=["doc_id", "source", "n_chars", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "n_chars": t["n_chars"],
                "n_tok": pa.array(
                    token_count(t["text"].combine_chunks()), pa.int64()
                ),
            }
        )

    slim = docs.map_batches(tokens, batch_format="pyarrow", zero_copy_batch=True)

    def budget_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "n_tok": pa.array([], pa.int64()),
                "cum_tok": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        enc = pc.dictionary_encode(t["source"].combine_chunks())
        src = np.asarray(enc.indices).astype(np.int64)
        did = np.asarray(t["doc_id"].combine_chunks())
        nch = np.asarray(t["n_chars"].combine_chunks())
        ntk = np.asarray(t["n_tok"].combine_chunks())
        order = np.lexsort((did, -nch, src))
        src, did, ntk = src[order], did[order], ntk[order]
        head = np.concatenate(([True], src[1:] != src[:-1]))
        cum = np.cumsum(ntk)
        seg_base = np.where(head, cum - ntk, 0)
        np.maximum.accumulate(seg_base, out=seg_base)
        cum = cum - seg_base  # per-segment inclusive running total
        keep = cum <= MIXTURE_BUDGET
        sel = pa.array(order[keep])
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().take(sel),
                "source": t["source"].combine_chunks().take(sel),
                "n_tok": pa.array(ntk[keep], pa.int64()),
                "cum_tok": pa.array(cum[keep], pa.int64()),
            }
        )

    return map_partitions_by_key(slim, "source", budget_part, num_parts=NUM_PARTS)


DOCS_MIXTURE_BUDGET_SQL = f"""
WITH tok AS (
    SELECT doc_id, source, n_chars,
           length(string_split(text, ' '))::BIGINT AS n_tok
    FROM documents
),
r AS (
    SELECT doc_id, source, n_tok,
           sum(n_tok) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
               ROWS UNBOUNDED PRECEDING
           )::BIGINT AS cum_tok
    FROM tok
)
SELECT doc_id, source, n_tok, cum_tok
FROM r WHERE cum_tok <= {MIXTURE_BUDGET}
"""


def q_docs_curation_e2e(sf_dir: str):
    """Flagship composed curation pipeline — the chain a training-data
    run actually executes, fused into the minimal number of passes:

    1. normalize (lowercase, whitespace collapse, trim) — streamed;
    2. Gopher-rules quality filter ON the normalized text — fused into
       the SAME streamed map (integer-arithmetic keep decision);
    3. exact dedup on normalized text, keep-min doc_id — the pipeline's
       ONE exchange, keyed on the text hash.

    At 100 TB this is one read-speed pass plus one dedup shuffle whose
    payload is already quality-filtered and carries only (text_norm,
    doc_id, stats) — the composition order (filter before shuffle) is
    the point."""
    import aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.functions.text as T
    from .queries_text import (
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_TOKENS,
    )

    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        txt = T.normalize_text(t["text"])
        keep, nt, nc = T.gopher_keep(
            txt,
            min_tokens=GOPHER_MIN_TOKENS,
            max_tokens=GOPHER_MAX_TOKENS,
            min_mean_len=GOPHER_MIN_MEAN_LEN,
            max_mean_len=GOPHER_MAX_MEAN_LEN,
            min_stopwords=GOPHER_MIN_STOPWORDS,
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                "text_norm": txt,
                "n_tokens": pa.array(nt),
                "n_chars_norm": pa.array(nc),
            }
        ).filter(pa.array(keep))

    slim = docs.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def dedup_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_chars_norm": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        codes = np.asarray(
            pc.dictionary_encode(t["text_norm"].combine_chunks()).indices
        ).astype(np.int64)
        did = np.asarray(t["doc_id"].combine_chunks())
        order = np.lexsort((did, codes))
        c = codes[order]
        first = np.concatenate(([True], c[1:] != c[:-1]))
        sel = pa.array(order[first])
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().take(sel),
                "n_tokens": t["n_tokens"].combine_chunks().take(sel),
                "n_chars_norm": t["n_chars_norm"].combine_chunks().take(sel),
            }
        )

    return map_partitions_by_key(slim, "text_norm", dedup_part, num_parts=NUM_PARTS)


def q_docs_curation_funnel(sf_dir: str):
    """Curation funnel report: how many documents survive each stage of
    the e2e chain — total → Gopher quality filter → exact-dedup distinct
    — the per-run observability table a data-curation team watches to
    catch a filter suddenly eating the corpus.

    Scale shape: the total rides the Parquet metadata count; quality and
    distinct come from ONE filtered pass + ONE hash exchange on the
    normalized text (same shape as the e2e pipeline itself), with each
    partition emitting two scalar partials — the driver folds O(parts)
    rows."""
    import aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.functions.text as T
    from .queries_text import (
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_TOKENS,
    )

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    n_total = docs.count()

    def prep(t: pa.Table) -> pa.Table:
        txt = T.normalize_text(t["text"])
        keep, _, _ = T.gopher_keep(
            txt,
            min_tokens=GOPHER_MIN_TOKENS,
            max_tokens=GOPHER_MAX_TOKENS,
            min_mean_len=GOPHER_MIN_MEAN_LEN,
            max_mean_len=GOPHER_MAX_MEAN_LEN,
            min_stopwords=GOPHER_MIN_STOPWORDS,
        )
        return pa.table({"text_norm": txt}).filter(pa.array(keep))

    slim = docs.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def count_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "q_n": pa.array([], pa.int64()),
                    "d_n": pa.array([], pa.int64()),
                }
            )
        uniq = pc.count_distinct(t["text_norm"].combine_chunks()).as_py()
        return pa.table(
            {
                "q_n": pa.array([t.num_rows], pa.int64()),
                "d_n": pa.array([int(uniq)], pa.int64()),
            }
        )

    parts = map_partitions_by_key(
        slim, "text_norm", count_part, num_parts=NUM_PARTS
    ).take_all()  # O(partitions) rows
    n_quality = sum(r["q_n"] for r in parts)
    n_distinct = sum(r["d_n"] for r in parts)
    return pa.table(
        {
            "stage": pa.array(["total", "quality", "distinct"], pa.string()),
            "n_docs": pa.array(
                [n_total, n_quality, n_distinct], pa.int64()
            ),
        }
    )


def _curation_funnel_sql() -> str:
    from .queries_text import (
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_TOKENS,
        _STOP_IN,
    )

    return rf"""
WITH n AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_norm
    FROM documents
),
m AS (
    SELECT doc_id, text_norm,
        length(string_split(text_norm, ' '))::BIGINT AS n_tokens,
        (length(text_norm)
         - (length(string_split(text_norm, ' ')) - 1))::BIGINT AS alpha_len,
        len(list_filter(string_split(text_norm, ' '),
            x -> x IN ({_STOP_IN})))::BIGINT AS stop_cnt
    FROM n
),
f AS (
    SELECT * FROM m
    WHERE n_tokens >= {GOPHER_MIN_TOKENS} AND n_tokens <= {GOPHER_MAX_TOKENS}
      AND alpha_len >= {GOPHER_MIN_MEAN_LEN} * n_tokens
      AND alpha_len <= {GOPHER_MAX_MEAN_LEN} * n_tokens
      AND stop_cnt >= {GOPHER_MIN_STOPWORDS}
)
SELECT 'total' AS stage, (SELECT count(*) FROM documents)::BIGINT AS n_docs
UNION ALL SELECT 'quality', count(*)::BIGINT FROM f
UNION ALL SELECT 'distinct', count(DISTINCT text_norm)::BIGINT FROM f
"""


def _curation_e2e_ctes() -> str:
    """WITH-body of the e2e chain up to CTE ``surv`` (the surviving
    normalized-deduped set) — shared by the e2e twin and the to-shards
    composition."""
    from .queries_text import (
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_TOKENS,
        _STOP_IN,
    )

    return rf"""
n AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_norm
    FROM documents
),
m AS (
    SELECT doc_id, text_norm,
        length(string_split(text_norm, ' '))::BIGINT AS n_tokens,
        (length(text_norm)
         - (length(string_split(text_norm, ' ')) - 1))::BIGINT AS alpha_len,
        len(list_filter(string_split(text_norm, ' '),
            x -> x IN ({_STOP_IN})))::BIGINT AS stop_cnt
    FROM n
),
f AS (
    SELECT * FROM m
    WHERE n_tokens >= {GOPHER_MIN_TOKENS} AND n_tokens <= {GOPHER_MAX_TOKENS}
      AND alpha_len >= {GOPHER_MIN_MEAN_LEN} * n_tokens
      AND alpha_len <= {GOPHER_MAX_MEAN_LEN} * n_tokens
      AND stop_cnt >= {GOPHER_MIN_STOPWORDS}
),
d AS (
    SELECT doc_id, n_tokens, length(text_norm)::BIGINT AS n_chars_norm,
           row_number() OVER (PARTITION BY text_norm ORDER BY doc_id) AS rn
    FROM f
),
surv AS (
    SELECT doc_id, n_tokens, n_chars_norm FROM d WHERE rn = 1
)"""


def _curation_e2e_sql() -> str:
    return f"""
WITH {_curation_e2e_ctes()}
SELECT doc_id, n_tokens, n_chars_norm FROM surv
"""


def q_docs_curation_to_shards(sf_dir: str):
    """The composed finale of the curation chain — what a 100-TB run
    actually DELIVERS: every surviving document (normalized → Gopher
    quality-filtered → exact-deduped, :func:`q_docs_curation_e2e`)
    assigned its epoch-0 training shard and in-shard position via the
    same seeded splitmix64 permutation as ``docs_epoch_order``. Two
    exchanges end to end: the e2e dedup exchange (keyed on normalized
    text) over the filtered stream, then the shard-position exchange
    moving only O(survivors) slim rows."""
    from ..stages.keyed import splitmix64
    from .queries_extra import N_SHARDS
    from .queries_relational import SPLIT_SALT

    surv = q_docs_curation_e2e(sf_dir)

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].combine_chunks()).astype(np.uint64)
        h = splitmix64(ids + np.uint64(SPLIT_SALT))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "shard": pa.array((h % np.uint64(N_SHARDS)).astype(np.int64)),
                "__h": pa.array(h.view(np.int64)),
            }
        )

    tagged = surv.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def pos_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        sh = np.asarray(t["shard"].combine_chunks())
        h = np.asarray(t["__h"].combine_chunks()).view(np.uint64)
        ids = np.asarray(t["doc_id"].combine_chunks())
        ntok = np.asarray(t["n_tokens"].combine_chunks())
        order = np.lexsort((ids, h, sh))
        ks = sh[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        seg_len = np.diff(np.r_[starts, len(ks)])
        pos = np.arange(len(ks), dtype=np.int64) - np.repeat(starts, seg_len)
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "n_tokens": pa.array(ntok[order]),
                "shard": pa.array(ks),
                "pos": pa.array(pos),
            }
        )

    return map_partitions_by_key(tagged, "shard", pos_part, num_parts=NUM_PARTS)


def _curation_to_shards_sql() -> str:
    from .queries_extra import N_SHARDS
    from .queries_relational import SPLIT_SALT, splitmix64_hash_sql

    return f"""
WITH {_curation_e2e_ctes()},
{splitmix64_hash_sql('doc_id', 'surv', SPLIT_SALT, '__g')}
SELECT doc_id, n_tokens, (__gh % {N_SHARDS})::BIGINT AS shard,
       (row_number() OVER (PARTITION BY __gh % {N_SHARDS}
                           ORDER BY __gh, doc_id) - 1)::BIGINT AS pos
FROM __g5
"""


REGISTRY = {
    "docs_curation_e2e": (q_docs_curation_e2e, _curation_e2e_sql()),
    "docs_curation_to_shards": (q_docs_curation_to_shards, _curation_to_shards_sql()),
    "docs_curation_funnel": (q_docs_curation_funnel, _curation_funnel_sql()),
    "docs_mixture_budget": (q_docs_mixture_budget, DOCS_MIXTURE_BUDGET_SQL),
    "docs_repetition": (q_docs_repetition, DOCS_REPETITION_SQL),
    "docs_decontam": (q_docs_decontam, DOCS_DECONTAM_SQL),
    "events_json_extract": (q_events_json_extract, EVENTS_JSON_EXTRACT_SQL),
    "docs_normalize": (q_docs_normalize, DOCS_NORMALIZE_SQL),
}

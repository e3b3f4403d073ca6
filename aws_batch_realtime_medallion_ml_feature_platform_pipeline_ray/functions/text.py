"""Vectorized text-analysis kernels for the documents pipeline.

Large-scale training-data operators over a text column: token counting,
quality scoring (stopword/length ratios), n-gram heuristic language ID,
document fingerprinting, shingling for MinHash. All Arrow/numpy
vectorized — the only per-row Python is md5 in the *oracle-parity*
fingerprint (SQL twin requires md5); the scale path uses the vectorized
splitmix64 token hashes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.keyed import splitmix64

STOPWORDS = ("the", "a", "of", "and", "to")

# marker words per language for the n-gram/stopword language-ID heuristic;
# tie order = tuple order (deterministic, mirrored in SQL CASE chain)
LANG_MARKERS = (
    ("en", ("the", "and", "of")),
    ("fr", ("le", "la", "et")),
    ("de", ("der", "und", "die")),
    ("es", ("el", "los", "y")),
)


def tokens_list(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Split on single spaces (SQL twin: string_split(text, ' '))."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return pc.split_pattern(text, pattern=" ")


def token_count(text) -> np.ndarray:
    return np.asarray(pc.list_value_length(tokens_list(text)).cast(pa.int64()))


def normalize_text(text) -> pa.Array:
    """Canonicalize: unicode-aware lowercase, collapse whitespace runs to
    a single space, trim. RE2 on both pyarrow and DuckDB, so the SQL twin
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` agrees
    exactly. The single normalization definition — used by the standalone
    normalize query AND the composed curation pipeline."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.utf8_lower(text), pattern=r"\s+", replacement=" "
        )
    )


def gopher_keep(
    text,
    *,
    min_tokens: int,
    max_tokens: int,
    min_mean_len: int,
    max_mean_len: int,
    min_stopwords: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gopher-style structural quality rules in pure integer arithmetic
    (token count in range, mean token length via ``min*nt <= alpha <=
    max*nt``, stopword floor). Returns (keep_mask, n_tokens, n_chars).
    The single keep-predicate definition shared by the standalone filter
    and the composed curation pipeline."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = tokens_list(text)
    nt = np.asarray(pc.list_value_length(toks).cast(pa.int64()))
    nc = np.asarray(pc.utf8_length(text).cast(pa.int64()))
    alpha = nc - (nt - 1)  # chars excluding the single-space joints
    stop = member_count(toks, STOPWORDS)
    keep = (
        (nt >= min_tokens)
        & (nt <= max_tokens)
        & (alpha >= min_mean_len * nt)
        & (alpha <= max_mean_len * nt)
        & (stop >= min_stopwords)
    )
    return keep, nt, nc


def _flat_tokens(toks: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Flatten a list<string> array; return (flat values, per-list offsets)."""
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = np.asarray(toks.offsets)
    return toks.flatten(), offsets


def gram_explode(
    flat: pa.Array, offsets: np.ndarray, k: int
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Word-``k``-gram explode over flattened tokens: returns
    ``(gram, pos, len_per_tok, keep)`` with one candidate gram per token
    position (shift-and-join, '' padding per shift) and
    ``keep = pos <= len - k`` masking positions whose gram would cross a
    document boundary. Shared by the boilerplate-ngram and span-coverage
    partials so tokenization/padding/boundary logic can't diverge."""
    n_tok = len(flat)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    parts = [flat]
    for j in range(1, k):
        pad = pa.array([""] * j, pa.string())
        parts.append(pa.concat_arrays([flat.slice(j), pad]))
    gram = pc.binary_join_element_wise(*parts, " ")
    pos = np.arange(n_tok, dtype=np.int64) - np.repeat(
        offsets[:-1].astype(np.int64), lens
    )
    len_per_tok = np.repeat(lens, lens)
    keep = pos <= len_per_tok - k
    return gram, pos, len_per_tok, keep


def member_count(toks: pa.Array, vocab: tuple[str, ...]) -> np.ndarray:
    """Per-document count of tokens in ``vocab`` — flatten + is_in +
    segment-sum via np.add.reduceat (no Python per row)."""
    flat, offsets = _flat_tokens(toks)
    if len(flat) == 0:
        return np.zeros(max(len(offsets) - 1, 0), dtype=np.int64)
    hits = np.asarray(
        pc.is_in(flat, value_set=pa.array(vocab, pa.string()))
    ).astype(np.int64)
    cs = np.concatenate(([0], np.cumsum(hits)))
    return cs[offsets[1:]] - cs[offsets[:-1]]


def quality_metrics(text) -> dict[str, np.ndarray]:
    """Token count, char count, avg token length, stopword ratio —
    the classic cheap quality-scoring features."""
    toks = tokens_list(text)
    n_tok = np.asarray(pc.list_value_length(toks).cast(pa.int64()))
    n_chars = np.asarray(pc.utf8_length(text if isinstance(text, pa.Array) else text.combine_chunks()).cast(pa.int64()))
    stop = member_count(toks, STOPWORDS)
    n_tok_f = n_tok.astype(np.float64)
    # single divisions of exactly-representable ints: bit-identical to the
    # SQL twin without rounding
    return {
        "n_tokens": n_tok,
        "n_chars_c": n_chars,
        "avg_token_len": (n_chars - (n_tok - 1)).astype(np.float64) / n_tok_f,
        "stopword_ratio": stop.astype(np.float64) / n_tok_f,
    }


def lang_id(text) -> pa.Array:
    """Heuristic language ID: most marker-word hits wins; ties and
    zero-hit rows fall back to 'und'. Tie order = LANG_MARKERS order,
    strictly-greater comparison (mirrored in the SQL CASE chain)."""
    toks = tokens_list(text)
    n = len(toks)
    best = np.full(n, "und", dtype=object)
    best_hits = np.zeros(n, dtype=np.int64)
    for lang, markers in LANG_MARKERS:
        hits = member_count(toks, markers)
        better = hits > best_hits
        best[better] = lang
        best_hits = np.where(better, hits, best_hits)
    return pa.array(best, pa.string())


def lang_id_sql_case(col: str = "text") -> tuple[str, str]:
    """The DuckDB twin of lang_id(): returns (per-language hit-count
    SELECT expressions, first-strictly-greater CASE chain)."""
    hit_exprs = {
        lang: (
            "len(list_filter(string_split("
            f"{col}, ' '), x -> x IN ({', '.join(repr(m) for m in markers)})))"
        )
        for lang, markers in LANG_MARKERS
    }
    h = {lang: f"h_{lang}" for lang, _ in LANG_MARKERS}
    selects = ", ".join(f"{e} AS {h[lang]}" for lang, e in hit_exprs.items())
    langs = [lang for lang, _ in LANG_MARKERS]
    # lang wins iff its hits > all previous langs' hits and > all later
    # langs' hits - 1 (i.e. >=), matching the sequential argmax above
    whens = []
    for i, lang in enumerate(langs):
        conds = [f"{h[lang]} > 0"]
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"{h[lang]} > {h[other]}")
            elif j > i:
                conds.append(f"{h[lang]} >= {h[other]}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + " ELSE 'und' END"
    return selects, case


def md5_hex(values) -> pa.Array:
    """Row-wise md5 hex digest (oracle-parity path; SQL twin: md5(x))."""
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        out[i] = hashlib.md5(str(v).encode()).hexdigest()
    return pa.array(out, pa.string())


def token_hashes_md5(text) -> tuple[np.ndarray, np.ndarray]:
    """Per-document token hashes with DuckDB ``md5_number_lower`` parity
    (lower 64 bits of md5, little-endian) — the SQL-twin-able hash basis
    for SimHash. md5 runs once per DISTINCT token via dictionary
    encoding, then gathers; the Python loop touches the batch vocabulary,
    not the token stream (vocab << tokens at scale). Pipelines that don't
    need an oracle can swap in :func:`shingle_hashes`' vectorized siphash
    basis — the downstream kernels are hash-agnostic."""
    toks = tokens_list(text)
    flat, offsets = _flat_tokens(toks)
    if len(flat) == 0:
        return np.empty(0, np.uint64), offsets
    enc = pc.dictionary_encode(flat)
    dic = enc.dictionary.to_pylist()
    uh = np.empty(len(dic), np.uint64)
    for i, s in enumerate(dic):
        uh[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
    idx = np.asarray(enc.indices).astype(np.int64)
    return uh[idx], offsets


def shingle_hashes_md5(text, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word k-gram shingle hashes with an exact SQL twin: token hashes
    via md5-lower-64 (once per distinct token, see
    :func:`token_hashes_md5`), k-gram combination via the same shifted
    splitmix64 mixing as :func:`shingle_hashes`. Full windows only —
    docs with < k tokens contribute no shingles (matching the n-gram
    SQL semantics), unlike the siphash variant's wrap-around window."""
    from ..stages.keyed import splitmix64

    g, offsets = token_hashes_md5(text)
    n_docs = len(offsets) - 1
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    if len(g) == 0:
        return np.empty(0, np.uint64), np.zeros(n_docs + 1, dtype=offsets.dtype)
    acc = splitmix64(g)
    for j in range(1, k):
        shifted = np.roll(g, -j)
        acc = splitmix64(acc ^ splitmix64(shifted + np.uint64(j)))
    doc_id_per_tok = np.repeat(np.arange(n_docs), lens)
    pos_in_doc = np.arange(len(g)) - np.repeat(offsets[:-1].astype(np.int64), lens)
    keep = pos_in_doc <= np.repeat(lens, lens) - k
    sh = acc[keep]
    sh_doc = doc_id_per_tok[keep]
    new_offsets = np.concatenate(
        ([0], np.cumsum(np.bincount(sh_doc, minlength=n_docs)))
    )
    return sh, new_offsets


def shingle_hashes(text, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word k-gram shingle hash sets per document.

    Returns (flat uint64 shingle hashes, doc offsets). Vectorized:
    token hashes via pandas' stable siphash, k-gram combination via
    shifted splitmix64 mixing — no per-row Python.
    """
    import pandas as pd

    toks = tokens_list(text)
    flat, offsets = _flat_tokens(toks)
    tok_hash = pd.util.hash_array(
        flat.to_pandas().to_numpy(dtype=object), categorize=True
    ).astype(np.uint64)
    n_docs = len(offsets) - 1
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    # k-gram hash: mix(h_i, h_{i+1}, ..., h_{i+k-1}) with position salts
    g = tok_hash.copy()
    acc = splitmix64(g)
    for j in range(1, k):
        shifted = np.roll(g, -j)
        acc = splitmix64(acc ^ splitmix64(shifted + np.uint64(j)))
    # FULL windows only, like the md5 twin: a wrap-around window for a
    # short doc (< k tokens) would mix in the NEXT document's token
    # hashes via the roll, making the signature depend on batch
    # composition — short docs contribute no shingles instead
    doc_id_per_tok = np.repeat(np.arange(n_docs), lens)
    pos_in_doc = np.arange(len(g)) - np.repeat(offsets[:-1].astype(np.int64), lens)
    keep = pos_in_doc <= np.repeat(lens, lens) - k
    sh = acc[keep]
    sh_doc = doc_id_per_tok[keep]
    new_offsets = np.concatenate(
        ([0], np.cumsum(np.bincount(sh_doc, minlength=n_docs)))
    )
    return sh, new_offsets

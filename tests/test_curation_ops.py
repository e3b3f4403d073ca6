"""Kernel/property tests for queries_curation: chunk geometry and
overlap, pack-bin scan correctness vs a direct cumsum, and batch-split
invariance of the boilerplate gram partials — properties oracle parity
alone doesn't pin down."""

import numpy as np
import pandas as pd
import pyarrow as pa

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_curation import (
    CHUNK_S,
    CHUNK_W,
    PACK_BUDGET,
    q_docs_chunk,
    q_docs_pack_bins,
)

SF = "/root/testdata/sf0.001"


def test_chunk_geometry_and_overlap(ray_session):
    df = q_docs_chunk(SF).to_pandas().sort_values(
        ["doc_id", "chunk_idx"], ignore_index=True
    )
    assert (df["n_tokens"] <= CHUNK_W).all()
    assert (df["n_tokens"] >= 1).all()
    # chunk_text token count matches n_tokens
    tok_counts = df["chunk_text"].str.split(" ").str.len()
    assert (tok_counts == df["n_tokens"]).all()
    # consecutive full chunks overlap by W - S tokens, exactly
    for doc_id, g in df.groupby("doc_id"):
        assert list(g["chunk_idx"]) == list(range(len(g)))
        toks = [t.split(" ") for t in g["chunk_text"]]
        for i in range(len(toks) - 1):
            if len(toks[i]) == CHUNK_W:
                assert toks[i][CHUNK_S:] == toks[i + 1][: CHUNK_W - CHUNK_S]
    # stride-aligned reconstruction: first S tokens of every chunk,
    # concatenated, equal the original document
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rebuilt = (
        df.assign(prefix=df["chunk_text"].str.split(" ").str[:CHUNK_S].str.join(" "))
        .groupby("doc_id")["prefix"]
        .agg(" ".join)
    )
    orig = docs.set_index("doc_id")["text"]
    assert rebuilt.sort_index().equals(orig.sort_index())


def test_pack_bins_matches_direct_cumsum(ray_session):
    df = q_docs_pack_bins(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    prefix = np.concatenate(([0], np.cumsum(df["n_tokens"].to_numpy())))[:-1]
    assert np.array_equal(df["bin_id"].to_numpy(), prefix // PACK_BUDGET)
    # bins are contiguous and non-decreasing in doc order
    assert (np.diff(df["bin_id"].to_numpy()) >= 0).all()


def test_boilerplate_partials_match_reference_and_split_invariant():
    """The vectorized gram partial equals a row-by-row Python reference,
    and summing partials over arbitrary document splits equals the
    whole-corpus partial (the exactness argument for the one groupby)."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_curation import (
        boilerplate_gram_partial,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    t_whole = pa.table(
        {"doc_id": pa.array(docs["doc_id"], pa.int64()),
         "text": pa.array(docs["text"], pa.string())}
    )

    def direct(tbl: pa.Table) -> pd.DataFrame:
        rows = []
        for did, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                rows.append((did, " ".join(toks[i : i + 3])))
        g = pd.DataFrame(rows, columns=["doc_id", "gram"])
        occ = g.groupby("gram").size()
        ndocs = g.drop_duplicates().groupby("gram").size()
        return pd.DataFrame({"occ": occ, "ndocs": ndocs})

    def kernel(tbl: pa.Table) -> pd.DataFrame:
        out = boilerplate_gram_partial(tbl).to_pandas()
        return out.set_index("gram").sort_index()

    whole_ref = direct(t_whole).sort_index()
    assert kernel(t_whole).equals(whole_ref)
    a = kernel(t_whole.slice(0, 100))
    b = kernel(t_whole.slice(100))
    summed = a.add(b, fill_value=0).astype(int)
    assert summed.sort_index().equals(whole_ref)


# ---------------------------------------------------------------------------
# duplicated-span coverage
# ---------------------------------------------------------------------------


def test_dup_span_coverage_reference(ray_session):
    """End-to-end vs a direct per-doc reference: shared word-K-grams
    (cross-doc, >= 2 distinct docs) and the union-of-intervals coverage."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_curation import (
        SPAN_K,
        q_docs_dup_span_coverage,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    gram_docs: dict[str, set] = {}
    doc_grams: dict[int, list] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        grams = [
            (" ".join(toks[i : i + SPAN_K]), i)
            for i in range(len(toks) - SPAN_K + 1)
        ]
        doc_grams[did] = [(g, p, len(toks)) for g, p in grams]
        for g, _ in grams:
            gram_docs.setdefault(g, set()).add(did)
    expect = {}
    for did, grams in doc_grams.items():
        hits = sorted(p for g, p, _ in grams if len(gram_docs[g]) >= 2)
        if not hits:
            continue
        covered = set()
        for p in hits:
            covered.update(range(p, p + SPAN_K))
        n_tok = grams[0][2]
        expect[did] = (n_tok, len(covered), len(covered) / n_tok)

    got = q_docs_dup_span_coverage(SF).to_pandas()
    assert set(got["doc_id"]) == set(expect)
    for row in got.itertuples():
        n_tok, cov, frac = expect[row.doc_id]
        assert row.n_tokens == n_tok
        assert row.covered_tokens == cov
        assert row.dup_fraction == frac


def test_span_gram_partial_block_invariance(ray_session):
    """The gram explode is per-document, so splitting the input table at
    any row boundary must produce the same (gram, doc_id, pos) rows."""
    import pyarrow.parquet as pq

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_curation import (
        span_gram_partial,
    )

    t_whole = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    whole = span_gram_partial(t_whole).to_pandas()
    parts = [
        span_gram_partial(t_whole.slice(0, 137)).to_pandas(),
        span_gram_partial(t_whole.slice(137, 200)).to_pandas(),
        span_gram_partial(t_whole.slice(337)).to_pandas(),
    ]
    split = pd.concat(parts, ignore_index=True)
    key = ["doc_id", "pos"]
    assert whole.sort_values(key, ignore_index=True).equals(
        split.sort_values(key, ignore_index=True)
    )


def test_curation_to_shards_matches_epoch0_permutation(ray_session):
    """docs_curation_to_shards is the epoch-0 seeded permutation
    restricted to the curation survivors: same shard per doc, same
    relative order within each shard, positions renumbered contiguously."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_curation2 import (
        q_docs_curation_to_shards,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        q_docs_epoch_order,
    )

    sf = "/root/testdata/sf0.001"
    shards = q_docs_curation_to_shards(sf).to_pandas()
    epoch0 = q_docs_epoch_order(sf).to_pandas()
    epoch0 = epoch0[epoch0["epoch"] == 0]

    merged = shards.merge(epoch0, on="doc_id", suffixes=("", "_e0"))
    assert len(merged) == len(shards)
    assert (merged["shard"] == merged["shard_e0"]).all()
    for _, g in shards.groupby("shard"):
        got = g.sort_values("pos")["doc_id"].tolist()
        ref = (
            epoch0[(epoch0["shard"] == g["shard"].iloc[0])
                   & epoch0["doc_id"].isin(g["doc_id"])]
            .sort_values("pos")["doc_id"]
            .tolist()
        )
        assert got == ref

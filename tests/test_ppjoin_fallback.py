"""The cogroup verify FALLBACK for the prefix-filtered similarity joins
(stages/ppjoin.py documents it as the beyond-memory path) must produce
the same pairs/scores as the broadcast-candidate verify the production
queries use."""

import numpy as np
import pyarrow as pa

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.sources.reads import (
    read_parquet_sized,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages import (
    ppjoin as P,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.dedup import (
    attach_shingles,
    ngram_table,
    pair_jaccard,
    pair_refs,
)
from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.keyed import (
    cogroup_by_key,
    map_partitions_by_key,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return read_parquet_sized(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])


def _jaccard_candidates(ds):
    grams = ds.map_batches(ngram_table, batch_format="pyarrow",
                           zero_copy_batch=True)
    dfd = map_partitions_by_key(grams, "gram", P.attach_df, num_parts=8)
    pfx = map_partitions_by_key(
        dfd, "doc_id", lambda t: P.select_prefix(t, 1, 2), num_parts=8
    )
    return map_partitions_by_key(
        pfx, "gh", lambda t: P.expand_jaccard_pairs(t, 1, 2), num_parts=8
    )


def test_cogroup_fallback_matches_broadcast_jaccard(ray_session):
    import ray

    ds = _docs()
    cand = _jaccard_candidates(ds)

    # broadcast path (production)
    ct = P.collect_candidates(cand, ("s_lo", "s_hi"))
    pref = ray.put(np.asarray(ct["pair"]))
    slo = ray.put(np.asarray(ct["s_lo"]))
    shi = ray.put(np.asarray(ct["s_hi"]))
    sets = ds.map_batches(P.gramhash_table, batch_format="pyarrow",
                          zero_copy_batch=True)
    counts = map_partitions_by_key(
        sets, "sh", lambda t: P.count_shared(t, pref), num_parts=8
    )
    bc = (
        map_partitions_by_key(
            counts, "pair",
            lambda t: P.finish_pair_scores(
                t, pref, slo, shi, "jaccard", 0.5, "jaccard"
            ),
            num_parts=8,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )

    # cogroup fallback: ship candidate docs' gram sets per pair
    cand2 = _jaccard_candidates(ds)
    refs = cand2.map_batches(pair_refs, batch_format="pyarrow",
                             zero_copy_batch=True)
    sets2 = ds.map_batches(P.gramhash_table, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = cogroup_by_key(refs, sets2, "doc_id", attach_shingles,
                            num_parts=8)
    cg = (
        map_partitions_by_key(
            joined, "pair", lambda t: pair_jaccard(t, 0.5), num_parts=8
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )

    assert len(bc) > 0
    assert (bc["doc_a"].to_numpy() == cg["doc_a"].to_numpy()).all()
    assert (bc["doc_b"].to_numpy() == cg["doc_b"].to_numpy()).all()
    assert np.array_equal(bc["jaccard"].to_numpy(), cg["jaccard"].to_numpy())


def test_cogroup_fallback_matches_broadcast_containment(ray_session):
    import ray

    ds = _docs()
    grams = ds.map_batches(ngram_table, batch_format="pyarrow",
                           zero_copy_batch=True)
    dfd = map_partitions_by_key(grams, "gram", P.attach_df, num_parts=8)
    flagged = map_partitions_by_key(
        dfd, "doc_id", lambda t: P.select_prefix_flagged(t, 7, 10),
        num_parts=8,
    )

    def cands():
        return map_partitions_by_key(
            flagged, "gh", lambda t: P.expand_smallside_pairs(t, 7, 10),
            num_parts=8,
        )

    ct = P.collect_candidates(cands(), ("s_lo", "s_hi"))
    pref = ray.put(np.asarray(ct["pair"]))
    slo = ray.put(np.asarray(ct["s_lo"]))
    shi = ray.put(np.asarray(ct["s_hi"]))
    sets = ds.map_batches(P.gramhash_table, batch_format="pyarrow",
                          zero_copy_batch=True)
    counts = map_partitions_by_key(
        sets, "sh", lambda t: P.count_shared(t, pref), num_parts=8
    )
    bc = (
        map_partitions_by_key(
            counts, "pair",
            lambda t: P.finish_pair_scores(
                t, pref, slo, shi, "containment", 0.7, "containment"
            ),
            num_parts=8,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )

    refs = cands().map_batches(pair_refs, batch_format="pyarrow",
                               zero_copy_batch=True)
    sets2 = ds.map_batches(P.gramhash_table, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = cogroup_by_key(refs, sets2, "doc_id", attach_shingles,
                            num_parts=8)
    cg = (
        map_partitions_by_key(
            joined, "pair", lambda t: P.pair_containment(t, 0.7),
            num_parts=8,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )

    assert len(bc) > 0
    assert np.array_equal(bc["doc_a"].to_numpy(), cg["doc_a"].to_numpy())
    assert np.array_equal(
        bc["containment"].to_numpy(), cg["containment"].to_numpy()
    )


def test_cogroup_fallback_matches_broadcast_weighted(ray_session):
    import ray

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.dedup import (
        ngram_table as _ng,
    )

    ds = _docs()
    grams = ds.map_batches(_ng, batch_format="pyarrow", zero_copy_batch=True)
    n_docs = len(
        set(
            np.concatenate(
                [
                    np.asarray(t["doc_id"].combine_chunks())
                    for t in ray.get(grams.to_arrow_refs())
                    if t.num_rows
                ]
            ).tolist()
        )
    )
    idf = map_partitions_by_key(
        grams, "gram", lambda t: P.attach_idf(t, n_docs), num_parts=8
    )
    pfx = map_partitions_by_key(
        idf, "doc_id", lambda t: P.select_prefix_weighted(t, 7, 20),
        num_parts=8,
    )

    def cands():
        return map_partitions_by_key(
            pfx, "gh", lambda t: P.expand_weighted_pairs(t, 7, 20),
            num_parts=8,
        )

    ct = P.collect_candidates(cands(), ("s_lo", "s_hi"))
    pref = ray.put(np.asarray(ct["pair"]))
    slo = ray.put(np.asarray(ct["s_lo"]))
    shi = ray.put(np.asarray(ct["s_hi"]))
    counts = map_partitions_by_key(
        idf, "gh", lambda t: P.count_shared(t, pref, weighted=True),
        num_parts=8,
    )
    bc = (
        map_partitions_by_key(
            counts, "pair",
            lambda t: P.finish_pair_scores(
                t, pref, slo, shi, "wjaccard", 0.35, "wjaccard"
            ),
            num_parts=8,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )

    refs = cands().map_batches(pair_refs, batch_format="pyarrow",
                               zero_copy_batch=True)
    joined = cogroup_by_key(refs, idf, "doc_id", P.attach_gram_weights,
                            num_parts=8)
    cg = (
        map_partitions_by_key(
            joined, "pair", lambda t: P.pair_wjaccard(t, 0.35), num_parts=8
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )

    assert len(bc) > 0
    assert np.array_equal(bc["doc_a"].to_numpy(), cg["doc_a"].to_numpy())
    assert np.array_equal(
        bc["wjaccard"].to_numpy(), cg["wjaccard"].to_numpy()
    )

"""Persisted-band-index path for incremental near-dup.

The registered query (queries_text.q_docs_incremental_neardup) recomputes
old-doc signatures so its DuckDB oracle has a closed form; production
instead PERSISTS the historical (bkey, doc_id) band index as Parquet and
unions only the increment's freshly-computed bands against it. This test
drives that real path end to end and asserts it produces byte-identical
verified pairs to the one-pass query — i.e. the persisted index is a
faithful substitute for recomputation.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
NEW_MOD = 10


def test_persisted_band_index_matches_recompute(ray_session, tmp_path):
    import ray.data as rd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_text import (
        JACCARD_THRESHOLD,
        NUM_PARTS,
        q_docs_incremental_neardup,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.dedup import (
        attach_shingles,
        lsh_partition_pairs_incremental,
        minhash_band_table,
        pair_jaccard,
        pair_refs,
        shingle_table,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.keyed import (
        cogroup_by_key,
        map_partitions_by_key,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.sources.reads import (
        read_parquet_sized,
    )

    docs = read_parquet_sized(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    def is_new(t: pa.Table) -> np.ndarray:
        return np.asarray(t["doc_id"].combine_chunks()) % NEW_MOD == 0

    # ---- ingest day 0: historical corpus -> persisted band index ------
    base = docs.map_batches(
        lambda t: t.filter(pa.array(~is_new(t))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    index_dir = tmp_path / "band_index"
    base.map_batches(
        minhash_band_table, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda t: t.append_column(
            "is_new", pa.array(np.zeros(t.num_rows, np.int8))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(str(index_dir))

    # ---- ingest day 1: increment bands UNION persisted index ----------
    incr = docs.map_batches(
        lambda t: t.filter(pa.array(is_new(t))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    incr_bands = incr.map_batches(
        minhash_band_table, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda t: t.append_column(
            "is_new", pa.array(np.ones(t.num_rows, np.int8))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    all_bands = rd.read_parquet(str(index_dir)).union(incr_bands)

    cand = map_partitions_by_key(
        all_bands, "bkey", lsh_partition_pairs_incremental, num_parts=NUM_PARTS
    )
    refs = cand.map_batches(pair_refs, batch_format="pyarrow", zero_copy_batch=True)
    shingles = docs.map_batches(
        shingle_table, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = cogroup_by_key(refs, shingles, "doc_id", attach_shingles, num_parts=NUM_PARTS)
    got = (
        map_partitions_by_key(
            joined,
            "pair",
            lambda t: pair_jaccard(t, JACCARD_THRESHOLD),
            num_parts=NUM_PARTS,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )

    want = (
        q_docs_incremental_neardup(SF)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    import pandas.testing as pt

    pt.assert_frame_equal(got, want)
    assert (
        (got["doc_a"] % NEW_MOD == 0) | (got["doc_b"] % NEW_MOD == 0)
    ).all()

"""docs_novelty_by_batch on a duplicate-heavy synthetic corpus: the
shipped fixtures have few exact dups (sf0.01 has none), so this drives
the non-trivial path — texts recurring across many batches, dups inside
the first batch, singleton batches — against a pandas brute force.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_novelty_matches_bruteforce_on_dup_heavy_corpus(ray_session, tmp_path):
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_text import (
        NOVELTY_BATCH,
        q_docs_novelty_by_batch,
    )

    rng = np.random.default_rng(11)
    n = 1_000
    # ~60 distinct texts over 1000 docs -> heavy recurrence across batches
    vocab = [f"text body number {i} with shared tokens" for i in range(60)]
    texts = [vocab[i] for i in rng.integers(0, 60, n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    pq.write_table(tbl, sf_dir / "documents.parquet")

    got = (
        q_docs_novelty_by_batch(str(sf_dir))
        .to_pandas()
        .sort_values("batch", ignore_index=True)
    )

    df = pd.DataFrame({"doc_id": np.arange(n), "text": texts})
    df["batch"] = df["doc_id"] // NOVELTY_BATCH
    first = df.groupby("text")["batch"].min().rename("first_batch")
    df = df.join(first, on="text")
    df["novel"] = (df["batch"] == df["first_batch"]).astype(int)
    ref = (
        df.groupby("batch")
        .agg(n_docs=("doc_id", "size"), n_novel=("novel", "sum"))
        .reset_index()
    )
    ref["novelty_rate"] = (ref["n_novel"] / ref["n_docs"]).round(6)

    pd.testing.assert_frame_equal(
        got[["batch", "n_docs", "n_novel", "novelty_rate"]],
        ref[["batch", "n_docs", "n_novel", "novelty_rate"]],
        check_dtype=False,
    )
    # batch 0 is all-novel by definition; with only 60 distinct texts the
    # tail batches contain nothing new
    assert (got.loc[got["batch"] == 0, "novelty_rate"] == 1.0).all()
    assert (got.loc[got["batch"] >= 10, "n_novel"] == 0).all()
    assert got["n_novel"].sum() >= 60

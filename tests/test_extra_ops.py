"""Kernel-level tests for the curation operators in queries_extra:
properties that oracle parity alone doesn't pin down (batch-size
invariance of partial top-k, histogram-quantile vs direct computation,
sampling determinism, range-join window membership)."""

import numpy as np
import pyarrow as pa
import pytest

from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
    QUANTILE_PCTS,
    SAMPLE_DEFAULT_RATE,
    SAMPLE_RATES,
    _topk_kernel,
    stratified_keep,
)


def test_stratified_keep_deterministic_and_rate():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1 << 40, size=200_000)
    langs = pa.array(
        rng.choice(["en", "fr", "zz"], size=len(ids)).tolist(), pa.string()
    )
    k1 = stratified_keep(ids, langs)
    k2 = stratified_keep(ids.copy(), langs)
    assert np.array_equal(k1, k2)
    lang_np = np.asarray(langs)
    for lang, rate in [("en", SAMPLE_RATES["en"]), ("fr", SAMPLE_RATES["fr"]),
                       ("zz", SAMPLE_DEFAULT_RATE)]:
        m = lang_np == lang
        frac = k1[m].mean()
        assert abs(frac - rate / 100) < 0.01, (lang, frac)


def test_stratified_keep_partition_invariant():
    """Splitting the input into arbitrary chunks never changes the mask."""
    ids = np.arange(10_000, dtype=np.int64)
    langs = pa.array(["en" if i % 3 else "fr" for i in range(10_000)])
    whole = stratified_keep(ids, langs)
    parts = []
    for lo, hi in [(0, 17), (17, 4096), (4096, 9999), (9999, 10_000)]:
        parts.append(stratified_keep(ids[lo:hi], langs.slice(lo, hi - lo)))
    assert np.array_equal(whole, np.concatenate(parts))


def _topk_table(langs, n_tokens, ids):
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        }
    )


def test_topk_kernel_matches_pandas():
    rng = np.random.default_rng(1)
    n = 5000
    langs = rng.choice(["a", "b", "c", "d"], size=n).tolist()
    nt = rng.integers(0, 50, size=n)  # heavy ties
    ids = np.arange(n)
    out = _topk_kernel(_topk_table(langs, nt, ids), 3, with_rank=True).to_pandas()
    import pandas as pd

    df = pd.DataFrame({"lang": langs, "n_tokens": nt, "doc_id": ids})
    df = df.sort_values(["lang", "n_tokens", "doc_id"],
                        ascending=[True, False, True])
    df["rk"] = df.groupby("lang").cumcount() + 1
    exp = df[df["rk"] <= 3]
    got = out.sort_values(["lang", "rk"], ignore_index=True)
    exp = exp.sort_values(["lang", "rk"], ignore_index=True)
    assert got[["lang", "doc_id", "n_tokens", "rk"]].reset_index(drop=True).equals(
        exp[["lang", "doc_id", "n_tokens", "rk"]].reset_index(drop=True)
    )


def test_topk_partial_then_final_equals_single_pass():
    """Combiner correctness: top-k of concatenated per-chunk top-k's equals
    top-k of the whole — the algebraic property the pipeline relies on."""
    rng = np.random.default_rng(2)
    n = 2000
    langs = rng.choice(["x", "y"], size=n).tolist()
    nt = rng.integers(0, 30, size=n)
    ids = np.arange(n)
    whole = _topk_kernel(_topk_table(langs, nt, ids), 3, True).to_pandas()
    partials = []
    for lo in range(0, n, 137):
        hi = min(lo + 137, n)
        partials.append(
            _topk_kernel(_topk_table(langs[lo:hi], nt[lo:hi], ids[lo:hi]), 3, False)
        )
    merged = pa.concat_tables(partials)
    two_phase = _topk_kernel(merged, 3, True).to_pandas()
    key = ["lang", "rk"]
    assert whole.sort_values(key, ignore_index=True).equals(
        two_phase.sort_values(key, ignore_index=True)
    )


def test_quantile_disc_index_matches_duckdb():
    """ceil(q*n)-1 indexing reproduces DuckDB quantile_disc exactly on
    random integer data, including heavy duplication."""
    import duckdb

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 25, size=997).astype(np.int64)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [vals.tolist()])
    v_sorted = np.sort(vals)
    n = len(vals)
    for p in QUANTILE_PCTS:
        (exp,) = con.execute(f"SELECT quantile_disc(x, {p / 100}) FROM t").fetchone()
        idx = (p * n + 99) // 100 - 1
        assert v_sorted[idx] == exp, (p, v_sorted[idx], exp)


def test_range_join_no_window_leakage(ray_session):
    """Every counted event lies inside its window and totals reconcile."""
    import pandas as pd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        N_WINDOWS,
        WINDOW_DAYS,
        q_range_join,
    )

    sf = "/root/testdata/sf0.001"
    out = q_range_join(sf).to_pandas()
    assert len(out) <= N_WINDOWS
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts", "value"])
    starts = ev.groupby("user_id")["ts"].min()
    for _, r in out.iterrows():
        lo = starts[r["w_user"]]
        hi = lo + pd.Timedelta(days=WINDOW_DAYS)
        in_w = ev[(ev["ts"] >= lo) & (ev["ts"] < hi)]
        assert r["n_events"] == len(in_w)
        assert r["sum_value"] == round(in_w["value"].sum())


def test_asof_tolerance_boundary_exact():
    """Tolerance mask boundaries: a right row exactly `tol` old is kept
    (inclusive), one microsecond older is nulled; no-tolerance probe is
    unchanged."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.asof import (
        _SortedRight,
        asof_attach,
    )

    right = pa.table(
        {
            "k": pa.array(["a", "a", "b"], pa.string()),
            "ts": pa.array([100, 200, 50], pa.timestamp("us")),
            "v": pa.array([1, 2, 3], pa.int64()),
        }
    )
    sr = _SortedRight(right, "k", "ts")
    left = pa.table(
        {
            "k": pa.array(["a", "a", "a", "b", "c"], pa.string()),
            # staleness vs latest eligible right row: 0, 10, 150, 60, n/a
            "ts": pa.array([200, 210, 150, 110, 10], pa.timestamp("us")),
        }
    )
    # no tolerance: normal as-of
    out = asof_attach(left, sr, "k", "ts", ["v"])
    assert out["v"].to_pylist() == [2, 2, 1, 3, None]
    # tol=10us: keeps staleness <= 10 (inclusive), nulls the rest
    out = asof_attach(left, sr, "k", "ts", ["v"], tolerance_us=10)
    assert out["v"].to_pylist() == [2, 2, None, None, None]
    # tol=9us: the exactly-10us-stale row falls out
    out = asof_attach(left, sr, "k", "ts", ["v"], tolerance_us=9)
    assert out["v"].to_pylist() == [2, None, None, None, None]
    # tol=60us: b's exactly-60us-stale match included (inclusive bound),
    # and a@150's 50us-stale match comes back too
    out = asof_attach(left, sr, "k", "ts", ["v"], tolerance_us=60)
    assert out["v"].to_pylist() == [2, 2, 1, 3, None]
    # tol=59us: b's match falls out, a@150's (50us) stays
    out = asof_attach(left, sr, "k", "ts", ["v"], tolerance_us=59)
    assert out["v"].to_pylist() == [2, 2, 1, None, None]


def test_bigram_lm_direct_reference(ray_session):
    """docs_bigram_lm vs a per-doc Python reference: global bigram counts,
    left-context totals, and the integer weighted sums."""
    from collections import Counter

    import pandas as pd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        q_docs_bigram_lm,
    )

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    cb: Counter = Counter()
    cc: Counter = Counter()
    doc_bigrams = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        bg = list(zip(toks[:-1], toks[1:]))
        doc_bigrams[did] = bg
        for pair in bg:
            cb[pair] += 1
            cc[pair[0]] += 1
    got = q_docs_bigram_lm(sf).to_pandas().set_index("doc_id")
    expect_ids = {d for d, bg in doc_bigrams.items() if bg}
    assert set(got.index) == expect_ids
    for did in expect_ids:
        bg = doc_bigrams[did]
        row = got.loc[did]
        assert row["n_bigrams"] == len(bg)
        assert row["sum_bigram_freq"] == sum(cb[p] for p in bg)
        assert row["sum_context_freq"] == sum(cc[p[0]] for p in bg)


def test_epoch_order_permutation_properties(ray_session):
    """Each epoch is a complete seeded permutation: every doc appears
    exactly once per epoch, positions within each (epoch, shard) are
    contiguous 0..n-1, shard matches the splitmix64 recomputation, and
    the two epochs order documents differently."""
    import pandas as pd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        EPOCH_SALT_STEP,
        N_EPOCHS,
        N_SHARDS,
        q_docs_epoch_order,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_relational import (
        SPLIT_SALT,
    )
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.stages.keyed import (
        splitmix64,
    )

    sf = "/root/testdata/sf0.001"
    all_ids = set(pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])["doc_id"])
    got = q_docs_epoch_order(sf).to_pandas()
    assert len(got) == N_EPOCHS * len(all_ids)
    orders = {}
    for e in range(N_EPOCHS):
        sub = got[got["epoch"] == e]
        assert set(sub["doc_id"]) == all_ids and len(sub) == len(all_ids)
        h = splitmix64(
            sub["doc_id"].to_numpy(np.int64).astype(np.uint64)
            + np.uint64(SPLIT_SALT + e * EPOCH_SALT_STEP)
        )
        assert np.array_equal(
            sub["shard"].to_numpy(), (h % np.uint64(N_SHARDS)).astype(np.int64)
        )
        for _, g in sub.groupby("shard"):
            assert sorted(g["pos"]) == list(range(len(g)))
        orders[e] = sub.sort_values(["shard", "pos"])["doc_id"].tolist()
    assert orders[0] != orders[1]


def test_spread16_matches_bitwise_reference():
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        _spread16,
    )

    rng = np.random.default_rng(3)
    v = rng.integers(0, 1 << 16, size=5000).astype(np.uint64)
    got = _spread16(v)
    ref = np.zeros_like(v)
    for b in range(16):
        ref |= ((v >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
    assert np.array_equal(got, ref)


def test_zorder_interleave_locality():
    """The Z code's top bits bound BOTH quantized dimensions: any two
    values sharing the top 2k bits agree on the top k bits of each
    dimension — the property that makes a zfile prunable on either
    column."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        _spread16,
    )

    rng = np.random.default_rng(4)
    qt = rng.integers(0, 1 << 16, size=2000).astype(np.uint64)
    qu = rng.integers(0, 1 << 16, size=2000).astype(np.uint64)
    z = _spread16(qt) | (_spread16(qu) << np.uint64(1))
    k = 3
    bucket = z >> np.uint64(32 - 2 * k)
    for b in np.unique(bucket):
        m = bucket == b
        assert np.unique(qt[m] >> np.uint64(16 - k)).size == 1
        assert np.unique(qu[m] >> np.uint64(16 - k)).size == 1


def test_conv_dedup_whole_collapses_and_is_order_sensitive(ray_session, tmp_path):
    """Two conversations with identical turn texts in the same order
    collapse to the lexically-smallest conv_id with n_copies=2; the same
    texts REORDERED fingerprint differently (position-mixed hash)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries import (
        q_conv_dedup_whole,
    )

    rows = []
    texts = ["hello there", "general kenobi", "you are bold"]
    for uid, order in [(1, [0, 1, 2]), (2, [0, 1, 2]), (3, [2, 1, 0])]:
        for i, j in enumerate(order):
            rows.append(
                {
                    "event_id": uid * 100 + i,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    "user_id": uid,
                    "event_type": "click",
                    "props": texts[j],
                }
            )
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))

    got = (
        q_conv_dedup_whole(str(tmp_path))
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    assert got["conv_id"].tolist() == ["conv_1", "conv_3"]
    assert got["n_copies"].tolist() == [2, 1]
    assert got["fp"].nunique() == 2


def test_spread16_is_strictly_monotone():
    """Order-preservation of the Morton spread: v < w implies
    spread16(v) < spread16(w), so Z-code ordering respects each
    dimension's order (the pruning argument)."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        _spread16,
    )

    s = _spread16(np.arange(1 << 16, dtype=np.uint64))
    assert np.all(np.diff(s.view(np.uint64).astype(np.int64)) > 0)


def test_zorder_quantization_monotone_and_bounded():
    """Bin-width quantization q=(x-mn)//w is monotone in x and lands in
    [0, 2^16) for any int64 range, including decade-wide microsecond
    spans that would overflow a multiply-based affine map."""
    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_extra import (
        Z_QBITS,
    )

    rng = np.random.default_rng(7)
    for span in [1, 1000, 10 * 365 * 86400 * 10**6]:  # incl. 10y of us
        mn = -span // 3
        x = np.sort(rng.integers(mn, mn + span + 1, size=4000, dtype=np.int64))
        w = span // (1 << Z_QBITS) + 1
        q = (x - mn) // w
        assert q.min() >= 0 and q.max() < (1 << Z_QBITS)
        assert np.all(np.diff(q) >= 0)

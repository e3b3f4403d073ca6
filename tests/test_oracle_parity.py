"""Local mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin on sf0.001, compare row count, schema, and values
(order-insensitive, exact for ints/strings, bit-exact expected for floats
since both sides do identical integer-exact or rounded arithmetic)."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def oracle_run(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).df()


def to_pdf(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, ray_df, sql_df):
    assert len(ray_df) == len(sql_df), (
        f"{name}: row count {len(ray_df)} != {len(sql_df)}"
    )
    ray_df, sql_df = normalize(ray_df), normalize(sql_df)
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(
            b.dtype, np.floating
        ):
            an, bn = a.isna(), b.isna()
            assert an.equals(bn), f"{name}.{c}: null mask mismatch"
            av, bv = a[~an].to_numpy(float), b[~bn].to_numpy(float)
            exact = np.array_equal(av, bv)
            if not exact:
                diff = np.abs(av - bv).max() if len(av) else 0.0
                close = np.allclose(av, bv, rtol=1e-9, atol=1e-9)
                pytest.fail(
                    f"{name}.{c}: floats not bit-exact (max diff {diff}, "
                    f"allclose={close}) — driver value-hash would fail"
                )
        else:
            if not a.equals(b):
                neq = a.astype(str) != b.astype(str)
                if neq.any():
                    i = int(np.flatnonzero(neq)[0])
                    pytest.fail(
                        f"{name}.{c}: value mismatch at sorted row {i}: "
                        f"{a.iloc[i]!r} != {b.iloc[i]!r} "
                        f"({int(neq.sum())} rows differ)"
                    )


def all_queries():
    import __ray_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        import __ray_entry__ as E

        metafunc.parametrize("qname", sorted(E.queries().keys()))


def test_query_parity(qname, ray_session):
    import __ray_entry__ as E

    fn = E.queries()[qname]
    sql = E.oracle_sql().get(qname)
    ray_df = to_pdf(fn(SF_DIR))
    if sql is None:
        assert len(ray_df) >= 0  # rows-only check, mirrors driver's weak path
        return
    sql_df = oracle_run(sql)
    compare(qname, ray_df, sql_df)


def test_asof_no_temporal_leakage(ray_session):
    """Property: every attached right row satisfies ts' <= ts (never a
    future row), and where a match exists it is the latest eligible one."""
    import pandas as pd

    from aws_batch_realtime_medallion_ml_feature_platform_pipeline_ray.pipelines.queries_relational import (
        q_asof_join,
    )

    sf = "/root/testdata/sf0.001"
    out = q_asof_join(sf).to_pandas()
    hit = out[out["o_orderdate"].notna()]
    assert (hit["o_orderdate"] <= hit["ts"]).all()

    orders = pd.read_parquet(f"{sf}/orders.parquet")
    ro = (
        orders.groupby(["o_custkey", "o_orderdate"], as_index=False)
        .agg(n_orders=("o_totalprice", "size"))
    )
    ro["o_orderdate"] = pd.to_datetime(ro["o_orderdate"])
    by_cust = {k: g.sort_values("o_orderdate") for k, g in ro.groupby("o_custkey")}
    sample = out.sample(n=min(300, len(out)), random_state=0)
    for _, r in sample.iterrows():
        g = by_cust.get(r["user_id"])
        elig = g[g["o_orderdate"] <= r["ts"]] if g is not None else None
        if elig is None or not len(elig):
            assert pd.isna(r["o_orderdate"])
        else:
            assert r["o_orderdate"] == elig["o_orderdate"].iloc[-1]

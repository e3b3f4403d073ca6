"""Full-registry local verification — the driver's correctness gate,
replayed over EVERY registry query (the driver samples ~50).

Runs each ``queries()`` entry at ``--sf-dir`` (default sf0.01), compares
rows + schema + values against the DuckDB ``oracle_sql()`` twin (sorted
by all columns, float compare bit-exact with NaN==NaN), and writes a
CORRECTNESS_LOCAL_r{N}.json artifact so the all-green claim is auditable
without rerunning the registry (VERDICT r2 §next-8).

Usage:
    python tools/verify_local.py [--out CORRECTNESS_LOCAL_r03.json]
        [--sf-dir /root/testdata/sf0.01] [--num-cpus 8] [--only name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb
    import numpy as np

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    q, o = E.queries(), E.oracle_sql()
    names = args.only or sorted(q)
    results: dict[str, dict] = {}
    n_pass = n_weak = n_fail = 0
    t_start = time.time()
    for name in names:
        t0 = time.time()
        rec: dict = {"err": None}
        try:
            df = q[name](args.sf_dir)
            df = df.to_pandas() if hasattr(df, "to_pandas") else df
            rec["ray_rows"] = int(len(df))
            if name not in o:
                rec["mode"] = "rows_only"
                n_weak += 1
            else:
                sdf = con.execute(o[name]).df()
                rec["oracle_rows"] = int(len(sdf))
                cols = sorted(df.columns)
                rec["schema_match"] = cols == sorted(sdf.columns)
                rec["rows_match"] = len(df) == len(sdf)
                bad: list[str] = []
                drift: list[tuple] = []
                if rec["schema_match"] and rec["rows_match"]:
                    a = df[cols].sort_values(cols, ignore_index=True)
                    b = sdf[cols].sort_values(cols, ignore_index=True)
                    for c in cols:
                        x, y = a[c], b[c]
                        if np.issubdtype(x.dtype, np.floating) or np.issubdtype(
                            y.dtype, np.floating
                        ):
                            same = np.array_equal(
                                x.to_numpy(float), y.to_numpy(float),
                                equal_nan=True,
                            )
                        else:
                            same = bool((x.astype(str) == y.astype(str)).all())
                        if not same:
                            bad.append(c)
                        if str(x.dtype) != str(y.dtype):
                            drift.append((c, str(x.dtype), str(y.dtype)))
                rec["value_match"] = (
                    rec["schema_match"] and rec["rows_match"] and not bad
                )
                rec["bad_cols"] = bad
                rec["dtype_drift"] = drift
                if rec["value_match"] and not drift:
                    n_pass += 1
                else:
                    n_fail += 1
        except Exception as e:  # noqa: BLE001 — record and keep going
            rec["err"] = f"{type(e).__name__}: {str(e)[:500]}"
            n_fail += 1
        rec["wall_s"] = round(time.time() - t0, 3)
        results[name] = rec
        status = (
            "ERR" if rec["err"]
            else rec.get(
                "mode",
                "PASS" if rec.get("value_match") and not rec.get("dtype_drift")
                else ("DRIFT" if rec.get("value_match") else "FAIL"),
            )
        )
        print(f"{name}: {status} ({rec['wall_s']}s)", flush=True)

    summary = {
        "sf_dir": args.sf_dir,
        "num_cpus": args.num_cpus,
        "n_queries": len(names),
        "n_oracle_exact": n_pass,
        "n_rows_only": n_weak,
        "n_fail": n_fail,
        "total_wall_s": round(time.time() - t_start, 1),
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    print(
        f"TOTAL {len(names)}: {n_pass} oracle-exact, {n_weak} rows-only, "
        f"{n_fail} FAIL in {summary['total_wall_s']}s"
    )
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

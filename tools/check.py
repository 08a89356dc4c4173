#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
Reads each <outDir>/<name>/ parquet (Spark result) and oracle_sql.json,
runs the oracle SQL in DuckDB over the sfDir parquet tables, and
compares values exactly (columns sorted by name, rows sorted).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
            n_fail += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
            n_fail += 1
            continue
        dtw, dtg = [str(t) for t in w.dtypes], [str(t) for t in g.dtypes]
        if dtw != dtg:
            print(f"WARN {name}: dtypes want={dtw} got={dtg}")
        # exact compare, mimicking a hash over values
        try:
            pd.testing.assert_frame_equal(w, g, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(w)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            # show first mismatching cells for debugging
            for c in w.columns:
                neq = (w[c].astype(str) != g[c].astype(str))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col={c} row={i} want={w[c][i]!r} got={g[c][i]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

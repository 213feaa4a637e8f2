#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs every oracle SQL in
DuckDB against the fixture parquet, loads the corresponding graft.Verify
parquet output, sorts columns by name, and compares values row-by-row.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c].tolist(), exp[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y and str(x) != str(y):
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracled, checked vs {sf_dir}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, loads the Spark-written parquet and the DuckDB oracle
result, sorts columns by name and rows by value, and compares exactly.

Usage: python3 tools/check.py [sfDir] [outDir] [query...]
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize values to strings so dtype differences (decimal objects,
    # ns-vs-us timestamps, nullable ints) don't mask value equality
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.apply(lambda c: c.map(cell))
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out)):
        resdir = os.path.join(out, name)
        if not os.path.isdir(resdir):
            continue
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{resdir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ok" if len(got) >= 0 else "??"
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            n_skip += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        if len(g) == 0:  # both empty + same columns: dtypes of empty frames differ
            print(f"PASS {name} (0 rows)")
            n_pass += 1
            continue
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:5]
            print(f"FAIL {name}: {int(diff.sum())} differing rows; first diffs:")
            for i in idx:
                for c in g.columns:
                    if g.at[i, c] != e.at[i, c]:
                        print(f"  row {i} col {c}: spark={g.at[i, c]!r} oracle={e.at[i, c]!r}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

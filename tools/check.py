#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, loads the Spark-written parquet THE WAY THE DRIVER DOES
(pyarrow/pandas — decimals become scale-preserving decimal.Decimal objects,
'594668328.50') and the DuckDB oracle result via .df() (decimals become
float64, '594668328.5'), sorts columns by name and rows by value, and
compares the stringified cells exactly.

That asymmetry is the point: round 1 compared both sides through DuckDB,
which silently canonicalized decimal-vs-float representations and passed 6
queries the driver failed. Query outputs must therefore never contain
DECIMAL-typed columns — keep decimals inside the plan, cast to DOUBLE at
the output boundary (see RSemantics.sumMoney).

Usage: python3 tools/check.py [sfDir] [outDir] [query...]
"""
import sys, os, json, math, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify cells with NO canonicalization across numeric kinds: a
    # Decimal('1.50') must NOT compare equal to float 1.5 — the driver's
    # hash doesn't think they're equal either
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
            parts = sorted(glob.glob(f"{resdir}/*.parquet"))
            got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
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

#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 target/verify_out"`,
run `python3 scripts/oracle_check.py [sf_dir] [out_dir]`.

Dev tooling only — the engine itself has no Python dependency.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    """Sort columns by name, rows by all columns — driver-style."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    results = sorted(glob.glob(f"{out_dir}/*/"))
    names = [r.rstrip("/").split("/")[-1] for r in results]
    for name in names:
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
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
        # Type-representation gate, mimicking the driver's hash behavior
        # observed in round 1: the driver canonicalizes integer widths
        # (int32 vs int64 passed) but NOT pandas-kind differences —
        # DuckDB HUGEINT converts to float64 and DECIMAL to object,
        # both of which hash differently from Spark's int64. Comparing
        # dtype *kind* (i/f/O/M/b) catches exactly those.
        kind_bad = [(c, str(g[c].dtype), str(e[c].dtype))
                    for c in g.columns
                    if g[c].dtype.kind != e[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch (driver hash would "
                  f"differ): {kind_bad}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if (math.isnan(a) and math.isnan(b)) or a == b:
                        continue
                    bad.append((c, i, a, b, abs(a - b)))
                else:
                    bad.append((c, i, a, b, None))
                if len(bad) > 3:
                    break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ mismatches, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

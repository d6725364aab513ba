#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same testdata tables,
sorts columns by name, and compares row counts + cell values in result order.
Dev-only tool; the real gate is the driver's CORRECTNESS_r{N}.json.
"""
import sys, json, glob, os, math
import duckdb
from decimal import Decimal

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        # Exact-scale compare (mirrors the driver's fixed-scale CSV render):
        # Decimal('17.00') must NOT equal Decimal('17.0') — normalize() here
        # masked the 5 round-1 trailing-zero hash failures.
        return str(v)
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{res_dir}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        got, want = got[gcols], want[wcols]
        bad = 0
        for i in range(len(got)):
            for c in gcols:
                g, w = norm(got[c].iloc[i]), norm(want[c].iloc[i])
                if g != w:
                    if bad < 3:
                        print(f"  {name} row {i} col {c}: spark={g!r} duck={w!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} cell mismatches / {len(got)} rows")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate:
runs each oracle_sql.json entry in DuckDB over the same sf dir's parquet
tables and compares against the parquet dumped by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(repr(v))
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        # driver compare: sort columns by name, then compare cell values
        o_cols, s_cols = sorted(oracle.columns), sorted(spark.columns)
        if o_cols != s_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(oracle) != len(spark):
            print(f"FAIL {name}: rows spark={len(spark)} oracle={len(oracle)}")
            n_fail += 1
            continue
        oracle = oracle[o_cols]
        spark = spark[o_cols]
        bad = 0
        for c in o_cols:
            ov = [canon(x) for x in oracle[c].tolist()]
            sv = [canon(x) for x in spark[c].tolist()]
            if ov != sv:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(ov, sv)) if a != b][:3]
                print(f"  col {c}: {len([1 for a,b in zip(ov,sv) if a!=b])} diffs, first {diffs}")
                bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched columns ({len(oracle)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(oracle)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

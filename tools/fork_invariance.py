#!/usr/bin/env python3
"""Catalog-wide fork-strategy invariance artifact (round 15, verdict
stretch item 7): diff two graft.Verify output dirs — one produced with
the default `spark.graft.forkMaterialize=local`, one with `=table`
(SPARK_GRAFT_FORK_MATERIALIZE honored by Verify) — and emit a JSON
artifact with a per-query value-hash match.

The hash mirrors the driver's compare: columns sorted by name, rows in
the query's own ORDER BY (both runs execute the identical plan modulo
the fork-staging strategy, so row order must agree), every cell
canonicalized (floats via repr, NaN folded) and md5'd.

Usage: python3 tools/fork_invariance.py <localOutDir> <tableOutDir> <artifact.json>
"""
import sys, json, glob, os, math, hashlib
import duckdb


def table_hash(con, d):
    files = sorted(glob.glob(f"{d}/*.parquet"))
    if not files:
        return None, 0
    df = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    cols = sorted(df.columns)
    h = hashlib.md5()
    h.update(("|".join(cols)).encode())
    for _, row in df[cols].iterrows():
        for v in row:
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else repr(float(v))
            h.update(str(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest(), len(df)


def main():
    local_dir, table_dir, out = sys.argv[1], sys.argv[2], sys.argv[3]
    what = (sys.argv[4] if len(sys.argv) > 4 else
            "fork-strategy invariance: Verify catalog under "
            "spark.graft.forkMaterialize=local vs =table")
    con = duckdb.connect()
    names = sorted(
        os.path.basename(p) for p in glob.glob(f"{local_dir}/q_*") if os.path.isdir(p))
    table_names = sorted(
        os.path.basename(p) for p in glob.glob(f"{table_dir}/q_*") if os.path.isdir(p))
    queries, n_match = {}, 0
    for name in sorted(set(names) | set(table_names)):
        lh, ln = table_hash(con, f"{local_dir}/{name}")
        th, tn = table_hash(con, f"{table_dir}/{name}")
        ok = lh is not None and lh == th
        n_match += ok
        queries[name] = {"match": ok, "rows": ln}
        if not ok:
            queries[name].update({"local_hash": lh, "table_hash": th,
                                  "local_rows": ln, "table_rows": tn})
    artifact = {
        "what": what,
        "n_queries": len(queries),
        "n_match": n_match,
        "all_match": n_match == len(queries),
        "queries": {k: v["match"] for k, v in queries.items()},
        "mismatches": {k: v for k, v in queries.items() if not v["match"]},
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"{n_match}/{len(queries)} match -> {out}")
    sys.exit(0 if artifact["all_match"] else 1)


if __name__ == "__main__":
    main()

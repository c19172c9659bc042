#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir> [q1,q2]"`), then
`python3 tools/compare.py <outDir> <sfDir> [q1,q2,...]`.
Loads each <outDir>/<name> parquet, runs the oracle SQL in DuckDB over the
sfDir parquet tables, sorts columns by name + rows, and diffs values."""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append("NaN" if v != v else round(v, 9))
            else:
                rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetch_df()
            odf = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"{name}: ERROR {e}"); fails += 1; continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"{name}: SCHEMA mismatch spark={scols} oracle={ocols}")
            fails += 1; continue
        s = norm(sdf[scols].itertuples(index=False, name=None))
        o = norm(odf[ocols].itertuples(index=False, name=None))
        if len(s) != len(o):
            print(f"{name}: ROWS mismatch spark={len(s)} oracle={len(o)}")
            fails += 1; continue
        bad = [(a, b) for a, b in zip(s, o) if a != b]
        if bad:
            print(f"{name}: VALUE mismatch ({len(bad)} rows), first: "
                  f"spark={bad[0][0]} oracle={bad[0][1]}")
            fails += 1; continue
        print(f"{name}: OK ({len(s)} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()

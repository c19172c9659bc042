#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir> [q1,q2]"`), then
`python3 tools/compare.py <outDir> <sfDir> [q1,q2,...]`.
Loads each <outDir>/<name> parquet, runs the oracle SQL in DuckDB over the
sfDir parquet tables, sorts columns by name + rows, and diffs values.

BIT-EXACT by default (r14): floats compare by their IEEE-754 bits
(float.hex()), exactly as strong as the driver's byte hash — the r13 x29
red slipped past this tool's old round-to-9-decimals comparison. Protocol:
a key may only be declared green against THIS gate. Pass --round9 only to
reproduce the legacy behavior when triaging."""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BIT_EXACT = "--round9" not in sys.argv

def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if v != v:
                    rr.append("NaN")
                else:
                    rr.append(v.hex() if BIT_EXACT else round(v, 9))
            else:
                rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

def main():
    args = [a for a in sys.argv[1:] if a != "--round9"]
    outdir, sfdir = args[0], args[1]
    only = set(args[2].split(",")) if len(args) > 2 else None
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

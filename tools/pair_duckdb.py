#!/usr/bin/env python3
"""Same-day DuckDB pairing (dev-side, BASELINE.md protocol): time each
query's oracle twin in DuckDB over a fixture dir, warm min-of-5 at 32
threads. Usage:
  python3 tools/pair_duckdb.py <oracle_sql.json dir> <fixtureDir> q1,q2,...
The Spark side comes from `graft.BenchFocus` on the same fixture minutes
apart — cross-day machine speed swings ~25%, so only same-day ratios are
comparable (SCALE.md r8/r10 noise protocol)."""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    oracle = json.load(open(os.path.join(sys.argv[1], "oracle_sql.json")))
    fixture = sys.argv[2]
    names = sys.argv[3].split(",")
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = os.path.join(fixture, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                if os.path.isdir(p) else
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out = {}
    for name in names:
        sql = oracle[name]
        for _ in range(2):
            con.execute(sql).fetchall()
        best = min(
            (lambda t0: (con.execute(sql).fetchall(), time.time() - t0)[1])(
                time.time())
            for _ in range(5))
        out[name] = round(best, 3)
        print(f"DUCK {{\"query\":\"{name}\",\"sec\":{best:.3f}}}")
    print(json.dumps(out))

if __name__ == "__main__":
    main()

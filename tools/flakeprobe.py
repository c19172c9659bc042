#!/usr/bin/env python3
"""Repeat-N hash-flakiness probe (r14): byte-compares the SPARK outputs of
multiple independent Verify runs of the same queries, bit-exact on floats.
A query whose output differs ACROSS RUNS is hash-flaky — it can pass any
single-shot oracle compare and still go red in the driver's artifact (the
r13 x29 failure mode: run-sensitive rounding of an ulp-adjacent double).

Usage:
  sbt "runMain graft.Verify <sfDir> /tmp/fp1 [qs]"   # N times, fresh JVMs
  sbt "runMain graft.Verify <sfDir> /tmp/fp2 [qs]"
  python3 tools/flakeprobe.py /tmp/fp1 /tmp/fp2 [/tmp/fp3 ...]

Exit 0 = every query byte-identical across all runs."""
import sys, os
import duckdb


def load(con, d, name):
    rows = con.execute(
        f"SELECT * FROM read_parquet('{d}/{name}/*.parquet')").fetchall()
    cols = [c[0] for c in con.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                rr.append("NaN" if v != v else v.hex())
            else:
                rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return tuple(cols[i] for i in order), out


def main():
    dirs = sys.argv[1:]
    if len(dirs) < 2:
        print("need at least two Verify outDirs"); sys.exit(2)
    con = duckdb.connect()
    names = sorted(n for n in os.listdir(dirs[0])
                   if os.path.isdir(os.path.join(dirs[0], n)))
    flaky = 0
    for name in names:
        missing = [d for d in dirs[1:]
                   if not os.path.isdir(os.path.join(d, name))]
        if missing:
            print(f"{name}: MISSING in {missing}"); flaky += 1; continue
        base = load(con, dirs[0], name)
        for d in dirs[1:]:
            other = load(con, d, name)
            if other != base:
                diff = [(a, b) for a, b in zip(base[1], other[1]) if a != b]
                print(f"{name}: FLAKY vs {d} "
                      f"({len(diff)} differing rows; first: {diff[:1]})")
                flaky += 1
                break
        else:
            print(f"{name}: stable ({len(base[1])} rows x {len(dirs)} runs)")
    sys.exit(1 if flaky else 0)


if __name__ == "__main__":
    main()

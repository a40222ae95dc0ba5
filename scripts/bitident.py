#!/usr/bin/env python3
"""Compare two Verify output dirs for bit-identity (4-thread vs 32-thread runs)."""
import duckdb, os, sys

a, b = sys.argv[1], sys.argv[2]
# Enumerate the UNION of both dumps: listing only `a` would silently skip
# queries present only in `b` (a stale dump on either side) and report
# full bit-identity over an under-count. A one-sided query dir is a DIFF.
qs = sorted({d for side in (a, b) for d in os.listdir(side)
             if os.path.isdir(os.path.join(side, d))})
con = duckdb.connect()
bad = []
for q in qs:
    pa = os.path.join(a, q, "*.parquet")
    pb = os.path.join(b, q, "*.parquet")
    try:
        na = con.execute(f"SELECT count(*) FROM read_parquet('{pa}')").fetchone()[0]
        nb = con.execute(f"SELECT count(*) FROM read_parquet('{pb}')").fetchone()[0]
        d1 = con.execute(f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pa}') EXCEPT ALL SELECT * FROM read_parquet('{pb}'))").fetchone()[0]
        d2 = con.execute(f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pb}') EXCEPT ALL SELECT * FROM read_parquet('{pa}'))").fetchone()[0]
        if na != nb or d1 or d2:
            bad.append((q, na, nb, d1, d2))
            print(f"DIFF {q}: rows {na} vs {nb}, asym {d1}/{d2}")
    except Exception as e:
        bad.append((q, str(e)))
        print(f"ERR {q}: {e}")
print(f"== {len(qs) - len(bad)}/{len(qs)} bit-identical, {len(bad)} diffs")
sys.exit(1 if bad else 0)

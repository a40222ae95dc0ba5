#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: crosscheck.py <sfDir> <verifyOutDir>

Reads each <outDir>/<query>/ parquet (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the same
parquet tables, canonicalizes both (columns sorted by name, rows sorted by all
columns), and diffs exactly. Dev tool only — the shipped library never depends
on Python.
"""
import duckdb, json, os, sys
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    npass = nfail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            nfail += 1
            continue
        try:
            ora = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            nfail += 1
            continue
        a, b = canon(mine), canon(ora)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            nfail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            nfail += 1
            continue
        # Driver-faithful dtype check: the driver hashes RENDERED values, so
        # an int64 Spark column vs a float64 oracle column hashes `10` vs
        # `10.0` and fails even when values are equal (e.g. DuckDB re-widens
        # windowed SUM(BIGINT) to HUGEINT, which pandas renders as float).
        # Value-only comparison cannot see this class — enforce kind parity.
        def render_kind(dt):
            k = getattr(dt, "kind", None)
            if k in ("i", "u"):
                return "int"
            if k == "f":
                return "float"
            return "other"
        kind_diffs = [
            (c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
            if render_kind(a[c].dtype) != render_kind(b[c].dtype)
            and {render_kind(a[c].dtype), render_kind(b[c].dtype)} == {"int", "float"}
        ]
        if kind_diffs:
            print(f"FAIL {name}: int-vs-float dtype divergence (driver renders these differently)")
            for c, x, y in kind_diffs[:4]:
                print(f"    col={c} spark_dtype={x} oracle_dtype={y}")
            nfail += 1
            continue
        diffs = []
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                neq = ~(av.eq(bv) | (av.isna() & bv.isna()))
            except Exception:
                neq = av.astype(str) != bv.astype(str)
            # Driver-faithful mode: the driver hashes rendered values, so
            # -0.0 vs 0.0 (invisible to pandas eq) is a real mismatch.
            # Flag sign-of-zero disagreements on float columns too.
            if str(av.dtype) == "float64" and str(bv.dtype) == "float64":
                import numpy as np
                neq = neq | (
                    np.signbit(av.to_numpy()) != np.signbit(bv.to_numpy())
                ) & ~(av.isna() & bv.isna())
            if neq.any():
                i = int(neq.idxmax())
                diffs.append((c, i, av.iloc[i], bv.iloc[i], int(neq.sum())))
        if diffs:
            print(f"FAIL {name}: {len(diffs)} differing column(s)")
            for c, i, x, y, n in diffs[:4]:
                print(f"    col={c} row={i} spark={x!r} oracle={y!r} ({n} rows differ)")
            nfail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()

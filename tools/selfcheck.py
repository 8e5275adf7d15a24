#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfdir> <verify_out_dir>

For each query dir in verify_out: read the Spark parquet result, run the
oracle SQL in DuckDB over views of the sf parquet tables, and compare
row counts, sorted column names, and cell values (sorted rows).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: ints, floats, strings
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="last")
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in
                                  sorted(glob.glob(f"{outdir}/{name}/*.parquet"))],
                                 ignore_index=True)
            duck_df = con.execute(sql).df()
            a, b = norm(spark_df), norm(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
                n_fail += 1
            elif not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {bad.sum()} differing rows, e.g.:")
                print(pd.concat([a[bad].head(3), b[bad].head(3)]))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(a)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

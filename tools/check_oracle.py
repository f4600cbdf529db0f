#!/usr/bin/env python3
"""Self-check: compare Verify output parquet against DuckDB oracle results.

Mirrors the driver's t2 gate: for each query in oracle_sql.json, run the SQL
in DuckDB over the sf parquet tables, load the Spark result, sort columns by
name, sort rows, and compare values exactly (with a float tolerance report so
near-misses are diagnosable).

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    return con, oracle

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con, oracle = load(sfdir, outdir)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); n_fail += 1; continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        bad = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            if str(sv.dtype) != str(dv.dtype):
                # dtype mismatch is a schema-hash risk even if values match
                bad.append(f"{c}: dtype spark={sv.dtype} duck={dv.dtype}")
                continue
            if len(s) == 0:
                continue
            if sv.dtype.kind == "f":
                a, b = sv.fillna(-1e308), dv.fillna(-1e308)
                diff = (a - b).abs().max()
                if not (diff == 0):
                    bad.append(f"{c}: float maxdiff={diff}")
            else:
                neq = ~((sv == dv) | (sv.isna() & dv.isna()))
                if neq.any():
                    i = neq.idxmax()
                    bad.append(f"{c}: first diff row {i}: spark={sv[i]!r} duck={dv[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Self-check: compare Verify output parquet against DuckDB oracle results.

Mirrors the driver's t2 gate: for each query in oracle_sql.json, run the SQL
in DuckDB over the sf parquet tables, load the Spark result, sort columns by
name, sort rows, and compare values exactly (with a float tolerance report so
near-misses are diagnosable).

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir> [summary.json]

Each oracle is timed; the optional third arg writes a machine-readable
summary {"pass": N, "fail": N, "slowest": [...], "queries": {name:
{"status": "pass"|"fail", "oracle_sec": s, "rows": n, "detail": ...}}} so
the round artifact can never silently zero — round 9's CORRECTNESS came
back `{}` because one oracle (search_nsw_recall_wide, pre-MATERIALIZED)
ran 667 s and blew the driver's wall budget. Any oracle >30 s is flagged
SLOW in the output. Exit codes: 0 = all pass within budget, 1 = any
correctness failure, 2 = all correct but some oracle over the 30 s
budget — so callers treating nonzero as "wrong results" never misread a
slow-but-correct run.
"""
import sys, json, glob, math, time
import duckdb
import pandas as pd

ORACLE_BUDGET_SEC = 30.0

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
    summary_path = sys.argv[3] if len(sys.argv) > 3 else None
    con, oracle = load(sfdir, outdir)
    n_pass = n_fail = 0
    report = {}

    def record(name, status, sec, rows=None, detail=None):
        nonlocal n_pass, n_fail
        entry = {"status": status, "oracle_sec": round(sec, 3)}
        if rows is not None:
            entry["rows"] = int(rows)
        if detail:
            entry["detail"] = detail
        report[name] = entry
        slow = " SLOW" if sec > ORACLE_BUDGET_SEC else ""
        if status == "pass":
            n_pass += 1
            print(f"PASS {name} ({rows} rows, {sec:.2f}s){slow}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {detail} ({sec:.2f}s){slow}")

    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            record(name, "fail", 0.0, detail="no spark output"); continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            record(name, "fail", 0.0, detail=f"read spark output: {e}"); continue
        t0 = time.time()
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            record(name, "fail", time.time() - t0,
                   detail=f"oracle sql error: {e}"); continue
        sec = time.time() - t0
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            record(name, "fail", sec,
                   detail=f"cols spark={list(s.columns)} duck={list(d.columns)}")
            continue
        if len(s) != len(d):
            record(name, "fail", sec,
                   detail=f"rows spark={len(s)} duck={len(d)}"); continue
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
            record(name, "fail", sec, rows=len(s), detail="; ".join(bad))
        else:
            record(name, "pass", sec, rows=len(s))

    over = sorted(((v["oracle_sec"], k) for k, v in report.items()
                   if v["oracle_sec"] > ORACLE_BUDGET_SEC), reverse=True)
    slowest = sorted(((v["oracle_sec"], k) for k, v in report.items()),
                     reverse=True)[:10]
    total_sec = sum(v["oracle_sec"] for v in report.values())
    print(f"\n{n_pass} pass, {n_fail} fail; oracle wall {total_sec:.1f}s")
    print("slowest oracles: " +
          ", ".join(f"{k}={s:.1f}s" for s, k in slowest))
    if over:
        print(f"OVER-BUDGET (> {ORACLE_BUDGET_SEC:.0f}s): " +
              ", ".join(f"{k}={s:.1f}s" for s, k in over))
    if summary_path:
        with open(summary_path, "w") as f:
            json.dump({
                "pass": n_pass, "fail": n_fail,
                "oracle_wall_sec": round(total_sec, 1),
                "budget_sec": ORACLE_BUDGET_SEC,
                "over_budget": [k for _, k in over],
                "slowest": [{"name": k, "sec": s} for s, k in slowest],
                "queries": report,
            }, f, indent=1, sort_keys=True)
        print(f"summary -> {summary_path}")
    # exit contract: 0 = all pass within budget, 1 = correctness
    # failure, 2 = all correct but >=1 oracle over the time budget.
    # The distinct code keeps budget-only failures distinguishable for
    # callers that treat nonzero as a correctness failure.
    sys.exit(1 if n_fail else (2 if over else 0))

if __name__ == "__main__":
    main()

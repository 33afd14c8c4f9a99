#!/usr/bin/env python3
"""Local oracle-differential check, mirroring the driver's compare:
run Verify output (parquet per query) against DuckDB executing oracle_sql.json
on the same testdata tables; sort columns by name, sort rows, hash values.

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True) if len(df) else df
    return df.reset_index(drop=True)

def cell(v):
    if v is None or v != v:  # NaN/None
        return "NULL"
    return str(v)

def frame_sig(df: pd.DataFrame):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        # Verify writes <name>.error when a query throws; surface it as an
        # ERR row (round 6: errored queries silently vanished from the
        # report — rows-only queries have no oracle entry, so the
        # MISSING_OUTPUT sweep below would never notice them).
        if name.endswith(".error") and os.path.isfile(d):
            qname = name[: -len(".error")]
            results[qname] = "ERR: " + open(d).read().strip()[:300]
            continue
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        mine = canon(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(mine)})"
            continue
        try:
            theirs = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            results[name] = f"ORACLE_ERR: {e}"
            continue
        if list(mine.columns) != list(theirs.columns):
            results[name] = f"SCHEMA_MISMATCH mine={list(mine.columns)} oracle={list(theirs.columns)}"
            continue
        if len(mine) != len(theirs):
            results[name] = f"ROWCOUNT {len(mine)} vs {len(theirs)}"
            continue
        a, b = frame_sig(mine), frame_sig(theirs)
        if a == b:
            results[name] = "OK"
        else:
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            results[name] = f"VALUE_MISMATCH {diffs}"
    bad = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" or v.startswith("ROWS_ONLY") else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"{flag:4} {k:28} {v[:400]}")
    missing = sorted(set(oracle) - set(results))
    for m in missing:
        print(f"FAIL {m:28} MISSING_OUTPUT")
    print(f"\n{len(results) - bad}/{len(results)} pass, {bad} fail, {len(missing)} missing")
    return 1 if bad or missing else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""STRICT replica of the DRIVER's correctness gate (round-1 lesson: the
driver loads the Spark side via pandas/pyarrow — decimals arrive as Python
Decimal with fixed scale — but the oracle side via duckdb .df() — float64.
verify_local.py's DuckDB-to-DuckDB compare normalizes both and hid that.)

This script mimics the driver:
  spark side : pandas.read_parquet  (Decimal stays Decimal, int64 stays int64)
  oracle side: duckdb .execute(sql).df()  (DECIMAL/HUGEINT -> float64)
then sorts columns by name, sort_values over all columns (crashes on array
columns, like the driver), and compares stringified cell values exactly.
Any Decimal('x.00') vs x.0 divergence FAILS here even when values are equal.

Usage: python3 tools/verify_driver_replica.py [outDir] [sfDir]
(outDir must already contain graft.Verify output; run verify_local.py first)

KNOWN FALSE ALARMS (do not chase): five queries whose output carries a
DATE column (ad01, gf01, ma01, sz01, wd01) "fail" here with
spark='1995-06-30' vs oracle='1995-06-30 00:00:00'. That is THIS
environment's duckdb returning pandas Timestamps for DATE while
read_parquet returns datetime.date — the real driver's environment
renders both the same way (all five rows were hash_match=true in
CORRECTNESS_r08). Values are identical; only the local stringification
differs.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

OUT_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")  # raises on arrays
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False)]


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    ok, bad = [], []
    for name in sorted(oracle):
        files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
        if not files:
            bad.append((name, "no spark output"))
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            want_df = con.execute(oracle[name]).df()
        except Exception as e:
            bad.append((name, f"load/oracle failed: {type(e).__name__}: {e}"))
            continue
        if sorted(spark_df.columns) != sorted(want_df.columns):
            bad.append((name, f"cols spark={sorted(spark_df.columns)} "
                              f"oracle={sorted(want_df.columns)}"))
            continue
        if len(spark_df) != len(want_df):
            bad.append((name, f"rows spark={len(spark_df)} oracle={len(want_df)}"))
            continue
        try:
            a, b = canon(spark_df), canon(want_df)
        except Exception as e:
            bad.append((name, f"sort failed (driver would error): "
                              f"{type(e).__name__}: {e}"))
            continue
        if a != b:
            diff = next((f" first diff: spark={x} oracle={y}"
                         for x, y in zip(a, b) if x != y), "")
            bad.append((name, "value mismatch" + diff))
            continue
        ok.append(name)
    for name in ok:
        print(f"PASS {name}")
    for name, why in bad:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(ok)}/{len(ok) + len(bad)} queries match (driver-strict)")
    sys.exit(0 if not bad else 2)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs each SparkEntry
query result (parquet dumped by graft.Verify) against its DuckDB oracle
SQL and compares schema + sorted rows, exact for non-floats and bitwise
for floats (with a max-abs-diff report when not bitwise equal).

Usage: python3 scripts/check_contract.py [sfDir] [verifyOutDir]
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            fails += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        ddf = con.sql(sql).df()
        # canonicalize: sort columns by name, then rows by all columns
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        ddf = ddf.reindex(sorted(ddf.columns), axis=1)
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
            fails += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            fails += 1
            continue
        sdf = sdf.sort_values(by=list(sdf.columns), ignore_index=True)
        ddf = ddf.sort_values(by=list(ddf.columns), ignore_index=True)
        ok = True
        for c in sdf.columns:
            a, b = sdf[c], ddf[c]
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                # The real driver hashes raw dtypes: int64 vs float64 is a
                # FAIL there even when values match numerically. Mirror it.
                if np.issubdtype(a.dtype, np.integer) or np.issubdtype(b.dtype, np.integer):
                    print(f"FAIL {name}.{c}: dtype mismatch spark={a.dtype} duck={b.dtype} "
                          "(driver hash compares types bitwise)")
                    ok = False
                    continue
                aa, bb = a.astype(float).values, b.astype(float).values
                # BITWISE compare, like the driver's hash: -0.0 != +0.0
                # here (Java BigDecimal rounding emits +0.0, DuckDB round()
                # can emit -0.0 — that burned two rounds under a == gate).
                # NaNs are normalized to one canonical payload first so
                # NaN == NaN passes, matching a hash over canonical NaN.
                na = np.where(np.isnan(aa), np.float64("nan"), aa)
                nb = np.where(np.isnan(bb), np.float64("nan"), bb)
                eq = na.view(np.int64) == nb.view(np.int64)
                if not eq.all():
                    # split mismatch kinds: a NaN-vs-number row has a NaN
                    # diff, and folding it into nanmax reports a misleading
                    # maxAbsDiff=0 when those are the only mismatches
                    bad = ~eq
                    nan_mismatch = bad & (np.isnan(aa) != np.isnan(bb))
                    num_bad = bad & ~nan_mismatch & ~np.isnan(aa) & ~np.isnan(bb)
                    parts = [f"FAIL {name}.{c}: {np.sum(bad)} rows differ (bitwise)"]
                    if num_bad.any():
                        parts.append(f"maxAbsDiff={np.max(np.abs(aa[num_bad] - bb[num_bad])):.3e}")
                    if nan_mismatch.any():
                        parts.append(f"nan-mismatch={np.sum(nan_mismatch)}")
                    print(", ".join(parts))
                    ok = False
            elif np.issubdtype(a.dtype, np.datetime64) and np.issubdtype(b.dtype, np.datetime64):
                aa = a.astype("datetime64[ns]")
                bb = b.astype("datetime64[ns]")
                if not aa.equals(bb):
                    neq = (aa != bb)
                    i = neq.idxmax()
                    print(f"FAIL {name}.{c}: {neq.sum()} rows differ, first at {i}: spark={aa[i]!r} duck={bb[i]!r}")
                    ok = False
            else:
                if not a.equals(b):
                    neq = (a != b)
                    i = neq.idxmax()
                    print(f"FAIL {name}.{c}: {neq.sum()} rows differ, first at {i}: spark={a[i]!r} duck={b[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(sdf)} rows, {len(sdf.columns)} cols)")
        else:
            fails += 1
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails += 1

print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)

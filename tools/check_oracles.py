"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` on the same sf dir, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import importlib.util
import sys
import time

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from heritrix3_spark.session import get_spark  # noqa: E402

spark = get_spark(master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, oracles = mod.queries(), mod.oracle_sql()
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        got = fn(spark, SF).toPandas()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
        continue
    if name not in oracles:
        print(f"rows-only {name}: {len(got)} rows  ({time.time()-t0:.1f}s)")
        continue
    try:
        want = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: duckdb error {e}")
        continue
    ok = True
    if len(got) != len(want):
        ok = False
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        ok = False
        print(f"FAIL {name}: cols spark={gcols} oracle={wcols}")
    if ok:
        g = got[gcols].copy()
        w = want[gcols].copy()
        for c in gcols:  # normalize types for compare
            if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(w[c]):
                g[c] = g[c].astype(float).round(6)
                w[c] = w[c].astype(float).round(6)
            elif pd.api.types.is_integer_dtype(g[c]) and pd.api.types.is_integer_dtype(w[c]):
                g[c] = g[c].astype("int64")
                w[c] = w[c].astype("int64")
        g = g.sort_values(gcols).reset_index(drop=True)
        w = w.sort_values(gcols).reset_index(drop=True)
        if not g.equals(w):
            ok = False
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: value mismatch ({int(bad.sum())} rows)")
            print("  spark:", g[bad].head(3).to_dict("records"))
            print("  oracle:", w[bad].head(3).to_dict("records"))
    if ok:
        print(f"OK   {name}: {len(got)} rows  ({time.time()-t0:.1f}s)")
    else:
        fails.append(name)

print("\n== SUMMARY ==", "ALL OK" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)

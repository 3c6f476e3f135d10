#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare (dev aid).

Runs each oracle_sql.json query in DuckDB over the sf tables and
compares with the Spark parquet output under the same outDir:
column sets, row counts, and values (exact for ints/strings, 1e-12
relative for floats) after sorting columns by name and rows by all
columns.
"""
import duckdb, json, math, sys
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify-out"

con = duckdb.connect()
for t in ["lineitem", "orders", "customer", "supplier", "part", "nation",
          "region", "documents", "embeddings", "events"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}")
        fails += 1
        continue
    got = pd.read_parquet(f"{outdir}/{name}")
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        print(f"FAIL {name}: columns {gc} vs oracle {ec}")
        fails += 1
        continue
    exp = exp[ec].sort_values(by=ec).reset_index(drop=True)
    got = got[ec].sort_values(by=ec).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
        fails += 1
        continue
    bad = None
    for c in ec:
        for i, (g, e) in enumerate(zip(got[c], exp[c])):
            if isinstance(e, float) or isinstance(g, float):
                g, e = float(g), float(e)
                if math.isnan(g) and math.isnan(e):
                    continue
                if g != e and abs(g - e) > 1e-12 * max(1.0, abs(g), abs(e)):
                    bad = (c, i, g, e)
                    break
            elif g != e:
                bad = (c, i, g, e)
                break
        if bad:
            break
    if bad:
        c, i, g, e = bad
        numeric = isinstance(g, (int, float)) and isinstance(e, (int, float))
        exact = "EXACT-MISMATCH-ONLY" if numeric and abs(g - e) <= 1e-9 * max(1.0, abs(g), abs(e)) else ""
        print(f"FAIL {name}: col {c} row {i}: spark={g!r} duckdb={e!r} {exact}")
        fails += 1
    else:
        # bit-exactness probe for floats (informational)
        exactly = all(
            (float(g) == float(e)) or (math.isnan(float(g)) and math.isnan(float(e)))
            for c in ec if exp[c].dtype.kind == "f"
            for g, e in zip(got[c], exp[c]))
        print(f"OK   {name}: {len(exp)} rows" + ("" if exactly else "  (floats differ in last bits)"))
print("failures:", fails)
sys.exit(1 if fails else 0)

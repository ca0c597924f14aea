#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB (tables =
the sf parquet files), reads the Spark result parquet for the same
query name, and compares: row count, sorted column names, and exact
values under (sorted columns, sorted rows) — i.e. at least as strict
as a hash compare. Exits nonzero on any mismatch.

Usage: verify_local.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}")
        fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {str(e)[:120]}")
        fail += 1
        continue
    wc, gc = sorted(want.columns), sorted(got.columns)
    if wc != gc:
        print(f"FAIL {name}: columns differ oracle={wc} spark={gc}")
        fail += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows differ oracle={len(want)} spark={len(got)}")
        fail += 1
        continue
    # list-typed cells (DuckDB LIST / Spark array) come back as numpy
    # arrays — unhashable, so sort_values can't factorize them; fold
    # them to tuples first (the driver's hash compare stringifies, so
    # this stays at-least-as-strict)
    def canon(df):
        out = df.copy()
        for c in out.columns:
            out[c] = out[c].map(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist") and
                getattr(v, "ndim", 0) >= 1 else v)
        return out
    w = canon(want[wc]).sort_values(by=wc).reset_index(drop=True)
    g = canon(got[wc]).sort_values(by=wc).reset_index(drop=True)
    bad = None
    for c in wc:
        wv, gv = w[c].tolist(), g[c].tolist()
        for i, (a, b) in enumerate(zip(wv, gv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    bad = (c, i, a, b)
                    break
            elif str(a) != str(b):
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: value diff col={c} row={i} oracle={a!r} spark={b!r}")
        fail += 1
    else:
        print(f"ok   {name} ({len(want)} rows)")

print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the oracle SQL in DuckDB over the
same sf tables and compare row count, schema width, and values
(sorted columns by name, exact match; floats compared exactly AND with
tolerance so we can see which failures are float-jitter vs real)."""
import json, sys, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        results[name] = "MISSING_RESULT"
        continue
    try:
        ours = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
    except Exception as e:
        results[name] = f"READ_FAIL {e}"
        continue
    try:
        ref = con.execute(sql).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_FAIL {type(e).__name__} {str(e)[:200]}"
        continue
    ours = ours.reindex(sorted(ours.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(ours.columns) != list(ref.columns):
        results[name] = f"SCHEMA cols ours={list(ours.columns)} ref={list(ref.columns)}"
        continue
    if len(ours) != len(ref):
        results[name] = f"ROWS ours={len(ours)} ref={len(ref)}"
        continue
    # sort rows deterministically by all columns
    cols = list(ours.columns)
    ours_s = ours.sort_values(cols).reset_index(drop=True)
    ref_s = ref.sort_values(cols).reset_index(drop=True)
    bad = []
    for c in cols:
        a, b = ours_s[c], ref_s[c]
        if str(a.dtype) != str(b.dtype):
            bad.append(f"dtype[{c}] {a.dtype} vs {b.dtype}")
        try:
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                import pandas as pd
                n = int((~eq).sum())
                idx = (~eq).idxmax()
                bad.append(f"val[{c}] {n} diffs e.g. {a[idx]!r} vs {b[idx]!r}")
        except Exception as e:
            bad.append(f"cmp[{c}] {e}")
    results[name] = "OK" if not bad else "; ".join(bad)

npass = sum(1 for v in results.values() if v == "OK")
for name, v in sorted(results.items()):
    print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + v))
print(f"\n{npass}/{len(results)} pass")

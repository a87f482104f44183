#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the oracle SQL in DuckDB over the
same sf tables and compare row count, schema width, and values
(sorted columns by name, exact match; floats compared exactly AND with
tolerance so we can see which failures are float-jitter vs real).

Flags (after the two positional args):
  --scale       for queries present in oracle_sql_scale.json, run the
                scale twin (tools/scale_twins.py materializes its tw_*
                temp tables first) instead of the quadratic primary —
                the non-gate-SF (ScaleData step-up) compare path.
  --twin-check  equivalence gate: for every scale-twin query, run the
                TWIN and the PRIMARY in DuckDB and compare the two
                result frames exactly (engine results not consulted).
                Run this at the gate SFs where the primary is feasible.
"""
import json, sys, glob, os, time
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = {a for a in sys.argv[1:] if a.startswith("--")}
USE_SCALE = "--scale" in flags
TWIN_CHECK = "--twin-check" in flags
sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
outdir = args[1] if len(args) > 1 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
scale_twins = {}
if USE_SCALE or TWIN_CHECK:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import scale_twins as stw
    scale_path = f"{outdir}/oracle_sql_scale.json"
    scale_twins = json.load(open(scale_path))
    _built = set()

def _subset_note(ours, ref):
    """On a row-count undershoot, state whether ours is a value-identical
    SUBSET of ref and what fraction it covers — the evidence a
    recall-parameterized classification needs (a scale-only recall
    regression shows up as subset=false or coverage below the pinned
    baseline, instead of being silently accepted on row count alone)."""
    try:
        cols = list(ours.columns)
        merged = ours.merge(ref.drop_duplicates(), on=cols, how="left",
                            indicator=True)
        is_subset = bool((merged["_merge"] == "both").all())
        cov = (len(ours) / len(ref)) if len(ref) else 1.0
        return f" subset={str(is_subset).lower()} coverage={cov:.4f}"
    except Exception as e:
        return f" subset=err({e})"


def _cmp_frames(ours, ref):
    """exact frame compare (column names sorted, rows sorted); returns
    'OK' or a diff description — shared by both compare paths."""
    ours = ours.reindex(sorted(ours.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(ours.columns) != list(ref.columns):
        return f"SCHEMA cols ours={list(ours.columns)} ref={list(ref.columns)}"
    if len(ours) != len(ref):
        note = _subset_note(ours, ref) if len(ours) < len(ref) else ""
        return f"ROWS ours={len(ours)} ref={len(ref)}{note}"
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
                n = int((~eq).sum())
                idx = (~eq).idxmax()
                bad.append(f"val[{c}] {n} diffs e.g. {a[idx]!r} vs {b[idx]!r}")
        except Exception as e:
            bad.append(f"cmp[{c}] {e}")
    return "OK" if not bad else "; ".join(bad)

if TWIN_CHECK:
    n_ok = 0
    for name in sorted(scale_twins):
        t0 = time.time()
        try:
            stw.prepare(con, name, _built)
            tw = con.execute(scale_twins[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}  twin error: {type(e).__name__} {str(e)[:200]}")
            continue
        t1 = time.time()
        # the primary can fail/time out too (e.g. a quadratic recursive
        # CTE at an unexpected SF) — report it as a per-row FAIL and
        # keep going instead of aborting the whole gate with a traceback
        try:
            pr = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}  primary error: {type(e).__name__} {str(e)[:200]}")
            continue
        t2 = time.time()
        v = _cmp_frames(tw, pr)
        n_ok += v == "OK"
        print(("PASS " if v == "OK" else "FAIL ") + name
              + f"  twin={t1-t0:.1f}s primary={t2-t1:.1f}s"
              + ("" if v == "OK" else "  " + v))
    print(f"\n{n_ok}/{len(scale_twins)} twin==primary")
    sys.exit(0 if n_ok == len(scale_twins) else 1)

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
    scaled = USE_SCALE and name in scale_twins
    try:
        if scaled:
            stw.prepare(con, name, _built)
            ref = con.execute(scale_twins[name]).fetchdf()
        else:
            ref = con.execute(sql).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_FAIL {type(e).__name__} {str(e)[:200]}"
        continue
    v = _cmp_frames(ours, ref)
    results[name] = v if v != "OK" else ("OK(scale)" if scaled else "OK")

npass = sum(1 for v in results.values() if v.startswith("OK"))
for name, v in sorted(results.items()):
    ok = v.startswith("OK")
    tag = " [scale-twin]" if v == "OK(scale)" else ""
    print(("PASS " if ok else "FAIL ") + name + tag + ("" if ok else "  " + v))
print(f"\n{npass}/{len(results)} pass")

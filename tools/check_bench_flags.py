#!/usr/bin/env python3
"""Bench-artifact consistency gate (r10 verdict #7): every query the
bench records as super-linear (sf1_superlinear / sf1_timed_out) must
have a documented cause in tools/sf1_causes.json — the round must not
close with its scale story split between an artifact and a narrative
that disagree.

Usage: check_bench_flags.py [bench_json]   (default target/bench_detail.json)
Accepts either the detail JSON or a driver BENCH_r*.json wrapper (the
bench line is then parsed out of its `tail`). Exit 0 iff every recorded
flag is explained.
"""
import json
import os
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_detail.json"
doc = json.load(open(path))
if "tail" in doc and "sf1_superlinear" not in doc:
    # driver wrapper: find the bench line inside the captured tail
    m = None
    for line in doc.get("tail", "").splitlines():
        if '"metric"' in line:
            m = re.search(r"\{.*\}", line)
    if not m:
        print(f"UNPARSEABLE {path}: no bench JSON line in tail")
        sys.exit(1)
    doc = json.loads(m.group(0))

flags = list(doc.get("sf1_superlinear", [])) + [
    f for f in doc.get("sf1_timed_out", [])
    if f not in doc.get("sf1_superlinear", [])]
flags = [f for f in flags if not f.startswith("+")]  # capped-list sentinel

causes_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "sf1_causes.json")
causes = {k: v for k, v in json.load(open(causes_path)).items()
          if not k.startswith("_")}

unexplained = [f for f in flags if f not in causes]
for f in flags:
    if f in causes:
        print(f"explained   {f}: {causes[f][:120]}")
for f in unexplained:
    print(f"UNEXPLAINED {f}: no cause in tools/sf1_causes.json — "
          "either a new scale defect (fix it) or noise (the re-measure "
          "guard should have caught it; investigate before recording)")
stale = [k for k in causes if k not in flags]
for k in stale:
    print(f"note: cause registered for '{k}' but not flagged this run "
          "(ok — causes persist across runs)")
print(f"\n{len(flags)} flagged, {len(unexplained)} unexplained")
sys.exit(1 if unexplained else 0)

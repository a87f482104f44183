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
# A "+N_more" sentinel means the source was a CAPPED compact line — the
# flags past the cap are invisible here, so silently filtering it would
# let unexplained flags through (the r11 ADVICE hole). The gate must see
# full lists: point the caller at the uncapped detail artifact.
capped = [f for f in flags if re.fullmatch(r"\+\d+_more", f)]
if capped:
    print(f"CAPPED LIST in {path}: {capped} — this input is a compact "
          "stdout line whose flag lists were truncated by the fit loop; "
          "re-run against target/bench_detail.json (full, uncapped lists)")
    sys.exit(1)

causes_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "sf1_causes.json")
causes = {k: v for k, v in json.load(open(causes_path)).items()
          if not k.startswith("_")}

# a zombie means a cap kill failed to actually stop the row's work and
# the sf1 pass aborted — a harness failure that must never ship silently
zombies = list(doc.get("sf1_zombie", []))
if zombies:
    print(f"ZOMBIE rows in {path}: {zombies} — a cap kill left work "
          "running after stream stops + future-job cancel; fix the kill "
          "path before trusting this artifact")
    sys.exit(1)

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

#!/usr/bin/env python3
"""Classify check_oracle.py output at a non-gate SF: pinned-at-sf0.01
oracles fail by design when the data changes (their VALUES tables are
measured constants of the gate SF); everything else must PASS. Reads
the check output on stdin, prints a classified summary and exits
nonzero if any NON-pinned row failed."""
import re
import sys

# oracles whose VALUES tables pin measured sf0.01 constants (grep
# "Pinned at sf0.01" in SparkEntry.scala; e03/e04/e05 recall pins are
# called out in the verify skill's gotchas)
PINNED = {
    "b03_join_hints", "d20_trained_lid", "d21_hard_lid",
    "d25_cognate_confusion", "d30_trained_ner", "d61_score_drift",
    "d64_quality_classifier", "d73_wide_lid", "d74_bigram_ppl_capped",
    "d83_compression_quality", "d84_fasttext_lid", "d85_fasttext_ftz",
    "e03_lsh_topk", "e04_ivf_knn", "e05_kmeans_clusters",
    "e15_ivf_probe_curve", "ev10_approx_users", "ev16_sketch_merge",
    "ev25_active_users", "k03_tokenizer_fertility",
    "k07_bin_packing",  # n_bins/max_fill pinned (FFD not SQL-expressible)
    "k10_unigram_tokenize", "k14_oov_report", "k15_pack_efficiency",
    "q34_banded_range_join", "q36_cube", "x05_source_similarity",
    "e03_lsh_knn", "e04_ivf_knn",  # recall constants (names per gate list)
}

# Recall-parameterized operators: the engine emits {pairs within the
# configured candidate radius} ∩ {exact threshold}, while the oracle is
# the FULL exact set. At the gate SF the radius covers the corpus's
# whole Hamming tail, so they coincide; at a step-up SF the tail grows
# past any fixed radius (SimhashDiag at x10_sf0.1: true-pair Hamming
# tail reaches h=28; coverage at the configured h<=8 is 94.88%, engine
# output a strict SUBSET with identical jaccard values). An UNDERSHOOT
# (ours < ref rows) is therefore the documented radius semantics, not
# an engine defect; an overshoot or value diff would still be real.
RECALL_PARAMETERIZED = {"x02_simhash_dedup"}

passed, pinned_failed, recall_param, real_failed = [], [], [], []
for line in sys.stdin:
    m = re.match(r"(PASS|FAIL) (\S+)", line.strip())
    if not m:
        continue
    ok, name = m.group(1) == "PASS", m.group(2)
    if ok:
        passed.append(name)
    elif name in PINNED:
        pinned_failed.append(name)
    elif name in RECALL_PARAMETERIZED and re.search(
            r"ROWS ours=(\d+) ref=(\d+)", line) and (
            lambda mm: int(mm.group(1)) < int(mm.group(2)))(
            re.search(r"ROWS ours=(\d+) ref=(\d+)", line)):
        recall_param.append(name)
    else:
        real_failed.append((name, line.strip()))

print(f"pass: {len(passed)}")
print(f"pinned-by-design fail (expected at non-gate SF): {len(pinned_failed)}")
for n in sorted(pinned_failed):
    print(f"  pinned {n}")
print(f"recall-parameterized undershoot (radius semantics): {len(recall_param)}")
for n in sorted(recall_param):
    print(f"  recall-param {n}")
print(f"REAL fail: {len(real_failed)}")
for n, l in sorted(real_failed):
    print(f"  {l[:300]}")
sys.exit(1 if real_failed else 0)

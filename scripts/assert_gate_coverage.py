#!/usr/bin/env python3
"""Gate-sample completeness assertion (round-15 verdict task 2).

Usage: assert_gate_coverage.py <oracle_all.json> <sample_csv> <exclusions_file>

Fails loudly unless the 10x gate SAMPLE and the exclusion list exactly
partition the declared oracle-query universe:
  - every declared query is either gated or explicitly excluded WITH a reason
  - no query appears in both
  - no stale entries (sample or exclusion names that no longer exist)
A new SparkEntry query therefore breaks the gate until it is either added
to SAMPLE or excluded with a written reason — silent coverage drift
(dedup_exact_unicode was hand-appended in round 14) can't recur.
"""
import json
import sys

oracle_all, sample_csv, exc_path = sys.argv[1], sys.argv[2], sys.argv[3]
declared = set(json.load(open(oracle_all)).keys())
sample = set(n.strip() for n in sample_csv.split(",") if n.strip())

excluded = {}
for ln, raw in enumerate(open(exc_path), 1):
    line = raw.strip()
    if not line or line.startswith("#"):
        continue
    name, _, reason = line.partition("#")
    name, reason = name.strip(), reason.strip()
    if not reason:
        sys.exit(f"gate coverage: {exc_path}:{ln}: exclusion '{name}' has no reason")
    if name in excluded:
        sys.exit(f"gate coverage: {exc_path}:{ln}: duplicate exclusion '{name}'")
    excluded[name] = reason

errs = []
both = sample & set(excluded)
if both:
    errs.append(f"in BOTH sample and exclusions: {sorted(both)}")
ungated = declared - sample - set(excluded)
if ungated:
    errs.append(
        f"declared but neither gated nor excluded (add to SAMPLE in "
        f"gate_sf1.sh or to {exc_path} with a reason): {sorted(ungated)}")
stale_sample = sample - declared
if stale_sample:
    errs.append(f"in SAMPLE but not declared (stale): {sorted(stale_sample)}")
stale_exc = set(excluded) - declared
if stale_exc:
    errs.append(f"excluded but not declared (stale): {sorted(stale_exc)}")
if errs:
    sys.exit("gate coverage FAILED:\n  " + "\n  ".join(errs))
print(f"gate coverage OK: {len(declared)} declared = "
      f"{len(sample)} gated + {len(excluded)} excluded (all reasoned)")

#!/usr/bin/env python3
"""Merge two full sf10 sweep JSONs into a per-query min table.

The box runs inside a shared-host VM whose throughput swings in
multi-minute phases (measured r13: identical probe recipes differ 3-7x
run-to-run with zero local load and zero visible steal). A single
one-run sweep therefore mixes those phases into the per-query numbers.
Taking the per-query MIN across two complete sweeps is the same
quiet-box estimator Bench's min-of-2 applies per query at gate scale,
lifted to sweep granularity.

Usage: merge_sweeps.py runA.json runB.json
Prints the merged total, per-run totals, and the slowest queries with
their A/B spread (spread >> noise means a mechanistic difference, e.g.
a routing change between runs - there were none in r13).
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
assert a["valid"] and b["valid"], "merge needs two clean sweeps"
qa, qb = a["queries"], b["queries"]
assert set(qa) == set(qb), "query surfaces differ"
merged = {k: min(qa[k], qb[k]) for k in qa}
print(f"runA total {sum(qa.values()):8.1f} s   ({sys.argv[1]})")
print(f"runB total {sum(qb.values()):8.1f} s   ({sys.argv[2]})")
print(f"min  total {sum(merged.values()):8.1f} s   over {len(merged)} queries")
print()
print(f"{'query':30} {'min':>8} {'runA':>8} {'runB':>8} {'A/B':>6}")
for k in sorted(merged, key=lambda k: -merged[k])[:20]:
    ratio = max(qa[k], qb[k]) / max(1e-9, min(qa[k], qb[k]))
    print(f"{k:30} {merged[k]:8.1f} {qa[k]:8.1f} {qb[k]:8.1f} {ratio:5.1f}x")

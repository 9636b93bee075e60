#!/usr/bin/env python3
"""Regression table between two Bench JSON artifacts (BENCH_r{N}.json or
local runs): per-query median/min and the B/A median ratio, sorted worst
first. Flags (<<) queries that regressed >= 2x AND >= 0.5s — the
within-2x gate the round contract enforces; minima separate real
regressions from this VM's 2-4x load spikes.

Usage: python3 scripts/benchdiff.py BENCH_rA.json BENCH_rB.json"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
ma = a.get("queries_min", qa)
mb = b.get("queries_min", qb)

rows = []
for q in sorted(set(qa) & set(qb)):
    ratio = qb[q] / qa[q] if qa[q] > 0 else float("inf")
    rows.append((ratio, q))
rows.sort(reverse=True)

print(f"{'query':30} {'medA':>7} {'medB':>7} {'ratio':>6} {'minA':>7} {'minB':>7}")
flagged = 0
for ratio, q in rows:
    flag = ""
    if ratio >= 2.0 and qb[q] - qa[q] >= 0.5:
        flag = "  <<"
        flagged += 1
    print(f"{q:30} {qa[q]:7.2f} {qb[q]:7.2f} {ratio:6.2f} "
          f"{ma.get(q, 0):7.2f} {mb.get(q, 0):7.2f}{flag}")

only_a = sorted(set(qa) - set(qb))
only_b = sorted(set(qb) - set(qa))
if only_a:
    print("only in A:", " ".join(only_a))
if only_b:
    print("only in B:", " ".join(only_b))
print(f"total: A={a['value']:.1f}s ({len(qa)} queries)  "
      f"B={b['value']:.1f}s ({len(qb)} queries)  flagged={flagged}")
sys.exit(0)

#!/usr/bin/env python3
"""Regression table between two Bench JSON artifacts (BENCH_r{N}.json or
local runs): per-query median/min and the B/A median ratio, sorted worst
first. Flags (<<) queries that regressed >= 2x AND >= 0.5s — the
within-2x gate the round contract enforces; minima separate real
regressions from this VM's 2-4x load spikes.

When BOTH artifacts carry a `sentinel` block (Bench emits it: median
ratio of ten review-untouched control queries vs the stored grid in
scaling/bench_sentinel_ref.json), the table adds an `nratio` column —
the B/A ratio divided by sentB/sentA, i.e. with the host-speed drift
between the two runs factored out — and flags on the NORMALIZED ratio.
This is the r12 hand analysis ("ten control queries drifted a uniform
x1.17; every touched query sits inside that band"), automated.

Usage: python3 scripts/benchdiff.py BENCH_rA.json BENCH_rB.json"""
import json
import sys


def load(path):
    d = json.load(open(path))
    # driver-archived BENCH_r{N}.json wraps the parsed compact line
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


a = load(sys.argv[1])
b = load(sys.argv[2])
qa, qb = a["queries"], b["queries"]
ma = a.get("queries_min", qa)
mb = b.get("queries_min", qb)

sa = (a.get("sentinel") or {}).get("ratio")
sb = (b.get("sentinel") or {}).get("ratio")
host = (sb / sa) if (sa and sb) else None

rows = []
for q in sorted(set(qa) & set(qb)):
    ratio = qb[q] / qa[q] if qa[q] > 0 else float("inf")
    rows.append((ratio, q))
rows.sort(reverse=True)

hdr = f"{'query':30} {'medA':>7} {'medB':>7} {'ratio':>6}"
if host:
    hdr += f" {'nratio':>6}"
hdr += f" {'minA':>7} {'minB':>7}"
print(hdr)
flagged = 0
for ratio, q in rows:
    nratio = ratio / host if host else ratio
    flag = ""
    if nratio >= 2.0 and qb[q] - qa[q] >= 0.5:
        flag = "  <<"
        flagged += 1
    line = f"{q:30} {qa[q]:7.2f} {qb[q]:7.2f} {ratio:6.2f}"
    if host:
        line += f" {nratio:6.2f}"
    line += f" {ma.get(q, 0):7.2f} {mb.get(q, 0):7.2f}{flag}"
    print(line)

only_a = sorted(set(qa) - set(qb))
only_b = sorted(set(qb) - set(qa))
if only_a:
    print("only in A:", " ".join(only_a))
if only_b:
    print("only in B:", " ".join(only_b))
if host:
    print(f"sentinel: A={sa:.3f} B={sb:.3f} host factor B/A={host:.3f} "
          f"(nratio = ratio / host factor; flags use nratio)")
else:
    print("sentinel: absent in one/both artifacts — raw ratios only")
print(f"total: A={a['value']:.1f}s ({len(qa)} queries)  "
      f"B={b['value']:.1f}s ({len(qb)} queries)  flagged={flagged}")
sys.exit(0)

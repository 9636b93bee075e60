#!/usr/bin/env python3
"""Regression table between two Bench JSON artifacts (BENCH_r{N}.json or
local runs): per-query median/min and the B/A median ratio, sorted worst
first. Flags (<<) queries that regressed >= 2x AND >= 0.5s — the
within-2x gate the round contract enforces; minima separate real
regressions from this VM's 2-4x load spikes.

When BOTH artifacts carry a `sentinel` block (Bench emits it: median
ratio of review-untouched control queries vs the stored grid in
scaling/bench_sentinel_ref.json), the table adds an `nratio` column —
the B/A ratio divided by sentB/sentA, i.e. with the host-speed drift
between the two runs factored out. When both also carry a
`sentinel_heavy` block (3-4 untouched HEAVY-floor controls — r13 proved
light controls cannot see big-shuffle/ImageIO floor drift), an `nrheavy`
column normalizes by the heavy band instead, and a query is flagged only
when it sits outside BOTH bands — drift that either control family
explains is host noise, not a regression.

Backstop (r13 ADVICE): a change that slows the WHOLE engine — controls
included, e.g. a scan-layer regression — would be normalized away by the
sentinels. So a raw ratio >= 3x also flags regardless of normalization,
and a host factor far from 1 prints a loud warning to read the raw
column too.

Usage: python3 scripts/benchdiff.py BENCH_rA.json BENCH_rB.json"""
import json
import sys


def load(path):
    d = json.load(open(path))
    # driver-archived BENCH_r{N}.json wraps the parsed compact line
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def find_grid(ref):
    """Grid file for a sentinel ref label: the archived generation
    (bench_sentinel_ref_<label>.json) or the live grid if its internal
    ref matches."""
    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in (os.path.join(here, "scaling", f"bench_sentinel_ref_{ref}.json"),
              os.path.join(here, "scaling", "bench_sentinel_ref.json")):
        try:
            g = json.load(open(p))
            if g.get("ref") == ref:
                return g
        except OSError:
            pass
    return None


def grid_factor(refa, refb, key):
    """Conversion between two grid GENERATIONS (r14 verdict #2): a
    sentinel ratio is median/grid, so when A and B normalized against
    different grids, B's ratio re-expressed on A's grid is
    ratio_B x median(gridB[q]/gridA[q]) over the shared controls —
    keeping the longitudinal chain computable across a refresh."""
    if refa == refb:
        return 1.0
    ga, gb = find_grid(refa), find_grid(refb)
    if not ga or not gb:
        return None
    # artifact band key -> grid control-list key
    gkey = {"sentinel": "queries", "sentinel_heavy": "queries_heavy"}[key]
    shared = sorted(set(ga.get(gkey, {})) & set(gb.get(gkey, {})))
    ratios = sorted(gb[gkey][q] / ga[gkey][q] for q in shared
                    if ga[gkey].get(q))
    return ratios[len(ratios) // 2] if ratios else None


def band_factor(a, b, key):
    sa = (a.get(key) or {}).get("ratio")
    sb = (b.get(key) or {}).get("ratio")
    if not (sa and sb):
        return None, sa, sb
    conv = grid_factor((a.get(key) or {}).get("ref"),
                       (b.get(key) or {}).get("ref"), key)
    if conv is None:
        print(f"WARNING: {key}: A and B normalized against DIFFERENT "
              "grids and no archived grid pair found — band factor "
              "not comparable, skipping it")
        return None, sa, sb
    if conv != 1.0:
        print(f"note: {key}: chained across grid generations "
              f"({(a.get(key) or {}).get('ref')} -> "
              f"{(b.get(key) or {}).get('ref')}, factor {conv:.3f})")
    return (sb * conv) / sa, sa, sb * conv


a = load(sys.argv[1])
b = load(sys.argv[2])
qa, qb = a["queries"], b["queries"]
ma = a.get("queries_min", qa)
mb = b.get("queries_min", qb)

host, sa, sb = band_factor(a, b, "sentinel")
hosth, sha, shb = band_factor(a, b, "sentinel_heavy")

rows = []
for q in sorted(set(qa) & set(qb)):
    ratio = qb[q] / qa[q] if qa[q] > 0 else float("inf")
    rows.append((ratio, q))
rows.sort(reverse=True)

hdr = f"{'query':30} {'medA':>7} {'medB':>7} {'ratio':>6}"
if host:
    hdr += f" {'nratio':>6}"
if hosth:
    hdr += f" {'nrheavy':>7}"
hdr += f" {'minA':>7} {'minB':>7}"
print(hdr)
flagged = 0
for ratio, q in rows:
    nratio = ratio / host if host else ratio
    nrheavy = ratio / hosth if hosth else None
    # outside-every-band: the smallest normalized view still reads >= 2x
    norm_views = [nratio] + ([nrheavy] if nrheavy is not None else [])
    flag = ""
    if qb[q] - qa[q] >= 0.5 and (min(norm_views) >= 2.0 or ratio >= 3.0):
        flag = "  <<"
        flagged += 1
    line = f"{q:30} {qa[q]:7.2f} {qb[q]:7.2f} {ratio:6.2f}"
    if host:
        line += f" {nratio:6.2f}"
    if hosth:
        line += f" {nrheavy:7.2f}"
    line += f" {ma.get(q, 0):7.2f} {mb.get(q, 0):7.2f}{flag}"
    print(line)

only_a = sorted(set(qa) - set(qb))
only_b = sorted(set(qb) - set(qa))
if only_a:
    print("only in A:", " ".join(only_a))
if only_b:
    print("only in B:", " ".join(only_b))
if host:
    print(f"sentinel(light): A={sa:.3f} B={sb:.3f} host factor B/A={host:.3f}")
else:
    print("sentinel(light): absent in one/both artifacts — raw ratios only")
if hosth:
    print(f"sentinel(heavy): A={sha:.3f} B={shb:.3f} host factor "
          f"B/A={hosth:.3f}")
else:
    print("sentinel(heavy): absent in one/both artifacts")
print("flag rule: delta >= 0.5s AND (outside every sentinel band at >= 2x "
      "OR raw ratio >= 3x backstop)")
for name, h in (("light", host), ("heavy", hosth)):
    if h and not (0.75 <= h <= 1.35):
        print(f"WARNING: {name} host factor {h:.3f} is far from 1 — either "
              "heavy external load on one run, or a change that moved the "
              "controls themselves (scan layer / engine-wide); read the raw "
              "ratio column, not just nratio")
print(f"total: A={a['value']:.1f}s ({len(qa)} queries)  "
      f"B={b['value']:.1f}s ({len(qb)} queries)  flagged={flagged}")
sys.exit(0)

#!/usr/bin/env python3
"""Round-over-round bench comparability at a FIXED scale factor.

The headline BENCH total is only meaningful against the same sf (round 9
moved the detail run from sf0.001 to sf0.1 and the total jumped 32s->49s
for reasons that had nothing to do with regressions). This tool keeps a
committed per-op baseline PER SF (BENCH_BASELINES.json) and diffs a fresh
BENCH_DETAIL.json against the matching entry, so a per-op regression can
never hide inside a scale change or a suite-size change.

Usage:
  python3 tools/bench_compare.py [BENCH_DETAIL.json [BENCH_BASELINES.json]]
  python3 tools/bench_compare.py --update   # fold current detail into the
                                            # baseline for its sf (call it
                                            # after a vetted run)

Exit 1 if any common op regressed past THRESH (default 1.5x and >0.15s
absolute -- tiny ops flap on scheduler noise) or the common-set total
drifted >20%.
"""
import json, sys

THRESH_RATIO = 1.5
THRESH_ABS = 0.15   # seconds; below this, ratio noise is scheduler noise
TOTAL_DRIFT = 1.20

args = [a for a in sys.argv[1:] if not a.startswith('--')]
update = '--update' in sys.argv
detail_path = args[0] if len(args) > 0 else 'BENCH_DETAIL.json'
base_path = args[1] if len(args) > 1 else 'BENCH_BASELINES.json'

detail = json.load(open(detail_path))
sf = detail['sf']
try:
    baselines = json.load(open(base_path))
except FileNotFoundError:
    baselines = {}

import os
cpus = os.cpu_count()

if update:
    baselines[sf] = {"round": baselines.get(sf, {}).get("round", 0) + 1,
                     "total": detail['value'], "n": detail['n'],
                     "cpus": cpus,
                     "queries": detail['queries']}
    json.dump(baselines, open(base_path, 'w'), indent=1, sort_keys=True)
    print(f"updated {base_path}[{sf}]: n={detail['n']} total={detail['value']}s")
    sys.exit(0)

if sf not in baselines:
    print(f"no baseline for {sf} in {base_path} -- run with --update after "
          f"vetting this run; comparing against nothing is not a pass")
    sys.exit(1)

if baselines[sf].get('cpus') not in (None, cpus):
    print(f"WARNING: baseline recorded at {baselines[sf]['cpus']} cpus, "
          f"this machine has {cpus} -- timings are not comparable")

base = baselines[sf]['queries']
cur = detail['queries']
common = sorted(set(base) & set(cur))
added = sorted(set(cur) - set(base))
removed = sorted(set(base) - set(cur))

regressed = []
improved = []
for q in common:
    b, c = base[q], cur[q]
    if c > b * THRESH_RATIO and c - b > THRESH_ABS:
        regressed.append((q, b, c))
    elif b > c * THRESH_RATIO and b - c > THRESH_ABS:
        improved.append((q, b, c))

bt = sum(base[q] for q in common)
ct = sum(cur[q] for q in common)
print(f"[{sf}] common set: {len(common)} ops, baseline {bt:.2f}s -> "
      f"current {ct:.2f}s ({ct/bt:.2f}x)"
      if bt else f"[{sf}] no common ops")
if added:
    at = sum(cur[q] for q in added)
    print(f"  added ({len(added)}, {at:.2f}s): {', '.join(added)}")
if removed:
    print(f"  removed ({len(removed)}): {', '.join(removed)}")
for q, b, c in sorted(regressed, key=lambda x: x[1] - x[2]):
    print(f"  REGRESSED {q}: {b:.2f}s -> {c:.2f}s ({c/b:.1f}x)")
for q, b, c in sorted(improved, key=lambda x: x[2] - x[1]):
    print(f"  improved {q}: {b:.2f}s -> {c:.2f}s")

bad = bool(regressed) or (bt > 0 and ct > bt * TOTAL_DRIFT)
print("RESULT:", "FAIL" if bad else "PASS")
sys.exit(1 if bad else 0)

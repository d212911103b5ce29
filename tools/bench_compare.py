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

Contention sentinel (VERDICT r12 item 8): ops whose BASELINE time is at
the framework floor (<= SENTINEL_MAX_BASE) do near-zero compute -- their
ratio measures machine load, not code. When the MEDIAN ratio over that
class exceeds CONTENTION_MIN the run is annotated CONTENDED and per-op
regressions explained by the contention factor (ratio <= median * 1.2)
are demoted to annotations instead of failures; a regression that
exceeds even the contended envelope still fails. This turns the ten
phantom flags the r12 driver bench produced under load into one
automatic verdict line instead of a per-op adjudication.

Streaming-overhead denominator (VERDICT r15 items 1+7): every stream_*
op pays a fixed micro-batch machinery cost per batch (stream planning,
offset/commit log, sink commit) that a loaded box inflates MORE than it
inflates batch compute -- the round-15 FAIL was five streaming ops
1.5-1.8x with zero code change while the batch median sat at 1.25x.
graft.Bench now times that cost directly as `stream_noop` (one
micro-batch over a 5-row table, no work), and when the measured noop
ratio vs its baseline is >= STREAM_OVERHEAD_MIN, streaming regressions
within noop_ratio * CONTENTION_SLACK are overhead-explained
annotations. The denominator is MEASURED in the same run it explains --
never an asserted "machine drift" paragraph. stream_noop itself is
never flagged (it has no work to regress; it IS the denominator).
"""
import json, sys

THRESH_RATIO = 1.5
THRESH_ABS = 0.15   # seconds; below this, ratio noise is scheduler noise
TOTAL_DRIFT = 1.20
SENTINEL_MAX_BASE = 0.35  # baseline secs; at/below = framework-floor op
SENTINEL_MIN_N = 5        # need this many sentinels to trust the median
CONTENTION_MIN = 1.3      # median sentinel ratio at/above = contended run
CONTENTION_SLACK = 1.2    # per-op ratios <= median*this are load-explained
STREAM_NOOP = 'stream_noop'     # the measured micro-batch-overhead entry
STREAM_OVERHEAD_MIN = 1.2  # noop ratio at/above = streaming-costs inflated

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
    # refuse to fold a contended run into the baseline (unless --force):
    # a loaded-machine fold poisons every later comparison
    prev_entry = baselines.get(sf, {})
    prev = prev_entry.get('queries', {})
    sent = [q for q in prev
            if q in detail['queries'] and 0 < prev[q] <= SENTINEL_MAX_BASE]
    if len(sent) >= SENTINEL_MIN_N and '--force' not in sys.argv:
        rs = sorted(detail['queries'][q] / prev[q] for q in sent)
        m = len(rs) // 2
        med = rs[m] if len(rs) % 2 else (rs[m - 1] + rs[m]) / 2
        if med >= CONTENTION_MIN:
            print(f"REFUSED --update: run is contended (sentinel median "
                  f"{med:.2f}x over {len(sent)} framework-floor ops); "
                  f"re-run idle or pass --force")
            sys.exit(1)
    # --- non-absorbing refolds (VERDICT r16 item 2): a fold that resets
    # every per-op baseline must not silently swallow a regression. Diff
    # the fold candidate against the baseline it replaces with the SAME
    # regression criteria the compare path uses; any op that worsened
    # past threshold needs an explicit annotation
    # (--accept=op:reason[,op:reason]) or the fold is refused. The diff
    # is then recorded in a fold_diff block inside the baseline entry so
    # the provenance of every reset survives in the committed artifact.
    accepts = {}
    for a in sys.argv[1:]:
        if a.startswith('--accept='):
            for kv in a[len('--accept='):].split(','):
                k, _, r = kv.partition(':')
                if k:
                    accepts[k] = r or 'accepted'
    fold_reg, fold_imp = [], []
    for q in sorted(set(prev) & set(detail['queries'])):
        if q == STREAM_NOOP:
            continue  # the denominator, not an op
        b, c = prev[q], detail['queries'][q]
        if c > b * THRESH_RATIO and c - b > THRESH_ABS:
            fold_reg.append((q, b, c))
        elif b > c * THRESH_RATIO and b - c > THRESH_ABS:
            fold_imp.append((q, b, c))
    if fold_reg or fold_imp:
        print(f"FOLD_DIFF [{sf}] vs round-{prev_entry.get('round', 0)} "
              f"baseline (total {prev_entry.get('total', 0)}s -> "
              f"{detail['value']}s):")
        for q, b, c in fold_reg:
            note = (f"accepted: {accepts[q]}" if q in accepts
                    else "forced" if '--force' in sys.argv else "UNANNOTATED")
            print(f"  worsened {q}: {b:.2f}s -> {c:.2f}s ({c/b:.1f}x) [{note}]")
        for q, b, c in fold_imp:
            print(f"  improved {q}: {b:.2f}s -> {c:.2f}s")
    unexplained = [q for q, _, _ in fold_reg if q not in accepts]
    if unexplained and '--force' not in sys.argv:
        print(f"REFUSED --update: {len(unexplained)} op(s) worsened past "
              f"{THRESH_RATIO}x across the refold without an annotation "
              f"({', '.join(unexplained)}); fix them or pass "
              f"--accept=op:reason[,op:reason]")
        sys.exit(1)
    entry = {"round": prev_entry.get("round", 0) + 1,
             "total": detail['value'], "n": detail['n'],
             "cpus": cpus,
             "queries": detail['queries']}
    if fold_reg or fold_imp:
        entry["fold_diff"] = {
            "prev_round": prev_entry.get('round', 0),
            "prev_total": prev_entry.get('total'),
            "worsened": [{"op": q, "prev": b, "new": c,
                          "note": accepts.get(
                              q, "forced" if '--force' in sys.argv
                              else "accepted")}
                         for q, b, c in fold_reg],
            "improved": [{"op": q, "prev": b, "new": c}
                         for q, b, c in fold_imp]}
    baselines[sf] = entry
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
    if q == STREAM_NOOP:
        continue  # the denominator, not an op (see module docstring)
    b, c = base[q], cur[q]
    if c > b * THRESH_RATIO and c - b > THRESH_ABS:
        regressed.append((q, b, c))
    elif b > c * THRESH_RATIO and b - c > THRESH_ABS:
        improved.append((q, b, c))

# --- streaming-overhead denominator: the measured stream_noop ratio ---
stream_factor = None
if base.get(STREAM_NOOP, 0) > 0 and cur.get(STREAM_NOOP, 0) > 0:
    stream_factor = cur[STREAM_NOOP] / base[STREAM_NOOP]
    print(f"  streaming overhead: {STREAM_NOOP} {base[STREAM_NOOP]:.2f}s"
          f" -> {cur[STREAM_NOOP]:.2f}s ({stream_factor:.2f}x measured"
          f" micro-batch machinery cost)")
if stream_factor is not None and stream_factor >= STREAM_OVERHEAD_MIN:
    env = stream_factor * CONTENTION_SLACK
    explained_s = [(q, b, c) for q, b, c in regressed
                   if q.startswith('stream_') and c <= b * env]
    regressed = [(q, b, c) for q, b, c in regressed
                 if not (q.startswith('stream_') and c <= b * env)]
    for q, b, c in sorted(explained_s, key=lambda x: x[1] - x[2]):
        print(f"  overhead-explained {q}: {b:.2f}s -> {c:.2f}s "
              f"({c/b:.1f}x <= noop {stream_factor:.2f}x"
              f" * {CONTENTION_SLACK})")

# --- contention sentinel: median ratio over the framework-floor class ---
sentinels = [q for q in common if 0 < base[q] <= SENTINEL_MAX_BASE]
contention = None
if len(sentinels) >= SENTINEL_MIN_N:
    ratios = sorted(cur[q] / base[q] for q in sentinels)
    mid = len(ratios) // 2
    med = (ratios[mid] if len(ratios) % 2
           else (ratios[mid - 1] + ratios[mid]) / 2)
    if med >= CONTENTION_MIN:
        contention = med
if contention is not None:
    print(f"  CONTENDED RUN: median ratio over {len(sentinels)} "
          f"framework-floor sentinels (baseline <= {SENTINEL_MAX_BASE}s) "
          f"is {contention:.2f}x -- machine load, not code; regressions "
          f"within {contention:.2f}x*{CONTENTION_SLACK} are annotated, "
          f"not failed; re-measure on an idle machine before folding")
    explained = [(q, b, c) for q, b, c in regressed
                 if c <= b * contention * CONTENTION_SLACK]
    regressed = [(q, b, c) for q, b, c in regressed
                 if c > b * contention * CONTENTION_SLACK]
    for q, b, c in sorted(explained, key=lambda x: x[1] - x[2]):
        print(f"  contention-explained {q}: {b:.2f}s -> {c:.2f}s "
              f"({c/b:.1f}x <= envelope)")

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

drift_cap = TOTAL_DRIFT if contention is None \
    else max(TOTAL_DRIFT, contention * CONTENTION_SLACK)
bad = bool(regressed) or (bt > 0 and ct > bt * drift_cap)
verdict = "FAIL" if bad else ("PASS (CONTENDED)" if contention else "PASS")
print("RESULT:", verdict)
sys.exit(1 if bad else 0)

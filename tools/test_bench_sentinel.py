#!/usr/bin/env python3
"""Fixture test for bench_compare.py's contention sentinel (VERDICT r12
item 8). Builds synthetic BENCH_DETAIL/BENCH_BASELINES pairs in a temp
dir and asserts the four behaviors that matter:

  1. idle run, one real regression            -> FAIL (flagged per-op)
  2. contended run (uniform ~1.6x incl. the
     framework-floor sentinel class)          -> PASS (CONTENDED), the
     would-be flags demoted to annotations
  3. contended run with one op regressed far
     beyond the contention envelope (~5x)     -> FAIL (that op only)
  4. --update on a contended run              -> REFUSED exit 1

…and the streaming-overhead denominator (VERDICT r15 items 1+7):

  6. batch quiet but stream_noop 1.7x and the
     stream ops ~1.6x (the r15 failure shape) -> PASS, flags demoted to
     overhead-explained annotations
  7. stream_noop quiet, a stream op 1.6x      -> FAIL (a real streaming
     regression is NOT excused by a quiet denominator)
  8. stream_noop 1.7x but a stream op 5x
     (far beyond noop * slack)                -> FAIL (that op only)

…and the non-absorbing refold (VERDICT r16 item 2):

  10. --update on a quiet run where one op
      regressed 2.1x                          -> REFUSED, baseline file
      untouched (a refold can't silently absorb a regression)
  11. same with --accept=op:reason            -> folds; fold_diff block
      written into the baseline with the annotation
  12. same with --force                       -> folds; fold_diff note
      says "forced"
Prints FIXTURE: PASS on success (the ToolsGateSpec contract).
"""
import json, os, subprocess, sys, tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
TOOL = os.path.join(HERE, 'bench_compare.py')


def run(tmp, detail, baselines, extra=()):
    dp = os.path.join(tmp, 'detail.json')
    bp = os.path.join(tmp, 'base.json')
    json.dump(detail, open(dp, 'w'))
    json.dump(baselines, open(bp, 'w'))
    p = subprocess.run([sys.executable, TOOL, dp, bp, *extra],
                       capture_output=True, text=True)
    return p.returncode, p.stdout


def mk(queries):
    return {"metric": "t", "value": round(sum(queries.values()), 3),
            "unit": "sec", "n": len(queries), "sf": "sfX",
            "queries": queries}


# 8 framework-floor sentinels + 4 heavier ops
BASE_Q = {f"scan_s{i}": 0.10 for i in range(8)}
BASE_Q.update({"heavy_a": 2.0, "heavy_b": 3.0, "mid_c": 0.8, "mid_d": 1.0})
BASELINES = {"sfX": {"round": 1, "total": sum(BASE_Q.values()),
                     "n": len(BASE_Q), "queries": BASE_Q}}

fails = []

with tempfile.TemporaryDirectory() as tmp:
    # 1. idle machine, heavy_a genuinely regressed 2x
    q = dict(BASE_Q); q["heavy_a"] = 4.2
    code, out = run(tmp, mk(q), BASELINES)
    if code != 1 or "REGRESSED heavy_a" not in out or "CONTENDED" in out:
        fails.append(f"case1: code={code}\n{out}")

    # 2. contended: everything uniformly ~1.6x (sentinels included)
    q = {k: round(v * 1.6, 4) for k, v in BASE_Q.items()}
    code, out = run(tmp, mk(q), BASELINES)
    if code != 0 or "CONTENDED RUN" not in out \
            or "contention-explained heavy_a" not in out \
            or "REGRESSED" in out or "PASS (CONTENDED)" not in out:
        fails.append(f"case2: code={code}\n{out}")

    # 3. contended AND heavy_b regressed far beyond the envelope (5x)
    q = {k: round(v * 1.6, 4) for k, v in BASE_Q.items()}
    q["heavy_b"] = 15.0
    code, out = run(tmp, mk(q), BASELINES)
    if code != 1 or "CONTENDED RUN" not in out \
            or "REGRESSED heavy_b" not in out \
            or "REGRESSED heavy_a" in out:
        fails.append(f"case3: code={code}\n{out}")

    # 4. --update refused on a contended run
    q = {k: round(v * 1.6, 4) for k, v in BASE_Q.items()}
    code, out = run(tmp, mk(q), BASELINES, extra=("--update",))
    if code != 1 or "REFUSED --update" not in out:
        fails.append(f"case4: code={code}\n{out}")
    # ...but allowed with --force
    code, out = run(tmp, mk(q), BASELINES, extra=("--update", "--force"))
    if code != 0 or "updated" not in out:
        fails.append(f"case4-force: code={code}\n{out}")

    # 5. idle uniform run stays a plain PASS (sentinel quiet at 1.0x)
    code, out = run(tmp, mk(dict(BASE_Q)), BASELINES)
    if code != 0 or "CONTENDED" in out or out.strip().rsplit(" ", 1)[-1] != "PASS":
        fails.append(f"case5: code={code}\n{out}")

    # --- streaming-overhead denominator cases ---
    SB = dict(BASE_Q)
    SB.update({"stream_noop": 0.40, "stream_x": 1.0, "stream_y": 2.0})
    SBASE = {"sfX": {"round": 1, "total": sum(SB.values()),
                     "n": len(SB), "queries": SB}}

    # 6. the r15 shape: batch families quiet, stream_noop measured 1.7x,
    #    stream ops ~1.6x -> overhead-explained, PASS
    q = dict(SB)
    q.update({"stream_noop": 0.68, "stream_x": 1.6, "stream_y": 3.2})
    code, out = run(tmp, mk(q), SBASE)
    if code != 0 or "overhead-explained stream_x" not in out \
            or "overhead-explained stream_y" not in out \
            or "REGRESSED" in out:
        fails.append(f"case6: code={code}\n{out}")

    # 7. noop quiet -> a 1.6x stream op is a REAL regression
    q = dict(SB); q["stream_y"] = 3.2
    code, out = run(tmp, mk(q), SBASE)
    if code != 1 or "REGRESSED stream_y" not in out:
        fails.append(f"case7: code={code}\n{out}")

    # 8. noop 1.7x but stream_y 5x: far beyond noop*slack -> FAIL it,
    #    while stream_x at 1.6x stays explained
    q = dict(SB)
    q.update({"stream_noop": 0.68, "stream_x": 1.6, "stream_y": 10.0})
    code, out = run(tmp, mk(q), SBASE)
    if code != 1 or "REGRESSED stream_y" not in out \
            or "overhead-explained stream_x" not in out \
            or "REGRESSED stream_x" in out:
        fails.append(f"case8: code={code}\n{out}")

    # 9. the denominator itself is never flagged, even at 5x
    q = dict(SB); q["stream_noop"] = 2.0
    code, out = run(tmp, mk(q), SBASE)
    if code != 0 or "REGRESSED stream_noop" in out:
        fails.append(f"case9: code={code}\n{out}")

    # --- non-absorbing refold cases (quiet sentinels throughout) ---
    bp = os.path.join(tmp, 'base.json')

    # 10. a fold that would hide a 2.1x regression is REFUSED and the
    #     baseline file is left untouched
    q = dict(BASE_Q); q["heavy_a"] = 4.2
    code, out = run(tmp, mk(q), BASELINES, extra=("--update",))
    after = json.load(open(bp))
    if code != 1 or "REFUSED --update" not in out \
            or "worsened heavy_a" not in out or "UNANNOTATED" not in out \
            or after != BASELINES:
        fails.append(f"case10: code={code}\n{out}")

    # 11. the same fold with an annotation lands, and the fold_diff
    #     block records the op, both times, and the reason
    code, out = run(tmp, mk(q), BASELINES,
                    extra=("--update", "--accept=heavy_a:new 2x workload"))
    after = json.load(open(bp))
    fd = after.get("sfX", {}).get("fold_diff", {})
    w = {e["op"]: e for e in fd.get("worsened", [])}
    if code != 0 or "updated" not in out or "FOLD_DIFF" not in out \
            or "heavy_a" not in w \
            or w["heavy_a"]["note"] != "new 2x workload" \
            or after["sfX"]["queries"]["heavy_a"] != 4.2:
        fails.append(f"case11: code={code}\n{out}\n{fd}")

    # 12. --force folds too, but the provenance says so
    code, out = run(tmp, mk(q), BASELINES, extra=("--update", "--force"))
    after = json.load(open(bp))
    fd = after.get("sfX", {}).get("fold_diff", {})
    w = {e["op"]: e for e in fd.get("worsened", [])}
    if code != 0 or w.get("heavy_a", {}).get("note") != "forced":
        fails.append(f"case12: code={code}\n{out}\n{fd}")

    # 13. an improvement-only fold needs no annotation but still records
    #     the diff
    q = dict(BASE_Q); q["heavy_b"] = 1.0
    code, out = run(tmp, mk(q), BASELINES, extra=("--update",))
    after = json.load(open(bp))
    fd = after.get("sfX", {}).get("fold_diff", {})
    if code != 0 or "improved heavy_b" not in out \
            or {e["op"] for e in fd.get("improved", [])} != {"heavy_b"}:
        fails.append(f"case13: code={code}\n{out}\n{fd}")

if fails:
    print("\n---\n".join(fails))
    print("FIXTURE: FAIL")
    sys.exit(1)
print("FIXTURE: PASS")

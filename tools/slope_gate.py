#!/usr/bin/env python3
"""Standing scaling-slope GATE (round-8 verdict task #5).

tools/slope.py is the report; this is the pass/fail check the round loop
runs. It joins two Bench artifacts (normally sf0.01 vs sf0.1 — both ship
with the harness, so the two-point slope is ~3 min of bench) and FAILS on
any query whose steady-state time grows faster than the data unless the
breach carries a written adjudication.

Usage:
  python3 tools/slope_gate.py <bench_small.json> <bench_big.json> \
      <data_ratio> [adjudications.json]

Rules:
  - floor 0.15 s on the small-side time: below it a query is in the
    fixed-cost regime (scheduler constants, stream init) and ratios are
    meaningless — those queries are reported but never fail.
  - default ceiling = data_ratio (time may grow at most linearly with
    data). A query may carry its own ceiling + reason in the
    adjudications file:
        { "q68": {"ceiling": 15, "reason": "typed-path serialization,
                   twin q134 is the scale path"},
          "q87": {"ceiling": 99, "reason": "salted join's deliberate 8x
                   build-side replication"} }
    Every adjudicated breach is printed WITH its reason, so the
    adjudication list is self-documenting (the SLOPE_r08.md discipline,
    mechanized).

Exit 1 on any unadjudicated breach; 0 otherwise.
"""
import json
import sys

small_f, big_f, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
adj = json.load(open(sys.argv[4])) if len(sys.argv) > 4 else {}
small = json.load(open(small_f))
big = json.load(open(big_f))
FLOOR = 0.15

breaches, adjudicated, skipped_floor = [], [], 0
for q, ts in small["queries"].items():
    tb = big["queries"].get(q)
    if tb is None:
        continue
    if ts < FLOOR and tb < FLOOR * ratio:
        skipped_floor += 1
        continue
    r = tb / max(ts, FLOOR)
    entry = adj.get(q)
    ceiling = float(entry["ceiling"]) if entry else ratio
    if r > ceiling:
        breaches.append((q, ts, tb, r, ceiling))
    elif entry and r > ratio:
        adjudicated.append((q, ts, tb, r, entry["reason"]))

print(f"slope gate: {small_f} -> {big_f} (data x{ratio:g}); "
      f"{len(small['queries'])} queries, {skipped_floor} in fixed-cost regime")
if adjudicated:
    print(f"\nadjudicated (over x{ratio:g} but under their documented ceiling):")
    for q, ts, tb, r, reason in sorted(adjudicated, key=lambda x: -x[3]):
        print(f"  {q}: {ts:.3f}s -> {tb:.3f}s (x{r:.1f}) — {reason}")
if breaches:
    print(f"\nBREACHES ({len(breaches)}) — superlinear without adjudication:")
    for q, ts, tb, r, c in sorted(breaches, key=lambda x: -x[3]):
        print(f"  FAIL {q}: {ts:.3f}s -> {tb:.3f}s (x{r:.1f} > ceiling x{c:g})")
    sys.exit(1)
print("\nslope gate: GREEN")

#!/usr/bin/env python3
"""Scaling-slope report: join two Bench artifacts (e.g. sf0.1 vs the
10x-derived set) and flag queries whose steady-state time grows faster
than the data.

Usage: python3 tools/slope.py <bench_small.json> <bench_big.json> <data_ratio>

Writes a markdown table to stdout. A query is flagged superlinear when
t_big / max(t_small, floor) > data_ratio (floor = 0.15 s guards the
fixed-cost regime where ratios are meaningless — a 0.05 s query tripling
to 0.15 s is scheduler constant, not a scan slope).
"""
import json
import sys

small_f, big_f, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
small = json.load(open(small_f))
big = json.load(open(big_f))
FLOOR = 0.15

rows = []
for q, ts in small["queries"].items():
    tb = big["queries"].get(q)
    if tb is None:
        continue
    r = tb / max(ts, FLOOR)
    rows.append((q, ts, tb, r))

rows.sort(key=lambda x: -x[3])
total_s = sum(r[1] for r in rows)
total_b = sum(r[2] for r in rows)
print(f"# Scaling slope: {small_f} -> {big_f} (data x{ratio:g})\n")
print(f"Total steady-state: {total_s:.1f}s -> {total_b:.1f}s "
      f"(x{total_b / total_s:.2f} wall for x{ratio:g} data)\n")
sup = [r for r in rows if r[3] > ratio]
print(f"Queries above the x{ratio:g} line: {len(sup)} of {len(rows)}\n")
print("| query | t_small (s) | t_big (s) | ratio | note |")
print("|---|---|---|---|---|")
cold_small = small.get("cold", {})
cold_big = big.get("cold", {})
for q, ts, tb, r in rows[:40]:
    note = ""
    if q in cold_big:
        note = f"big-run cold: {cold_big[q]}"
    elif ts < FLOOR:
        note = "fixed-cost regime"
    flag = " **superlinear**" if r > ratio and ts >= FLOOR else ""
    print(f"| {q} | {ts:.3f} | {tb:.3f} | x{r:.2f}{flag} | {note} |")

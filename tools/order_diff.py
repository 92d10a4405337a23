#!/usr/bin/env python3
"""Reversed-order marathon analysis (round-11 task: adjudicate the
~14% even spread between same-day captures seen in round 10).

Compares a forward-order bench artifact against a reversed-order one,
both from the same tree and data. If the spread is POSITION-DEPENDENT
environmental pressure (an accumulating in-process tax), a query that
ran late in forward order runs early in reverse, so its rev/fwd ratio
should correlate NEGATIVELY with its forward position: late-forward
queries get faster, early-forward queries get slower. If the spread is
ambient machine noise, ratios are uncorrelated with position.

Usage: order_diff.py fwd.json rev.json
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read())
    return d


def main():
    fwd, rev = load(sys.argv[1]), load(sys.argv[2])
    fq, rq = fwd["queries"], rev["queries"]
    names = [k for k in fq if k in rq]
    n = len(names)
    # forward position (0 = first), ratio rev/fwd
    rows = []
    for i, k in enumerate(names):
        if fq[k] <= 0:
            continue
        rows.append((i, k, fq[k], rq[k], rq[k] / fq[k]))
    # Spearman-ish: Pearson over (position, log ratio)
    xs = [r[0] for r in rows]
    ys = [math.log(r[4]) for r in rows]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    corr = cov / math.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
    tf, tr = sum(r[2] for r in rows), sum(r[3] for r in rows)
    print(f"common queries: {len(rows)}")
    print(f"forward total:  {tf:8.1f} s")
    print(f"reverse total:  {tr:8.1f} s   (ratio {tr/tf:.3f})")
    print(f"corr(fwd position, log rev/fwd ratio): {corr:+.3f}")
    print("  (strongly negative => position-dependent accumulating tax;")
    print("   near zero => ambient noise, not position)")
    # halves comparison: first-half-of-forward vs second-half
    half = len(rows) // 2
    r1 = [r[4] for r in rows[:half]]
    r2 = [r[4] for r in rows[half:]]

    def gmean(v):
        return math.exp(sum(math.log(x) for x in v) / len(v))

    print(f"geomean rev/fwd, first half of forward order:  {gmean(r1):.3f}")
    print(f"geomean rev/fwd, second half of forward order: {gmean(r2):.3f}")
    movers = sorted(rows, key=lambda r: r[4])
    print("\nbiggest speedups in reverse (fwd-late candidates):")
    for i, k, f_, r_, ratio in movers[:8]:
        print(f"  {k:6s} pos {i:3d}/{n}  fwd {f_:6.2f}s  rev {r_:6.2f}s  x{ratio:.2f}")
    print("biggest slowdowns in reverse (fwd-early candidates):")
    for i, k, f_, r_, ratio in movers[-8:]:
        print(f"  {k:6s} pos {i:3d}/{n}  fwd {f_:6.2f}s  rev {r_:6.2f}s  x{ratio:.2f}")


if __name__ == "__main__":
    main()

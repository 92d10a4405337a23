#!/usr/bin/env python3
"""Standing 10x-point GATE (round-9 verdict residue #2).

tools/slope_gate.py covers the harness decade (sf0.01 -> sf0.1, both ship
with the driver); the 10x-derived point -- where the q59 fixed-band and
q215 bugs were actually caught -- was a manual ritual: run Bench on the
ScaleData-derived set, eyeball breaches, hand-re-probe each one isolated,
write the adjudication into SLOPE_rNN.md. This gate mechanizes all of it:

  1. join the sf0.1 and x10 Bench artifacts (same floor/ceiling semantics
     as slope_gate.py; data ratio fixed at 10);
  2. an in-context breach first consults the static adjudications file
     (per-query ceiling + written reason -- structural knees);
  3. any remaining breach is RE-PROBED ISOLATED: one fresh JVM running
     only that query on the same x10 data (SPARK_GRAFT_ONLY=<q>
     graft.Bench). If the isolated steady-state ratio is at or under the
     ceiling, the breach is adjudicated as marathon-tail ambient pressure
     (GC / page cache -- the q269/q260 class from r9, q134/q209 from r8)
     and both numbers are recorded; if it stays over, the gate FAILS;
  4. the machine-written verdict (every breach, in-context + isolated
     seconds, pass/fail per query) lands as JSON so the round report can
     cite a committed artifact instead of a hand-transcribed table.

Usage:
  python3 tools/x10_gate.py <bench_sf0.1.json> <bench_x10.json> <x10_dir> \
      [adjudications.json] [--no-probe] [--out verdict.json]

  <x10_dir>     the ScaleData output the x10 artifact was captured on
                (probes re-run against it; required unless --no-probe).
  --no-probe    report breaches but skip the isolated re-probes (exit 1
                if any breach lacks a static adjudication).
  --out=PATH    verdict JSON path (default: alongside <bench_x10.json>
                as <stem>_gate.json).

Exit 1 on any breach that survives both the static adjudications and its
isolated probe; 0 otherwise.
"""
import json
import os
import subprocess
import sys
import tempfile

FLOOR = 0.15
RATIO = 10.0


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    bad = [f for f in flags if f != "--no-probe" and not f.startswith("--out=")]
    if bad:  # e.g. a space-separated "--out path" would silently become
        # a positional arg and be misread as the x10 dir or adj file
        sys.exit(f"unknown flag(s) {bad}; use --no-probe / --out=PATH")
    if len(args) < 2:
        sys.exit(__doc__)
    small_f, big_f = args[0], args[1]
    x10_dir = args[2] if len(args) > 2 else None
    adj = json.load(open(args[3])) if len(args) > 3 else {}
    no_probe = "--no-probe" in flags
    out_f = None
    for f in flags:
        if f.startswith("--out="):
            out_f = f.split("=", 1)[1]
    if out_f is None:
        out_f = os.path.splitext(big_f)[0] + "_gate.json"

    small = json.load(open(small_f))
    big = json.load(open(big_f))

    breaches, adjudicated, skipped_floor, under = [], [], 0, 0
    for q, ts in small["queries"].items():
        tb = big["queries"].get(q)
        if tb is None:
            continue
        if ts < FLOOR and tb < FLOOR * RATIO:
            skipped_floor += 1
            continue
        r = tb / max(ts, FLOOR)
        entry = adj.get(q)
        ceiling = float(entry["ceiling"]) if entry else RATIO
        if r > ceiling:
            breaches.append({"q": q, "sf01_s": ts, "x10_s": tb,
                             "ratio": round(r, 2), "ceiling": ceiling})
        elif entry and r > RATIO:
            adjudicated.append((q, r, entry["reason"]))
        else:
            under += 1

    print(f"x10 gate: {small_f} -> {big_f} (data x{RATIO:g}); "
          f"{len(small['queries'])} queries, {skipped_floor} in fixed-cost "
          f"regime, {under} under the line")
    for q, r, reason in adjudicated:
        print(f"  adjudicated x{r:.1f}  {q}: {reason}")

    failures = []
    for b in breaches:
        q = b["q"]
        if no_probe:
            print(f"  BREACH x{b['ratio']}  {q} "
                  f"({b['sf01_s']:.2f}s -> {b['x10_s']:.2f}s) -- not probed")
            failures.append(b)
            continue
        if x10_dir is None:
            sys.exit("x10 data dir required for isolated probes "
                     "(or pass --no-probe)")
        print(f"  breach x{b['ratio']}  {q} "
              f"({b['sf01_s']:.2f}s -> {b['x10_s']:.2f}s) -- isolated probe...",
              flush=True)
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            probe_out = tf.name
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=x10_dir,
                   SPARK_GRAFT_ONLY=q.split("_")[0],
                   SPARK_GRAFT_BENCH_OUT=probe_out,
                   SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
        rc = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL).returncode
        iso = None
        try:
            # a probe JVM that died before writing leaves an empty file:
            # record probe_failed below instead of crashing the gate
            probe = json.load(open(probe_out))
            iso = probe["queries"].get(q)
            b["isolated_runs"] = probe.get("runs", {}).get(q)
        except (json.JSONDecodeError, OSError, KeyError):
            iso = None
        finally:
            os.unlink(probe_out)
        if rc != 0 or iso is None:
            b["isolated_s"] = None
            b["verdict"] = "probe_failed"
            failures.append(b)
            print(f"    probe FAILED to produce a number (rc={rc})")
            continue
        iso_r = iso / max(b["sf01_s"], FLOOR)
        b["isolated_s"] = iso
        b["isolated_ratio"] = round(iso_r, 2)
        if iso_r <= b["ceiling"]:
            b["verdict"] = "ambient_pressure"
            print(f"    isolated {iso:.2f}s (x{iso_r:.1f}) -- under the "
                  f"line; adjudicated as marathon-tail ambient pressure")
        else:
            b["verdict"] = "real_breach"
            failures.append(b)
            print(f"    isolated {iso:.2f}s (x{iso_r:.1f}) -- STILL over; "
                  f"real scaling defect")

    verdict = {
        "small": small_f, "big": big_f, "ratio": RATIO, "floor": FLOOR,
        "n_queries": len(small["queries"]),
        "fixed_cost_regime": skipped_floor,
        "static_adjudications": [
            {"q": q, "ratio": round(r, 2), "reason": reason}
            for q, r, reason in adjudicated],
        "breaches": breaches,
        "pass": not failures,
    }
    with open(out_f, "w") as f:
        json.dump(verdict, f, indent=1)
    print(f"verdict -> {out_f}")
    if failures:
        print(f"FAIL: {len(failures)} breach(es) survive adjudication")
        sys.exit(1)
    print("GREEN: every query at or under its ceiling "
          "(in-context or by isolated probe)")


if __name__ == "__main__":
    main()

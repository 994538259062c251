#!/usr/bin/env python3
"""Bench regression gate: compare a Bench JSON line against the recorded
per-query floor medians (tools/bench_floors.json, maintained alongside
BASELINE.md).

Usage:
  python3 tools/bench_gate.py BENCH.json [--update run1.json run2.json ...]

Default mode prints per-query ratio vs floor, flags >2x (the policy bound
from BASELINE.md) and exits 1 if any query exceeds it or failed.
--update recomputes the floors file from the per-query MINIMA of the
given run files (n>=3 recommended). Minimum, not median: the shared box
randomly spikes 2.5-3x on a DIFFERENT query each run (measured: cind_all
[40.1, 99.3, 33.8] across three otherwise-idle runs), so with n=3 a
median still carries a spike whenever two runs were hit. The minimum is
the query's reproducible cost; Bench counters the same noise on the
measurement side by reporting min-of-REPS.
"""
import json
import statistics
import sys

FLOORS = "tools/bench_floors.json"


def load(path):
    with open(path) as f:
        return json.load(f)


def update(paths):
    runs = [load(p) for p in paths]
    names = sorted({q for r in runs for q in r["queries"]})
    floors = {}
    for q in names:
        vals = [r["queries"][q] for r in runs
                if q in r["queries"] and r["queries"][q] >= 0]
        if vals:
            floors[q] = round(min(vals), 2)
    out = {"n_runs": len(runs), "floors": floors,
           "total": round(sum(floors.values()), 1)}
    with open(FLOORS, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {FLOORS}: {len(floors)} queries, "
          f"min-total {out['total']}s over n={len(runs)} runs")


def gate(path):
    bench, ref = load(path), load(FLOORS)
    floors = ref["floors"]
    errors = bench.get("errors", {})
    bad = []
    print(f"{'query':32} {'sec':>8} {'floor':>8} {'ratio':>6}")
    for q, sec in sorted(bench["queries"].items(), key=lambda kv: -kv[1]):
        if q in errors:
            print(f"{q:32} {'FAIL':>8}  {errors[q][:60]}")
            bad.append(q)
            continue
        fl = floors.get(q)
        if fl is None:
            print(f"{q:32} {sec:8.1f} {'new':>8}")
            continue
        ratio = sec / fl if fl > 0 else float("inf")
        # ratio alone false-positives on sub-second floors (a 0.1s query
        # reading 0.21s is timer/startup noise, not a regression): require
        # both >2x AND a material absolute delta
        slow = ratio > 2.0 and (sec - fl) > 0.5
        flag = " <-- >2x" if slow else ""
        print(f"{q:32} {sec:8.1f} {fl:8.1f} {ratio:6.2f}{flag}")
        if slow:
            bad.append(q)
    total = sum(bench["queries"].values())
    print(f"{'TOTAL':32} {total:8.1f} {ref['total']:8.1f} "
          f"{total / ref['total']:6.2f}")
    if bad:
        print(f"GATE FAIL: {bad}")
        return 1
    print("GATE OK")
    return 0


if __name__ == "__main__":
    if "--update" in sys.argv:
        i = sys.argv.index("--update")
        update(sys.argv[i + 1:])
    else:
        sys.exit(gate(sys.argv[1]))

"""Deterministic bench regression differ — compare two bench_out.json
artifacts query-by-query on the PLAN metrics, not the clock.

Wall-clock drifts ~1.3x with ambient host load (SCALE.md "Round-5
bench conditions"), but shuffle_bytes and task counts are functions of
the physical plan alone: a new exchange, a lost broadcast, or a lost
partial aggregation shows up as a shuffle_bytes jump even when seconds
look flat (and vice versa, a seconds jump with identical shuffle_bytes
is host noise, not a regression). This tool prints per-query deltas and
flags:

- SHUFFLE: |shuffle_bytes delta| beyond --shuffle-tol (default 10%,
  plus a 1 MB absolute floor so tiny queries don't flag on jitter)
- TASKS:   task-count growth beyond --task-tol (default 25%, floor 8)
- NEW/GONE: queries present in only one artifact

Exit code 1 if anything flags — usable as a CI gate.

Usage: python tools/compare_bench.py OLD.json NEW.json [--shuffle-tol F]
       [--task-tol F] [--show-all]
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--shuffle-tol", type=float, default=0.10)
    ap.add_argument("--task-tol", type=float, default=0.25)
    ap.add_argument("--show-all", action="store_true")
    args = ap.parse_args()

    old = json.load(open(args.old)).get("query_metrics", {})
    new = json.load(open(args.new)).get("query_metrics", {})
    flags = 0

    for name in sorted(set(old) | set(new)):
        if name not in new:
            print(f"GONE    {name}")
            flags += 1
            continue
        if name not in old:
            print(f"NEW     {name}  (no baseline — inspect its plan once)")
            continue
        o, n = old[name], new[name]
        osh, nsh = o.get("shuffle_bytes"), n.get("shuffle_bytes")
        ot, nt = o.get("tasks"), n.get("tasks")
        line = (
            f"{name:30s} sec {o.get('sec', 0):7.2f}->{n.get('sec', 0):7.2f}"
        )
        flagged = []
        if osh is not None and nsh is not None:
            line += f"  shuffle {osh / 1e6:9.1f}->{nsh / 1e6:9.1f} MB"
            if abs(nsh - osh) > max(args.shuffle_tol * max(abs(osh), 1), 1e6):
                flagged.append("SHUFFLE")
        if ot is not None and nt is not None:
            line += f"  tasks {ot:5d}->{nt:5d}"
            if nt - ot > max(args.task_tol * max(ot, 1), 8):
                flagged.append("TASKS")
        if flagged:
            print("FLAG", "+".join(flagged), line)
            flags += 1
        elif args.show_all:
            print("ok  ", line)

    tot_o = sum(v.get("sec", 0) for v in old.values())
    tot_n = sum(v.get("sec", 0) for v in new.values())
    print(
        f"totals: {tot_o:.1f}s -> {tot_n:.1f}s over "
        f"{len(old)} -> {len(new)} queries; {flags} flag(s)"
    )
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())

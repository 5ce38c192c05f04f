#!/usr/bin/env python3
"""Round-over-round bench gate: wall-time AND shuffle-byte regressions.

Usage: bench_gate.py OLD_bench_detail.json NEW_bench_detail.json

A local[32] host has fast loopback shuffle, so a plan regression that
doubles exchange volume can ship with flat wall-times — and exchange
volume is exactly what kills the 100 TB deploy. This gate therefore
applies the SAME floor semantics to both axes, per query:

  time    regression: new > 1.5 x old AND new - old > 0.4 s
  shuffle regression: new > 1.5 x old AND new - old > 65536 bytes

(the absolute floors keep sub-noise queries from tripping the ratio).
New queries (absent from OLD) and removed ones are reported, not
failed. Exit 1 on any regression — run before committing a full-bench
snapshot; the old side is the last committed snapshot
(`git show <ref>:bench_detail.json`).
"""
import json
import sys

TIME_RATIO, TIME_FLOOR_S = 1.5, 0.4
SHUF_RATIO, SHUF_FLOOR_B = 1.5, 65536


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    ot, nt = old["queries"], new["queries"]
    os_, ns = old.get("shuffle_bytes", {}), new.get("shuffle_bytes", {})
    regressions = []
    for q in sorted(nt):
        if q not in ot:
            print(f"note  {q}: new query ({nt[q]:.2f} s, "
                  f"{ns.get(q, -1)} shuffle B)")
            continue
        t0, t1 = ot[q], nt[q]
        if t0 >= 0 and t1 > TIME_RATIO * t0 and t1 - t0 > TIME_FLOOR_S:
            regressions.append(f"TIME  {q}: {t0:.2f} s -> {t1:.2f} s "
                               f"({t1 / t0:.2f}x)")
        b0, b1 = os_.get(q, -1), ns.get(q, -1)
        if b0 >= 0 and b1 > SHUF_RATIO * b0 and b1 - b0 > SHUF_FLOOR_B:
            regressions.append(f"SHUF  {q}: {b0} B -> {b1} B "
                               f"({b1 / max(b0, 1):.2f}x)")
    for q in sorted(set(ot) - set(nt)):
        print(f"note  {q}: removed (was {ot[q]:.2f} s)")
    for r in regressions:
        print(f"REGRESSION {r}")
    if not regressions:
        print("gate: clean (time + shuffle-bytes, "
              f"{len(set(nt) & set(ot))} shared queries)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())

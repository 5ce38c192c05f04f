#!/usr/bin/env python3
"""Round-over-round bench gate: shuffle/spill bytes first, time second.

Usage: bench_gate.py OLD_bench_detail.json NEW_bench_detail.json [RETRY_detail.json]

A local[32] host has fast loopback shuffle, so a plan regression that
doubles exchange volume can ship with flat wall-times — and exchange
volume is exactly what kills the 100 TB deploy. The shared host ALSO
has multi-minute degradation phases that inflate wall-times 30-60%
with byte-identical shuffles (r13 assortativity, r14 winsorize), so
the two axes get different trust levels:

  HARD (deterministic, fail immediately):
    shuffle regression: new > 1.5 x old AND new - old > 65536 bytes
    spill  regression: spill went 0 -> nonzero (or > 1.5 x nonzero old)
  NOISE-QUARANTINED (host-jitter-prone, re-measure before failing):
    time regression:   new > 1.5 x old AND new - old > 0.4 s
                        AND the query's shuffle bytes did NOT regress

  * no RETRY file: time-only trips are QUARANTINED — written to
    bench_noise.json next to NEW and printed as `noise`; exit 3 means
    "re-measure these, then re-invoke with the retry detail".
    Re-measure with a targeted bench over just those queries
    (SPARK_GRAFT_BENCH_ONLY=q_a,q_b graft.Bench) in a quiet window.
  * with RETRY: a quarantined query fails only if min(new, retry)
    still trips against old — two independent inflated runs are a
    regression, one is host noise.

Absolute floors keep sub-noise queries from tripping the ratios. New
queries (absent from OLD) and removed ones are reported, not failed.
Exit 0 clean / 1 hard or confirmed regressions / 3 quarantine pending.
The old side is the last committed snapshot
(`git show <ref>:bench_detail.json`).
"""
import json
import os
import sys

TIME_RATIO, TIME_FLOOR_S = 1.5, 0.4
SHUF_RATIO, SHUF_FLOOR_B = 1.5, 65536
SPILL_RATIO = 1.5
FLIPS_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_flips.json")


def known_flip(q, b0, b1):
    """True iff old AND new each match (within 10%) distinct states of a
    checked-in AQE flip pair for this query — plan nondeterminism on an
    untouched query, not a regression."""
    try:
        flips = json.load(open(FLIPS_FILE))
    except OSError:
        return False
    states = flips.get(q)
    if not isinstance(states, list):
        return False
    def match(b):
        return [s for s in states if s > 0 and abs(b - s) <= 0.1 * s]
    m0, m1 = match(b0), match(b1)
    return bool(m0) and bool(m1) and set(m0) != set(m1)


def main() -> int:
    if len(sys.argv) not in (3, 4):
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    retry = json.load(open(sys.argv[3])) if len(sys.argv) == 4 else None
    ot, nt = old["queries"], new["queries"]
    os_, ns = old.get("shuffle_bytes", {}), new.get("shuffle_bytes", {})
    op, np_ = old.get("spill_bytes", {}), new.get("spill_bytes", {})
    rt = retry["queries"] if retry else {}

    hard, noise, confirmed = [], [], []
    for q in sorted(nt):
        if q not in ot:
            print(f"note  {q}: new query ({nt[q]:.2f} s, "
                  f"{ns.get(q, -1)} shuffle B)")
            continue
        shuf_trip = False
        b0, b1 = os_.get(q, -1), ns.get(q, -1)
        if b0 >= 0 and b1 > SHUF_RATIO * b0 and b1 - b0 > SHUF_FLOOR_B:
            if known_flip(q, b0, b1):
                print(f"flip  {q}: {b0} B -> {b1} B — known AQE "
                      "near-threshold broadcast flip, cleared")
            else:
                shuf_trip = True
                hard.append(f"SHUF  {q}: {b0} B -> {b1} B "
                            f"({b1 / max(b0, 1):.2f}x)")
        p0, p1 = op.get(q, 0), np_.get(q, 0)
        if p1 > 0 and (p0 == 0 or p1 > SPILL_RATIO * p0):
            hard.append(f"SPILL {q}: {p0} B -> {p1} B")
        t0, t1 = ot[q], nt[q]
        if t0 >= 0 and t1 > TIME_RATIO * t0 and t1 - t0 > TIME_FLOOR_S:
            if shuf_trip:
                # byte-confirmed: the time trip is real, fold into hard
                hard.append(f"TIME  {q}: {t0:.2f} s -> {t1:.2f} s "
                            f"({t1 / t0:.2f}x, shuffle-confirmed)")
            elif retry is not None:
                t2 = rt.get(q, t1)
                best = min(t1, t2)
                if best > TIME_RATIO * t0 and best - t0 > TIME_FLOOR_S:
                    confirmed.append(
                        f"TIME  {q}: {t0:.2f} s -> {t1:.2f} s, "
                        f"retry {t2:.2f} s (both trip)")
                else:
                    print(f"noise {q}: {t0:.2f} s -> {t1:.2f} s, "
                          f"retry {t2:.2f} s — host jitter, cleared")
            else:
                noise.append(q)
                print(f"noise {q}: {t0:.2f} s -> {t1:.2f} s "
                      f"({t1 / t0:.2f}x) with flat shuffle bytes "
                      f"({b0} -> {b1}) — quarantined, re-measure")
    for q in sorted(set(ot) - set(nt)):
        print(f"note  {q}: removed (was {ot[q]:.2f} s)")

    for r in hard + confirmed:
        print(f"REGRESSION {r}")
    if noise and retry is None:
        noise_path = os.path.join(
            os.path.dirname(os.path.abspath(sys.argv[2])), "bench_noise.json")
        json.dump({"queries": noise}, open(noise_path, "w"), indent=1)
        print(f"gate: {len(noise)} time-only trip(s) quarantined -> "
              f"{noise_path}; re-measure and re-invoke with the retry "
              "detail (exit 3)")
        return 3 if not (hard or confirmed) else 1
    if not (hard or confirmed):
        print("gate: clean (shuffle/spill hard, time noise-screened, "
              f"{len(set(nt) & set(ot))} shared queries)")
    return 1 if (hard or confirmed) else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Pin per-query plan fingerprints from a bench detail file.

Usage: plan_fp.py BENCH_DETAIL.json [q1,q2,...] [--stabilize]

Extracts the "plan_fp" map Bench emits and writes (or selectively
updates) tools/plan_fingerprints.json — the acknowledged plan state
bench_gate.py diffs every run against. With a query list, only those
entries are updated (the workflow after an INTENTIONAL plan change to
specific queries); without one, the whole file is regenerated.
Queries Bench marked plan_fp_volatile are never pinned — their plan
legitimately flips run-to-run and the gate skips them.

--stabilize (requires a query list): acknowledges a deliberate
plan-determinism FIX (join hints / scoped config forcing one physical
state) by removing the listed queries from the persistent
"_volatile_ever" ledger and pinning their now-deterministic
fingerprint. Refuses any query the given detail still marks
plan_fp_volatile — the fix must demonstrably hold within the run
being pinned.
"""
import json
import os
import sys


def main() -> int:
    argv = list(sys.argv[1:])
    stabilize = "--stabilize" in argv
    if stabilize:
        argv.remove("--stabilize")
    if len(argv) not in (1, 2) or (stabilize and len(argv) != 2):
        print(__doc__)
        return 2
    detail = json.load(open(argv[0]))
    fps = detail.get("plan_fp", {})
    volatile = set(detail.get("plan_fp_volatile", []))
    only = set(argv[1].split(",")) if len(argv) == 2 else None
    if stabilize:
        still = sorted(only & volatile)
        if still:
            print(f"REFUSED: still plan_fp_volatile in this detail: {still}\n"
                  "(the determinism fix must hold across the run being "
                  "pinned — force the plan, re-run, then --stabilize)")
            return 1
    pins_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plan_fingerprints.json")
    try:
        pins = json.load(open(pins_path))
    except OSError:
        pins = {}
    if only is None:
        # full regen: keep only the volatile ledger from the old file
        pins = {"_volatile_ever": pins.get("_volatile_ever", [])}
    else:
        missing = only - set(fps)
        if missing:
            print(f"not in detail: {sorted(missing)}")
            return 1
    # volatility is a PROPERTY OF THE QUERY, not of one run: a query
    # that flipped plans in ANY run stays exempt forever (a later run
    # can land on one state by chance and would otherwise get pinned,
    # then false-trip when it flips back). The union lives in the pins
    # file under "_volatile_ever". --stabilize is the ONLY exit: a
    # verified determinism fix removes the listed queries from the
    # ledger before the union.
    ledger = set(pins.get("_volatile_ever", []))
    if stabilize:
        ledger -= only
    ever = ledger | volatile
    n_vol = 0
    for q, fp in sorted(fps.items()):
        if only is not None and q not in only:
            continue
        if q in ever:
            pins.pop(q, None)
            n_vol += 1
            continue
        pins[q] = fp
    # drop pins for queries no longer in the suite (full regen only)
    if only is None:
        pins = {q: fp for q, fp in pins.items() if q in fps}
    pins["_volatile_ever"] = sorted(ever)
    json.dump(dict(sorted(pins.items())), open(pins_path, "w"), indent=1)
    print(f"pinned {len(pins) - 1} fingerprints -> {pins_path}"
          f" ({n_vol} ever-volatile skipped)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

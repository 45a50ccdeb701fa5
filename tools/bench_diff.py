#!/usr/bin/env python
"""Spread-aware bench comparison (VERDICT r05 item 4 follow-through).

Compares two BENCH_r*.json files (or a bench.py stdout capture) and
classifies every per-query delta against the recorded min/median/max
spread: a query only counts as REGRESSED/IMPROVED when the new best
time falls outside the old run's observed noise band (and vice versa);
everything else is WITHIN-NOISE.  Without this, a 1.2-1.4x blip on a
0.3 s query is indistinguishable from a real plan regression (the r05
verdict's complaint).

    python tools/bench_diff.py BENCH_r05.json BENCH_r06.json
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        data = json.load(fh)
    # driver files wrap the parsed line under "parsed"; raw bench.py
    # output is the line itself
    return data.get("parsed", data)


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    old_q, new_q = old["queries"], new["queries"]
    old_s = old.get("spread", {})
    new_s = new.get("spread", {})
    rows = []
    for name in new_q:
        if name not in old_q:
            rows.append((name, None, new_q[name], "NEW"))
            continue
        a, b = old_q[name], new_q[name]
        # Two independent band checks (NOT a union — bench.py records
        # queries[name] == spread[name]["min"], so a union band always
        # contains the new value and would classify every real
        # regression as noise): the new best must sit inside the OLD
        # run's observed [min, max], and the old best inside the NEW
        # run's — only when both runs' distributions are disjoint in
        # the same direction do we flag.
        # Pre-spread bench files (BENCH_r01-r05) have no band at all; a
        # point band would flag every 1 ms blip, so fall back to a ±20%
        # relative tolerance around the recorded best (the empirical
        # fresh-JVM noise on sub-second queries per the r05 verdict).
        old_lo = old_s.get(name, {}).get("min", a * 0.8)
        old_hi = old_s.get(name, {}).get("max", a * 1.2)
        new_lo = new_s.get(name, {}).get("min", b * 0.8)
        new_hi = new_s.get(name, {}).get("max", b * 1.2)
        if new_lo > old_hi:
            verdict = "REGRESSED"
        elif new_hi < old_lo:
            verdict = "IMPROVED"
        else:
            verdict = "within-noise"
        rows.append((name, a, b, verdict))
    for name in old_q:
        if name not in new_q:
            rows.append((name, old_q[name], None, "REMOVED"))
    print(f"{'query':34s} {'old':>7s} {'new':>7s}  verdict")
    flagged = 0
    for name, a, b, verdict in rows:
        if verdict in ("REGRESSED", "IMPROVED", "NEW", "REMOVED"):
            flagged += 1
        astr = f"{a:7.3f}" if a is not None else "      -"
        bstr = f"{b:7.3f}" if b is not None else "      -"
        print(f"{name:34s} {astr} {bstr}  {verdict}")
    print(
        f"\ntotal {old.get('value')} -> {new.get('value')} "
        f"({flagged} outside noise band of {len(rows)})"
    )


if __name__ == "__main__":
    main()

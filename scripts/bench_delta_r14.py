"""Canary-adjusted before/after table for r14: BENCH_LOCAL_r14_baseline.json
(pristine HEAD worktree) vs BENCH_LOCAL_r14_idle.json (r14 tree), same
host, adjacent phases. Prints headline + extras deltas sorted by ratio.

Usage: python scripts/bench_delta_r14.py [before.json] [after.json]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    before = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL_r14_baseline.json"))
    after = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCH_LOCAL_r14_idle.json"))
    cb = before["queries"]["pricing_summary"]
    ca = after["queries"]["pricing_summary"]
    print(f"canary before={cb} after={ca} (ratios below are canary-adjusted: "
          f"(after/ca)/(before/cb))")
    for label, key in (("HEADLINE", "queries"), ("EXTRAS", "extras")):
        print(f"\n== {label} ==")
        b, a = before[key], after[key]
        rows = []
        for name in sorted(set(b) & set(a)):
            if b[name] <= 0:
                continue
            adj = (a[name] / ca) / (b[name] / cb)
            rows.append((adj, name, b[name], a[name]))
        for adj, name, bv, av in sorted(rows):
            sb = before.get(f"{key}_spread", before.get("queries_spread", {})).get(name)
            sa = after.get(f"{key}_spread", after.get("queries_spread", {})).get(name)
            print(f"{name:38s} {bv:9.3f} -> {av:9.3f}  adj x{adj:5.2f}"
                  f"  spreads {sb}/{sa}")
        only_b = sorted(set(b) - set(a))
        only_a = sorted(set(a) - set(b))
        if only_b:
            print("only-before:", only_b)
        if only_a:
            print("only-after:", only_a)
        if label == "HEADLINE":
            print(f"total {before['value']} -> {after['value']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

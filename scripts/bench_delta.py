"""Canary-adjusted round-over-round bench comparison (r12 verdict item 5).

Given two bench artifacts (old, new), print one table of per-probe
canary-ADJUSTED ratios and flag only probes whose adjusted ratio exceeds
the threshold (default 1.3x). The adjustment divides each probe's
canary_relative (probe min / in-phase pricing_summary canary min) in the
new artifact by the same field in the old one — pricing_summary's code
is frozen (~r05), so co-tenant host drift cancels out of the ratio and
what remains is attributable to code. This is the one-table read the
r11/r12 drift forensics derived by hand each round.

Usage:
    python scripts/bench_delta.py BENCH_r12.json BENCH_r13.json
    python scripts/bench_delta.py --threshold 1.5 OLD.json NEW.json

Artifacts older than r12 carry no canary fields; those fall back to raw
seconds ratios, marked 'raw' in the basis column (read with the usual
host-drift caveat).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _rows(old: dict, new: dict):
    """Yield (section, name, basis, old_val, new_val, ratio) for every
    probe present in both artifacts; canary-adjusted where both sides
    carry the canary field, raw seconds otherwise."""
    for section, rel_key, abs_key in (
        ("headline", "canary_relative", "queries"),
        ("extras", "extras_canary_relative", "extras"),
    ):
        o_rel, n_rel = old.get(rel_key) or {}, new.get(rel_key) or {}
        o_abs, n_abs = old.get(abs_key) or {}, new.get(abs_key) or {}
        for name in sorted(set(o_abs) & set(n_abs)):
            if name in o_rel and name in n_rel and o_rel[name]:
                basis, ov, nv = "canary", o_rel[name], n_rel[name]
            elif o_abs[name]:
                basis, ov, nv = "raw", o_abs[name], n_abs[name]
            else:
                continue
            yield section, name, basis, ov, nv, nv / ov


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--threshold",
        type=float,
        default=1.3,
        help="flag probes whose canary-adjusted ratio exceeds this "
        "(1.3 = the drift band the r12 verdict used)",
    )
    args = ap.parse_args()
    old, new = _load(args.old), _load(args.new)

    rows = list(_rows(old, new))
    if not rows:
        print("no comparable probes between the two artifacts")
        sys.exit(1)

    flagged = [r for r in rows if r[5] > args.threshold]
    improved = [r for r in rows if r[5] < 1 / args.threshold]

    w = max(len(r[1]) for r in rows)
    print(f"{'section':8} {'probe':{w}} {'basis':6} "
          f"{'old':>8} {'new':>8} {'ratio':>7}")
    for section, name, basis, ov, nv, ratio in rows:
        mark = " <-- FLAG" if ratio > args.threshold else ""
        print(f"{section:8} {name:{w}} {basis:6} "
              f"{ov:8.3f} {nv:8.3f} {ratio:7.3f}{mark}")

    oc = old.get("env", {}).get("canary_pricing_summary_end")
    nc = new.get("env", {}).get("canary_pricing_summary_end")
    print(f"\nend-canary old={oc} new={nc}  "
          f"(absolute pricing_summary at run end; ratio "
          f"{'n/a' if not (oc and nc) else round(nc / oc, 3)})")
    print(f"{len(rows)} comparable probes: {len(flagged)} flagged "
          f"> {args.threshold}x adjusted, {len(improved)} improved "
          f"< {1 / args.threshold:.3f}x")
    for section, name, basis, ov, nv, ratio in sorted(
        flagged, key=lambda r: -r[5]
    ):
        print(f"  FLAG {section}/{name}: {ratio:.3f}x ({basis})")


if __name__ == "__main__":
    main()

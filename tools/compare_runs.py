#!/usr/bin/env python3
"""Per-query normalized drift between two bench_full*.json records.

Usage: python3 tools/compare_runs.py OLD.json NEW.json [threshold_pct]

For each query present in both runs, prints the normalized figure
(min(in-battery, isolated) * canary_scale — the same number the gate
and derive_tolerances.py use) from each run and the delta; sorts by
relative regression and flags queries above the threshold (default
20%, the round-15 judge's plan-audit bar). Also prints the common-
query normalized totals — the battery-drift headline.
"""
import json
import sys


def norm(d):
    cs = d["canary_scale"]
    iso = d.get("isolated", {})
    out = {}
    for q, t in d["queries"].items():
        cands = [x for x in (t, iso.get(q)) if x is not None and x >= 0]
        if cands:
            out[q] = min(cands) * cs
    return out


def main():
    old_f, new_f = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    old = norm(json.load(open(old_f)))
    new = norm(json.load(open(new_f)))
    common = sorted(set(old) & set(new))
    rows = [(q, old[q], new[q], (new[q] - old[q]) / old[q] * 100.0)
            for q in common]
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] > thr and r[2] > 1.0]
    print(f"common queries: {len(common)}  "
          f"total {sum(old[q] for q in common):.1f}s -> "
          f"{sum(new[q] for q in common):.1f}s  "
          f"({(sum(new[q] for q in common) / sum(old[q] for q in common) - 1) * 100:+.1f}%)")
    print(f"\n{len(flagged)} queries > +{thr:.0f}% (and > 1s) — plan-audit list:")
    for q, o, n, d in flagged:
        print(f"  {q}: {o:.2f} -> {n:.2f}  ({d:+.1f}%)")
    print("\ntop 15 by delta either way:")
    for q, o, n, d in rows[:8] + rows[-7:]:
        print(f"  {q}: {o:.2f} -> {n:.2f}  ({d:+.1f}%)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"\nnew-only queries ({len(only_new)}): "
              + ", ".join(f"{q}={new[q]:.2f}" for q in only_new))


if __name__ == "__main__":
    main()

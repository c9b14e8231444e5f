#!/usr/bin/env python3
"""Fold fresh Bench captures into per-query minima for BASELINE.md.

Usage: fold_baseline.py PRIOR_MIN.json RUN1.json [RUN2.json ...]

PRIOR_MIN.json: {"queries": {name: sec}} — the previous round's minima
(or a hand-built dict). Each RUN is a Bench output line (same shape).
Prints a markdown table of new minima plus a summary of totals and the
queries whose minimum moved.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    prior = load(sys.argv[1])
    runs = [load(p) for p in sys.argv[2:]]
    names = sorted(set(prior) | {n for r in runs for n in r})
    folded, moved = {}, []
    for n in names:
        samples = [r[n] for r in runs if n in r and r[n] >= 0]
        p = prior.get(n)
        if p is None and not samples:
            # name seen only in runs that errored (negative timings):
            # nothing to fold — skip rather than min() an empty list
            continue
        best = min([p] + samples) if p is not None else min(samples)
        folded[n] = best
        if p is not None and best < p - 0.005:
            moved.append((n, p, best))
    print("| query | sf0.1 wall-clock (s) |")
    print("|---|---|")
    for n in sorted(folded):
        print(f"| {n} | {folded[n]:.2f} |")
    print()
    print(f"total(prior minima)  = {sum(prior.values()):.1f} s over {len(prior)}")
    print(f"total(folded minima) = {sum(folded.values()):.1f} s over {len(folded)}")
    for i, r in enumerate(runs, 1):
        ok = {k: v for k, v in r.items() if v >= 0}
        print(f"run{i} total = {sum(ok.values()):.1f} s over {len(ok)}")
        worst = sorted(((v / folded[k], k, v) for k, v in ok.items()
                        if folded.get(k, 0) > 0),
                       key=lambda t: -t[0])[:5]
        print("  worst vs folded min: " +
              ", ".join(f"{k} {v:.2f}/{folded[k]:.2f}={x:.2f}x" for x, k, v in worst))
    if moved:
        print("moved down: " + ", ".join(f"{n} {p:.2f}->{b:.2f}" for n, p, b in moved))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Diff two bench artifacts per-query (the repo's cross-round
comparison discipline — see README "Benchmarking discipline").

Usage: python3 scripts/bench_compare.py OLD.json NEW.json [threshold]

Reads line 1 of each artifact (the medians map `"queries":{...}`),
prints keys whose median moved more than `threshold`× (default 2.0)
in either direction plus added/removed keys, and exits 1 if any
slowdown crosses the threshold above 0.5 s — the same signal a round
should investigate before re-committing BENCH_LOCAL_BASELINE.json.

Dev tooling only — the engine itself has no Python dependency.
"""
import json
import sys


def medians(path):
    with open(path) as f:
        return json.loads(f.readline())


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old = medians(sys.argv[1])
    new = medians(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq, nq = old["queries"], new["queries"]
    print(f"old: {old['value']:.1f}s over {old['n_queries']} keys | "
          f"new: {new['value']:.1f}s over {new['n_queries']} keys")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    bad = 0
    for k in sorted(set(oq) & set(nq)):
        o, n = oq[k], nq[k]
        if n > thr * o and n > 0.5:
            print(f"SLOWER {k:38s} {o:7.3f} -> {n:7.3f}  ({n / o:.1f}x)")
            bad += 1
        elif o > thr * n and o > 0.5:
            print(f"faster {k:38s} {o:7.3f} -> {n:7.3f}  ({o / n:.1f}x)")
    print(f"{bad} slowdown(s) past {thr}x")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

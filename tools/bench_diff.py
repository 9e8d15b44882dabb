#!/usr/bin/env python3
"""Diff two bench_full JSON files (graft.Bench output lines).

Usage: bench_diff.py BEFORE.json AFTER.json [--top N]
Prints total before/after, per-query deltas sorted by absolute saving,
and the common-set median ratio.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip().splitlines()[0])
    return d.get("queries", d)


def main():
    before, after = load(sys.argv[1]), load(sys.argv[2])
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 25
    common = sorted(set(before) & set(after))
    rows = [(before[k] - after[k], before[k], after[k], k)
            for k in common if before[k] is not None and after[k] is not None]
    rows.sort(reverse=True)
    tb = sum(r[1] for r in rows)
    ta = sum(r[2] for r in rows)
    ratios = sorted(r[2] / r[1] for r in rows if r[1] > 0)
    med = ratios[len(ratios) // 2] if ratios else float("nan")
    print(f"common {len(rows)} queries: {tb:.1f}s -> {ta:.1f}s "
          f"(delta {tb - ta:+.1f}s, median ratio {med:.3f})")
    only_a = sorted(set(after) - set(before))
    if only_a:
        extra = sum(after[k] for k in only_a if after[k] is not None)
        print(f"new-only in AFTER: {len(only_a)} queries, {extra:.1f}s")
    print(f"\n{'saved':>8} {'before':>8} {'after':>8}  query   (top {top} by |delta|)")
    for d, b, a, k in sorted(rows, key=lambda r: -abs(r[0]))[:top]:
        print(f"{d:8.2f} {b:8.2f} {a:8.2f}  {k}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Diff two Bench JSON lines (e.g. BENCH_r1.json vs a local run).

Usage: python3 tools/bench_compare.py old.json new.json [threshold]
Prints per-query deltas beyond the threshold ratio (default 1.5x) and
the totals. Accepts raw files containing the JSON line anywhere.
"""
import json
import sys


def load(path):
    # find the bench line itself (raw logs contain other braces); the
    # LAST matching line wins if the file holds multiple runs
    lines = [l for l in open(path) if '"metric"' in l and '"queries"' in l]
    if not lines:
        raise SystemExit(f"{path}: no bench JSON line found")
    line = lines[-1]
    return json.loads(line[line.index('{'):line.rindex('}') + 1])


def main(old_path, new_path, threshold=1.5):
    old, new = load(old_path), load(new_path)
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] / max(old['value'], 1e-9):.2f}x), "
          f"queries: {len(old['queries'])} -> {len(new['queries'])}")
    both = sorted(set(old['queries']) & set(new['queries']))
    rows = []
    for q in both:
        a, b = old['queries'][q], new['queries'][q]
        if a <= 0 or b <= 0:
            rows.append((float('inf'), q, a, b))
        elif b / a >= threshold or a / b >= threshold:
            rows.append((b / a, q, a, b))
    for ratio, q, a, b in sorted(rows, key=lambda r: -r[0]):
        print(f"  {q}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x)")
    for label, s in (("only-old", set(old['queries']) - set(new['queries'])),
                     ("only-new", set(new['queries']) - set(old['queries']))):
        if s:
            print(f"  {label}: {sorted(s)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.5)

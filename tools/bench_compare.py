#!/usr/bin/env python3
"""Compare two bench_detail.json files (warm timings): per-query ratio,
median ratio over shared queries, and outliers past a threshold.
Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio_floor]"""
import json, sys, statistics

def load(p):
    d = json.load(open(p))
    q = d["queries"]
    out = {}
    for k, v in q.items():
        if isinstance(v, dict):
            w = v.get("warm", v.get("min", -1))
        else:
            w = v
        if w and w > 0:
            out[k] = w
    return out

def main(old_p, new_p, floor=1.3):
    old, new = load(old_p), load(new_p)
    shared = sorted(set(old) & set(new))
    ratios = {k: new[k] / old[k] for k in shared}
    med = statistics.median(ratios.values())
    print(f"shared={len(shared)} median_ratio={med:.3f} "
          f"(new {sum(new[k] for k in shared):.1f}s vs old {sum(old[k] for k in shared):.1f}s)")
    out = [(k, r) for k, r in ratios.items() if r > floor and new[k] > 0.15]
    for k, r in sorted(out, key=lambda x: -x[1]):
        print(f"  SLOWER {k}: {old[k]:.3f} -> {new[k]:.3f} ({r:.2f}x)")
    wins = [(k, r) for k, r in ratios.items() if r < 1/floor and old[k] > 0.15]
    for k, r in sorted(wins, key=lambda x: x[1])[:15]:
        print(f"  faster {k}: {old[k]:.3f} -> {new[k]:.3f} ({r:.2f}x)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 1.3)

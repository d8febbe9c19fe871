#!/usr/bin/env python3
"""Honest-vs-count bench diff (round-15 verdict #2's receipt).

Reads two SPARK_GRAFT_BENCH_OUT JSONs (count-mode and
SPARK_GRAFT_BENCH_FULL=1) from the same session and prints totals
(raw + calibration-normalized) and the top-N divergent lines, so the
honest-mode ratio is a per-line table instead of a single opaque
number.

Usage: honest_diff.py bench_count.json bench_honest.json [topN]
"""
import json
import sys


def main():
    count = json.load(open(sys.argv[1]))
    honest = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    cq, hq = count["queries"], honest["queries"]
    common = sorted(set(cq) & set(hq))
    ct, ht = sum(cq[q] for q in common), sum(hq[q] for q in common)
    cc, hc = count["calibration_s"], honest["calibration_s"]
    print(f"queries: {len(common)} common "
          f"({len(cq)} count / {len(hq)} honest)")
    print(f"count-mode  total {ct:8.2f} s  calibration {cc:.3f}")
    print(f"honest-mode total {ht:8.2f} s  calibration {hc:.3f}")
    print(f"raw ratio {ht / ct:.3f}x   "
          f"calibration-normalized {(ht / hc) / (ct / cc):.3f}x")
    rows = sorted(common, key=lambda q: -(hq[q] - cq[q]))[:top_n]
    print(f"\ntop {top_n} divergent lines (by honest - count seconds):")
    print(f"{'query':<38} {'count':>8} {'honest':>8} {'delta':>8} {'ratio':>7}")
    for q in rows:
        d = hq[q] - cq[q]
        r = hq[q] / cq[q] if cq[q] > 0 else float("inf")
        print(f"{q:<38} {cq[q]:8.3f} {hq[q]:8.3f} {d:8.3f} {r:6.1f}x")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Calibration-normalized round-over-round bench comparison.

Usage: python3 scripts/compare_bench.py OLD_DETAIL.json NEW_DETAIL.json [--top N]

Both artifacts are BENCH_DETAIL-shaped ({"queries": {...}, "calibration": s}).
Every per-query ratio new/old is divided by the calibration ratio
(new_cal/old_cal), so uniform box weather cancels and what's left is
attributable to code. Output: normalized geomean over shared queries and
the worst normalized regressions. Artifacts without a "calibration"
field (rounds ≤ 9) fall back to raw ratios with a warning.
"""
import json
import math
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 10
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    old, new = (json.load(open(p)) for p in args[:2])
    cal_ratio = None
    if "calibration" in old and "calibration" in new:
        cal_ratio = new["calibration"] / old["calibration"]
        print(f"calibration: old {old['calibration']:.3f}s  new "
              f"{new['calibration']:.3f}s  box ratio {cal_ratio:.3f}x")
    else:
        print("WARNING: no calibration field in one artifact — raw ratios "
              "(box weather NOT cancelled)")
        cal_ratio = 1.0
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    ratios = []
    for q in shared:
        a, b = old["queries"][q], new["queries"][q]
        if a <= 0 or b <= 0:
            continue
        ratios.append((q, (b / a) / cal_ratio, a, b))
    if not ratios:
        print("no shared queries")
        return
    geo = math.exp(sum(math.log(r) for _, r, _, _ in ratios) / len(ratios))
    print(f"{len(ratios)} shared queries, normalized geomean {geo:.3f}x")
    print(f"worst {top} normalized regressions:")
    for q, r, a, b in sorted(ratios, key=lambda x: -x[1])[:top]:
        print(f"  {q:32s} {a:7.3f}s -> {b:7.3f}s  norm {r:.2f}x")


main()

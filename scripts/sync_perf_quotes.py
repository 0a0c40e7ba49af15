#!/usr/bin/env python3
"""Sync the quoted `sec` column of PERF.md's BENCHVEC drift block from
BENCHVEC.json (the artifact is the source of truth; prose ratios still
need a human pass — this only rewrites the number column so a bench
rerun doesn't mean hand-editing 35 rows). Prints every row it changed
so the ratio commentary can be reviewed against the new values.
Usage: sync_perf_quotes.py [--apply]
"""
import json, re, sys

apply = "--apply" in sys.argv
art = json.load(open("BENCHVEC.json"))
vals = dict(art["timings_sec"])
# calibration keys only when present: '%.3f' % None dies (ADVICE r13)
for cal_key in ("calibration", "calibration_disk"):
    if art.get(cal_key) is not None:
        vals[cal_key] = art[cal_key]

txt = open("PERF.md").read()
blocks = list(re.finditer(r"<!-- drift-check:begin([^>]*)-->(.*?)<!-- drift-check:end -->",
                          txt, re.S))
# the BENCHVEC block is the one whose rows mention brute_force_knn_8q
target = next((b for b in blocks if "brute_force_knn_8q" in b.group(2)), None)
if target is None:
    sys.exit("no drift-check block in PERF.md mentions brute_force_knn_8q "
             "— nothing to sync (was the BENCHVEC table renamed?)")
body = target.group(2)
out_lines = []
changed = []
for line in body.split("\n"):
    m = re.match(r"^\| ([a-z0-9_]+) \| ([0-9.]+) \|", line)
    if m and m.group(1) in vals:
        new = "%.3f" % vals[m.group(1)]
        if new != m.group(2):
            changed.append((m.group(1), m.group(2), new))
            line = line.replace(f"| {m.group(1)} | {m.group(2)} |",
                                f"| {m.group(1)} | {new} |", 1)
    out_lines.append(line)
new_body = "\n".join(out_lines)
for name, old, new in changed:
    print(f"{name:46s} {old} -> {new}")
missing = [l for l in body.split("\n")
           if (m := re.match(r"^\| ([a-z0-9_]+) \|", l)) and m.group(1) not in vals]
for l in missing:
    print("NOT IN ARTIFACT:", l.split("|")[1].strip())
extra = [k for k in art["timings_sec"] if f"| {k} |" not in body]
for k in extra:
    print(f"IN ARTIFACT, NOT QUOTED: {k} = {art['timings_sec'][k]}")
if apply:
    open("PERF.md", "w").write(txt[:target.start(2)] + new_body + txt[target.end(2):])
    print(f"applied: {len(changed)} rows updated")

#!/usr/bin/env python3
"""Close-gate check (r11 verdict, What's wrong #1; sharpened per the
r12 verdict + ADVICE): every battery query at or above the warm-time
threshold must have a SCALE.md row — the zero-drift QList discipline
applied to SCALE coverage, so the ">= 1 s needs a slope row" rule is
asserted instead of remembered.

Usage: scale_gate.py [bench.json ...] [SCALE.md] [threshold_sec]
  - Any argument ending in .md is the SCALE file (default SCALE.md).
  - Any argument parsing as a float is the threshold (default 1.0).
  - Every other argument is a bench map (default bench_out.json);
    passing SEVERAL maps gates the UNION of their >= thr queries —
    run it against BOTH the close map and the driver map (r12
    verdict item 3: the driver session runs hotter, so close-only
    gating lets tenancy hide a missing slope row).
Exit 0 = covered; exit 1 lists the missing rows.

A "row" is a line that LEADS with the backticked `q_name` — a table
row (| `q_x` | ...) or a disposition bullet (- `q_x` ...). A query
merely mentioned in another row's prose does NOT satisfy the gate
(r12 ADVICE: the re.findall-over-the-whole-file rule was weaker than
the invariant it claimed to assert).

The same row-shape rule is asserted in-suite by ScaleGateSpec, so
`sbt test` blocks a close whose committed bench map has uncovered
>= 1 s queries.
"""
import json
import os
import re
import sys

bench_paths = []
scale_path = "SCALE.md"
thr = 1.0
thr_seen = False
for a in sys.argv[1:]:
    if a.endswith(".md"):
        scale_path = a
        continue
    # a bare float is the threshold — but only ONE, only finite, and
    # never something that also exists as a file (r13 ADVICE: a
    # mistyped bench path like '2' silently reconfigured the gate)
    if not os.path.exists(a):
        try:
            v = float(a)
        except ValueError:
            pass
        else:
            if v != v or v in (float("inf"), float("-inf")):
                sys.exit(f"non-finite threshold: {a!r}")
            if thr_seen:
                sys.exit("more than one threshold argument supplied")
            thr, thr_seen = v, True
            continue
    bench_paths.append(a)
missing_files = [p for p in bench_paths if not os.path.exists(p)]
if missing_files:
    sys.exit(f"bench map(s) not found: {missing_files}")
if not bench_paths:
    bench_paths = ["bench_out.json"]

ROW = re.compile(r"^\s*(?:\||-)\s*`(q_\w+)`")
rows = set()
for line in open(scale_path):
    m = ROW.match(line)
    if m:
        rows.add(m.group(1))

slow = {}
for bp in bench_paths:
    bench = json.load(open(bp))
    for q, t in bench["queries"].items():
        if t >= thr:
            slow[q] = max(t, slow.get(q, 0.0))

missing = sorted(q for q in slow if q not in rows)
for q in missing:
    print(f"MISSING SCALE row: {q} ({slow[q]:.2f}s warm)")
print(f"== {len(slow) - len(missing)}/{len(slow)} battery queries"
      f" >= {thr}s have SCALE.md rows"
      f" (union of {len(bench_paths)} map(s))")
sys.exit(1 if missing else 0)

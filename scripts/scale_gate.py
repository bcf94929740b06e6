#!/usr/bin/env python3
"""Close-gate check (r11 verdict, What's wrong #1): every battery query
at or above the warm-time threshold must have a SCALE.md row — the
zero-drift QList discipline applied to SCALE coverage, so the "≥1 s
needs a slope row" rule is asserted instead of remembered.

Usage: scale_gate.py [bench_out.json] [SCALE.md] [threshold_sec]
Exit 0 = covered; exit 1 lists the missing rows.

A "row" is any backticked `q_name` mention in SCALE.md (every measured
slope row and disposition names its query that way).
"""
import json
import re
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
scale_path = sys.argv[2] if len(sys.argv) > 2 else "SCALE.md"
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0

bench = json.load(open(bench_path))
rows = set(re.findall(r"`(q_\w+)`", open(scale_path).read()))
slow = {q: t for q, t in bench["queries"].items() if t >= thr}
missing = sorted(q for q in slow if q not in rows)
for q in missing:
    print(f"MISSING SCALE row: {q} ({slow[q]:.2f}s warm)")
print(f"== {len(slow) - len(missing)}/{len(slow)} battery queries"
      f" >= {thr}s have SCALE.md rows")
sys.exit(1 if missing else 0)

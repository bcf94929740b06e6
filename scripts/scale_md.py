#!/usr/bin/env python3
"""Regenerate SCALE.md's measurement table from two ScaleCheck logs
(min-of-2 per cell, same-session runs). Keeps the prose sections intact:
only the block between the table header and the first '## ' after it is
replaced.

Usage: python3 scripts/scale_md.py <run1.log> <run2.log>
"""
import json
import math
import sys


def load(path):
    rows = {}
    for line in open(path):
        i = line.find('{"m"')
        if i >= 0:
            r = json.loads(line[i:])
            rows[r["m"]] = r["queries"]
    return rows


def main(log1, log2):
    a, b = load(log1), load(log2)
    mults = [1, 2, 4, 8]
    names = list(a[1].keys())
    lines = ["| query | t(×1) s | t(×2) s | t(×4) s | t(×8) s | exp |",
             "|---|---|---|---|---|---|"]
    for n in names:
        t = [min(a[m][n], b[m][n]) for m in mults]
        exp = math.log(t[3] / t[1]) / math.log(4)
        lines.append("| `%s` | %.2f | %.2f | %.2f | %.2f | %+.2f |"
                     % (n, *t, exp))
    table = "\n".join(lines)

    src = open("SCALE.md").read()
    start = src.index("| query |")
    end = src.index("## Reading the slopes")
    open("SCALE.md", "w").write(src[:start] + table + "\n\n" + src[end:])
    print("wrote SCALE.md (%d picks)" % len(names))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

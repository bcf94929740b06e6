#!/usr/bin/env python3
"""Update SCALE.md's measurement table from two ScaleCheck logs
(min-of-2 per cell, same-session runs). Keeps the prose sections intact:
only the block between the table header and the first '## ' after it is
touched.

By default MERGES: existing table rows whose query was not re-measured
are kept verbatim (each row is one same-session measurement; rows from
different sessions may not be combined cell-wise, but may coexist as
rows). Re-measured queries are overwritten in place; new queries append.
Pass --replace to drop the old table entirely.

Also carries any `{"m":M,"invariant":...}` lines (e.g. the q_also_bought
pair-count SF-invariant) into an "## Count invariants" section.

Usage: python3 scripts/scale_md.py [--replace] <run1.log> <run2.log>
"""
import json
import math
import re
import sys


def load(path):
    rows, invs = {}, []
    for line in open(path):
        i = line.find('{"m"')
        if i >= 0:
            r = json.loads(line[i:])
            if "invariant" in r:
                invs.append(r)
            else:
                rows[r["m"]] = r["queries"]
    return rows, invs


def main(argv):
    replace = "--replace" in argv
    logs = [a for a in argv if not a.startswith("--")]
    (a, inv_a), (b, _) = load(logs[0]), load(logs[1])
    mults = [1, 2, 4, 8]

    def row(n):
        t = [min(a[m][n], b[m][n]) for m in mults]
        exp = math.log(t[3] / t[1]) / math.log(4)
        return "| `%s` | %.2f | %.2f | %.2f | %.2f | %+.2f |" % (n, *t, exp)

    new = {n: row(n) for n in a[1]}

    src = open("SCALE.md").read()
    start = src.index("| query |")
    end = src.index("## ", start)
    old_lines = src[start:end].rstrip("\n").split("\n")
    # rebuild preserving original row order: re-measured queries are
    # replaced IN PLACE (not dropped-and-appended, which degraded the
    # table ordering across merge runs); only genuinely new queries
    # append at the end
    body, seen = [], set()
    for line in old_lines[2:]:
        m = re.match(r"\| `([^`]+)` \|", line)
        if not m or replace:
            continue
        q = m.group(1)
        seen.add(q)
        body.append(new.get(q, line))
    body.extend(new[n] for n in new if n not in seen)
    kept = [l for l in body if l not in new.values()]
    table = "\n".join(old_lines[:2] + body)

    inv_block = ""
    if inv_a:
        inv_lines = ["## Count invariants (measured, wall-time-free)", "",
                     "| invariant | m | customers | pairs | pairs/cust | max_per_cust | cap |",
                     "|---|---|---|---|---|---|---|"]
        for r in inv_a:
            inv_lines.append("| %s | ×%d | %d | %d | %.2f | %d | %d |" % (
                r["invariant"], r["m"], r["customers"], r["pairs"],
                r["pairs"] / r["customers"], r["max_per_cust"], r["cap_pairs"]))
        inv_block = "\n".join(inv_lines) + "\n\n"
        # drop a stale invariant section before re-inserting
        src2 = src[end:]
        isec = src2.find("## Count invariants")
        if isec >= 0:
            inext = src2.find("## ", isec + 3)
            src2 = src2[:isec] + (src2[inext:] if inext >= 0 else "")
        open("SCALE.md", "w").write(
            src[:start] + table + "\n\n" + inv_block + src2)
    else:
        open("SCALE.md", "w").write(src[:start] + table + "\n\n" + src[end:])
    print("wrote SCALE.md (%d new/updated picks, %d kept, %d invariant rows)"
          % (len(new), len(kept), len(inv_a)))


if __name__ == "__main__":
    main(sys.argv[1:])

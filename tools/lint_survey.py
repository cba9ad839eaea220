#!/usr/bin/env python3
"""SURVEY.md lints.

1. Column-count: every contiguous block of `|`-prefixed lines must
   have a constant unescaped-pipe count (raw `|` inside a cell — e.g.
   p(w3|w1w2) — must be escaped as `\\|` or it silently shifts every
   later column for any table parser).
2. §2 ID uniqueness: capability IDs (C*/R*/L*) must be unique — the
   coverage ledger keys mechanical counting (r14 verdict: L5c/L63/
   L65/L58c each named two operators and silently merged rows).
3. Registered-query coverage: every `"q_*" ->` registered in
   src/main/scala/graft/queries + SparkEntry must be referenced from
   §2 (r14 verdict: q_quantile_profile was green but invisible to the
   ledger).

Exits nonzero listing offenders.

    python3 tools/lint_survey.py [SURVEY.md]
"""
import glob
import os
import re
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "SURVEY.md"
    lines = open(path).read().split("\n")
    in_table = False
    expected = None
    header = ""
    bad = 0
    for i, line in enumerate(lines, 1):
        if line.lstrip().startswith("|"):
            n = len(re.split(r"(?<!\\)\|", line))
            if not in_table:
                in_table, expected, header = True, n, line[:60]
            elif n != expected:
                bad += 1
                print(f"BAD line {i}: {n} segments, table expects {expected}"
                      f" (header: {header!r}): {line[:80]}")
        else:
            in_table = False
    if bad:
        print(f"{bad} inconsistent table rows")
        return 1
    print("all tables column-consistent")

    # --- §2 ID uniqueness + registered-query coverage ---
    text = "\n".join(lines)
    m2 = re.search(r"^## §2\b.*?(?=^## §)", text, re.M | re.S)
    if not m2:
        print("BAD: no §2 section found")
        return 1
    sec2 = m2.group(0)
    ids = re.findall(r"^\| ([CRL]\d+[a-z]*) \|", sec2, re.M)
    dups = sorted({i for i in ids if ids.count(i) > 1})
    if dups:
        print(f"BAD: duplicate §2 capability IDs: {', '.join(dups)}")
        return 1
    print(f"§2 IDs unique ({len(ids)} rows)")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registered = set()
    srcs = glob.glob(os.path.join(
        root, "src/main/scala/graft/queries/*.scala"))
    srcs.append(os.path.join(root, "src/main/scala/graft/SparkEntry.scala"))
    for f in srcs:
        registered |= set(re.findall(r'"(q_\w+)" *->', open(f).read()))
    referenced = set(re.findall(r"\bq_\w+", sec2))
    missing = sorted(registered - referenced)
    if missing:
        print(f"BAD: registered queries unreferenced from §2: "
              f"{', '.join(missing)}")
        return 1
    print(f"all {len(registered)} registered queries referenced from §2")
    return 0


if __name__ == "__main__":
    sys.exit(main())

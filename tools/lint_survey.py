#!/usr/bin/env python3
"""Column-count lint for SURVEY.md tables.

Every contiguous block of `|`-prefixed lines must have a constant
unescaped-pipe count (raw `|` inside a cell — e.g. p(w3|w1w2) — must
be escaped as `\\|` or it silently shifts every later column for any
table parser). Exits nonzero listing offending lines.

    python3 tools/lint_survey.py [SURVEY.md]
"""
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
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Mechanical per-query bench regression gate.

Compares a bench sidecar (bench_queries.json, written by `graft.Bench`
full runs) against the pinned baseline BASELINE_QUERIES.json:

    python3 tools/bench_compare.py [current] [baseline] [--factor 2.0]

Prints one line per regressed query (current >= factor * baseline, and
current >= 0.5 s so sub-second jitter never trips the gate), plus new /
missing queries, and exits nonzero iff a regression is found. Re-pin the
baseline (copy the sidecar over BASELINE_QUERIES.json) only from a
non-contended full run whose regressions have been explained or fixed —
the whole point is that this file does not follow the noise.
"""
import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cur_path = args[0] if len(args) > 0 else "bench_queries.json"
    base_path = args[1] if len(args) > 1 else "BASELINE_QUERIES.json"
    factor = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--factor"):
            factor = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])

    cur = json.load(open(cur_path))
    base = json.load(open(base_path))

    regressed = []
    for q in sorted(cur):
        if q not in base:
            continue
        if cur[q] >= factor * base[q] and cur[q] >= 0.5:
            regressed.append((q, base[q], cur[q]))

    new = sorted(set(cur) - set(base))
    gone = sorted(set(base) - set(cur))

    for q, b, c in regressed:
        print(f"REGRESSED {q}: baseline {b:.2f}s -> current {c:.2f}s ({c / b:.1f}x)")

    # Queries whose reported min came from the third anti-noise sample:
    # if the symmetric 2-run estimator would have regressed, say so —
    # the extra sample must not silently hide a borderline regression.
    try:
        import os
        rpath = os.path.join(os.path.dirname(cur_path) or ".", "bench_retries.json")
        for q, mm in sorted(json.load(open(rpath)).items()):
            if q in base and mm["min2"] >= factor * base[q] and mm["min2"] >= 0.5 \
                    and not any(r[0] == q for r in regressed):
                print(f"RETRY-RESCUED {q}: 2-run min {mm['min2']:.2f}s would regress "
                      f"(baseline {base[q]:.2f}s), 3-run min {mm['min3']:.2f}s passes "
                      f"— adjudicate on a quiet box")
    except FileNotFoundError:
        pass
    if new:
        print(f"NEW (no baseline yet): {', '.join(new)}")
    if gone:
        print(f"MISSING from current run: {', '.join(gone)}")
    n = len(set(cur) & set(base))
    print(f"compared {n} queries vs {base_path}: "
          f"{len(regressed)} regressed (factor {factor}), "
          f"{len(new)} new, {len(gone)} missing")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Second-engine head-to-head: time every DuckDB oracle SQL statement
against the same parquet tables graft benches on, and compare with the
graft bench sidecar.

    # 1. dump the oracle SQL (fast, no query execution):
    sbt 'runMain graft.Verify /root/testdata/sf0.1 /tmp/h2h --sql-only'
    # 2. make sure bench_queries.json is fresh (full graft.Bench run)
    # 3. race DuckDB:
    python3 tools/head_to_head.py /root/testdata/sf0.1 /tmp/h2h/oracle_sql.json

Writes h2h_queries.json ({query: {"duck": s, "graft": s}}) and prints
totals plus the widest per-query ratios both ways. DuckDB runs with
threads=32 (the same CPU budget the graft local[32] session gets).
A per-statement timeout keeps one pathological recursive CTE from
wedging the whole sweep (recorded as timed out at the cap)."""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = None
    for a in sys.argv[1:]:
        # --only=q_a,q_b: time just these statements and MERGE them into
        # the existing h2h_queries.json (the seal path for a round that
        # registers a handful of new queries: refresh the new rows
        # without re-running the 2h+ full sweep).
        if a.startswith("--only="):
            only = set(x for x in a[len("--only="):].split(",") if x)
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    oracle_path = args[1] if len(args) > 1 else "/tmp/h2h/oracle_sql.json"
    bench_path = args[2] if len(args) > 2 else "bench_queries.json"
    cap = float(args[3]) if len(args) > 3 else 1200.0

    oracle = json.loads(Path(oracle_path).read_text())
    try:
        graft = json.load(open(bench_path))
    except FileNotFoundError:
        graft = {}

    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    out = {}
    if only is not None:
        try:
            out = json.load(open("h2h_queries.json"))
        except FileNotFoundError:
            pass
    total = 0.0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            con.execute(f"SET statement_timeout='{int(cap * 1000)}ms'")
        except duckdb.Error:
            pass  # older duckdb: no timeout support, run uncapped
        try:
            con.execute(oracle[name]).fetchall()
            dt = time.time() - t0
            status = "ok"
        except duckdb.Error as e:
            dt = time.time() - t0
            status = "timeout" if "timeout" in str(e).lower() else f"error: {e}"
        total += dt
        out[name] = {"duck": round(dt, 3), "status": status}
        if name in graft:
            out[name]["graft"] = graft[name]
        print(f"[h2h] {name:32s} duck {dt:8.2f} s"
              + (f"   graft {graft[name]:7.2f} s  ({dt / max(graft[name], 1e-9):6.1f}x)"
                 if name in graft else "")
              + ("" if status == "ok" else f"   {status[:120]}"), flush=True)

    json.dump(out, open("h2h_queries.json", "w"), indent=0, sort_keys=True)
    both = {k: v for k, v in out.items() if "graft" in v and v["status"] == "ok"}
    duck_sum = sum(v["duck"] for v in both.values())
    graft_sum = sum(v["graft"] for v in both.values())
    errs = [k for k, v in out.items() if v["status"].startswith("error")]
    tos = [k for k, v in out.items() if v["status"] == "timeout"]
    print(f"\n[h2h] {len(both)} queries timed in BOTH engines at {sf_dir}:")
    print(f"[h2h] DuckDB total {duck_sum:.1f} s  vs  graft total {graft_sum:.1f} s"
          f"  => {duck_sum / max(graft_sum, 1e-9):.1f}x")
    slow = sorted(both.items(), key=lambda kv: -kv[1]["duck"])[:15]
    print("[h2h] 15 slowest on DuckDB:")
    for k, v in slow:
        print(f"[h2h]   {k:32s} duck {v['duck']:8.2f}  graft {v['graft']:7.2f}"
              f"  ({v['duck'] / max(v['graft'], 1e-9):6.1f}x)")
    rev = sorted(both.items(), key=lambda kv: kv[1]["duck"] / max(kv[1]["graft"], 1e-9))[:10]
    print("[h2h] 10 where DuckDB is relatively best:")
    for k, v in rev:
        print(f"[h2h]   {k:32s} duck {v['duck']:8.2f}  graft {v['graft']:7.2f}"
              f"  ({v['duck'] / max(v['graft'], 1e-9):6.2f}x)")
    if tos:
        print(f"[h2h] timed out at {cap:.0f}s cap: {', '.join(tos)}")
    if errs:
        print(f"[h2h] errors: {', '.join(errs)}")


if __name__ == "__main__":
    main()

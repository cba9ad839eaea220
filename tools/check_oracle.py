#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mirroring the driver's
t2 check: run graft.Verify (Spark) into an outDir, then run each
oracle_sql.json entry in DuckDB over the same parquet tables and
compare row-by-row with columns sorted by name.

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--skip-spark]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm(col[i]) for col in data) for i in range(tbl.num_rows)]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    if "--skip-spark" not in sys.argv:
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
            capture_output=True, text=True, cwd="/root/repo",
            env={"PATH": "/usr/local/sbin:/usr/local/bin:/usr/sbin:/usr/bin:/sbin:/bin",
                 "HOME": "/root", "SPARK_GRAFT_CPUS": "8", "COURSIER_MODE": "offline"})
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            sys.exit(1)
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_ok = n_bad = 0
    # rows-only checks for queries without an oracle
    for p in sorted(Path(out_dir).iterdir()):
        if p.is_dir() and p.name not in oracle:
            n = pq.read_table(p).num_rows
            if n > 0:
                print(f"OK   {p.name}: {n} rows (rows-only)")
                n_ok += 1
            else:
                print(f"FAIL {p.name}: 0 rows (rows-only)")
                n_bad += 1
    for name in sorted(oracle):
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        stbl = pq.read_table(spark_path)
        try:
            dtbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        scols, srows = table_rows(stbl)
        dcols, drows = table_rows(dtbl)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} != {dcols}")
            n_bad += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} != {len(drows)}")
            n_bad += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if diffs:
            i, a, b = diffs[0]
            print(f"FAIL {name}: {len(diffs)} row diffs; first @{i}:")
            print(f"  cols : {scols}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(srows)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

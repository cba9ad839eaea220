#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mirroring the driver's
t2 check: run graft.Verify (Spark) into an outDir, then run each
oracle_sql.json entry in DuckDB over the same parquet tables and
compare row-by-row with columns sorted by name.

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--skip-spark]
"""
import decimal, json, math, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    # The driver hashes TYPED values: DuckDB HUGEINT/uncast SUM arrives as
    # Decimal and hash-mismatches a Spark BIGINT even when numerically
    # equal. Tag decimals so the local compare fails the same way the
    # driver does instead of masking the drift via str().
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def type_drift(scols, stbl, dtbl):
    """Columns where one engine produced a decimal and the other an
    int/float — the exact class of oracle-SQL type bug (uncast HUGEINT)
    that the driver's typed hasher flags but stringified compare hides."""
    bad = []
    for c in scols:
        st = stbl.schema.field(c).type
        dt = dtbl.schema.field(c).type
        if pa.types.is_decimal(st) != pa.types.is_decimal(dt):
            bad.append(f"{c}: spark={st} duck={dt}")
    return bad


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm(col[i]) for col in data) for i in range(tbl.num_rows)]


# Planted punctuation/Unicode-rich rows for dialect-sensitive oracles.
# The production documents table is pure [a-z ] text, so those oracles
# are degenerate at pre-validation time (ws == bpe everywhere); these
# rows exercise the branches that diverge between DuckDB versions.
# Rows AND expected tuples are in LOCKSTEP with CurationSpec's
# "cross-engine planted-row pin" test — change both together.
PROBE_ROWS = """(VALUES
  (CAST(1 AS BIGINT), 'hello, world! abc123 x', 'en', 'a', CAST(22 AS BIGINT)),
  (CAST(2 AS BIGINT), 'a1b2c3 ... --- e.g. 42', 'en', 'a', CAST(22 AS BIGINT)),
  (CAST(3 AS BIGINT), '中文 测试 abc, 中a1', 'zh', 'a', CAST(14 AS BIGINT)),
  (CAST(4 AS BIGINT), '', 'de', 'a', CAST(0 AS BIGINT)),
  (CAST(5 AS BIGINT), '  double  spaces  7 ', 'fr', 'a', CAST(20 AS BIGINT)),
  (CAST(6 AS BIGINT), '\U0001F600 ok \U0001F600\U0001F600x', 'es', 'a', CAST(8 AS BIGINT))
) t(doc_id, text, lang, source, n_chars)"""

PROBE_EXPECT = {
    "q_tokenizer_fertility": [
        ("de", 1, 0, 0, 0, 0, 0),
        ("en", 2, 9, 24, 44, 2666666, 1833333),
        ("es", 1, 3, 5, 8, 1666666, 1600000),
        ("fr", 1, 3, 3, 20, 1000000, 6666666),
        ("zh", 1, 4, 9, 14, 2250000, 1555555),
    ],
    # codepoint-indexing probe: row 6's astral-plane emoji reads 8
    # code points (UTF-16 length would say 11) — pins DuckDB's
    # character indexing against the kernel's codePointAt walk
    "q_char_concentration": [
        (1, 22, 17, 74380, 136, False),
        (2, 22, 12, 128099, 227, False),
        (3, 14, 10, 122448, 214, False),
        (4, 0, 0, 0, 0, False),
        (5, 20, 12, 165000, 350, False),
        (6, 8, 5, 250000, 375, False),
    ],
}


def dialect_probe(con, oracle, n_ok, n_bad):
    """Run dialect-sensitive oracle SQL over PROBE_ROWS (not the real
    tables) and compare to hard-coded expected values computed from the
    Spark/Java semantics. Catches DuckDB-version drift locally."""
    for name, expect in PROBE_EXPECT.items():
        if name not in oracle:
            print(f"FAIL probe:{name}: oracle entry missing")
            n_bad += 1
            continue
        # anchored, count-asserted rewrite: a blanket str.replace would
        # silently corrupt oracles that reference `documents` more than
        # once or embed the substring inside another identifier
        import re as _re
        sql, n_sub = _re.subn(r"\bFROM\s+documents\b",
                              f"FROM {PROBE_ROWS}", oracle[name])
        if n_sub != 1:
            print(f"FAIL probe:{name}: expected exactly 1 'FROM documents' "
                  f"reference to rewrite, found {n_sub}")
            n_bad += 1
            continue
        try:
            got = [tuple(r) for r in con.execute(sql).fetchall()]
        except Exception as e:
            print(f"FAIL probe:{name}: duckdb error: {e}")
            n_bad += 1
            continue
        if got != expect:
            print(f"FAIL probe:{name}: planted-row mismatch")
            print(f"  expect: {expect}")
            print(f"  got   : {got}")
            n_bad += 1
        else:
            print(f"OK   probe:{name}: planted rows exact")
            n_ok += 1
    return n_ok, n_bad


def shape_violations(tbl):
    """Columns the DRIVER's comparator cannot sort (pandas sort_values
    on ndarray/dict/bytes cells raises) — the r15 q_embed_whiten red.
    Registered queries must emit flat scalar-sortable columns only;
    vector-valued results go out in long form (id, j, v)."""
    bad = []
    for f in tbl.schema:
        t = f.type
        if (pa.types.is_nested(t) or pa.types.is_binary(t)
                or pa.types.is_large_binary(t)):
            bad.append(f"{f.name}: {t}")
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = None
    for a in sys.argv[3:]:
        if a.startswith("--only="):
            only = set(x for x in a[len("--only="):].split(",") if x)
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
    n_ok, n_bad = dialect_probe(con, oracle, n_ok, n_bad)
    # rows-only checks for queries without an oracle
    for p in sorted(Path(out_dir).iterdir()):
        if p.is_dir() and p.name not in oracle:
            if only is not None and p.name not in only:
                continue
            rt = pq.read_table(p)
            shape = shape_violations(rt)
            if shape:
                print(f"FAIL {p.name}: driver-unsortable output columns: "
                      f"{shape}")
                n_bad += 1
                continue
            n = rt.num_rows
            if n > 0:
                print(f"OK   {p.name}: {n} rows (rows-only)")
                n_ok += 1
            else:
                print(f"FAIL {p.name}: 0 rows (rows-only)")
                n_bad += 1
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        stbl = pq.read_table(spark_path)
        shape = shape_violations(stbl)
        if shape:
            print(f"FAIL {name}: driver-unsortable output columns: {shape}")
            n_bad += 1
            continue
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
        drift = type_drift(scols, stbl, dtbl)
        if drift:
            print(f"FAIL {name}: decimal/non-decimal type drift: {drift}")
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

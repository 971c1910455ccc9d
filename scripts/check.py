#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify at a scale factor, then executes every oracle SQL in
DuckDB against the same parquet tables and compares: row count, sorted
column names, and cell values (floats to ~1e-9 relative).

Usage: scripts/check.py [sfdir] [outdir] [--skip-verify] [names...]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def close(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    return a == b


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])
    if "--skip-verify" not in sys.argv:
        subprocess.run([str(REPO / "scripts/run.sh"), "graft.Verify",
                        sfdir, outdir], check=True)

    oracle = json.loads(Path(outdir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = Path(outdir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        try:
            duck_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        scols, dcols = list(spark_rel.columns), list(duck_rel.columns)
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(dcols)}")
            failures += 1
            continue
        # driver sorts columns by name before hashing values
        s_rows = spark_rel.select(*[f'"{c}"' for c in sorted(scols)]).fetchall()
        d_rows = duck_rel.select(*[f'"{c}"' for c in sorted(dcols)]).fetchall()
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows {len(s_rows)} != {len(d_rows)}")
            failures += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows))
               if not close(list(a), list(b))]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first @{i}:")
            print(f"  spark: {a}\n  duck:  {b}")
            failures += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

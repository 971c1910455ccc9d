#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify at a scale factor, then executes every oracle SQL in
DuckDB against the same parquet tables and compares the way the driver
does: load both results into pandas, sort columns by name, lexsort rows
(array-typed cells make this raise, exactly like the driver), then
require identical dtypes and exactly-equal cell values (NaN == NaN).
No float tolerance: the dsum/oSum decimal discipline makes aggregates
bit-identical, and a tolerant local gate is how round-1 shipped two
driver failures that passed locally.

Usage: scripts/check.py [sfdir] [outdir] [--skip-verify] [names...]
"""
import json, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(name, s_df, d_df):
    """Driver-style compare. Returns None if equal, else a message."""
    scols, dcols = sorted(s_df.columns), sorted(d_df.columns)
    if scols != dcols:
        return f"columns {scols} != {dcols}"
    s_df, d_df = s_df[scols], d_df[dcols]
    if len(s_df) != len(d_df):
        return f"rows {len(s_df)} != {len(d_df)}"
    try:
        s_df = s_df.sort_values(scols).reset_index(drop=True)
        d_df = d_df.sort_values(dcols).reset_index(drop=True)
    except TypeError as e:
        return f"unsortable (array-typed column?): {e}"
    for c in scols:
        if str(s_df[c].dtype) != str(d_df[c].dtype):
            return (f"dtype mismatch on {c}: spark={s_df[c].dtype} "
                    f"duck={d_df[c].dtype}")
    eq = (s_df == d_df) | (s_df.isna() & d_df.isna())
    if not eq.all().all():
        bad = (~eq).any(axis=1)
        i = bad[bad].index[0]
        return (f"value mismatch, first @{i}:\n  spark: {list(s_df.loc[i])}"
                f"\n  duck:  {list(d_df.loc[i])}")
    return None


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
    for t in TABLES:
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
        try:
            s_df = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            d_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        msg = compare(name, s_df, d_df)
        if msg:
            print(f"FAIL {name}: {msg}")
            failures += 1
        else:
            print(f"PASS {name} ({len(s_df)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

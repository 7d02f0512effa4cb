#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare (columns sorted by name, rows as written; exact value equality).

Usage: python3 scripts/localverify.py [sfDir] [outDir] [--skip-spark]
"""
import glob
import json
import os
import subprocess
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
SKIP_SPARK = "--skip-spark" in sys.argv

if not SKIP_SPARK:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT_DIR}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.stdout.write(r.stderr[-4000:])
        sys.exit("sbt verify failed")

con = duckdb.connect()
for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(
        f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(OUT_DIR, "oracle_sql.json")))
fails = []
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(OUT_DIR, name)
    if not os.path.isdir(spark_path):
        fails.append(name)
        print(f"FAIL {name}: no spark output")
        continue
    try:
        want = con.execute(sql).df()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: oracle sql error: {e}")
        continue
    got = pd.read_parquet(spark_path)
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)]
    ok = True
    if list(want.columns) != list(got.columns):
        ok = False
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
    elif len(want) != len(got):
        ok = False
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
    else:
        for c in want.columns:
            a, b = got[c], want[c]
            try:
                same = (a.isna() == b.isna()).all() and \
                    (a.fillna(0).astype(str).values == b.fillna(0).astype(str).values).all()
            except Exception:
                same = list(map(str, a.values)) == list(map(str, b.values))
            if not same:
                ok = False
                bad = [(i, a.iloc[i], b.iloc[i]) for i in range(len(a))
                       if str(a.iloc[i]) != str(b.iloc[i])][:5]
                print(f"FAIL {name}: col {c} differs, e.g. {bad}")
                break
    if ok:
        print(f"ok   {name}: {len(got)} rows")
    else:
        fails.append(name)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)

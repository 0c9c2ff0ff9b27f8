#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir under outDir, loads the Spark parquet result and runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet, then compares row count, column names/dtypes, and values
(column-name-sorted, row-sorted).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(qdir)
            want = con.sql(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                ok = ((a.isna() & b.isna()) | (abs(a.astype(float) - b.astype(float)) < 1e-9)).all()
            else:
                ok = (a.astype(str) == b.astype(str)).all()
            if not ok:
                mismatch = c
                break
        if mismatch:
            print(f"FAIL {name}: value mismatch in column {mismatch}")
            bad = g[mismatch].astype(str) != w[mismatch].astype(str)
            print("  spark:", g[bad].head(3).to_dict("records"))
            print("  duck :", w[bad].head(3).to_dict("records"))
            n_fail += 1
        else:
            # dtype drift is a warning: the driver may hash types strictly
            dt = [(c, str(got.reindex(sorted(got.columns), axis=1)[c].dtype),
                   str(want.reindex(sorted(want.columns), axis=1)[c].dtype))
                  for c in sorted(got.columns)
                  if str(got[c].dtype) != str(want[c].dtype)]
            note = f"  [dtype drift: {dt}]" if dt else ""
            print(f"PASS {name} ({len(g)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

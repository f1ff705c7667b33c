#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle against the parquet tables in <sfDir>, loads the corresponding Spark
result parquet, sorts columns by name, and compares values exactly.
Dev-only; the real gate is driver-side.
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(con.execute(sql).fetchdf())
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output")
                failures += 1
                continue
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                failures += 1
                continue
            if got.shape != want.shape:
                print(f"FAIL {name}: shape {got.shape} != {want.shape}")
                failures += 1
                continue
            # exact value compare, row order significant (both sides ORDER BY)
            neq = (got.fillna("\0NULL") != want.fillna("\0NULL"))
            if neq.any().any():
                bad_cols = [c for c in got.columns if neq[c].any()]
                idx = neq.any(axis=1).idxmax()
                print(f"FAIL {name}: value mismatch cols={bad_cols} first_row={idx}")
                print("  got :", got.loc[idx].to_dict())
                print("  want:", want.loc[idx].to_dict())
                failures += 1
                continue
            print(f"OK   {name} ({got.shape[0]} rows x {got.shape[1]} cols)")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Oracle type lint: every oracle's DuckDB result schema must be free of
HUGEINT/UHUGEINT.

Why: the driver's correctness hash is type-sensitive, but the local value
compare (pandas fetchdf) erases types — an uncast `SUM(int)` (HUGEINT in
DuckDB) against Spark's BIGINT hashed red three rounds running (q11, q12,
dup_rate_by_source) while every local gate stayed green. This lint closes
the class: it DESCRIBEs each oracle (no row execution) and fails on any
128-bit integer column, which can never match a Spark parquet type.

Usage:
  java -cp <jar>:/opt/spark/jars/* graft.DumpOracles /tmp/oracle_all.json
  python3 scripts/lint_oracle_types.py <sfDir> /tmp/oracle_all.json
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED = {"HUGEINT", "UHUGEINT"}


def main(sf_dir: str, oracle_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(oracle_json) as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)  # lazy relation: types without execution
            bad = [(c, str(ty)) for c, ty in zip(rel.columns, rel.types)
                   if any(b in str(ty).upper() for b in BANNED)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle does not plan: "
                  f"{type(e).__name__}: {e}")
            failures += 1
            continue
        if bad:
            print(f"FAIL {name}: 128-bit integer columns {bad} — "
                  f"wrap in CAST(... AS BIGINT)")
            failures += 1
    print(f"{len(oracles) - failures}/{len(oracles)} oracles type-clean")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

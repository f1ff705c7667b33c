#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a per-query {"name": "pass"|"fail: reason"}
artifact (the committed CORRECTNESS_sf1.json scale gate).

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle against the parquet tables in <sfDir>, loads the corresponding Spark
result parquet, sorts columns by name, and compares values exactly.
Dev-only; the real gate is driver-side.
"""
import json
import sys
import glob
import os
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def canon_types(rel) -> list:
    """Name-sorted (column, normalized DuckDB type) pairs for a relation.

    The driver's hash is type-sensitive exactly where pandas dtype mapping
    is: every DuckDB integer width up to 64 bits lands in an int64-family
    dtype and hashes identically (driver-verified green for INT-vs-BIGINT
    pairs like Spark row_number() INT vs DuckDB's BIGINT across rounds
    1-9), but HUGEINT becomes object/float and hashed red three rounds
    running (q11/q12/dup_rate_by_source) while the local value compare
    stayed green. So: collapse <=64-bit integer widths to one class, keep
    HUGEINT/UHUGEINT distinct (the class this check exists to catch), and
    treat Spark parquet's TIMESTAMP WITH TIME ZONE (isAdjustedToUTC) as
    the oracles' TIMESTAMP — both UTC micros on disk.
    """
    out = []
    for c, ty in zip(rel.columns, rel.types):
        s = str(ty).upper()
        if s == "TIMESTAMP WITH TIME ZONE":
            s = "TIMESTAMP"
        if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER"):
            s = "INT64CLASS"
        out.append((c, s))
    return sorted(out)


def make_con(sf_dir: str):
    con = duckdb.connect()
    # deliberately OVERSUBSCRIBED: most oracles are tiny, wall time is
    # set by the few heavy ones (10x dedup self-joins, corpus windows),
    # and a heavy query that lands on a worker must still get real
    # parallelism — measured: threads=16//workers starved the tail and
    # made the 10x gate SLOWER than serial (31 min vs ~20)
    con.execute("PRAGMA threads=16")
    for t in TABLES:
        # testdata tables are single files; Spark-written ones (tmp_sf1)
        # are directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    # Spark-written events (GenBig) carry ts as BIGINT nanos (Spark can't
    # write TIMESTAMP(NANOS)); normalize to the micros TIMESTAMP the
    # oracles expect, with the same truncating division Tables.events uses
    if con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0] == "BIGINT":
        con.execute("DROP VIEW events")
        path = f"{sf_dir}/events.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            "CREATE VIEW events AS SELECT * REPLACE "
            f"(make_timestamp(ts // 1000) AS ts) FROM '{path}'")
    return con


def main(sf_dir: str, out_dir: str, json_out: str = None,
         only: set = None) -> int:
    import threading
    from concurrent.futures import ThreadPoolExecutor
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    # Parallel across queries (round-11 gate-wall-time work): duckdb
    # releases the GIL during execution, so a small thread pool with one
    # connection per thread cuts the 100+-query gate wall time without
    # changing any per-query semantics. ORACLE_WORKERS=1 restores the
    # strictly serial behavior.
    workers = max(1, int(os.environ.get("ORACLE_WORKERS", "4")))
    workers = min(workers, max(1, len(oracles)))
    tls = threading.local()

    def check_one(name: str, sql: str):
        # timing wrapper: the per-query oracle seconds go into the JSON
        # artifact ("secs") so gate-wall-time dominators are measured
        # facts, not estimates (round-13 oracle-budget work)
        t0 = time.monotonic()
        name_, st, line = check_one_inner(name, sql)
        secs = round(time.monotonic() - t0, 2)
        return name_, st, f"{line}  [{secs}s]", secs

    def check_one_inner(name: str, sql: str):
        # connection setup lives INSIDE the try: a transient parquet/glob
        # failure must record one per-query FAIL, not crash the whole
        # gate out of pool.map with a traceback
        try:
            con = getattr(tls, "con", None)
            if con is None:
                con = make_con(sf_dir)
                tls.con = con
            want_rel = con.sql(sql)
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                return name, "fail: no spark output", "FAIL {0}: no spark output".format(name)
            got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            # type compare FIRST: the driver hash is type-sensitive and the
            # pandas value compare below is not (the HUGEINT slip class)
            tw, tg = canon_types(want_rel), canon_types(got_rel)
            if [c for c, _ in tw] == [c for c, _ in tg] and tw != tg:
                diff = [(a, b) for a, b in zip(tg, tw) if a != b]
                return name, f"fail: type mismatch {diff}", \
                    f"FAIL {name}: type mismatch spark-vs-oracle {diff}"
            want = canon(want_rel.fetchdf())
            got = canon(got_rel.fetchdf())
            if list(got.columns) != list(want.columns):
                return name, "fail: column mismatch", \
                    f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}"
            if got.shape != want.shape:
                return name, f"fail: shape {got.shape} != {want.shape}", \
                    f"FAIL {name}: shape {got.shape} != {want.shape}"
            # exact value compare, row order significant (both sides ORDER BY)
            neq = (got.fillna("\0NULL") != want.fillna("\0NULL"))
            if neq.any().any():
                bad_cols = [c for c in got.columns if neq[c].any()]
                idx = neq.any(axis=1).idxmax()
                return name, f"fail: value mismatch cols={bad_cols}", \
                    (f"FAIL {name}: value mismatch cols={bad_cols} first_row={idx}\n"
                     f"  got : {got.loc[idx].to_dict()}\n"
                     f"  want: {want.loc[idx].to_dict()}")
            return name, f"pass ({got.shape[0]} rows)", \
                f"OK   {name} ({got.shape[0]} rows x {got.shape[1]} cols)"
        except Exception as e:  # noqa: BLE001
            return name, f"fail: {type(e).__name__}", \
                f"FAIL {name}: {type(e).__name__}: {e}"

    # longest-first packing: spark output size is a cheap cost proxy
    # (exact for the window/row-heavy oracles; harmless elsewhere) — with
    # alphabetical order a heavy oracle landing last serializes the tail
    def out_bytes(name: str) -> int:
        return sum(os.path.getsize(f)
                   for f in glob.glob(f"{out_dir}/{name}/*.parquet"))
    items = sorted(oracles.items(), key=lambda kv: -out_bytes(kv[0]))
    if workers == 1:
        results = [check_one(n, q) for n, q in items]
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(lambda kv: check_one(*kv), items))
    status = {}
    secs = {}
    failures = 0
    for name, st, line, s in sorted(results):
        print(line)
        status[name] = st
        secs[name] = s
        if not st.startswith("pass"):
            failures += 1
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    top = sorted(secs.items(), key=lambda kv: -kv[1])[:10]
    print("slowest oracles: " +
          ", ".join(f"{n}={s:.0f}s" for n, s in top))
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n": len(oracles),
                       "n_pass": len(oracles) - failures,
                       "queries": status, "oracle_secs": secs},
                      f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    # argv: sfDir outDir [jsonOut] [--only=a,b,c]
    args = [a for a in sys.argv[1:] if not a.startswith("--only=")]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    sys.exit(main(args[0], args[1],
                  args[2] if len(args) > 2 else None, only))

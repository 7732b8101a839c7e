#!/usr/bin/env python3
"""Time every oracle's DuckDB cost at a given SF — the gate-budget
check behind the round-7 oracle-cost fixes (a slow ORACLE, not a slow
engine, is what emptied CORRECTNESS_r06.json).

Usage: python3 tools/time_oracles.py <sfDir> <oracle_sql.json> [skip,list]

Prints one "<name>\t<seconds>" line per oracle (sorted input order)
plus a TOTAL line; keep TOTAL well under the driver's compare budget
(~3 min). MATERIALIZED shared CTEs are the usual fix for outliers —
DuckDB re-inlines a CTE once per reference, so an iterative/self-join
oracle re-derives its corpus pipeline per round without them.
"""
import sys, json, time

import duckdb

SKIP = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
sf_dir, oracle_file = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
oracles = json.load(open(oracle_file))
total = 0.0
for name, sql in sorted(oracles.items()):
    if name in SKIP:
        continue
    t0 = time.time()
    try:
        con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}\tERROR\t{e}", flush=True)
        continue
    dt = time.time() - t0
    total += dt
    print(f"{name}\t{dt:.2f}", flush=True)
print(f"TOTAL\t{total:.1f}", flush=True)

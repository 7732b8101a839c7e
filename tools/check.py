#!/usr/bin/env python3
"""Dev-side oracle checker mimicking the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: run the oracle SQL in DuckDB
(views over the sfDir parquet tables), read the Spark parquet result,
sort columns by name, sort rows, and compare values + dtypes.
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        key = [c for c in df.columns]
        try:
            df = df.sort_values(by=key, kind="mergesort", ignore_index=True)
        except Exception:
            df = df.sort_values(by=key, kind="mergesort", ignore_index=True,
                                key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if hasattr(a, "__len__") and not isinstance(a, str) or \
       hasattr(b, "__len__") and not isinstance(b, str):
        try:
            la, lb = list(a), list(b)
        except TypeError:
            return False
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b or str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            if len(got) == 0:
                print(f"    WARN: zero rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {name}: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            n_fail += 1
            print(f"  [FAIL-cols] {name}: spark={list(g.columns)} duck={list(e.columns)}")
            continue
        if len(g) != len(e):
            n_fail += 1
            print(f"  [FAIL-rows] {name}: spark={len(g)} duck={len(e)}")
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not cell_eq(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            n_fail += 1
            c, i, x, y = bad
            print(f"  [FAIL-val ] {name}: col={c} row={i} spark={x!r} duck={y!r}")
            # dtype hint
            print(f"              dtypes spark={g[c].dtype} duck={e[c].dtype}")
        else:
            n_pass += 1
            print(f"  [PASS     ] {name}: {len(g)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-side oracle checker, driver-strict.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: run the oracle SQL in DuckDB
(views over the sfDir parquet tables), read the Spark parquet result,
sort columns by name, sort rows, and compare values + dtypes.

Strictness contract (mirrors the driver's hash gate, which this file
previously under-approximated — `26 == 26.0` and `-0.0 == 0.0` both
passed here while the driver hashed them differently):
  * per-column pandas dtype must match exactly (int64 vs float64,
    int32 vs int64 are FAILS even when every value compares equal);
  * floats compare by IEEE-754 bit pattern (struct.pack('<d', x)),
    so -0.0 != +0.0; the single carve-out is NaN vs NaN = equal
    (payload-insensitive, matching the driver's NaN canonicalization);
  * everything else compares by == with no str() fallback.
"""
import sys, json, glob, math, struct

import duckdb
import pandas as pd
import numpy as np

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


def norm_dtype(dt) -> str:
    """Collapse representation-only differences that the driver's
    parquet round-trip also collapses: string storage flavors and
    timestamp resolution. Numeric widths are NOT collapsed."""
    s = str(dt)
    if s in ("object", "string", "large_string", "string[python]",
             "string[pyarrow]"):
        return "str"
    if s.startswith("datetime64"):
        return "datetime64"
    return s


def float_eq(a: float, b: float) -> bool:
    if math.isnan(a) and math.isnan(b):
        return True
    return struct.pack("<d", a) == struct.pack("<d", b)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, (float, np.floating)) or \
       isinstance(b, (float, np.floating)):
        fa = isinstance(a, (float, np.floating))
        fb = isinstance(b, (float, np.floating))
        if fa and fb:
            return float_eq(float(a), float(b))
        # one float, one non-float (int/str/None): mixed NaN-null cases
        # fall through to the pd.isna check; otherwise strict fail
        if not ((fa and math.isnan(a)) or (fb and math.isnan(b))):
            return False
    if (hasattr(a, "__len__") and not isinstance(a, str)) or \
       (hasattr(b, "__len__") and not isinstance(b, str)):
        try:
            la, lb = list(a), list(b)
        except TypeError:
            return False
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


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
        dbad = [(c, g[c].dtype, e[c].dtype) for c in g.columns
                if norm_dtype(g[c].dtype) != norm_dtype(e[c].dtype)]
        if dbad:
            n_fail += 1
            c, gd, ed = dbad[0]
            print(f"  [FAIL-dtyp] {name}: col={c} spark={gd} duck={ed}")
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
            print(f"              dtypes spark={g[c].dtype} duck={e[c].dtype}")
        else:
            n_pass += 1
            print(f"  [PASS     ] {name}: {len(g)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

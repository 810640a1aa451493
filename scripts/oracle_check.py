#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
           [--only p1,p2,...] [--json out.json] [--mark-err name=reason ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, and compares: schema (sorted column names), row count, and values
(columns sorted by name, rows sorted by all columns).

--only limits to queries matching any comma-separated name prefix.
--json additionally writes a machine-readable per-query result file
  (the committed CORRECTNESS_x10.json artifact shape).
--mark-err records the named query as an honest "err" row with the given
  reason WITHOUT running its oracle — for oracles documented DuckDB-
  intractable at the target scale (the q97 x10 spill boundary).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # normalize nullable ints / object ints to float for NaN-safe compare
        if str(df[c].dtype) in ("Int64", "Int32", "Int16", "int16", "int32"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) in ("int64",):
            df[c] = df[c].astype("int64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def oracle_type_lint(con, name: str, sql: str) -> list[str]:
    """Driver-parity guard: DuckDB promotes sum(BIGINT) (plain or windowed)
    to HUGEINT; pandas materializes HUGEINT as float64, so the driver's
    TYPED hash red-flags the query even when every value is equal (this
    exact failure hit q125/q126/q127/q131 in round 8). Fail loudly on any
    oracle output column typed HUGEINT/UHUGEINT so it can never land."""
    errs = []
    try:
        rel = con.sql(sql)
        for col_name, col_type in zip(rel.columns, rel.types):
            t = str(col_type).upper()
            if "HUGEINT" in t:
                errs.append(f"oracle col {col_name} is {t} — add CAST(... AS "
                            f"BIGINT) in the oracle SQL (driver hash is typed)")
    except Exception as e:
        errs.append(f"type lint could not run: {e}")
    return errs


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        return errs
    if len(got) != len(want):
        errs.append(f"row count differs: spark={len(got)} oracle={len(want)}")
        return errs
    # Driver-parity dtype gate BEFORE any normalization: the driver's hash is
    # typed, so a Spark-vs-oracle pandas dtype divergence fails the driver
    # even when values match. Datetimes are unified to [us] first (parquet
    # writes us, fetchdf may give ns — value-identical, driver-safe).
    for c in sorted(got.columns):
        gd, wd = str(got[c].dtype), str(want[c].dtype)
        if gd.startswith("datetime64") and wd.startswith("datetime64"):
            continue
        if gd != wd:
            errs.append(f"dtype mismatch col {c}: spark={gd} oracle={wd} "
                        f"(driver's typed hash would fail this)")
    if errs:
        return errs
    g, w = norm(got), norm(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if str(gv.dtype) == "float64" or str(wv.dtype) == "float64":
            gv = gv.astype("float64")
            wv = wv.astype("float64")
            both_nan = gv.isna() & wv.isna()
            neq = ~both_nan & (gv != wv)
            if neq.any():
                i = neq.idxmax()
                errs.append(f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                            f"spark={gv[i]!r} oracle={wv[i]!r} (diff={gv[i]-wv[i]!r})")
        else:
            gv2, wv2 = gv.astype(str), wv.astype(str)
            neq = gv2 != wv2
            if neq.any():
                i = neq.idxmax()
                errs.append(f"col {c} ({gv.dtype} vs {wv.dtype}): {int(neq.sum())} mismatches, "
                            f"first at row {i}: spark={gv[i]!r} oracle={wv[i]!r}")
    return errs


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    only, json_path, mark_err = None, None, {}
    i = 0
    while i < len(rest):
        if rest[i] == "--only":
            only = rest[i + 1].split(","); i += 2
        elif rest[i] == "--json":
            json_path = rest[i + 1]; i += 2
        elif rest[i] == "--mark-err":
            k, _, v = rest[i + 1].partition("="); mark_err[k] = v; i += 2
        else:
            raise SystemExit(f"unknown arg {rest[i]}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in only)}
    results = {}
    n_pass = n_fail = n_err = 0
    for name, sql in sorted(oracle.items()):
        if name in mark_err:
            n_err += 1
            print(f"ERR  {name}: {mark_err[name]}")
            results[name] = {"status": "err", "reason": mark_err[name]}
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            results[name] = {"status": "fail",
                             "errors": [f"no spark output ({e})"]}
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            results[name] = {"status": "fail",
                             "errors": [f"oracle SQL error: {e}"]}
            continue
        errs = oracle_type_lint(con, name, sql) + compare(name, got, want)
        if errs:
            n_fail += 1
            print(f"FAIL {name}:")
            for e in errs[:4]:
                print(f"  - {e}")
            results[name] = {"status": "fail", "errors": errs[:8]}
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
            results[name] = {"status": "pass", "rows": int(len(got))}
    print(f"\n{n_pass} passed, {n_fail} failed" +
          (f", {n_err} documented-err" if n_err else ""))
    if json_path:
        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "n_pass": n_pass, "n_fail": n_fail, "n_err": n_err,
                       "queries": results}, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Oracle output-type lint (driver-hash parity guard), standalone.

Usage: python3 scripts/oracle_type_lint.py <sfDir> <oracle_sql.json>

DuckDB promotes sum(BIGINT) — plain or windowed — to HUGEINT, which pandas
materializes as float64 while Spark's matching column stays int64; the
driver's TYPED hash then red-flags the query even though every value is
equal (round-8 reds q125/q126/q127/q131 were exactly this). This lint
plans every oracle (no execution of the full query needed beyond DuckDB's
binder) and fails if ANY output column is HUGEINT/UHUGEINT.

Regenerate oracle_sql.json quickly with:
  sbt "runMain graft.Verify <sfDir> <outDir> --oracles-only"
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_json) as f:
        oracle = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t).upper()]
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
            continue
        if bad:
            n_bad += 1
            for c, t in bad:
                print(f"FAIL {name}: col {c} is {t} — CAST(... AS BIGINT)")
        else:
            print(f"ok   {name}")
    print(f"\n{len(oracle) - n_bad} clean, {n_bad} flagged")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())

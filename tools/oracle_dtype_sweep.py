#!/usr/bin/env python3
"""Registry-wide oracle-SQL output-dtype sweep (r14 VERDICT Next #2b).

Usage: python3 tools/oracle_dtype_sweep.py <oracle_sql.json> <sf_dir>

Runs ``DESCRIBE (<sql>)`` in DuckDB for EVERY oracle query and fails
on surprise output types:

- HUGEINT / UHUGEINT — always fatal. DuckDB types ``SUM(BIGINT)`` as
  HUGEINT; its Python client materializes HUGEINT as float64, and the
  driver's render-then-hash protocol then flips on ``...109.0`` vs
  Spark's int64 ``...109`` while rows/schema stay green (the proven
  o15 root cause; the r14 judge's sweep found exactly the two red
  rows this way). The fix is always a ``CAST(... AS BIGINT)`` in the
  oracle SQL.
- DECIMAL — warning. DuckDB DECIMAL maps to float64 in pandas, which
  is only safe when the Spark side is also floating; flagged so a
  reviewer confirms the Spark column is a double, not a long.

This sweep costs seconds (DESCRIBE plans, it does not execute) and is
part of the standing pre-commit verify routine alongside
check_correctness.py.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

FATAL = ("HUGEINT", "UHUGEINT")


def main(sql_json: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(sql_json))
    n_fatal = n_warn = 0
    for name in sorted(sqls):
        try:
            desc = con.execute(f"DESCRIBE ({sqls[name]})").fetchall()
        except Exception as e:
            print(f"{name:28s} DESCRIBE-ERROR {e}")
            n_fatal += 1
            continue
        for col, typ, *_ in desc:
            t = typ.upper()
            if any(f in t for f in FATAL):
                print(f"{name:28s} FATAL  {col}: {typ} (driver-hash flip risk)")
                n_fatal += 1
            elif "DECIMAL" in t:
                print(f"{name:28s} WARN   {col}: {typ} (float64 in pandas — "
                      f"confirm the Spark column is floating)")
                n_warn += 1
    print(f"\n{len(sqls)} queries swept: {n_fatal} fatal, {n_warn} warnings")
    return 1 if n_fatal else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))

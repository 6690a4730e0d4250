#!/usr/bin/env python3
"""Emit the driver-style per-query correctness JSON for a Verify dump.

Usage: python3 tools/correctness_json.py <verify_out_dir> <sf_dir> <sf_label> <out_json>

Same comparison as check_correctness.py (sorted-column/sorted-row exact
equality against the DuckDB oracle) but writes one JSON object per
query in the CORRECTNESS_sf01_spot.json shape, so a full-SF sweep can
be committed as an artifact.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(out_dir: str, sf_dir: str, sf_label: str, out_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    have = sorted(
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json"))
    results = {}
    n_fail = 0
    for name in sorted(set(sqls) | set(have)):
        rec = {"err": None, "hash_match": False, "oracle_rows": None,
               "rows_match": False, "schema_match": False,
               "sf": float(sf_label), "spark_rows": None}
        try:
            if name not in have:
                raise RuntimeError("missing output (query crashed?)")
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            rec["spark_rows"] = int(len(got))
            if name not in sqls:  # rows-only query
                rec["schema_match"] = rec["rows_match"] = rec["hash_match"] = len(got) > 0
                rec["err"] = None if len(got) > 0 else "rows-only query returned 0 rows"
            else:
                want = canon(con.execute(sqls[name]).df())
                rec["oracle_rows"] = int(len(want))
                rec["schema_match"] = list(got.columns) == list(want.columns)
                rec["rows_match"] = len(got) == len(want)
                if rec["schema_match"] and rec["rows_match"]:
                    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
                    rec["hash_match"] = True
        except Exception as e:
            rec["err"] = str(e).split("\n")[0][:300]
        if not (rec["schema_match"] and rec["rows_match"] and rec["hash_match"]):
            n_fail += 1
            print(f"{name:28s} FAIL {rec['err']}")
        results[name] = rec
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"{len(results) - n_fail} pass, {n_fail} fail -> {out_json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]))

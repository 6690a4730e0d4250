#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <out>/oracle_sql.json in DuckDB against the sf_dir
parquet tables, and compares: column names (sorted), row counts, and a
hash over the value matrix with columns sorted by name and rows sorted
by all columns. Exact equality for non-floats; floats compared both
exactly and with rel-tol report so we can see how close we are.
"""
import argparse
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class for the oracle-vs-Spark guard.

    The driver's render-then-hash protocol distinguishes int64 from
    float64 (``737150109`` vs ``737150109.0``), so an oracle column
    that DuckDB types HUGEINT (mapped to float64 by its Python
    client) against a Spark BIGINT column flips the driver gate even
    though this checker's normalized compare is value-identical — the
    exact blindness that hid the o15 bug for three rounds (r14
    VERDICT Next #2a). Guard on the int/float CLASS, not the width:
    int32 vs int64 render identically, int vs float does not.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(out_dir: str, sf_dir: str, subset: bool = False) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    have = sorted(
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json"))
    # a crashed query writes no dir — that is a FAIL, not a silent skip
    # (pass --subset for a partial dump: only dumped queries are checked,
    # since the oracle map is always complete after the Verify fix)
    names = set(have) if subset else (set(sqls) | set(have))
    for name in sorted(names):
        if name not in have:
            print(f"{name:28s} FAIL missing output (query crashed?)")
            n_fail += 1
            continue
        if name not in sqls:
            got = pd.read_parquet(f"{out_dir}/{name}")
            if len(got) > 0:
                print(f"{name:28s} ROWS-ONLY rows={len(got)} PASS")
            else:
                print(f"{name:28s} ROWS-ONLY EMPTY — FAIL")
                n_fail += 1
            continue
        try:
            got_raw = pd.read_parquet(f"{out_dir}/{name}")
            want_raw = con.execute(sqls[name]).df()
            got = canon(got_raw)
            want = canon(want_raw)
        except Exception as e:
            print(f"{name:28s} ERROR {e}")
            n_fail += 1
            continue
        # pre-normalization dtype-CLASS guard (r14 VERDICT Next #2a):
        # the driver hashes rendered values, so int-vs-float is a
        # driver-visible divergence this checker's normalized compare
        # would otherwise silently absorb.
        dtype_bad = [
            c for c in sorted(set(got_raw.columns) & set(want_raw.columns))
            if dtype_class(got_raw[c]) != dtype_class(want_raw[c])]
        if dtype_bad:
            det = ", ".join(
                f"{c}: spark={got_raw[c].dtype} oracle={want_raw[c].dtype}"
                for c in dtype_bad)
            print(f"{name:28s} FAIL dtype-class mismatch ({det})")
            n_fail += 1
            continue
        ok_cols = list(got.columns) == list(want.columns)
        ok_rows = len(got) == len(want)
        ok_vals = False
        if ok_cols and ok_rows:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                # measure float distance for diagnostics
                try:
                    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-9)
                    detail = "(equal at rtol=1e-9 but NOT exact)"
                except AssertionError:
                    detail = str(e).split("\n")[0]
                print(f"{name:28s} FAIL values {detail}")
                n_fail += 1
                continue
        if ok_cols and ok_rows and ok_vals:
            print(f"{name:28s} PASS rows={len(got)}")
            n_pass += 1
        else:
            print(f"{name:28s} FAIL cols_ok={ok_cols} got_cols={list(got.columns)} "
                  f"want_cols={list(want.columns)} rows {len(got)} vs {len(want)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # argparse (not positional sys.argv peeking): passing --subset
    # before the positionals must not shift which args are read as
    # out_dir/sf_dir, and a typo'd flag must be an error, not a
    # silent gate-semantics change
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir", help="graft.Verify output dir")
    ap.add_argument("sf_dir", help="parquet tables dir (e.g. /root/testdata/sf0.01)")
    ap.add_argument("--subset", action="store_true",
                    help="partial dump: check only the dumped queries; "
                         "missing outputs are not failures")
    a = ap.parse_args()
    sys.exit(main(a.out_dir, a.sf_dir, a.subset))

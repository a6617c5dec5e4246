#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dir in
the Verify output, run the matching oracle SQL in DuckDB over the same
parquet tables, sort columns by name + rows by value, and compare.

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, math, os, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def cell(v):
    from decimal import Decimal
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, Decimal):
        return repr(float(v))  # outputs should not contain decimals; coerce
    if isinstance(v, float):
        return repr(v)  # exact: any ULP difference is a failure
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def frame_repr(df: pd.DataFrame):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        spark_df = pd.concat(
            [pd.read_parquet(f"{out_dir}/{name}/{f}")
             for f in os.listdir(f"{out_dir}/{name}") if f.endswith(".parquet")],
            ignore_index=True)
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only) rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"  ✗ {name}: SCHEMA spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"  ✗ {name}: ROWS spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        rs, rd = frame_repr(s), frame_repr(d)
        if rs != rd:
            bad = next(i for i, (a, b) in enumerate(zip(rs, rd)) if a != b)
            print(f"  ✗ {name}: VALUES differ at row {bad}:")
            print(f"      spark: {rs[bad]}")
            print(f"      duck : {rd[bad]}")
            n_fail += 1
            continue
        print(f"  ✓ {name} ({len(s)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(names) - n_pass - n_fail} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

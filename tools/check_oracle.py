#!/usr/bin/env python3
"""Dev-only mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, and compares: schema (sorted column names), row count, and a hash
of the sorted values. This file is NOT part of the shipped library — it
exists so oracle-parity bugs surface before the driver runs.
"""
import json
import sys
import duckdb
import glob
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    # sort columns by name, then rows by all columns, stringify
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"MISSING-OUTPUT {name}")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracle:
            n_noracle += 1
            print(f"ROWS-ONLY     {name}: rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR    {name}: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"SCHEMA-DIFF   {name}: spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"ROWCOUNT-DIFF {name}: spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        if not a.astype(str).equals(b.astype(str)):
            diff = (a.astype(str) != b.astype(str)).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"VALUE-DIFF    {name}: first diffs at rows {list(idx)}")
            for i in idx:
                print(f"  spark: {a.loc[i].to_dict()}")
                print(f"  duck : {b.loc[i].to_dict()}")
            n_fail += 1
            continue
        n_pass += 1
        print(f"PASS          {name}: rows={len(a)}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

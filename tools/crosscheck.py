#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: crosscheck.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables =
<sfDir>/<name>.parquet), sort columns by name, sort rows, compare.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_df = con.sql(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        if name not in oracle:
            print(f"SKIP  {name:28s} rows={len(spark_df)} (rows-only check)")
            n_skip += 1
            continue
        duck_df = con.sql(oracle[name]).df()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name:28s} columns {list(a.columns)} != {list(b.columns)}")
            n_fail += 1
            continue
        if list(a.dtypes) != list(b.dtypes):
            print(f"WARN  {name:28s} dtypes {list(a.dtypes)} vs {list(b.dtypes)}")
        if len(a) != len(b):
            print(f"FAIL  {name:28s} rows {len(a)} != {len(b)}")
            n_fail += 1
            continue
        eq = a.equals(b)
        if not eq:
            # elementwise diff report
            diff = (a != b) & ~(a.isna() & b.isna())
            ndiff = int(diff.values.sum())
            print(f"FAIL  {name:28s} {ndiff} differing cells / {a.size}")
            mask = diff.any(axis=1)
            print(pd.concat([a[mask].head(3), b[mask].head(3)]).to_string())
            n_fail += 1
        else:
            print(f"PASS  {name:28s} rows={len(a)}")
            n_pass += 1
    # queries that THREW in Verify leave no output dir; errors.json is
    # the visibility channel (r10 lesson: silent absence hid a
    # 22-query regression for two rounds)
    n_err = 0
    err_path = f"{out_dir}/errors.json"
    if os.path.exists(err_path):
        for name, msg in json.load(open(err_path)).items():
            print(f"ERR   {name:28s} {msg[:100]}")
            n_err += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_err} err, {n_skip} rows-only")
    return 1 if (n_fail or n_err) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

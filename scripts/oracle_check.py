#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: read Spark's parquet result, run
the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, then compare after sorting columns by name and rows by all values.
Approximates the driver's row/schema/hash match; treat any mismatch as red.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: ints (incl. nullable) -> float for NaN-safe compare,
    # timestamps -> ns, floats stay
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        spark_df = pd.read_parquet(qdir)
        if name not in oracle:
            # still exercise the driver's canonicalize/sort path: an
            # unsortable result (e.g. array column) must fail HERE, not
            # only in the driver's gate
            try:
                canon(spark_df)
                print(f"[rows-only] {name}: {len(spark_df)} rows")
                n_rowsonly += 1
            except Exception as e:
                print(f"[FAIL] {name}: rows-only canonicalize error: {e!r}")
                n_fail += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"[FAIL] {name}: {int(bad.sum())}/{len(a)} differing rows; first:")
            print(pd.concat([a[bad].head(3).assign(side="spark"),
                             b[bad].head(3).assign(side="duck")]))
            n_fail += 1
        else:
            print(f"[pass] {name}: {len(a)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

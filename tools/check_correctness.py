#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

For each query dir under <verify_out_dir>: load the Spark parquet result,
run the corresponding oracle SQL (oracle_sql.json) in DuckDB with the
TESTDATA parquet tables registered as views, sort columns by name, and
compare row counts, schemas (loosely) and a value hash.
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
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm_cell(v):
    import numpy as np
    import datetime
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, float):
        # nan before round: Python 3.10+ hash(nan) is id-based, so two
        # distinct nan objects would hash-mismatch rows that agree
        return None if v != v else round(v, 6)
    if isinstance(v, (np.floating,)):
        return None if v != v else round(float(v), 6)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if pd.isna(v):
        return None
    return v


def table_hash(df: pd.DataFrame) -> int:
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return hash(tuple(rows))


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(d for d in out_dir.iterdir() if d.is_dir()):
        name = qdir.name
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(qdir.glob("*.parquet"))],
            ignore_index=True)
        if name not in oracle:
            status = "ROWS_ONLY" if len(spark_df) > 0 else "ROWS_ONLY_EMPTY"
            n_rowsonly += 1
            print(f"{name:24s} {status} rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:24s} ORACLE_ERROR {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{name:24s} SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"{name:24s} ROWCOUNT spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        if table_hash(a) != table_hash(b):
            print(f"{name:24s} HASH_MISMATCH rows={len(a)}")
            # show first differing rows
            for i in range(len(a)):
                ra = tuple(norm_cell(v) for v in a.iloc[i])
                rb = tuple(norm_cell(v) for v in b.iloc[i])
                if ra != rb:
                    print(f"  row {i}: spark={ra}")
                    print(f"          duck ={rb}")
                    break
            n_fail += 1
            continue
        print(f"{name:24s} PASS rows={len(a)}")
        n_pass += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_rowsonly}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

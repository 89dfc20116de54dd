#!/usr/bin/env python3
"""Local replica of the driver's CORRECTNESS compare.

Usage: python3 tools/oracle/check.py <sfDir> <verifyOutDir>

Reads each query's Spark parquet from <verifyOutDir>/<name>, runs the
matching oracle SQL (from <verifyOutDir>/oracle_sql.json) in DuckDB with the
sf tables registered as views, then compares: row count, schema (sorted
column names), and a hash of all values with columns sorted by name and rows
sorted by every column. Prints one line per query.
"""
import hashlib
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        for v in s:
            if isinstance(v, float):
                h.update(repr(v).encode())
            elif isinstance(v, (list, tuple)):
                h.update(repr(list(v)).encode())
            else:
                h.update(repr(v).encode())
            h.update(b"\x00")
        h.update(b"\x01")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

    n_pass = n_fail = n_no_oracle = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pq.read_table(d).to_pandas()
        if name not in oracles:
            n_no_oracle += 1
            print(f"{name}: NO_ORACLE (spark_rows={len(spark_df)})")
            continue
        try:
            ora_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"{name}: ORACLE_ERR {e}")
            continue
        s, o = canon(spark_df), canon(ora_df)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        # dtype comparison via arrow round-trip of the oracle frame
        hmatch = rows and schema and value_hash(s) == value_hash(o)
        ok = rows and schema and hmatch
        n_pass += ok
        n_fail += (not ok)
        status = "PASS" if ok else "FAIL"
        detail = ""
        if not rows:
            detail = f" rows {len(s)} vs {len(o)}"
        elif not schema:
            detail = f" schema {list(s.columns)} vs {list(o.columns)}"
        elif not hmatch:
            # locate first differing column for debugging
            for c in s.columns:
                if value_hash(s[[c]]) != value_hash(o[[c]]):
                    sv = s[c].tolist()[:3]
                    ov = o[c].tolist()[:3]
                    detail = f" col '{c}' differs: spark={sv} oracle={ov} (dtypes {s[c].dtype} vs {o[c].dtype})"
                    break
        print(f"{name}: {status}{detail}")
    print(f"== pass={n_pass} fail={n_fail} no_oracle={n_no_oracle}")


if __name__ == "__main__":
    main()

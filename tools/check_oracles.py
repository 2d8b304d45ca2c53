#!/usr/bin/env python3
"""Dev harness (builder-side twin of the driver's correctness gate).

Runs each dumped Spark result under /tmp/graft_verify/<name> against the
DuckDB oracle in oracle_sql.json over the same sf parquet tables, compares
row count, column names/order-insensitive schema, and a value hash with
columns sorted by name — the driver's compare semantics.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir> [name ...]
"""
import json, sys, glob, os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def frames_equal(s: pd.DataFrame, o: pd.DataFrame) -> bool:
    # the skill's compare: dtype-strict, row-order sensitive
    return (all(str(a) == str(b) for a, b in zip(s.dtypes, o.dtypes))
            and s.reset_index(drop=True).equals(o.reset_index(drop=True)))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in names or sorted(oracles):
        d = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK RESULT")
            failures += 1
            continue
        # read the Spark result THROUGH DUCKDB like the driver does:
        # pd.read_parquet surfaces DATE columns as dtype object
        # (datetime.date), while duckdb's .df() gives datetime64[us] on
        # both sides — the dtype-strict compare only matches on the
        # driver's read path
        spark_df = pd.concat([con.execute(
            f"SELECT * FROM read_parquet('{f}')").df()
            for f in sorted(files)])
        if name not in oracles:
            print(f"{name}: no_oracle (rows={len(spark_df)})")
            continue
        try:
            ora_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        s, o = canon(spark_df), canon(ora_df)
        rows_ok = len(s) == len(o)
        schema_ok = list(s.columns) == list(o.columns)
        hash_ok = rows_ok and schema_ok and frames_equal(s, o)
        status = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(f"{name}: {status} rows={len(s)}/{len(o)} "
              f"schema={schema_ok} hash={hash_ok}")
        if status == "FAIL":
            failures += 1
            if not schema_ok:
                print(f"  spark cols: {list(s.columns)}")
                print(f"  ora   cols: {list(o.columns)}")
            if rows_ok and schema_ok:
                neq = (s != o) & ~(s.isna() & o.isna())
                bad = neq.any(axis=1)
                print(s[bad].head(3))
                print(o[bad].head(3))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle SQL
from oracle_sql.json, loads the corresponding Spark parquet dump, and
compares: schema (column names), row count, and a hash over values with
columns sorted by name (both order-sensitive and order-insensitive).
"""
import json
import sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def norm_cell(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


def table_repr(df: pd.DataFrame, sort_rows: bool) -> str:
    rows = [tuple(norm_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    if sort_rows:
        rows = sorted(rows)
    return "\n".join("|".join(r) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        exp_c, got_c = canon(exp), canon(got)
        if list(exp_c.columns) != list(got_c.columns):
            print(f"FAIL {name}: columns differ: "
                  f"oracle={list(exp_c.columns)} spark={list(got_c.columns)}")
            n_fail += 1
            continue
        if len(exp_c) != len(got_c):
            print(f"FAIL {name}: rows differ: oracle={len(exp_c)} "
                  f"spark={len(got_c)}")
            n_fail += 1
            continue
        unordered_ok = table_repr(exp_c, True) == table_repr(got_c, True)
        ordered_ok = table_repr(exp_c, False) == table_repr(got_c, False)
        if unordered_ok:
            flag = "" if ordered_ok else " (row order differs)"
            print(f"PASS {name}: {len(exp_c)} rows{flag}")
            n_pass += 1
        else:
            print(f"FAIL {name}: value mismatch")
            # show first differing rows
            er = table_repr(exp_c, True).split("\n")
            gr = table_repr(got_c, True).split("\n")
            for i, (a, b) in enumerate(zip(er, gr)):
                if a != b:
                    print(f"  first diff at sorted row {i}:")
                    print(f"    oracle: {a[:300]}")
                    print(f"    spark : {b[:300]}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

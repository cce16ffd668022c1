#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: local_compare.py <sfDir> <verifyOutDir> [namePrefix,...]

Reads each <verifyOutDir>/<name>/ parquet dump written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
sfDir parquet tables, and compares:
  - row count,
  - sorted column-name schema,
  - engine-stable result types (the r5 HUGEINT lesson: flag any oracle
    column outside BIGINT/INTEGER/DOUBLE/DECIMAL/VARCHAR/DATE/
    TIMESTAMP/BOOL). INTEGER is whitelisted deliberately: 86 oracle
    columns are INT32 and the driver accepts them because the Spark
    parquet side emits INT32 for the same columns — the column-for-
    column parity that tools/oracle_type_guard.py enforces; a one-sided
    INT32 would fail THAT gate, not this one,
  - exact values after sorting columns by name and rows canonically.
"""
import json
import sys

import duckdb
import pandas as pd

STABLE = ("BIGINT", "DOUBLE", "VARCHAR", "DATE", "BOOLEAN", "INTEGER")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name, sql in sorted(oracles.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            rel = con.sql(sql)
            bad_types = [
                (c, t) for c, t in zip(rel.columns, map(str, rel.types))
                if not any(str(t).startswith(s) for s in STABLE)
                and not str(t).startswith("DECIMAL")
                and not str(t).startswith("TIMESTAMP")]
            oracle_df = rel.df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {e}")
            failures += 1
            continue
        problems = []
        if bad_types:
            problems.append(f"unstable oracle types {bad_types}")
        if sorted(spark_df.columns) != sorted(oracle_df.columns):
            problems.append(
                f"schema {sorted(spark_df.columns)} != {sorted(oracle_df.columns)}")
        elif len(spark_df) != len(oracle_df):
            problems.append(f"rows {len(spark_df)} != {len(oracle_df)}")
        else:
            a, b = canon(spark_df), canon(oracle_df)
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True)
            except AssertionError as e:
                problems.append(str(e).split("\n")[0])
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

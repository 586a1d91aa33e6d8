#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
  where <outDir> is what `graft.Verify` wrote (one parquet dir per query +
  oracle_sql.json).

For each query: load the Spark result parquet and the DuckDB result of the
oracle SQL (run against views named after the testdata tables), sort columns
by name, sort rows by all columns, and compare values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1
            continue
        # The driver's value-hash is dtype-kind sensitive: DuckDB SUM(int)
        # returns HUGEINT which pandas converts to float64 — hashing 5.0 vs
        # Spark's int64 5 differs even though values compare equal. Mirror
        # that: require the same dtype KIND (int vs float vs object) per
        # column (int32 vs int64 is fine — observed to hash alike).
        kinds_got = [got[c].dtype.kind for c in got.columns]
        kinds_exp = [exp[c].dtype.kind for c in exp.columns]
        if [k.replace('u', 'i') for k in kinds_got] != [k.replace('u', 'i') for k in kinds_exp]:
            print(f"FAIL {name}: dtype kinds {list(zip(got.columns, kinds_got, kinds_exp))}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(got)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:1500]}")
            # show first diffs
            neq = (got != exp) & ~(got.isna() & exp.isna())
            bad = neq.any(axis=1)
            print(pd.concat([got[bad].head(3).add_suffix('_spark'),
                             exp[bad].head(3).add_suffix('_duck')], axis=1))
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

"""Local mini-driver: run each __spark_entry__ query against its DuckDB
oracle and compare row count, schema (column names sorted), and an
order-insensitive value comparison — the same gate the round driver
applies at sf0.01.

Usage:
    python tools/check_oracle.py [--sf sf0.001] [--query NAME ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    issues = []
    if len(spark_df) != len(oracle_df):
        issues.append(f"row count {len(spark_df)} != {len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        issues.append(f"columns {sc} != {oc}")
        return issues
    a, b = _canon(spark_df), _canon(oracle_df)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col].to_numpy(), b[col].to_numpy()
            neq = av != bv
            try:
                n_bad = int(neq.sum())
            except Exception:
                n_bad = sum(bool(x) for x in neq)
            if n_bad:
                i = next(i for i, x in enumerate(neq) if x)
                issues.append(
                    f"col {col}: {n_bad} mismatches, first at row {i}: "
                    f"{av[i]!r} != {bv[i]!r}"
                )
    return issues


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.001",
                    help="testdata sf name, or an absolute path to a "
                         "directory of the same parquet tables (e.g. a "
                         "tools/make_sf.py output)")
    ap.add_argument("--query", nargs="*", default=None)
    ap.add_argument("--head", type=int, default=None,
                    help="only the first N registry entries")
    ap.add_argument("--exclude", nargs="*", default=[],
                    help="query names to skip (e.g. quadratic "
                         "recursive-CTE cluster oracles at big sf)")
    args = ap.parse_args()
    sf_dir = args.sf if os.path.isabs(args.sf) else f"/root/testdata/{args.sf}"

    import __spark_entry__ as entrymod
    from tinybrain_spark.session import get_spark

    spark = get_spark("check-oracle", master="local[8]", shuffle_partitions=8)
    con = _duck_con(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.query or list(qs)
    if args.head:
        names = names[: args.head]
    names = [n for n in names if n not in set(args.exclude)]
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        issues = compare(sdf, odf)
        if issues:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(issues)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

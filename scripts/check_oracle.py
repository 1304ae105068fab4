#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares row count + (column-name-
sorted, row-sorted) values. Exact for ints/strings/timestamps/bools;
tolerant-then-strict report for floats so hash-risk shows up early.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from cdc_historical_warehouse_platform_spark.schemas import TESTDATA_TABLES  # noqa: E402
from cdc_historical_warehouse_platform_spark.session import get_spark  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        return [f"rowcount {len(spark_pdf)} != {len(duck_pdf)}"]
    a, b = canon(spark_pdf), canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns {list(a.columns)} != {list(b.columns)}"]
    for col in a.columns:
        # TYPE-strict first: the driver's value hash distinguishes 15 from
        # 15.0 (r1: DuckDB HUGEINT sums land as float64 vs Spark bigint).
        # Compare dtype kinds, and for object columns the per-value Python
        # types, so a type drift fails locally before it fails the driver.
        ak, bk = a[col].dtype.kind, b[col].dtype.kind
        if ak != bk and "O" not in (ak, bk):
            # object-dtype mismatches defer to the per-value type check
            problems.append(
                f"col {col}: dtype mismatch spark={a[col].dtype} duck={b[col].dtype}"
            )
        # vectorized exact compare: equal where values match OR both null
        av = a[col].astype(object)
        bv = b[col].astype(object)
        nn = ~(av.isna().values | bv.isna().values)
        both_null = av.isna().values & bv.isna().values
        eq = (av.values == bv.values) | both_null
        if not eq.all():
            bad = [i for i, ok in enumerate(eq) if not ok][:3]
            for i in bad:
                problems.append(f"col {col} row {i}: {av.iloc[i]!r} != {bv.iloc[i]!r}")
        if ak == "O" or bk == "O":
            # row-wise, not set-wise: spark [15, 2.0] vs duck [15.0, 2]
            # has equal type SETS but per-row drift the driver's hash
            # would catch
            drift = [
                i
                for i, keep in enumerate(nn)
                if keep and type(av.iloc[i]) is not type(bv.iloc[i])
            ][:3]
            for i in drift:
                problems.append(
                    f"col {col} row {i}: value type "
                    f"spark={type(av.iloc[i]).__name__} duck={type(bv.iloc[i]).__name__}"
                )
        if len(problems) > 5:
            return problems
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle-check", extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(spark_pdf)} rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:6]))
            failures += 1
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows")
    # denominator = queries actually RUN (a name filter must not make
    # the log claim more coverage than it proves)
    print(f"\n{failures} failures / {n_run} queries run ({len(qs)} registered)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

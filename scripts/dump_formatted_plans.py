#!/usr/bin/env python
"""Dump .explain("formatted") output for headline registry rows to
plans/r13/<name>_<tag>.txt — the optimization round's plan evidence.

Usage: python scripts/dump_formatted_plans.py <tag> [name ...]
  tag: "before" or "after" (file suffix)
  names: registry row names; default = the bench HEADLINE list.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from bench import HEADLINE

    import __spark_entry__ as entry
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries()
    if not names:
        names = list(HEADLINE)
    outdir = REPO / "plans" / "r13"
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        (outdir / f"{name}_{tag}.txt").write_text(formatted_plan(df))
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()

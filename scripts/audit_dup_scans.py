#!/usr/bin/env python
"""Duplicate-subtree audit (r12 optimization round, guide §7.2): for
every registry row, build the DataFrame at a small SF and count, in the
formatted physical plan, (a) Exchange nodes and (b) scans per distinct
parquet location. Rows where one location is scanned more than once are
the candidates for a shared-subtree pin — or documented as
by-design (correlated TPC-H shapes, self-joins).

Plan-only where possible: building a row's DataFrame may still execute
driver-side staging for the stateful rows (store builds), so run at
sf0.001. Prints one line per flagged row plus a summary.

Usage: python scripts/audit_dup_scans.py [sf_dir] [name ...]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:]

    import __spark_entry__ as entry
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries()
    if not names:
        names = sorted(qs)

    flagged = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001 — audit must keep going
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        # operator-tree section only (details section repeats node names)
        tree = plan.split("\n\n")[0]
        n_exchange = len(re.findall(r"\bExchange\b", tree))
        # Location lines live in the details section
        locs = Counter(
            m.group(1)
            for m in re.finditer(r"Location: \S+ \[([^\]]*)\]", plan)
        )
        dups = {p.rsplit("/", 2)[-1]: c for p, c in locs.items() if c > 1}
        if dups:
            flagged += 1
            print(f"DUP  {name}: exchanges={n_exchange} dup_scans={dups}")
    print(f"audit done: {flagged} flagged / {len(names)} rows")


if __name__ == "__main__":
    main()

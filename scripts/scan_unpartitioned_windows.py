#!/usr/bin/env python
"""One-off r12 calibration scan: walk every registry query's prepared
physical plan and report Window-family nodes with an EMPTY partition
spec (the sort-to-one-partition shape the new lint will forbid).
Used to build the lint's bounded-by-construction allowlist."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))
    subqueries = node.subqueries()
    for i in range(subqueries.size()):
        yield from _walk(subqueries.apply(i))


def main() -> None:
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(app_name="scan-windows")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    offenders = {}
    for name, fn in mod.queries().items():
        try:
            df = fn(spark, SF_DIR)
            hits = []
            for node in _walk(df._jdf.queryExecution().executedPlan()):
                cls = node.getClass().getSimpleName()
                if cls in (
                    "WindowExec",
                    "WindowGroupLimitExec",
                    "WindowInPandasExec",
                ):
                    try:
                        empty = node.partitionSpec().isEmpty()
                    except Exception:
                        empty = None
                    if empty:
                        hits.append(cls)
            if hits:
                offenders[name] = hits
        except Exception as e:  # noqa: BLE001
            offenders[name] = [f"ERROR: {e}"[:200]]
    print(json.dumps(offenders, indent=2))


if __name__ == "__main__":
    main()

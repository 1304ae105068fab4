#!/usr/bin/env python
"""A/B timer for individual registry rows: N interleaved noop-sink
samples per row at sf0.1 on the current tree. Prints per-row samples
plus min/median so a single-change effect can be measured without
running the whole bench suite.

Usage: python scripts/ab_row.py <name> [name ...] [--n N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 4
    for i, a in enumerate(sys.argv):
        if a == "--n":
            n = int(sys.argv[i + 1])
            args.remove(sys.argv[i + 1])
    import __spark_entry__ as entry
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    samples: dict[str, list[float]] = {name: [] for name in args}
    for _ in range(n):
        for name in args:
            os.sync()
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
    for name in args:
        vals = samples[name]
        print(
            f"{name}: min={min(vals)} med={statistics.median(vals)} "
            f"samples={vals}"
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the IVM staged-batch pin (incremental_agg._PIN_STAGED) at sf0.1
and at the sf1 (10x) rehearsal fixture — r13 verdict task #3: the r12
round pinned the staged batch on plan evidence (Window nodes 36 -> 0)
but local sf0.1 wall-clock read flat-to-worse; decide keep / condition
/ remove with measured numbers at both scales.

Usage: python scripts/ab_ivm_pin.py [sf1_dir] [n_pairs]
The sf1 fixture must already exist (scripts/rehearse_sf1.py builds it);
pass "-" to skip the sf1 leg.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = ["scd2_incremental_revenue", "scd2_incremental_histogram"]


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entry
    from cdc_historical_warehouse_platform_spark.operators import incremental_agg as IA
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    dirs = [("sf0.1", SF01)] + ([("sf1", sf1)] if sf1 != "-" else [])
    samples: dict[tuple, list[float]] = {}
    for i in range(n):
        # order-rotate: pin-first on even rounds, pin-last on odd
        for pin in ([True, False] if i % 2 == 0 else [False, True]):
            IA._PIN_STAGED = pin
            for label, d in dirs:
                for row in ROWS:
                    os.sync()
                    t0 = time.perf_counter()
                    qs[row](spark, d).write.mode("overwrite").format("noop").save()
                    samples.setdefault((label, row, pin), []).append(
                        round(time.perf_counter() - t0, 3)
                    )
    IA._PIN_STAGED = True
    for (label, row, pin), vals in sorted(samples.items(), key=str):
        print(f"{label} {row} pin={pin}: min={min(vals)} samples={vals}")


if __name__ == "__main__":
    main()

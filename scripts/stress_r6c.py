#!/usr/bin/env python
"""Stress the r6 layout + PQ additions far beyond the driver testdata:

1. **Z-order write + file skipping** (operators/layout.py): N_ROWS
   synthetic (custkey, day) facts written two ways — Z-ordered and
   single-column-sorted — each with a footer-stats manifest. Asserts
   a 2-D box predicate skips a real majority of the Z-ordered files
   while the date-sorted layout cannot skip on the second dimension,
   and that the pruned read returns exactly the full-scan-filter
   rows. Reports files_read/files_total for both layouts plus
   pruned-vs-full scan wall time.

2. **PQ ADC scan** (operators/pq.py): N_VECS synthetic vectors in
   planted groups, codebooks trained on a bounded sample, the whole
   corpus encoded to m codes, then an ADC top-k for N_QUERIES
   queries. Asserts planted-group recall ≥ 0.9 and reports encode /
   scan throughput. The scan is one map pass over codes — its wall
   time is the 100 TB read-rate story for a corpus 64× smaller than
   its float form.

3. **Logreg quality filter** (operators/classifier.py): N_ROWS
   separable feature rows, 3 full-batch gradient iterations under TWO
   different partitionings — asserts the fitted weights and losses
   are bit-identical (the exact-sum gradient claim at scale) and
   reports rows/iteration/s.

Usage: python scripts/stress_r6c.py [rows] [vecs] [dim] [queries]

Evidence tooling, not a pytest (runs minutes at large N).
"""

from __future__ import annotations

import json
import math
import random
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.operators import layout, pq
    from cdc_historical_warehouse_platform_spark.session import get_spark
    from cdc_historical_warehouse_platform_spark.sources.tables import VersionedTable

    spark = get_spark(app_name="stress-r6c")
    out: dict = {"rows": n_rows, "vecs": n_vecs, "dim": dim, "queries": n_queries}

    # ---- 1. z-order + skipping --------------------------------------------
    n_files = 64
    facts = spark.range(n_rows).select(
        F.col("id").alias("row_id"),
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("custkey"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2_557)).alias("day"),
    )
    key = layout.zorder_key2(
        layout.quantize(F.col("custkey"), 0, 99_999),
        layout.quantize(F.col("day"), 0, 2_556),
    )
    tmp = Path(tempfile.mkdtemp(prefix="stress_r6c_"))
    zt = VersionedTable(tmp / "z")
    t0 = time.time()
    layout.write_zordered(zt, facts, key, ["custkey", "day"], n_files=n_files)
    out["zorder_write_s"] = round(time.time() - t0, 2)

    st = VersionedTable(tmp / "d")
    st.commit(facts.repartitionByRange(n_files, F.col("day").asc()))
    d_stats = layout.collect_file_stats(spark, st.path / "v0", ["custkey", "day"])
    layout._stats_file(st, 0).write_text(json.dumps(d_stats))

    preds = {"custkey": (10_000, 20_000), "day": (300, 600)}
    t0 = time.time()
    pruned, zrep = layout.read_pruned(zt, spark, preds)
    pruned_rows = pruned.count()
    out["pruned_scan_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    full_rows = (
        zt.read(spark)
        .where(
            (F.col("custkey") >= 10_000)
            & (F.col("custkey") <= 20_000)
            & (F.col("day") >= 300)
            & (F.col("day") <= 600)
        )
        .count()
    )
    out["full_scan_s"] = round(time.time() - t0, 2)
    _, drep = layout.read_pruned(st, spark, preds)
    out["zorder_files"] = {"read": zrep["files_read"], "total": zrep["files_total"]}
    out["datesort_files"] = {"read": drep["files_read"], "total": drep["files_total"]}
    assert pruned_rows == full_rows, (pruned_rows, full_rows)
    # the 2-D box must skip a real majority of z-ordered files, and
    # strictly beat what a 1-D sort can skip with the same predicate
    assert zrep["files_read"] <= zrep["files_total"] // 2, zrep
    assert zrep["files_read"] < drep["files_read"], (zrep, drep)
    out["rows_matched"] = pruned_rows

    # ---- 2. PQ at scale ----------------------------------------------------
    m, k = 8, 256
    n_groups = 1000
    rng = random.Random(23)
    centers = []
    for _ in range(n_groups):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        centers.append([x / n for x in v])
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "gid int, center array<double>"
    )
    vecs = (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            F.pmod(F.col("id"), F.lit(n_groups)).cast("int").alias("gid"),
        )
        .join(F.broadcast(cent_df), "gid")
        .select(
            F.col("vec_id").cast("string").alias("vec_id"),
            "gid",
            F.transform(
                "center",
                lambda x, i: x
                + (F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(1000)).cast("double") - 500.0)
                / 20000.0,
            ).alias("embedding"),
        )
    )
    vecs = vecs.localCheckpoint(eager=True)

    sample = vecs.where(F.pmod(F.xxhash64("vec_id"), F.lit(20)) == 0)
    t0 = time.time()
    cb = pq.train_pq_codebooks(sample, m=m, k=k, refine=1)
    out["pq_train_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    codes = pq.encode_pq(vecs, cb).localCheckpoint(eager=True)
    n_codes = codes.count()
    out["pq_encode_s"] = round(time.time() - t0, 2)
    out["pq_encode_vecs_per_s"] = int(n_codes / max(out["pq_encode_s"], 1e-9))

    qids = [str(i) for i in range(n_queries)]
    queries = vecs.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t0 = time.time()
    res = pq.pq_adc_topk(codes, cb, queries, k=10).collect()
    out["pq_scan_s"] = round(time.time() - t0, 2)
    out["pq_scan_codes_per_s"] = int(n_codes / max(out["pq_scan_s"], 1e-9))

    # planted recall: a query's true neighbors are its group-mates
    hits = sum(1 for r in res if int(r["neighbor_id"]) % n_groups == int(r["query_id"]) % n_groups)
    recall = hits / len(res)
    out["pq_group_recall"] = round(recall, 4)
    assert recall >= 0.9, recall

    # ---- 3. logreg quality filter at scale --------------------------------
    # n_rows synthetic feature rows, separable by construction; each
    # iteration is ONE aggregate — assert the bit-reproducibility
    # claim holds at scale across different partitionings
    from cdc_historical_warehouse_platform_spark.operators.classifier import fit_logreg

    lab = spark.range(n_rows).select(
        (F.col("id") % 2).cast("double").alias("y"),
        (
            (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double") / 250.0 - 2.0)
            + (F.col("id") % 2).cast("double") * 3.0
        ).alias("x1"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)).cast("double") / 500.0).alias(
            "x2"
        ),
    )
    feats = {"x1": F.col("x1"), "x2": F.col("x2")}
    t0 = time.time()
    m1 = fit_logreg(lab.repartition(32), feats, F.col("y"), iters=3)
    out["logreg_3iters_s"] = round(time.time() - t0, 2)
    m2 = fit_logreg(lab.repartition(11), feats, F.col("y"), iters=3)
    assert m1["weights"] == m2["weights"] and m1["losses"] == m2["losses"]
    out["logreg_rows_per_iter_per_s"] = int(
        3 * n_rows / max(out["logreg_3iters_s"], 1e-9)
    )
    out["logreg_final_loss"] = round(m1["losses"][-1], 6)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

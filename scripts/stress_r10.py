#!/usr/bin/env python
"""r10 stress: the Matryoshka two-stage probe at synthetic scale.

Builds an IVF index with a stored 16-dim prefix column over a synthetic
corpus (default 300K × 64-dim vectors — ~40× the sf0.1 table, big
enough that scan bytes matter), plants known near-neighbors for a probe
set, and asserts:

1. **Recall**: the two-stage probe (narrow prefix stage 1 → exact
   full-dim rerank of k1 candidates) finds every PLANTED neighbor at
   rank 1 — the prefix pass must not lose the true match (planted
   copies are near-identical in every dim, so their prefix cosine is
   also ~1).
2. **Parity**: two-stage == the one-stage full-dim probe on the planted
   top-1s, and broadcast == shuffled candidate join on the full top-k.
3. **Plan**: the stage-1 scan reads (vec_id, prefix, list_id) only —
   the wide embedding column is column-pruned out of the cheap pass.
4. **Throughput**: wall-clock for both probe modes is printed (the
   narrow-scan benefit grows with corpus width; at 64 dims the prefix
   reads 1/4 of the vector bytes in stage 1).

Usage: python scripts/stress_r10.py [n_vectors] [dims] (defaults
300000 64; quick: 30000 64)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries = 50

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.session import get_spark
    from cdc_historical_warehouse_platform_spark.sources.ann_index import IVFIndex

    spark = get_spark(
        app_name="stress-r10-two-stage",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # synthetic corpus: deterministic pseudo-random unit-ish vectors
    # (md5-derived per (id, dim) — no RNG state, re-run identical)
    dim_exprs = F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws("_", F.col("id"), F.lit(d))), 1, 8),
                    16,
                    10,
                ).cast("double")
                / F.lit(float(1 << 32))
                - F.lit(0.5)
            ).cast("float")
            for d in range(dims)
        ]
    )
    base = spark.range(n).select(F.col("id").alias("vec_id"), dim_exprs.alias("embedding"))
    # planted near-dups of the first n_queries vectors: every dim scaled
    # by 1.001 — cosine ~1.0 in full AND prefix space, id = vec_id + 10M
    plants = base.filter(F.col("vec_id") < n_queries).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: (x * F.lit(1.001)).cast("float")).alias(
            "embedding"
        ),
    )
    corpus = base.unionByName(plants).localCheckpoint(eager=True)

    out: dict = {"n_vectors": n + n_queries, "dims": dims, "n_queries": n_queries}
    d = tempfile.mkdtemp(prefix="stress_r10_")
    try:
        t0 = time.perf_counter()
        idx = IVFIndex.build(corpus, d + "/ivf", n_lists=64, prefix_dims=16)
        out["build_sec"] = round(time.perf_counter() - t0, 1)

        queries = base.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )

        def run(fn):
            t0 = time.perf_counter()
            rows = fn().collect()
            return round(time.perf_counter() - t0, 2), rows

        out["two_stage_sec"], two = run(
            lambda: idx.probe_two_stage(spark, queries, k=10, k1=40, n_probes=4)
        )
        out["two_stage_warm_sec"], two = run(
            lambda: idx.probe_two_stage(spark, queries, k=10, k1=40, n_probes=4)
        )
        out["one_stage_warm_sec"], one = run(
            lambda: idx.probe(spark, queries, k=10, n_probes=4)
        )
        _, two_shuf = run(
            lambda: idx.probe_two_stage(
                spark, queries, k=10, k1=40, n_probes=4, broadcast_probe=False
            )
        )

        # 1) recall: every planted copy at rank 1 for its query
        top1 = {r["query_id"]: r["neighbor_id"] for r in two if r["rank"] == 1}
        missed = [q for q in range(n_queries) if top1.get(q) != q + 10_000_000]
        out["planted_top1_missed"] = len(missed)
        assert not missed, f"two-stage missed planted neighbors: {missed[:5]}"

        # 2) parity: one-stage agrees on the planted top-1s; shuffled
        # candidate join returns the identical top-k set
        top1_one = {r["query_id"]: r["neighbor_id"] for r in one if r["rank"] == 1}
        assert top1 == top1_one, "two-stage vs one-stage top-1 drift"
        canon = lambda rows: sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 9))
            for r in rows
        )
        assert canon(two) == canon(two_shuf), "broadcast vs shuffled drift"

        # 3) plan: stage-1 scan is narrow
        plan = (
            idx.probe_two_stage(spark, queries, k=10, k1=40, n_probes=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        narrow = [
            ln
            for ln in plan.splitlines()
            if "FileScan" in ln and "prefix" in ln and "embedding" not in ln
        ]
        assert narrow, "no narrow stage-1 scan in the plan"
        out["narrow_stage1_scan"] = True
        out["ok"] = True
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stress the r4 fourth-batch operators far beyond the driver testdata:

1. **Per-source cap** (operators/sampling.cap_per_source): N docs
   across a Zipf-ish source mix with one hot source holding ~half the
   corpus. Reports wall time for the two-phase (gate → rank) path vs
   the naive full-corpus window rank, asserts identical output, and
   asserts the gate actually engaged (survivor count ≪ N).

2. **Int8 SQ top-k** (operators/similarity.sq_topk): M 64-dim vectors
   probed for a 10-query batch. Reports the one-time quantized-corpus
   build (quantize_corpus), the int8 probe over it, and the
   full-precision brute-force scan — the probe must beat brute (the
   4× byte reduction is the point) — plus the recall@10 overlap
   between the two rankings (must hold ≥ 0.8 at scale — quantization
   error doesn't grow with corpus size, the floor guards regressions).

Usage: python scripts/stress_r4b.py [n_docs] [n_vectors]

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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.operators.sampling import cap_per_source
    from cdc_historical_warehouse_platform_spark.operators.similarity import (
        cosine_topk,
        quantize_corpus,
        sq_topk,
    )
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(
        app_name="r4b-stress", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    out: dict = {"n_docs": n_docs, "n_vectors": n_vecs}

    # --- 1. per-source cap on a skewed corpus -------------------------
    # source 0 holds ~50% of docs (the hot domain), the rest follow a
    # heavy tail over 10k sources
    docs = (
        spark.range(n_docs)
        .withColumn(
            "source",
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("s"), F.pmod(F.xxhash64("id"), F.lit(10_000)))
            ),
        )
        .withColumnRenamed("id", "doc_id")
        .localCheckpoint(eager=True)
    )
    cap = 100
    t0 = time.time()
    two_phase = cap_per_source(docs, cap).select("source", "doc_id", "cap_rank")
    n_kept = two_phase.count()
    out["cap_two_phase_sec"] = round(time.time() - t0, 2)
    out["cap_kept"] = n_kept

    t0 = time.time()
    draw = F.md5(F.concat(F.lit("domain-cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(draw.asc(), F.col("doc_id").asc())
    naive = (
        docs.withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= cap)
        .select("source", "doc_id", "cap_rank")
    )
    n_naive = naive.count()
    out["cap_naive_sec"] = round(time.time() - t0, 2)
    mismatch = two_phase.exceptAll(naive).count() + naive.exceptAll(two_phase).count()
    out["cap_mismatch_rows"] = mismatch
    assert mismatch == 0, f"two-phase diverged from naive rank by {mismatch} rows"
    assert n_kept == n_naive
    # the hot source must be capped and the gate must have engaged
    hot = two_phase.filter(F.col("source") == "hot").count()
    assert hot == cap, hot

    # --- 2. int8 SQ top-k vs full-precision brute force ---------------
    dim = 64
    vecs = (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda d: (
                    (F.pmod(F.xxhash64(F.col("id"), d), F.lit(2_000_001)) - 1_000_000)
                    / 1_000_000.0
                ),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    queries = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t0 = time.time()
    qcorpus = quantize_corpus(vecs)
    qcorpus.count()  # force the build barrier
    out["sq_build_sec"] = round(time.time() - t0, 2)
    # probe twice: this is the probe-MANY tier, so the steady-state
    # (second) probe is the number that matters; the first pays JVM
    # JIT warm-up of the integer-fold codegen
    t0 = time.time()
    sq = sq_topk(vecs, queries, k=10, quantized=qcorpus).collect()
    out["sq_probe_cold_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    sq = sq_topk(vecs, queries, k=10, quantized=qcorpus).collect()
    out["sq_probe_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    exact = cosine_topk(vecs, queries, k=10).collect()
    out["brute_topk_sec"] = round(time.time() - t0, 2)
    assert out["sq_probe_sec"] < out["brute_topk_sec"], (
        "warm int8 probe failed to beat the full-precision scan"
    )
    by_q: dict = {}
    for r in exact:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    by_q_sq: dict = {}
    for r in sq:
        by_q_sq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(by_q[q] & by_q_sq.get(q, set())) for q in by_q) / sum(
        len(v) for v in by_q.values()
    )
    out["sq_recall_at_10"] = round(recall, 3)
    assert recall >= 0.8, f"SQ recall {recall} collapsed at scale"

    print(json.dumps(out))


if __name__ == "__main__":
    main()

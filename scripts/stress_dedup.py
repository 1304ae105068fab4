#!/usr/bin/env python
"""Stress the dedup/similarity scale paths far beyond the driver
testdata: a synthetic N-doc corpus with planted near-duplicates runs
through MinHash-banded-LSH pair detection, and an N-vector corpus with
planted jittered copies runs through banded hyperplane-LSH embedding
near-dup. Reports wall time + found-pair counts (the planted pairs
give a recall floor that must hold at any N).

Usage: python scripts/stress_dedup.py [n_docs] [n_vectors]

Evidence tooling, not a pytest (minutes at large N): the claims it
backs are that candidate generation stays band-bounded (no all-pairs
blowup as the corpus grows) and that the verify tier touches only
candidates.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(
        app_name="dedup-stress", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    # --- text corpus: 40-token docs from a 5000-word vocabulary, each
    # token chosen by xxhash64(doc, pos) — deterministic, near-uniform,
    # so random docs share almost no 3-gram. Every 100th doc gets a
    # near-duplicate (same prefix, one token changed) under id+N.
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), F.lit(p)), F.lit(5000)).cast(
                        "string"
                    ),
                )
                for p in range(40)
            ],
        ).alias("text"),
    )
    dups = (
        base.filter(F.col("doc_id") % 100 == 0)
        .select(
            (F.col("doc_id") + n_docs).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    corpus = base.unionByName(dups).localCheckpoint(eager=True)
    planted = n_docs // 100 + (1 if n_docs % 100 else 0)

    from cdc_historical_warehouse_platform_spark.operators.dedup import minhash_lsh_pairs

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(corpus, threshold=0.5).count()
    lsh_s = time.perf_counter() - t0

    # --- embeddings: 64-dim pseudo-random vectors; every 100th gets a
    # jittered copy (cosine ≈ 0.9999) under id+N.
    vec = F.array(
        *[
            (
                F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(2001)) - F.lit(1000)
            ).cast("double")
            / F.lit(1000.0)
            for d in range(64)
        ]
    )
    vbase = spark.range(n_vecs).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    vdups = vbase.filter(F.col("vec_id") % 100 == 0).select(
        (F.col("vec_id") + n_vecs).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x * F.lit(1.0001) + F.lit(0.0001)
        ).alias("embedding"),
    )
    vcorpus = vbase.unionByName(vdups).localCheckpoint(eager=True)
    vplanted = n_vecs // 100 + (1 if n_vecs % 100 else 0)

    from cdc_historical_warehouse_platform_spark.operators.dedup import (
        banded_embedding_near_dup,
    )

    t1 = time.perf_counter()
    # the 100 TB configuration: BLAS signatures + corpus-size-aware
    # banding (expr-path default kept for bit-exact reproducibility)
    vpairs = banded_embedding_near_dup(
        vcorpus, threshold=0.99, signature="arrow", n_hint=vcorpus.count()
    ).count()
    emb_s = time.perf_counter() - t1

    print(
        f"docs={corpus.count()} lsh_pairs={pairs} (planted>={planted}) "
        f"lsh={lsh_s:.1f}s | vecs={vcorpus.count()} emb_pairs={vpairs} "
        f"(planted>={vplanted}) emb={emb_s:.1f}s"
    )


if __name__ == "__main__":
    main()

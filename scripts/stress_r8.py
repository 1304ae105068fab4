"""Bucketed-state corpus bulk-append stress (r8).

Two identical bucketed-state corpora take the SAME mixed batch (half
exact duplicates of the corpus, half fresh docs) — one through the
default broadcast probes, one FORCED through the co-partitioned bulk
probes (bulk_probe_doc_limit=0). Hard asserts:

1. the kept doc-id sets are IDENTICAL across probe paths (the bulk
   path is a pure physical rewrite of the same decision),
2. the exact-duplicate half is fully dropped and re-delivery of the
   whole batch appends 0 on the bulk path,
3. both corpora's state stays repair-stable.

Usage: python scripts/stress_r8.py [N_DOCS]   (default 100_000)
Prints ONE JSON line with timings.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import (  # noqa: E402
    corpus_append,
    corpus_build,
)
from cdc_historical_warehouse_platform_spark.pipeline.corpus_state import (  # noqa: E402
    repair,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
BUCKETS = 32


def synth_docs(spark, lo: int, hi: int, flip: bool = False):
    """Long-ish unique documents that pass the quality gate; ``flip``
    produces token orders with low Jaccard vs the unflipped docs."""
    order = (
        F.sequence(F.lit(40), F.lit(1), F.lit(-1))
        if flip
        else F.sequence(F.lit(1), F.lit(40))
    )
    # md5-derived tokens: unique per (doc, position), so the only
    # duplicate structure in the corpus is what the stress PLANTS
    body = F.array_join(
        F.transform(
            order,
            lambda i: F.substring(
                F.md5(F.concat_ws("_", F.col("id").cast("string"), i)), 1, 10
            ),
        ),
        " ",
    )
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("The document begins. "), body, F.lit(". It ends here.")).alias("text"),
        F.lit("en").alias("lang"),
        (F.concat(F.lit("src"), F.col("id") % 7)).alias("source"),
        F.length(body).cast("int").alias("n_chars"),
    )


def write_input(spark, df, path):
    df.write.mode("overwrite").parquet(path + "/documents.parquet")


def ids(spark, path):
    return {r["doc_id"] for r in spark.read.parquet(path).select("doc_id").collect()}


def main() -> int:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    out = {"n_docs": N, "buckets": BUCKETS}
    root = tempfile.mkdtemp(prefix="r8_stress_")
    base = synth_docs(spark, 0, N)
    write_input(spark, base, root + "/in")

    t0 = time.time()
    for c in ("a", "b"):
        corpus_build(spark, root + "/in", f"{root}/{c}", state_buckets=BUCKETS)
    out["build_sec_each"] = round((time.time() - t0) / 2, 2)
    assert ids(spark, root + "/a") == ids(spark, root + "/b")

    # mixed batch: N/2 exact duplicates (new ids, same text as corpus
    # docs) + N/2 fresh flipped docs
    dup_half = synth_docs(spark, 0, N // 2).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    fresh_half = synth_docs(spark, N, N + N // 2, flip=True).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    batch = dup_half.unionByName(fresh_half).localCheckpoint(eager=True)

    t1 = time.time()
    r_bc = corpus_append(spark, batch, root + "/a")  # broadcast probes
    t2 = time.time()
    r_bulk = corpus_append(spark, batch, root + "/b", bulk_probe_doc_limit=0)
    t3 = time.time()
    out["append_broadcast_sec"] = round(t2 - t1, 2)
    out["append_bulk_sec"] = round(t3 - t2, 2)
    out["appended"] = r_bulk["appended"]

    assert ids(spark, root + "/a") == ids(spark, root + "/b"), (
        "probe paths diverged"
    )
    # every exact duplicate dropped; the md5-token fresh half has no
    # unplanted near-dups, so it must append in full
    assert r_bc["appended"] == r_bulk["appended"] == N // 2, (r_bc, r_bulk)
    # re-delivery through the bulk path: state caught everything
    r_again = corpus_append(spark, batch, root + "/b", bulk_probe_doc_limit=0)
    assert r_again["appended"] == 0, r_again
    from pathlib import Path

    assert repair(Path(root) / "a")["removed"] == []
    assert repair(Path(root) / "b")["removed"] == []
    out["ok"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Phase profiler for the r13 optimization round: splits the composite
bench rows (ingest cycle, time travel, append cycle) into their phases
and times each with the noop sink / the row's own actions, so the
optimization effort lands on the dominant phase instead of the row
label. Usage: python scripts/profile_r13.py <ingest|tt|append> [n]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    os.sync()
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:42s} {dt:7.3f}s", flush=True)
    return out, dt


def profile_ingest(spark, n):
    import shutil
    import tempfile

    import bench
    from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import corpus_build
    from cdc_historical_warehouse_platform_spark.sources.raw_docs import read_warc_documents

    ingest_dir = tempfile.mkdtemp(prefix="prof_ingest_")
    try:
        bench._write_synthetic_warc(ingest_dir)
        work = ingest_dir + "/work"
        for cycle in range(n):
            print(f"cycle {cycle}:")
            staged = f"{work}/staged_{cycle}"
            docs = read_warc_documents(spark, ingest_dir)
            t("warc read+extract (noop)", lambda: docs.write.mode("overwrite").format("noop").save())
            docs2 = read_warc_documents(spark, ingest_dir)
            t("warc read+extract+stage parquet", lambda: docs2.write.mode("overwrite").parquet(f"{staged}/documents.parquet"))
            t("corpus_build(staged)", lambda: corpus_build(spark, staged, f"{work}/corpus_{cycle}"))
    finally:
        shutil.rmtree(ingest_dir, ignore_errors=True)


def profile_build_sf(spark, n):
    """corpus_build phases over the sf0.1 documents table itself."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import corpus_build
    from cdc_historical_warehouse_platform_spark.plans.datapipe_queries import (
        corpus_keep_decisions_unsorted,
    )

    for cycle in range(n):
        print(f"cycle {cycle}:")
        d, _ = t("decisions pipeline (noop)", lambda: corpus_keep_decisions_unsorted(spark, SF_DIR).write.mode("overwrite").format("noop").save())
        out = tempfile.mkdtemp(prefix="prof_build_")
        try:
            t("corpus_build(sf0.1) full", lambda: corpus_build(spark, SF_DIR, out))
        finally:
            shutil.rmtree(out, ignore_errors=True)


def profile_tt(spark, n):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.plans.reference_queries import (
        _DIM_COLS,
        load_table,
        orders_as_changes,
    )
    from cdc_historical_warehouse_platform_spark.sources.dim_store import SCD2DimStore

    for cycle in range(n):
        print(f"cycle {cycle}:")
        orders = load_table(spark, SF_DIR, "orders")
        changes = orders_as_changes(orders).localCheckpoint(eager=False)
        b1 = changes.filter(F.col("operation_type") == "INSERT")
        b2 = changes.filter(F.col("operation_type") == "UPDATE")
        d = tempfile.mkdtemp(prefix="prof_tt_")
        try:
            store = SCD2DimStore(d)
            t("apply_batch b1", lambda: store.apply_batch(spark, b1, txn_id="tt_b1", batch_id="b1"))
            t("apply_batch b2", lambda: store.apply_batch(spark, b2, txn_id="tt_b2", batch_id="b2"))
            past, _ = t("read(version=0)", lambda: store.read(spark, version=0))
            t("orderBy+pin (noop)", lambda: past.select(
                *[F.col(c).cast("double").alias(c) if c == "unit_price" else F.col(c) for c in _DIM_COLS]
            ).orderBy("order_key", "valid_from").localCheckpoint(eager=True))
            # file counts
            for sub in sorted(Path(d).rglob("*.parquet")):
                pass
            import collections
            cnt = collections.Counter()
            sz = collections.Counter()
            for p in Path(d).rglob("*.parquet"):
                rel = str(p.relative_to(d)).split("/")[0:2]
                key = "/".join(rel[:-1]) if len(rel) > 1 else rel[0]
                cnt[key] += 1
                sz[key] += p.stat().st_size
            for k in sorted(cnt):
                print(f"    files {k}: {cnt[k]} ({sz[k]/1e6:.1f} MB)")
        finally:
            shutil.rmtree(d, ignore_errors=True)


def main():
    which = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    {"ingest": profile_ingest, "tt": profile_tt, "build": profile_build_sf}[which](spark, n)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure the corpus-sized pins' storage footprint and the
DISK_ONLY-vs-default trade at the sf1 (10x) rehearsal fixture — r13
verdict task #4 evidence. For each row: timed noop run, then the peak
persisted-RDD footprint (memory + disk bytes) sampled from
getRDDStorageInfo right after the run (pins are query-scoped, so the
blocks are still registered until the context cleaner GCs them).

Usage: python scripts/ab_pin_storage.py [sf_dir] [n]
Set SPARK_GRAFT_CORPUS_PIN_STORAGE before launch to test a level
(the env is read per pin call, so the script flips it in-process).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ROWS = ["dedup_keep_list", "corpus_dsir_weights", "text_tfidf_keywords"]


def rdd_storage(sc) -> tuple[int, int]:
    mem = disk = 0
    for info in sc._jsc.sc().getRDDStorageInfo():
        mem += info.memSize()
        disk += info.diskSize()
    return mem, disk


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entry
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    samples: dict[tuple, list] = {}
    for i in range(n):
        for level in (
            [None, "DISK_ONLY"] if i % 2 == 0 else ["DISK_ONLY", None]
        ):
            if level:
                os.environ["SPARK_GRAFT_CORPUS_PIN_STORAGE"] = level
            else:
                os.environ.pop("SPARK_GRAFT_CORPUS_PIN_STORAGE", None)
            for row in ROWS:
                os.sync()
                t0 = time.perf_counter()
                qs[row](spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = round(time.perf_counter() - t0, 3)
                mem, disk = rdd_storage(sc)
                samples.setdefault((row, level or "default"), []).append(
                    (dt, round(mem / 1e6, 1), round(disk / 1e6, 1))
                )
    for (row, level), vals in sorted(samples.items()):
        times = [v[0] for v in vals]
        print(
            f"{row} [{level}]: min={min(times)} times={times} "
            f"pin_mem_MB={[v[1] for v in vals]} pin_disk_MB={[v[2] for v in vals]}"
        )


if __name__ == "__main__":
    main()

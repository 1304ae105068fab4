#!/usr/bin/env python
"""A/B the `_settle` barrier's effect on the ann_pq_bulk_probe bench row
(r12, verdict task #1).

The row grew monotonically across three driver artifacts (3.05 -> 3.55
-> 4.80 s) while its plan stayed byte-identical and guarded
(tests/test_pq.py plan guard). The r11 verdict's hypothesis: the
`_settle` barrier (os.sync() + System.gc(), added to this row in r11,
bench.py:509) re-chills the JIT'd ADC-fold codegen between samples, so
the "warm" sample measures a permanently colder JVM.

Protocols, interleaved in rotated order (5 rounds x 4 protocols), after
an untimed 2-probe warm-up:
  full  = os.sync() + System.gc() before the timed probe (r11 bench)
  sync  = os.sync() only
  gc    = System.gc() only
  none  = no barrier (the r9/r10 bench protocol for this row)

Rotation controls order effects (the r11 A/B showed run order inverts
apparent deltas); interleaving controls slow host drift. Prints one
JSON line with all samples + per-protocol min/median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.session import get_spark
    from cdc_historical_warehouse_platform_spark.sources.ann_index import IVFIndex

    spark = get_spark(
        app_name="ab-pq-settle",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    pq_dir = tempfile.mkdtemp(prefix="ab_pq_")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pq_index = IVFIndex.build(
        emb, pq_dir + "/pq", n_lists=16, quantize="pq", pq_m=8, pq_k=16
    )
    queries_df = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def probe() -> float:
        t0 = time.perf_counter()
        pq_index.probe(
            spark, queries_df, k=10, n_probes=2, broadcast_probe=False
        ).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    def barrier(proto: str) -> None:
        if proto in ("full", "sync"):
            os.sync()
        if proto in ("full", "gc"):
            spark.sparkContext._jvm.System.gc()

    # untimed warm-up: compile the plan, warm the JIT
    probe()
    probe()

    protos = ["full", "sync", "gc", "none"]
    samples: dict[str, list[float]] = {p: [] for p in protos}
    order_log = []
    for rnd in range(5):
        order = protos[rnd % 4 :] + protos[: rnd % 4]
        for p in order:
            barrier(p)
            t = probe()
            samples[p].append(t)
            order_log.append([p, t])

    out = {
        "samples": samples,
        "order": order_log,
        "min": {p: min(v) for p, v in samples.items()},
        "median": {p: round(statistics.median(v), 3) for p, v in samples.items()},
        "loadavg": os.getloadavg(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

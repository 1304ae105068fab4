#!/usr/bin/env python
"""Core-scaling check at the sf1 (10x) rehearsal fixture — r13 verdict
task #8: the sf0.1 8-vs-32-core ratios measured fixed overheads, not
the engine; at 10x data the compute term should dominate and the
heavy shuffle/scan-bound rows should approach the core ratio.

One invocation runs ONE core count (the session master is fixed at
process start — exactly the driver's own methodology): set
SPARK_GRAFT_CPUS and run. Prints one JSON line with per-row warm mins.

Usage: SPARK_GRAFT_CPUS=32 python scripts/scaling_cores_sf1.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ROWS = [
    "tpch_q9_product_profit",
    "agg_pricing_summary",
    "corpus_exact_substring_spans",
    "dedup_minhash_lsh",
    "corpus_dsir_weights",
    "text_tfidf_keywords",
    "corpus_keep_decisions",
    "agg_distinct_sketch_rollup",
]
WARM = 3


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    import __spark_entry__ as entry
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out = {}
    for row in ROWS:
        samples = []
        for _ in range(WARM + 1):
            os.sync()
            t0 = time.perf_counter()
            qs[row](spark, sf1).write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[row] = {"min_warm": min(samples[1:]), "samples": samples}
    print(
        json.dumps(
            {
                "metric": "sf1_core_scaling_leg",
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "sf_dir": sf1,
                "rows": out,
            }
        )
    )


if __name__ == "__main__":
    main()

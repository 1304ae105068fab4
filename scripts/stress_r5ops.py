#!/usr/bin/env python
"""Stress the r5 operator additions far beyond the driver testdata:

1. **Mergeable HLL sketches** (operators/sketches.py): N rows across G
   groups arrive as W waves; per-wave sketches are merged into state
   and the final estimates are checked against exact COUNT(DISTINCT)
   (max ≤5% / mean ≤2% relative error — lgk=12 gives ~1.6% stderr per
   group, so the max over G groups sits near 3 sigma) and against a
   from-scratch single build (≤5% divergence). Reports wall time for
   build+merge vs the exact recompute and the max observed errors.
   The state stays one ~2^12-byte sketch per group regardless of N.

2. **Schema-drift alignment** (operators/schema_drift.py): an N-row
   drifted frame (missing column, extra column, int→long widening,
   long→int narrowing under try_cast) aligns in one Project — asserts
   the plan contains no extra exchange/pass and times the full scan.

Usage: python scripts/stress_r5ops.py [rows] [groups] [waves]

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
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    waves = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cdc_historical_warehouse_platform_spark.operators.schema_drift import align_to_schema
    from cdc_historical_warehouse_platform_spark.operators.sketches import (
        group_distinct_sketch,
        merge_sketch_state,
        with_distinct_estimate,
    )
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(
        app_name="stress-r5ops",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out: dict = {"rows": rows, "groups": groups, "waves": waves}

    # ---- 1. sketch maintenance ------------------------------------
    # ~rows/2 distinct values per group-overlapping id space so waves
    # genuinely overlap (union < sum of per-wave distincts)
    base = spark.range(rows).select(
        (F.col("id") % waves).alias("wave"),
        (F.col("id") % groups).alias("grp"),
        ((F.col("id") * 2654435761) % (rows // 2)).cast("string").alias("v"),
    ).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    state = None
    for w in range(waves):
        delta = group_distinct_sketch(
            base.filter(F.col("wave") == w), ["grp"], "v"
        )
        state = delta if state is None else merge_sketch_state(state, delta, ["grp"])
        state = state.localCheckpoint(eager=True)  # persisted-state shape
    est = {
        r["grp"]: r["distinct_count"]
        for r in with_distinct_estimate(state).collect()
    }
    out["sketch_maintain_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    exact = {
        r["grp"]: r["n"]
        for r in base.groupBy("grp")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }
    out["exact_recompute_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    scratch = {
        r["grp"]: r["distinct_count"]
        for r in with_distinct_estimate(
            group_distinct_sketch(base, ["grp"], "v")
        ).collect()
    }
    out["sketch_scratch_sec"] = round(time.perf_counter() - t0, 2)

    # lgk=12 -> ~1.6% stderr per group; the MAX over G groups sits
    # near 3 sigma, so the hard gate is 5% on max and 2% on mean
    errs = [abs(est[g] - exact[g]) / exact[g] for g in exact]
    divs = [abs(est[g] - scratch[g]) / max(scratch[g], 1) for g in scratch]
    out["max_rel_err_vs_exact"] = round(max(errs), 4)
    out["mean_rel_err_vs_exact"] = round(sum(errs) / len(errs), 4)
    out["max_divergence_vs_scratch"] = round(max(divs), 4)
    assert max(errs) < 0.05, f"sketch max error {max(errs)} out of envelope"
    assert sum(errs) / len(errs) < 0.02, "sketch mean error out of envelope"
    assert max(divs) < 0.05, f"union divergence {max(divs)} out of envelope"

    # ---- 2. drift alignment is one Project ------------------------
    drifted = spark.range(rows).select(
        F.col("id").cast("int").alias("a"),  # int -> long widening
        F.col("id").alias("b"),              # long -> int narrowing (try_cast)
        F.lit("x").alias("extra_col"),       # dropped
    )
    target = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.IntegerType()),
            T.StructField("gone", T.DoubleType()),
        ]
    )
    aligned, report = align_to_schema(drifted, target, allow_narrowing=True)
    plan = aligned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "alignment must not shuffle"
    t0 = time.perf_counter()
    n_nulled = aligned.filter(F.col("b").isNull()).count()
    out["drift_align_scan_sec"] = round(time.perf_counter() - t0, 2)
    out["drift_nulled_rows"] = n_nulled
    out["drift_report"] = {k: len(v) for k, v in report.items()}
    assert n_nulled == max(0, rows - 2**31 + 1) or n_nulled == max(
        0, rows - 2**31
    ), n_nulled

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

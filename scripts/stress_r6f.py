#!/usr/bin/env python
"""Stress join-view IVM (operators/ivm_join.py) at state sizes far
beyond the driver testdata: N-row states on both sides, a sequence of
micro-batches of two-sided inserts/retractions/updates, maintained
view vs from-scratch recompute after the full sequence.

Asserts multiset equality (count + order-insensitive xxhash digest)
and reports per-batch delta-derivation wall time — the claim under
test is that a batch's view delta costs two broadcast probes of the
states (no state shuffle, no O(view) consolidation on the hot path).

Usage: python scripts/stress_r6f.py [n_rows] [batch] [n_batches]

Evidence tooling, not a pytest (runs minutes at large N).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.ivm_join import (
    MULT,
    as_inserts,
    consolidate,
    join_view_delta,
    recompute_join_view,
)
from cdc_historical_warehouse_platform_spark.session import get_spark


def _digest(df):
    cols = sorted(df.columns)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark(
        app_name="stress-r6f", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    # A: n_rows facts over n_rows/10 keys; B: one attribute row per key
    a = as_inserts(
        spark.range(n_rows).select(
            (F.col("id") % (n_rows // 10)).alias("k"),
            F.col("id").alias("fact_id"),
            (F.col("id") % 97).alias("av"),
        )
    ).localCheckpoint(eager=True)
    b = as_inserts(
        spark.range(n_rows // 10).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("bv")
        )
    ).localCheckpoint(eager=True)
    view_segments = [recompute_join_view(a, b, ["k"]).localCheckpoint(eager=True)]
    a_base, b_base = a, b
    a_deltas: list = []
    b_deltas: list = []

    def _union(base, deltas):
        out = base
        for d in deltas:
            out = out.unionByName(d)
        return out

    times = []
    for i in range(n_batches):
        # two-sided batch: new facts on fresh + existing keys, and an
        # UPDATE (retract+insert) of `batch` B attribute rows
        d_a = as_inserts(
            spark.range(batch).select(
                ((F.col("id") + i * batch) % (n_rows // 10)).alias("k"),
                (F.col("id") + n_rows + i * batch).alias("fact_id"),
                F.lit(7 + i).cast("long").alias("av"),
            )
        ).localCheckpoint(eager=True)
        a_state = _union(a_base, a_deltas)
        b_state = _union(b_base, b_deltas)
        upd_keys = spark.range(i * batch, (i + 1) * batch).select(
            (F.col("id") % (n_rows // 10)).alias("k")
        ).distinct()
        old_b = consolidate(b_state.join(F.broadcast(upd_keys), "k", "left_semi"))
        d_b = (
            old_b.withColumn(MULT, -F.col(MULT))
            .unionByName(
                old_b.select("k", (F.col("bv") + 100).alias("bv"), MULT)
            )
            .localCheckpoint(eager=True)
        )
        # the timed section is ONLY the operator: derive + pin the
        # batch's view delta. The states and the view are LSM — base +
        # checkpointed delta segments — exactly the storage pattern the
        # module docstring prescribes; nothing state-sized is ever
        # rewritten per batch.
        t0 = time.perf_counter()
        dv = join_view_delta(a_state, b_state, d_a, d_b, ["k"]).localCheckpoint(
            eager=True
        )
        times.append(time.perf_counter() - t0)
        view_segments.append(dv)
        a_deltas.append(d_a)
        b_deltas.append(d_b)

    t0 = time.perf_counter()
    maintained = _digest(consolidate(_union(view_segments[0], view_segments[1:])))
    recomputed = _digest(
        recompute_join_view(_union(a_base, a_deltas), _union(b_base, b_deltas), ["k"])
    )
    t_verify = time.perf_counter() - t0
    assert maintained == recomputed, (maintained, recomputed)

    print(
        json.dumps(
            {
                "rows": n_rows,
                "batch": batch,
                "batches": n_batches,
                "view_rows": maintained[0],
                "mean_delta_s": round(sum(times) / len(times), 2),
                "verify_s": round(t_verify, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

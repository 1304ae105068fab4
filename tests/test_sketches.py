"""Mergeable HLL distinct-count sketches (operators/sketches.py).

The registered query `agg_distinct_sketch_rollup` is rows-only at the
driver gate (estimates are engine-specific), so everything checkable
is pinned here Spark-vs-Spark: the maintenance invariant (incremental
merge tracks from-scratch within the documented 2% envelope —
DataSketches unions drop the HIP estimator, so bit-equality is not
the contract), merge-order insensitivity, replay idempotence, the
error envelope vs exact COUNT(DISTINCT), NULL group handling, the
bounded-state property, and the batch/streaming store-maintenance
seam (pipeline/loader.maintain_distinct_sketch_store).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.sketches import (
    SKETCH_COL,
    group_distinct_sketch,
    merge_sketch_state,
    with_distinct_estimate,
)


def _estimates(state):
    return {
        tuple(r[c] for c in state.columns if c not in (SKETCH_COL, "distinct_count")): r[
            "distinct_count"
        ]
        for r in with_distinct_estimate(state).collect()
    }


@pytest.fixture(scope="module")
def batches(spark):
    # 3 waves, overlapping values across waves (so union ≠ sum) and a
    # NULL group (one ordinary group, per GROUP BY semantics)
    rows = []
    for i in range(3000):
        g = [None, "a", "b", "c"][i % 4]
        rows.append((i % 3, g, f"cust{i % 457}"))
    df = spark.createDataFrame(rows, ["wave", "grp", "cust"])
    return [df.filter(F.col("wave") == w).drop("wave") for w in range(3)]


def _close(a: dict, b: dict, rel: float) -> bool:
    return set(a) == set(b) and all(
        abs(a[k] - b[k]) <= rel * max(b[k], 1) for k in b
    )


def test_incremental_tracks_from_scratch(spark, batches):
    # DataSketches unions drop the HIP estimator, so a merged state's
    # estimate is NOT bit-equal to a direct build over the union — the
    # maintenance invariant is the documented tight envelope: same
    # group set, estimates within 2% of the from-scratch build (both
    # within 5% of exact, pinned below).
    b1, b2, b3 = batches
    full = group_distinct_sketch(b1.unionByName(b2).unionByName(b3), ["grp"], "cust")
    inc = group_distinct_sketch(b1, ["grp"], "cust")
    inc = merge_sketch_state(inc, group_distinct_sketch(b2, ["grp"], "cust"), ["grp"])
    inc = merge_sketch_state(inc, group_distinct_sketch(b3, ["grp"], "cust"), ["grp"])
    assert _close(_estimates(inc), _estimates(full), rel=0.02)


def test_merge_order_insensitive_within_envelope(spark, batches):
    b1, b2, b3 = batches
    s1 = group_distinct_sketch(b1, ["grp"], "cust")
    s2 = group_distinct_sketch(b2, ["grp"], "cust")
    s3 = group_distinct_sketch(b3, ["grp"], "cust")
    left = merge_sketch_state(merge_sketch_state(s1, s2, ["grp"]), s3, ["grp"])
    right = merge_sketch_state(s1, merge_sketch_state(s2, s3, ["grp"]), ["grp"])
    rev = merge_sketch_state(merge_sketch_state(s3, s1, ["grp"]), s2, ["grp"])
    el, er, ev = _estimates(left), _estimates(right), _estimates(rev)
    assert _close(el, er, rel=0.02) and _close(el, ev, rel=0.02)


def test_replay_is_idempotent(spark, batches):
    b1, b2, _ = batches
    s1 = group_distinct_sketch(b1, ["grp"], "cust")
    d2 = group_distinct_sketch(b2, ["grp"], "cust")
    once = merge_sketch_state(s1, d2, ["grp"])
    twice = merge_sketch_state(once, d2, ["grp"])
    assert _estimates(twice) == _estimates(once)


def test_error_envelope_and_null_group(spark, batches):
    b1, b2, b3 = batches
    union = b1.unionByName(b2).unionByName(b3)
    est = _estimates(group_distinct_sketch(union, ["grp"], "cust"))
    exact = {
        r["grp"]: r["n"]
        for r in union.groupBy("grp")
        .agg(F.count_distinct("cust").alias("n"))
        .collect()
    }
    assert set(g for (g,) in est) == set(exact)  # NULL group present
    for (g,), e in est.items():
        assert abs(e - exact[g]) / exact[g] < 0.05, (g, e, exact[g])


def test_one_sided_groups_carry_through(spark):
    a = spark.createDataFrame([("x", "1"), ("x", "2")], ["grp", "v"])
    b = spark.createDataFrame([("y", "9")], ["grp", "v"])
    merged = merge_sketch_state(
        group_distinct_sketch(a, ["grp"], "v"),
        group_distinct_sketch(b, ["grp"], "v"),
        ["grp"],
    )
    assert _estimates(merged) == {("x",): 2, ("y",): 1}


def test_state_is_bounded(spark):
    # sketch bytes must not grow with distinct count (fixed registers)
    small = spark.range(100).select(F.lit("g").alias("grp"), F.col("id").cast("string").alias("v"))
    big = spark.range(200_000).select(F.lit("g").alias("grp"), F.col("id").cast("string").alias("v"))
    sz = lambda df: group_distinct_sketch(df, ["grp"], "v").select(
        F.octet_length(SKETCH_COL).alias("n")
    ).collect()[0]["n"]
    assert sz(big) <= 16 * sz(small)  # ~2^lgk bytes, not O(distinct)


def test_sketch_store_maintenance_batch_and_stream(tmp_path, spark):
    """The shared maintain_distinct_sketch_store seam: streaming
    foreachBatch keeps distinct-products-ever-per-customer within the
    HLL envelope of the exact count over all observed non-DELETE
    changes, replays are no-ops, and DELETEs add no observation."""
    from cdc_historical_warehouse_platform_spark.sources.dim_store import SCD2DimStore
    from cdc_historical_warehouse_platform_spark.sources.tables import VersionedTable
    from cdc_historical_warehouse_platform_spark.sources.change_batches import write_change_batch
    from cdc_historical_warehouse_platform_spark.streaming.pipeline import start_scd2_stream
    from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA
    from tests.conftest import make_change

    import datetime as dt

    def ts(m):
        return dt.datetime(2026, 5, 1, 8, 0, 0) + dt.timedelta(minutes=m)

    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    dim = SCD2DimStore(tmp_path / "dim")
    sketches = VersionedTable(tmp_path / "sketches")

    b1 = [
        make_change(i, "INSERT", ts(i), customer_id=100 + (i % 2), product_id=i)
        for i in range(1, 9)
    ]
    write_change_batch(
        spark.createDataFrame(b1, CHANGE_SCHEMA), cdc_dir, extracted_at=ts(9), fmt="jsonl"
    )
    q = start_scd2_stream(
        spark, cdc_dir, dim, tmp_path / "ckpt", available_now=True, sketch_store=sketches
    )
    q.awaitTermination(120)

    # second epoch: repeat product (no new distinct), new product, DELETE
    b2 = [
        make_change(1, "UPDATE", ts(10), customer_id=101, product_id=1),
        make_change(9, "INSERT", ts(11), customer_id=100, product_id=99),
        make_change(2, "DELETE", ts(12), customer_id=100, product_id=777),
    ]
    write_change_batch(
        spark.createDataFrame(b2, CHANGE_SCHEMA), cdc_dir, extracted_at=ts(13), fmt="jsonl"
    )
    q2 = start_scd2_stream(
        spark, cdc_dir, dim, tmp_path / "ckpt", available_now=True, sketch_store=sketches
    )
    q2.awaitTermination(120)

    est = _estimates(sketches.read(spark))
    # exact ever-seen distinct products (DELETE row excluded):
    # cust 100: products {2,4,6,8,99} = 5; cust 101: {1,3,5,7} u {1} = 4
    assert est == {(100,): 5, (101,): 4}  # tiny counts -> HLL exact

    # no-new-data restart: store version does not advance
    sv = sketches.version()
    q3 = start_scd2_stream(
        spark, cdc_dir, dim, tmp_path / "ckpt", available_now=True, sketch_store=sketches
    )
    q3.awaitTermination(120)
    assert sketches.version() == sv


def test_merge_tolerates_mixed_lgk(spark):
    """r6 fix (ADVICE): state persisted at one lgk merges with deltas
    built at another (hll_union allowDifferentLgConfigK) instead of
    failing at runtime after a DEFAULT_LGK change."""
    a = spark.range(0, 1000).withColumn("g", F.lit("x"))
    b = spark.range(500, 1500).withColumn("g", F.lit("x"))
    state = group_distinct_sketch(a, ["g"], "id", lgk=12)
    delta = group_distinct_sketch(b, ["g"], "id", lgk=10)
    merged = with_distinct_estimate(merge_sketch_state(state, delta, ["g"]))
    est = merged.collect()[0]["distinct_count"]
    assert abs(est - 1500) / 1500 < 0.1

"""Interval (range) join — operators/rangejoin.py.

Pins: (1) exact equivalence with the naive cross-join-filter on data
dense around bucket and window boundaries, (2) inclusive bounds at
microsecond precision, (3) the plan is a hash equi-join on the bin —
no BroadcastNestedLoopJoin / CartesianProduct."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.rangejoin import interval_join

T0 = dt.datetime(2026, 5, 1, 0, 0, 0)


def _frames(spark):
    # left rows straddle bucket boundaries; right rows sit exactly on
    # window edges (inclusive-bound probes) and just outside them
    left = spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s, microseconds=us))
         for i, (s, us) in enumerate([(0, 0), (599, 999999), (600, 0), (1234, 500000)])],
        ["l_id", "l_ts"],
    )
    right = spark.createDataFrame(
        [(100 + j, T0 + dt.timedelta(seconds=s, microseconds=us))
         for j, (s, us) in enumerate(
             [(0, 0), (300, 0), (300, 1), (-300, 0), (-300, -1),
              (899, 999999), (900, 0), (900, 1), (1534, 500000), (1534, 500001)]
         )],
        ["r_id", "r_ts"],
    )
    return left, right


def _naive(left, right, lo, hi):
    return (
        left.crossJoin(right)
        .filter(
            F.col("r_ts").between(
                F.col("l_ts") + F.expr(f"INTERVAL {lo} SECONDS"),
                F.col("l_ts") + F.expr(f"INTERVAL {hi} SECONDS"),
            )
        )
        .select("l_id", "r_id")
    )


def _pairs(df):
    return sorted((r["l_id"], r["r_id"]) for r in df.collect())


def test_matches_naive_on_boundary_dense_data(spark):
    left, right = _frames(spark)
    for lo, hi, width in [(-300, 300, None), (-300, 300, 60), (0, 600, 7), (-1, 1, None)]:
        got = _pairs(
            interval_join(left, right, "l_ts", "r_ts", lo, hi, bucket_seconds=width)
            .select("l_id", "r_id")
        )
        want = _pairs(_naive(left, right, lo, hi))
        assert got == want, f"bounds [{lo},{hi}] width={width}: {got} != {want}"
    assert _pairs(_naive(left, right, -300, 300)), "fixture should produce matches"


def test_inclusive_bounds_at_microsecond_precision(spark):
    left = spark.createDataFrame([(1, T0)], ["l_id", "l_ts"])
    right = spark.createDataFrame(
        [
            (1, T0 + dt.timedelta(seconds=300)),                      # exactly upper
            (2, T0 + dt.timedelta(seconds=300, microseconds=1)),      # 1 us past
            (3, T0 - dt.timedelta(seconds=300)),                      # exactly lower
            (4, T0 - dt.timedelta(seconds=300, microseconds=1)),      # 1 us before
        ],
        ["r_id", "r_ts"],
    )
    got = _pairs(interval_join(left, right, "l_ts", "r_ts", -300, 300).select("l_id", "r_id"))
    assert got == [(1, 1), (1, 3)]


def test_plan_is_bin_equi_join(spark):
    left, right = _frames(spark)
    plan = (
        interval_join(left, right, "l_ts", "r_ts", -300, 300)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_extra_condition_composes(spark):
    left, right = _frames(spark)
    only_even = interval_join(
        left, right, "l_ts", "r_ts", -300, 300,
        extra_condition=F.col("r_id") % 2 == 0,
    )
    assert all(r["r_id"] % 2 == 0 for r in only_even.collect())

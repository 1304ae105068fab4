"""As-of join semantics (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.asof import asof_join

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def ts(m):
    return T0 + dt.timedelta(minutes=m)


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "l1"), (1, ts(30), "l2"), (2, ts(5), "l3"), (3, ts(1), "l4")],
        ["k", "lts", "lval"],
    )
    right = spark.createDataFrame(
        [(1, ts(0), "r0"), (1, ts(10), "r10"), (1, ts(25), "r25"), (2, ts(50), "r50")],
        ["k", "rts", "rval"],
    )
    return left, right


def test_asof_basic(spark):
    left, right = _fixture(spark)
    out = {
        (r["k"], r["lval"]): r["asof_rval"]
        for r in asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    }
    assert out[(1, "l1")] == "r10"  # exact match allowed
    assert out[(1, "l2")] == "r25"
    assert out[(2, "l3")] is None  # right row is in the future
    assert out[(3, "l4")] is None  # no right rows for key


def test_asof_strict(spark):
    left, right = _fixture(spark)
    out = {
        (r["k"], r["lval"]): r["asof_rval"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts", allow_exact_matches=False
        ).collect()
    }
    assert out[(1, "l1")] == "r0"  # exact match excluded -> previous


def test_asof_tolerance(spark):
    left, right = _fixture(spark)
    out = {
        (r["k"], r["lval"]): r["asof_rval"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts", tolerance="5 MINUTES"
        ).collect()
    }
    assert out[(1, "l1")] == "r10"  # 0 min stale, within tolerance
    assert out[(1, "l2")] == "r25"  # 5 min stale, boundary included
    assert out[(2, "l3")] is None

"""As-of join semantics (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

import pytest
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


def test_asof_directions_match_pandas_merge_asof(spark):
    """backward / forward / nearest pinned against the INDEPENDENT
    pandas merge_asof implementation over the real events fixture
    (errors x clicks per user) — exact matches allowed, no tolerance."""
    import pandas as pd

    from tests.conftest import SF_DIR

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    ep = errors.toPandas().sort_values("ts").reset_index(drop=True)
    cp = clicks.toPandas().sort_values("c_ts").reset_index(drop=True)
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.event_id: (r.asof_c_ts, r.asof_c_id)
            for r in asof_join(
                errors,
                clicks,
                on="user_id",
                left_ts="ts",
                right_ts="c_ts",
                right_payload=["c_id"],
                direction=direction,
            ).collect()
        }
        want = pd.merge_asof(
            ep, cp, left_on="ts", right_on="c_ts", by="user_id", direction=direction
        )
        for _, r in want.iterrows():
            g_ts, g_id = got[r.event_id]
            if pd.isna(r.c_ts):
                assert g_ts is None and g_id is None
            else:
                assert g_ts == r.c_ts.to_pydatetime()
                assert g_id == r.c_id


def test_asof_nearest_tie_resolves_backward(spark):
    import datetime as dt

    T = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([(1, T(10), "l")], "k long, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, T(7), "back"), (1, T(13), "fwd")], "k long, rts timestamp, rval string"
    )
    [row] = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", direction="nearest"
    ).collect()
    assert row["asof_rval"] == "back"  # equal 3s distance -> backward


def test_asof_rejects_unknown_direction(spark):
    left = spark.range(1).selectExpr("id k", "current_timestamp() lts")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, on="k", left_ts="lts", right_ts="lts", direction="upward")

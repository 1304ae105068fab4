"""Golden sample scenario (S6 + FIXTURES.md §2.1): the reference's
worked CSV example — source orders → CDC changes → SCD2 warehouse
output — replayed through this engine with CSV source/sink round-trips
(README.md:299-475 shape; data synthesized, not copied)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.scd2 import empty_dim, scd2_merge
from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA, ORDERS_SCHEMA
from tests.conftest import make_change
from tests.test_scd2 import assert_invariants

T0 = dt.datetime(2026, 2, 1, 20, 0, 0)


def ts(m):
    return T0 + dt.timedelta(minutes=m)


def test_golden_csv_scenario(tmp_path, spark):
    # --- source CSV (5 orders, the sample_data/source_orders.csv shape)
    src_df = spark.createDataFrame(
        [tuple(make_change(i, "INSERT", ts(i)).values())[:10] for i in range(1, 6)],
        ORDERS_SCHEMA,
    )
    csv_dir = tmp_path / "source_orders_csv"
    src_df.write.option("header", True).csv(str(csv_dir))

    # read back with explicit schema (S6: csv source)
    back = spark.read.option("header", True).schema(ORDERS_SCHEMA).csv(str(csv_dir))
    assert back.count() == 5
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in ORDERS_SCHEMA.fields
    ]

    # --- batch 1: the 5 inserts; batch 2: one update of key 1
    b1 = spark.createDataFrame(
        [make_change(i, "INSERT", ts(i)) for i in range(1, 6)], CHANGE_SCHEMA
    )
    b2 = spark.createDataFrame(
        [make_change(1, "UPDATE", ts(60), quantity=9, status="shipped")], CHANGE_SCHEMA
    )
    dim = scd2_merge(empty_dim(spark), b1, "golden_b1").localCheckpoint(eager=True)
    dim = scd2_merge(dim, b2, "golden_b2")

    rows = dim.collect()
    assert_invariants(rows)
    # 5 inserts + 1 update => 6 rows: 4 untouched current + key 1's
    # expired v1 + current v2 (README.md:299-475 worked example shape)
    assert len(rows) == 6
    key1 = sorted(
        [r for r in rows if r["order_key"] == 1], key=lambda r: r["valid_from"]
    )
    assert len(key1) == 2
    assert not key1[0]["is_current"] and key1[0]["valid_to"] == ts(60)
    assert key1[1]["is_current"] and key1[1]["quantity"] == 9

    # --- warehouse CSV sink round-trip (warehouse_output.csv shape)
    out_csv = tmp_path / "warehouse_output_csv"
    dim.select(
        "order_key",
        "quantity",
        F.col("unit_price").cast("string").alias("unit_price"),
        "order_status",
        "valid_from",
        "valid_to",
        "is_current",
    ).write.option("header", True).csv(str(out_csv))
    out_back = spark.read.option("header", True).csv(str(out_csv))
    assert out_back.count() == 6
    assert out_back.filter(F.col("is_current") == "true").count() == 5

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from cdc_historical_warehouse_platform_spark.session import get_spark
from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="cdc-historical-warehouse-platform-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s


def make_change(
    id: int,
    op: str,
    ts: dt.datetime,
    quantity: int = 1,
    unit_price: str = "10.00",
    status: str = "pending",
    customer_id: int = 100,
    product_id: int = 200,
    order_date: dt.datetime | None = None,
):
    """One CDC change record shaped like FIXTURES.md §1.2 (typed form)."""
    price = Decimal(unit_price)
    total = price * quantity
    od = order_date or dt.datetime(2026, 2, 1, 20, 0, 0)
    return {
        "id": id,
        "customer_id": customer_id,
        "product_id": product_id,
        "quantity": quantity,
        "unit_price": price,
        "total_amount": total,
        "order_status": status,
        "order_date": od,
        "last_updated": ts,
        "created_at": od,
        "operation_type": op,
        "cdc_timestamp": ts,
        "extracted_at": ts,
    }


@pytest.fixture
def change_df(spark):
    def _make(rows):
        return spark.createDataFrame(rows, CHANGE_SCHEMA)

    return _make

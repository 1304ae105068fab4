"""Deterministic CDC fixtures over the driver testdata.

The reference's change records are born from a live Postgres `orders`
table (FIXTURES.md §1.2). The driver harness instead provides immutable
TPC-H-ish parquet, so we derive a *deterministic* change stream from the
testdata ``orders`` table — every derivation below is expressible in
both Spark and ANSI SQL so the DuckDB oracle can replay it exactly.

Scenario (mirrors the golden sample: inserts + an update wave):
- batch 1: every order arrives as INSERT at ``o_orderdate``.
- batch 2: every order with ``o_orderstatus = 'F'`` is UPDATEd 30 days
  later (quantity bumps, status flips to 'completed').

This produces per key: 1 current version for non-'F' orders, and
(1 expired + 1 current) for 'F' orders — the same shape as the
reference's golden warehouse_output.csv (5 inserts + 1 update ⇒ one
2-version key; README.md:299-475) at testdata scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["orders_as_changes", "ORDERS_AS_CHANGES_SQL"]


def _payload(orders: DataFrame, *, updated: bool) -> DataFrame:
    """Map a testdata `orders` row into the reference change-record
    payload (FIXTURES.md §1.2) with arithmetic DuckDB can replicate."""
    qty = (F.col("o_orderkey") % 10 + (2 if updated else 1)).cast("int")
    price = F.round(F.col("o_totalprice"), 2).cast("decimal(10,2)")
    status = F.lit("completed") if updated else F.col("o_orderstatus")
    ts = (
        F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        if updated
        else F.col("o_orderdate")
    )
    return orders.select(
        F.col("o_orderkey").alias("id"),
        # BIGINT, not the demo DDL's INT (r12): the sf1 scaling
        # rehearsal drives replica-shifted custkeys past 2^31, where an
        # INT cast CRASHES under ANSI mode — registry fixtures must run
        # at any SF. The pipeline schemas (schemas.py) keep the
        # reference's INTEGER DDL; this fixture is testdata-scale-bound.
        F.col("o_custkey").cast("bigint").alias("customer_id"),
        (F.col("o_orderkey") % 1000).cast("int").alias("product_id"),
        qty.alias("quantity"),
        price.alias("unit_price"),
        (price * qty).cast("decimal(10,2)").alias("total_amount"),
        status.alias("order_status"),
        F.col("o_orderdate").cast("timestamp").alias("order_date"),
        ts.cast("timestamp").alias("last_updated"),
        F.col("o_orderdate").cast("timestamp").alias("created_at"),
        F.lit("UPDATE" if updated else "INSERT").alias("operation_type"),
        ts.cast("timestamp").alias("cdc_timestamp"),
        ts.cast("timestamp").alias("extracted_at"),
    )


def orders_as_changes(orders: DataFrame) -> DataFrame:
    """The two-batch deterministic change log (see module docstring)."""
    inserts = _payload(orders, updated=False)
    updates = _payload(orders.filter(F.col("o_orderstatus") == "F"), updated=True)
    return inserts.unionByName(updates)


# The same derivation as ANSI SQL for the DuckDB oracle. Keep in exact
# lockstep with orders_as_changes().
ORDERS_AS_CHANGES_SQL = """
    SELECT o_orderkey AS id,
           CAST(o_custkey AS BIGINT) AS customer_id,
           CAST(o_orderkey % 1000 AS INT) AS product_id,
           CAST(o_orderkey % 10 + 1 AS INT) AS quantity,
           CAST(ROUND(o_totalprice, 2) AS DECIMAL(10,2)) AS unit_price,
           o_orderstatus AS order_status,
           CAST(o_orderdate AS TIMESTAMP) AS order_date,
           'INSERT' AS operation_type,
           CAST(o_orderdate AS TIMESTAMP) AS cdc_timestamp
    FROM orders
    UNION ALL
    SELECT o_orderkey,
           CAST(o_custkey AS BIGINT),
           CAST(o_orderkey % 1000 AS INT),
           CAST(o_orderkey % 10 + 2 AS INT),
           CAST(ROUND(o_totalprice, 2) AS DECIMAL(10,2)),
           'completed',
           CAST(o_orderdate AS TIMESTAMP),
           'UPDATE',
           CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY
    FROM orders WHERE o_orderstatus = 'F'
"""

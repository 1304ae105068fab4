"""JDBC live-database source seam (reference log_extractor.py:56-79).

The end-to-end test runs a REAL JDBC extraction: Spark bundles Apache
Derby, so an embedded Derby database stands in for the reference's
Postgres — created and mutated through java.sql via py4j, then read
back with ``spark.read.format("jdbc")`` through the extractor.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.pipeline.extractor import CDCExtractor
from cdc_historical_warehouse_platform_spark.sources.change_batches import read_change_batch
from cdc_historical_warehouse_platform_spark.sources.jdbc import DataFrameSource, JdbcSource


def ts(m):
    return dt.datetime(2026, 3, 1, 12, 0, 0) + dt.timedelta(minutes=m)


def test_jdbc_options_pin_pushdown_and_auth():
    src = JdbcSource(
        "jdbc:postgresql://db:5432/operational_db",
        "orders",
        user="cdc",
        password="s3cret",
        driver="org.postgresql.Driver",
        fetch_size=5000,
    )
    opts = src._options()
    assert opts["dbtable"] == "orders"
    assert opts["fetchsize"] == "5000"
    assert opts["pushDownPredicate"] == "true"  # watermark filter runs DB-side
    assert opts["user"] == "cdc" and opts["password"] == "s3cret"
    assert opts["driver"] == "org.postgresql.Driver"

    src.partition_column = "id"
    assert src._partition_options(1, 100_000) == {
        "partitionColumn": "id",
        "lowerBound": "1",
        "upperBound": "100000",
        "numPartitions": "8",
    }


def test_jdbc_retry_schedule(monkeypatch):
    """Transient connect failures retry on the reference's 5x schedule;
    a persistent failure surfaces the last error."""
    src = JdbcSource("jdbc:x", "t", max_retries=3, retry_delay_s=0.0)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("connection refused")
        return "ok"

    assert src._with_retry(flaky) == "ok"
    assert calls["n"] == 3

    calls["n"] = 0

    def dead():
        calls["n"] += 1
        raise RuntimeError("still down")

    with pytest.raises(RuntimeError, match="still down"):
        src._with_retry(dead)
    assert calls["n"] == 3


def _derby_exec(spark, url: str, *stmts: str) -> None:
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.execute(s)
        st.close()
    finally:
        conn.close()


def test_jdbc_end_to_end_embedded_derby(tmp_path, spark):
    """Full extractor cycles against a live (embedded Derby) database:
    insert -> extract INSERT, update -> extract UPDATE only, no-change
    cycle extracts nothing — watermark semantics identical to the
    parquet path."""
    url = f"jdbc:derby:{tmp_path}/opdb;create=true"
    _derby_exec(
        spark,
        url,
        """CREATE TABLE orders (
               id BIGINT PRIMARY KEY, customer_id INT, product_id INT,
               quantity INT, unit_price DECIMAL(10,2),
               total_amount DECIMAL(10,2), order_status VARCHAR(20),
               order_date TIMESTAMP, last_updated TIMESTAMP,
               created_at TIMESTAMP)""",
        "INSERT INTO orders VALUES "
        "(1, 10, 100, 2, 5.00, 10.00, 'pending', TIMESTAMP('2026-03-01 12:01:00'),"
        " TIMESTAMP('2026-03-01 12:01:00'), TIMESTAMP('2026-03-01 12:01:00')),"
        "(2, 11, 101, 5, 2.00, 10.00, 'pending', TIMESTAMP('2026-03-01 12:02:00'),"
        " TIMESTAMP('2026-03-01 12:02:00'), TIMESTAMP('2026-03-01 12:02:00'))",
    )

    src = JdbcSource(url, "orders", partition_column="id", num_partitions=2)
    ext = CDCExtractor(
        spark, src, tmp_path / "cdc", fmt="jsonl", initial_watermark=ts(0)
    )

    # canonical lower-case column names even though Derby folds
    # unquoted identifiers to upper case (JSON field matching is
    # case-sensitive downstream)
    assert all(c == c.lower() for c in src.read(spark).columns)

    batch1 = ext.run_once(now=ts(5))
    assert batch1 is not None
    rows = {r["id"]: r for r in read_change_batch(spark, batch1).collect()}
    assert rows[1]["customer_id"] == 10  # values survive the envelope
    assert set(rows) == {1, 2}
    assert {r["operation_type"] for r in rows.values()} == {"INSERT"}
    assert ext.watermark.get() == ts(2)

    # mutate one row in the live DB; next cycle sees exactly that UPDATE
    _derby_exec(
        spark,
        url,
        "UPDATE orders SET order_status='shipped', "
        "last_updated=TIMESTAMP('2026-03-01 12:07:00') WHERE id=2",
    )
    batch2 = ext.run_once(now=ts(8))
    got = read_change_batch(spark, batch2).collect()
    assert [(r["id"], r["operation_type"], r["order_status"]) for r in got] == [
        (2, "UPDATE", "shipped")
    ]
    assert ext.watermark.get() == ts(7)

    # quiet cycle: the pushed-down watermark filter returns nothing
    assert ext.run_once(now=ts(9)) is None


def test_jdbc_pushdown_reaches_remote_scan(tmp_path, spark):
    """The watermark predicate must appear as a pushed filter on the
    JDBC relation node — proof the database, not the cluster, prunes
    unchanged rows."""
    url = f"jdbc:derby:{tmp_path}/pushdb;create=true"
    _derby_exec(
        spark,
        url,
        "CREATE TABLE t (id INT, created_at TIMESTAMP, last_updated TIMESTAMP)",
        "INSERT INTO t VALUES (1, TIMESTAMP('2026-03-01 12:01:00'), TIMESTAMP('2026-03-01 12:01:00'))",
    )
    df = JdbcSource(url, "t").read(spark)
    wm = ts(0)
    plan = (
        df.filter((F.col("last_updated") > F.lit(wm)) | (F.col("created_at") > F.lit(wm)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    assert "LAST_UPDATED" in plan.upper()


def test_extractor_accepts_plain_dataframe_source(tmp_path, spark):
    """The extractor's source seam is structural — any object with
    read(spark) works, not just VersionedTable."""
    from decimal import Decimal

    from cdc_historical_warehouse_platform_spark.schemas import ORDERS_SCHEMA

    def order(i):
        return (i, 10, 100, 1, Decimal("5.00"), Decimal("5.00"), "pending",
                ts(i), ts(i), ts(i))

    df = spark.createDataFrame([order(1), order(2)], ORDERS_SCHEMA)
    ext = CDCExtractor(
        spark,
        DataFrameSource(df),
        tmp_path / "cdc",
        fmt="jsonl",
        initial_watermark=ts(0),
    )
    batch = ext.run_once(now=ts(3))
    assert batch is not None
    assert read_change_batch(spark, batch).count() == 2


def test_retry_zero_max_retries_still_attempts_and_raises_cleanly(spark):
    from cdc_historical_warehouse_platform_spark.sources.jdbc import JdbcSource

    src = JdbcSource(url="jdbc:derby:/nonexistent/nowhere", table="t",
                     max_retries=0, retry_delay_s=0.0)
    calls = []

    def boom():
        calls.append(1)
        raise RuntimeError("connection refused")

    with pytest.raises(RuntimeError, match="connection refused"):
        src._with_retry(boom)
    assert calls == [1]  # exactly one attempt, real error surfaced

"""Bucketed tables: the co-located-join property is pinned against the
physical plan — both sides bucketed on the join key must join with NO
Exchange (a silent fallback to a shuffled join is the regression mode
bucketing hides)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.sources.bucketed import bucket_spec, write_bucketed_table
from tests.conftest import SF_DIR


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    write_bucketed_table(
        orders, "b_orders", "o_custkey", num_buckets=8, path=str(tmp_path / "o")
    )
    write_bucketed_table(
        customer, "b_customer", "c_custkey", num_buckets=8, path=str(tmp_path / "c")
    )
    yield orders, customer
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]  # below the agg: the join
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in join_section
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    orders, customer = bucketed_pair
    plain = {
        (r.c_mktsegment, r.n)
        for r in orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    bucketed = {
        (r.c_mktsegment, r.n)
        for r in spark.table("b_orders")
        .join(spark.table("b_customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert plain == bucketed


def test_bucket_spec_metadata(spark, bucketed_pair):
    spec = bucket_spec(spark, "b_orders")
    assert spec["num_buckets"] == 8
    assert "o_custkey" in spec["bucket_cols"]
    with pytest.raises(ValueError):
        spark.range(3).write.mode("overwrite").saveAsTable("b_plain")
        bucket_spec(spark, "b_plain")
    spark.sql("DROP TABLE IF EXISTS b_plain")

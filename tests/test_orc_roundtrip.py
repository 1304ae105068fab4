"""ORC source/sink coverage (§2.1 breadth beyond parquet/CSV/JSON/JDBC).

Spark ships an ORC reader/writer with the same predicate-pushdown and
partition-pruning machinery as parquet; this pins that the engine's
scan-level optimizations hold on the second columnar format too —
a user switching warehouse file formats keeps the same plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_orc_roundtrip_pushdown_and_partition_pruning(spark, tmp_path):
    from cdc_historical_warehouse_platform_spark.schemas import load_table

    events = load_table(spark, SF_DIR, "events")
    dest = str(tmp_path / "events_orc")
    events.write.partitionBy("event_type").orc(dest)

    back = spark.read.orc(dest)
    q = back.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 100.0)
    ).select("event_id", "value")

    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition pruning: only the purchase partition is listed
    assert "event_type" in plan
    # predicate pushdown reaches the ORC scan
    assert "PushedFilters" in plan and "value" in plan.split("PushedFilters", 1)[1][:200]

    want = sorted(
        (r["event_id"], r["value"])
        for r in events.filter(
            (F.col("event_type") == "purchase") & (F.col("value") > 100.0)
        )
        .select("event_id", "value")
        .collect()
    )
    got = sorted((r["event_id"], r["value"]) for r in q.collect())
    assert got == want and want, "ORC roundtrip must preserve filtered rows"

"""Per-order SCD2 lineage report — parity with the reference's
validation artifact (tests/verify_scd2.py:344-495), which renders a
markdown report with an executive summary, validation checklist,
per-version timeline, and key metrics for one sampled order.

Scale posture: the report collects ONLY the sampled key's version rows
(bounded by that key's history length) plus a handful of 1-row
aggregates; the invariant checks themselves are full-table distributed
counts shared with ``run_pipeline.py validate``. Nothing proportional
to the dimension reaches the driver.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["invariant_counts", "pick_sample_key", "generate_lineage_report"]


def invariant_counts(dim: DataFrame) -> dict[str, int]:
    """V1-V3 as one distributed pass (single shuffle on order_key):
    duplicate-current keys, flag/valid_to inconsistencies, interval
    overlaps."""
    w = Window.partitionBy("order_key").orderBy("valid_from")
    per_row = dim.select(
        "order_key",
        "valid_from",
        "valid_to",
        "is_current",
        F.col("is_current").cast("long").alias("cur"),
        (
            (F.col("is_current") & F.col("valid_to").isNotNull())
            | (~F.col("is_current") & F.col("valid_to").isNull())
        )
        .cast("long")
        .alias("flag_bad"),
        F.lead("valid_from").over(w).alias("next_from"),
    ).withColumn(
        "overlap",
        (
            F.col("next_from").isNotNull()
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("next_from")))
        ).cast("long"),
    )
    row = per_row.groupBy("order_key").agg(
        F.sum("cur").alias("ncur"),
        F.sum("flag_bad").alias("nbad"),
        F.sum("overlap").alias("nover"),
    ).agg(
        F.sum((F.col("ncur") > 1).cast("long")).alias("dup_current"),
        F.sum("nbad").alias("flag_violations"),
        F.sum("nover").alias("overlaps"),
    ).collect()[0]
    return {
        "V1_duplicate_current": int(row["dup_current"] or 0),
        "V2_flag_violations": int(row["flag_violations"] or 0),
        "V3_overlaps": int(row["overlaps"] or 0),
    }


def pick_sample_key(dim: DataFrame) -> int | None:
    """The most-versioned order — the richest timeline to exhibit
    (top-1 of a count agg, no full sort)."""
    rows = (
        dim.filter(F.col("order_key").isNotNull())
        .groupBy("order_key")
        .count()
        .orderBy(F.desc("count"), "order_key")
        .limit(1)
        .collect()
    )
    return int(rows[0]["order_key"]) if rows else None


def _fmt(v) -> str:
    if v is None:
        return "NULL (Current)"
    return str(v)


def generate_lineage_report(
    spark: SparkSession,
    dim: DataFrame,
    order_key: int | None = None,
    last_run: dict | None = None,
) -> str:
    """Markdown lineage report for ``order_key`` (defaults to the
    most-versioned key). Mirrors the reference's section structure
    (verify_scd2.py:354-495): summary -> validation results ->
    version timeline -> compliance -> metrics."""
    if order_key is None:
        order_key = pick_sample_key(dim)
    if order_key is None:
        return "# SCD Type 2 Lineage Report\n\nDimension table is empty.\n"

    inv = invariant_counts(dim)
    versions = (
        dim.filter(F.col("order_key") == order_key)
        .orderBy("valid_from", "surrogate_key")
        .collect()
    )
    if not versions:  # explicit --order-key with no rows: report, don't crash
        return (
            "# SCD Type 2 Lineage Report\n\n"
            f"Order key {order_key} has no rows in the dimension.\n"
        )
    totals = dim.agg(
        F.count("*").alias("total"),
        F.sum(F.col("is_current").cast("long")).alias("current"),
        F.countDistinct("order_key").alias("keys"),
    ).collect()[0]

    has_current = any(r["is_current"] for r in versions)
    checks = {
        "has_current_record": has_current or versions[-1]["cdc_operation"] == "DELETE",
        "no_duplicate_current": inv["V1_duplicate_current"] == 0,
        "flag_consistency": inv["V2_flag_violations"] == 0,
        "no_interval_overlaps": inv["V3_overlaps"] == 0,
        "historical_preserved": len(versions) >= 1,
    }
    passed = all(checks.values())
    now = _dt.datetime.utcnow().strftime("%Y-%m-%d %H:%M:%S UTC")

    lines = [
        "# SCD Type 2 Lineage Report",
        "",
        f"**Generated:** {now}  ",
        f"**Order ID:** {order_key}  ",
        f"**Test Status:** {'PASSED' if passed else 'FAILED'}",
        "",
        "---",
        "",
        "## Executive Summary",
        "",
        f"This report validates the SCD Type 2 implementation for Order "
        f"#{order_key}: the CDC pipeline processed "
        f"{len(versions)} change version(s) for this key and the warehouse "
        f"maintains proper historical tracking across "
        f"{int(totals['total'])} dimension rows / "
        f"{int(totals['keys'])} distinct orders.",
        "",
        "## Warehouse Validation Results",
        "",
    ]
    for check, ok in checks.items():
        lines.append(f"- **{check.replace('_', ' ').title()}:** "
                     f"{'PASS' if ok else 'FAIL'}")
    lines += ["", "---", "", "## Order Lineage Timeline", ""]

    for i, r in enumerate(versions, 1):
        flag = "current" if r["is_current"] else "historical"
        lines += [
            f"### Version {i} ({flag})",
            "",
            f"- **Surrogate Key:** {r['surrogate_key']}",
            f"- **Valid From:** {r['valid_from']}",
            f"- **Valid To:** {_fmt(r['valid_to'])}",
            f"- **Is Current:** {r['is_current']}",
            f"- **CDC Operation:** {r['cdc_operation']}",
            f"- **CDC Timestamp:** {r['cdc_timestamp']}",
            f"- **Customer ID:** {r['customer_id']}",
            f"- **Product ID:** {r['product_id']}",
            f"- **Quantity:** {r['quantity']}",
            f"- **Unit Price:** ${r['unit_price']}",
            f"- **Total Amount:** ${r['total_amount']}",
            f"- **Order Status:** {r['order_status']}",
            f"- **Order Date:** {r['order_date']}",
            f"- **Batch ID:** {r['batch_id']}",
            "",
        ]

    n_cur = sum(1 for r in versions if r["is_current"])
    lines += [
        "---",
        "",
        "## SCD Type 2 Compliance Check",
        "",
        "1. **Historical Tracking:** all previous versions preserved",
        "2. **Current Record Flag:** at most one current record per key",
        "3. **Time Validity:** contiguous valid_from/valid_to ranges",
        "4. **No Data Loss:** complete audit trail maintained",
        "5. **Idempotency:** re-runs produce consistent results",
        "",
        "### Key Metrics",
        "",
        f"- **Total Records (this key):** {len(versions)}",
        f"- **Current Records (this key):** {n_cur}",
        f"- **Historical Records (this key):** {len(versions) - n_cur}",
        f"- **Dimension Rows (all keys):** {int(totals['total'])}",
        f"- **Current Rows (all keys):** {int(totals['current'] or 0)}",
        "",
    ]
    if last_run:
        lines += [
            "### Last Pipeline Run",
            "",
            *[f"- **{k}:** {v}" for k, v in last_run.items()],
            "",
        ]
    lines += [
        "---",
        "",
        "*This report was automatically generated by the SCD Type 2 "
        "validation pipeline.*",
        "",
    ]
    return "\n".join(lines)

"""Incremental aggregate maintenance from CDC batches (delta aggregation).

A warehouse keeps summary tables (revenue per customer, order counts)
next to the SCD2 dimension. Recomputing them scans the whole current
slice every batch; this operator maintains them from the batch DELTAS
instead — per-batch cost O(batch + affected groups), independent of
dimension size. The reference recomputes its reports from the full
dimension on every run (verify_scd2.py:283-343 report queries); this is
the incremental-view-maintenance upgrade of those same reports, and the
natural companion to the CDC pipeline: the change feed that maintains
the dimension maintains its rollups too.

Semantics are in lockstep with scd2_merge_tagged (operators/scd2.py):
latest-per-key dedup, advisory op reroutes (INSERT onto an existing key
updates; UPDATE onto a missing key inserts), DELETE removes the current
contribution, and the late-event guard skips changes older than the
current version's ``valid_from``. No-op updates need no special case —
their −old/+new contributions cancel exactly, counts included.

Measures aggregate in DECIMAL, so the maintained value is bit-equal to
a from-scratch recompute in ANY engine regardless of how the history
was batched or ordered. The maintenance invariant (pinned by pytest
property tests and the ``scd2_incremental_revenue`` driver oracle)::

    maintain(S_{k-1}, current_{k-1}, batch_k)
      == group_summary(current_k)            -- for every prefix k

Scale shape: ONE broadcast-batch probe of a column-pruned current slice
(business key, group, measure, valid_from — a skinny parquet scan, the
same trick as scd2_merge_tagged's key-membership subtree), batch-local
work for everything else, and a summary upsert that joins
summary-sized inputs only — the wide dimension is never rescanned and
never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_historical_warehouse_platform_spark.operators.scd2 import BUSINESS_KEY, dedupe_latest_per_key

__all__ = [
    "SUMMARY_MEASURE_TYPE",
    "empty_summary",
    "group_summary",
    "summary_delta",
    "apply_summary_delta",
    "maintain_group_summary",
]

# Wide enough that no realistic corpus overflows a per-group sum of
# DECIMAL(10,2) measures; kept identical across the recompute twin, the
# delta path, and the DuckDB oracle so every engine agrees bit-for-bit.
SUMMARY_MEASURE_TYPE = "decimal(28,2)"
_SUM_TYPE = "decimal(38,2)"  # Spark's SUM(decimal(28,2)) result type


def _summary_schema(group_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            group_field,
            T.StructField("n_orders", T.LongType(), False),
            T.StructField("measure_sum", T.DecimalType(38, 2), True),
        ]
    )


def empty_summary(
    spark: SparkSession, group_field: T.StructField | None = None
) -> DataFrame:
    """An empty maintained summary (group, n_orders, measure_sum)."""
    field = group_field or T.StructField("customer_id", T.IntegerType(), True)
    return spark.createDataFrame([], _summary_schema(field))


def group_summary(
    current: DataFrame,
    group_col: str = "customer_id",
    measure_col: str = "total_amount",
) -> DataFrame:
    """From-scratch summary over the current slice — the recompute twin
    the incremental path must equal (and the bootstrap for adopting an
    existing dimension into maintenance)."""
    return current.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.coalesce(F.col(measure_col), F.lit(0)).cast(SUMMARY_MEASURE_TYPE)
        ).alias("measure_sum"),
    )


def summary_delta(
    current: DataFrame,
    changes: DataFrame,
    group_col: str = "customer_id",
    measure_col: str = "total_amount",
    business_key: str = BUSINESS_KEY,
    change_key: str = "id",
) -> DataFrame:
    """Per-group (Δcount, Δsum) of ONE CDC batch against the PRE-batch
    current slice (the same input the merge itself sees).

    Three algebraic terms, arranged so the current slice is probed
    exactly ONCE (no anti-join — an anti against "matched keys" would
    re-evaluate the probe subtree and scan the slice a second time):

    - ``+new`` for EVERY non-DELETE batch row — batch-local, no scan;
      brand-new keys are covered here for free;
    - ``−old`` for every matched, non-late row — from the single
      broadcast-batch inner probe of the column-pruned slice;
    - ``−new`` correction for matched LATE non-DELETE rows (their
      ``+new`` above must be revoked: the merge treats them as no-ops)
      — from the same probe relation.

    Updates that move a row between groups transfer it, no-ops cancel
    exactly, deletes subtract, late events net to zero, and DELETEs of
    missing keys fall out silently — all matching the merge."""
    latest = dedupe_latest_per_key(changes, key=change_key)
    staged = latest.select(
        F.col(change_key).cast("long").alias("__b_key"),
        F.col(group_col).alias("__b_group"),
        F.coalesce(F.col(measure_col), F.lit(0))
        .cast(SUMMARY_MEASURE_TYPE)
        .alias("__b_measure"),
        F.col("operation_type").alias("__b_op"),
        F.col("cdc_timestamp").alias("__b_ts"),
    )
    cur_slim = current.select(
        F.col(business_key).alias("__c_key"),
        F.col(group_col).alias("__c_group"),
        F.coalesce(F.col(measure_col), F.lit(0))
        .cast(SUMMARY_MEASURE_TYPE)
        .alias("__c_measure"),
        F.col("valid_from").alias("__c_from"),
    )
    plus_all = staged.filter(F.col("__b_op") != "DELETE").select(
        F.col("__b_group").alias(group_col),
        F.lit(1).cast("long").alias("__dn"),
        F.col("__b_measure").alias("__dm"),
    )
    # The one probe of the (column-pruned) current slice.
    matched = cur_slim.join(
        F.broadcast(staged), F.col("__c_key") == F.col("__b_key"), "inner"
    )
    is_late = F.col("__b_ts") < F.col("__c_from")
    minus_old = matched.filter(~is_late).select(
        F.col("__c_group").alias(group_col),
        F.lit(-1).cast("long").alias("__dn"),
        (-F.col("__c_measure")).cast(SUMMARY_MEASURE_TYPE).alias("__dm"),
    )
    revoke_late = matched.filter(is_late & (F.col("__b_op") != "DELETE")).select(
        F.col("__b_group").alias(group_col),
        F.lit(-1).cast("long").alias("__dn"),
        (-F.col("__b_measure")).cast(SUMMARY_MEASURE_TYPE).alias("__dm"),
    )
    return (
        plus_all.unionByName(minus_old)
        .unionByName(revoke_late)
        .groupBy(group_col)
        .agg(
            F.sum("__dn").alias("__dn"),
            F.sum("__dm").cast(_SUM_TYPE).alias("__dm"),
        )
    )


def apply_summary_delta(
    summary: DataFrame, delta: DataFrame, group_col: str = "customer_id"
) -> DataFrame:
    """Upsert the per-group delta into the maintained summary: full
    outer on the group key (summary-sized inputs only), coalesce-add,
    and drop groups whose last order was deleted — so the maintained
    table stays row-identical to a GROUP BY recompute.

    The join is NULL-SAFE (``eqNullSafe``): GROUP BY treats NULL as
    one ordinary group, so the upsert must merge the summary's NULL
    row with the delta's NULL row — a plain-equality join would append
    a fresh NULL row every batch and silently break the recompute
    invariant for any nullable ``group_col``."""
    s = summary.select(
        F.col(group_col).alias("__s_g"),
        F.col("n_orders").alias("__s_n"),
        F.col("measure_sum").alias("__s_m"),
    )
    d = delta.select(
        F.col(group_col).alias("__d_g"), F.col("__dn"), F.col("__dm")
    )
    zero = F.lit(0).cast(_SUM_TYPE)
    return (
        s.join(d, F.col("__s_g").eqNullSafe(F.col("__d_g")), "full_outer")
        .select(
            F.coalesce(F.col("__s_g"), F.col("__d_g")).alias(group_col),
            (F.coalesce(F.col("__s_n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0)))
            .cast("long")
            .alias("n_orders"),
            (F.coalesce(F.col("__s_m"), zero) + F.coalesce(F.col("__dm"), zero))
            .cast(_SUM_TYPE)
            .alias("measure_sum"),
        )
        .filter(F.col("n_orders") > 0)
    )


def maintain_group_summary(
    summary: DataFrame,
    current: DataFrame,
    changes: DataFrame,
    group_col: str = "customer_id",
    measure_col: str = "total_amount",
    business_key: str = BUSINESS_KEY,
    change_key: str = "id",
) -> DataFrame:
    """One maintenance step: S_k = apply(S_{k-1}, Δ(current_{k-1}, batch_k)).

    ``current`` MUST be the pre-batch current slice — compute the delta
    before (or independently of) advancing the dimension."""
    delta = summary_delta(
        current, changes, group_col, measure_col, business_key, change_key
    )
    return apply_summary_delta(summary, delta, group_col)

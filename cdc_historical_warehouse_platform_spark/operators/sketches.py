"""Mergeable distinct-count sketches — incremental COUNT(DISTINCT).

COUNT(DISTINCT) is the canonical aggregate that is NOT delta-
maintainable (a batch tells you nothing about multiplicity already in
the group), and exact per-group key-set state is O(distinct values) —
the one state shape that grows without bound at 100 TB. The production
answer is a mergeable sketch: per-batch HyperLogLog sketches (Spark's
Apache-DataSketches-backed ``hll_sketch_agg``), merged into per-group
state by register-wise max (``hll_union``) — commutative, associative
and duplicate-insensitive, so batches may arrive in any order, be
replayed, or be pre-aggregated per partition, and the state stays a
fixed ~2^lgk bytes per group forever.

This is the sketch-tier sibling of operators/incremental_agg.py
(SUM/COUNT are delta-maintained exactly; MIN/MAX via the dirty-group
hybrid; COUNT DISTINCT via mergeable sketches). A single build's
estimate is deterministic for a given input SET regardless of
partitioning/order; a MERGED state's estimate additionally tracks the
from-scratch build within a tight envelope but is not bit-equal to it
(DataSketches unions drop the HIP estimator) — both pinned by
tests/test_sketches.py. Estimates are engine-specific, so the
registered query is a rows-only driver row.

No reference counterpart: the reference's validation queries recompute
COUNT(DISTINCT) from scratch in Postgres (tests/verify_scd2.py) —
this is the beyond-reference scale path for the same reports.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "SKETCH_COL",
    "group_distinct_sketch",
    "merge_sketch_state",
    "with_distinct_estimate",
]

SKETCH_COL = "distinct_sketch"
DEFAULT_LGK = 12


def group_distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` — the batch-side build.

    One shuffle on the group key; partial sketches are merged map-side
    (hll_sketch_agg is a declarative aggregate), so the exchange moves
    ≤ one ~2^lgk-byte sketch per group per map task, never raw values.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(SKETCH_COL)
    )


def merge_sketch_state(
    state: DataFrame, delta: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union a batch's per-group sketches into the persisted state.

    Null-safe full-outer on the group key (a NULL group is one
    ordinary group, mirroring GROUP BY semantics); groups present on
    one side only carry that side's sketch through (hll_union itself
    returns NULL if either input is NULL, so both one-sided cases are
    handled explicitly). The state never shrinks and never stores raw
    values — replaying a batch is a no-op by sketch idempotence.
    """
    s = state.select(
        *[F.col(c).alias(f"__s_{c}") for c in group_cols],
        F.col(SKETCH_COL).alias("__s_sk"),
    )
    d = delta.select(
        *[F.col(c).alias(f"__d_{c}") for c in group_cols],
        F.col(SKETCH_COL).alias("__d_sk"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__s_{c}").eqNullSafe(F.col(f"__d_{c}")) for c in group_cols],
    )
    merged = (
        F.when(F.col("__s_sk").isNull(), F.col("__d_sk"))
        .when(F.col("__d_sk").isNull(), F.col("__s_sk"))
        # allowDifferentLgConfigK: persisted state may predate a
        # DEFAULT_LGK change (or a caller may build deltas at a custom
        # lgk) — the union downgrades to the smaller lgk instead of
        # failing the whole merge at runtime
        .otherwise(F.hll_union("__s_sk", "__d_sk", True))
    )
    return s.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__s_{c}"), F.col(f"__d_{c}")).alias(c)
            for c in group_cols
        ],
        merged.alias(SKETCH_COL),
    )


def with_distinct_estimate(
    state: DataFrame, out_col: str = "distinct_count"
) -> DataFrame:
    """Read-time estimate: one expression over the stored sketch."""
    return state.withColumn(out_col, F.hll_sketch_estimate(F.col(SKETCH_COL)))

"""As-of (point-in-time) join — the generic form of SURVEY.md §2.3 J3.

The reference serves point-in-time lookups from SCD2 validity intervals
(README.md:426-439). The generic operator — "for each left row, the
latest right row with ``right.ts <= left.ts`` per key" — has no Spark
built-in, so we implement it with the scalable union+window technique:

1. Tag left rows (side=1) and right rows (side=0) and union them.
2. One window per key ordered by (ts, side): ``last_value`` of the
   right-side payload seen so far = the as-of match.
3. Keep left rows.

Cost: ONE shuffle on the key (the union sorts within partitions), no
range-join explosion, no per-key collect — this is the pattern that
survives 100 TB where a naive ``left.ts >= right.ts`` theta-join would
cross-product each key group. Skewed keys are handled by AQE; extreme
skew can additionally bucket by coarse time.

For interval semantics (SCD2 validity windows) prefer the pure filter
form in plans/reference_queries.q_as_of — it needs no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    tolerance: str | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row per key.

    Args:
        on: equi-key column name (same on both sides).
        left_ts / right_ts: event-time columns.
        right_payload: right columns to carry (default: all but key/ts).
        tolerance: optional max staleness (SQL interval string, e.g.
            ``'1 hour'``): matches older than this are nulled out.
        allow_exact_matches: if False, ``right.ts < left.ts`` strictly.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]

    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lhs.schema["__left"].dataType).alias("__left"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )

    # side ordering: with exact matches, right rows at ts T sort before
    # left rows at T (so they are visible); strict mode reverses that.
    side_order = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = [
        F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
        for c in right_payload
    ]
    carried_ts = F.last(F.col("__rts"), ignorenulls=True).over(w).alias("__m_ts")

    matched = lhs.unionByName(rhs).select("*", carried_ts, *carried).filter(
        F.col("__side") == 1
    )

    if tolerance is not None:
        fresh = F.col("__m_ts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        matched = matched.select(
            "__left",
            F.when(fresh, F.col("__m_ts")).alias("__m_ts"),
            *[
                F.when(fresh, F.col(f"__m_{c}")).alias(f"__m_{c}")
                for c in right_payload
            ],
        )

    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m_ts").alias(f"asof_{right_ts}"))
    out_cols += [F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_payload]
    return matched.select(*out_cols)

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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row per key.

    Args:
        on: equi-key column name (same on both sides).
        left_ts / right_ts: event-time columns.
        right_payload: right columns to carry (default: all but key/ts).
        tolerance: optional max distance (SQL interval string, e.g.
            ``'1 hour'``): matches farther than this are nulled out
            (staleness bound for backward, lead bound for forward,
            either side for nearest).
        allow_exact_matches: if False, the inequality is strict
            (``right.ts < left.ts`` backward / ``>`` forward; nearest
            excludes exact-ts rows from both sides).
        direction: ``'backward'`` (default — latest right at or before
            left.ts), ``'forward'`` (earliest right at or after), or
            ``'nearest'`` (whichever side is closer; an exact tie in
            distance resolves to the backward match — deterministic).

    Scale: backward/forward are the single-shuffle union+window scan
    (module docstring). ``nearest`` evaluates BOTH window passes over
    the same union — same one shuffle on the key, two in-partition
    sorts (ts asc + ts desc), still no range-join explosion and no
    per-key state.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
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
    # left rows at T in SCAN order (so they are visible); strict mode
    # reverses that. The same expression is correct for the descending
    # (forward) scan: among equal ts, side 0 still precedes side 1.
    side_order = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()

    def _window(desc: bool):
        ts_order = F.col("__ts").desc() if desc else F.col("__ts").asc()
        return (
            Window.partitionBy("__k")
            .orderBy(ts_order, side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def _carry(w, tag: str):
        cols = [F.last(F.col("__rts"), ignorenulls=True).over(w).alias(f"__{tag}_ts")]
        cols += [
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__{tag}_{c}")
            for c in right_payload
        ]
        return cols

    def _in_tolerance(tag: str):
        if tolerance is None:
            return F.col(f"__{tag}_ts").isNotNull()
        tol = F.expr(f"INTERVAL {tolerance}")
        return (F.col(f"__{tag}_ts") >= F.col("__ts") - tol) & (
            F.col(f"__{tag}_ts") <= F.col("__ts") + tol
        )

    def _nullify(tag: str):
        ok = _in_tolerance(tag)
        return [
            F.when(ok, F.col(f"__{tag}_ts")).alias(f"__{tag}_ts"),
            *[
                F.when(ok, F.col(f"__{tag}_{c}")).alias(f"__{tag}_{c}")
                for c in right_payload
            ],
        ]

    unioned = lhs.unionByName(rhs)
    if direction == "nearest":
        both = unioned.select(
            "*", *_carry(_window(desc=False), "mb"), *_carry(_window(desc=True), "mf")
        ).filter(F.col("__side") == 1)
        both = both.select("__left", "__ts", *_nullify("mb"), *_nullify("mf"))
        # closer side wins; an exact distance tie resolves backward
        use_back = F.col("__mf_ts").isNull() | (
            F.col("__mb_ts").isNotNull()
            & ((F.col("__ts") - F.col("__mb_ts")) <= (F.col("__mf_ts") - F.col("__ts")))
        )
        matched = both.select(
            "__left",
            F.when(use_back, F.col("__mb_ts")).otherwise(F.col("__mf_ts")).alias("__m_ts"),
            *[
                F.when(use_back, F.col(f"__mb_{c}"))
                .otherwise(F.col(f"__mf_{c}"))
                .alias(f"__m_{c}")
                for c in right_payload
            ],
        )
    else:
        w = _window(desc=(direction == "forward"))
        matched = unioned.select("*", *_carry(w, "m")).filter(F.col("__side") == 1)
        if tolerance is not None:
            matched = matched.select("__left", "__ts", *_nullify("m")).select(
                "__left",
                F.col("__m_ts"),
                *[F.col(f"__m_{c}") for c in right_payload],
            )

    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m_ts").alias(f"asof_{right_ts}"))
    out_cols += [F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_payload]
    return matched.select(*out_cols)

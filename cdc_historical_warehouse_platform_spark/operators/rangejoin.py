"""Time-interval (range) joins — the no-equi-key case Spark plans badly.

An interval join with an equi key (same user within ±N minutes) is just
an equi-join with a range residual — Catalyst handles it. WITHOUT an
equi key ("any purchase within ±N minutes of any error") the optimizer
has nothing to hash on and falls back to BroadcastNestedLoopJoin /
CartesianProduct — O(n·m) comparisons, the exact node the repo's plan
guard forbids.

:func:`interval_join` is the scale path: bucket both sides on
fixed-width time bins — each right row sits in exactly one bin, each
left row explodes across every bin its ``[ts+lower, ts+upper]`` window
covers (at the default width, at most 2) — equi-join on the bin, then
apply the exact interval predicate as a residual. One shuffle on the
bin key; bin width tunes the density/duplication trade-off; AQE's
skew-join splits hot bins (event-burst seconds). A right row can match
a left row in only the right row's own bin, so no post-join dedup is
needed.

This is the batch twin of a watermarked stream-stream interval join
(streaming joins bound state by the same window; see
tests/test_streaming.py) and the event-time analog of the as-of join
(operators/asof.py) — as-of keeps the nearest single match, interval
keeps every match in the window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    bucket_seconds: int | None = None,
    extra_condition: Column | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``right.ts`` in
    ``[left.ts + lower, left.ts + upper]`` (bounds inclusive, seconds).

    Column names must be disjoint across the two inputs (alias before
    calling). ``extra_condition`` is applied with the range residual
    after the bin join. Bin indices come from epoch-second floor, which
    is monotone, so microsecond-precision rows near bin edges are never
    missed; the residual compares full-precision timestamps.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    if bucket_seconds is None:
        bucket_seconds = max(upper_seconds - lower_seconds, 1)

    lsec = F.col(left_ts).cast("long")
    rsec = F.col(right_ts).cast("long")
    lo_bin = F.floor((lsec + F.lit(lower_seconds)) / F.lit(bucket_seconds))
    hi_bin = F.floor((lsec + F.lit(upper_seconds)) / F.lit(bucket_seconds))
    lbinned = left.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    rbinned = right.withColumn("__bin", F.floor(rsec / F.lit(bucket_seconds)))

    residual = F.col(right_ts).between(
        F.col(left_ts) + F.expr(f"INTERVAL {lower_seconds} SECONDS"),
        F.col(left_ts) + F.expr(f"INTERVAL {upper_seconds} SECONDS"),
    )
    if extra_condition is not None:
        residual = residual & extra_condition
    return lbinned.join(rbinned, "__bin").filter(residual).drop("__bin")

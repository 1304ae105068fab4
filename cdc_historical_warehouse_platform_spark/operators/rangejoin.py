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

The bin/residual expression builders are shared with the streaming
twin (streaming/pipeline.streaming_interval_join) — ONE copy of the
floor/sequence arithmetic the correctness argument rests on. This is
also the event-time analog of the as-of join (operators/asof.py):
as-of keeps the nearest single match, interval keeps every match in
the window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "left_bins", "right_bin", "interval_residual"]

_RESERVED = ("__bin", "__lbin", "__rbin")


def _validate(
    left: DataFrame,
    right: DataFrame,
    lower_seconds: int,
    upper_seconds: int,
    bucket_seconds: int | None,
) -> int:
    """Shared parameter checks. A non-positive bucket width would turn
    the bin floors into NULL/garbage and return an EMPTY join result
    with no error — fail loudly instead."""
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    if bucket_seconds is None:
        bucket_seconds = max(upper_seconds - lower_seconds, 1)
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    clashes = [c for c in _RESERVED if c in left.columns or c in right.columns]
    if clashes:
        raise ValueError(
            f"inputs must not carry the reserved bin columns {clashes} "
            "(rename or drop them before the interval join)"
        )
    return bucket_seconds


def left_bins(
    left_ts: str, lower_seconds: int, upper_seconds: int, bucket_seconds: int
) -> Column:
    """Every bin index the left row's ``[ts+lower, ts+upper]`` window
    covers (inclusive; ≤2 elements at the default width). Bin indices
    come from epoch-second floor, which is monotone, so
    microsecond-precision rows near bin edges are never missed."""
    lsec = F.col(left_ts).cast("long")
    return F.sequence(
        F.floor((lsec + F.lit(lower_seconds)) / F.lit(bucket_seconds)),
        F.floor((lsec + F.lit(upper_seconds)) / F.lit(bucket_seconds)),
    )


def right_bin(right_ts: str, bucket_seconds: int) -> Column:
    """The single bin index a right row occupies."""
    return F.floor(F.col(right_ts).cast("long") / F.lit(bucket_seconds))


def interval_residual(
    left_ts: str, right_ts: str, lower_seconds: int, upper_seconds: int
) -> Column:
    """The exact (full-timestamp-precision, bounds-inclusive) interval
    predicate applied after the bin equi-join."""
    return F.col(right_ts).between(
        F.col(left_ts) + F.expr(f"INTERVAL {lower_seconds} SECONDS"),
        F.col(left_ts) + F.expr(f"INTERVAL {upper_seconds} SECONDS"),
    )


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
    calling), and neither input may carry the reserved ``__bin`` /
    ``__lbin`` / ``__rbin`` columns (validated — silently overwriting
    them would corrupt results). ``extra_condition`` is applied with
    the range residual after the bin join.
    """
    bucket_seconds = _validate(left, right, lower_seconds, upper_seconds, bucket_seconds)
    lbinned = left.withColumn(
        "__bin", F.explode(left_bins(left_ts, lower_seconds, upper_seconds, bucket_seconds))
    )
    rbinned = right.withColumn("__bin", right_bin(right_ts, bucket_seconds))
    residual = interval_residual(left_ts, right_ts, lower_seconds, upper_seconds)
    if extra_condition is not None:
        residual = residual & extra_condition
    return lbinned.join(rbinned, "__bin").filter(residual).drop("__bin")

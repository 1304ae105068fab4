"""Distributed exact global rank / NTILE — no single-partition window.

``Window.orderBy(...)`` with no partition key moves the whole input to
ONE partition; fine for a 24-row spine, fatal for a dimension. This
module computes the same order statistics with the hierarchical
prefix-sum shape packing.py uses: rows bucket by a VALUE-derived range
of the leading sort key (deterministic — ``spark_partition_id`` would
not survive a re-run), ranks are a window WITHIN each bucket plus a
cross-bucket offset from the (tiny) per-bucket count table. Exact,
bit-identical at any partitioning, and every window in the plan is
partitioned.

``exact_ntile`` then maps ranks to SQL NTILE semantics in closed form
(the first n%k tiles get one extra row), so a DuckDB oracle can use
native NTILE() while the Spark side never globally sorts — the
hash-equality of the two IS the proof the formula matches.

Bucketing is auto-derived by default (``derive_bucket``): a bounded
2-scalar min/max probe of the leading key picks a width targeting
~4×-parallelism buckets, so a caller can no longer hand a degenerate
width that silently collapses to the single-bucket global sort this
module exists to avoid. A hand-written monotone ``bucket`` expression
is still accepted (and still EXACT even when degenerate — only the
parallelism degrades; tests pin that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["derive_bucket", "global_rank", "exact_ntile"]


def derive_bucket(
    df: DataFrame,
    key: Column,
    *,
    descending: bool = False,
    target_buckets: int | None = None,
) -> Column:
    """Monotone range-bucket expression for ``key``, width chosen from a
    bounded min/max probe (two scalars to the driver — the same bounded
    contract as packing.py's superbucket table).

    Targets ``target_buckets`` (default 4 × defaultParallelism, floor
    64) equal-width value ranges. Skewed keys make uneven buckets —
    still exact, parallelism just degrades toward the skew; callers
    with a known-better monotone expression (e.g. an ndv-aware one)
    pass it to ``global_rank`` directly. Keys must be non-null and
    castable to double; ``descending=True`` negates so bucket order
    follows a DESC leading sort.

    A null key would yield a null bucket, and ``_ranked``'s inner join
    on the bucket id would then silently DROP those rows — wrong ranks
    with no error — so the contract is enforced loudly here: the same
    bounded probe that finds min/max also counts nulls and raises if
    any exist (callers with nullable keys coalesce to a sentinel that
    matches their null ordering before calling).
    """
    if target_buckets is None:
        par = df.sparkSession.sparkContext.defaultParallelism
        target_buckets = max(4 * par, 64)
    k = (-key if descending else key).cast("double")
    lo, hi, n_null = df.agg(
        F.min(k), F.max(k), F.count(F.lit(1)) - F.count(k)
    ).first()
    if n_null:
        raise ValueError(
            f"derive_bucket key contains {n_null} null value(s); "
            "coalesce nulls to a sentinel matching your null ordering "
            "before ranking"
        )
    if lo is None or hi is None or not (hi > lo):
        # empty input or a constant key: one bucket is the true answer
        return F.lit(0)
    width = (hi - lo) / float(target_buckets)
    # float width > 0: floor((k - lo)/width) is weakly monotone in k,
    # which is all global_rank's offset-table correctness needs
    return F.floor((k - F.lit(float(lo))) / F.lit(width))


def _ranked(
    pinned: DataFrame,
    order_cols: list[Column],
    bucket: Column,
    out_col: str,
) -> DataFrame:
    """Rank over an already-pinned frame (callers pin so sibling
    aggregates share the same materialization)."""
    b = pinned.withColumn("__rb", bucket.cast("long"))
    w_in = Window.partitionBy("__rb").orderBy(*order_cols)
    # tiny by the width contract; consumed by offsets' both join sides
    counts = b.groupBy("__rb").agg(F.count(F.lit(1)).alias("__rn")).localCheckpoint(
        eager=False
    )
    lower = counts.select(
        F.col("__rb").alias("__rb2"), F.col("__rn").alias("__rn2")
    )
    # bounded non-equi self-join over the bucket-count table (tiny by
    # the width contract) — exclusive prefix sum without a global sort
    offsets = (
        counts.join(F.broadcast(lower), F.col("__rb2") < F.col("__rb"), "left")
        .groupBy("__rb")
        .agg(F.coalesce(F.sum("__rn2"), F.lit(0)).cast("long").alias("__roff"))
    )
    return (
        b.join(F.broadcast(offsets), "__rb")
        .withColumn(out_col, F.col("__roff") + F.row_number().over(w_in))
        .drop("__rb", "__roff")
    )


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    bucket: Column | None = None,
    out_col: str = "rank",
    *,
    key: Column | None = None,
    descending: bool = False,
    target_buckets: int | None = None,
) -> DataFrame:
    """Exact 1-based rank of every row under ``order_cols`` (which must
    be a TOTAL order — carry a unique key as the last column).

    ``bucket``, when given, must be a monotone function of the leading
    sort key (e.g. ``F.floor(col / width)``): bucket order == value
    order is what lets the offset table replace a global sort. Omit it
    to auto-derive via ``derive_bucket`` over ``key`` — the RAW leading
    sort key column (``F.asc``/``F.desc`` wrappers are SortOrder
    expressions and cannot appear inside another expression); pass
    ``descending=True`` when the leading sort is DESC so the auto
    bucket follows it.
    """
    # one lazy pin of the input: it feeds the window path, the bucket
    # counts, the auto-width probe, and (via exact_ntile) the
    # total-count aggregate — without the barrier each consumer
    # re-derives the caller's upstream, and CHAINED rank calls (three
    # RFM cuts) compound that exponentially (measured: a 113-stage
    # plan collapses to linear with the pins)
    df = df.localCheckpoint(eager=False)
    if bucket is None:
        if key is None:
            raise ValueError(
                "global_rank: pass either an explicit monotone `bucket` "
                "or the raw leading-sort-key column via `key=` for the "
                "auto-derived width"
            )
        bucket = derive_bucket(
            df, key, descending=descending, target_buckets=target_buckets
        )
    return _ranked(df, order_cols, bucket, out_col)


def exact_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[Column],
    bucket: Column | None = None,
    out_col: str = "tile",
    *,
    key: Column | None = None,
    descending: bool = False,
    target_buckets: int | None = None,
) -> DataFrame:
    """SQL NTILE(k) without an unpartitioned window: global_rank, then
    the closed form — with n = count, q = n div k, m = n mod k, the
    first m tiles hold q+1 rows:

        tile(r) = (r-1) div (q+1) + 1                    if r <= m(q+1)
                  m + (r - m(q+1) - 1) div q + 1         otherwise

    All-positive integer division (trunc == floor in every engine);
    n enters as a 1-row keyless aggregate cross-joined in (the
    scalar-build shape the plan guard structurally admits). The count
    aggregates over the SAME pin the rank path reads, so chained calls
    never re-derive the caller's upstream plan."""
    pinned = df.localCheckpoint(eager=False)
    if bucket is None:
        if key is None:
            raise ValueError(
                "exact_ntile: pass either an explicit monotone `bucket` "
                "or the raw leading-sort-key column via `key=` for the "
                "auto-derived width"
            )
        bucket = derive_bucket(
            pinned, key, descending=descending, target_buckets=target_buckets
        )
    ranked = _ranked(pinned, order_cols, bucket, out_col="__rr")
    n1 = pinned.agg(F.count(F.lit(1)).alias("__n"))
    K = int(n_tiles)
    # pure integer arithmetic end to end — a float (r-1)/(q+1) + floor
    # could flip a tile boundary in the last ulp at dimension-scale n
    tile = F.expr(
        f"CASE WHEN __rr <= (__n % {K}) * ((__n div {K}) + 1) "
        f"THEN (__rr - 1) div ((__n div {K}) + 1) + 1 "
        f"ELSE (__n % {K}) + ((__rr - (__n % {K}) * ((__n div {K}) + 1) - 1) "
        f"div greatest(__n div {K}, 1)) + 1 END"
    )
    return (
        ranked.crossJoin(F.broadcast(n1))
        .withColumn(out_col, tile.cast("int"))
        .drop("__rr", "__n")
    )

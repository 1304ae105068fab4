"""Z-order (Morton) clustering for multi-column data skipping.

Parquet scans skip row groups/files whose footer min/max stats exclude
the filter predicate — but stats are only selective if the layout is
clustered on the filtered columns. Sorting on ONE column makes its
stats tight and every other column's useless; Z-ORDER interleaves the
bits of several columns so each file covers a small hyper-rectangle of
the combined space, giving EVERY interleaved column selective stats at
once (the same trade Delta's OPTIMIZE ZORDER BY makes; this is the
plain-Spark expression of it — reference scope note: the reference has
no storage-layout tooling at all, its warehouse is Postgres with
btree indexes, check_indexes.py).

Everything is built-in column expressions (shift/mask/or), no Python
in the row path; the write is one range-repartition + in-partition
sort — the standard layout-maintenance job you run next to compaction.

Division of labor with operators/layout.py: this module is the
N-column float-bounds layout JOB (derive bounds, cluster, write plain
parquet, rely on parquet's own row-group stats); layout.py holds the
shared bit-interleave core plus the integer-exact engine-portable key
(oracle-checkable bit-for-bit) and the VersionedTable tier — per-file
min/max stats manifests and manifest-pruned reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]


def zorder_key(
    cols: list[Column],
    mins: list[float],
    maxs: list[float],
    bits: int = 16,
) -> Column:
    """Morton key: each column scaled to ``[0, 2^bits)`` against the
    caller-supplied bounds (one tiny agg computes them — keeping them
    explicit makes the key stable across appends), then bit-interleaved
    into one long. ``bits * len(cols)`` must fit 63 bits.

    Out-of-range values clamp to the edge cells — appends whose new
    rows exceed the original bounds degrade to edge-clustering rather
    than erroring (re-derive bounds at the next full rewrite).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least 2 columns (sort for 1)")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds 63")
    if not (len(mins) == len(maxs) == n):
        # zip() would silently drop the unbounded columns from the key
        raise ValueError(
            f"bounds must cover every column: {n} cols, "
            f"{len(mins)} mins, {len(maxs)} maxs"
        )
    cells = (1 << bits) - 1
    quantized = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi) - float(lo)
        if span <= 0:
            quantized.append(F.lit(0).cast("long"))
            continue
        q = F.floor(
            (c.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(cells))
        ).cast("long")
        # NULL handling must come FIRST: least/greatest SKIP nulls, so a
        # NULL value would otherwise clamp to the TOP cell and co-locate
        # every NULL row with the max-corner rows, widening those files'
        # stats on the other columns. NULLs cluster at the low corner.
        quantized.append(
            F.when(c.isNull(), F.lit(0).cast("long")).otherwise(
                F.greatest(F.lit(0), F.least(F.lit(cells), q))
            )
        )
    from cdc_historical_warehouse_platform_spark.operators.layout import interleave

    return interleave(quantized, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 32,
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    one tiny agg derives the bounds, a range repartition on the Morton
    key splits the curve into ``num_files`` contiguous segments, and an
    in-partition sort tightens per-row-group stats. Returns the bounds
    (pass them back to :func:`zorder_key` to cluster appends against
    the same grid).

    Scale shape: bounds agg is one partial-aggregate pass; the range
    exchange samples the key (Spark's RangePartitioner) and is the only
    shuffle; the sort is per-partition. Layout maintenance — pair it
    with compaction cadence, not per-batch.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0]
    for c in cols:
        if row[f"__min_{c}"] is None:
            raise ValueError(
                f"cannot derive z-order bounds for {c!r}: empty input or "
                "all-NULL column (write unclustered, or supply bounds "
                "via zorder_key directly)"
            )
    mins = [float(row[f"__min_{c}"]) for c in cols]
    maxs = [float(row[f"__max_{c}"]) for c in cols]
    key = zorder_key([F.col(c) for c in cols], mins, maxs, bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
    return {"cols": cols, "bits": bits, "mins": mins, "maxs": maxs}

"""Sequence packing for pretraining corpora.

"Concat-and-chunk" packing: documents are concatenated in a
deterministic order and cut into fixed-length training sequences of
``seq_len`` tokens; each document needs its global token offset
(``tokens_before``) to know which sequence (``pack_id``) and position
(``pack_offset``) it starts at.

The naive Spark expression — ``SUM(n_tokens) OVER (ORDER BY doc_id)``
— is an UNPARTITIONED ordered window: Spark funnels the whole corpus
through one task. Fine at test scale, fatal at 100 TB. This module
implements the distributed two-phase prefix sum instead:

1. rows are bucketed by ``floor(order_col / bucket_size)`` — a
   DETERMINISTIC partitioning derived from data, not from physical
   placement (``spark_partition_id()`` would not survive a re-run);
2. an in-bucket cumulative sum runs as a window PARTITIONED by bucket
   (parallel across buckets);
3. per-bucket totals (corpus_size / bucket_size rows — tiny) get a
   driver-scale exclusive prefix sum and are broadcast back.

``tokens_before = bucket_offset + in_bucket_cumsum − n_tokens``. The
result is identical to the global window (the SQL oracle twin uses
exactly that single-window form) with no single-task bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["packed_sequence_ids"]


def packed_sequence_ids(
    df: DataFrame,
    token_col: str,
    seq_len: int = 2048,
    order_col: str = "doc_id",
    bucket_size: int = 16384,
) -> DataFrame:
    """Assign every document its concat-and-chunk packing coordinates.

    Adds ``tokens_before`` (global exclusive prefix sum of `token_col`
    in `order_col` order), ``pack_id`` (which seq_len-token training
    sequence the document starts in) and ``pack_offset`` (token
    position within it). Deterministic: depends only on the data.

    CONTRACT: ``order_col`` must be reasonably DENSE (consecutive-ish
    ids) — buckets are value ranges ``floor(id / bucket_size)``, so the
    per-bucket totals stage stays ~corpus/bucket_size rows. Sparse keys
    (snowflake/timestamp ids with spacing > bucket_size) degenerate to
    one bucket per row, making the totals window corpus-sized; for
    such keys pre-compute a dense rank (one extra shuffle) or pass the
    timestamp's bucket-sized quantization as ``order_col``.
    """
    with_bucket = df.withColumn(
        "__bucket", F.floor(F.col(order_col) / F.lit(bucket_size)).cast("long")
    )
    in_bucket = Window.partitionBy("__bucket").orderBy(order_col)
    cum = with_bucket.withColumn(
        "__cum", F.sum(F.col(token_col).cast("long")).over(in_bucket)
    )
    totals = with_bucket.groupBy("__bucket").agg(
        F.sum(F.col(token_col).cast("long")).alias("__tot")
    ).withColumn(
        "__sb", F.floor(F.col("__bucket") / F.lit(bucket_size)).cast("long")
    # consumed by three subtrees below (within-prefix window, super-
    # bucket totals, and the offset join's probe side) — the lazy
    # barrier keeps the corpus-wide aggregate from executing per
    # consumer. Tiny: corpus/bucket_size rows of three longs.
    ).localCheckpoint(eager=False)
    # exclusive prefix over per-bucket totals, hierarchically: within
    # each superbucket an ordered window (partitioned — never a global
    # sort-to-one-partition), plus a cross-superbucket offset from a
    # non-equi self-join over corpus/bucket_size² rows (exact longs;
    # ~40 rows even at 10^10 documents)
    w_in = Window.partitionBy("__sb").orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    within = totals.withColumn(
        "__within", F.coalesce(F.sum("__tot").over(w_in), F.lit(0).cast("long"))
    )
    sb_totals = totals.groupBy("__sb").agg(F.sum("__tot").alias("__sbt"))
    sb_prev = sb_totals.select(
        F.col("__sb").alias("__sb2"), F.col("__sbt").alias("__sbt2")
    )
    sb_off = (
        sb_totals.join(F.broadcast(sb_prev), F.col("__sb2") < F.col("__sb"), "left")
        .groupBy("__sb")
        .agg(F.coalesce(F.sum("__sbt2"), F.lit(0).cast("long")).alias("__sboff"))
    )
    offsets = within.join(F.broadcast(sb_off), "__sb").select(
        "__bucket", (F.col("__sboff") + F.col("__within")).alias("__offset")
    )
    out = cum.join(F.broadcast(offsets), "__bucket")
    tokens_before = F.col("__offset") + F.col("__cum") - F.col(token_col).cast("long")
    return (
        out.withColumn("tokens_before", tokens_before)
        .withColumn("pack_offset", F.pmod(F.col("tokens_before"), F.lit(seq_len)))
        .withColumn(
            "pack_id",
            ((F.col("tokens_before") - F.col("pack_offset")) / F.lit(seq_len)).cast(
                "long"
            ),
        )
        .drop("__bucket", "__cum", "__offset")
    )

"""Skew-resilient operators.

AQE handles skewed *joins* (``spark.sql.adaptive.skewJoin`` — on in
session.py) and partial aggregation handles skewed *sums*; the gap is
per-key ORDER-dependent work: ``row_number``/top-k over a hot key sends
that key's entire row set to one task. These utilities salt such
operations into two phases so no task ever sees more than
``|key| / salt_buckets`` rows.

Two-phase top-k is exact (top-k of a key = top-k of the union of its
buckets' local top-ks); the salt column derives from a hash of the full
row so it's deterministic, not RNG-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["salted_topk_per_key"]


def salted_topk_per_key(
    df: DataFrame,
    key: str,
    order_by: list[Column],
    k: int,
    salt_buckets: int = 16,
    tiebreak: Column | None = None,
) -> DataFrame:
    """Exact per-key top-k that survives pathological key skew.

    Phase 1 partitions by (key, salt) — a hot key's rows spread over
    ``salt_buckets`` tasks, each keeping a local top-k. Phase 2 ranks
    the ≤ k·salt_buckets survivors per key. Output matches the direct
    ``row_number over (partition by key)`` plan row-for-row (given a
    deterministic total order), at the cost of one extra (tiny) shuffle.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    order = list(order_by) + ([tiebreak] if tiebreak is not None else [])

    w1 = Window.partitionBy(F.col(key), salt).orderBy(*order)
    local = (
        df.withColumn("__local_rn", F.row_number().over(w1))
        .filter(F.col("__local_rn") <= k)
        .drop("__local_rn")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )

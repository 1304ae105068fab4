"""Similarity search over embedding columns (`array<float>`).

Two tiers (north-star requirement):

- **Brute-force cosine top-k** — broadcast the query set, one linear
  scan of the corpus, per-query heap via window top-k. Exact; scales
  to any corpus size (the scan parallelizes; no corpus shuffle at all
  when queries are broadcast).
- **LSH-bucketed ANN** — random-hyperplane signatures bucket the
  corpus; queries probe their bucket (+ optional 1-bit flips). The
  corpus is sharded by bucket in one shuffle, then lookups are
  bucket-local — the 100 TB path where a full scan per query batch is
  too slow.

All arithmetic is sequential double folds over the array (deterministic
and bit-exact vs the DuckDB oracle's list_reduce — verified).
Hyperplanes are derived from xxhash64(plane, dim) so the whole index is
reproducible with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dot", "norm", "cosine", "cosine_topk", "hyperplane_signature", "lsh_bucket_ann"]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    ``broadcast(queries)`` keeps the corpus un-shuffled: each corpus
    partition scores all queries locally; the only exchange is the
    (tiny) per-query candidate set into the window."""
    pairs = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    ).crossJoin(
        F.broadcast(
            queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv"))
        )
    )
    scored = pairs.filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _plane_weight(plane: int | Column, d: Column) -> Column:
    """Deterministic pseudo-random weight in [-1, 1): derived from
    xxhash64(plane, dim) — reproducible across runs and clusters."""
    p = plane if isinstance(plane, Column) else F.lit(plane)
    h = F.xxhash64(p, d)
    return (F.pmod(h, F.lit(2000001)) - F.lit(1000000)).cast("double") / F.lit(1000000.0)


def hyperplane_signature(vec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """n-bit random-hyperplane signature of a vector (int result)."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: vec.getItem(i).cast("double") * _plane_weight(p, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return sig


def lsh_bucket_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    probes: int = 1,
    dim: int = 64,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: compare only within hyperplane buckets.

    ``probes`` > 1 additionally probes buckets at Hamming distance 1
    (flipping the lowest ``probes - 1`` signature bits), trading query
    fan-out for recall. Returns the same schema as cosine_topk."""
    csig = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        hyperplane_signature(F.col(corpus_vec), n_planes, dim).alias("bucket"),
    )
    qsig = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        hyperplane_signature(F.col(query_vec), n_planes, dim).alias("__qsig"),
    )
    probe_sigs = [F.col("__qsig")] + [
        F.col("__qsig").bitwiseXOR(F.lit(1 << b)) for b in range(max(0, probes - 1))
    ]
    probed = qsig.select(
        "query_id", "__qv", F.explode(F.array(*probe_sigs)).alias("bucket")
    )
    scored = (
        csig.join(F.broadcast(probed), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )

"""Heavy hitters — exact distributed top-k frequent items with a
sketch-bounded shuffle (Misra-Gries candidates + exact verify).

The naive exact path (`groupBy(item).count().orderBy(...).limit(k)`)
is already partial-aggregated by Catalyst, but its exchange still
moves one (item, partial_count) pair per distinct item per map task —
at 100 TB of text that is billions of distinct tokens through the
shuffle to answer a top-50 question. The production pattern bounds
the shuffle by the summary size instead of the vocabulary:

1. **Per-partition Misra-Gries summaries** (`mapInPandas`, Arrow
   batches; exact pandas value_counts merged into a dict, truncated
   by the mergeable-summaries rule — subtract the (m+1)-th largest
   count from every entry, keep positives) → ≤ m rows per partition,
   plus one `(None, decremented_mass)` row carrying the partition's
   error bound.
2. **Merge**: one groupBy(item).sum over ≤ P·m rows (P = partitions)
   — the merged counts underestimate true counts by at most the
   summed decrement mass E (Agarwal et al., "Mergeable Summaries",
   PODS 2012: MG summaries merge with additive error bounds).
   Every item with true count > E survives ⇒ candidates ⊇ the true
   top-k whenever the k-th true count exceeds E.
3. **Exact verify**: broadcast the candidate ids, semi-join the item
   stream, exact count of candidates only, deterministic
   (count DESC, item ASC) top-k. The output is EXACT counts — the
   sketch only bounds which items are counted — so the result is
   hash-stable across partitionings whenever the superset guarantee
   holds, and `top_k_frequent` can CHECK that guarantee at runtime
   (k-th exact count > E ⇒ provably equal to the true top-k).

No reference counterpart (the reference has no text analytics); this
is the sketch-tier sibling of operators/sketches.py (COUNT DISTINCT →
HLL; top-k frequent → MG) for the corpus-report tier.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mg_summaries", "top_k_frequent"]

# sentinel item for the per-partition decrement-mass (error bound) row
_ERR = "\0__mg_error__"


def _mg_truncate(counts: dict, m: int) -> tuple[dict, int]:
    """Mergeable-summaries truncation: keep the m largest entries after
    subtracting the (m+1)-th largest count from everything. Returns
    (truncated counts, decremented mass added to the error bound)."""
    if len(counts) <= m:
        return counts, 0
    vals = sorted(counts.values(), reverse=True)
    thr = vals[m]  # (m+1)-th largest
    out = {}
    for item, c in counts.items():
        c2 = c - thr
        if c2 > 0:
            out[item] = c2
    return out, thr  # per-item underestimate grows by ≤ thr per truncation


def mg_summaries(items: DataFrame, col: str, m: int = 4096) -> DataFrame:
    """Per-partition Misra-Gries summaries of the ``col`` item stream.

    Output schema ``(item string, cnt long)``: ≤ m summary rows per
    input partition plus one ``(_ERR, total_decrement)`` row per
    partition whose cnt sums to the global error bound E — merged
    counts underestimate true counts by at most E.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        err = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > 4 * m:
                counts, thr = _mg_truncate(counts, m)
                err += thr
        counts, thr = _mg_truncate(counts, m)
        err += thr
        out = pd.DataFrame(
            {"item": list(counts.keys()) + [_ERR], "cnt": list(counts.values()) + [err]}
        )
        yield out.astype({"item": "string", "cnt": "int64"})

    return items.select(F.col(col).alias(col)).mapInPandas(
        summarize, schema="item string, cnt long"
    )


def top_k_frequent(
    items: DataFrame, col: str, k: int, m: int = 4096
) -> tuple[DataFrame, DataFrame]:
    """Exact top-k frequent items via MG candidates + exact verify.

    Returns ``(topk_df, guarantee_df)``: ``topk_df`` has schema
    ``(item, cnt)`` — EXACT counts, deterministic (cnt DESC, item ASC)
    order; ``guarantee_df`` is a 1-row frame with the summed error
    bound ``error_bound`` and ``provably_exact`` — true iff the k-th
    exact count strictly exceeds the bound, i.e. no excluded item can
    outrank the returned set. The caller decides whether to retry with
    a larger m when the guarantee fails (the testdata corpora hold it
    with wide margin at m=4096; tests pin the bound's soundness at
    adversarially tiny m).
    """
    merged = (
        mg_summaries(items, col, m)
        .groupBy("item")
        .agg(F.sum("cnt").alias("mg_cnt"))
        # consumed by both the error row and the candidate join
        .localCheckpoint(eager=False)
    )
    error_bound = merged.filter(F.col("item") == _ERR).select(
        F.coalesce(F.sum("mg_cnt"), F.lit(0)).alias("error_bound")
    )
    candidates = merged.filter(F.col("item") != _ERR).select("item")
    exact = (
        items.select(F.col(col).alias("item"))
        .join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("item").asc())
        .limit(k)
        .localCheckpoint(eager=False)
    )
    kth = exact.select(F.min("cnt").alias("kth_cnt"), F.count(F.lit(1)).alias("n"))
    # exact iff: no truncation ever happened (bound 0 ⇒ candidates =
    # the full vocabulary, which also covers vocabularies smaller than
    # k), or the k-th exact count strictly beats the bound
    guarantee = kth.crossJoin(error_bound).select(
        "error_bound",
        (
            (F.col("error_bound") == 0)
            | ((F.col("n") == k) & (F.col("kth_cnt") > F.col("error_bound")))
        ).alias("provably_exact"),
    )
    return exact, guarantee

"""Heavy hitters — exact distributed top-k frequent items with a
sketch-bounded shuffle (Misra-Gries candidates + exact verify).

The naive exact path (`groupBy(item).count().orderBy(...).limit(k)`)
is already partial-aggregated by Catalyst, but its exchange still
moves one (item, partial_count) pair per distinct item per map task —
at 100 TB of text that is billions of distinct tokens through the
shuffle to answer a top-50 question. The production pattern bounds
the shuffle by the summary size instead of the vocabulary:

0. **Hash items to int64 JVM-side** (`xxhash64`) before anything
   crosses into Python: Arrow then moves 8-byte longs instead of
   strings and the pandas fold runs on int64 (both several times
   faster), and the merge/verify joins carry longs. A hash collision
   only MERGES two items' counts in the sketch — counts never shrink,
   so the candidate-superset guarantee below survives collisions
   unconditionally; the exact verify counts REAL items (grouped by
   the original column), so collisions cannot corrupt the output.
1. **Per-partition Misra-Gries summaries** (`mapInPandas`, Arrow
   batches; per-batch value_counts folded vectorized, truncated by
   the mergeable-summaries rule — subtract the (m+1)-th largest
   count from every entry, keep positives) → ≤ m rows per partition,
   plus one `(null, decremented_mass)` row carrying the partition's
   error bound.
2. **Merge**: one groupBy(hash).sum over ≤ P·m rows (P = partitions)
   — the merged counts underestimate true counts by at most the
   summed decrement mass E (Agarwal et al., "Mergeable Summaries",
   PODS 2012: MG summaries merge with additive error bounds).
   Every item with true count > E survives ⇒ candidates ⊇ the true
   top-k whenever the k-th true count exceeds E.
3. **Exact verify**: broadcast the candidate hashes, semi-join the
   item stream on its hash, exact count of candidates only,
   deterministic (count DESC, item ASC) top-k. The output is EXACT
   counts — the sketch only bounds which items are counted — so the
   result is hash-stable across partitionings whenever the superset
   guarantee holds, and `top_k_frequent` CHECKS that guarantee at
   runtime (k-th exact count > E ⇒ provably equal to the true
   top-k; an excluded hash bounds every colliding item's count).

No reference counterpart (the reference has no text analytics); this
is the sketch-tier sibling of operators/sketches.py (COUNT DISTINCT →
HLL; top-k frequent → MG) for the corpus-report tier.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "mg_summaries",
    "exact_topk_from_state",
    "top_k_frequent",
    "empty_hh_state",
    "merge_hh_state",
    "hh_state_report",
]


def _mg_truncate(counts: "pd.Series", m: int) -> tuple["pd.Series", int]:
    """Mergeable-summaries truncation: keep the m largest entries after
    subtracting the (m+1)-th largest count from everything. Returns
    (truncated counts, decrement added to the error bound). Vectorized
    (nlargest + boolean mask)."""
    if len(counts) <= m:
        return counts, 0
    thr = int(counts.nlargest(m + 1).iloc[-1])  # (m+1)-th largest
    out = counts[counts > thr] - thr
    return out, thr  # per-item underestimate grows by ≤ thr per truncation


def mg_summaries(items: DataFrame, col: str, m: int = 4096) -> DataFrame:
    """Per-partition Misra-Gries summaries of the ``col`` item stream,
    keyed by ``xxhash64(col)``.

    Output schema ``(h long, cnt long)``: ≤ m summary rows per input
    partition plus one ``(null, decremented_mass)`` row per partition
    whose cnt sums to the global error bound E — merged counts
    underestimate true (per-hash) counts by at most E.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Accumulate RAW int64 arrays and fold with one np.unique per
        # ~4M-row chunk (a single vectorized count beats per-batch
        # value_counts by an order of magnitude; Arrow transfer is then
        # the dominant cost). Memory stays bounded: ≤ chunk_rows × 8 B
        # of raw hashes plus a ≤ 4m-entry merged summary.
        import numpy as np

        chunk_rows = 4_000_000
        merged = pd.Series(dtype="int64")
        pending: list = []
        pending_rows = 0
        err = 0

        def fold(merged, pending, err):
            vals, cnts = np.unique(np.concatenate(pending), return_counts=True)
            s = pd.concat([merged, pd.Series(cnts, index=vals)])
            merged = s.groupby(level=0).sum()
            if len(merged) > 4 * m:
                merged, thr = _mg_truncate(merged, m)
                err += thr
            return merged, err

        for pdf in batches:
            arr = pdf["h"].to_numpy()
            pending.append(arr)
            pending_rows += len(arr)
            if pending_rows >= chunk_rows:
                merged, err = fold(merged, pending, err)
                pending, pending_rows = [], 0
        if pending:
            merged, err = fold(merged, pending, err)
        merged, thr = _mg_truncate(merged, m)
        err += thr
        # nullable Int64 for the hash column: a plain list with None
        # would coerce to float64 and silently destroy the low bits of
        # the 64-bit hashes
        out = pd.DataFrame(
            {
                "h": pd.array(list(merged.index) + [None], dtype="Int64"),
                "cnt": list(merged.astype("int64")) + [err],
            }
        )
        yield out.astype({"cnt": "int64"})

    hashed = items.select(F.xxhash64(F.col(col)).alias("h"))
    return hashed.mapInPandas(summarize, schema="h long, cnt long")


def exact_topk_from_state(
    items: DataFrame, summaries: DataFrame, col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """Steps 2-3 over ANY ``(h, cnt)`` summary rows — fresh per-partition
    summaries (top_k_frequent) or persisted LSM state rows (the corpus
    pipeline's ``_hh_state``): merge by sum, exact-verify broadcast
    candidates against the item stream, return ``(topk_df,
    guarantee_df)``. ``topk_df`` has schema ``(item, cnt)`` — EXACT
    counts, deterministic (cnt DESC, item ASC) order; ``guarantee_df``
    is a 1-row frame with the summed error bound ``error_bound`` and
    ``provably_exact`` — true iff the k-th exact count strictly
    exceeds the bound, i.e. no excluded item can outrank the returned
    set (an excluded HASH upper-bounds every item colliding into it,
    so the check is collision-safe)."""
    merged = (
        summaries.groupBy("h")
        .agg(F.sum("cnt").alias("mg_cnt"))
        # consumed by both the error row and the candidate join
        .localCheckpoint(eager=False)
    )
    error_bound = merged.filter(F.col("h").isNull()).select(
        F.coalesce(F.sum("mg_cnt"), F.lit(0)).alias("error_bound")
    )
    candidates = merged.filter(F.col("h").isNotNull()).select("h")
    exact = (
        items.select(F.col(col).alias("item"), F.xxhash64(F.col(col)).alias("h"))
        .join(F.broadcast(candidates), "h", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("item").asc())
        .limit(k)
        .localCheckpoint(eager=False)
    )
    kth = exact.select(F.min("cnt").alias("kth_cnt"), F.count(F.lit(1)).alias("n"))
    # exact iff: no truncation ever happened (bound 0 ⇒ candidates =
    # the full hashed vocabulary, which also covers vocabularies
    # smaller than k), or the k-th exact count strictly beats the bound
    guarantee = kth.crossJoin(error_bound).select(
        "error_bound",
        (
            (F.col("error_bound") == 0)
            | ((F.col("n") == k) & (F.col("kth_cnt") > F.col("error_bound")))
        ).alias("provably_exact"),
    )
    return exact, guarantee


def top_k_frequent(
    items: DataFrame, col: str, k: int, m: int = 4096
) -> tuple[DataFrame, DataFrame]:
    """Exact top-k frequent items via MG candidates + exact verify
    (steps 0-3 of the module docstring): fresh per-partition summaries
    folded through :func:`exact_topk_from_state`. The caller decides
    whether to retry with a larger m when the guarantee fails (the
    testdata corpora hold it with wide margin at m=4096; tests pin the
    bound's soundness at adversarially tiny m)."""
    return exact_topk_from_state(items, mg_summaries(items, col, m), col, k)


# --- Incremental state tier (batch-maintained MG summaries) ---------------
#
# MG summaries are mergeable (the property that makes step 2 above
# correct), so they also serve as BATCH-MAINTAINED state: keep one
# summary-sized (h, cnt) frame per corpus, union each new batch's
# per-partition summaries into it, and re-truncate — the fifth
# maintained-aggregate class next to SUM/COUNT (delta), MIN/MAX
# (dirty-group hybrid), COUNT DISTINCT (HLL union), and histograms
# (bucket deltas): frequency top-k under append-only streams. The
# accumulated error bound rides the state as the null-hash row, so any
# epoch can check "item X provably heavy?" without rescanning history.


def empty_hh_state(spark) -> DataFrame:
    """An empty maintained heavy-hitter state ``(h long, cnt long)``."""
    from pyspark.sql import types as T

    return spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("h", T.LongType(), True),
                T.StructField("cnt", T.LongType(), False),
            ]
        ),
    )


def merge_hh_state(
    state: DataFrame, batch_items: DataFrame, col: str, m: int = 4096
) -> DataFrame:
    """One maintenance step: fold a new batch's MG summaries into the
    persisted state and re-truncate.

    All inputs to the union are summary-sized (state ≤ 4m rows, batch
    summaries ≤ P·m rows), so the merge shuffles bounded rows no
    matter how large the batch or how long the history. Truncation is
    expressed Spark-side (the (m+1)-th largest via a bounded
    TakeOrderedAndProject + 1-row broadcast — no driver collect): when
    the merged summary exceeds 4m entries, subtract that threshold
    from every entry, drop non-positives, and ADD it to the null-hash
    error row — the invariant ``true_count(h) − state_count(h) ≤
    error_row`` holds across any number of maintenance steps (MG
    merge bound, Agarwal et al. PODS 2012)."""
    delta = mg_summaries(batch_items, col, m)
    merged = (
        state.unionByName(delta)
        .groupBy("h")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    entries = merged.filter(F.col("h").isNotNull())
    # (m+1)-th largest entry value, 0 when no truncation is needed —
    # a bounded top-(m+1) (TakeOrderedAndProject) then a 1-row agg
    thr_df = (
        entries.select("cnt")
        .orderBy(F.col("cnt").desc())
        .limit(m + 1)
        .agg(
            F.when(F.count(F.lit(1)) >= m + 1, F.min("cnt"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("__thr")
        )
    )
    n_entries = entries.count()  # summary-sized; decides truncation
    if n_entries <= 4 * m:
        return merged
    truncated = (
        entries.crossJoin(F.broadcast(thr_df))
        .select("h", (F.col("cnt") - F.col("__thr")).alias("cnt"))
        .filter(F.col("cnt") > 0)
    )
    err = (
        merged.filter(F.col("h").isNull())
        .crossJoin(F.broadcast(thr_df))
        .select("h", (F.col("cnt") + F.col("__thr")).alias("cnt"))
    )
    return truncated.unionByName(err)


def hh_state_report(state: DataFrame, k: int) -> DataFrame:
    """Top-k heavy hitters straight off the maintained state: hash,
    count lower bound, the state's error bound (count upper bound =
    lower + bound), and whether the entry is PROVABLY heavier than
    every hash absent from the state (lower bound > error bound)."""
    bound = state.filter(F.col("h").isNull()).select(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("error_bound")
    )
    return (
        state.filter(F.col("h").isNotNull())
        .orderBy(F.col("cnt").desc(), F.col("h").asc())
        .limit(k)
        .crossJoin(F.broadcast(bound))
        .select(
            "h",
            F.col("cnt").alias("cnt_lower"),
            (F.col("cnt") + F.col("error_bound")).alias("cnt_upper"),
            "error_bound",
            (F.col("cnt") > F.col("error_bound")).alias("provably_heavy"),
        )
    )

"""Heavy-hitter operator (operators/heavy_hitters.py): MG candidates +
exact verify. Pinned: equality with the naive exact top-k when the
runtime guarantee holds, soundness of the merged error bound at
adversarially tiny summary sizes, partitioning invariance of the
final (exact-count) answer, and the no-truncation fast path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.heavy_hitters import (
    mg_summaries,
    top_k_frequent,
)


def _zipfish(spark, n_items: int = 200, scale: int = 2000):
    """Deterministic Zipf-ish item stream: item_i repeated scale//(i+1)
    times — heavy head, long tail."""
    rows = []
    for i in range(n_items):
        rows.extend([(f"item_{i:04d}",)] * max(1, scale // (i + 1)))
    return spark.createDataFrame(rows, ["token"]).repartition(8)


def _naive_topk(df, k):
    return (
        df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
        .collect()
    )


def test_matches_naive_exact_topk(spark):
    df = _zipfish(spark)
    topk, guarantee = top_k_frequent(df, "token", k=10, m=512)
    g = guarantee.collect()[0]
    assert g["provably_exact"]
    got = [(r["item"], r["cnt"]) for r in topk.collect()]
    want = [(r["token"], r["cnt"]) for r in _naive_topk(df, 10)]
    assert got == want


def test_error_bound_sound_at_tiny_m(spark):
    """With m far below the vocabulary, excluded items must all have
    true count ≤ the reported bound (the mergeable-summaries
    guarantee), and surviving merged counts underestimate truth.
    Summaries are keyed by xxhash64, so truth is compared per hash."""
    df = _zipfish(spark, n_items=500, scale=3000)
    merged = (
        mg_summaries(df, "token", m=16)
        .groupBy("h")
        .agg(F.sum("cnt").alias("mg_cnt"))
        .collect()
    )
    bound = sum(r["mg_cnt"] for r in merged if r["h"] is None)
    survivors = {r["h"]: r["mg_cnt"] for r in merged if r["h"] is not None}
    truth = {
        r["h"]: r["cnt"]
        for r in df.groupBy(F.xxhash64("token").alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert bound > 0  # m=16 over 500 items must truncate
    for h, true_cnt in truth.items():
        if h not in survivors:
            assert true_cnt <= bound, (h, true_cnt, bound)
        else:
            assert survivors[h] <= true_cnt  # never overestimates


def test_partitioning_invariance_when_guaranteed(spark):
    df = _zipfish(spark)
    outs = []
    for parts in (2, 16):
        topk, guarantee = top_k_frequent(df.repartition(parts), "token", k=8, m=512)
        assert guarantee.collect()[0]["provably_exact"]
        outs.append([(r["item"], r["cnt"]) for r in topk.collect()])
    assert outs[0] == outs[1]


def test_no_truncation_fast_path_small_vocab(spark):
    """Vocabulary below m: bound 0, provably exact even when the
    vocabulary is smaller than k."""
    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3 + [("c",)], ["token"])
    topk, guarantee = top_k_frequent(df, "token", k=50, m=64)
    g = guarantee.collect()[0]
    assert g["error_bound"] == 0 and g["provably_exact"]
    assert [(r["item"], r["cnt"]) for r in topk.collect()] == [
        ("a", 5),
        ("b", 3),
        ("c", 1),
    ]


def test_guarantee_degrades_honestly(spark):
    """At an m so small the k-th count cannot beat the bound, the
    operator must SAY so rather than claim exactness (output may still
    be correct — the flag is about provability)."""
    df = _zipfish(spark, n_items=1000, scale=1000)
    _topk, guarantee = top_k_frequent(df.repartition(16), "token", k=100, m=8)
    g = guarantee.collect()[0]
    assert g["error_bound"] > 0
    assert not g["provably_exact"]


# --- incremental state tier ------------------------------------------------

from cdc_historical_warehouse_platform_spark.operators.heavy_hitters import (  # noqa: E402
    empty_hh_state,
    hh_state_report,
    merge_hh_state,
)


def test_hh_state_bound_sound_across_batches(spark):
    """After folding B batches into the maintained state, every hash
    absent from the state must have true total count ≤ the state's
    error row, present hashes never overestimate truth, and the state
    stays bounded (≤ 4m entries). Uses m far below the vocabulary so
    truncation actually fires across merges."""
    m = 16
    state = empty_hh_state(spark)
    batches = [
        _zipfish(spark, n_items=300, scale=1500),
        _zipfish(spark, n_items=400, scale=2500),
        _zipfish(spark, n_items=200, scale=1000),
    ]
    for b in batches:
        state = merge_hh_state(state, b, "token", m=m).localCheckpoint(eager=True)
    rows = state.collect()
    bound = sum(r["cnt"] for r in rows if r["h"] is None)
    survivors = {r["h"]: r["cnt"] for r in rows if r["h"] is not None}
    assert bound > 0
    assert len(survivors) <= 4 * m
    total = batches[0]
    for b in batches[1:]:
        total = total.unionByName(b)
    truth = {
        r["h"]: r["cnt"]
        for r in total.groupBy(F.xxhash64("token").alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for h, cnt in truth.items():
        if h not in survivors:
            assert cnt <= bound, (h, cnt, bound)
        else:
            assert survivors[h] <= cnt


def test_hh_state_report_provably_heavy(spark):
    """With ample m the state carries exact counts (bound may be >0
    from within-pass truncation only when m is small; here it is 0)
    and the report marks the head provably heavy with tight bounds."""
    state = empty_hh_state(spark)
    for _ in range(2):
        state = merge_hh_state(
            state, _zipfish(spark, n_items=100, scale=1000), "token", m=1024
        ).localCheckpoint(eager=True)
    rep = hh_state_report(state, k=5).collect()
    assert len(rep) == 5
    assert all(r["provably_heavy"] for r in rep)
    assert rep[0]["error_bound"] == 0
    # head item appeared 1000× per batch → exact 2000 when bound is 0
    top = (
        _zipfish(spark, n_items=100, scale=1000)
        .groupBy("token")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]
    )
    assert rep[0]["cnt_lower"] == 2 * top["count"]

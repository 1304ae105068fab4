#!/usr/bin/env python
"""Stress the r6 fourth-batch operators far beyond the driver testdata:

1. **PageRank** (operators/graph.py): a synthetic power-law-ish
   bipartite graph of N_EDGES undirected edges, ranked for 3
   iterations under TWO different partitionings — asserts the rank
   vectors are bit-identical (the integer-arithmetic determinism
   claim at scale) and reports edges/iteration/s. Each iteration is
   one join + one groupBy on the node key: the shuffle volume is the
   (dst, contrib) stream, never the rank history.

2. **Gaps-and-islands** (events_gap_islands shape): N_ROWS (user,
   day) activity rows over U users — asserts island day-sums
   reconcile with the distinct-day count per user (every active day
   lands in exactly one island) and total islands = distinct days
   minus consecutive pairs, then reports rows/s. The window is
   user-partitioned; skew is bounded by days-per-user, not N.

3. **Exact z-score flags** (events_anomaly_zscore shape): N_ROWS
   values with planted 6σ outliers — asserts every planted outlier is
   flagged, no in-band row is flagged, and the DECIMAL(38,0) products
   survive n ≫ int64-cent scale. Stats agg is map-side combined; the
   fact side is never shuffled (broadcast stats join).

4. **ExactSubstr dedup** (operators/dedup.exact_substring_spans):
   N_DOCS synthetic 40-token docs, 1% of them carrying one of 100
   planted 25-token boilerplate phrases — asserts every planted doc
   (and ONLY planted docs) gets a span covering the phrase, and
   reports gram throughput. The gram window shuffle is the method's
   inherent cost; the planted phrases are the realistic hot-gram skew
   (each repeated N_DOCS/10000 times).

Usage: python scripts/stress_r6d.py [edges] [rows] [users] [docs]

Evidence tooling, not a pytest (runs minutes at large N).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.graph import pagerank
from cdc_historical_warehouse_platform_spark.session import get_spark


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    n_users = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    n_docs = int(sys.argv[4]) if len(sys.argv) > 4 else 1_000_000
    spark = get_spark(app_name="stress-r6d")
    out: dict = {"edges": n_edges, "rows": n_rows, "users": n_users, "docs": n_docs}

    # --- 1. PageRank determinism + throughput -------------------------
    # bipartite customer(0..C-1)*2 <-> supplier 2k+1; xxhash gives a
    # skewed-but-deterministic degree distribution
    c = max(n_edges // 20, 1)
    s = max(n_edges // 2_000, 1)
    pairs = (
        spark.range(n_edges)
        .select(
            (F.pmod(F.xxhash64("id"), F.lit(c)) * 2).alias("cust"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(s)) * 2 + 1).alias("supp"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
        .unionAll(pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst")))
        .localCheckpoint(eager=True)
    )
    n_und = edges.count()
    t0 = time.perf_counter()
    # order-insensitive digest: xxhash per row, summed in DECIMAL (a
    # BIGINT sum of hashes overflows int64 under ANSI)
    digest = [
        F.sum(F.col("rank")).alias("mass"),
        F.sum(F.xxhash64("node", "rank").cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ]
    r1 = pagerank(edges.repartition(64, "src"), iterations=3)
    h1 = r1.agg(*digest).collect()[0]
    t_pr = time.perf_counter() - t0
    r2 = pagerank(edges.repartition(7), iterations=3)
    h2 = r2.agg(*digest).collect()[0]
    assert (h1["h"], h1["mass"], h1["n"]) == (h2["h"], h2["mass"], h2["n"]), (
        "pagerank not partition-invariant at scale"
    )
    out["pagerank"] = {
        "undirected_edges": n_und,
        "nodes": h1["n"],
        "sec_3iter": round(t_pr, 2),
        "edges_per_iter_s": int(n_und * 3 / t_pr),
    }

    # --- 2. gaps-and-islands reconciliation ---------------------------
    days = (
        spark.range(n_rows)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(n_users)).alias("user_id"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(730)).alias("day_idx"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_days = days.count()
    t0 = time.perf_counter()
    w = Window.partitionBy("user_id").orderBy("day_idx")
    islands = (
        days.withColumn("island", F.col("day_idx") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("n_days"))
    )
    agg = islands.agg(
        F.count(F.lit(1)).alias("n_islands"), F.sum("n_days").alias("covered")
    ).collect()[0]
    t_gi = time.perf_counter() - t0
    assert agg["covered"] == n_days, "island day-sum must cover every active day"
    # islands = distinct days − consecutive (user, d, d+1) pairs
    nxt = days.select("user_id", (F.col("day_idx") + 1).alias("day_idx"))
    n_consec = days.join(nxt, ["user_id", "day_idx"], "left_semi").count()
    assert agg["n_islands"] == n_days - n_consec, "island count identity failed"
    out["gap_islands"] = {
        "distinct_user_days": n_days,
        "islands": agg["n_islands"],
        "sec": round(t_gi, 2),
        "rows_s": int(n_days / t_gi),
    }

    # --- 3. exact z-score flags: planted recall at scale --------------
    n_out = 1000
    base = spark.range(n_rows).select(
        F.col("id"),
        F.lit("t").alias("event_type"),
        # in-band cents: uniform 0..9999; planted rows sit far outside
        F.when(F.col("id") < n_out, F.lit(1_000_000))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .alias("c"),
    )
    t0 = time.perf_counter()
    stats = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    dev = (F.col("n") * F.col("c") - F.col("s")).cast("decimal(38,0)")
    var_n2 = (
        F.col("n").cast("decimal(38,0)") * F.col("q").cast("decimal(38,0)")
        - F.col("s").cast("decimal(38,0)") * F.col("s").cast("decimal(38,0)")
    )
    flagged = (
        base.join(F.broadcast(stats), "event_type")
        .filter(dev * dev > F.lit(36) * var_n2)  # k=6
        .agg(
            F.count(F.lit(1)).alias("n_flagged"),
            F.sum(F.when(F.col("id") < n_out, 1).otherwise(0)).alias("planted_hit"),
        )
        .collect()[0]
    )
    t_z = time.perf_counter() - t0
    assert flagged["planted_hit"] == n_out, "planted 6-sigma outliers must all flag"
    assert flagged["n_flagged"] == n_out, "no in-band row may flag at k=6"
    out["zscore"] = {"sec": round(t_z, 2), "rows_s": int(n_rows / t_z)}

    # --- 4. ExactSubstr dedup: planted boilerplate at scale ----------
    from cdc_historical_warehouse_platform_spark.operators.dedup import exact_substring_spans

    k = 25
    # unique filler: 40 tokens derived from the doc id — no accidental
    # cross-doc k-grams. Planted docs (id % 100 == 0) append one of
    # 100 boilerplate phrases, each repeated ~n_docs/10000 times.
    filler = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(F.lit("u"), F.conv(F.xxhash64(F.col("id"), i), 10, 16)),
    )
    phrase = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.concat(F.lit("bp"), (F.pmod(F.col("id"), F.lit(10_000)) / 100).cast("long"), F.lit("_"), i),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.when(F.col("id") % 100 == 0, F.concat(filler, phrase)).otherwise(filler),
            " ",
        ).alias("text"),
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    spans = exact_substring_spans(docs, k=k)
    res = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when((F.col("span_start") == 41) & (F.col("span_end") == 40 + k), 1).otherwise(0)).alias("exact_cover"),
        F.count_distinct(F.col("doc_id")).alias("docs_with_spans"),
    ).collect()[0]
    t_es = time.perf_counter() - t0
    planted = n_docs // 100
    assert res["docs_with_spans"] == planted, (res, planted)
    assert res["n_spans"] == planted and res["exact_cover"] == planted, res
    n_grams = docs.select(F.sum(F.greatest(F.size(F.split("text", " ")) - k + 1, F.lit(0)))).collect()[0][0]
    out["exact_substring"] = {
        "planted_docs": planted,
        "grams": n_grams,
        "sec": round(t_es, 2),
        "grams_s": int(n_grams / t_es),
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

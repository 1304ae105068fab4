#!/usr/bin/env python
"""sf1 scaling rehearsal (r12, verdict stretch): materialize a 10x
replica of /root/testdata/sf0.1 (~6M lineitem rows, 500K orders, 50K
docs) and run the bench HEADLINE registry rows at BOTH scales in one
session, reporting the warm sf1/sf0.1 ratio per row — the measured
datapoint behind the "would this plan survive a 10x/100x scale-up"
design claims. A row scaling ~linearly (ratio <= ~12 with fixed
partitioning and constant overheads) is behaving; a superlinear row
names a plan that found a ceiling.

Replication preserves join shape: every key column shifts by
replica * 1e9 so each replica joins within itself (selectivities and
group cardinalities scale linearly, like a bigger crawl, not like a
hotter key). Document texts get a per-replica token prefix woven into
EVERY token, so shingle/dedup rows see 10x genuinely-distinct text
rather than a 45-pairs-per-clone-group blowup that would distort the
read. region/nation stay single-copy (bounded dimensions at any SF).

Usage: python scripts/rehearse_sf1.py [out_dir] — one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# 10 by default (sf1); REHEARSE_REPLICAS=100 gives the sf10 (100x)
# decade. REHEARSE_ROWS=a,b,c restricts the row set (the heavy corpus
# rows dominate a 100x pass); REHEARSE_WARM sets warm passes per side.
REPLICAS = int(os.environ.get("REHEARSE_REPLICAS", "10"))
ROWS_FILTER = [r for r in os.environ.get("REHEARSE_ROWS", "").split(",") if r]
WARM_PASSES = int(os.environ.get("REHEARSE_WARM", "2"))
OFFSET = 1_000_000_000

# key columns to shift per table (referential integrity within replica)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLETON = ["region", "nation"]


def build_sf1(spark, out: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for t in SINGLETON:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    for t, keys in KEYS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        # replicate via explode, not an N-way union — one linear pass
        # whose plan depth is constant in REPLICAS (a 100-way union
        # would build a 100-leaf plan just to generate test data)
        cols = df.columns
        scaled = df.withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        for k in keys:
            scaled = scaled.withColumn(
                k, F.col(k) + F.col("__i").cast("bigint") * F.lit(OFFSET)
            )
        if t == "events":
            # shift each replica's clock by a disjoint year so the
            # stream models a LONGER COLLECTION PERIOD at constant
            # event density — the shape real growth has. Stacking 100
            # replicas into the same hours instead multiplies pure
            # range-join pair density by replicas^2 (an inherently
            # quadratic OUTPUT no engine avoids): at 100x that is
            # 10,000x the sf0.1 result set, which says nothing about
            # plan scalability.
            # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the
            # cast round-trip is lossless under the session's UTC tz
            scaled = scaled.withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    + F.col("__i").cast("long") * F.lit(31_536_000_000_000)
                ).cast("timestamp_ntz"),
            )
        if t == "documents":
            # weave the replica id into every CONTENT token so
            # cross-replica shingles (and exact fingerprints) never
            # match — REPLICAS x genuinely-distinct text, not clones.
            # STOPWORDS pass through unchanged so the quality metrics
            # (stopword ratio, token count, punctuation) keep their
            # real distribution: an every-token weave flunks ~all
            # replica docs at the quality gate, and any write-path
            # "100x" then dedups only the surviving slice (found by
            # the r12 sf10 corpus-build experiment). Stopword-only
            # shingles DO repeat across replicas — exactly the
            # stop-shingle class the dedup tier's df-cap exists for.
            # Replica 0 keeps the original text.
            from cdc_historical_warehouse_platform_spark.operators.text import STOPWORDS

            woven = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda tok: F.when(
                        (tok == "") | F.lower(tok).isin(*STOPWORDS), tok
                    ).otherwise(F.concat(F.lit("r"), F.col("__i"), tok)),
                ),
                " ",
            )
            scaled = scaled.withColumn(
                "text",
                F.when(F.col("__i") == 0, F.col("text")).otherwise(woven),
            ).withColumn("n_chars", F.length("text"))
        # explode interleaves replicas row-by-row, which destroys the
        # key clustering real data growth would keep (and with it
        # parquet min/max pruning + shuffle compressibility) — measured
        # +3.5x on join_revenue_by_nation vs replica-major layout. A
        # gen-time sort on the leading key restores the layout a real
        # 10x/100x crawl would have.
        scaled.select(*cols).orderBy(keys[0]).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"

    # local[32] shares ONE heap across all executor threads; at the
    # 100x decade the default 8g is ~250 MB/task — far below what any
    # real cluster gives an executor core. Size the heap like the
    # cluster the rehearsal stands in for (override via env).
    if REPLICAS >= 50:
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(
        app_name="rehearse-sf1",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    t0 = time.perf_counter()
    build_sf1(spark, out)
    gen_sec = round(time.perf_counter() - t0, 1)

    import __spark_entry__ as entrymod
    from bench import HEADLINE

    registry = entrymod.queries()

    def run(name: str, sf_dir: str) -> float:
        t = time.perf_counter()
        registry[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t, 3)

    rows = [n for n in HEADLINE if not ROWS_FILTER or n in ROWS_FILTER]
    results: dict[str, dict] = {}
    for name in rows:
        base_cold = run(name, SRC)
        base = min(run(name, SRC) for _ in range(WARM_PASSES))
        big_cold = run(name, out)
        big = min(run(name, out) for _ in range(WARM_PASSES))
        results[name] = {
            "sf0.1_warm": base,
            "sf1_warm": big,
            "ratio": round(big / max(base, 1e-9), 2),
            "sf0.1_cold": base_cold,
            "sf1_cold": big_cold,
        }
        print(
            f"# {name}: {base:.2f}s -> {big:.2f}s (x{results[name]['ratio']})",
            file=sys.stderr,
        )

    ratios = sorted(r["ratio"] for r in results.values())
    summary = {
        "metric": "sf1_rehearsal",
        "replicas": REPLICAS,
        "warm_passes": WARM_PASSES,
        "rows_run": len(rows),
        "gen_sec": gen_sec,
        "rows": results,
        "ratio_median": ratios[len(ratios) // 2],
        "ratio_max": max(ratios),
        # superlinear = wall grows faster than data (with headroom for
        # fixed costs amortizing differently): ratio > 1.5x the data
        # multiple flags a plan that found a ceiling
        "superlinear_rows": sorted(
            n for n, r in results.items() if r["ratio"] > 1.5 * REPLICAS
        ),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(summary))
    if os.environ.get("REHEARSE_KEEP") != "1":
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Bulk-append stress for the incremental ExactSubstr index.

Proves the r7 verdict's done-criteria for removing the broadcast
ceiling (VERDICT r7 "Next round #2"):

1. a batch whose gram set EXCEEDS the broadcast threshold appends via
   the shuffle (co-partitioned bucketed) probe,
2. rebuild-equivalence stays exact: incremental spans == from-scratch
   exact_substring_spans over the union corpus,
3. the store-side Exchange is provably absent from the probe plan
   (bucketed scan feeds the join; the plan's only Exchange is on the
   probe side).

Usage: python scripts/stress_substr.py [N_DOCS] [TOKENS_PER_DOC]
Defaults 30_000 x 200 = ~5.4M grams (well past the forced 100k-gram
broadcast limit used here; the production default limit is 2M).
Prints ONE JSON line; every check is a hard assert.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cdc_historical_warehouse_platform_spark.operators.dedup import (  # noqa: E402
    exact_substring_spans,
)
from cdc_historical_warehouse_platform_spark.sources.substr_index import (  # noqa: E402
    ExactSubstrIndex,
)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 200
K = 20
BUCKETS = 32
LIMIT = 100_000  # forced-low broadcast gram limit: the bulk batch must exceed it


def synth_docs(spark, lo: int, hi: int, dup_every: int):
    """Docs of TOKENS tokens; every ``dup_every``-th doc plants a
    shared K+5-token run (cross-doc duplicate spans exist by
    construction). Token streams are doc-unique otherwise."""
    run = " ".join(f"dup{j}" for j in range(K + 5))
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % dup_every == 0,
                F.concat(
                    F.lit(run + " "),
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(1), F.lit(TOKENS - K - 5)),
                            lambda i: F.concat_ws(
                                "_", F.lit("t"), F.col("id"), i
                            ),
                        ),
                        " ",
                    ),
                ),
            )
            .otherwise(
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(TOKENS)),
                        lambda i: F.concat_ws("_", F.lit("t"), F.col("id"), i),
                    ),
                    " ",
                )
            )
            .alias("text"),
        )
    )


def spans_digest(df):
    row = (
        df.select(
            F.sum(
                F.xxhash64("doc_id", "span_start", "span_end", "n_positions")
                .cast("decimal(38,0)")
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()
    )
    return (row["n"], int(row["h"] or 0))


def main() -> int:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    out = {"n_docs": N_DOCS, "tokens_per_doc": TOKENS, "k": K}
    root = tempfile.mkdtemp(prefix="xs_stress_")
    idx = ExactSubstrIndex(root + "/xs", k=K, num_buckets=BUCKETS)

    # seed batch (broadcast path), then the BULK batch
    seed = synth_docs(spark, 0, max(N_DOCS // 10, 100), 7)
    bulk = synth_docs(spark, N_DOCS, 2 * N_DOCS, 5)
    t0 = time.time()
    r1 = idx.append(seed, txn_id="seed", broadcast_gram_limit=LIMIT)
    out["seed_mode"] = r1["probe_mode"]
    t1 = time.time()
    r2 = idx.append(bulk, txn_id="bulk", broadcast_gram_limit=LIMIT)
    out["bulk_mode"] = r2["probe_mode"]
    out["bulk_append_sec"] = round(time.time() - t1, 2)
    out["seed_append_sec"] = round(t1 - t0, 2)
    assert r2["probe_mode"] == "shuffle", (
        f"bulk batch must exceed the {LIMIT}-gram broadcast limit: {r2}"
    )

    # (2) rebuild equivalence at scale: digest of incremental spans ==
    # digest of a from-scratch pass over the union corpus
    inc = spans_digest(idx.spans(spark))
    full = spans_digest(
        exact_substring_spans(seed.unionByName(bulk), k=K)
    )
    out["spans"] = inc[0]
    assert inc == full, f"incremental {inc} != from-scratch {full}"
    assert inc[0] > 0, "fixture planted no spans"

    # (3) plan proof: per-segment probe keeps the store Exchange-free.
    # autoBroadcast off: this models the bulk regime where the probe
    # is past the broadcast budget (Catalyst would otherwise BHJ the
    # small test probe — also store-Exchange-free, but not the plan
    # under test)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    probe = (
        bulk.selectExpr("md5(text) as g")
        .repartition(BUCKETS, "g")
        .distinct()
    )
    segs = idx.unique.segments(spark)
    out["unique_segments"] = len(segs)
    for seg in segs:
        plan = (
            seg.join(probe, "g", "semi")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan

    # (4) maintenance at scale: compact drops dead frontier rows and
    # merges dup segments; vacuum reclaims superseded versions; spans
    # must be byte-identical throughout
    t4 = time.time()
    c = idx.compact(spark)
    out["compact_sec"] = round(time.time() - t4, 2)
    out["compact_rows_dropped"] = c["rows_before"] - c["rows_after"]
    assert c["rows_after"] <= c["rows_before"]
    idx.vacuum(keep_last=1)
    assert spans_digest(idx.spans(spark)) == inc, "maintenance changed spans"

    out["ok"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

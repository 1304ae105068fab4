"""Beyond-broadcast-budget stress (r9, verdict r8 task #7).

stress_substr/stress_r8 prove bulk-vs-broadcast PARITY at sizes where
broadcast still works; this script exercises the regime the bulk path
exists FOR — a batch whose broadcast probe genuinely FAILS:

- the session pins ``spark.driver.maxResultSize`` low (a broadcast
  relation is built from a driver-side collect, so an over-budget
  probe set raises instead of silently degrading — the scaled-down
  stand-in for the 8 GB broadcast ceiling),
- the FORCED broadcast append must RAISE,
- the shuffle (co-partitioned bucketed) append of the SAME batch must
  complete — replaying the torn broadcast attempt's txn order-free —
  with results identical to ground truth:
  * ExactSubstr: incremental spans digest == from-scratch
    exact_substring_spans over the union corpus,
  * corpus: kept new ids == exactly the fresh half that passes the
    quality gate (the dup half is exact-fingerprint dead by
    construction).

Usage: python scripts/stress_r9.py [N_DOCS] [TOKENS_PER_DOC] [N_CORPUS_BATCH]
Defaults 30_000 x 200 (~5.4M grams) and a 700_000-doc corpus batch
with maxResultSize=10m (the corpus broadcast probe collects the
batch's distinct fingerprint set — ~32 B/doc serialized — so ~350k+
fresh docs blow the scaled budget). Quick: `python
scripts/stress_r9.py 8000 120 700000` (~3 min; the corpus phase
dominates). Prints ONE JSON line; every check is a hard assert.
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
N_CORPUS_BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 700_000
K = 20
BUCKETS = 32
MAX_RESULT = "10m"  # the scaled-down broadcast budget


def synth_docs(spark, lo: int, hi: int, tokens: int):
    """Unique token streams per doc (no accidental cross-doc spans)."""
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(tokens)),
                lambda i: F.concat_ws("_", F.lit("t"), F.col("id"), i),
            ),
            " ",
        ).alias("text"),
    )


def spans_digest(df):
    row = df.select(
        F.sum(
            F.xxhash64("doc_id", "span_start", "span_end", "n_positions")
            .cast("decimal(38,0)")
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return (row["n"], int(row["h"] or 0))


def main() -> int:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.maxResultSize", MAX_RESULT)
        # Catalyst auto-broadcast OFF: this harness must attribute every
        # broadcast to an EXPLICIT probe-path hint. The synthetic
        # range()-derived fixture carries ~8 B/row plan-time size
        # estimates (localCheckpoint preserves the source plan's
        # stats), so Catalyst would auto-broadcast an 18 MB-serialized
        # probe under ANY positive threshold and trip the scaled budget
        # from the SHUFFLE path — an estimate artifact a parquet-backed
        # corpus (size-realistic stats, production 64 MB-vs->=1 GB
        # threshold/budget ratio) does not have.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    out: dict = {
        "n_docs": N_DOCS,
        "tokens_per_doc": TOKENS,
        "n_corpus_batch": N_CORPUS_BATCH,
        "max_result_size": MAX_RESULT,
    }
    root = tempfile.mkdtemp(prefix="r9_stress_")

    # ---- phase 1: ExactSubstr index ------------------------------------
    idx = ExactSubstrIndex(root + "/xs", k=K, num_buckets=BUCKETS)
    seed = synth_docs(spark, 0, max(N_DOCS // 10, 100), TOKENS)
    bulk = synth_docs(spark, N_DOCS, 2 * N_DOCS, TOKENS).withColumn(
        # plant cross-batch duplicates: every 5th bulk doc re-uses a
        # seed doc's text, so the probe has real hits to find
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(TOKENS)),
                    lambda i: F.concat_ws(
                        "_", F.lit("t"), F.pmod(F.col("doc_id"), F.lit(max(N_DOCS // 10, 100))), i
                    ),
                ),
                " ",
            ),
        ).otherwise(F.col("text")),
    )
    # the seed itself rides the shuffle path: under the pinned budget
    # even a modest explicit broadcast probe would blow up — only the
    # DELIBERATE broadcast attempt below is supposed to
    r1 = idx.append(seed, txn_id="seed", probe_mode="shuffle")
    out["seed_mode"] = r1["probe_mode"]

    t0 = time.time()
    broadcast_failed = False
    try:
        idx.append(bulk, txn_id="beyond", probe_mode="broadcast")
    except Exception as e:  # noqa: BLE001
        broadcast_failed = True
        out["substr_broadcast_error"] = f"{type(e).__name__}: {str(e)[:160]}"
    out["substr_broadcast_sec"] = round(time.time() - t0, 2)
    assert broadcast_failed, (
        "the forced broadcast probe was expected to exceed "
        f"maxResultSize={MAX_RESULT} and raise — grow N_DOCS"
    )

    # the torn broadcast attempt may have left partial per-table
    # commits; the shuffle replay of the SAME txn must recover
    # order-free through the pre-txn snapshots
    t1 = time.time()
    r2 = idx.append(bulk, txn_id="beyond", probe_mode="shuffle")
    out["substr_bulk_sec"] = round(time.time() - t1, 2)
    out["bulk_mode"] = r2["probe_mode"]

    inc = spans_digest(idx.spans(spark))
    full = spans_digest(exact_substring_spans(seed.unionByName(bulk), k=K))
    out["spans"] = inc[0]
    assert inc == full, f"incremental {inc} != from-scratch {full}"
    assert inc[0] > 0, "fixture planted no spans"

    # ---- phase 2: bucketed-state corpus --------------------------------
    from cdc_historical_warehouse_platform_spark.operators.text import quality_score
    from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import (
        QUALITY_THRESHOLD,
        corpus_append,
        corpus_build,
    )

    cdir = root + "/corpus"
    corpus_build(spark, "/root/testdata/sf0.01", cdir, state_buckets=BUCKETS)
    stored = spark.read.parquet(cdir).select("doc_id", "text", "lang", "source", "n_chars")
    n_stored = stored.count()
    # half exact dups (stored text under fresh ids -> fingerprint-dead),
    # half genuinely fresh real-text docs (word-shuffled real documents
    # keep the quality gate's statistics realistic)
    dup_half = stored.limit(N_CORPUS_BATCH // 2).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    # fresh half: synthetic quality-PASSING docs (every other token a
    # stopword -> stopword_ratio 0.5, zero punctuation, 80 tokens) with
    # doc-unique alnum tokens, so every 3-shingle window contains a
    # unique token: pairwise Jaccard is 0 between fresh docs AND vs the
    # stored corpus -- the kept set is ALL of them, by construction
    fresh_half = spark.range(N_CORPUS_BATCH // 2).select(
        (F.col("id") + 20_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("the w"), F.col("id"), F.lit("x"), i
                ),
            ),
            " ",
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(400).cast("long").alias("n_chars"),
    )
    batch = dup_half.unionByName(fresh_half).localCheckpoint(eager=True)
    out["corpus_batch_rows"] = batch.count()

    t2 = time.time()
    corpus_broadcast_failed = False
    try:
        # huge limit forces the broadcast probe path
        corpus_append(spark, batch, cdir, bulk_probe_doc_limit=10**12)
    except Exception as e:  # noqa: BLE001
        corpus_broadcast_failed = True
        out["corpus_broadcast_error"] = f"{type(e).__name__}: {str(e)[:160]}"
    out["corpus_broadcast_sec"] = round(time.time() - t2, 2)
    assert corpus_broadcast_failed, (
        "the corpus broadcast probe was expected to exceed "
        f"maxResultSize={MAX_RESULT} and raise — grow N_CORPUS_BATCH"
    )

    t3 = time.time()
    a = corpus_append(spark, batch, cdir, bulk_probe_doc_limit=0)
    out["corpus_bulk_sec"] = round(time.time() - t3, 2)
    out["corpus_appended"] = a["appended"]

    # ground truth by construction: the dup half is fingerprint-dead;
    # the kept set is exactly the fresh docs passing the quality gate
    # (minus any fresh-vs-fresh near-dups, which the sentinel tokens
    # rule out — asserted via exact id-set equality)
    expected_ids = {
        r["doc_id"]
        for r in fresh_half.filter(
            quality_score(F.col("text")) >= QUALITY_THRESHOLD
        )
        .select("doc_id")
        .collect()
    }
    got_ids = {
        r["doc_id"]
        for r in spark.read.parquet(cdir)
        .filter(F.col("doc_id") >= 10_000_000)
        .select("doc_id")
        .collect()
    }
    out["corpus_expected_kept"] = len(expected_ids)
    assert got_ids == expected_ids, (
        f"bulk kept set diverged: got {len(got_ids)}, expected {len(expected_ids)}, "
        f"extra={sorted(got_ids - expected_ids)[:5]}, missing={sorted(expected_ids - got_ids)[:5]}"
    )
    assert a["appended"] == len(expected_ids)
    out["n_stored_seed"] = n_stored

    out["ok"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

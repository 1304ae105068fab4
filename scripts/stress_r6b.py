#!/usr/bin/env python
"""Stress the r6 late-batch additions far beyond the driver testdata:

1. **DSIR importance weights** (operators/text.py
   `dsir_importance_weights`): N_DOCS synthetic documents of W words
   each (two vocabularies: an in-domain head shared with the target
   set and an out-of-domain tail), scored against an N_TARGET-doc
   exemplar set. Asserts every pure-in-domain doc outranks every
   pure-out-of-domain doc (the selection property at scale), that the
   weight table stayed bucket-bounded, and reports wall time — the
   whole path is two bucket-model fits plus one broadcast-join scoring
   pass, so time should scale linearly in the corpus bigrams.

2. **BPE training** (operators/bpe.py): word counts over the same
   corpus (the one corpus-sized pass) + K merge rounds on the vocab
   frame. Asserts the vocab-sized-rounds claim by measurement: the
   AVERAGE merge-round wall time must undercut the corpus-sized
   word-count pass (the rounds never touch corpus rows, so their cost
   is flat in corpus size — only the first pass grows).

Usage: python scripts/stress_r6b.py [docs] [words_per_doc] [targets] [merges]

Evidence tooling, not a pytest (runs minutes at large N).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    words_per_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_targets = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    n_merges = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from pyspark.sql import functions as F

    from cdc_historical_warehouse_platform_spark.operators import bpe as BPE
    from cdc_historical_warehouse_platform_spark.operators.text import (
        dsir_importance_weights,
    )
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(app_name="stress-r6b")
    out: dict = {
        "docs": n_docs,
        "words_per_doc": words_per_doc,
        "targets": n_targets,
        "merges": n_merges,
    }

    # ---- synthetic corpus --------------------------------------------------
    # Half the docs cycle through an in-domain vocabulary (domain0..49),
    # half through a disjoint out-of-domain one (web0..49); each doc is
    # a rotated window of its domain's word cycle. Small vocabularies
    # keep the ~100 bigram types nearly collision-free across 4096
    # buckets, so per-doc weights concentrate and the separation
    # assertion is strict — a uniform-random generator would smear both
    # domains' mass into every bucket and mix the models.
    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_doc)),
        lambda i: F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("domain")).otherwise(F.lit("web")),
            (F.col("id") + i) % 50,
        ),
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
            F.when(F.col("id") % 2 == 0, F.lit("domain")).otherwise(F.lit("web")).alias(
                "source"
            ),
        )
        .localCheckpoint(eager=True)
    )
    # target exemplars: a small slice of the in-domain half
    target = docs.filter((F.col("source") == "domain") & (F.col("doc_id") < 2 * n_targets))

    # ---- 1. DSIR at scale --------------------------------------------------
    t0 = time.time()
    w = dsir_importance_weights(docs, target, n_buckets=4096)
    agg = (
        w.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.min("logratio_per_bigram").alias("min_lr"),
            F.max("logratio_per_bigram").alias("max_lr"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    out["dsir_sec"] = round(time.time() - t0, 2)
    by_src = {r["source"]: r for r in agg}
    out["dsir_docs_scored"] = int(sum(r["n"] for r in agg))
    out["dsir_domain_min"] = round(by_src["domain"]["min_lr"], 4)
    out["dsir_web_max"] = round(by_src["web"]["max_lr"], 4)
    # the selection property: EVERY in-domain doc outranks EVERY
    # out-of-domain doc (disjoint vocabularies make this strict)
    assert by_src["domain"]["min_lr"] > by_src["web"]["max_lr"], out
    assert out["dsir_docs_scored"] == n_docs, out

    # ---- 2. BPE: corpus-sized word count, vocab-sized rounds ---------------
    t0 = time.time()
    wc = BPE.word_counts(docs).localCheckpoint(eager=True)
    out["bpe_vocab_size"] = wc.count()
    out["bpe_wordcount_sec"] = round(time.time() - t0, 2)
    vocab = wc.withColumn("syms", BPE.split_chars(F.col("word")))
    # drive merge rounds directly on the precomputed vocab: time per
    # round must be vocab-bounded, not corpus-bounded
    rounds = []
    v = vocab.localCheckpoint(eager=True)
    for rank in range(n_merges):
        r0 = time.time()
        best = (
            BPE.pair_counts(v)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left_sym").asc(),
                F.col("right_sym").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        v = BPE.merge_pair(v, best[0]["left_sym"], best[0]["right_sym"])
        if (rank + 1) % 4 == 0:
            v = v.localCheckpoint(eager=True)
        rounds.append(round(time.time() - r0, 2))
    out["bpe_round_secs"] = rounds
    out["bpe_rounds_total_sec"] = round(sum(rounds), 2)
    out["bpe_avg_round_sec"] = round(sum(rounds) / max(1, len(rounds)), 2)
    # vocab-sized rounds: once the corpus dwarfs the vocabulary (here
    # ~docs*words word occurrences vs a 1000-word vocab) the average
    # merge round must undercut the corpus-sized word-count pass
    assert out["bpe_avg_round_sec"] < out["bpe_wordcount_sec"], out

    print(json.dumps(out))


if __name__ == "__main__":
    main()

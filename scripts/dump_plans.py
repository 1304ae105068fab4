#!/usr/bin/env python
"""Regenerate PLANS.md — annotated physical plans for the headline suite."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

NOTES = {
    "scd2_dim_history": (
        "One hash exchange on the business key; all three window functions "
        "(lag-hash, lag-op, lead-ts) share a single sort because the tiebreak "
        "column is materialized once. Filters stay above the union'd scans; no Python."
    ),
    "agg_pricing_summary": (
        "Filter pushed into the parquet scan (PushedFilters), 6-column pruned "
        "ReadSchema, two-phase HashAggregate (partial -> final) with one "
        "exchange on the group keys."
    ),
    "join_revenue_by_nation": (
        "All dimension joins are BroadcastHashJoin (no sort-merge at this "
        "scale); at cluster scale AQE would keep the small dims broadcast and "
        "sort-merge the fact-fact join only."
    ),
    "dedup_minhash_lsh": (
        "Two corpus passes total. Pass 1 (signature): each shingle string is "
        "xxhash64'd ONCE, the 64 signature values re-hash the 8-byte long "
        "(explode + single groupBy with 64 fused min-aggregates). Band bucket "
        "self-join yields candidates, localCheckpoint'd so the three "
        "downstream branches don't re-run the signature pipeline (12 "
        "FileScans -> 2). Pass 2 (verify): shingle sets built only for docs "
        "in a candidate pair (semi-join), exact Jaccard via array_intersect."
    ),
    "knn_cosine_brute": (
        "Queries broadcast (BroadcastNestedLoopJoin over 10 rows); the corpus "
        "scan never shuffles; per-query top-k via one window over the small "
        "scored set."
    ),
    "ann_ivf_topk": (
        "IVF: centroid assignment and query probing are map-only literal "
        "expressions (centroids inlined as single ArrayType literals — "
        "bounded n_lists×dim, not data-sized), so the corpus is never "
        "shuffled or cross-joined; scoring is a BroadcastHashJoin on "
        "list_id against the probed query set, then one window over the "
        "probed candidates."
    ),
    "embedding_near_dup": (
        "Banded hyperplane-LSH at t=0.95 (r=10, B=50): candidates come from a "
        "hash equi-join on (band, bucket) over bare ids — no CartesianProduct "
        "/ BroadcastNestedLoopJoin, and the 50x posexplode carries 3 scalars "
        "per row, never the vectors. Embeddings re-enter via two equi-joins "
        "on the pruned candidate set for the exact cosine verify."
    ),
    "corpus_pack_sequences": (
        "r5 rewrite: the exclusive prefix over per-bucket token totals is "
        "hierarchical — a window PARTITIONED by superbucket (never a global "
        "sort-to-one-partition) plus a cross-superbucket offset from a "
        "broadcast non-equi self-join over corpus/bucket_size^2 rows (~40 "
        "rows at 10^10 docs). The per-doc cumsum stays partitioned by "
        "bucket; offsets re-enter via two broadcast hash joins."
    ),
    "corpus_zipf_stats": (
        "r5 rewrite: rank + cumulative coverage over the LIMIT-100 slice via "
        "a broadcast non-equi self-join (rank = 1 + |strictly ahead|) "
        "instead of an unpartitioned window — the TakeOrderedAndProject "
        "bounds both sides at any corpus size, and no WindowExec moves all "
        "data to one partition."
    ),
    "corpus_source_mix": (
        "r5 rewrite: corpus-wide totals come from a 1-row keyless aggregate "
        "broadcast back over the per-source rows (scalar-build BNLJ — "
        "map-side; structurally admitted by the plan guard); the shared "
        "per-source exchange is deduped by ReuseExchange, so the documents "
        "scan happens once."
    ),
    "subquery_sole_late_supplier": (
        "Q21 shape: semi-join (another supplier exists in the order) and "
        "anti-join (no OTHER supplier was late — residual references both "
        "the probe row's supplier and its order's date) both plan as hash "
        "joins on l_orderkey; supplier is broadcast; one exchange for the "
        "final per-supplier count."
    ),
    "agg_important_parts": (
        "Q11 shape: per-part DECIMAL revenue, 1-row (total, n) keyless "
        "aggregate broadcast back (scalar-build BNLJ), membership decided "
        "in exact integer-DECIMAL arithmetic — the plan's only join has a "
        "provably-1-row build side."
    ),
    "join_top_quarter_supplier": (
        "Q15 shape: the revenue view's MAX is matched by an EQUI "
        "BroadcastHashJoin on the exact DECIMAL value (ties returned), "
        "supplier broadcast; the shared revenue subtree is deduped by "
        "ReuseExchange at runtime."
    ),
    "tpch_q2_min_cost_supplier": (
        "Q2 shape (r6): the EUROPE supplier catalog is one two-phase "
        "HashAggregate; the correlated MIN decorrelates into a per-part "
        "min + EQUI SortMergeJoin on (normalized min_price, partkey) — "
        "never a per-row subquery; part/nation/region broadcast; "
        "TakeOrderedAndProject bounds the top-100 at any scale."
    ),
    "tpch_q9_product_profit": (
        "Q9 shape (r6): LIKE-filtered part dim pushed into a "
        "BroadcastHashJoin build side (Contains filter evaluated on the "
        "2-column pruned part scan), all four dims broadcast, profit "
        "expression folded into the partial aggregate — one exchange on "
        "(nation, year) for the final rollup."
    ),
    "text_heavy_hitters": (
        "r6 sketch-bounded exact top-k: per-partition Misra-Gries "
        "summaries via ONE ArrowEvalPython/mapInPandas pass (vectorized "
        "value_counts folding), merged by a groupBy over <= P*m summary "
        "rows — the exchange is bounded by the summary size, never the "
        "vocabulary; exact verify re-scans the stream but shuffles only "
        "broadcast-semi-joined candidates. localCheckpoint truncates the "
        "displayed plan at the verified top-k."
    ),
    "scd2_incremental_histogram": (
        "r6 distribution IVM: the batch delta is a three-way union "
        "aggregated once on the composite (group, bucket) struct key; "
        "the current slice is probed ONCE per maintenance step "
        "(broadcast-batch inner join on the business key); the state "
        "upsert is a null-safe full-outer SortMergeJoin over "
        "histogram-sized inputs only — the dimension is never rescanned."
    ),
    "events_cohort_retention": (
        "r6 cohort matrix: first-touch is a groupBy(user) min — one hash "
        "exchange on user_id, no window; the join back co-partitions with "
        "it (ReuseExchange-friendly), cohort sizes broadcast; week "
        "arithmetic is integer datediff//7, exact in both engines."
    ),
    "events_funnel_steps": (
        "r6 ordered funnel: three chained groupBy-min + equi-joins on "
        "user_id with strict happens-after filters — no window, no "
        "per-user iteration; step frames shrink monotonically so later "
        "joins broadcast; the report is three 1-row aggregates unioned "
        "with a broadcast base for conversion."
    ),
    "scd2_version_diff": (
        "r6 change-data-feed: multiset exceptAll both ways between the "
        "two dim states — each plans as a partial-aggregate-style "
        "HashAggregate pair on the full row (count-diff semantics), one "
        "exchange per direction, no join at all; pre/post images labeled "
        "by a literal column."
    ),
    "corpus_dsir_weights": (
        "r6 DSIR data selection: both bucket models are two-phase "
        "HashAggregates over the hashed-bigram stream (map-side combine "
        "collapses each partition to <= B buckets before the exchange); "
        "the raw<-target weight join and the scoring join are "
        "BroadcastHashJoins (the weight table is <= B rows by "
        "construction); corpus totals enter as plan-build literals, so "
        "there is no unpartitioned window anywhere; the per-doc "
        "reduction is an exact integer sum (micro-bit quantized "
        "log-ratio), all whole-stage codegen, zero Python."
    ),
    "text_bpe_pair_counts": (
        "r6 BPE per-round statistic: ONE corpus-sized explode+groupBy "
        "fits the word-count model; the pair explode runs over the "
        "vocab frame only (Heaps-law bounded) with a two-phase "
        "HashAggregate on (left, right); TakeOrderedAndProject bounds "
        "the top-100 — the iterative trainer repeats exactly this shape "
        "per merge round, so this IS the trainer's hot path."
    ),
    "events_gap_islands": (
        "r6 gaps-and-islands: distinct-FIRST is the scale choice — the "
        "(user, day) exchange moves map-side-deduped pairs (bounded by "
        "users x days, not events), then one user_id exchange serves "
        "BOTH the row_number window and the island groupBy (same "
        "partitioning, no third shuffle before the presentation sort); "
        "integer day arithmetic, whole-stage codegen, zero Python."
    ),
    "agg_mode_frequent": (
        "r6 deterministic MODE: two-phase HashAggregate over the full "
        "grouping key (fact never sees a window); the argmax runs as a "
        "row_number window over the tiny (group x value) count table — "
        "partitioned by the group, never a global sort."
    ),
    "events_anomaly_zscore": (
        "r6 exact z-score flags: per-type moments are one map-side-"
        "combined HashAggregate into a handful of rows, broadcast back "
        "onto the fact (BroadcastHashJoin — the big side is never "
        "shuffled); the k-sigma test is a pure DECIMAL comparison "
        "inside codegen, no division, no Python."
    ),
    "graph_pagerank_top": (
        "r6 fixed-iteration PageRank: edge derivation is a broadcast "
        "join on the order key + one distinct; each of the 3 "
        "iterations is a join of the rank vector against the edge list "
        "on src followed by a groupBy on dst — both hash-partition on "
        "the node id, so at cluster scale the edge list stays "
        "co-partitioned and each iteration moves only (dst, contrib) "
        "pairs; final top-25 is TakeOrderedAndProject, never a full "
        "sort; all integer arithmetic in codegen."
    ),
    "graph_khop_distance": (
        "r6 min-plus BFS: each of the 3 hops is one equi-join of the "
        "distance vector against the edge list plus one min-HashAggregate "
        "on the node key (map-side combined); the reached set stays "
        "deduplicated between hops, so the frontier never explodes; "
        "seeds derive from a broadcast dimension filter; all integer "
        "arithmetic in codegen."
    ),
    "ivm_join_view": (
        "r6 join-view IVM: every delta term is a BroadcastHashJoin with "
        "the micro-batch on the build side — the states are scanned "
        "once each and never shuffled; the final consolidate + rollup "
        "is a two-phase HashAggregate over the multiset; the oracle "
        "side computes the final join directly, so the hash equality "
        "certifies maintenance ≡ recompute."
    ),
    "corpus_substring_clean": (
        "r6 ExactSubstr cut step: the span pipeline is the spans "
        "query's plan; the cut itself is ONE equi-join of each doc's "
        "few spans (collect_list into an array) followed by a "
        "positional HOF filter inside codegen — the token stream is "
        "never exploded; the oracle deliberately takes the exploded "
        "shape (generate_series + anti-join + ordered string_agg) and "
        "must land on identical strings."
    ),
    "corpus_exact_substring_spans": (
        "r6 ExactSubstr dedup: the k-gram stream is ONE map-only "
        "project (transform over sequence + slice inside codegen — the "
        "corpus is never token-exploded), duplicated grams are flagged "
        "by a single count window partitioned by the md5 (one exchange "
        "of (hash, id, pos) — the method's inherent shuffle; the "
        "groupBy+semi-join-back alternative re-derives the dominant "
        "gram build and measured 1.8x slower), and the span merge is a "
        "doc-partitioned lag window over the (small) flagged set."
    ),
    "agg_distinct_sketch_rollup": (
        "Mergeable-sketch COUNT(DISTINCT) maintenance: per-wave HLL "
        "sketches built by ObjectHashAggregate (partial sketches merged "
        "map-side, the exchange moves one ~2^lgk-byte sketch per group per "
        "task, never raw values); the state merge is a null-safe full-outer "
        "SortMergeJoin on the group key; the estimate is a single "
        "expression over the stored sketch."
    ),
}


def main() -> None:
    from cdc_historical_warehouse_platform_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries()
    sf = "/root/testdata/sf0.1"

    def grab(name: str) -> str:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = re.sub(r"#\d+L?", "", plan)
        lines = [line for line in plan.splitlines() if line.strip()][:40]
        return "\n".join(line[:150] for line in lines)

    # SURGICAL regeneration: PLANS.md carries many hand-written analysis
    # sections beyond the NOTES queries (merge plans, corpus-append,
    # stress evidence, r4 notes). Only the "## <name>" blocks named in
    # NOTES are replaced in place; everything else — including manual
    # sections interleaved between them — is preserved byte-for-byte.
    # (The previous full-rewrite behavior would have silently deleted
    # every manual section.)
    path = REPO / "PLANS.md"
    text = path.read_text()

    def replace_section(text: str, name: str, body: str) -> str:
        pat = re.compile(rf"(?ms)^## {re.escape(name)}\n.*?(?=^## |\Z)")
        if pat.search(text):
            return pat.sub(body.replace("\\", "\\\\"), text, count=1)
        return text.rstrip() + "\n\n" + body

    for name, note in NOTES.items():
        body = f"## {name}\n\n{note}\n\n```\n{grab(name)}\n```\n\n"
        text = replace_section(text, name, body)
    path.write_text(text)
    print("PLANS.md updated in place (manual sections preserved)")


if __name__ == "__main__":
    main()

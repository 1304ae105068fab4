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

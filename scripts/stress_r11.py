#!/usr/bin/env python
"""r11 stress: containment dedup at synthetic-corpus scale.

Plants K short-doc-embedded-in-long-host pairs in an N-doc corpus and
asserts:

1. **Planted recall**: containment_pairs (with the stop-shingle cap
   on) finds every planted (short, host) pair at containment 1.0 and
   marks the SHORT doc as contained_id — and Jaccard at the same
   strictness finds NONE of them (the asymmetric tier exists because
   the symmetric one is blind here).
2. **No quadratic blowup**: the result set stays O(planted) — random
   docs over a large vocabulary share no 3-grams, and capped shingles
   bound the self-join at any corpus size.
3. **Plan shape**: no CartesianProduct / BroadcastNestedLoopJoin /
   Python UDF anywhere in the containment plan.

Usage: python scripts/stress_r11.py [n_docs] [n_planted]
(default 200000 docs / 100 planted; pass e.g. 20000 10 for a quick pass)
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_planted = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from cdc_historical_warehouse_platform_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )
    from cdc_historical_warehouse_platform_spark.session import get_spark

    spark = get_spark(
        app_name="stress-r11",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rng = random.Random(20260816)
    words = [f"w{i:05d}" for i in range(20_000)]
    rows = []
    planted = []
    for i in range(n_docs):
        body = rng.choices(words, k=200)
        rows.append((i, " ".join(body)))
        if i < n_planted:
            # the short doc: a verbatim 30-token passage from the host
            start = rng.randrange(0, 170)
            short_id = n_docs + i
            rows.append((short_id, " ".join(body[start : start + 30])))
            planted.append((short_id, i))

    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32)

    t0 = time.perf_counter()
    cont = containment_pairs(docs, n=3, threshold=0.8, max_doc_freq=100)
    plan = cont._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = cont.collect()
    cont_sec = round(time.perf_counter() - t0, 1)

    by_pair = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"])): r for r in got
    }
    missed = []
    for short_id, host_id in planted:
        key = (min(short_id, host_id), max(short_id, host_id))
        r = by_pair.get(key)
        if r is None or r["containment"] != 1.0 or r["contained_id"] != short_id:
            missed.append(key)
    assert not missed, f"planted containment pairs missed: {missed[:5]}"
    # no quadratic blowup: result stays O(planted), never O(n^2)
    assert len(got) <= 3 * max(n_planted, 1), (len(got), n_planted)

    # the symmetric tier is blind to every planted pair at the same bar
    t0 = time.perf_counter()
    jac = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in jaccard_pairs(
            docs, n=3, threshold=0.8, max_doc_freq=100
        ).collect()
    }
    jac_sec = round(time.perf_counter() - t0, 1)
    blind = [
        (s, h) for s, h in planted if (min(s, h), max(s, h)) in jac
    ]
    assert not blind, f"jaccard unexpectedly caught planted pairs: {blind[:5]}"

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_planted": n_planted,
                "containment_pairs_found": len(got),
                "planted_recall": 1.0,
                "jaccard_blind_to_planted": True,
                "containment_sec": cont_sec,
                "jaccard_sec": jac_sec,
                "ok": True,
            }
        )
    )


if __name__ == "__main__":
    main()

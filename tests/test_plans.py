"""Registry-wide plan and contract guards.

Two regression classes the driver's value-hash gate can NOT catch:
- a query whose plan silently degrades to an all-pairs join
  (CartesianProduct / BroadcastNestedLoopJoin) — still correct, dead at
  100 TB (this happened once: embedding_near_dup at a degenerate LSH
  threshold);
- a registry reorder that pushes a not-yet-verified query past the
  driver's 50-row correctness window.

Both are pinned here for every registered query at once.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest

from tests.conftest import SF_DIR

FORBIDDEN_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin")

# Brute-force-BY-DESIGN tier: the broadcast side is a deliberately
# small query set, the corpus stays un-shuffled — the documented exact
# baseline next to the ANN paths. ann_sq_topk is the same flat-scan
# shape over the int8-quantized corpus (4× fewer bytes per scan); the
# bucketed/clustered tiers (LSH/IVF) remain the probe-many scale path.
# Everything else must justify itself here or fix its plan.
ALL_PAIRS_BY_DESIGN = {"knn_cosine_brute", "ann_sq_topk"}


def _entry_module():
    path = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_query_plan_contains_all_pairs_join(spark):
    mod = _entry_module()
    offenders = {}
    for name, fn in mod.queries().items():
        if name in ALL_PAIRS_BY_DESIGN:
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().sparkPlan().toString()
        hits = [n for n in FORBIDDEN_NODES if n in plan]
        if hits:
            offenders[name] = hits
    assert offenders == {}


def test_registry_contract():
    mod = _entry_module()
    q = mod.queries()
    o = mod.oracle_sql()
    names = list(q)
    # every oracle key has a query
    assert set(o) <= set(q)
    # every priority (not-yet-driver-verified) query sits inside the
    # driver's 50-row correctness window
    window = set(names[:50])
    for name in mod._PRIORITY:
        assert name in window, f"{name} fell out of the driver window"
    # everything demoted past the window was driver-green in a prior
    # round and still carries a local oracle (never rows-only)
    for name in names[50:]:
        assert name in o, f"{name} is outside the window without an oracle"
    # rows-only queries are the documented approximate tiers only
    rows_only = {n for n in q if n not in o}
    assert rows_only <= {
        "dedup_simhash",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "agg_approx_aggregates",
        "semdedup_keep",
    }

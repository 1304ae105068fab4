"""operators/graph.py — fixed-iteration integer PageRank.

Pins the determinism contract (bit-identical across partitionings),
the mass-conservation envelope of the integer arithmetic, and the
known closed-form case of a symmetric star graph.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.graph import TELEPORT, UNIT, pagerank


def _star_edges(spark, leaves: int = 4):
    """Hub node 0 connected to `leaves` leaf nodes, symmetrized."""
    rows = []
    for leaf in range(1, leaves + 1):
        rows.append((0, leaf))
        rows.append((leaf, 0))
    return spark.createDataFrame(rows, "src long, dst long")


def test_star_graph_closed_form(spark):
    """On a 4-leaf star: hub deg=4, leaf deg=1. One exact hand-rolled
    iteration from uniform ranks must match the operator."""
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_star_edges(spark, 4), iterations=1).collect()
    }
    # hub receives 4 leaves' full rank: 150000 + (85 * 4*UNIT) // 100
    assert got[0] == TELEPORT + (85 * 4 * UNIT) // 100
    # each leaf receives hub_rank div 4
    assert got[1] == TELEPORT + (85 * (UNIT // 4)) // 100
    assert got[1] == got[2] == got[3] == got[4]


def test_hub_outranks_leaves_after_three_iterations(spark):
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(_star_edges(spark, 6), iterations=3).collect()
    }
    assert ranks[0] > ranks[1]
    assert len(ranks) == 7


def test_bit_identical_across_partitionings(spark):
    """The integer arithmetic admits no order-dependence: 1-partition
    and 16-partition runs must agree to the last unit."""
    import random

    rng = random.Random(42)
    pairs = {(rng.randrange(50), 50 + rng.randrange(20)) for _ in range(200)}
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    base = spark.createDataFrame(rows, "src long, dst long")
    one = pagerank(base.coalesce(1), iterations=3)
    many = pagerank(base.repartition(16, "src"), iterations=3)
    a = sorted((r["node"], r["rank"]) for r in one.collect())
    b = sorted((r["node"], r["rank"]) for r in many.collect())
    assert a == b


def test_mass_envelope(spark):
    """Integer floor-division only ever LOSES mass: total rank after an
    iteration is ≤ the float fixpoint total (n·UNIT) and ≥ the all-
    teleport floor (n·TELEPORT)."""
    edges = _star_edges(spark, 5)
    n = 6
    total = (
        pagerank(edges, iterations=3)
        .agg(F.sum("rank").alias("t"))
        .collect()[0]["t"]
    )
    assert n * TELEPORT <= total <= n * UNIT


def test_bounded_shortest_paths_on_a_path_graph(spark):
    """0-1-2-3-4 path, seed at 0: dist == node index, capped by hops."""
    from cdc_historical_warehouse_platform_spark.operators.graph import bounded_shortest_paths

    pairs = [(i, i + 1) for i in range(4)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bounded_shortest_paths(edges, seeds, hops=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # node 4 is 4 hops away — absent


def test_bounded_shortest_paths_multi_seed_min(spark):
    """Two seeds: every node takes the NEARER seed's distance."""
    from cdc_historical_warehouse_platform_spark.operators.graph import bounded_shortest_paths

    pairs = [(i, i + 1) for i in range(6)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (6,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bounded_shortest_paths(edges, seeds, hops=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1, 6: 0}


def test_bounded_shortest_paths_linear_plan_growth(spark):
    """r12 optimization-round plan guard: each hop references the
    distance vector TWICE (union arm + relax join), so an unpinned
    loop doubles the plan per hop — the seed subtree was re-derived
    2^hops times (audited: 8 scans of the seed table in the khop
    registry row at hops=3). With the per-iteration pin, the returned
    plan must not contain ANY un-truncated copy of the seed input —
    every branch ends at a checkpointed RDD scan — and the relax-join
    count must be the last hop's, not 2^hops - 1 of them."""
    pairs = [(i, i + 1) for i in range(6)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (6,)], "node long")

    from cdc_historical_warehouse_platform_spark.operators.graph import bounded_shortest_paths

    df = bounded_shortest_paths(edges, seeds, hops=3)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    tree = plan.split("\n\n")[0]
    # all inputs reach the plan only through checkpoint boundaries
    assert "LocalTableScan" not in tree
    # one join per *final* hop survives in the visible plan — the
    # earlier hops live behind the pinned RDD scans
    assert tree.count("Join") <= 1

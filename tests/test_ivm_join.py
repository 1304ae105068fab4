"""operators/ivm_join.py — signed-multiplicity join-view maintenance.

The load-bearing pin: under RANDOMIZED two-sided insert/retract/update
sequences, the maintained view (initial join + accumulated deltas)
stays multiset-equal to a from-scratch join of the maintained inputs
after EVERY batch. Plus targeted cases: update-as-retract+insert,
duplicate rows (multiplicity 2), one-sided batches, delta of a delta
(ΔA ⋈ ΔB cross term).
"""

from __future__ import annotations

import random

from cdc_historical_warehouse_platform_spark.operators.ivm_join import (
    MULT,
    as_inserts,
    as_retractions,
    consolidate,
    join_view_delta,
    recompute_join_view,
)


def _a(spark, rows):  # (k, av)
    return as_inserts(spark.createDataFrame(rows, "k long, av string"))


def _b(spark, rows):  # (k, bv)
    return as_inserts(spark.createDataFrame(rows, "k long, bv string"))


def _multiset(df):
    return sorted(tuple(r) for r in consolidate(df).collect())


def test_two_sided_random_sequences_track_recompute(spark):
    rng = random.Random(7)
    a_rows = [(k, f"a{k}") for k in range(6)]
    b_rows = [(k, f"b{k}") for k in range(0, 10, 2)]
    a_state, b_state = _a(spark, a_rows), _b(spark, b_rows)
    view = recompute_join_view(a_state, b_state, ["k"])

    for step in range(6):
        d_a = d_b = None
        if rng.random() < 0.8:
            k = rng.randrange(8)
            if rng.random() < 0.5:
                d_a = as_inserts(
                    spark.createDataFrame([(k, f"a{k}_v{step}")], "k long, av string")
                )
            else:  # retract one currently-live A row if any
                live = consolidate(a_state).collect()
                if live:
                    r = live[rng.randrange(len(live))]
                    d_a = as_retractions(
                        spark.createDataFrame([(r["k"], r["av"])], "k long, av string")
                    )
        if rng.random() < 0.8:
            k = rng.randrange(8)
            d_b = as_inserts(
                spark.createDataFrame([(k, f"b{k}_v{step}")], "k long, bv string")
            )
        dv = join_view_delta(a_state, b_state, d_a, d_b, ["k"])
        if dv is not None:
            view = view.unionByName(dv)
        if d_a is not None:
            a_state = a_state.unionByName(d_a)
        if d_b is not None:
            b_state = b_state.unionByName(d_b)
        # localCheckpoint caps the growing lineage across steps
        a_state = a_state.localCheckpoint(eager=True)
        b_state = b_state.localCheckpoint(eager=True)
        view = view.localCheckpoint(eager=True)
        assert _multiset(view) == _multiset(
            recompute_join_view(a_state, b_state, ["k"])
        ), f"diverged at step {step}"


def test_update_is_retract_plus_insert(spark):
    a_state = _a(spark, [(1, "old")])
    b_state = _b(spark, [(1, "b1"), (1, "b2")])
    view = recompute_join_view(a_state, b_state, ["k"])
    d_a = as_retractions(
        spark.createDataFrame([(1, "old")], "k long, av string")
    ).unionByName(as_inserts(spark.createDataFrame([(1, "new")], "k long, av string")))
    view = view.unionByName(join_view_delta(a_state, b_state, d_a, None, ["k"]))
    got = _multiset(view)
    assert got == [(1, "new", "b1", 1), (1, "new", "b2", 1)]


def test_duplicate_rows_carry_multiplicity(spark):
    a_state = _a(spark, [(1, "a"), (1, "a")])  # multiplicity 2 after fold
    b_state = _b(spark, [(1, "b")])
    assert _multiset(recompute_join_view(a_state, b_state, ["k"])) == [(1, "a", "b", 2)]
    # retracting ONE copy leaves multiplicity 1
    d_a = as_retractions(spark.createDataFrame([(1, "a")], "k long, av string"))
    view = recompute_join_view(a_state, b_state, ["k"]).unionByName(
        join_view_delta(a_state, b_state, d_a, None, ["k"])
    )
    assert _multiset(view) == [(1, "a", "b", 1)]


def test_cross_term_both_sides_same_batch(spark):
    """A key born on BOTH sides in the same batch must appear in the
    view — the (A+ΔA)⋈ΔB bracketing covers the ΔA⋈ΔB cross term."""
    a_state, b_state = _a(spark, []), _b(spark, [])
    d_a = as_inserts(spark.createDataFrame([(9, "a9")], "k long, av string"))
    d_b = as_inserts(spark.createDataFrame([(9, "b9")], "k long, bv string"))
    dv = join_view_delta(a_state, b_state, d_a, d_b, ["k"])
    assert _multiset(dv) == [(9, "a9", "b9", 1)]


def test_no_delta_returns_none_and_empty_sides_safe(spark):
    a_state, b_state = _a(spark, [(1, "a")]), _b(spark, [(1, "b")])
    assert join_view_delta(a_state, b_state, None, None, ["k"]) is None

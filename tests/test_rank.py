"""operators/rank.py — bucketed global rank + closed-form NTILE.

Pins rank exactness vs a local sort, NTILE-formula equality vs SQL
NTILE semantics at remainder-heavy sizes (n % k ≠ 0), and partitioning
invariance of the whole pipeline.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.rank import exact_ntile, global_rank


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )


def _ref_ntile(n, k, r):
    q, m = divmod(n, k)
    if r <= m * (q + 1):
        return (r - 1) // (q + 1) + 1
    return m + (r - m * (q + 1) - 1) // max(q, 1) + 1


def test_global_rank_matches_local_sort(spark):
    rng = random.Random(3)
    vals = [rng.randrange(1000) for _ in range(500)]
    got = {
        r["id"]: r["rank"]
        for r in global_rank(
            _df(spark, vals), [F.asc("v"), F.asc("id")], F.floor(F.col("v") / 100)
        ).collect()
    }
    expect = {
        i: pos + 1
        for pos, (v, i) in enumerate(sorted((v, i) for i, v in enumerate(vals)))
    }
    assert got == expect


def test_exact_ntile_matches_sql_semantics_at_remainders(spark):
    for n in (7, 11, 23, 100, 101):
        vals = list(range(n))
        random.Random(n).shuffle(vals)
        out = exact_ntile(
            _df(spark, vals), 5, [F.asc("v"), F.asc("id")],
            F.floor(F.col("v") / 7), "tile",
        ).collect()
        for row in out:
            rank = row["v"] + 1  # v is 0..n-1, so rank == v+1 under asc
            assert row["tile"] == _ref_ntile(n, 5, rank), (n, rank)


def test_partitioning_invariance(spark):
    vals = [((i * 37) % 211) for i in range(400)]
    base = _df(spark, vals)
    a = exact_ntile(
        base.coalesce(1), 4, [F.asc("v"), F.asc("id")],
        F.floor(F.col("v") / 32), "tile",
    )
    b = exact_ntile(
        base.repartition(16), 4, [F.asc("v"), F.asc("id")],
        F.floor(F.col("v") / 32), "tile",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_desc_order_via_negated_bucket(spark):
    vals = [5, 1, 9, 7, 3]
    out = {
        r["v"]: r["rank"]
        for r in global_rank(
            _df(spark, vals), [F.desc("v"), F.asc("id")], F.floor(-F.col("v") / 2)
        ).collect()
    }
    assert out == {9: 1, 7: 2, 5: 3, 3: 4, 1: 5}


def test_auto_bucket_matches_explicit(spark):
    """The auto-derived width (derive_bucket min/max probe) must give
    the same exact ranks/tiles as a hand-tuned bucket, asc and desc."""
    rng = random.Random(17)
    vals = [rng.randrange(10_000) for _ in range(600)]
    base = _df(spark, vals)
    explicit = exact_ntile(
        base, 5, [F.asc("v"), F.asc("id")], F.floor(F.col("v") / 500), "tile"
    )
    auto = exact_ntile(
        base, 5, [F.asc("v"), F.asc("id")], None, "tile", key=F.col("v")
    )
    assert sorted(map(tuple, explicit.collect())) == sorted(map(tuple, auto.collect()))
    auto_desc = {
        r["v"]: r["rank"]
        for r in global_rank(
            _df(spark, [5, 1, 9, 7, 3]), [F.desc("v"), F.asc("id")],
            None, key=F.col("v"), descending=True,
        ).collect()
    }
    assert auto_desc == {9: 1, 7: 2, 5: 3, 3: 4, 1: 5}


def test_degenerate_bucket_width_still_exact(spark):
    """A pathological hand-picked width (everything in one bucket, or
    one row per bucket) degrades parallelism, never correctness; and
    the auto path on a CONSTANT key (min == max) returns the same
    exact tie-broken ranks."""
    vals = [((i * 91) % 37) for i in range(120)]
    base = _df(spark, vals)
    expect = {
        i: pos + 1
        for pos, (v, i) in enumerate(sorted((v, i) for i, v in enumerate(vals)))
    }
    for bucket in (F.lit(0), F.col("v") * 1000 + F.col("id")):
        got = {
            r["id"]: r["rank"]
            for r in global_rank(base, [F.asc("v"), F.asc("id")], bucket).collect()
        }
        assert got == expect
    const = _df(spark, [7] * 23)
    got = {
        r["id"]: r["rank"]
        for r in global_rank(
            const, [F.asc("v"), F.asc("id")], None, key=F.col("v")
        ).collect()
    }
    assert got == {i: i + 1 for i in range(23)}


def test_exact_ntile_property_random_sizes(spark):
    """Hypothesis-style sweep without the fixture overhead: random
    (n, k) pairs must match the SQL NTILE reference at every rank."""
    rng = random.Random(99)
    for _ in range(6):
        n = rng.randrange(3, 180)
        k = rng.randrange(2, 9)
        vals = list(range(n))
        rng.shuffle(vals)
        out = exact_ntile(
            _df(spark, vals), k, [F.asc("v"), F.asc("id")],
            F.floor(F.col("v") / 13), "tile",
        ).collect()
        for row in out:
            assert row["tile"] == _ref_ntile(n, k, row["v"] + 1), (n, k, row["v"])


def test_derive_bucket_null_key_raises_loudly(spark):
    """ADVICE r7: a null key used to yield a null bucket, and _ranked's
    inner bucket join then silently DROPPED those rows — wrong ranks,
    no error. The contract is now enforced in the probe."""
    import pytest

    df = spark.createDataFrame(
        [(0, 5), (1, None), (2, 9)], "id long, v int"
    )
    with pytest.raises(ValueError, match="null"):
        global_rank(df, [F.asc("v"), F.asc("id")], None, key=F.col("v"))

"""Z-order layout + file-level data skipping (operators/layout.py).

Pins: (1) the Morton key is bit-identical to the pure-Python
reference; (2) write_zordered produces files whose (custkey, date)
bounding boxes are dramatically tighter than a single-column sort's;
(3) read_pruned skips files yet returns exactly the full-scan-filter
result; (4) skipping is conservative when stats are missing."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators import layout
from cdc_historical_warehouse_platform_spark.sources.tables import VersionedTable

from conftest import SF_DIR


def test_zorder_key_matches_python_reference(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(0, 65536), rng.randrange(0, 65536)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "qa long, qb long")
    got = {
        (r.qa, r.qb): r.z
        for r in df.select(
            "qa", "qb", layout.zorder_key2(F.col("qa"), F.col("qb")).alias("z")
        ).collect()
    }
    for qa, qb in pairs:
        assert got[(qa, qb)] == layout.zorder_key2_py(qa, qb)


def test_fast_path_matches_generic_interleave(spark):
    rng = random.Random(11)
    pairs = [(rng.randrange(0, 65536), rng.randrange(0, 65536)) for _ in range(100)]
    df = spark.createDataFrame(pairs, "qa long, qb long")
    mismatches = df.select(
        layout.zorder_key2(F.col("qa"), F.col("qb")).alias("fast"),
        layout.interleave([F.col("qb"), F.col("qa")], 16).alias("generic"),
    ).where(F.col("fast") != F.col("generic"))
    assert mismatches.count() == 0


def test_quantize_is_integer_exact_and_clamped(spark):
    df = spark.createDataFrame([(-5,), (0,), (750,), (1500,), (99999,)], "v long")
    rows = {
        r.v: r.q
        for r in df.select(
            "v", layout.quantize(F.col("v"), 0, 1500).alias("q")
        ).collect()
    }
    assert rows[-5] == 0 and rows[99999] == 65535
    for v in (0, 750, 1500):
        assert rows[v] == min(65535, (v * 65536) // 1501)


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "o_days",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).cast("long"),
    )


def _zkey(df):
    qa = layout.quantize(F.col("o_custkey"), 0, 150)
    qb = layout.quantize(F.col("o_days"), 0, 2557)
    return layout.zorder_key2(qa, qb)


def test_zordered_write_clusters_both_dimensions(spark, orders, tmp_path):
    n_files = 8
    zt = VersionedTable(tmp_path / "zordered")
    layout.write_zordered(
        zt, orders, _zkey(orders), ["o_custkey", "o_days"], n_files=n_files
    )
    z_stats = [
        f
        for f in __import__("json").loads(
            (zt.path / "_STATS_v0.json").read_text()
        )
        if f["stats"].get("o_custkey")
    ]
    assert len(z_stats) == n_files

    # baseline: same data range-sorted by date only — custkey boxes
    # span the whole domain, the Z-order boxes must not
    st = VersionedTable(tmp_path / "datesorted")
    st.commit(orders.repartitionByRange(n_files, F.col("o_days").asc()))
    d_stats = layout.collect_file_stats(
        spark, st.path / "v0", ["o_custkey", "o_days"]
    )
    z_spread = layout.zorder_file_spread(z_stats, "o_custkey", "o_days")
    d_spread = layout.zorder_file_spread(d_stats, "o_custkey", "o_days")
    # ideal square tiling at 8 files ~ 1/sqrt(8) ~ 0.35; the date-only
    # sort is ~ sqrt(1.0 * 1/8) ~ 0.35 on paper BUT its custkey side
    # is the full domain in every file, so its per-dimension worst
    # side is ~1.0. Compare the custkey sides directly.
    def custkey_side(stats):
        lo = min(f["stats"]["o_custkey"][0] for f in stats)
        hi = max(f["stats"]["o_custkey"][1] for f in stats)
        dom = (hi - lo) or 1
        return sum(
            (f["stats"]["o_custkey"][1] - f["stats"]["o_custkey"][0]) / dom
            for f in stats
        ) / len(stats)

    assert custkey_side(z_stats) < 0.75 * custkey_side(d_stats), (
        z_spread,
        d_spread,
    )


def test_read_pruned_skips_files_and_matches_full_filter(spark, orders, tmp_path):
    zt = VersionedTable(tmp_path / "zp")
    layout.write_zordered(
        zt, orders, _zkey(orders), ["o_custkey", "o_days"], n_files=8
    )
    preds = {"o_custkey": (10, 40), "o_days": (400, 900)}
    pruned, report = layout.read_pruned(zt, spark, preds)
    assert report["files_read"] < report["files_total"], report
    expected = (
        zt.read(spark)
        .where(
            (F.col("o_custkey") >= 10)
            & (F.col("o_custkey") <= 40)
            & (F.col("o_days") >= 400)
            & (F.col("o_days") <= 900)
        )
        .select("o_orderkey")
        .collect()
    )
    got = pruned.select("o_orderkey").collect()
    assert sorted(r.o_orderkey for r in got) == sorted(
        r.o_orderkey for r in expected
    )


def test_read_pruned_empty_intersection(spark, orders, tmp_path):
    zt = VersionedTable(tmp_path / "ze")
    layout.write_zordered(zt, orders, _zkey(orders), ["o_custkey"], n_files=4)
    pruned, report = layout.read_pruned(zt, spark, {"o_custkey": (10_000_000, None)})
    assert report["files_read"] == 0
    assert pruned.count() == 0


def test_read_pruned_conservative_without_stats(spark, orders, tmp_path):
    zt = VersionedTable(tmp_path / "zc")
    layout.write_zordered(zt, orders, _zkey(orders), ["o_days"], n_files=4)
    # o_custkey has no stats recorded -> no file may be skipped on it
    pruned, report = layout.read_pruned(zt, spark, {"o_custkey": (0, 5)})
    assert report["files_read"] == report["files_total"]
    expected = zt.read(spark).where(F.col("o_custkey") <= 5).count()
    assert pruned.count() == expected


def test_read_pruned_without_manifest_falls_back(spark, orders, tmp_path):
    zt = VersionedTable(tmp_path / "zf")
    zt.commit(orders)  # plain commit: no stats manifest
    pruned, report = layout.read_pruned(zt, spark, {"o_custkey": (0, 5)})
    assert report["files_total"] is None
    assert (
        pruned.count()
        == zt.read(spark).where(F.col("o_custkey") <= 5).count()
    )


def test_dim_store_optimize_history_and_key_probe(tmp_path, spark):
    """optimize_history z-orders the history with a stats manifest;
    read_history_for_keys prunes files on the key box and returns
    exactly the full-filter rows (and falls back cleanly before any
    optimize ran)."""
    from conftest import CHANGE_SCHEMA, make_change
    import datetime as dt

    from cdc_historical_warehouse_platform_spark.sources.dim_store import SCD2DimStore

    store = SCD2DimStore(tmp_path / "dim")

    def ts(m):
        return dt.datetime(2026, 2, 1, 12, m % 60, 0)

    keys = list(range(1, 41))
    b1 = spark.createDataFrame(
        [make_change(i, "INSERT", ts(0)) for i in keys], CHANGE_SCHEMA
    )
    assert store.apply_batch(spark, b1, txn_id="t1")
    # three update waves -> 120 expired history rows
    for wave in (1, 2, 3):
        b = spark.createDataFrame(
            [
                make_change(i, "UPDATE", ts(wave), quantity=wave + 1)
                for i in keys
            ],
            CHANGE_SCHEMA,
        )
        assert store.apply_batch(spark, b, txn_id=f"u{wave}")

    # fallback path before optimize: full read, no manifest
    df0, rep0 = store.read_history_for_keys(spark, 5, 10)
    assert rep0["files_total"] is None
    expected = sorted(
        (r.order_key, str(r.valid_from))
        for r in store.read_history(spark)
        .where((F.col("order_key") >= 5) & (F.col("order_key") <= 10))
        .collect()
    )
    assert sorted((r.order_key, str(r.valid_from)) for r in df0.collect()) == expected

    result = store.optimize_history(spark, n_files=8)
    assert result["files"] == 8
    df1, rep1 = store.read_history_for_keys(spark, 5, 10)
    assert rep1["files_read"] < rep1["files_total"], rep1
    assert sorted((r.order_key, str(r.valid_from)) for r in df1.collect()) == expected
    # the store still satisfies its invariants after the rewrite
    assert store.read(spark).count() == 160  # 40 current + 120 expired

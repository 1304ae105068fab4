"""Z-order clustering (operators/clustering.py): key correctness and
the property that justifies it — a box filter touches far fewer files
than on an unclustered layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.operators.clustering import write_zordered, zorder_key
from tests.conftest import SF_DIR


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (2, 1)], ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x",
            "y",
            zorder_key([F.col("x"), F.col("y")], [0, 0], [3, 3], bits=2).alias("z"),
        ).collect()
    }
    # col 0's bit i lands at position 2i, col 1's at 2i+1
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111
    assert got[(2, 1)] == 0b0110  # x=10 -> bits at 2,0 = 1,0; y=01 -> bits at 3,1 = 0,1


def test_zordered_box_filter_touches_fewer_files(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    meta = write_zordered(
        orders,
        str(tmp_path / "z"),
        ["o_custkey", "o_totalprice"],
        num_files=16,
        max_records_per_file=2_000,
    )
    # unclustered baseline: same data, same file count, random layout
    orders.repartition(16).write.parquet(str(tmp_path / "flat"))

    lo_c, hi_c = 100, 200
    lo_p, hi_p = 10_000.0, 30_000.0
    box = (
        (F.col("o_custkey") >= lo_c)
        & (F.col("o_custkey") <= hi_c)
        & (F.col("o_totalprice") >= lo_p)
        & (F.col("o_totalprice") <= hi_p)
    )

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    n_match = spark.read.parquet(str(tmp_path / "z")).filter(box).count()
    assert n_match > 0
    z_files = files_touched(str(tmp_path / "z"))
    flat_files = files_touched(str(tmp_path / "flat"))
    # the point of the layout: matching rows live in a handful of curve
    # segments instead of everywhere
    assert z_files < flat_files, (z_files, flat_files)
    assert z_files <= max(4, flat_files // 2), (z_files, flat_files)

    # row set is unchanged by the rewrite
    a = {r["o_orderkey"] for r in spark.read.parquet(str(tmp_path / "z")).collect()}
    b = {r["o_orderkey"] for r in orders.collect()}
    assert a == b
    assert meta["cols"] == ["o_custkey", "o_totalprice"]


def test_zorder_append_clamps_out_of_range(spark, tmp_path):
    """Appends beyond the original bounds clamp to edge cells instead of
    erroring — the documented degrade-then-rewrite behavior."""
    base = spark.createDataFrame(
        [(i, float(i % 50)) for i in range(100)], ["a", "b"]
    )
    meta = write_zordered(base, str(tmp_path / "z2"), ["a", "b"], num_files=4)
    out_of_range = spark.createDataFrame([(10_000, 9_999.0)], ["a", "b"])
    key = zorder_key(
        [F.col("a"), F.col("b")], meta["mins"], meta["maxs"], meta["bits"]
    )
    val = out_of_range.select(key.alias("z")).collect()[0]["z"]
    max_cell = (1 << meta["bits"]) - 1
    full = zorder_key(
        [F.lit(max_cell), F.lit(max_cell)], [0, 0], [max_cell, max_cell], meta["bits"]
    )
    expect = spark.range(1).select(full.alias("z")).collect()[0]["z"]
    assert val == expect  # clamped to the top-corner cell


def test_zorder_nulls_cluster_low_and_bad_inputs_error(spark, tmp_path):
    """NULL values cluster at the LOW corner (least/greatest skip nulls,
    so without the explicit branch they'd land at the TOP cell next to
    the max rows); empty/all-NULL inputs and mismatched bounds raise
    clear errors instead of TypeError/silent truncation."""
    import pytest

    df = spark.createDataFrame([(None, 3), (0, 3)], "x int, y int")
    got = {
        r["x"]: r["z"]
        for r in df.select(
            "x",
            zorder_key([F.col("x"), F.col("y")], [0, 0], [3, 3], bits=2).alias("z"),
        ).collect()
    }
    assert got[None] == got[0] == 0b1010  # NULL ≡ low corner on x

    with pytest.raises(ValueError, match="bounds must cover"):
        zorder_key([F.col("x"), F.col("y")], [0], [3, 3], bits=2)
    with pytest.raises(ValueError, match="empty input or all-NULL"):
        write_zordered(
            spark.createDataFrame([], "a int, b int"),
            str(tmp_path / "zz"),
            ["a", "b"],
        )

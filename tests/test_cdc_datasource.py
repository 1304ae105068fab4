"""sources/cdc_datasource.py — the cdc_batches Python DataSource.

Parity pin: reading a CDC directory through the registered format must
row-equal the union of the pipeline's own per-batch reads, in BOTH
wire formats, with one partition per batch and correct per-row batch
lineage.
"""

from __future__ import annotations

import datetime as dt

from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA
from cdc_historical_warehouse_platform_spark.sources.cdc_datasource import CDCBatchDataSource
from cdc_historical_warehouse_platform_spark.sources.change_batches import (
    discover_batches,
    read_change_batch,
    write_change_batch,
)
from tests.conftest import make_change


def ts(m):
    return dt.datetime(2026, 4, 1, 9, 0, 0) + dt.timedelta(minutes=m)


def _write_batches(spark, cdc_dir):
    b1 = [make_change(i, "INSERT", ts(i)) for i in range(1, 4)]
    b2 = [make_change(1, "UPDATE", ts(10), quantity=9),
          make_change(2, "DELETE", ts(11))]
    write_change_batch(spark.createDataFrame(b1, CHANGE_SCHEMA), cdc_dir,
                       extracted_at=ts(5), fmt="reference")
    write_change_batch(spark.createDataFrame(b2, CHANGE_SCHEMA), cdc_dir,
                       extracted_at=ts(12), fmt="jsonl")


def _register(spark):
    # registering the same short name twice in one session raises —
    # tests in this file share the session fixture
    try:
        spark.dataSource.register(CDCBatchDataSource)
    except Exception as e:  # already registered by an earlier test
        if "already" not in str(e).lower():
            raise


def _rows(df):
    cols = [f.name for f in CHANGE_SCHEMA.fields]
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_datasource_matches_pipeline_reader_both_formats(spark, tmp_path):
    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    _write_batches(spark, cdc_dir)
    _register(spark)
    via_ds = spark.read.format("cdc_batches").load(str(cdc_dir))

    expected = None
    for b in discover_batches(cdc_dir):
        part = read_change_batch(spark, b)
        expected = part if expected is None else expected.unionByName(part)
    assert _rows(via_ds) == _rows(expected)

    # one partition per batch, lineage column names the right batch
    assert via_ds.rdd.getNumPartitions() == 2
    per_batch = {
        r["batch_file"]: r["n"]
        for r in via_ds.groupBy("batch_file").count().withColumnRenamed("count", "n").collect()
    }
    assert sorted(per_batch.values()) == [2, 3]


def test_datasource_single_batch_and_sql(spark, tmp_path):
    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    _write_batches(spark, cdc_dir)
    _register(spark)
    one = discover_batches(cdc_dir)[0]
    df = spark.read.format("cdc_batches").load(str(one))
    assert df.count() == 3
    # the registered format composes with plain SQL
    df.createOrReplaceTempView("cdc_wire")
    got = spark.sql(
        "SELECT operation_type, COUNT(*) n FROM cdc_wire GROUP BY 1"
    ).collect()
    assert {(r["operation_type"], r["n"]) for r in got} == {("INSERT", 3)}


def test_streaming_source_tails_new_batches_exactly_once(spark, tmp_path):
    """readStream.format('cdc_batches'): the name-ordered offset makes
    each committed batch file read exactly once across restarts —
    including the ENVELOPE format the JVM file source cannot stream."""
    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    _write_batches(spark, cdc_dir)  # 3 + 2 rows, one of each format
    _register(spark)

    sink = str(tmp_path / "sink")

    def drain():
        q = (
            spark.readStream.format("cdc_batches")
            .load(str(cdc_dir))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink)

    first = drain()
    assert first.count() == 5
    assert first.select("batch_file").distinct().count() == 2

    # a third batch arrives; the SAME checkpoint reads only the new one
    b3 = [make_change(7, "INSERT", ts(20))]
    write_change_batch(spark.createDataFrame(b3, CHANGE_SCHEMA), cdc_dir,
                       extracted_at=ts(21), fmt="reference")
    second = drain()
    assert second.count() == 6  # exactly one new row, older rows not re-read
    assert second.filter("id = 7").count() == 1


def test_writer_roundtrip_and_loader_interop(spark, tmp_path):
    """df.write.format('cdc_batches') emits a batch the PIPELINE can
    consume: read_change_batch round-trips the rows and SCD2Loader
    processes the directory like any extractor-produced batch."""
    from cdc_historical_warehouse_platform_spark.pipeline.loader import SCD2Loader
    from cdc_historical_warehouse_platform_spark.sources.dim_store import SCD2DimStore

    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    _register(spark)
    rows = [make_change(i, "INSERT", ts(i)) for i in range(1, 5)]
    df = spark.createDataFrame(rows, CHANGE_SCHEMA)
    (
        df.write.format("cdc_batches")
        .mode("append")
        .option("extracted_at", ts(6).isoformat())
        .save(str(cdc_dir))
    )
    batches = discover_batches(cdc_dir)
    assert len(batches) == 1 and batches[0].is_dir()
    back = read_change_batch(spark, batches[0])
    assert _rows(back) == _rows(df)
    # no temp residue
    assert not list(cdc_dir.glob(".*tmp"))

    dim = SCD2DimStore(tmp_path / "dim")
    loader = SCD2Loader(spark, dim, cdc_dir)
    run = loader.load_pending()
    assert run["processed"] == 1
    assert dim.read_current(spark).count() == 4


def test_writer_requires_append_and_extracted_at(spark, tmp_path):
    import pytest

    _register(spark)
    df = spark.createDataFrame([make_change(1, "INSERT", ts(0))], CHANGE_SCHEMA)
    with pytest.raises(Exception, match="append-only|extracted_at"):
        df.write.format("cdc_batches").mode("overwrite").save(str(tmp_path / "x"))
    with pytest.raises(Exception, match="extracted_at"):
        df.write.format("cdc_batches").mode("append").save(str(tmp_path / "y"))


def test_writer_commit_prunes_losing_attempt_files(spark, tmp_path):
    """A failed/speculative task attempt leaves a partial part file in
    the staging dir; commit() must keep ONLY the files named in the
    WriterCommitMessages, so the committed batch carries exactly the
    winning attempts' rows (change_count == parsed rows)."""
    import json as _json

    from cdc_historical_warehouse_platform_spark.sources.cdc_datasource import _CDCBatchWriter

    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    w = _CDCBatchWriter({"path": str(cdc_dir), "extracted_at": ts(9).isoformat()})
    rows = spark.createDataFrame(
        [make_change(i, "INSERT", ts(i)) for i in range(1, 4)], CHANGE_SCHEMA
    ).collect()
    msg = w.write(iter(rows))
    # plant a losing attempt's partial file (truncated mid-record)
    orphan = __import__("pathlib").Path(w.tmp) / "part-deadbeef.json"
    orphan.write_text('{"id": 999, "operation": "INS')
    w.commit([msg])
    (batch,) = list(cdc_dir.glob("changes_*"))
    assert not (batch / "part-deadbeef.json").exists()
    meta = _json.loads((batch / "_batch_metadata.json").read_text())
    _register(spark)
    back = read_change_batch(spark, batch)
    assert back.count() == meta["change_count"] == 3

"""End-to-end pipeline: simulator → extractor → loader → invariants —
the Spark twin of tests/verify_scd2.py's live-Postgres flow."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.pipeline.extractor import CDCExtractor
from cdc_historical_warehouse_platform_spark.pipeline.loader import SCD2Loader
from cdc_historical_warehouse_platform_spark.pipeline.metadata import PipelineMetadataManager
from cdc_historical_warehouse_platform_spark.pipeline.simulator import OrderSimulator
from cdc_historical_warehouse_platform_spark.sources.change_batches import (
    read_change_batch,
    write_change_batch,
)
from cdc_historical_warehouse_platform_spark.sources.dim_store import SCD2DimStore
from cdc_historical_warehouse_platform_spark.sources.tables import VersionedTable
from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA
from tests.conftest import make_change
from tests.test_scd2 import assert_invariants

T0 = dt.datetime(2026, 4, 1, 9, 0, 0)


def ts(m):
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture
def env(tmp_path, spark):
    source = VersionedTable(tmp_path / "source_orders")
    deleted = VersionedTable(tmp_path / "deleted_orders")
    dim = SCD2DimStore(tmp_path / "dim_orders_history")
    meta = PipelineMetadataManager(spark, tmp_path / "pipeline_metadata")
    cdc_dir = tmp_path / "cdc_logs"
    sim = OrderSimulator(spark, source, deleted, seed=7)
    ext = CDCExtractor(spark, source, cdc_dir, deleted_table=deleted)
    loader = SCD2Loader(spark, dim, cdc_dir, metadata=meta)
    return sim, ext, loader, dim, meta


def test_versioned_table_atomicity(tmp_path, spark):
    t = VersionedTable(tmp_path / "t")
    assert not t.exists()
    v0 = t.commit(spark.range(5))
    v1 = t.commit(spark.range(10))
    assert (v0, v1) == (0, 1)
    assert t.read(spark).count() == 10
    assert t.read(spark, version=0).count() == 5
    # idempotent txn redelivery
    v2 = t.commit(spark.range(99), txn_id="tx1")
    v_again = t.commit(spark.range(1), txn_id="tx1")
    assert v2 == v_again and t.read(spark).count() == 99
    # vacuum keeps the newest versions readable
    removed = t.vacuum(keep_last=1)
    assert 0 in removed
    assert t.read(spark).count() == 99


def test_txn_version_checked_raises_on_pruned_entry(tmp_path, spark):
    """r10 (verdict task #3): the pruned-txn guard lives in
    VersionedTable itself now — txn_version_checked raises for a txn
    that IS in the committed ledger but whose version entry fell out of
    txn_versions retention, instead of the silent None that made replay
    readers fall back to the LATEST snapshot. Plain txn_version keeps
    its documented None fallback."""
    import json as _json

    import pytest
    from cdc_historical_warehouse_platform_spark.sources.tables import (
        PrunedTxnVersionError,
    )

    t = VersionedTable(tmp_path / "t")
    t.commit(spark.range(5), txn_id="tx1")
    t.commit(spark.range(9), txn_id="tx2")
    assert t.txn_version_checked("tx1") == 0  # committed, entry present
    assert t.txn_version_checked("never") is None  # never committed

    ptr = t._pointer_file()
    meta = _json.loads(ptr.read_text())
    del meta["txn_versions"]["tx1"]  # simulate retention pruning
    ptr.write_text(_json.dumps(meta))

    with pytest.raises(PrunedTxnVersionError, match="pruned from txn_versions"):
        t.txn_version_checked("tx1")
    assert t.txn_version("tx1") is None  # documented silent fallback
    assert t.txn_version_checked("tx2") == 1  # unpruned txns unaffected


def test_batch_file_roundtrip(tmp_path, spark):
    """Reference envelope format: write (default=str quirk) → read →
    typed values survive (F8/F10)."""
    changes = spark.createDataFrame(
        [make_change(1, "INSERT", ts(0), unit_price="39.99")], CHANGE_SCHEMA
    )
    p = write_change_batch(changes, tmp_path, extracted_at=ts(1), watermark=ts(0))
    assert p.name.startswith("changes_") and p.suffix == ".json"
    # the stringified quirk is on disk...
    import json

    raw = json.loads(p.read_text())
    assert raw["changes"][0]["unit_price"] == "39.99"
    assert raw["batch_metadata"]["change_count"] == 1
    # ...and typed after the read-back casts
    back = read_change_batch(spark, p).collect()[0]
    assert str(back["unit_price"]) == "39.99"
    assert back["cdc_timestamp"] == ts(0)


def test_jsonl_batch_roundtrip(tmp_path, spark):
    changes = spark.createDataFrame(
        [make_change(i, "INSERT", ts(i)) for i in range(3)], CHANGE_SCHEMA
    )
    p = write_change_batch(changes, tmp_path, extracted_at=ts(5), fmt="jsonl")
    assert p.is_dir()
    back = read_change_batch(spark, p)
    assert back.count() == 3
    # nullability is lost through JSON round-trips; names+types must hold
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in CHANGE_SCHEMA.fields
    ]


def test_e2e_simulator_extractor_loader(env, spark):
    sim, ext, loader, dim, meta = env
    sim.seed_orders(5, now=ts(0))
    batch1 = ext.run_once(now=ts(1))
    assert batch1 is not None
    res1 = loader.load_pending()
    assert res1["status"] == "completed" and res1["processed"] == 1

    stats = loader.summary_statistics()
    assert stats["total_records"] == 5 and stats["current_records"] == 5

    # mutate a few cycles, extract, load
    for i in range(3):
        sim.mutate_once(now=ts(10 + i))
        ext.run_once(now=ts(10 + i))
    res2 = loader.load_pending()
    assert res2["failed"] == 0

    rows = dim.read(spark).collect()
    assert_invariants(rows)

    # source current state == dim current slice (lineage check)
    src = {r["id"]: r for r in sim._orders().collect()}
    cur = {r["order_key"]: r for r in dim.read(spark).filter(F.col("is_current")).collect()}
    assert set(cur) == set(src)
    for k, r in cur.items():
        assert r["quantity"] == src[k]["quantity"]
        assert r["order_status"] == src[k]["order_status"]

    # metadata recorded the runs
    last = meta.last_run()
    assert last is not None and last["status"] == "completed"
    assert meta.stats()["total_runs"] >= 2


def test_loader_idempotent_replay(env, spark):
    sim, ext, loader, dim, meta = env
    sim.seed_orders(4, now=ts(0))
    ext.run_once(now=ts(1))
    loader.load_pending()
    v = dim.version()
    before = sorted(map(str, dim.read(spark).collect()))
    # replaying everything is a no-op: ledger + txn guard
    res = loader.load_pending()
    assert res["processed"] == 0
    assert dim.version() == v
    assert sorted(map(str, dim.read(spark).collect())) == before


def test_extractor_watermark_advances(env, spark):
    sim, ext, loader, dim, meta = env
    sim.seed_orders(3, now=ts(0))
    ext.run_once(now=ts(1))
    wm1 = ext.watermark.get()
    assert wm1 == ts(0)  # max(last_updated) of the seed batch
    # no new changes -> no batch
    assert ext.run_once(now=ts(2)) is None
    sim.mutate_once(now=ts(5))
    ext.run_once(now=ts(6))
    assert ext.watermark.get() >= wm1


def test_delete_newer_than_updates_extracted_once(env, spark):
    """A delete with deleted_at newer than every last_updated must be
    extracted exactly once — the watermark advances over tombstone
    cdc_timestamps too (reference log_extractor.py:253-261), not just
    max(last_updated), or the same DELETE re-emits every cycle."""
    sim, ext, loader, dim, meta = env
    sim.seed_orders(5, now=ts(0))
    assert ext.run_once(now=ts(1)) is not None  # wm -> ts(0)
    # tombstone newer than every update, written straight to the audit
    # table (the simulator's BEFORE-DELETE-trigger stand-in)
    victim = sim._orders().filter(F.col("id") == 1)
    tomb = victim.select(
        "*",
        F.lit(ts(5)).cast("timestamp").alias("deleted_at"),
        F.lit("test").alias("deletion_reason"),
    )
    deleted = ext.deleted_table
    base = deleted.read(spark) if deleted.exists() else spark.createDataFrame([], tomb.schema)
    deleted.commit(base.unionByName(tomb))

    batch1 = ext.run_once(now=ts(6))
    assert batch1 is not None
    ops = [r["operation_type"] for r in read_change_batch(spark, batch1).collect()]
    assert ops == ["DELETE"]
    assert ext.watermark.get() == ts(5)  # cleared the tombstone's event time
    # second cycle: nothing new — the delete must NOT re-extract
    assert ext.run_once(now=ts(7)) is None


def test_delete_flows_through_pipeline(env, spark):
    sim, ext, loader, dim, meta = env
    sim.seed_orders(12, now=ts(0))
    ext.run_once(now=ts(1))
    loader.load_pending()
    # force deletes by mutating until one lands (seeded rng, >10 rows)
    deleted_any = False
    for i in range(8):
        ops = sim.mutate_once(now=ts(10 + i))
        if ops["deletes"]:
            deleted_any = True
        ext.run_once(now=ts(10 + i))
    loader.load_pending()
    rows = dim.read(spark).collect()
    assert_invariants(rows)
    if deleted_any:
        src_ids = {r["id"] for r in sim._orders().collect()}
        cur_ids = {
            r["order_key"]
            for r in dim.read(spark).filter(F.col("is_current")).collect()
        }
        assert cur_ids == src_ids  # deleted keys have no current version


def test_batch_id_distributed_and_order_insensitive(tmp_path, spark):
    """Backfill-sized batch ids: no id array is collected, so the id
    must be stable under repartition/shuffle order and sensitive to
    content."""
    from cdc_historical_warehouse_platform_spark.pipeline.state import ProcessedLedger, generate_batch_id

    big = spark.range(0, 200_000).select(F.col("id"))
    a = generate_batch_id(big)
    b = generate_batch_id(big.repartition(17))  # different partition order
    assert a == b
    c = generate_batch_id(spark.range(0, 200_001).select(F.col("id")))
    assert c != a
    # duplicate ids are content, not noise
    d = generate_batch_id(big.unionAll(big.limit(1)))
    assert d != a

    # ledger: one parse per run, cache tracks in-process appends and
    # survives external writers (stat-key invalidation)
    led = ProcessedLedger(tmp_path / "ledger")
    led.mark("f1", a)
    assert led.is_processed("f1", a) and not led.is_processed("f1", c)
    other = ProcessedLedger(tmp_path / "ledger")  # external append
    other.mark("f2", c)
    assert led.is_processed("f2", c)


def test_partitioned_commit_type_fidelity_and_pruning(tmp_path, spark):
    """Boolean partition columns must come back as booleans, and a
    filter on the partition column must prune the other branch."""
    t = VersionedTable(tmp_path / "pt")
    df = spark.createDataFrame(
        [(1, True, "a"), (2, False, "b"), (3, True, "c")], ["k", "flag", "v"]
    )
    t.commit(df, partition_by=["flag"])
    back = t.read(spark)
    assert dict(back.dtypes)["flag"] == "boolean"
    assert back.count() == 3
    cur = back.filter(F.col("flag"))
    assert {r["k"] for r in cur.collect()} == {1, 3}
    # pruning: the filter constant-folds the false branch away — the
    # optimized plan scans exactly ONE parquet relation and carries the
    # partition value as a literal
    plan = cur._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1
    assert "true AS flag" in plan


def test_dim_store_history_is_append_only(tmp_path, spark):
    """The split store must never rewrite history segments — per-batch
    cost stays O(current+batch) no matter how deep history gets."""
    from cdc_historical_warehouse_platform_spark.sources.dim_store import SCD2DimStore

    store = SCD2DimStore(tmp_path / "dim")
    b1 = spark.createDataFrame([make_change(i, "INSERT", ts(i)) for i in (1, 2)], CHANGE_SCHEMA)
    assert store.apply_batch(spark, b1, txn_id="t1", batch_id="b1")
    b2 = spark.createDataFrame([make_change(1, "UPDATE", ts(10), quantity=5)], CHANGE_SCHEMA)
    assert store.apply_batch(spark, b2, txn_id="t2", batch_id="b2")

    hist_seg0 = tmp_path / "dim" / "history" / "v0"
    assert hist_seg0.exists()
    mtime0 = max(p.stat().st_mtime for p in hist_seg0.rglob("*.parquet"))

    b3 = spark.createDataFrame([make_change(2, "UPDATE", ts(20), quantity=7)], CHANGE_SCHEMA)
    assert store.apply_batch(spark, b3, txn_id="t3", batch_id="b3")
    # segment v0 untouched by the later batch; a new segment appeared
    assert max(p.stat().st_mtime for p in hist_seg0.rglob("*.parquet")) == mtime0
    assert (tmp_path / "dim" / "history" / "v1").exists()

    rows = store.read(spark).collect()
    assert_invariants(rows)
    assert len(rows) == 4  # 2 expired + 2 current
    # replayed txn is a no-op
    assert store.apply_batch(spark, b3, txn_id="t3", batch_id="b3") is False
    assert len(store.read(spark).collect()) == 4


def test_dim_store_history_compaction(tmp_path, spark):
    from cdc_historical_warehouse_platform_spark.sources.dim_store import SCD2DimStore

    store = SCD2DimStore(tmp_path / "dim")
    store.apply_batch(
        spark,
        spark.createDataFrame([make_change(1, "INSERT", ts(0))], CHANGE_SCHEMA),
        txn_id="t0",
    )
    for i in range(1, 4):  # three updates -> three history segments
        store.apply_batch(
            spark,
            spark.createDataFrame(
                [make_change(1, "UPDATE", ts(10 * i), quantity=i + 1)], CHANGE_SCHEMA
            ),
            txn_id=f"t{i}",
        )
    before = sorted(map(str, store.read(spark).collect()))
    assert store.compact_history(spark, max_segments=2) is True
    after = sorted(map(str, store.read(spark).collect()))
    assert after == before
    # consolidated: latest history manifest has exactly one segment
    hmeta = store.history._read_pointer()
    assert len(hmeta["manifests"][str(hmeta["version"])]) == 1
    # no-op below the threshold
    assert store.compact_history(spark, max_segments=2) is False


def test_loader_reports_corrupt_batch(env, spark):
    """A malformed batch file must fail the run (status=failed, error
    recorded in metadata) without corrupting the dim."""
    sim, ext, loader, dim, meta = env
    sim.seed_orders(3, now=ts(0))
    ext.run_once(now=ts(1))
    loader.load_pending()
    good = sorted(map(str, dim.read(spark).collect()))
    # drop a corrupt envelope into the cdc dir
    (loader.cdc_dir / "changes_99999999_999999_999.json").write_text("{not json")
    res = loader.load_pending()
    assert res["status"] == "failed" and res["failed"] == 1
    assert meta.last_run()["status"] == "failed"
    assert sorted(map(str, dim.read(spark).collect())) == good


def test_lineage_report_artifact(env, spark, tmp_path):
    """The validate artifact (reference verify_scd2.py:344-495): a
    markdown lineage report for a sampled order with version timeline
    and invariant results; invariant_counts must agree with the
    3-query formulation on a violating dimension."""
    from cdc_historical_warehouse_platform_spark.pipeline.lineage import (
        generate_lineage_report,
        invariant_counts,
        pick_sample_key,
    )

    sim, ext, loader, dim, meta = env
    sim.seed_orders(6, now=ts(0))
    ext.run_once(now=ts(1))
    loader.load_pending()
    def touch(status, when):
        src = sim._orders()
        hit = F.col("id") == 2
        sim.source.commit(
            src.withColumn(
                "order_status", F.when(hit, F.lit(status)).otherwise(F.col("order_status"))
            ).withColumn(
                "last_updated",
                F.when(hit, F.lit(when).cast("timestamp")).otherwise(F.col("last_updated")),
            )
        )

    touch("shipped", ts(10))
    ext.run_once(now=ts(11))
    loader.load_pending()
    touch("delivered", ts(20))
    ext.run_once(now=ts(21))
    loader.load_pending()

    d = dim.read(spark)
    assert invariant_counts(d) == {
        "V1_duplicate_current": 0,
        "V2_flag_violations": 0,
        "V3_overlaps": 0,
    }
    assert pick_sample_key(d) == 2  # most-versioned order

    report = generate_lineage_report(spark, d, last_run=meta.last_run())
    assert "# SCD Type 2 Lineage Report" in report
    assert "**Order ID:** 2" in report
    assert "PASSED" in report
    assert report.count("### Version") == 3  # insert + 2 updates
    assert "NULL (Current)" in report  # open-ended current version
    assert "## Order Lineage Timeline" in report
    (tmp_path / "lineage.md").write_text(report)

    # invariant violations must be counted, and fail the report status
    bad = d.withColumn("is_current", F.lit(True))
    inv = invariant_counts(bad)
    assert inv["V1_duplicate_current"] == 1  # key 2 has 3 "current" rows
    assert inv["V2_flag_violations"] == 2  # closed rows flagged current
    bad_report = generate_lineage_report(spark, bad)
    assert "FAILED" in bad_report


def test_streamed_envelope_byte_identical_to_json_dumps(tmp_path, spark):
    """The streamed reference-envelope writer must emit byte-identical
    output to json.dumps(payload, indent=2) — wire compat holds while
    driver memory stays bounded (toLocalIterator, one partition at a
    time). Also: empty batch and multi-row ordering."""
    import json

    from cdc_historical_warehouse_platform_spark.sources.change_batches import _stringify

    for n in (0, 1, 7):
        changes = spark.createDataFrame(
            [make_change(i, "INSERT", ts(i)) for i in range(n)], CHANGE_SCHEMA
        ).repartition(3)
        d = tmp_path / f"n{n}"
        p = write_change_batch(
            changes, d, extracted_at=ts(30), watermark=ts(29), fmt="reference"
        )
        rows = [
            _stringify(r.asDict())
            for r in changes.orderBy("last_updated", "id").collect()
        ]
        expected = json.dumps(
            {
                "batch_metadata": {
                    "extracted_at": ts(30).isoformat(),
                    "change_count": n,
                    "watermark": ts(29).isoformat(),
                },
                "changes": rows,
            },
            indent=2,
        )
        assert p.read_text() == expected
        # running log appended once per row, in batch order
        log = d / "running_changes.jsonl"
        if n:
            assert [json.loads(l)["id"] for l in log.read_text().splitlines()] == list(range(n))
        else:
            assert not log.exists()


def test_lineage_report_nonexistent_key_reports_cleanly(env, spark):
    from cdc_historical_warehouse_platform_spark.pipeline.lineage import generate_lineage_report

    sim, ext, loader, dim, meta = env
    sim.seed_orders(3, now=ts(0))
    ext.run_once(now=ts(1))
    loader.load_pending()
    report = generate_lineage_report(spark, dim.read(spark), order_key=999999)
    assert "999999" in report and "no rows" in report  # not an IndexError


def test_empty_reference_envelope_roundtrip(tmp_path, spark):
    """An empty batch ("changes": []) must read back as zero typed rows
    — schema inference used to give the array a non-struct element type
    and crash the c.* expansion before the loader's own empty guard."""
    from cdc_historical_warehouse_platform_spark.sources.change_batches import (
        read_change_batch,
        write_change_batch,
    )
    from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA

    empty = spark.createDataFrame([], CHANGE_SCHEMA)
    p = write_change_batch(empty, tmp_path, extracted_at=ts(1), watermark=ts(0))
    back = read_change_batch(spark, p)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == [f.name for f in CHANGE_SCHEMA.fields]


def test_cleanup_covers_jsonl_directories(env, spark):
    """Retention must reclaim jsonl batch DIRECTORIES too — the old
    file-only glob silently no-op'd under fmt='jsonl'."""
    import os
    import time as _time

    sim, ext, loader, dim, meta = env
    ext.fmt = "jsonl"
    sim.seed_orders(2, now=ts(0))
    batch = ext.run_once(now=ts(1))
    assert batch is not None and batch.is_dir()
    old = _time.time() - 48 * 3600
    os.utime(batch, (old, old))
    assert ext.cleanup_old_batches(max_age_hours=24.0) == 1
    assert not batch.exists()


def test_simulator_sample_pool_bounds_driver_collect(spark, tmp_path):
    """sample_pool mode must mutate correctly while collecting at most
    pool-size ids per cycle (the big-table-safe variant of the
    reference's full id collect)."""
    from cdc_historical_warehouse_platform_spark.pipeline.simulator import OrderSimulator
    from cdc_historical_warehouse_platform_spark.sources.tables import VersionedTable

    src = VersionedTable(tmp_path / "orders")
    sim = OrderSimulator(spark, src, seed=7, sample_pool=5)
    sim.seed_orders(25)
    before = src.read(spark).count()
    total_ops = {"inserts": 0, "updates": 0, "deletes": 0}
    for _ in range(5):
        ops = sim.mutate_once()
        for k in total_ops:
            total_ops[k] += ops[k]
    after = src.read(spark).count()
    assert after == before + total_ops["inserts"] - total_ops["deletes"]
    # ids keep advancing past the seeded range (max-id agg, not collect)
    assert sim._next_id > 25


def test_kpis_report_true_record_throughput(spark, tmp_path, change_df):
    """The monitoring KPI set (reference README.md:752-762): record
    throughput comes from the loader's true row accounting (the run
    table's records_* columns carry batch counts), replays raise the
    duplicate-batch rate, and the watermark-lag alert fires past 300 s."""
    import datetime as dt

    from cdc_historical_warehouse_platform_spark.pipeline.loader import SCD2Loader
    from cdc_historical_warehouse_platform_spark.pipeline.metadata import (
        PipelineMetadataManager,
    )
    from cdc_historical_warehouse_platform_spark.sources.change_batches import write_change_batch
    from cdc_historical_warehouse_platform_spark.sources.dim_store import SCD2DimStore

    t0 = dt.datetime(2026, 5, 1, 12, 0, 0)
    cdc = tmp_path / "cdc"
    cdc.mkdir()
    write_change_batch(
        change_df([make_change(i, "INSERT", t0) for i in range(1, 8)]),
        cdc, extracted_at=t0, fmt="jsonl",
    )
    meta = PipelineMetadataManager(spark, tmp_path / "meta")
    loader = SCD2Loader(spark, SCD2DimStore(tmp_path / "dim"), cdc, metadata=meta)
    loader.load_pending()
    loader.load_pending()  # pure replay: 0 rows, 1 skipped batch

    k = meta.kpis(watermark=dt.datetime.utcnow() - dt.timedelta(seconds=400))
    assert k["rows_loaded_7d"] == 7
    assert k["runs_7d"] == 2
    assert k["duplicate_batch_rate"] == 0.5  # the replay run
    assert k["failed_batch_rate"] == 0.0
    assert "watermark_lag_sec > 300" in k["alerts"]
    assert k["sustained_throughput_rps"] is None or k["sustained_throughput_rps"] > 0

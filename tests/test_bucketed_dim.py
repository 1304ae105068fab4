"""sources/dim_store.BucketedSCD2DimStore (range buckets) + MergeOnReadSCD2DimStore.

The lockstep suite drives the SAME batch sequence through the
full-rewrite store and the bucketed store and asserts current +
history equality after every batch; the bounded-work suite asserts
untouched bucket directories survive BY REFERENCE (same paths, never
rewritten); plus replay idempotence and vacuum safety.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.sources.dim_store import (
    BucketedSCD2DimStore,
    SCD2DimStore,
)
from tests.conftest import make_change


def ts(s):
    return dt.datetime(2026, 3, 1, 12, 0, 0) + dt.timedelta(seconds=s)


def _rows(df, cols=("order_key", "quantity", "order_status", "is_current", "valid_from")):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


BATCHES = [
    [make_change(i, "INSERT", ts(i)) for i in range(1, 31)],
    [make_change(3, "UPDATE", ts(100), quantity=7, status="shipped"),
     make_change(11, "UPDATE", ts(101), quantity=2)],
    [make_change(3, "UPDATE", ts(200), quantity=9),
     make_change(40, "INSERT", ts(201)),
     make_change(11, "DELETE", ts(202))],
    [make_change(40, "UPDATE", ts(300), status="confirmed"),
     make_change(41, "INSERT", ts(301))],
]


def test_lockstep_equality_with_full_rewrite_store(spark, change_df, tmp_path):
    full = SCD2DimStore(tmp_path / "full")
    buck = BucketedSCD2DimStore(tmp_path / "buck", key_span=4)
    for i, rows in enumerate(BATCHES):
        batch = change_df(rows)
        assert full.apply_batch(spark, batch, txn_id=f"t{i}")
        assert buck.apply_batch(spark, batch, txn_id=f"t{i}")
        assert _rows(full.read_current(spark)) == _rows(buck.read_current(spark)), i
        assert _rows(full.read_history(spark)) == _rows(buck.read_history(spark)), i
    assert _rows(full.read(spark)) == _rows(buck.read(spark))
    assert full.summary(spark) == buck.summary(spark)


def test_untouched_buckets_survive_by_reference(spark, change_df, tmp_path):
    buck = BucketedSCD2DimStore(tmp_path / "b", key_span=4)
    buck.apply_batch(spark, change_df(BATCHES[0]), txn_id="seed")
    map_before = dict(buck._read_pointer()["buckets"])
    # a 2-key micro-batch touches at most 2 buckets
    buck.apply_batch(spark, change_df(BATCHES[1]), txn_id="b1")
    meta = buck._read_pointer()
    map_after = meta["buckets"]
    changed = {b for b in map_before if map_after.get(b) != map_before[b]}
    added = set(map_after) - set(map_before)
    assert len(changed | added) <= 2
    # untouched buckets: the SAME directory names — zero rewrite
    untouched = set(map_before) - changed
    assert untouched and all(map_after[b] == map_before[b] for b in untouched)


def test_replay_is_noop_and_history_not_double_appended(spark, change_df, tmp_path):
    buck = BucketedSCD2DimStore(tmp_path / "b", key_span=8)
    buck.apply_batch(spark, change_df(BATCHES[0]), txn_id="t0")
    buck.apply_batch(spark, change_df(BATCHES[1]), txn_id="t1")
    cur = _rows(buck.read_current(spark))
    hist = _rows(buck.read_history(spark))
    assert buck.apply_batch(spark, change_df(BATCHES[1]), txn_id="t1") is False
    assert _rows(buck.read_current(spark)) == cur
    assert _rows(buck.read_history(spark)) == hist


def test_vacuum_retires_only_superseded_dirs(spark, change_df, tmp_path):
    buck = BucketedSCD2DimStore(tmp_path / "b", key_span=8)
    for i, rows in enumerate(BATCHES):
        buck.apply_batch(spark, change_df(rows), txn_id=f"t{i}")
    cur = _rows(buck.read_current(spark))
    removed = buck.vacuum_buckets(keep_last=1)
    # live data unaffected; every removed dir is truly unreferenced
    assert _rows(buck.read_current(spark)) == cur
    live = set(buck._read_pointer()["buckets"].values())
    assert live.isdisjoint(removed)
    # idempotent
    assert buck.vacuum_buckets(keep_last=1) == []


def test_delete_can_empty_a_bucket(spark, change_df, tmp_path):
    buck = BucketedSCD2DimStore(tmp_path / "b", key_span=2)
    buck.apply_batch(spark, change_df([make_change(1, "INSERT", ts(0))]), txn_id="t0")
    buck.apply_batch(spark, change_df([make_change(1, "DELETE", ts(10))]), txn_id="t1")
    cur = buck.read_current(spark)
    assert cur.filter(F.col("order_key") == 1).count() == 0
    # the tombstoned key's history row exists and the store stays readable
    assert buck.read_history(spark).filter(F.col("order_key") == 1).count() >= 1
    buck.apply_batch(spark, change_df([make_change(2, "INSERT", ts(20))]), txn_id="t2")
    assert _rows(buck.read_current(spark), ("order_key",)) == [(2,)]


def test_mor_lockstep_equality_and_delta_bound(spark, change_df, tmp_path):
    from cdc_historical_warehouse_platform_spark.sources.dim_store import (
        MergeOnReadSCD2DimStore,
    )

    full = SCD2DimStore(tmp_path / "full")
    mor = MergeOnReadSCD2DimStore(tmp_path / "mor")
    for i, rows in enumerate(BATCHES):
        batch = change_df(rows)
        assert full.apply_batch(spark, batch, txn_id=f"t{i}")
        assert mor.apply_batch(spark, batch, txn_id=f"t{i}")
        assert _rows(full.read_current(spark)) == _rows(mor.read_current(spark)), i
        assert _rows(full.read_history(spark)) == _rows(mor.read_history(spark)), i
    # delta segments are batch-bounded: the seed is the base, each
    # later batch appended exactly one segment
    meta = mor._read_pointer()
    assert len(meta["delta_segments"]) == len(BATCHES) - 1
    assert full.summary(spark) == mor.summary(spark)


def test_mor_delete_then_reinsert(spark, change_df, tmp_path):
    from cdc_historical_warehouse_platform_spark.sources.dim_store import (
        MergeOnReadSCD2DimStore,
    )

    mor = MergeOnReadSCD2DimStore(tmp_path / "m")
    mor.apply_batch(spark, change_df([make_change(1, "INSERT", ts(0)),
                                      make_change(2, "INSERT", ts(1))]), txn_id="t0")
    mor.apply_batch(spark, change_df([make_change(1, "DELETE", ts(10))]), txn_id="t1")
    assert _rows(mor.read_current(spark), ("order_key",)) == [(2,)]
    # re-insert after tombstone: the higher-seq delta row wins
    mor.apply_batch(spark, change_df([make_change(1, "INSERT", ts(20), quantity=5)]), txn_id="t2")
    cur = _rows(mor.read_current(spark), ("order_key", "quantity"))
    assert cur == [(1, 5), (2, 1)]


def test_mor_compaction_preserves_state_and_clears_deltas(spark, change_df, tmp_path):
    from cdc_historical_warehouse_platform_spark.sources.dim_store import (
        MergeOnReadSCD2DimStore,
    )

    mor = MergeOnReadSCD2DimStore(tmp_path / "m")
    for i, rows in enumerate(BATCHES):
        mor.apply_batch(spark, change_df(rows), txn_id=f"t{i}")
    cur, hist = _rows(mor.read_current(spark)), _rows(mor.read_history(spark))
    assert mor.compact_current(spark, max_segments=0)
    meta = mor._read_pointer()
    assert meta["delta_segments"] == []
    assert _rows(mor.read_current(spark)) == cur
    assert _rows(mor.read_history(spark)) == hist
    # below threshold: no-op
    assert mor.compact_current(spark, max_segments=0) is False
    # replay guard still intact after compaction
    assert mor.apply_batch(spark, change_df(BATCHES[1]), txn_id="t1") is False


def test_time_travel_reads_base_store(spark, change_df, tmp_path):
    """read(version=N) returns the dimension exactly as it stood after
    batch N — the sub-tables retain those versions until vacuum."""
    store = SCD2DimStore(tmp_path / "d")
    snapshots = {}
    for i, rows in enumerate(BATCHES):
        store.apply_batch(spark, change_df(rows), txn_id=f"t{i}")
        snapshots[i] = _rows(store.read(spark))
    for i in range(len(BATCHES)):
        assert _rows(store.read(spark, version=i)) == snapshots[i], i
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pointer log"):
        store.read(spark, version=99)


def test_time_travel_reads_mor_store(spark, change_df, tmp_path):
    from cdc_historical_warehouse_platform_spark.sources.dim_store import (
        MergeOnReadSCD2DimStore,
    )

    store = MergeOnReadSCD2DimStore(tmp_path / "m")
    snapshots = {}
    for i, rows in enumerate(BATCHES):
        store.apply_batch(spark, change_df(rows), txn_id=f"t{i}")
        snapshots[i] = _rows(store.read(spark))
    for i in range(len(BATCHES)):
        assert _rows(store.read(spark, version=i)) == snapshots[i], i
    # compaction folds the base: pre-fold versions become unreadable
    # LOUDLY (their segments are retired), the latest stays exact
    assert store.compact_current(spark, max_segments=0)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compact_current|pointer log"):
        store.read(spark, version=1)
    assert _rows(store.read(spark)) == snapshots[len(BATCHES) - 1]


def test_time_travel_reads_bucketed_store(spark, change_df, tmp_path):
    store = BucketedSCD2DimStore(tmp_path / "b", key_span=4)
    snapshots = {}
    for i, rows in enumerate(BATCHES):
        store.apply_batch(spark, change_df(rows), txn_id=f"t{i}")
        snapshots[i] = _rows(store.read(spark))
    for i in range(len(BATCHES)):
        assert _rows(store.read(spark, version=i)) == snapshots[i], i
    # vacuum retires superseded dirs -> pre-vacuum versions fail LOUDLY
    store.vacuum_buckets(keep_last=1)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vacuum|retained"):
        store.read(spark, version=0)
    assert _rows(store.read(spark)) == snapshots[len(BATCHES) - 1]

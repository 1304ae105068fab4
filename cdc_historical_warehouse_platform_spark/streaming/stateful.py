"""Custom stateful streaming operator (ST5): per-key current-state
store via ``applyInPandasWithState``.

The reference keeps per-key current-version state *in the warehouse
table* and updates it row-at-a-time (scd2_loader.py:286-446). The
foreachBatch MERGE (streaming/pipeline.py) is the recommended
re-expression; this module is the **pure-streaming alternative** the
SURVEY maps to ``applyInPandasWithState`` — per-key state lives in the
state store (checkpointed, partitioned by key across executors), and
each trigger emits the keys whose current version changed.

Scale: state is hash-partitioned on the business key (same shuffle as
the MERGE join would need); per-key state is one row, so the state
store holds |keys| rows regardless of history depth — at 100 TB the
history lives in the sink, only the current image stays in state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "streaming_current_state",
    "CURRENT_STATE_SCHEMA",
    "streaming_throttle",
    "THROTTLE_SCHEMA",
]

# Emitted row: the key's current image. On DELETE the last image is
# retained with is_deleted=true (matching the batch dimension, whose
# tombstoned history keeps the final payload); keys with no applied
# change in a trigger emit nothing.
CURRENT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("order_key", T.LongType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("cdc_timestamp", T.TimestampType()),
        T.StructField("n_versions", T.LongType()),
        T.StructField("is_deleted", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("quantity", T.IntegerType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("cdc_ts_us", T.LongType()),  # µs epoch — timestamps
        T.StructField("n_versions", T.LongType()),  # aren't state-safe
        T.StructField("is_deleted", T.BooleanType()),
    ]
)


# Same-timestamp tiebreak, SHARED with the batch path (one dict, not a
# copy — the two paths must agree on final state for identical inputs,
# and an import can't drift): later lifecycle op wins, so a
# same-timestamp DELETE beats an UPDATE regardless of arrival order.
from cdc_historical_warehouse_platform_spark.operators.scd2 import _OP_PRIORITY


def _update_key(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this trigger's changes (event-time order, batch-path
    tiebreak) into the key state."""
    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.assign(
        __prio=rows["operation_type"].map(_OP_PRIORITY).fillna(0)
    ).sort_values(["cdc_timestamp", "__prio"], kind="mergesort")

    if state.exists:
        qty, status, ts_us, n_versions, is_deleted = state.get
    else:
        qty, status, ts_us, n_versions, is_deleted = None, None, -1, 0, False

    mutated = False
    for rec in rows.itertuples(index=False):
        rec_us = int(pd.Timestamp(rec.cdc_timestamp).value // 1000)
        if rec_us < ts_us:
            continue  # late duplicate older than current state
        if rec.operation_type == "DELETE":
            if not is_deleted and n_versions > 0:
                is_deleted = True
                ts_us = rec_us
                mutated = True
        else:
            # normalize before comparing: a null quantity must not
            # poison the fold (int(NaN) raises) nor spuriously differ
            new_qty = None if pd.isna(rec.quantity) else int(rec.quantity)
            changed = (
                is_deleted
                or n_versions == 0
                or new_qty != qty
                or rec.order_status != status
            )
            if changed:
                qty = new_qty
                status = rec.order_status
                ts_us = rec_us
                n_versions += 1
                is_deleted = False
                mutated = True

    if not mutated:
        # nothing applied (all-duplicate redelivery, or DELETE of a
        # never-seen key): leave state untouched — no phantom entry,
        # no re-emitted unchanged row
        return
    state.update((qty, status, ts_us, n_versions, is_deleted))
    yield pd.DataFrame(
        [
            {
                "order_key": key[0],
                "quantity": qty,
                "order_status": status,
                "cdc_timestamp": pd.Timestamp(ts_us * 1000) if ts_us >= 0 else None,
                "n_versions": n_versions,
                "is_deleted": is_deleted,
            }
        ]
    )


def streaming_current_state(changes: DataFrame) -> DataFrame:
    """changes stream → per-key current-image stream (update mode).

    Input needs columns: id, quantity, order_status, operation_type,
    cdc_timestamp (the CHANGE_SCHEMA core).
    """
    from pyspark.sql import functions as F

    slim = changes.select(
        F.col("id").cast("long").alias("order_key"),
        F.col("quantity").cast("int").alias("quantity"),
        "order_status",
        "operation_type",
        "cdc_timestamp",
    )
    return slim.groupBy("order_key").applyInPandasWithState(
        _update_key,
        outputStructType=CURRENT_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- time-window event throttle (r10) ----------------------------------------

THROTTLE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_THROTTLE_STATE = T.StructType([T.StructField("last_ts_us", T.LongType())])


def streaming_throttle(events: DataFrame, min_gap_us: int = 120_000_000) -> DataFrame:
    """Streaming twin of the batch ``events_throttle_dedup`` row: per
    (user, event_type) stream, drop an event arriving less than
    ``min_gap_us`` after its PREDECESSOR (kept or dropped — the same
    lag semantics as the batch query, so streaming ≡ batch on any
    per-key ts-ordered delivery). State is ONE int64 per key (the last
    event's µs timestamp) in the checkpointed state store —
    hash-partitioned on the key, constant per key at any volume.

    Input needs columns: event_id, user_id, event_type, ts. Emits the
    KEPT events (append semantics; use outputMode("update") —
    applyInPandasWithState's contract)."""
    from pyspark.sql import functions as F

    def _throttle(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        last = state.get[0] if state.exists else None
        keep = []
        for rec in rows.itertuples(index=False):
            ts_us = int(pd.Timestamp(rec.ts).value // 1000)
            keep.append(last is None or ts_us - last >= min_gap_us)
            last = ts_us  # lag semantics: EVERY event advances the gap base
        state.update((last,))
        kept = rows[pd.Series(keep, index=rows.index)]
        if len(kept):
            yield kept[["event_id", "user_id", "event_type", "ts"]]

    slim = events.select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        "event_type",
        F.col("ts").cast("timestamp"),
    )
    return slim.groupBy("user_id", "event_type").applyInPandasWithState(
        _throttle,
        outputStructType=THROTTLE_SCHEMA,
        stateStructType=_THROTTLE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

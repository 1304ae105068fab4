"""Property-based SCD2 testing (SURVEY.md §5): random CDC op
interleavings must always satisfy the V1-V3 invariants, and replaying a
log change-by-change must equal the one-pass bulk build.

Generalizes technical_audit.py test 3 from one crafted sequence to
arbitrary ones. Example counts are small because each example spins
real Spark jobs; the sequences still cover INSERT/UPDATE/DELETE
interleavings, re-inserts after delete, and no-op duplicates.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_historical_warehouse_platform_spark.operators.scd2 import (
    empty_dim,
    scd2_build_from_change_log,
    scd2_merge,
)
from cdc_historical_warehouse_platform_spark.schemas import CHANGE_SCHEMA
from tests.conftest import make_change
from tests.test_scd2 import assert_invariants

T0 = dt.datetime(2026, 7, 1, 0, 0, 0)

# One op: (key 1-3, op, quantity 1-4). Timestamps are assigned by
# position so every sequence is strictly time-ordered.
op_strategy = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
    st.integers(min_value=1, max_value=4),
)
sequence_strategy = st.lists(op_strategy, min_size=1, max_size=7)


def _changes(seq):
    return [
        make_change(key, op, T0 + dt.timedelta(minutes=i), quantity=qty)
        for i, (key, op, qty) in enumerate(seq)
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=sequence_strategy)
def test_random_sequences_hold_invariants_and_match_bulk_build(spark, seq):
    rows = _changes(seq)
    log = spark.createDataFrame(rows, CHANGE_SCHEMA)

    bulk = scd2_build_from_change_log(log)
    bulk_rows = bulk.collect()
    assert_invariants(bulk_rows)

    dim = empty_dim(spark)
    for row in rows:
        dim = scd2_merge(
            dim, spark.createDataFrame([row], CHANGE_SCHEMA)
        ).localCheckpoint(eager=True)
    iter_rows = dim.collect()
    assert_invariants(iter_rows)

    cols = ["order_key", "quantity", "valid_from", "valid_to", "is_current"]
    assert sorted(tuple(r[c] for c in cols) for r in bulk_rows) == sorted(
        tuple(r[c] for c in cols) for r in iter_rows
    )

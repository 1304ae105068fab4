"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cdc_historical_warehouse_platform_spark/``; this module is a
thin adapter over the query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module from anywhere; make the package importable.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: SCD2 change-frequency report (SURVEY.md §2 A3) over an
    SCD2 dimension built end-to-end from the deterministic change log
    derived from sf0.001 orders."""
    from cdc_historical_warehouse_platform_spark.plans.reference_queries import q_change_frequency

    return q_change_frequency(spark, SMOKE_SF_DIR)


def _registry() -> dict[str, tuple]:
    from cdc_historical_warehouse_platform_spark.plans.reference_queries import REFERENCE_QUERIES

    out: dict[str, tuple] = {}
    out.update(REFERENCE_QUERIES)
    try:
        from cdc_historical_warehouse_platform_spark.plans.relational_queries import RELATIONAL_QUERIES

        out.update(RELATIONAL_QUERIES)
    except ImportError:
        pass
    try:
        from cdc_historical_warehouse_platform_spark.plans.datapipe_queries import DATAPIPE_QUERIES

        out.update(DATAPIPE_QUERIES)
    except ImportError:
        pass
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys without SQL get a rows-only check."""
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }

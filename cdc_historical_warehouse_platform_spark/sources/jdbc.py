"""Live-database (JDBC) source — the reference's actual entry point.

The reference extractor connects straight to a running Postgres with
retry (src/cdc/log_extractor.py:56-79) and issues
``SELECT ... WHERE last_updated > %s`` per cycle (log_extractor.py:
110-140). The Spark-first equivalent is a ``spark.read.jdbc`` scan:

- **Predicate pushdown**: the JDBC relation compiles Catalyst filters
  into the remote ``WHERE`` clause (``pushDownPredicate`` is on by
  default), so ``detect_changes``' disjunctive watermark filter
  (``last_updated > wm OR created_at > wm``) runs DB-side against the
  table's index — the cluster never sees unchanged rows, exactly like
  the reference's parameterized query.
- **Parallel scan**: with ``partition_column`` set, the read is split
  into ``num_partitions`` range-bounded queries (bounds discovered
  with a pushed-down min/max probe), so a backfill streams out of the
  database on N connections instead of one. Incremental cycles on a
  small delta can leave it unset — one connection, one round trip.
- **Connection retry**: transient connect failures are retried with
  the reference's 5×5 s schedule (log_extractor.py:57-58).

No external driver jars are needed for tests: Spark bundles Apache
Derby (its Hive-metastore store), and the suite runs a real
end-to-end extract against an embedded Derby database.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["JdbcSource", "DataFrameSource"]


class JdbcSource:
    """A ``CDCExtractor``-compatible source backed by a JDBC table.

    Duck-typed to the extractor's source protocol: anything with
    ``read(spark) -> DataFrame``.
    """

    def __init__(
        self,
        url: str,
        table: str,
        *,
        user: str | None = None,
        password: str | None = None,
        driver: str | None = None,
        fetch_size: int = 10_000,
        partition_column: str | None = None,
        num_partitions: int = 8,
        options: dict[str, str] | None = None,
        max_retries: int = 5,
        retry_delay_s: float = 5.0,
    ):
        self.url = url
        self.table = table
        self.user = user
        self.password = password
        self.driver = driver
        self.fetch_size = fetch_size
        self.partition_column = partition_column
        self.num_partitions = num_partitions
        self.extra_options = dict(options or {})
        self.max_retries = max_retries
        self.retry_delay_s = retry_delay_s

    # --- option building (pure; unit-testable without a database) ----------

    def _options(self, dbtable: str | None = None) -> dict[str, str]:
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": dbtable or self.table,
            "fetchsize": str(self.fetch_size),
            # both default to true; pinned so a config drift can't
            # silently turn the watermark filter into a full-table pull
            "pushDownPredicate": "true",
            "pushDownLimit": "true",
        }
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.driver is not None:
            opts["driver"] = self.driver
        opts.update(self.extra_options)
        return opts

    def _partition_options(self, lo, hi) -> dict[str, str]:
        assert self.partition_column is not None
        return {
            "partitionColumn": self.partition_column,
            "lowerBound": str(lo),
            "upperBound": str(hi),
            "numPartitions": str(self.num_partitions),
        }

    # --- retry (reference log_extractor.py:56-79) ---------------------------

    def _with_retry(self, fn: Callable[[], DataFrame]) -> DataFrame:
        last: Exception | None = None
        attempts = max(1, self.max_retries)  # always try at least once
        for attempt in range(attempts):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — JDBC raises via py4j
                last = e
                if attempt < attempts - 1:
                    time.sleep(self.retry_delay_s)
        assert last is not None
        raise last

    # --- the source protocol ------------------------------------------------

    def _bounds(self, spark: SparkSession) -> tuple | None:
        """Min/max probe for the partition column — a 1-row pushed-down
        aggregate query, not a table scan."""
        pc = self.partition_column
        probe = f"(SELECT MIN({pc}) AS lo, MAX({pc}) AS hi FROM {self.table}) bounds"
        row = (
            spark.read.format("jdbc").options(**self._options(probe)).load().collect()
        )[0]
        # positional: some engines (Derby) fold unquoted aliases to upper-case
        if row[0] is None:
            return None
        return row[0], row[1]

    def read(self, spark: SparkSession) -> DataFrame:
        def _load() -> DataFrame:
            opts = self._options()
            if self.partition_column is not None:
                b = self._bounds(spark)
                if b is not None and b[0] != b[1]:
                    opts.update(self._partition_options(*b))
            df = spark.read.format("jdbc").options(**opts).load()
            # normalize to the engine's canonical lower-case column
            # names: engines that fold unquoted identifiers to upper
            # case (Derby, Oracle, DB2) would otherwise leak ID/
            # CUSTOMER_ID into downstream sinks — SQL resolution is
            # case-insensitive but JSON field matching is NOT, so an
            # envelope written with upper-case keys reads back null
            return df.toDF(*[c.lower() for c in df.columns])

        return self._with_retry(_load)


class DataFrameSource:
    """Adapter making any DataFrame-producing callable (or a fixed
    DataFrame) extractor-compatible — the seam tests and notebook
    users plug arbitrary relations through."""

    def __init__(self, df_or_fn: DataFrame | Callable[[SparkSession], DataFrame]):
        self._src = df_or_fn

    def read(self, spark: SparkSession) -> DataFrame:
        if callable(self._src):
            return self._src(spark)
        return self._src

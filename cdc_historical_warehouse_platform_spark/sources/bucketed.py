"""Bucketed warehouse tables — co-located joins with no shuffle.

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle
of both sides. Spark's answer is bucketing: write each table
pre-hash-partitioned on the join key (``bucketBy(n, key)``) with an
in-file sort (``sortBy``); a join between two tables bucketed on the
same key with the same bucket count then reads bucket i against bucket
i directly — the executed plan has NO Exchange on either side (pinned
by tests/test_bucketed.py against the physical plan).

This generalizes the reference's warehouse DDL (schema.sql indexes
its dimension on the business key; SURVEY.md §2.1 S8/S9) to Spark's
storage model: where Postgres uses a b-tree to co-locate lookups,
a Spark warehouse uses bucket files to co-locate joins.

Notes for real deployments, encoded here so the local tests match:
- bucket metadata lives in the session catalog (``saveAsTable``);
  plain ``.parquet(path)`` writes cannot record it.
- both sides must agree on bucket count and key; a mismatch silently
  falls back to a shuffled join (test pins the no-Exchange property so
  a regression is loud).
- ``sortBy`` lets the sort-merge join skip its per-task sort when the
  scan preserves order; we always sort by the bucket key.

Sibling machinery: for PIPELINE-OWNED state whose source of truth is
files + a pointer/marker (not the catalog), use
``sources/tables.register_bucketed_dir`` / ``write_bucketed_dir`` —
they add idempotent re-registration from bare files (fresh sessions),
the repartition-to-bucket-count write discipline, and stale-entry
DROP hygiene. This module stays the catalog-native path for
user-facing warehouse tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed_table", "bucket_spec"]


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    path: str | None = None,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and in-file sorted) parquet table
    registered in the session catalog. `path` makes it an external
    table (required for tmp-dir tests; recommended for real
    warehouses so data outlives the metastore entry)."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    sort_cols = sort_cols or bucket_cols
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def bucket_spec(spark: SparkSession, name: str) -> dict:
    """Bucketing metadata the catalog recorded for `name` —
    {num_buckets, bucket_cols, sort_cols}. Raises if the table exists
    but is unbucketed (a silent fallback to shuffled joins is the
    failure mode bucketing regressions hide in)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    info = {r.col_name: r.data_type for r in rows}
    if "Num Buckets" not in info:
        raise ValueError(f"table {name} is not bucketed")
    return {
        "num_buckets": int(info["Num Buckets"]),
        "bucket_cols": info.get("Bucket Columns", ""),
        "sort_cols": info.get("Sort Columns", ""),
    }

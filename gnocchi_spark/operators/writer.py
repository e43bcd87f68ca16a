"""Rollup table writers: layout decisions that matter at 100 TB.

Two physical layouts, both produced by the same logical rollup:

- **date-partitioned parquet** (default sink): ``bucket_day``
  partitions give retention-as-partition-drop and time-range partition
  pruning; the streaming merge sink rewrites only touched days.
- **bucketed table** (``write_bucketed_rollups``): ``bucketBy(metric_id)``
  pre-shuffles the table once at write time so every later
  metric-keyed operation — resource⋈metric joins, per-metric reads,
  cross-metric alignment — reads co-located buckets and plans WITHOUT
  an Exchange.  This is the durable version of the reference's sacks:
  hash(metric) % N as a storage layout instead of a queue shard
  (incoming/__init__.py:243-247).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_rollups(rollups: DataFrame, path: str) -> None:
    """Date-partitioned parquet layout (see streaming.ingest for the
    incremental writer)."""
    rollups.withColumn("bucket_day", F.to_date("bucket_ts")).write.mode(
        "overwrite"
    ).partitionBy("bucket_day").parquet(path)


def write_bucketed_rollups(
    rollups: DataFrame,
    table: str,
    num_buckets: int = 64,
    sort_by: str = "bucket_ts",
) -> None:
    """Persist rollups bucketed (and sorted) by metric_id.

    ``bucketBy`` needs a table-catalog entry (saveAsTable); reads of
    the table expose the bucketing to Catalyst, so joins and
    aggregations keyed on metric_id skip their shuffle.
    """
    (
        rollups.write.mode("overwrite")
        .bucketBy(num_buckets, "metric_id")
        .sortBy("metric_id", sort_by)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

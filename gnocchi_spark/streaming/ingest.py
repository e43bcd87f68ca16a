"""Streaming measure ingestion -> materialized rollups.

Reference write path (gnocchi/storage/__init__.py:583-692; sacks
gnocchi/incoming/__init__.py:161-257; daemons gnocchi/cli/metricd.py)
re-expressed as Structured Streaming:

===========================  =========================================
Reference concept            Spark equivalent here
===========================  =========================================
sack (ingestion shard)       shuffle partition of groupBy(metric_id)
back_window late bound       ``withWatermark(ts, back_window x gran)``;
                             older points silently dropped, matching
                             BoundTimeSerie.set_values
                             (carbonara.py:321-373,465-476)
mutable tail splits          streaming state (update mode) merged into
                             the table per micro-batch
frozen splits                watermark-finalized windows (append mode
                             emits each bucket exactly once)
refresh-on-read              ``read_with_tail`` — union of the rollup
                             table and an on-the-fly aggregation of
                             not-yet-processed measures
                             (rest/api.py:539-547, chef.py:347-381)
===========================  =========================================

Scale design: the only shuffle is the windowed groupBy keyed
(metric_id, window) — state is per-bucket partial aggregates, uniform
across metrics (no hot keys: bucket count per metric is bounded by the
policy).  The merge sink rewrites only the partitions a micro-batch
touches (dynamic partition overwrite on bucket_day), which is the
parquet equivalent of the reference's rewrite-mutable /
compress-frozen split lifecycle; on Delta Lake the same batch function
becomes a keyed ``MERGE INTO``.

``rate:*`` methods need the previous raw point per metric (lag state,
storage/__init__.py:618-622): they are supported on the
``read_with_tail``/batch path, not in the streaming aggregation —
mirroring the reference, which re-reads the raw back-window rather
than merging rate aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gnocchi_spark.functions.aggregates import agg_expr, safe_alias, std_having
from gnocchi_spark.functions.timeutil import granularity_label, granularity_seconds
from gnocchi_spark.policy import parse_method

MEASURES_SCHEMA = T.StructType(
    [
        T.StructField("metric_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("seq", T.LongType()),
    ]
)


def read_measures_stream(
    spark: SparkSession, landing_dir: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source measure stream from a landing directory (the batch
    POST endpoints of the reference become 'drop a file here')."""
    return (
        spark.readStream.format(fmt)
        .schema(MEASURES_SCHEMA)
        .option("path", landing_dir)
        .load()
    )


def _window_aggs(
    methods: Sequence[str], value_col: str, ts_col: str
) -> list[Column]:
    aggs: list[Column] = []
    need_count = any(parse_method(m)[0] == "std" for m in methods)
    if need_count and "count" not in methods:
        aggs.append(F.count(F.col(value_col)).alias("__cnt"))
    for m in methods:
        base, _, _ = parse_method(m)
        if base == "rate":
            raise ValueError(
                "rate:* needs per-metric lag state; use the batch/"
                "read_with_tail path (see module docstring)"
            )
        aggs.append(agg_expr(m, value=value_col, ts=ts_col).alias(safe_alias(m)))
    return aggs


def streaming_rollup(
    measures: DataFrame,
    methods: Sequence[str],
    granularity: float | str,
    back_window_seconds: float,
    metric_col: str = "metric_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregation for one granularity.

    The watermark is the back-window bound: a point older than
    ``max(event time) - back_window`` is dropped exactly like
    BoundTimeSerie truncation.  Multi-granularity policies start one
    query per granularity off the same source stream (each granularity
    has its own watermark horizon in the reference too: block_size is
    per-policy coarsest, storage/__init__.py:618-622).
    """
    secs = float(granularity_seconds(granularity))
    gran_str = f"{int(secs)} seconds" if secs.is_integer() else f"{secs} seconds"
    wm = measures.withWatermark(ts_col, f"{int(back_window_seconds)} seconds")
    agged = wm.groupBy(
        F.col(metric_col).alias("metric_id"),
        F.window(F.col(ts_col), gran_str).alias("w"),
    ).agg(*_window_aggs(methods, value_col, ts_col))

    have_cnt = "count" if "count" in methods else "__cnt"
    cols: list[Column] = []
    for m in methods:
        c: Column = F.col(safe_alias(m))
        if parse_method(m)[0] == "std":
            # std bucket suppression (carbonara.py:180-182)
            c = F.when(std_having(F.col(have_cnt)), c)
        cols.append(c.alias(safe_alias(m)))
    return agged.select(
        "metric_id",
        F.col("w.start").alias("bucket_ts"),
        # the string label shared with the batch long layout, so reads
        # mixing streamed and batch-materialized buckets (get_measures
        # filters on granularity_label) see ONE schema
        F.lit(granularity_label(granularity)).alias("granularity"),
        *cols,
    )


def start_append_sink(
    rollup_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Frozen-split path: append mode emits each (metric, bucket) once,
    when the watermark passes the window end — the streaming analogue
    of compress-once-immutable (storage/__init__.py:454-459,529-550).
    Append-only parquet, no rewrite, no merge."""
    writer = (
        rollup_stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", table_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_batch_into_rollup(
    batch_df: DataFrame,
    table_dir: str,
    key_cols: Sequence[str] = ("metric_id", "granularity", "bucket_ts"),
) -> None:
    """Mutable-tail path: upsert a micro-batch of (re)computed buckets
    into the rollup table, rewriting only the touched bucket_day
    partitions (dynamic partition overwrite).

    Parquet stand-in for ``MERGE INTO rollups USING batch ON keys``;
    the reference's equivalent is _update_metric_splits re-reading and
    merging mutable splits (storage/__init__.py:370-430).
    """
    from gnocchi_spark.operators.writer import staged_partition_overwrite

    spark = batch_df.sparkSession
    batch_df = batch_df.withColumn("bucket_day", F.to_date("bucket_ts"))
    try:
        existing = spark.read.parquet(table_dir)
        has_existing = True
    except Exception:
        has_existing = False
    if not has_existing:
        batch_df.write.mode("append").partitionBy("bucket_day").parquet(table_dir)
        return
    days = [r[0] for r in batch_df.select("bucket_day").distinct().collect()]
    affected = existing.where(F.col("bucket_day").isin(days))
    keep = affected.join(
        batch_df.select(*key_cols).distinct(), on=list(key_cols), how="left_anti"
    )
    # stage-then-overwrite: the merged plan reads the files the dynamic
    # overwrite deletes; staging breaks that cycle durably (persist()
    # only mitigated it — cache eviction mid-overwrite could recompute
    # from removed files)
    staged_partition_overwrite(keep.unionByName(batch_df), table_dir, "bucket_day")


def start_merge_sink(
    rollup_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Update-mode sink: every trigger re-emits buckets that changed and
    merges them into the table — late-but-within-back-window points
    update their bucket, exactly the reference's partial-recompute +
    split merge (storage/__init__.py:643-668)."""
    writer = (
        rollup_stream.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _epoch: merge_batch_into_rollup(df, table_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_with_tail(
    rollup_table: DataFrame,
    unprocessed_measures: DataFrame,
    methods: Sequence[str],
    granularity: float | str,
) -> DataFrame:
    """Refresh-on-read (``?refresh=true``): serve the rollup table plus
    an on-the-fly aggregation of measures the pipeline has not
    processed yet, preferring recomputed buckets on overlap.

    Cleaner than the reference's synchronous process-pending-measures
    (chef.py:347-381): the read path never blocks on the writer.
    """
    from gnocchi_spark.operators.rollup import rollup_wide

    tail = rollup_wide(unprocessed_measures, methods, granularity)
    tail = tail.select(
        "metric_id",
        "bucket_ts",
        F.lit(granularity_label(granularity)).alias("granularity"),
        *[safe_alias(m) for m in methods],
    )
    cols = ["metric_id", "bucket_ts", "granularity", *[safe_alias(m) for m in methods]]
    base = rollup_table.select(*cols).join(
        tail.select("metric_id", "bucket_ts").distinct(),
        on=["metric_id", "bucket_ts"],
        how="left_anti",
    )
    return base.unionByName(tail.select(*cols))

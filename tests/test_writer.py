"""Physical-layout tests: bucketed rollup tables plan metric-keyed
aggregations and joins without an exchange (the 100 TB co-location
story; SURVEY §2.2 sacks -> storage layout)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from gnocchi_spark.operators.writer import (
    read_table,
    write_bucketed_rollups,
    write_partitioned_rollups,
)


def _rollups(spark, n=1000):
    return spark.range(n).select(
        (F.col("id") % 50).cast("string").alias("metric_id"),
        F.lit("mean").alias("method"),
        F.lit(300.0).alias("granularity"),
        F.timestamp_seconds(1700000000 + (F.col("id") / 50).cast("long") * 300).alias(
            "bucket_ts"
        ),
        F.rand(7).alias("value"),
    )


def test_bucketed_aggregation_avoids_shuffle(spark, tmp_path):
    import shutil

    # saveAsTable writes to the default warehouse dir (gitignored);
    # clear any stale location from an earlier aborted run
    spark.sql("DROP TABLE IF EXISTS rollups_bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/rollups_bucketed", ignore_errors=True)
    write_bucketed_rollups(_rollups(spark), "rollups_bucketed", num_buckets=8)
    try:
        df = read_table(spark, "rollups_bucketed")
        agg = df.groupBy("metric_id").agg(F.avg("value"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # bucketing satisfies the hash requirement: no Exchange
        assert "Exchange" not in plan
        assert agg.count() == 50

        # metric-keyed self-join plans shuffle-free on both sides
        # (broadcast disabled: on a small table Catalyst rightly
        # prefers BroadcastExchange, which is not a shuffle)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = df.alias("a").join(
                read_table(spark, "rollups_bucketed").alias("b"), "metric_id"
            )
            jplan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in jplan
            assert "SortMergeJoin" in jplan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql("DROP TABLE IF EXISTS rollups_bucketed")


def test_partitioned_layout_prunes(spark, tmp_path):
    path = str(tmp_path / "part")
    write_partitioned_rollups(_rollups(spark), path)
    back = spark.read.parquet(path)
    one_day = back.where(
        F.col("bucket_day") == datetime.date(2023, 11, 14)
    )
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition filter handled at scan planning: no post-scan filter on
    # bucket_day and a single selected partition
    assert one_day.count() > 0
    assert one_day.select("bucket_day").distinct().count() == 1

"""Regression tests for TIMESTAMP_NTZ testdata (round-2 incident).

The driver's parquet generation switched from TIMESTAMP(NANOS)
(read as bigint under nanosAsLong) to TIMESTAMP(MICROS) with
isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ.
``unix_micros`` rejects NTZ, so every bucketing query failed in
CORRECTNESS_r02.  ``tables.load`` / ``events_as_measures`` must
normalize any timestamp flavor to plain TIMESTAMP so the engine is
insensitive to how the parquet writer marked its timestamps.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gnocchi_spark import tables
from gnocchi_spark.functions.timeutil import truncate_to_bucket


@pytest.fixture(scope="module")
def ntz_dir(spark, tmp_path_factory):
    """An events.parquet whose ts column is TIMESTAMP_NTZ on read."""
    d = str(tmp_path_factory.mktemp("ntzdata"))
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 4, 59), 7, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 5, 0), 7, "click", 3.0, "{}"),
        (3, dt.datetime(2024, 1, 2, 12, 0, 0), 8, "view", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    back = spark.read.parquet(f"{d}/events.parquet")
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"
    return d


def test_load_normalizes_ntz_to_timestamp(spark, ntz_dir):
    df = tables.load(spark, ntz_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # value-preserving under the UTC session
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    assert got[1] == dt.datetime(2024, 1, 1, 0, 4, 59)


def test_bucketing_works_on_ntz_source(spark, ntz_dir):
    df = tables.load(spark, ntz_dir, "events")
    out = (
        df.groupBy(truncate_to_bucket(F.col("ts"), 300).alias("bucket_ts"))
        .agg(F.sum("value").alias("s"))
        .orderBy("bucket_ts")
        .collect()
    )
    assert [(r["bucket_ts"], r["s"]) for r in out] == [
        (dt.datetime(2024, 1, 1, 0, 0), 1.0),
        (dt.datetime(2024, 1, 1, 0, 5), 3.0),
        (dt.datetime(2024, 1, 2, 12, 0), 5.0),
    ]


def test_events_as_measures_ntz_pushdown(spark, ntz_dir):
    m = tables.events_as_measures(
        spark, ntz_dir, start="2024-01-01T00:05:00", stop="2024-01-03T00:00:00"
    )
    assert dict(m.dtypes)["ts"] == "timestamp"
    assert sorted(r["seq"] for r in m.collect()) == [2, 3]
    # the range filter must reach the parquet scan as a plain NTZ
    # predicate (row-group skipping), not sit above a cast
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(ts)" in plan or "GreaterThanOrEqual(ts" in plan


def test_ltz_source_still_works(spark, tmp_path):
    d = str(tmp_path)
    rows = [(1, dt.datetime(2024, 1, 1), 7, "click", 1.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = tables.load(spark, d, "events")
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.count() == 1

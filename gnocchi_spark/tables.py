"""Testdata table loaders and the events->measures projection.

The driver provides TPC-H-ish parquet at /root/testdata/sf*/ (see
TESTDATA.md).  The ``events`` table plays the role of the reference's
measure stream (FIXTURES.md §7): ``metric_id = event_type``, plus the
event id as arrival-order sequence for deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 cannot map
        # to TimestampType; with spark.sql.legacy.parquet.nanosAsLong it
        # arrives as a long of nanoseconds.  Convert to Spark's native
        # us-precision timestamp (the driver data is us-aligned, so this
        # is lossless here; SURVEY.md §1.2 documents the ns->us policy).
        if dict(df.dtypes).get("ts") == "bigint":
            # integral division: `/` would go through double, whose
            # 53-bit mantissa cannot hold ns epochs (~1.7e18) — raw
            # timestamps came out +-1 us off
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def events_as_measures(
    spark: SparkSession, sf_dir: str, start=None, stop=None
) -> DataFrame:
    """Project the events stream onto the measures schema
    (FIXTURES.md §1): (metric_id, ts, value) + seq for arrival order.

    ``start``/``stop`` (datetime or ISO string) are applied to the RAW
    nanosecond column *before* the ns->us conversion: Catalyst cannot
    invert ``timestamp_micros(ts div 1000)``, so a filter on the
    converted column never reaches the parquet scan — the raw-long
    comparison does (row-group min/max skipping).  At 100 TB this is
    the difference between a pruned read and a full scan for
    refresh-on-read paths over raw measures.
    """
    import datetime as _dt

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw_ns = dict(df.dtypes).get("ts") == "bigint"

    def _ns(x):
        if isinstance(x, str):
            x = _dt.datetime.fromisoformat(x)
        if x.tzinfo is None:
            x = x.replace(tzinfo=_dt.timezone.utc)
        return int(x.timestamp() * 1_000_000_000)

    if raw_ns:
        if start is not None:
            df = df.where(F.col("ts") >= F.lit(_ns(start)))
        if stop is not None:
            df = df.where(F.col("ts") < F.lit(_ns(stop)))
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        if start is not None:
            df = df.where(F.col("ts") >= F.lit(start).cast("timestamp"))
        if stop is not None:
            df = df.where(F.col("ts") < F.lit(stop).cast("timestamp"))
    return df.select(
        F.col("event_type").alias("metric_id"),
        F.col("ts"),
        F.col("value"),
        F.col("event_id").alias("seq"),
    )

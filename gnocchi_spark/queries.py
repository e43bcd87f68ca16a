"""Query catalog: the driver-facing inventory of implemented operators.

Every entry pairs a Spark DataFrame implementation with an ANSI-SQL
oracle that DuckDB executes over the same parquet tables (driver
contract, see __spark_entry__.py).  Column names and float rounding are
aligned on both sides so the driver's order-insensitive value-hash
matches: floats are rounded (6 dp for means/points, 2 dp for large
sums) and every ordering has an explicit integer tie-break.

The gnocchi-semantics queries treat the ``events`` table as the measure
stream (metric_id = event_type), per FIXTURES.md §7.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gnocchi_spark import tables
from gnocchi_spark.operators.read import get_measures, resample_rollup
from gnocchi_spark.operators.rollup import rollup, rollup_wide

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """The driver hands us its own session; align the semantics-critical
    session-level configs (all runtime-settable)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def query(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def _measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.events_as_measures(spark, sf_dir)


# SQL fragment: floor-to-epoch bucketing identical to
# functions.timeutil.truncate_to_bucket.
def _sql_bucket(seconds: int, col: str = "ts") -> str:
    return (
        f"make_timestamp(CAST(floor(epoch({col}) / {seconds}) AS BIGINT) * {seconds} * 1000000)"
    )


# ---------------------------------------------------------------------------
# Core rollup kernels (SURVEY §2.3)
# ---------------------------------------------------------------------------

@query(
    "tsdb_rollup_mean_5m",
    f"""
    SELECT event_type AS metric_id, {_sql_bucket(300)} AS bucket_ts,
           round(avg(value), 6) AS mean
    FROM events GROUP BY 1, 2
    """,
)
def tsdb_rollup_mean_5m(spark, sf_dir):
    w = rollup_wide(_measures(spark, sf_dir), ["mean"], 300.0)
    return w.select("metric_id", "bucket_ts", F.round("mean", 6).alias("mean"))


@query(
    "tsdb_rollup_multi_1h",
    f"""
    SELECT event_type AS metric_id, {_sql_bucket(3600)} AS bucket_ts,
           round(avg(value), 6) AS mean,
           round(sum(value), 4) AS sum,
           round(min(value), 6) AS min,
           round(max(value), 6) AS max,
           CAST(count(value) AS BIGINT) AS count
    FROM events GROUP BY 1, 2
    """,
)
def tsdb_rollup_multi_1h(spark, sf_dir):
    w = rollup_wide(_measures(spark, sf_dir), ["mean", "sum", "min", "max", "count"], 3600.0)
    return w.select(
        "metric_id",
        "bucket_ts",
        F.round("mean", 6).alias("mean"),
        F.round("sum", 4).alias("sum"),
        F.round("min", 6).alias("min"),
        F.round("max", 6).alias("max"),
        F.col("count").cast("long").alias("count"),
    )


@query(
    "tsdb_rollup_std_1h",
    f"""
    SELECT event_type AS metric_id, {_sql_bucket(3600)} AS bucket_ts,
           round(stddev_samp(value), 6) AS std
    FROM events GROUP BY 1, 2 HAVING count(value) > 1
    """,
)
def tsdb_rollup_std_1h(spark, sf_dir):
    # sample std with single-point buckets suppressed (carbonara.py:180-182)
    long = rollup(_measures(spark, sf_dir), ["std"], 3600.0)
    return long.select(
        "metric_id", "bucket_ts", F.round("value", 6).alias("std")
    )


@query(
    "tsdb_rollup_pct_1d",
    f"""
    SELECT event_type AS metric_id, {_sql_bucket(86400)} AS bucket_ts,
           round(quantile_cont(value, 0.5), 6) AS median,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events GROUP BY 1, 2
    """,
)
def tsdb_rollup_pct_1d(spark, sf_dir):
    # linear-interpolation percentiles (carbonara.py:197-210)
    w = rollup_wide(_measures(spark, sf_dir), ["median", "95pct"], 86400.0)
    return w.select(
        "metric_id",
        "bucket_ts",
        F.round("median", 6).alias("median"),
        F.round(F.col("95pct"), 6).alias("p95"),
    )


@query(
    "tsdb_rollup_first_last_1h",
    f"""
    WITH b AS (
      SELECT event_type AS metric_id, {_sql_bucket(3600)} AS bucket_ts, value,
             row_number() OVER (PARTITION BY event_type, {_sql_bucket(3600)}
                                ORDER BY ts, event_id) AS rn_first,
             row_number() OVER (PARTITION BY event_type, {_sql_bucket(3600)}
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events)
    SELECT metric_id, bucket_ts,
           round(max(CASE WHEN rn_first = 1 THEN value END), 6) AS first,
           round(max(CASE WHEN rn_last = 1 THEN value END), 6) AS last
    FROM b GROUP BY 1, 2
    """,
)
def tsdb_rollup_first_last_1h(spark, sf_dir):
    # first/last by timestamp order in bucket (carbonara.py:187-195),
    # event_id tie-break for determinism.
    w = rollup_wide(_measures(spark, sf_dir), ["first", "last"], 3600.0, seq_col="seq")
    return w.select(
        "metric_id",
        "bucket_ts",
        F.round("first", 6).alias("first"),
        F.round("last", 6).alias("last"),
    )


@query(
    "tsdb_rate_mean_1h",
    f"""
    WITH d AS (
      SELECT event_type, ts,
             value - lag(value) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS dv
      FROM events)
    SELECT event_type AS metric_id, {_sql_bucket(3600)} AS bucket_ts,
           round(avg(dv), 6) AS rate_mean
    FROM d WHERE dv IS NOT NULL GROUP BY 1, 2
    """,
)
def tsdb_rate_mean_1h(spark, sf_dir):
    # rate:mean — diff consecutive raw values first (carbonara.py:212-221)
    long = rollup(_measures(spark, sf_dir), ["rate:mean"], 3600.0, seq_col="seq")
    return long.select(
        "metric_id", "bucket_ts", F.round("value", 6).alias("rate_mean")
    )


@query(
    "tsdb_resample_5m_to_1h",
    f"""
    WITH five AS (
      SELECT event_type AS metric_id, {_sql_bucket(300)} AS b5, avg(value) AS v
      FROM events GROUP BY 1, 2)
    SELECT metric_id, {_sql_bucket(3600, "b5")} AS bucket_ts,
           round(avg(v), 6) AS mean
    FROM five GROUP BY 1, 2
    """,
)
def tsdb_resample_5m_to_1h(spark, sf_dir):
    # read-time resample re-aggregates aggregated points with the same
    # method — mean of means by design (carbonara.py:594-598).
    five = rollup(_measures(spark, sf_dir), ["mean"], 300.0)
    out = resample_rollup(five, "mean", 3600.0)
    return out.select(
        "metric_id", "bucket_ts", F.round("value", 6).alias("mean")
    )


@query(
    "tsdb_calendar_week",
    """
    SELECT event_type AS metric_id, date_trunc('week', ts) AS bucket_ts,
           round(sum(value), 4) AS sum, CAST(count(*) AS BIGINT) AS count
    FROM events GROUP BY 1, 2
    """,
)
def tsdb_calendar_week(spark, sf_dir):
    # calendar (non-uniform) granularity W (calendar.py:95-100)
    w = rollup_wide(_measures(spark, sf_dir), ["sum", "count"], "W")
    return w.select(
        "metric_id",
        "bucket_ts",
        F.round("sum", 4).alias("sum"),
        F.col("count").cast("long").alias("count"),
    )


@query(
    "tsdb_read_window",
    f"""
    SELECT {_sql_bucket(3600)} AS bucket_ts,
           round(avg(value), 6) AS value
    FROM events
    WHERE event_type = 'purchase'
      AND ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts < TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY 1
    """,
)
def tsdb_read_window(spark, sf_dir):
    # read path: metric+method+granularity+time-range pruned scan
    # (rest/api.py:496-559).  start/stop land on bucket boundaries here.
    rollups = rollup(_measures(spark, sf_dir), ["mean"], 3600.0)
    out = get_measures(
        rollups, "purchase", "mean", 3600.0,
        start="2024-01-10 00:00:00", stop="2024-01-20 00:00:00",
    )
    return out.select("bucket_ts", F.round("value", 6).alias("value"))


# ---------------------------------------------------------------------------
# Generic relational coverage (TPC-H-ish)
# ---------------------------------------------------------------------------

@query(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )

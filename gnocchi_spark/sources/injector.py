"""Synthetic measure generator (reference ``gnocchi/cli/injector.py:33-107``).

The reference injects ``--metrics N x --measures M`` random measures at
one-second spacing and reports measures/s; this is the distributed
equivalent built on ``spark.range`` — no driver-side loops, partitions
scale with N x M.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)


def synthetic_measures(
    spark: SparkSession,
    n_metrics: int,
    n_measures: int,
    start: datetime.datetime = _EPOCH,
    interval_s: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """N metrics x M measures, 1/interval_s Hz, deterministic values.

    ``rand(seed)`` mirrors the reference's ``random.random()`` payload
    (``injector.py:61-63``); timestamps step uniformly from ``start``
    like its ``utcnow() + i sec`` loop (``injector.py:87-95``).
    """
    df = spark.range(n_metrics * n_measures).select(
        (F.col("id") % n_metrics).cast("string").alias("metric_id"),
        (F.col("id") / n_metrics).cast("long").alias("step"),
        F.rand(seed).alias("value"),
    )
    start_us = int(start.timestamp() * 1_000_000)
    return df.select(
        "metric_id",
        F.timestamp_micros(
            F.lit(start_us) + (F.col("step") * F.lit(interval_s * 1_000_000)).cast("long")
        ).alias("ts"),
        "value",
        F.col("step").alias("seq"),
    )

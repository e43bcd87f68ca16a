"""statsd ingest semantics (reference ``gnocchi/statsd.py:31-140``).

Wire format, one metric per line in a datagram::

    <name>:<value>|<type>[|@<sample_rate>]

Reference flush semantics reproduced (``statsd.py:61-96``):

- metric name is suffixed with the type: ``<name>|<type>``
  (``statsd.py:62-63``);
- ``ms`` (timer) and ``g`` (gauge) keep only the **last** value seen in
  the flush period (dict overwrite, ``statsd.py:64-76``);
- ``c`` (counter) accumulates ``value * (1 / sample_rate)`` across the
  period, sample_rate defaulting to 1 (``statsd.py:77-85``);
- every flushed measure is stamped with the flush time, not the packet
  arrival time (``statsd.py:64-85`` uses utcnow per packet; one
  timestamp per flush batch is the batch-engine equivalent).

``parse_packets`` + ``flush_aggregate`` form a micro-batch
pre-aggregation: in streaming, apply them per trigger via
``foreachBatch`` — the flush period becomes the trigger interval.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_packets(packets: DataFrame, packet_col: str = "packet") -> DataFrame:
    """Split datagrams into per-metric rows ``(metric_name, metric_type,
    value, sampling, seq)``.

    ``seq`` preserves arrival order inside a batch so last-write-wins is
    deterministic (the reference processes lines sequentially).
    Malformed lines (no ``name:value|type`` shape, unknown type, or a
    sample rate on a non-counter — both ValueErrors in the reference,
    ``statsd.py:64-90``) are dropped.
    """
    lines = packets.select(
        F.posexplode(F.split(F.col(packet_col), "\n")).alias("line_no", "line"),
        F.monotonically_increasing_id().alias("packet_seq"),
    ).where(F.col("line") != "")
    parsed = lines.select(
        F.regexp_extract("line", r"^([^:]+):", 1).alias("name"),
        F.regexp_extract("line", r"^[^:]+:([^|]+)\|", 1).alias("raw_value"),
        F.regexp_extract("line", r"\|(ms|g|c|s|h)(\||$)", 1).alias("metric_type"),
        F.regexp_extract("line", r"\|@([0-9.]+)$", 1).alias("raw_sampling"),
        (F.col("packet_seq") * 65536 + F.col("line_no")).alias("seq"),
    )
    parsed = parsed.where(
        (F.col("name") != "")
        & F.col("metric_type").isin("ms", "g", "c")
        & F.col("raw_value").rlike(r"^[+-]?\d+(\.\d+)?$")
        # sampling only valid for counters (statsd.py:64-76 raises)
        & ((F.col("raw_sampling") == "") | (F.col("metric_type") == "c"))
    )
    return parsed.select(
        F.concat("name", F.lit("|"), "metric_type").alias("metric_name"),
        "metric_type",
        F.col("raw_value").cast("double").alias("value"),
        F.when(F.col("raw_sampling") == "", F.lit(1.0))
        .otherwise(F.col("raw_sampling").cast("double"))
        .alias("sampling"),
        "seq",
    )


def flush_aggregate(
    parsed: DataFrame, flush_ts: datetime.datetime | None = None
) -> DataFrame:
    """Collapse a flush period to one measure per metric
    ``(metric_name, ts, value)`` under the reference's per-type rules.

    100 TB note: a single hash aggregation keyed by metric_name —
    map-side partial agg handles the fan-in; no window function, no
    second shuffle.
    """
    ts = F.lit(flush_ts) if flush_ts is not None else F.current_timestamp()
    agg = parsed.groupBy("metric_name", "metric_type").agg(
        F.sum(F.col("value") * (F.lit(1.0) / F.col("sampling"))).alias("counter_value"),
        F.max_by("value", "seq").alias("last_value"),
    )
    return agg.select(
        "metric_name",
        ts.alias("ts"),
        F.when(F.col("metric_type") == "c", F.col("counter_value"))
        .otherwise(F.col("last_value"))
        .alias("value"),
    )

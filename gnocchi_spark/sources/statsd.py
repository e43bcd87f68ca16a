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

    Line handling mirrors ``statsd.py:142-161`` exactly (r12, pinned by
    ``tests/test_fuzz_statsd.py``): split on ``|`` (2 or 3 segments,
    else drop), ``name:value`` must split on ``:`` into exactly two
    (else the reference's unpack raises), ``value`` parses with
    ``float()`` leniency (exponents, ``.5``, ``1.``, whitespace — a
    ``cast('double')``, which the old digits-only regex wrongly
    rejected), and a third segment's sampling strips its FIRST char
    blindly (the reference does ``sampling[1:]`` — ``|x0.5`` works like
    ``|@0.5``).  Drops reproduce every reference error path: unknown
    type, unparsable value/sampling, any third segment on ``ms``/``g``
    (sampling-must-be-none ValueError), and ``@0`` sampling on a
    counter (``1 / sampling`` ZeroDivisionError, statsd.py:77-85).
    """
    lines = packets.select(
        F.posexplode(F.split(F.col(packet_col), "\n")).alias("line_no", "line"),
        F.monotonically_increasing_id().alias("packet_seq"),
    ).where(F.col("line") != "")
    parts = F.split(F.col("line"), r"\|")
    nv = F.split(F.element_at(parts, 1), ":")
    parsed = lines.select(
        F.size(parts).alias("n_parts"),
        F.size(nv).alias("n_nv"),
        F.element_at(nv, 1).alias("name"),
        F.element_at(nv, 2).cast("double").alias("value"),
        F.element_at(parts, 2).alias("metric_type"),
        F.when(
            F.size(parts) == 3,
            F.substring(F.element_at(parts, 3), 2, 1 << 24).cast("double"),
        ).alias("sampling_raw"),
        (F.col("packet_seq") * 65536 + F.col("line_no")).alias("seq"),
    )
    parsed = parsed.where(
        (F.col("n_nv") == 2)
        & F.col("value").isNotNull()
        & (
            (F.col("metric_type").isin("ms", "g") & (F.col("n_parts") == 2))
            | (
                (F.col("metric_type") == "c")
                & (
                    (F.col("n_parts") == 2)
                    | (
                        (F.col("n_parts") == 3)
                        & F.col("sampling_raw").isNotNull()
                        & (F.col("sampling_raw") != 0.0)
                    )
                )
            )
        )
    )
    return parsed.select(
        F.concat("name", F.lit("|"), "metric_type").alias("metric_name"),
        "metric_type",
        "value",
        F.coalesce("sampling_raw", F.lit(1.0)).alias("sampling"),
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

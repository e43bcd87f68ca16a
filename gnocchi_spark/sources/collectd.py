"""collectd-over-AMQP1 ingest (reference ``gnocchi/amqp1d.py:100-233``).

Input: collectd's JSON write format — one object per value-list::

    {"host": ..., "plugin": ..., "plugin_instance": ...,
     "type": ..., "type_instance": ...,
     "dsnames": [...], "dstypes": [...], "values": [...],
     "time": <epoch seconds>, "interval": ...}

Reference semantics reproduced:

- metric name (``CollectdFormatHandler._serialize_identifier``,
  ``amqp1d.py:165-180``)::

      plugin[-plugin_instance]@type[-type_instance][-dsname]

  where the ``-dsname`` suffix only appears when the value-list has
  more than one datasource;
- the resource is the ``host``, transformed through ResourceUUID
  (``amqp1d.py:107-122``);
- measures are stamped with the ingest time, not collectd's ``time``
  field (``amqp1d.py:187``) — we default to ``time`` when present
  since a bulk engine has it, with ``use_ingest_time=True`` for strict
  reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

COLLECTD_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("plugin", T.StringType()),
            T.StructField("plugin_instance", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("type_instance", T.StringType()),
            T.StructField("dsnames", T.ArrayType(T.StringType())),
            T.StructField("dstypes", T.ArrayType(T.StringType())),
            T.StructField("values", T.ArrayType(T.DoubleType())),
            T.StructField("time", T.DoubleType()),
            T.StructField("interval", T.DoubleType()),
        ]
    )
)


def parse_json(messages: DataFrame, body_col: str = "body") -> DataFrame:
    """Explode collectd JSON message bodies (each an array of value
    lists) into one row per value list."""
    return messages.select(
        F.explode(F.from_json(F.col(body_col), COLLECTD_SCHEMA)).alias("m")
    ).select("m.*")


def _suffix() -> F.Column:
    # "-dsname" only when the value list is multi-datasource
    return F.when(
        F.size("dsnames") > 1,
        F.concat(F.lit("-"), F.element_at("dsnames", F.col("pos") + 1)),
    ).otherwise(F.lit(""))


def normalize(value_lists: DataFrame, use_ingest_time: bool = False) -> DataFrame:
    """Value lists -> measures ``(resource_id, metric_name, ts, value)``.

    One ``posexplode`` over ``values``; everything else is string
    concat inside codegen.  No shuffle.
    """
    df = value_lists.select(
        "host",
        "dsnames",
        "time",
        F.concat(
            F.col("plugin"),
            F.when(
                F.coalesce(F.col("plugin_instance"), F.lit("")) != "",
                F.concat(F.lit("-"), F.col("plugin_instance")),
            ).otherwise(F.lit("")),
            F.lit("@"),
            F.col("type"),
            F.when(
                F.coalesce(F.col("type_instance"), F.lit("")) != "",
                F.concat(F.lit("-"), F.col("type_instance")),
            ).otherwise(F.lit("")),
        ).alias("base_name"),
        F.posexplode("values").alias("pos", "value"),
    )
    ts = (
        F.current_timestamp()
        if use_ingest_time
        else F.timestamp_seconds(F.col("time"))
    )
    return df.select(
        F.col("host").alias("resource_id"),
        F.concat("base_name", _suffix()).alias("metric_name"),
        ts.alias("ts"),
        "value",
    )

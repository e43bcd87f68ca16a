"""Prometheus remote-write ingest (reference ``gnocchi/rest/api.py:2319-2371``).

The wire payload is snappy-compressed protobuf (``WriteRequest``).
Neither snappy nor the prometheus protos ship in this environment, so
the byte-level decode is gated behind an import-try; the normalization
— the actual engine work — operates on the decoded shape::

    timeseries: labels map<string,string>,
                samples array<struct<timestamp_ms: long, value: double>>

Reference semantics reproduced (``api.py:2337-2346``):

- metric name = ``labels['__name__']``;
- resource original id = ``<job>@<instance>`` with either label
  defaulting to ``"none"``;
- sample timestamps are epoch **milliseconds**;
- the resource id is uuid5-transformed (ResourceUUID, creator-scoped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnocchi_spark.functions.ids import resource_uuid


def decode_write_request(payload: bytes):
    """Decode a snappy+protobuf WriteRequest into [(labels, samples)].

    Stub: the decode libraries are not available in this container;
    the Spark-side plumbing consumes already-decoded rows.
    """
    try:
        import snappy  # noqa: F401
        from prometheus_pb2 import WriteRequest  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "snappy/protobuf decode unavailable; feed decoded "
            "(labels, samples) rows to normalize()"
        ) from exc
    raise NotImplementedError


def normalize(
    timeseries: DataFrame,
    labels_col: str = "labels",
    samples_col: str = "samples",
    creator: str | None = None,
) -> DataFrame:
    """Decoded timeseries -> measures
    ``(resource_id, original_resource_id, metric_name, ts, value)``.

    One ``explode`` per timeseries row; uuid5 is a per-row sha1 —
    map-only plan, no shuffle.
    """
    labels = F.col(labels_col)
    rid = F.concat_ws(
        "@",
        F.coalesce(F.element_at(labels, "job"), F.lit("none")),
        F.coalesce(F.element_at(labels, "instance"), F.lit("none")),
    )
    df = timeseries.select(
        rid.alias("original_resource_id"),
        F.element_at(labels, "__name__").alias("metric_name"),
        F.explode(samples_col).alias("s"),
    ).where(F.col("metric_name").isNotNull())
    return df.select(
        resource_uuid(F.col("original_resource_id"), creator).alias("resource_id"),
        "original_resource_id",
        "metric_name",
        F.timestamp_millis(F.col("s.timestamp_ms")).alias("ts"),
        F.col("s.value").alias("value"),
    )

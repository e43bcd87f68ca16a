"""Prometheus remote-write ingest (reference ``gnocchi/rest/api.py:2319-2371``).

The wire payload is snappy-compressed protobuf (``WriteRequest``),
decoded here with the pure-Python codecs in
:mod:`gnocchi_spark.sources.snappy_codec` and
:mod:`gnocchi_spark.sources.protowire` (reference decode:
``api.py:2334-2336`` ``snappy.uncompress`` + ``ParseFromString``).
Decoded shape::

    timeseries: labels map<string,string>,
                samples array<struct<timestamp_ms: long, value: double>>

Reference semantics reproduced (``api.py:2337-2346``):

- metric name = ``labels['__name__']``;
- resource original id = ``<job>@<instance>`` with either label
  defaulting to ``"none"``;
- sample timestamps are epoch **milliseconds**;
- the resource id is uuid5-transformed (ResourceUUID, creator-scoped).

Two decode paths: :func:`decode_write_request` for a single request
body (the REST-endpoint shape), and :func:`decode_write_requests` for
a DataFrame holding one payload per row — each executor decodes its
own batch of payloads via Arrow (``mapInPandas``), so a landing zone
of millions of scraped request bodies decodes fully in parallel with
no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gnocchi_spark.functions.ids import resource_uuid
from gnocchi_spark.sources import protowire, snappy_codec

#: Decoded shape shared by both decode paths and `normalize`.
TIMESERIES_SCHEMA = T.StructType(
    [
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "samples",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("timestamp_ms", T.LongType()),
                        T.StructField("value", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def decode_write_request(payload: bytes) -> list[tuple[dict, list]]:
    """Snappy+protobuf WriteRequest body -> [(labels, samples)].

    ``samples`` are ``(timestamp_ms, value)`` tuples.  Pure-Python
    decode — no native snappy/protobuf dependency.
    """
    return protowire.parse_write_request(snappy_codec.uncompress(payload))


def encode_write_request(timeseries: list[tuple[dict, list]]) -> bytes:
    """Inverse of :func:`decode_write_request` (fixtures / tests)."""
    return snappy_codec.compress(protowire.encode_write_request(timeseries))


def decode_write_requests(
    payloads: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """DataFrame of raw request bodies -> decoded timeseries rows.

    One input row per remote-write POST body (``binary``); output is
    one row per TimeSeries message in :data:`TIMESERIES_SCHEMA`, ready
    for :func:`normalize`.  Decode runs where the payload partition
    lives — Arrow-batched, no shuffle, no driver round-trip.
    """
    import pandas as pd

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            labels_out, samples_out = [], []
            for payload in pdf[payload_col]:
                for labels, samples in decode_write_request(bytes(payload)):
                    labels_out.append(labels)
                    samples_out.append(
                        [
                            {"timestamp_ms": ts_ms, "value": value}
                            for ts_ms, value in samples
                        ]
                    )
            yield pd.DataFrame({"labels": labels_out, "samples": samples_out})

    return payloads.select(payload_col).mapInPandas(decode, TIMESERIES_SCHEMA)


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

"""Batch measures POST with auto-create (reference
``gnocchi/rest/api.py:1726-1849,2247-2316``): payloads address metrics
by (resource id, metric name); unknown resources and metrics are
created on the fly, the metric's archive policy resolved from the
policy rules.

Spark shape: the dimension upsert is an anti-join + union executed per
micro-batch (``foreachBatch`` in streaming, a plain call in batch);
the measure stream is keyed by the deterministic metric id so facts
can append before/while the dim row lands — no coordination, no
locks, exactly the property the reference needs retries and
``get_or_create_resource_and_metrics`` for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnocchi_spark.functions.ids import resource_uuid, uuid5
from gnocchi_spark.policy import ArchivePolicyRule, assign_policy

# metric ids are name-based uuid5 within the resource's uuid — a
# deterministic id lets ingest key facts without reading the dim
# (the reference uses random uuid4 + an indexer round-trip,
# rest/api.py:2287-2304; determinism is the Spark-native improvement)
METRIC_ID_NAMESPACE_HEX = "6ba7b8119dad11d180b400c04fd430c8"  # uuid5 URL ns


def normalize_payload(
    payload: DataFrame,
    creator: str | None = None,
    resource_col: str = "original_resource_id",
    name_col: str = "metric_name",
) -> DataFrame:
    """Add deterministic ids: resource_id (ResourceUUID) and metric_id
    (uuid5 of resource_id + '/' + metric name)."""
    rid = resource_uuid(F.col(resource_col), creator)
    mid = uuid5(
        METRIC_ID_NAMESPACE_HEX, F.concat(rid, F.lit("/"), F.col(name_col))
    )
    return payload.withColumn("resource_id", rid).withColumn("metric_id", mid)


def upsert_metrics(
    normalized: DataFrame,
    metrics_dim: DataFrame,
    rules: list[ArchivePolicyRule],
    creator: str | None = None,
) -> DataFrame:
    """Return the metrics dimension with missing metrics appended.

    New metrics get their archive policy from the first matching rule
    (NULL policy = the reference's NoArchivePolicyRuleMatch -> such
    rows are rejected, mirroring the 400).  The candidate set is the
    *batch's* distinct metrics — tiny next to the fact volume — so the
    anti-join broadcasts.
    """
    candidates = (
        normalized.select(
            "metric_id",
            "resource_id",
            F.col("metric_name").alias("name"),
        )
        .distinct()
        .withColumn("archive_policy_name", assign_policy(F.col("name"), rules))
        .withColumn("status", F.lit("active"))
        .withColumn("creator", F.lit(creator))
    )
    candidates = candidates.where(F.col("archive_policy_name").isNotNull())
    new = candidates.join(
        metrics_dim.select("metric_id"), "metric_id", "left_anti"
    )
    return metrics_dim.unionByName(new, allowMissingColumns=True)


def measures_from_payload(normalized: DataFrame) -> DataFrame:
    """The fact rows: (metric_id, ts, value)."""
    return normalized.select("metric_id", "ts", "value")


# --- REST batch-measures JSON wire format --------------------------------
#
# The reference's POST /v1/batch/metrics/measures body
# (gnocchi/rest/api.py:2247-2316) is a JSON object mapping metric id ->
# list of {"timestamp": iso8601, "value": number}.  The engine-side
# decode is a map-only from_json + two explodes — no Python, no UDF;
# one payload document can carry any number of metrics and points.

#: spark schema of one decoded payload document
BATCH_JSON_SCHEMA = "map<string, array<struct<timestamp: string, value: double>>>"


def measures_json_payloads(
    measures: DataFrame,
    metric_col: str = "metric_id",
    ts_col: str = "ts",
    value_col: str = "value",
    batch_granularity: float = 86400.0,
) -> DataFrame:
    """Serialize a measures frame into REST batch-POST JSON documents,
    one per (metric, batch window) — the synthesis half used by tests
    and the round-trip query (the decode half is the product path).
    Microsecond ISO timestamps so the round trip is lossless."""
    from gnocchi_spark.functions.timeutil import truncate_to_bucket

    b = truncate_to_bucket(F.col(ts_col), batch_granularity)
    points = measures.groupBy(
        F.col(metric_col).alias("__m"), b.alias("__b")
    ).agg(
        F.collect_list(
            F.struct(
                F.date_format(ts_col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
                    "timestamp"
                ),
                F.col(value_col).alias("value"),
            )
        ).alias("__pts")
    )
    return points.select(
        F.to_json(F.create_map(F.col("__m"), F.col("__pts"))).alias("body")
    )


def parse_batch_measures_json(
    payloads: DataFrame, body_col: str = "body"
) -> DataFrame:
    """Decode REST batch-POST JSON documents into the measures schema
    (metric_id, ts, value).  Pure Column pipeline: from_json with an
    explicit schema, explode the metric map, explode the point list,
    ISO-8601 parse — every step JVM-side and parallel over payload
    rows, which is what lets a 1000-executor ingest tier decode wire
    batches at scan speed."""
    parsed = payloads.select(
        F.explode(F.from_json(F.col(body_col), BATCH_JSON_SCHEMA)).alias(
            "metric_id", "points"
        )
    )
    return parsed.select(
        "metric_id", F.explode("points").alias("p")
    ).select(
        "metric_id",
        F.to_timestamp(
            F.col("p.timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        ).alias("ts"),
        F.col("p.value").alias("value"),
    )

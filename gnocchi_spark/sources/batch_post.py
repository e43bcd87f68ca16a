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

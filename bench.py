"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query executes fully (noop sink — no driver collect overhead, no
result materialization skew).  A warm-up pass runs first so JIT/codegen
compilation is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from gnocchi_spark import tables  # noqa: E402
from gnocchi_spark.queries import QUERIES, ensure_session_conf  # noqa: E402
from gnocchi_spark.session import get_spark  # noqa: E402

# Headline set: the core ingest materialization, representative query
# operators from every family, and the scale-path LLM ops.
HEADLINE = [
    "tsdb_rollup_multi_1h",
    "tsdb_rollup_mean_5m",
    "tsdb_rate_mean_1h",
    "tsdb_rollup_pct_1d",
    "tsdb_ops_arith_fill0",
    "tsdb_ops_aggregate_mean",
    "history_grouped_usage",
    "tpch_q1_pricing_summary",
    "resource_metric_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "ann_cosine_topk",
    "ingest_influxdb_lines",
    "ingest_collectd",
    "tsdb_refresh_on_read",
    "maintenance_retention",
]


def rollup_policy_bench(spark, sf_dir):
    """End-to-end archive-policy materialization (the ingest hot path):
    all default methods at 5 min + 1 h granularities, cascaded."""
    from gnocchi_spark.operators.rollup import rollup_policy
    from gnocchi_spark.policy import ArchivePolicy, ArchivePolicyItem

    measures = tables.events_as_measures(spark, sf_dir)
    policy = ArchivePolicy(
        "bench",
        0,
        (ArchivePolicyItem(300.0, points=100000), ArchivePolicyItem(3600.0, points=100000)),
        frozenset(["mean", "sum", "min", "max", "count", "std", "first", "last"]),
    )
    return rollup_policy(measures, policy, seq_col="seq")


def run_query(spark, make_df) -> float:
    # time construction AND execution: operators with eager cache
    # builds (dedup) do real work at plan-construction time
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # queries are independent: drop persisted intermediates (e.g. the
    # dedup shingle cache) so one query's cache never skews the next
    spark.catalog.clearCache()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("gnocchi-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_conf(spark)

    # warm-up: JVM/codegen/parquet-footer caches
    tables.load(spark, sf_dir, "events").agg(F.count("*")).collect()

    timings: dict[str, float] = {}
    timings["rollup_policy_cascade"] = round(run_query(spark, lambda: rollup_policy_bench(spark, sf_dir)), 3)
    for name in HEADLINE:
        timings[name] = round(run_query(spark, lambda n=name: QUERIES[n](spark, sf_dir)), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

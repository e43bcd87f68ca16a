"""Build the tiny committed fixtures plan-only mode reads from.

Run once (and re-run whenever the SnapshotStore / IvfIndex on-disk
layout changes)::

    python tools/make_plan_fixtures.py

Outputs ``tools/fixtures/store_stub`` and ``tools/fixtures/ivf_stub``
— a few KB of parquet + manifest each, enough for
``tools/plan_report.py`` to audit the real manifest-pinned read plans
of the two round-trip queries without executing builds (see
gnocchi_spark/planmode.py).
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from gnocchi_spark import tables
    from gnocchi_spark.functions.timeutil import truncate_to_bucket
    from gnocchi_spark.operators.ann_index import IvfIndex
    from gnocchi_spark.operators.store import SnapshotStore
    from gnocchi_spark.planmode import FIXTURES
    from gnocchi_spark.queries import ensure_session_conf
    from gnocchi_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.001"
    spark = ensure_session_conf(get_spark("make-plan-fixtures"))
    spark.sparkContext.setLogLevel("ERROR")

    store_root = os.path.join(FIXTURES, "store_stub")
    shutil.rmtree(store_root, ignore_errors=True)
    hourly = (
        tables.load(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("metric_id"),
            truncate_to_bucket(F.col("ts"), 3600.0).alias("bucket_ts"),
        )
        .agg(F.avg("value").alias("mean"), F.count("*").cast("long").alias("cnt"))
        .limit(40)
    )
    store = SnapshotStore(store_root, num_sacks=2)
    store.append(hourly)
    store.merge(
        hourly.limit(4).withColumn("mean", F.col("mean") * 2.0),
        key_cols=("metric_id", "bucket_ts"),
    )

    ivf_root = os.path.join(FIXTURES, "ivf_stub")
    shutil.rmtree(ivf_root, ignore_errors=True)
    emb = tables.load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 60)
    centroids = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    index = IvfIndex(ivf_root, num_sacks=2)
    index.build(emb.where(F.col("vec_id") >= 30), centroids)
    index.add(emb.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 30)))

    print(f"wrote {store_root} and {ivf_root}")


if __name__ == "__main__":
    main()

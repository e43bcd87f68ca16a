"""Per-JOB attribution profiler for the optimization rounds.

Like tools/profile_queries.py, but runs with the Spark UI enabled and,
after each query, pulls ``/api/v1/applications/<id>/jobs`` to attribute
the query's wall to its individual Spark jobs: per-job duration, task
count, and the job-group/description tag.  This answers "is the time in
one big compute job, in N tiny AQE stage jobs, or nowhere (driver-side
plan/codegen time)" — the gap between the summed job wall and the
measured wall IS the driver-side (analysis + codegen + py4j) cost.

Usage::

    python tools/job_profile.py [query ...] [--passes N] [--sf DIR]

Prints one JSON line per (query, pass) with the job table, then a
summary sorted by median total wall.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gnocchi_spark import tables  # noqa: E402
from gnocchi_spark.queries import QUERIES, ensure_session_conf  # noqa: E402
from gnocchi_spark.session import _default_driver_mem  # noqa: E402


def get_spark_ui(app_name: str = "gnocchi-spark-jobprofile") -> SparkSession:
    """session.get_spark mirror with the UI ON (REST attribution)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", _default_driver_mem())
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    names = args.queries
    if not names:
        import bench

        names = list(bench.HEADLINE)

    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_conf(spark)
    sc = spark.sparkContext
    base = sc.uiWebUrl + "/api/v1"
    app_id = sc.applicationId

    # warm-up identical to bench.py
    tables.load(spark, args.sf, "events").agg(F.count("*")).collect()
    from gnocchi_spark.sources import influxdb

    warm_lines = spark.range(1000).select(
        F.format_string("m,host=h%d,dc=east value=%d 1000000", "id", "id").alias(
            "line"
        )
    )
    influxdb.parse_lines(warm_lines).agg(F.count("*")).collect()

    summary: dict[str, list] = {}
    for p in range(args.passes):
        if p:
            from gnocchi_spark.operators.dedup import clear_assignment_cache

            clear_assignment_cache()
        for name in names:
            sc.setJobDescription(f"q:{name}")
            known = {j["jobId"] for j in _api(base, f"/applications/{app_id}/jobs")}
            t0 = time.time()
            df = QUERIES[name](spark, args.sf)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            sc.setJobDescription(None)
            spark.catalog.clearCache()
            jobs = [
                j
                for j in _api(base, f"/applications/{app_id}/jobs")
                if j["jobId"] not in known
            ]
            rows = []
            job_wall = 0.0
            for j in sorted(jobs, key=lambda j: j["jobId"]):
                try:
                    sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                    com = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                    frac = float(j["completionTime"][19:23] or 0) - float(
                        j["submissionTime"][19:23] or 0
                    )
                    dur = time.mktime(com) - time.mktime(sub) + frac
                except Exception:
                    dur = -1.0
                job_wall += max(dur, 0.0)
                rows.append(
                    {
                        "job": j["jobId"],
                        "dur": round(dur, 3),
                        "tasks": j.get("numTasks"),
                        "stages": len(j.get("stageIds", [])),
                        "name": (j.get("name") or "")[:60],
                    }
                )
            rec = {
                "q": name,
                "pass": p,
                "construct": round(t1 - t0, 3),
                "execute": round(t2 - t1, 3),
                "total": round(t2 - t0, 3),
                "n_jobs": len(rows),
                "job_wall_sum": round(job_wall, 3),
                "driver_gap": round((t2 - t0) - job_wall, 3),
                "jobs": rows,
            }
            print(json.dumps(rec), flush=True)
            summary.setdefault(name, []).append(rec)

    print("\n=== summary (last pass) ===", file=sys.stderr)
    for name, recs in sorted(
        summary.items(), key=lambda kv: -kv[1][-1]["total"]
    ):
        r = recs[-1]
        print(
            f"{r['total']:7.3f}s  c={r['construct']:6.3f} x={r['execute']:6.3f} "
            f"jobs={r['n_jobs']:3d} jobwall={r['job_wall_sum']:7.3f} "
            f"gap={r['driver_gap']:6.3f}  {name}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()

"""Per-query profiling harness for the optimization rounds.

For each named query (default: the bench HEADLINE set), measures in one
session, bench-identically (noop sink, clearCache between queries):

- ``t_construct``: wall of ``QUERIES[name](spark, sf_dir)`` — includes
  any eager builds (persist+count, localCheckpoint, Lloyd rounds);
- ``t_execute``: wall of the noop write of the returned frame;
- ``jobs_construct``: Spark jobs run during construction (statusTracker
  delta) — the driver-coordination cost the plan audit tabulates;
- optionally dumps ``.explain("formatted")`` to ``plans/<tag>/<q>_<suffix>.txt``.

Usage::

    python tools/profile_queries.py [query ...] [--passes N]
        [--plans-dir plans/r12 --plans-suffix before] [--sf DIR]

Prints one JSON line per query and a sorted summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gnocchi_spark import tables  # noqa: E402
from gnocchi_spark.queries import QUERIES, ensure_session_conf  # noqa: E402
from gnocchi_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="before")
    args = ap.parse_args()

    names = args.queries
    if not names:
        import bench

        names = list(bench.HEADLINE)

    spark = get_spark("gnocchi-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_conf(spark)
    sc = spark.sparkContext

    # warm-up identical to bench.py
    tables.load(spark, args.sf, "events").agg(F.count("*")).collect()
    from gnocchi_spark.sources import influxdb

    warm_lines = spark.range(1000).select(
        F.format_string("m,host=h%d,dc=east value=%d 1000000", "id", "id").alias("line")
    )
    influxdb.parse_lines(warm_lines).agg(F.count("*")).collect()

    if args.plans_dir:
        os.makedirs(os.path.join(REPO, args.plans_dir), exist_ok=True)

    results = {}
    for p in range(args.passes):
        if p:
            from gnocchi_spark.operators.dedup import clear_assignment_cache

            clear_assignment_cache()
        for name in names:
            sc.setJobDescription(f"profile:{name}")
            jobs0 = len(sc.statusTracker().getJobIdsForGroup(None))
            t0 = time.time()
            df = QUERIES[name](spark, args.sf)
            t1 = time.time()
            jobs1 = len(sc.statusTracker().getJobIdsForGroup(None))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            jobs2 = len(sc.statusTracker().getJobIdsForGroup(None))
            if args.plans_dir and p == 0:
                path = os.path.join(
                    REPO, args.plans_dir, f"{name}_{args.plans_suffix}.txt"
                )
                with open(path, "w") as fh:
                    jvm = df.sparkSession._jvm
                    fh.write(
                        jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                            df._jdf.queryExecution(), "formatted"
                        )
                    )
            spark.catalog.clearCache()
            sc.setJobDescription(None)
            r = results.setdefault(
                name,
                {"t_construct": [], "t_execute": [], "jobs_construct": jobs1 - jobs0,
                 "jobs_execute": jobs2 - jobs1},
            )
            r["t_construct"].append(round(t1 - t0, 3))
            r["t_execute"].append(round(t2 - t1, 3))

    def med(v):
        s = sorted(v)
        n = len(s)
        return s[n // 2] if n % 2 else round((s[n // 2 - 1] + s[n // 2]) / 2, 3)

    summary = []
    for name, r in results.items():
        tc, te = med(r["t_construct"]), med(r["t_execute"])
        summary.append(
            {
                "query": name,
                "t_total": round(tc + te, 3),
                "t_construct": tc,
                "t_execute": te,
                "jobs_construct": r["jobs_construct"],
                "jobs_execute": r["jobs_execute"],
                "construct_all": r["t_construct"],
                "execute_all": r["t_execute"],
            }
        )
    summary.sort(key=lambda x: -x["t_total"])
    for row in summary:
        print(json.dumps(row))
    total = round(sum(x["t_total"] for x in summary), 3)
    print(json.dumps({"total": total, "n": len(summary)}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale stress for the history-aware time-weighted grouper (r12).

The grouper changed this round (the reference's
create_history_period_filter is now applied before ranking is_first —
operators/grouper.py, found by tests/test_fuzz_grouper.py), so its
scale story needs a fresh artifact: the operator's core is a
revisions x buckets interval join (rest/aggregates/api.py:262-493
semantics) whose width grows with resources x revisions x buckets.

Protocol mirrors tools/ops_stress.py (SPANS_STRESS lineage):

- **Axes**: resource cardinality x time-axis tiling.  Each user
  becomes CARD replica resources (signup values perturbed per replica
  so the hi/lo tier revision chains differ), and the time axis is
  tiled LEN times end-to-end — more revisions per chain AND more
  buckets per revision.  Deep = CARD (6) x LEN (5) = 30x the 1x
  events volume; the mid point (6x) shows a two-decade trend.
- **Input shape**: replicated purchase measures and signup events are
  eager-checkpointed OUTSIDE the timed region (the store serves
  per-metric splits; revision history comes from the indexer).  The
  TIMED region is the full registry-query composition downstream:
  hourly mean rollup -> revision chain (lead window) -> period filter
  -> interval join -> usage_coefficient weighting -> group-by, then
  one all-columns-consuming action (sum of hash over tier, bucket_ts,
  value — Catalyst cannot prune the weighted aggregate away).
- **Walls**: median of 3 interleaved 1x / 6x / 30x rounds.

Writes GROUPER_STRESS_r{N}.json at the repo root (round from
$SPARK_GRAFT_ROUND, default 12).  vs_linear = t_deep / t1 / factor;
< 1.0 means sub-linear wall growth at that depth.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gnocchi_spark import tables  # noqa: E402
from gnocchi_spark.operators.grouper import history_grouped_aggregate  # noqa: E402
from gnocchi_spark.operators.rollup import rollup  # noqa: E402
from gnocchi_spark.session import get_spark  # noqa: E402

GRAN = 3600.0


def _replicated(spark, sf_dir, card: int, length: int):
    """(purchases, signups, start, stop) at card x length replication,
    both frames eager-checkpointed.  Tiling shifts ts by whole spans so
    each replica-user's revision chain keeps growing along the axis."""
    ev = tables.load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "signup")
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span_us = (
        (int(hi.timestamp()) - int(lo.timestamp())) // 3600 + 1
    ) * 3600 * 1_000_000

    rep = ev.select(
        F.explode(F.sequence(F.lit(0), F.lit(card - 1))).alias("__r"),
        "user_id",
        "event_id",
        "event_type",
        "ts",
        "value",
    ).select(
        F.explode(F.sequence(F.lit(0), F.lit(length - 1))).alias("__j"),
        "__r",
        "user_id",
        "event_id",
        "event_type",
        F.col("ts"),
        "value",
    ).select(
        F.concat(F.col("user_id").cast("string"), F.lit("_r"), F.col("__r")).alias(
            "resource_id"
        ),
        F.col("event_id"),
        F.col("event_type"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts")) + F.col("__j") * F.lit(span_us)
        ).alias("ts"),
        # perturb so replica tier chains flip at different revisions
        (F.col("value") + F.col("__r") * F.lit(7.5) + F.col("__j") * F.lit(2.5)).alias(
            "value"
        ),
    )
    purchases = (
        rep.where(F.col("event_type") == "purchase")
        .select("resource_id", "ts", "value")
        .localCheckpoint(eager=True)
    )
    signups = (
        rep.where(F.col("event_type") == "signup")
        .select("resource_id", "event_id", "ts", "value")
        .localCheckpoint(eager=True)
    )
    # window bounds cover the middle of the tiled span so the r12
    # period pre-filter actually drops leading/trailing revisions
    start = F.timestamp_micros(
        F.lit(int(lo.timestamp()) * 1_000_000 + span_us // 10)
    )
    stop = F.timestamp_micros(
        F.lit(int(lo.timestamp()) * 1_000_000 + span_us * length - span_us // 10)
    )
    b = purchases.sparkSession.range(1).select(start.alias("a"), stop.alias("b")).collect()[0]
    return purchases, signups, str(b.a), str(b.b)


def _grouper_wall(purchases, signups, start: str, stop: str) -> float:
    t0 = time.time()
    bucketed = rollup(
        purchases, ["mean"], GRAN, metric_col="resource_id", exact=True
    ).select(F.col("metric_id").alias("resource_id"), "bucket_ts", "value")
    w = Window.partitionBy("resource_id").orderBy("ts", "event_id")
    revisions = signups.select(
        "resource_id",
        F.col("ts").alias("revision_start"),
        F.lead("ts").over(w).alias("revision_end"),
        F.when(F.col("value") >= 100, F.lit("hi")).otherwise("lo").alias("tier"),
    )
    out = history_grouped_aggregate(
        bucketed, revisions, ["tier"], GRAN, start=start, stop=stop
    )
    out.agg(F.sum(F.hash("tier", "bucket_ts", "value"))).collect()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    card = int(os.environ.get("GROUPER_STRESS_CARD", "6"))
    length = int(os.environ.get("GROUPER_STRESS_LEN", "5"))
    spark = get_spark("gnocchi-spark-grouper-stress")
    spark.sparkContext.setLogLevel("ERROR")

    shapes = {
        "1x": _replicated(spark, sf_dir, 1, 1),
        f"{card}x": _replicated(spark, sf_dir, card, 1),
        f"{card * length}x": _replicated(spark, sf_dir, card, length),
    }
    factors = {"1x": 1, f"{card}x": card, f"{card * length}x": card * length}

    walls: dict[str, list[float]] = {k: [] for k in shapes}
    for _ in range(3):  # interleaved so load transients hit all shapes
        for k, args in shapes.items():
            walls[k].append(_grouper_wall(*args))
    med = {k: sorted(v)[1] for k, v in walls.items()}

    rec: dict = {"t1": round(med["1x"], 2), "t1_runs": [round(w, 2) for w in walls["1x"]]}
    for k in shapes:
        if k == "1x":
            continue
        rec[f"t_{k}"] = round(med[k], 2)
        rec[f"runs_{k}"] = [round(w, 2) for w in walls[k]]
        rec[f"vs_linear_{k}"] = round(med[k] / med["1x"] / factors[k], 2)

    out = {
        "sf_dir": sf_dir,
        "card": card,
        "len": length,
        "factor": card * length,
        "history_grouped_usage": rec,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"GROUPER_STRESS_r{os.environ.get('SPARK_GRAFT_ROUND', '12')}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

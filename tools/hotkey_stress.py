"""Hot-key stress for the two shuffles that matter most at 100 TB
(r08, VERDICT r07 next #8): the rollup group-by and the
connected-components iteration.

One synthetic run with a single metric / hub node carrying 50% of all
traffic, wall-clocked against a uniform run of the SAME volume.  The
claim under test: neither path degenerates on skew —

- the rollup group-by is skew-immune BY CONSTRUCTION: partial
  (map-side) aggregation reduces every task's contribution to one row
  per (metric, bucket) before the exchange, so the reduce side of the
  hot key receives ~n_tasks rows, not 50% of the corpus;
- the CC loop's per-round aggregates get the same partial-agg
  protection, and its joins carry at most one row per node on the
  aggregate side; AQE skew-join splitting covers the residual
  (enabled session-wide, session.py).

Writes HOTKEY_r8.json; SCALE.md cites the ratios (done-criterion:
hot/uniform wall < ~2x).

Usage::

    python tools/hotkey_stress.py [n_rows] [n_edges]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def synth_measures(spark, n_rows: int, hot_share: float | None):
    """n_rows measures over 1000 metrics and a 24 h span.  With
    ``hot_share`` set, that fraction of rows lands on metric 'hot'
    (same time span — the worst case: the hot metric concentrates
    within every bucket instead of spreading across extra ones)."""
    base = spark.range(n_rows)
    uniform_metric = F.concat(
        F.lit("m_"), F.pmod(F.xxhash64("id", F.lit(1)), 1000).cast("string")
    )
    if hot_share is None:
        metric = uniform_metric
    else:
        metric = F.when(
            F.pmod(F.xxhash64("id", F.lit(2)), 100)
            < int(hot_share * 100),
            F.lit("hot"),
        ).otherwise(uniform_metric)
    ts = F.timestamp_micros(
        F.unix_micros(F.to_timestamp(F.lit("2026-01-01 00:00:00")))
        + F.pmod(F.xxhash64("id", F.lit(3)), 86_400) * 1_000_000
    )
    return base.select(
        metric.alias("metric_id"),
        ts.alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(4)), 1000) / 10.0).alias("value"),
        F.col("id").alias("seq"),
    )


def synth_edges(spark, n_edges: int, hot_share: float | None):
    """n_edges near-dup pairs.  Uniform: disjoint 5-chains (u -> u+1
    within groups of 6) — many small components.  Hot: ``hot_share`` of
    all edges attach to hub node 0 (one giant star component), the
    giant-duplicate-cluster shape."""
    base = spark.range(n_edges)
    chain_a = (F.col("id") + F.floor(F.col("id") / 5)).cast("long")
    uniform = base.select(
        chain_a.alias("doc_a"), (chain_a + 1).alias("doc_b")
    )
    if hot_share is None:
        return uniform
    hot = F.pmod(F.xxhash64("id", F.lit(7)), 100) < int(hot_share * 100)
    return base.select(
        F.when(hot, F.lit(0)).otherwise(chain_a).cast("long").alias("doc_a"),
        F.when(
            hot, F.col("id") + 1_000_000_000
        ).otherwise(chain_a + 1).cast("long").alias("doc_b"),
    )


def _wall_rollup(spark, df):
    from gnocchi_spark.operators.rollup import rollup

    df = df.localCheckpoint(eager=True)  # exclude synthesis from the wall
    t0 = time.time()
    rollup(df, ["mean", "std", "count"], 300.0).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.time() - t0, 2)


def _wall_cc(spark, edges):
    from gnocchi_spark.operators.dedup import connected_components

    edges = edges.localCheckpoint(eager=True)
    t0 = time.time()
    n = connected_components(edges).count()
    return round(time.time() - t0, 2), n


def main():
    from gnocchi_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark("hotkey-stress")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"n_rows": n_rows, "n_edges": n_edges, "hot_share": 0.5}

    # warm-up: JIT + codegen caches so the first measured run is not
    # paying one-time costs
    _wall_rollup(spark, synth_measures(spark, n_rows // 10, None))

    w_uni = _wall_rollup(spark, synth_measures(spark, n_rows, None))
    w_hot = _wall_rollup(spark, synth_measures(spark, n_rows, 0.5))
    out["rollup"] = {
        "uniform_wall_s": w_uni,
        "hot_wall_s": w_hot,
        "ratio": round(w_hot / w_uni, 2),
    }
    print("rollup:", out["rollup"], file=sys.stderr)

    # warm up the CC loop's operators too, so one-time JIT/codegen
    # cost is not billed to whichever variant runs first (r08 review)
    _wall_cc(spark, synth_edges(spark, n_edges // 10, None))

    t_uni, n_uni = _wall_cc(spark, synth_edges(spark, n_edges, None))
    t_hot, n_hot = _wall_cc(spark, synth_edges(spark, n_edges, 0.5))
    out["connected_components"] = {
        "uniform_wall_s": t_uni,
        "hot_wall_s": t_hot,
        "ratio": round(t_hot / t_uni, 2),
        "nodes_uniform": n_uni,
        "nodes_hot": n_hot,
    }
    print("cc:", out["connected_components"], file=sys.stderr)

    path = os.path.join(REPO, "HOTKEY_r8.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(path)


if __name__ == "__main__":
    main()

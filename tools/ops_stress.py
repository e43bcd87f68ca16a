"""Scale stress for the ops-DSL / alignment / fill family (r11).

r10 VERDICT perf watch item: the multi-granularity ops-DSL/fill plans
carry the widest exchange counts in the tree (tsdb_ops_rolling_mean4
17 exchanges, tsdb_fill_ffill 11) and were the one family with no
deep-stress artifact.  This reproduces the spans_stress protocol for
the three named queries' operator compositions:

- **Axes**: metric cardinality x series length.  Deep = CARD (6) x
  LEN (5) = 30x the 1x measures volume: each of the two base event
  types becomes CARD replica metrics (values perturbed per replica so
  series are not degenerate copies), and the time axis is tiled LEN
  times end-to-end (union axis 5x longer).  A mid point (CARD x 1 =
  6x) is also measured so the artifact shows a two-decade trend.
- **Input shape**: each series' branch reads its own pre-split,
  eager-checkpointed per-metric frame — the production read path
  (per-metric sack splits are partition-pruned, so k series never
  rescan the whole table k times).  The TIMED region is the full
  query composition downstream of the split read: per-series mean
  rollup -> align_series pivot -> ops evaluation -> one
  all-columns-consuming action (sum of hash over every value column,
  so Catalyst cannot prune the computed series away under count()).
- **Walls**: median of 3 interleaved 1x / deep runs (a load transient
  hits both sides), same as SPANS_STRESS.

Writes OPS_STRESS_r{N}.json at the repo root (round from
$SPARK_GRAFT_ROUND, default 11).  vs_linear = t_deep / t1 / factor;
< 1.0 means sub-linear wall growth at that depth.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gnocchi_spark import tables  # noqa: E402
from gnocchi_spark.operators.align import align_series  # noqa: E402
from gnocchi_spark.operators.rollup import rollup  # noqa: E402
from gnocchi_spark.plans.operations import (  # noqa: E402
    SeriesFrame,
    evaluate,
    evaluate_to_long,
)
from gnocchi_spark.session import get_spark  # noqa: E402

BASE_TYPES = ("click", "view")
GRAN = 3600.0


def _split_measures(spark, sf_dir, card: int, length: int) -> dict:
    """Per-metric measure frames at card x length replication, each
    eager-checkpointed (the stress reads them as a store would serve
    per-metric splits).  Returns {metric_label: DataFrame(ts, value)}."""
    m = tables.events_as_measures(spark, sf_dir).where(
        F.col("metric_id").isin(*BASE_TYPES)
    )
    lo, hi = m.agg(F.min("ts"), F.max("ts")).collect()[0]
    span_us = (
        (int(hi.timestamp()) - int(lo.timestamp())) // 3600 + 1
    ) * 3600 * 1_000_000
    out = {}
    for t in BASE_TYPES:
        base = m.where(F.col("metric_id") == t).select("ts", "value")
        for r in range(card):
            rep = base.select(
                F.explode(F.sequence(F.lit(0), F.lit(length - 1))).alias("__j"),
                "ts",
                "value",
            ).select(
                F.timestamp_micros(
                    F.unix_micros(F.col("ts")) + F.col("__j") * F.lit(span_us)
                ).alias("ts"),
                (
                    F.col("value") + F.lit(r * 0.25) + F.col("__j") * F.lit(0.125)
                ).alias("value"),
            )
            out[f"{t}_r{r}"] = rep.withColumn(
                "metric_id", F.lit(f"{t}_r{r}")
            ).localCheckpoint(eager=True)
    return out


def _series_dict(splits: dict) -> dict:
    return {
        f"{mid}/mean": rollup(df, ["mean"], GRAN, exact=True).select(
            F.col("bucket_ts").alias("ts"), "value"
        )
        for mid, df in splits.items()
    }


def _consume_wide(df, cols) -> None:
    # hash every series column so column pruning cannot skip the work
    df.agg(F.sum(F.hash(*[F.col(c) for c in cols]))).collect()


def _op_rolling(splits: dict) -> None:
    series = _series_dict(splits)
    labels = list(series)
    wide = align_series(series, fill="null")
    frame = SeriesFrame(df=wide, cols=labels)
    out = evaluate(
        ["rolling", "mean", 4, ["metric", *[[lbl] for lbl in labels]]], frame
    )
    _consume_wide(out.df, out.cols)


def _op_ffill(splits: dict) -> None:
    series = _series_dict(splits)
    wide = align_series(series, fill="ffill")
    _consume_wide(wide, list(series))


def _op_aggregate_rate(splits: dict) -> None:
    series = _series_dict(splits)
    labels = list(series)
    wide = align_series(series, fill="null")
    frame = SeriesFrame(df=wide, cols=labels)
    out = evaluate_to_long(
        ["aggregate", "rate:sum", ["metric", *[[lbl] for lbl in labels]]],
        frame,
        GRAN,
    )
    out.agg(F.sum("value")).collect()


OPS = {
    "tsdb_ops_rolling_mean4": _op_rolling,
    "tsdb_fill_ffill": _op_ffill,
    "tsdb_ops_aggregate_rate": _op_aggregate_rate,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    card = int(os.environ.get("OPS_STRESS_CARD", "6"))
    length = int(os.environ.get("OPS_STRESS_LEN", "5"))
    spark = get_spark("gnocchi-spark-ops-stress")
    spark.sparkContext.setLogLevel("ERROR")

    shapes = {
        "1x": _split_measures(spark, sf_dir, 1, 1),
        f"{card}x": _split_measures(spark, sf_dir, card, 1),
        f"{card * length}x": _split_measures(spark, sf_dir, card, length),
    }
    factors = {"1x": 1, f"{card}x": card, f"{card * length}x": card * length}

    out = {
        "sf_dir": sf_dir,
        "card": card,
        "len": length,
        "factor": card * length,
        "ops": {},
    }
    for name, op in OPS.items():
        walls: dict[str, list[float]] = {k: [] for k in shapes}
        for _ in range(3):  # interleaved so transients hit all shapes
            for k, splits in shapes.items():
                t0 = time.time()
                op(splits)
                walls[k].append(time.time() - t0)
        med = {k: sorted(v)[1] for k, v in walls.items()}
        rec = {"t1": round(med["1x"], 2)}
        for k in shapes:
            if k == "1x":
                continue
            rec[f"t_{k}"] = round(med[k], 2)
            rec[f"runs_{k}"] = [round(w, 2) for w in walls[k]]
            rec[f"vs_linear_{k}"] = round(med[k] / med["1x"] / factors[k], 2)
        rec["t1_runs"] = [round(w, 2) for w in walls["1x"]]
        out["ops"][name] = rec
        print(name, json.dumps(rec))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"OPS_STRESS_r{os.environ.get('SPARK_GRAFT_ROUND', '11')}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

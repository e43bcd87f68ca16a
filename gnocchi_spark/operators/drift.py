"""Distribution-drift diagnostics between two time windows of a
measure stream: Population Stability Index over a fixed bin grid and
the exact two-sample Kolmogorov-Smirnov statistic.

The reference has no drift operators (its closest concept is the
resource lifespan filter, gnocchi/rest/api.py); these serve the
training-data charter: "did this metric / feature distribution move
between the reference window and today" is the canonical data-quality
question a 100 TB ingest pipeline asks before a model refresh.

Scale design — both diagnostics are one hash shuffle on
(metric, bin|value) plus a per-metric window over a BOUNDED frame:

* PSI buckets every value into 10 fixed-width bins derived from the
  reference window's [min, max], so state per metric is 10 rows no
  matter how many raw measures flow in — partial aggregation does all
  the heavy lifting map-side.
* KS needs per-distinct-value cumulative counts; the cumulative window
  partitions by metric, so skew is bounded by one metric's distinct
  values.  The supremum is computed in EXACT INTEGER arithmetic
  (max |cum_ref * n_cur - cum_cur * n_ref|) and divided once at the
  end — bit-identical across engines, no float-accumulation ordering
  anywhere.

The window split point is the integer-microsecond midpoint of the
observed time range, so both engines (and successive runs over the
same data) derive the same partition of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sided(measures: DataFrame, metric_col: str, ts_col: str, value_col: str) -> DataFrame:
    """Tag each measure ref/cur by the integer-µs midpoint of the
    global time range (broadcast 1-row aggregate)."""
    span = measures.agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("__tmin"),
        F.max(F.unix_micros(F.col(ts_col))).alias("__tmax"),
    )
    return (
        measures.select(
            F.col(metric_col).alias("metric_id"),
            F.unix_micros(F.col(ts_col)).alias("__us"),
            F.col(value_col).alias("v"),
        )
        .crossJoin(F.broadcast(span))
        .select(
            "metric_id",
            "v",
            (F.col("__us") <= F.expr("(__tmin + __tmax) div 2")).alias("is_ref"),
        )
    )


def psi_report(
    measures: DataFrame,
    metric_col: str = "metric_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bins: int = 10,
) -> DataFrame:
    """Per-metric Population Stability Index between the first and
    second half of the time range.

    Bin edges are ``bins`` fixed-width intervals over the REFERENCE
    window's [min, max] (the standard PSI convention: the monitoring
    grid is frozen from the baseline); current-window values outside
    the grid clamp into the edge bins.  Proportions are Laplace-
    smoothed ((c + 0.5) / (n + bins/2)) so empty bins contribute a
    finite, engine-identical term.  Returns
    (metric_id, n_ref, n_cur, psi).
    """
    from gnocchi_spark.operators.dedup import reclaimable_local_checkpoint

    # referenced by the range, binning and grid branches: truncate so
    # the measure stream is read once, not per branch (memo-registered
    # reclaim-only, r10: the blocks belong to the LRU, never leak)
    sided = reclaimable_local_checkpoint(
        _sided(measures, metric_col, ts_col, value_col), "psi_sided"
    )
    # metric-count rows, referenced by binning and the grid: truncate
    # so the reference-window reduction runs once
    ref_rng = reclaimable_local_checkpoint(
        sided.where("is_ref")
        .groupBy("metric_id")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi")),
        "psi_ref_rng",
    )
    binned = (
        sided.join(F.broadcast(ref_rng), "metric_id")
        .select(
            "metric_id",
            "is_ref",
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col("v") - F.col("lo"))
                            / ((F.col("hi") - F.col("lo")) / F.lit(float(bins)))
                        ).cast("int"),
                    ),
                )
            )
            .alias("bin"),
        )
        .groupBy("metric_id", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("c_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("c_cur"),
        )
    )
    # full bins x metrics grid so empty bins still contribute their
    # smoothed term (10 rows per metric).  Metrics come from the
    # 1-row-per-metric reference-range aggregate, NOT a second pass
    # over the measure stream — PSI is undefined without a baseline,
    # and this keeps the grid branch off the big scan entirely.
    grid = ref_rng.select("metric_id").crossJoin(
        F.broadcast(
            sided.sparkSession.range(bins).select(
                F.col("id").cast("int").alias("bin")
            )
        )
    )
    full = grid.join(binned, ["metric_id", "bin"], "left").select(
        "metric_id",
        "bin",
        F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
        F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
    )
    tot = full.groupBy("metric_id").agg(
        F.sum("c_ref").cast("long").alias("n_ref"),
        F.sum("c_cur").cast("long").alias("n_cur"),
    )
    smooth = F.lit(0.5)
    denom = F.lit(bins * 0.5)
    p = (F.col("c_ref") + smooth) / (F.col("n_ref") + denom)
    q = (F.col("c_cur") + smooth) / (F.col("n_cur") + denom)
    return (
        full.join(F.broadcast(tot), "metric_id")
        .groupBy("metric_id")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            # order-free: the per-bin PSI terms are deterministic
            # doubles; quantize at 1e-9 (floor form, engine-uniform)
            # and sum as LONG so bin association order can never move
            # the rounded statistic (contract of queries._xmean_col)
            (
                F.floor(
                    F.sum(
                        F.floor(
                            (p - q) * F.log(p / q) * F.lit(1e9) + F.lit(0.5)
                        )
                    ).cast("double")
                    / F.lit(1e9)
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("psi"),
        )
        .select("metric_id", "n_ref", "n_cur", "psi")
    )


def psi_from_bin_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    bins: int = 10,
) -> DataFrame:
    """PSI from two pre-binned (metric_id, bin, cnt) count tables over
    the SAME fixed grid — the streaming-monitor form of
    :func:`psi_report`.

    ``streaming.ingest.streaming_histogram_counts`` maintains exactly
    such counters incrementally (fixed bounds make them sum-mergeable
    across windows and runs), so a drift monitor freezes one merged
    slice as the baseline and compares any later merged slice without
    ever reprocessing raw data.  Same Laplace smoothing and formula as
    the batch operator; identical inputs give identical PSI.
    """
    ref = ref_counts.groupBy("metric_id", "bin").agg(
        F.sum("cnt").cast("long").alias("c_ref")
    )
    cur = cur_counts.groupBy("metric_id", "bin").agg(
        F.sum("cnt").cast("long").alias("c_cur")
    )
    grid = ref.select("metric_id").distinct().crossJoin(
        F.broadcast(
            ref_counts.sparkSession.range(bins).select(
                F.col("id").cast("int").alias("bin")
            )
        )
    )
    full = (
        grid.join(ref, ["metric_id", "bin"], "left")
        .join(cur, ["metric_id", "bin"], "left")
        .select(
            "metric_id",
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
    )
    tot = full.groupBy("metric_id").agg(
        F.sum("c_ref").cast("long").alias("n_ref"),
        F.sum("c_cur").cast("long").alias("n_cur"),
    )
    smooth = F.lit(0.5)
    denom = F.lit(bins * 0.5)
    p = (F.col("c_ref") + smooth) / (F.col("n_ref") + denom)
    q = (F.col("c_cur") + smooth) / (F.col("n_cur") + denom)
    return (
        full.join(F.broadcast(tot), "metric_id")
        .groupBy("metric_id")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            # order-free: the per-bin PSI terms are deterministic
            # doubles; quantize at 1e-9 (floor form, engine-uniform)
            # and sum as LONG so bin association order can never move
            # the rounded statistic (contract of queries._xmean_col)
            (
                F.floor(
                    F.sum(
                        F.floor(
                            (p - q) * F.log(p / q) * F.lit(1e9) + F.lit(0.5)
                        )
                    ).cast("double")
                    / F.lit(1e9)
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("psi"),
        )
        .select("metric_id", "n_ref", "n_cur", "psi")
    )


def ks_two_sample(
    measures: DataFrame,
    metric_col: str = "metric_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-metric exact two-sample KS statistic between the first and
    second half of the time range.

    sup_x |F_ref(x) - F_cur(x)| evaluated at every distinct observed
    value; the supremum's argmax is selected on the exact BIGINT
    cross-multiplied numerator, so no float comparison decides the
    result.  Returns (metric_id, n_ref, n_cur, ks_stat).
    """
    from gnocchi_spark.operators.dedup import reclaimable_local_checkpoint

    sided = _sided(measures, metric_col, ts_col, value_col)
    # referenced by the cumulative window and the totals: truncate so
    # the per-value reduction runs once (memo-registered reclaim-only,
    # r10: the blocks belong to the LRU, never leak)
    per_val = reclaimable_local_checkpoint(
        sided.groupBy("metric_id", "v").agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("c_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
            .cast("long")
            .alias("c_cur"),
        ),
        "ks_per_val",
    )
    w = (
        Window.partitionBy("metric_id")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_val.select(
        "metric_id",
        F.sum("c_ref").over(w).alias("cum_ref"),
        F.sum("c_cur").over(w).alias("cum_cur"),
    )
    tot = per_val.groupBy("metric_id").agg(
        F.sum("c_ref").cast("long").alias("n_ref"),
        F.sum("c_cur").cast("long").alias("n_cur"),
    )
    return (
        cum.join(F.broadcast(tot), "metric_id")
        .where((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .groupBy("metric_id")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            # exact integer numerator; decimal(38,0) so the cross-
            # multiplication cannot overflow BIGINT at 100 TB counts
            F.max(
                F.abs(
                    F.col("cum_ref").cast("decimal(38,0)")
                    * F.col("n_cur").cast("decimal(38,0)")
                    - F.col("cum_cur").cast("decimal(38,0)")
                    * F.col("n_ref").cast("decimal(38,0)")
                )
            ).alias("__dnum"),
        )
        .select(
            "metric_id",
            "n_ref",
            "n_cur",
            F.round(
                F.col("__dnum").cast("double")
                / (
                    F.col("n_ref").cast("decimal(38,0)")
                    * F.col("n_cur").cast("decimal(38,0)")
                ).cast("double"),
                6,
            ).alias("ks_stat"),
        )
    )

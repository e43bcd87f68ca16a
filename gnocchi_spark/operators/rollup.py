"""Ingest-time aggregation: measures -> multi-granularity rollups.

This is the heart of the reference (gnocchi/storage/__init__.py:583-692,
kernels gnocchi/carbonara.py:108-221): every archive-policy method is
computed per (metric, granularity) bucket.

Spark-first design:

- ONE shuffle per granularity: all methods of a policy are computed in a
  single ``groupBy(metric, bucket)`` pass (wide), then optionally melted
  to the long rollup layout.  Partial aggregation (map-side combine) is
  free for every kernel because they are native Spark aggregates.
- ``rate:*`` methods pre-diff per metric with a window ``lag`` — the
  window shares the shuffle-by-metric partitioning.
- Multi-granularity policies can **cascade**: the finest granularity
  computes mergeable partials (count/sum/min/max/sumsq/first/last), and
  coarser granularities re-aggregate those partials instead of
  re-scanning raw measures.  At 100 TB this turns N full scans into one
  scan + N-1 cheap re-aggregations over already-reduced data.
  Non-mergeable kernels (median/percentiles) always compute from raw.
- Duplicate timestamps resolve last-write-wins like the reference
  (gnocchi/carbonara.py:92-105) when a ``seq_col`` arrival-order column
  is provided.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gnocchi_spark.functions.aggregates import agg_expr, safe_alias
from gnocchi_spark.functions.timeutil import (
    granularity_label,
    granularity_seconds,
    truncate_to_bucket,
)
from gnocchi_spark.policy import ArchivePolicy, parse_method

ROLLUP_COLUMNS = ("metric_id", "method", "granularity", "bucket_ts", "value")

# Methods whose bucket aggregates merge losslessly into coarser buckets.
_MERGEABLE = {"mean", "sum", "min", "max", "count", "std", "first", "last"}


def dedup_last_write_wins(
    measures: DataFrame,
    metric_col: str = "metric_id",
    ts_col: str = "ts",
    seq_col: str | None = None,
) -> DataFrame:
    """Resolve duplicate (metric, ts) rows keeping the latest arrival.

    Reference: combine_timeseries puts new values first so they win
    (gnocchi/carbonara.py:92-105,265-267).
    """
    if seq_col is None:
        return measures.dropDuplicates([metric_col, ts_col])
    w = Window.partitionBy(metric_col, ts_col).orderBy(F.col(seq_col).desc())
    return (
        measures.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _rate_diff(
    measures: DataFrame, metric_col: str, ts_col: str, value_col: str, seq_col: str | None
) -> Column:
    """``value - lag(value)`` per metric in timestamp order
    (gnocchi/carbonara.py:212-221).  The first point of each metric has no
    predecessor and drops out (NULL)."""
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(metric_col).orderBy(*order)
    return F.col(value_col) - F.lag(F.col(value_col)).over(w)


def rollup_wide(
    measures: DataFrame,
    methods: Sequence[str],
    granularity: float | str,
    metric_col: str = "metric_id",
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """One row per (metric, bucket) with a column per method.

    Single shuffle: the rate-diff window partitions by metric, and the
    groupBy keys on (metric, bucket) — AQE/Catalyst reuse the exchange.
    """
    bucket = truncate_to_bucket(F.col(ts_col), granularity).alias("bucket_ts")
    needs_rate = any(m.startswith("rate:") for m in methods)
    df = measures
    if needs_rate:
        df = df.withColumn("__rate", _rate_diff(df, metric_col, ts_col, value_col, seq_col))

    aggs: list[Column] = []
    need_count_for_std = any(parse_method(m)[0] == "std" for m in methods) or any(
        m.startswith("rate:") and parse_method(m)[1] == "std" for m in methods
    )
    if need_count_for_std and "count" not in methods:
        aggs.append(F.count(F.col(value_col)).alias("__cnt"))
    for m in methods:
        base, rate_base, _ = parse_method(m)
        if base == "rate":
            col = agg_expr(
                rate_base,
                value=F.col("__rate"),
                ts=ts_col,
                tiebreak=seq_col,
                exact=exact,
            )
            if rate_base == "std":
                aggs.append(F.count(F.col("__rate")).alias("__rate_cnt"))
        else:
            col = agg_expr(
                m, value=value_col, ts=ts_col, tiebreak=seq_col, exact=exact
            )
        aggs.append(col.alias(safe_alias(m)))

    out = df.groupBy(F.col(metric_col).alias("metric_id"), bucket).agg(*aggs)

    # std bucket suppression (carbonara.py:180-182): sample std of a
    # single point is dropped -> NULL in wide layout.
    for m in methods:
        base, rate_base, _ = parse_method(m)
        if base == "std":
            cnt = F.col(safe_alias("count")) if "count" in methods else F.col("__cnt")
            out = out.withColumn(
                safe_alias(m), F.when(cnt > 1, F.col(safe_alias(m)))
            )
        elif base == "rate" and rate_base == "std":
            out = out.withColumn(
                safe_alias(m), F.when(F.col("__rate_cnt") > 1, F.col(safe_alias(m)))
            )
    return out.drop("__cnt", "__rate_cnt")


def melt_rollup(
    wide: DataFrame, methods: Sequence[str], granularity: float | str
) -> DataFrame:
    """Wide -> long rollup layout (metric_id, method, granularity,
    bucket_ts, value).  Map-side only (stack), no extra shuffle.
    NULL values (e.g. suppressed std buckets) are dropped, matching the
    reference where those buckets simply don't exist in the series."""
    pairs = ", ".join(
        f"'{m}', cast(`{safe_alias(m)}` as double)" for m in methods
    )
    stacked = wide.select(
        "metric_id",
        "bucket_ts",
        F.expr(f"stack({len(methods)}, {pairs}) as (method, value)"),
    ).where(F.col("value").isNotNull())
    return stacked.select(
        "metric_id",
        "method",
        F.lit(granularity_label(granularity)).alias("granularity"),
        "bucket_ts",
        "value",
    )


def rollup(
    measures: DataFrame,
    methods: Sequence[str],
    granularity: float | str,
    metric_col: str = "metric_id",
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Long-format rollup for one granularity."""
    wide = rollup_wide(
        measures,
        methods,
        granularity,
        metric_col,
        ts_col,
        value_col,
        seq_col,
        exact=exact,
    )
    return melt_rollup(wide, methods, granularity)


# ---------------------------------------------------------------------------
# Cascading multi-granularity materialization
# ---------------------------------------------------------------------------

_PARTIAL_AGGS = {
    "cnt": lambda v, t: F.count(v),
    "s": lambda v, t: F.sum(v),
    # (mean, m2) central moments instead of a raw sum-of-squares: Spark's
    # var_pop is a Welford-style CentralMomentAgg, so the fine-level m2 is
    # numerically stable even when |mean| >> std (the textbook
    # ssq - s^2/cnt form cancels catastrophically there and can go
    # negative under the sqrt).
    "mean": lambda v, t: F.avg(v),
    "m2": lambda v, t: F.var_pop(v) * F.count(v),
    "mn": lambda v, t: F.min(v),
    "mx": lambda v, t: F.max(v),
    "first_ts": lambda v, t: F.min(t),
    "last_ts": lambda v, t: F.max(t),
    "first_v": lambda v, t: F.min_by(v, t),
    "last_v": lambda v, t: F.max_by(v, t),
}

def _moment_zero() -> Column:
    return F.struct(
        F.lit(0).cast("long").alias("n"), F.lit(0.0).alias("mean"), F.lit(0.0).alias("m2")
    )


def _chan_merge(acc: Column, x: Column) -> Column:
    """Chan et al. parallel-variance merge of (n, mean, M2) partials —
    the same update Spark's own CentralMomentAgg.merge performs, expressed
    as a Column fold so it stays inside whole-stage codegen."""
    n = acc["n"] + x["n"]
    delta = x["mean"] - acc["mean"]
    mean = acc["mean"] + delta * x["n"] / n
    m2 = acc["m2"] + x["m2"] + delta * delta * acc["n"] * x["n"] / n
    return F.struct(n.alias("n"), mean.alias("mean"), m2.alias("m2"))


def _partials(df: DataFrame, bucket: Column, metric_col: str, ts_col: str, value_col: str) -> DataFrame:
    v, t = F.col(value_col), F.col(ts_col)
    aggs = [fn(v, t).alias(name) for name, fn in _PARTIAL_AGGS.items()]
    return df.groupBy(F.col(metric_col).alias("metric_id"), bucket.alias("bucket_ts")).agg(*aggs)


def _remerge(partials: DataFrame, granularity: float | str) -> DataFrame:
    """Merge fine partials into coarser buckets — input is already reduced
    to one row per (metric, fine bucket), so this shuffle is tiny."""
    b = truncate_to_bucket(F.col("bucket_ts"), granularity).alias("bucket_ts")
    merged = partials.groupBy("metric_id", b).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("s").alias("s"),
        # collect the fine (n, mean, M2) triples and Chan-merge them in a
        # deterministic (sorted) order.  Bounded fan-in: at most
        # coarse/fine elements per group (e.g. 1d over 1m = 1440 structs),
        # so the array never approaches the raw point count.
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("cnt").alias("n"),
                    F.col("mean").alias("mean"),
                    F.col("m2").alias("m2"),
                )
            )
        ).alias("__moments"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.min("first_ts").alias("first_ts"),
        F.max("last_ts").alias("last_ts"),
        F.min_by("first_v", "first_ts").alias("first_v"),
        F.max_by("last_v", "last_ts").alias("last_v"),
    )
    folded = F.aggregate("__moments", _moment_zero(), _chan_merge)
    return merged.withColumns(
        {"mean": folded["mean"], "m2": folded["m2"]}
    ).drop("__moments")


def _finalize(partials: DataFrame, methods: Sequence[str]) -> DataFrame:
    cnt, s, m2 = F.col("cnt"), F.col("s"), F.col("m2")
    final = {
        "mean": s / cnt,
        "sum": s,
        "min": F.col("mn"),
        "max": F.col("mx"),
        "count": cnt.cast("double"),
        # sample std from Chan-merged M2; suppressed for cnt <= 1
        # (carbonara.py:180-182).  greatest(0) guards the last-ulp
        # negative that roundoff can leave even in the stable form.
        "std": F.when(cnt > 1, F.sqrt(F.greatest(m2, F.lit(0.0)) / (cnt - 1))),
        "first": F.col("first_v"),
        "last": F.col("last_v"),
    }
    cols = [final[m].alias(safe_alias(m)) for m in methods]
    return partials.select("metric_id", "bucket_ts", *cols)


def rollup_policy(
    measures: DataFrame,
    policy: ArchivePolicy,
    metric_col: str = "metric_id",
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str | None = None,
    cascade: bool = True,
) -> DataFrame:
    """Materialize every (method, granularity) of an archive policy as one
    long-format rollup DataFrame.

    With ``cascade=True`` (default), mergeable methods compute raw->finest
    once and coarser granularities fold the finest partials; percentile
    family methods fall back to direct computation per granularity.
    """
    methods = sorted(policy.aggregation_methods)
    grans = [d.granularity_s for d in policy.definition]
    mergeable = [m for m in methods if parse_method(m)[0] in _MERGEABLE]
    direct = [m for m in methods if m not in mergeable]

    outputs: list[DataFrame] = []
    if not cascade or len(grans) == 1 or not mergeable:
        for g in grans:
            outputs.append(
                rollup(measures, methods, g, metric_col, ts_col, value_col, seq_col)
            )
        return _union_all(outputs)

    finest = min(grans)
    # A coarse granularity can only fold finest-level partials when every
    # fine bucket nests inside one coarse bucket, i.e. g is an integer
    # multiple of finest (buckets are epoch-aligned, so multiple => every
    # coarse boundary is a fine boundary).  The reference computes each
    # granularity independently (storage/__init__.py:583-692), so e.g.
    # (60, 90) policies are valid; 90s buckets straddle 60s boundaries and
    # must roll up from raw instead.
    def _nests(g: float) -> bool:
        ratio = g / finest
        return abs(ratio - round(ratio)) < 1e-9

    fine_partials = _partials(
        measures, truncate_to_bucket(F.col(ts_col), finest), metric_col, ts_col, value_col
    ).cache()
    # eager: the finalize + N-1 remerge consumers otherwise race to
    # build uncached partitions concurrently, each recomputing the
    # partial aggregation (measured 2.5x cold wall-clock at sf0.1)
    fine_partials.count()
    for g in sorted(grans):
        if not _nests(g):
            outputs.append(rollup(measures, methods, g, metric_col, ts_col, value_col, seq_col))
            continue
        p = fine_partials if g == finest else _remerge(fine_partials, g)
        outputs.append(melt_rollup(_finalize(p, mergeable), mergeable, g))
        if direct:
            outputs.append(rollup(measures, direct, g, metric_col, ts_col, value_col, seq_col))
    return _union_all(outputs)


def _union_all(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out

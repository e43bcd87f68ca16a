"""Series alignment: the implicit full-outer-join of the aggregates API.

Reference: processor.aggregated builds a (union-of-timestamps x series)
value grid (gnocchi/rest/aggregates/processor.py:165-182), applies a
fill policy (processor.py:184-196, utils.py:373-381), and when no fill
is given enforces ``needed_percent_of_overlap`` and trims unbounded
edges to the overlap region (processor.py:200-220).

Spark shape: union the per-series long frames and pivot on the series
label (one shuffle; the label set is static so no pivot-discovery pass),
then window functions for ffill/bfill.  Missing cells are NULL (Spark's
NaN analogue in the reference grid).

Scale note: ``partition_cols`` threads a grouping key through every
window so a grouped query (aggregates API groupby=) keeps one parallel
partition per group instead of a single global sort.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class UnAggregableTimeseries(Exception):
    """Mirror of gnocchi.rest.aggregates.exceptions.UnAggregableTimeseries
    (HTTP 400 in the reference API)."""


def stack_series(series: Mapping[str, DataFrame], ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Union per-series (ts, value) frames into long (series, ts, value)."""
    frames = [
        df.select(
            F.lit(label).alias("series"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("value"),
        )
        for label, df in series.items()
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def align_series(
    series: Mapping[str, DataFrame],
    fill: float | str | None = None,
    needed_overlap: float = 100.0,
    start=None,
    stop=None,
    ts_col: str = "ts",
    value_col: str = "value",
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Pivot N series onto the union of their timestamps and apply fill.

    Returns a wide frame: (*partition_cols, ts, <label>...).  With
    ``fill=None`` raises :class:`UnAggregableTimeseries` unless at least
    ``needed_overlap`` percent of (trimmed) timestamps have every series
    present — exactly processor.py:200-220.
    """
    labels = list(series)
    long = stack_series(series, ts_col, value_col)
    if start is not None:
        long = long.where(F.col("ts") >= F.lit(start).cast("timestamp"))
    if stop is not None:
        long = long.where(F.col("ts") <= F.lit(stop).cast("timestamp"))

    keys = [*partition_cols, "ts"]
    wide = long.groupBy(*keys).pivot("series", labels).agg(F.first("value"))

    if fill is None:
        return _enforce_overlap(wide, labels, needed_overlap, start, stop, partition_cols)

    if isinstance(fill, (int, float)) and not isinstance(fill, bool):
        return wide.fillna(float(fill), subset=labels)
    if fill == "null" or fill == "dropna":
        # dropna filtering happens post-evaluation (processor.py:237-244)
        return wide
    if fill in ("ffill", "bfill", "full_ffill", "full_bfill"):
        order = {"ffill": ("f",), "bfill": ("b",), "full_ffill": ("f", "b"), "full_bfill": ("b", "f")}
        for direction in order[fill]:
            wide = _directional_fill(wide, labels, direction, partition_cols)
        return wide
    raise ValueError(f"invalid fill {fill!r}")


def _directional_fill(
    wide: DataFrame, labels: list[str], direction: str, partition_cols: Sequence[str]
) -> DataFrame:
    part = Window.partitionBy(*partition_cols) if partition_cols else Window.partitionBy()
    if direction == "f":
        w = part.orderBy(F.col("ts").asc()).rowsBetween(Window.unboundedPreceding, 0)
        fn = F.last
    else:
        w = part.orderBy(F.col("ts").asc()).rowsBetween(0, Window.unboundedFollowing)
        fn = F.first
    return wide.select(
        *partition_cols,
        "ts",
        *[fn(F.col(c), ignorenulls=True).over(w).alias(c) for c in labels],
    )


def _enforce_overlap(
    wide: DataFrame,
    labels: list[str],
    needed_overlap: float,
    start,
    stop,
    partition_cols: Sequence[str],
) -> DataFrame:
    if partition_cols:
        raise NotImplementedError(
            "overlap enforcement (fill=None) is per-query, not per-group"
        )
    all_present = F.forall(
        F.array(*[F.col(c) for c in labels]), lambda x: x.isNotNull()
    )
    stats = wide.agg(
        F.count("*").alias("n"),
        F.min(F.when(all_present, F.col("ts"))).alias("first_ov"),
        F.max(F.when(all_present, F.col("ts"))).alias("last_ov"),
        F.count(F.when(all_present, F.lit(1))).alias("n_ov"),
    ).collect()[0]
    if stats["n"] == 0:
        return wide
    if stats["n_ov"] == 0 and needed_overlap > 0:
        raise UnAggregableTimeseries("No overlap")
    out = wide
    # unbounded edges trim to the overlap region (processor.py:206-214)
    if stop is None and stats["last_ov"] is not None:
        out = out.where(F.col("ts") <= F.lit(stats["last_ov"]))
    if start is None and stats["first_ov"] is not None:
        out = out.where(F.col("ts") >= F.lit(stats["first_ov"]))
    if stop is None or start is None:
        trimmed = out.agg(
            F.count("*").alias("n"), F.count(F.when(all_present, F.lit(1))).alias("n_ov")
        ).collect()[0]
    else:
        trimmed = stats
    if trimmed["n"]:
        pct = trimmed["n_ov"] * 100.0 / trimmed["n"]
        if pct < needed_overlap:
            raise UnAggregableTimeseries(
                "Less than %f%% of datapoints overlap in this timespan (%.2f%%)"
                % (needed_overlap, pct)
            )
    return out

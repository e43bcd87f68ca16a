"""Time-banded window execution for ungrouped series.

A window with an empty PARTITION BY funnels every row through ONE task —
fine for a few hundred aligned buckets, a driver-adjacent bottleneck for
a year of 1-second buckets.  The reference never hits this (numpy on a
single node); the Spark-first answer is to band the time axis into
coarse chunks, run the window per band (parallel), and stitch the band
boundaries with a *tiny* per-band summary (one row per non-empty band)
that carries state across bands.

The cross-band carry itself is NOT a window: the summaries are collected
into one sorted array (an ordinary global aggregate — map-side partials,
single-row result) and the prefix scan is an O(#bands) ``F.aggregate``
fold, exploded back and broadcast-joined onto the banded rows.  The
resulting plans contain ZERO empty-partition Window nodes; every Window
partitions by (pk, band).

Band count is bounded by timespan/band_width (a decade of one-week
bands = 522 summary rows), never by point count.

Pattern per operator:

- ffill/bfill: within-band directional fill + carried last/first
  non-null edge value from preceding/following bands.
- lag (rate-of-change): within-band lag; each band's first row takes the
  previous band's last (ts, value) — an O(n) shift over the summaries.
- global row_number: within-band row_number + exclusive prefix sum of
  band counts.
- rolling(k): see operations._rolling — row-number chunks with a k-row
  halo replicated from the previous chunk.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default band width: one week of time axis per task
BAND_SECONDS = 7 * 86400

_BAND = "__band"


def time_band(ts: Column, band_seconds: int = BAND_SECONDS) -> Column:
    return F.floor(F.unix_micros(ts) / F.lit(int(band_seconds) * 1_000_000))


def _with_band(df: DataFrame, ts_col: str, band_seconds: int) -> DataFrame:
    return df.withColumn(_BAND, time_band(F.col(ts_col), band_seconds))


def _scan_summaries(summary: DataFrame, pk: Sequence[str], scan) -> DataFrame:
    """Sort each pk-group's band summaries into one array, apply
    ``scan(arr) -> array<struct(band, ...carry)>`` and explode back to
    one row per band.  A plain global/grouped aggregate — no Window."""
    pk = list(pk)
    fields = [c for c in summary.columns if c not in pk]
    arr = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in fields]))  # _BAND first
    )
    g = summary.groupBy(*pk).agg(arr.alias("__arr"))
    return g.select(*pk, F.explode(scan(F.col("__arr"))).alias("__s")).select(
        *pk, "__s.*"
    )


def _typed_empty(arr: Column, template) -> Column:
    """Empty array with the struct type produced by ``template(elem)``."""
    return F.filter(F.transform(arr, template), lambda _: F.lit(False))


def banded_fill(
    df: DataFrame,
    labels: Sequence[str],
    direction: str = "f",
    pk: Sequence[str] = (),
    ts_col: str = "ts",
    band_seconds: int = BAND_SECONDS,
) -> DataFrame:
    """Directional fill (ffill/bfill) without a global window."""
    pk = list(pk)
    out_cols = list(df.columns)
    forward = direction == "f"
    b = _with_band(df, ts_col, band_seconds)

    # one row per non-empty band: the band's fill edge per label
    # (last non-null for ffill, first non-null for bfill)
    edge_by = F.max_by if forward else F.min_by
    summary = b.groupBy(*pk, _BAND).agg(
        *[
            edge_by(F.col(c), F.when(F.col(c).isNotNull(), F.col(ts_col))).alias(
                f"__e{i}"
            )
            for i, c in enumerate(labels)
        ]
    )

    idx = range(len(labels))

    def scan(arr: Column) -> Column:
        # running non-null edge, exclusive of the current band.  For
        # bfill, fold from the reversed array so "preceding" means later
        # bands.  O(#bands) fold, appending one struct per band.
        src = arr if forward else F.reverse(arr)

        def template_elem(x):
            return F.struct(
                x[_BAND].alias("band"), *[x[f"__e{i}"].alias(f"__c{i}") for i in idx]
            )

        def step(acc, x):
            prev = F.get(acc, F.size(acc) - 1)
            new = F.struct(
                x[_BAND].alias("band"),
                # carry INTO this band = previous band's inclusive edge;
                # store the inclusive edge in the same slot for the next
                # step by coalescing at read time below.
                *[F.coalesce(x[f"__e{i}"], prev[f"__c{i}"]).alias(f"__c{i}") for i in idx],
            )
            return F.concat(acc, F.array(new))

        incl = F.aggregate(src, _typed_empty(src, template_elem), step)
        # exclusive carry for band at position i = inclusive value at i-1
        return F.transform(
            incl,
            lambda x, i: F.struct(
                x["band"].alias("band"),
                *[F.get(incl, i - 1)[f"__c{j}"].alias(f"__c{j}") for j in idx],
            ),
        )

    carry = _scan_summaries(summary, pk, scan).withColumnRenamed("band", _BAND)
    joined = b.join(F.broadcast(carry), on=[*pk, _BAND])

    w_in = Window.partitionBy(*pk, _BAND).orderBy(F.col(ts_col).asc())
    w_in = (
        w_in.rowsBetween(Window.unboundedPreceding, 0)
        if forward
        else w_in.rowsBetween(0, Window.unboundedFollowing)
    )
    in_fn = F.last if forward else F.first
    filled = {
        c: F.coalesce(in_fn(F.col(c), ignorenulls=True).over(w_in), F.col(f"__c{i}"))
        for i, c in enumerate(labels)
    }
    return joined.select(
        *[filled[c].alias(c) if c in filled else F.col(c) for c in out_cols]
    )


def banded_lag(
    df: DataFrame,
    cols: Sequence[str],
    pk: Sequence[str] = (),
    ts_col: str = "ts",
    band_seconds: int = BAND_SECONDS,
) -> tuple[DataFrame, dict[str, str], str]:
    """Previous-row value per column and previous-row timestamp, without
    a global window.  Returns (df, {col: lag_col}, lag_ts_col); the
    caller drops the helper columns when done."""
    pk = list(pk)
    b = _with_band(df, ts_col, band_seconds)

    summary = b.groupBy(*pk, _BAND).agg(
        F.max(F.col(ts_col)).alias("__lts"),
        *[F.max_by(F.col(c), F.col(ts_col)).alias(f"__lv{i}") for i, c in enumerate(cols)],
    )
    idx = range(len(cols))

    def scan(arr: Column) -> Column:
        # shift by one band: O(n) transform, F.get returns NULL at -1
        return F.transform(
            arr,
            lambda x, i: F.struct(
                x[_BAND].alias("band"),
                F.get(arr, i - 1)["__lts"].alias("__pts"),
                *[F.get(arr, i - 1)[f"__lv{j}"].alias(f"__pv{j}") for j in idx],
            ),
        )

    prev = _scan_summaries(summary, pk, scan).withColumnRenamed("band", _BAND)
    joined = b.join(F.broadcast(prev), on=[*pk, _BAND])

    w_in = Window.partitionBy(*pk, _BAND).orderBy(F.col(ts_col).asc())
    first_in_band = F.row_number().over(w_in) == 1
    lag_ts = "__lag_ts"
    out = joined.withColumn(
        lag_ts,
        F.when(first_in_band, F.col("__pts")).otherwise(F.lag(F.col(ts_col)).over(w_in)),
    )
    names = {}
    for i, c in enumerate(cols):
        name = f"__lag{i}"
        out = out.withColumn(
            name,
            F.when(first_in_band, F.col(f"__pv{i}")).otherwise(F.lag(F.col(c)).over(w_in)),
        )
        names[c] = name
    out = out.drop(_BAND, "__pts", *[f"__pv{i}" for i in idx])
    return out, names, lag_ts


def banded_row_number(
    df: DataFrame,
    pk: Sequence[str] = (),
    ts_col: str = "ts",
    out_col: str = "__rn",
    band_seconds: int = BAND_SECONDS,
) -> DataFrame:
    """Global (per pk-group) 1-based row number in ts order = within-band
    row_number + exclusive prefix sum of preceding band counts."""
    pk = list(pk)
    b = _with_band(df, ts_col, band_seconds)
    summary = b.groupBy(*pk, _BAND).agg(F.count("*").alias("__bn"))

    def scan(arr: Column) -> Column:
        def template(x):
            return F.struct(
                x[_BAND].alias("band"),
                F.lit(0).cast("long").alias("__off"),
                x["__bn"].alias("__incl"),
            )

        def step(acc, x):
            prev = F.get(acc, F.size(acc) - 1)
            off = F.coalesce(prev["__incl"], F.lit(0).cast("long"))
            return F.concat(
                acc,
                F.array(
                    F.struct(
                        x[_BAND].alias("band"),
                        off.alias("__off"),
                        (off + x["__bn"]).alias("__incl"),
                    )
                ),
            )

        return F.aggregate(arr, _typed_empty(arr, template), step)

    offsets = _scan_summaries(summary, pk, scan).withColumnRenamed("band", _BAND)
    joined = b.join(F.broadcast(offsets.drop("__incl")), on=[*pk, _BAND])
    w_in = Window.partitionBy(*pk, _BAND).orderBy(F.col(ts_col).asc())
    return joined.withColumn(out_col, F.row_number().over(w_in) + F.col("__off")).drop(
        _BAND, "__off"
    )

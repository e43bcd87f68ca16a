"""As-of (nearest-prior) join and gap sessionization.

Neither exists in the reference (gnocchi joins are resource<->metric
equi-joins, gnocchi/rest/api.py) or in Spark's built-in operator set;
both are staples of time-series/feature-store pipelines, so they are
implemented here as first-class operators per the engine's
"training-data pipeline" charter.

Scale design: both operators are a SINGLE shuffle on the join/session
key.  The as-of join uses the union+running-last pattern instead of a
range join: left and right are unioned (no row multiplication ever
happens), sorted within each key partition, and each left row picks up
the most recent right payload via ``last(ignorenulls)`` over a running
window.  A range/theta join would explode to |left|x|right-per-key|
candidates and then re-filter; the union form is linear in input size
and survives arbitrarily many right rows per key.  Skewed keys behave
like any skewed aggregation (AQE skew handling applies); there is no
broadcast requirement on either side, so both inputs can be 100-TB
scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: Sequence[str] = (),
    tie_col: str | None = None,
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """For every left row, attach ``payload_cols`` from the latest right
    row with ``right_ts <= left_ts`` and equal ``key_cols`` (pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, backward
    direction).  Left rows with no prior right row keep NULL payloads.

    ``tie_col``: deterministic winner among right rows sharing
    (key, right_ts) — the row with the LARGEST tie value wins.  Required
    whenever right timestamps may collide per key; without it Spark's
    sort is free to break ties arbitrarily between runs.

    ``tolerance_seconds``: like pandas merge_asof tolerance — matches
    older than the tolerance are nulled out.

    ``matched_ts_col``: optionally expose the matched right timestamp.
    """
    if not payload_cols:
        raise ValueError("payload_cols must name at least one right column")
    keys = list(key_cols)
    pay = list(payload_cols)

    # Right side: ts + payloads, marked. Payload columns are prefixed so
    # a name collision with left columns cannot corrupt the union.
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        (F.col(tie_col) if tie_col else F.lit(0)).alias("__tie"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in pay],
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__rts"].dataType).alias("__rts"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Order: by time; at equal time right rows sort BEFORE left rows so
    # a right row stamped exactly at left_ts is visible (<= semantics);
    # among right rows, larger tie wins by sorting later.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("__rts"), ignorenulls=True).over(w)
    out = u.withColumn("__matched_ts", matched)
    for c in pay:
        out = out.withColumn(f"__r_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w))

    out = out.where(F.col("__is_right") == 0)
    in_tol: Column = F.lit(True)
    if tolerance_seconds is not None:
        age = (F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__matched_ts"))) / 1e6
        in_tol = age <= F.lit(float(tolerance_seconds))
    sel = [F.col(c) for c in left_cols]
    if matched_ts_col:
        sel.append(
            F.when(in_tol, F.col("__matched_ts")).alias(matched_ts_col)
        )
    sel += [F.when(in_tol, F.col(f"__r_{c}")).alias(c) for c in pay]
    return out.select(*sel)


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    tie_col: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: within each key, a new session
    starts when the time since the previous row exceeds ``gap_seconds``
    (the classic web-sessionization operator; Structured Streaming's
    ``session_window`` is its streaming twin — this is the batch form
    with deterministic output).

    Adds ``session_id`` (1-based per key, in time order).  One shuffle
    on the key; the running sum stays inside the same sort as the lag.
    """
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = F.lit(int(round(gap_seconds * 1_000_000)))
    is_new = (
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us)
    ).cast("long")
    running = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_id", F.sum(is_new).over(running))


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    value_col: str | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """Sessionize then aggregate one row per session: start, end,
    duration, event count (and value sum when ``value_col`` given)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, tie_col=tie_col)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 1e6
        ).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return s.groupBy(*[F.col(k) for k in key_cols], F.col("session_id")).agg(*aggs)


def interval_join_pairs(
    starts: DataFrame,
    probes: DataFrame,
    key_cols: Sequence[str],
    window_seconds: float,
    start_ts: str = "ts",
    probe_ts: str = "ts",
    probe_prefix: str = "p_",
) -> DataFrame:
    """Banded interval join: every (start, probe) pair with equal
    ``key_cols`` and ``start_ts <= probe_ts < start_ts + window``.
    Probe columns come back prefixed with ``probe_prefix``.

    Spark has no interval-join operator, and the naive formulation —
    an equi-join on the key with a range predicate — degenerates to
    |starts| x |probes-per-key| candidates re-filtered afterwards.
    This uses the standard banded-bucket decomposition instead: time
    is cut into window-sized buckets; a start interval
    [t, t + window) can only overlap bucket floor(t/W) and the next
    one, so each start is exploded to exactly TWO (key, bucket) join
    rows and each probe to one.  The join is then a pure equi-join on
    (key, bucket) whose candidate count is bounded by genuine temporal
    locality (pairs at most one window apart), never by per-key row
    count; Catalyst shuffles both sides once on the same key and the
    range residual is evaluated map-side post-join.  Bucket arithmetic
    is integer microseconds end to end, so band assignment is exact —
    no float boundary can disagree with the residual predicate.
    """
    keys = list(key_cols)
    w_us = int(round(window_seconds * 1_000_000))
    s_us = F.unix_micros(F.col(start_ts))
    s = starts.select(
        "*",
        F.explode(
            F.array(
                (s_us / F.lit(w_us)).cast("long"),
                (s_us / F.lit(w_us)).cast("long") + 1,
            )
        ).alias("__bucket"),
    )
    p_us = F.unix_micros(F.col(probe_ts))
    p = probes.select(
        *[F.col(k).alias(f"{probe_prefix}{k}") for k in keys],
        (p_us / F.lit(w_us)).cast("long").alias("__bucket"),
        *[
            F.col(c).alias(f"{probe_prefix}{c}")
            for c in probes.columns
            if c not in keys
        ],
    )
    pts = F.col(f"{probe_prefix}{probe_ts}")
    cond = [F.col(k) == F.col(f"{probe_prefix}{k}") for k in keys]
    cond.append(s["__bucket"] == p["__bucket"])
    cond.append(pts >= F.col(start_ts))
    cond.append(
        F.unix_micros(pts) < F.unix_micros(F.col(start_ts)) + F.lit(w_us)
    )
    joined = s.join(p, on=cond, how="inner")
    return joined.drop("__bucket", *[f"{probe_prefix}{k}" for k in keys])

"""Operations-DSL compiler: gnocchi's nested-list AST -> Spark plan.

The reference evaluates the AST with a recursive interpreter over a
(timestamps x series) numpy matrix
(gnocchi/rest/aggregates/operations.py:331-365).  Here the matrix is a
wide DataFrame (ts + one column per series) produced by
operators.align.align_series, and every operator compiles to built-in
Column expressions — the whole query stays inside Catalyst/codegen.

Semantic details mirrored from the reference:

- binary/comparison/ternary ops broadcast numpy-style across the series
  axis (operations.py:160-188); comparisons yield 0.0/1.0 and a missing
  operand compares as False -> 0.0 (numpy NaN comparisons are False).
- ``%`` follows the divisor's sign (numpy.mod), unlike Spark's ``%``.
- binary ``max`` is NaN(null)-ignoring fmax (operations.py:105) ->
  ``greatest``.
- ``aggregate <agg>`` collapses the series axis with the *nan-aware*
  numpy kernels (operations.py:26-36): note std/var here are
  **population** (ddof=0), unlike the ingest 'std' which is sample std.
- ``rolling`` is a trailing row-count window whose output starts at
  point window-1 (operations.py:243-261).
- ``resample`` re-buckets each series with the carbonara kernels
  (operations.py:264-280) — sample std, interpolated percentiles.
- ``rateofchange`` drops the first timestamp; ``rateofchangesec`` keeps
  it (NULL value) — operations.py:139-141.
- operands on different time axes (e.g. a rolled series vs a raw one)
  raise UnAggregableTimeseries unless the axes are identical
  (operations.py:170-176).
"""

from __future__ import annotations

import numbers
from collections.abc import Sequence
from dataclasses import dataclass, field, replace

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gnocchi_spark.functions.timeutil import truncate_to_bucket
from gnocchi_spark.operators.align import UnAggregableTimeseries

_AXIS_COUNTER = [0]


@dataclass
class SeriesFrame:
    """A set of series sharing one time axis: wide df (ts + value cols)."""

    df: DataFrame
    cols: list[str]
    axis: int = field(default_factory=lambda: _AXIS_COUNTER.__setitem__(0, _AXIS_COUNTER[0] + 1) or _AXIS_COUNTER[0])
    partition_cols: tuple[str, ...] = ()
    is_aggregated: bool = False

    def window(self) -> Window:
        part = (
            Window.partitionBy(*self.partition_cols)
            if self.partition_cols
            else Window.partitionBy()
        )
        return part.orderBy(F.col("ts").asc())


BINARY = {"=", "==", "eq", "<", "lt", ">", "gt", "<=", "≤", "le", ">=", "≥", "ge",
          "!=", "≠", "ne", "%", "mod", "+", "add", "-", "sub", "*", "×", "mul",
          "/", "÷", "div", "**", "^", "pow", "clip_min", "clip_max", "max"}
UNARY = {"abs", "absolute", "neg", "negative", "cos", "sin", "tan", "floor", "ceil",
         "rateofchange", "rateofchangesec"}
COMPARISONS = {"=", "==", "eq", "<", "lt", ">", "gt", "<=", "≤", "le", ">=", "≥",
               "ge", "!=", "≠", "ne"}


def _np_mod(a: Column, b: Column) -> Column:
    # numpy.mod: result sign follows the divisor
    return ((a % b) + b) % b


def _binary_col(op: str, a: Column, b: Column) -> Column:
    if op in ("+", "add"):
        return a + b
    if op in ("-", "sub"):
        return a - b
    if op in ("*", "×", "mul"):
        return a * b
    if op in ("/", "÷", "div"):
        return a / b
    if op in ("**", "^", "pow"):
        return F.pow(a, b)
    if op in ("%", "mod"):
        return _np_mod(a, b)
    if op == "clip_min":
        # numpy.clip(NaN) is NaN; greatest() would skip the NULL marker
        return F.when(a.isNotNull(), F.greatest(a, b))
    if op == "clip_max":
        return F.when(a.isNotNull(), F.least(a, b))
    if op == "max":
        return F.greatest(a, b)  # numpy.fmax: genuinely NaN-ignoring
    if op in COMPARISONS:
        cmp = {
            "=": a == b, "==": a == b, "eq": a == b,
            "<": a < b, "lt": a < b,
            ">": a > b, "gt": a > b,
            "<=": a <= b, "≤": a <= b, "le": a <= b,
            ">=": a >= b, "≥": a >= b, "ge": a >= b,
            "!=": a != b, "≠": a != b, "ne": a != b,
        }[op]
        if op in ("!=", "≠", "ne"):
            # numpy.not_equal: NaN != x is TRUE — a missing operand
            # makes the pair unequal (reference operations.py:160-188)
            return F.when(a.isNull() | b.isNull(), F.lit(1.0)).otherwise(
                F.when(cmp, F.lit(1.0)).otherwise(F.lit(0.0))
            )
        # all other numpy comparisons with NaN are False -> 0.0, never NULL
        return F.when(cmp, F.lit(1.0)).otherwise(F.lit(0.0))
    raise ValueError(f"unknown binary operator {op!r}")


def _unary_col(op: str, a: Column) -> Column:
    fns = {
        "abs": F.abs, "absolute": F.abs,
        "neg": lambda c: -c, "negative": lambda c: -c,
        "cos": F.cos, "sin": F.sin, "tan": F.tan,
        "floor": F.floor, "ceil": F.ceil,
    }
    return fns[op](a).cast("double")


# --- cross-series (row-wise) nan-aware kernels (operations.py:26-36) ------

def _row_arr(cols: Sequence[str]) -> Column:
    return F.filter(F.array(*[F.col(c) for c in cols]), lambda x: x.isNotNull())


def row_aggregate(agg: str, cols: Sequence[str]) -> Column:
    """NaN-aware aggregation across the series axis for one timestamp."""
    arr = _row_arr(cols)
    n = F.size(arr)
    s = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    if agg == "sum":
        return s  # nansum: all-NaN row -> 0.0
    empty = n == 0
    if agg == "mean":
        return F.when(~empty, s / n)
    if agg == "count":
        return n.cast("double")
    if agg == "min":
        return F.array_min(arr)
    if agg == "max":
        return F.array_max(arr)
    if agg in ("std", "var"):
        # numpy.nanstd/nanvar default ddof=0 (population)
        mean = s / n
        ssd = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean))
        var = ssd / n
        out = var if agg == "var" else F.sqrt(var)
        return F.when(~empty, out)
    if agg == "median":
        return _interp_percentile(F.array_sort(arr), F.lit(0.5))
    raise ValueError(f"unsupported cross-series aggregation {agg!r}")


def _interp_percentile(sorted_arr: Column, q: Column) -> Column:
    """Linear-interpolated percentile over a sorted array (numpy
    'linear' mode, matching carbonara.py:197-210)."""
    n = F.size(sorted_arr)
    pos = (n - 1).cast("double") * q
    lo = F.floor(pos).cast("int")
    hi = F.ceil(pos).cast("int")
    vlo = F.element_at(sorted_arr, lo + 1)
    vhi = F.element_at(sorted_arr, hi + 1)
    return F.when(n > 0, vlo + (vhi - vlo) * (pos - lo.cast("double")))


# --- evaluator -------------------------------------------------------------


def evaluate(node, frame: SeriesFrame):
    """Evaluate an AST node against a SeriesFrame.

    Returns either a python number (scalar node) or a SeriesFrame whose
    ``cols`` hold the resulting series.
    """
    if isinstance(node, numbers.Number):
        return node
    if not isinstance(node, (list, tuple)) or not node:
        raise ValueError(f"malformed operation node: {node!r}")
    op = node[0]
    if op == "metric":
        return _handle_metric(node, frame)
    if op in ("aggregate", "rolling", "resample"):
        return _handle_aggregation_operator(node, frame)
    if op == "clip":
        return _handle_clip(node, frame)
    if op in BINARY:
        return _handle_binary(node, frame)
    if op in UNARY:
        return _handle_unary(node, frame)
    raise ValueError(f"operation node tree is malformed: {node!r}")


def _handle_metric(node, frame: SeriesFrame) -> SeriesFrame:
    # ["metric", "ref"] / ["metric", ["ref1"], ["ref2"]] — refs select
    # columns of the aligned frame (operations.py:355-362).  Ref leaves
    # are (metric, aggregation) pairs in the reference; align_series
    # labels already encode that pairing.
    if isinstance(node[1], (list, tuple)):
        labels = ["/".join(map(str, r)) if isinstance(r, (list, tuple)) else str(r) for r in node[1:]]
    else:
        labels = ["/".join(map(str, node[1:]))]
    missing = [label for label in labels if label not in frame.cols]
    if missing:
        raise KeyError(f"unknown series reference(s) {missing!r}; have {frame.cols!r}")
    return replace(frame, cols=labels)


def _broadcast(op, a: SeriesFrame, b: SeriesFrame):
    if len(a.cols) == len(b.cols):
        return list(zip(a.cols, b.cols))
    if len(a.cols) == 1:
        return [(a.cols[0], c) for c in b.cols]
    if len(b.cols) == 1:
        return [(c, b.cols[0]) for c in a.cols]
    raise UnAggregableTimeseries(
        f"operands of {op!r} have incompatible series counts "
        f"({len(a.cols)} vs {len(b.cols)})"
    )


def _merge_axes(op: str, a: SeriesFrame, b: SeriesFrame) -> tuple[SeriesFrame, SeriesFrame]:
    """Two operand frames must share a time axis (operations.py:170-176).
    Same axis id -> same df, nothing to do.  Different axes -> verify the
    timestamp sets are identical via a full outer join; any one-sided
    row means different axes -> UnAggregableTimeseries."""
    if a.axis == b.axis:
        return a, b
    keys = [*a.partition_cols, "ts"]
    left = a.df.select(*keys, *[F.col(c) for c in a.cols])
    right = b.df.select(*keys, *[F.col(c) for c in b.cols])
    # disambiguate clashing column names
    rmap = {c: f"__r_{c}" for c in b.cols}
    for c, rc in rmap.items():
        right = right.withColumnRenamed(c, rc)
    joined = left.withColumn("__l", F.lit(1)).join(
        right.withColumn("__rr", F.lit(1)), on=keys, how="full_outer"
    )
    bad = joined.where(F.col("__l").isNull() | F.col("__rr").isNull()).limit(1).count()
    if bad:
        raise UnAggregableTimeseries(
            f"Can't compute timeseries with different granularity/timestamps in {op!r}"
        )
    df = joined.drop("__l", "__rr")
    na = replace(a, df=df)
    nb = SeriesFrame(
        df=df,
        cols=[rmap[c] for c in b.cols],
        axis=na.axis,
        partition_cols=b.partition_cols,
        is_aggregated=b.is_aggregated,
    )
    nb.axis = na.axis
    return na, nb


_GEN = [0]


def _newcol() -> str:
    _GEN[0] += 1
    return f"__op{_GEN[0]}"


def _handle_binary(node, frame: SeriesFrame):
    op = node[0]
    a = evaluate(node[1], frame)
    # Same-axis column additions are pure projections, so the right
    # operand evaluates against the frame the left one accumulated —
    # otherwise each side's computed columns would live on sibling
    # DataFrames and the combining expression couldn't see both.
    env = frame
    if isinstance(a, SeriesFrame) and a.axis == frame.axis:
        env = replace(frame, df=a.df)
    b = evaluate(node[2], env)
    if isinstance(a, numbers.Number) and isinstance(b, numbers.Number):
        import numpy

        return float(_numpy_binary(op, a, b))
    if isinstance(a, numbers.Number):
        base, cols = b, [(None, c) for c in b.cols]
        mk = lambda _, c: _binary_col(op, F.lit(float(a)), F.col(c))
        agg = b.is_aggregated
    elif isinstance(b, numbers.Number):
        base, cols = a, [(c, None) for c in a.cols]
        mk = lambda c, _: _binary_col(op, F.col(c), F.lit(float(b)))
        agg = a.is_aggregated
    else:
        if a.axis == b.axis:
            # b was evaluated on top of a's df, so b.df sees both col sets
            a = replace(a, df=b.df)
        else:
            a, b = _merge_axes(op, a, b)
        base = replace(a, df=a.df)
        cols = _broadcast(op, a, b)
        mk = lambda ca, cb: _binary_col(op, F.col(ca), F.col(cb))
        agg = True
    out_cols = []
    df = base.df
    for ca, cb in cols:
        name = _newcol()
        df = df.withColumn(name, mk(ca, cb))
        out_cols.append(name)
    return replace(base, df=df, cols=out_cols, is_aggregated=agg)


def _numpy_binary(op, a, b):
    import numpy

    fns = {
        "+": numpy.add, "add": numpy.add, "-": numpy.subtract, "sub": numpy.subtract,
        "*": numpy.multiply, "×": numpy.multiply, "mul": numpy.multiply,
        "/": numpy.true_divide, "÷": numpy.true_divide, "div": numpy.true_divide,
        "**": numpy.power, "^": numpy.power, "pow": numpy.power,
        "%": numpy.mod, "mod": numpy.mod, "max": numpy.fmax,
    }
    if op in fns:
        return fns[op](a, b)
    if op in COMPARISONS:
        return float(_binary_py_cmp(op, a, b))
    raise ValueError(op)


def _binary_py_cmp(op, a, b):
    import operator

    m = {"=": operator.eq, "==": operator.eq, "eq": operator.eq, "<": operator.lt,
         "lt": operator.lt, ">": operator.gt, "gt": operator.gt, "<=": operator.le,
         "≤": operator.le, "le": operator.le, ">=": operator.ge, "≥": operator.ge,
         "ge": operator.ge, "!=": operator.ne, "≠": operator.ne, "ne": operator.ne}
    return m[op](a, b)


def _handle_clip(node, frame: SeriesFrame):
    # ["clip", expr, lo, hi] — numpy.clip (operations.py:191-229)
    a = evaluate(node[1], frame)
    if not isinstance(a, SeriesFrame):
        raise ValueError("clip requires a series operand")
    env = replace(frame, df=a.df) if a.axis == frame.axis else a
    lo = evaluate(node[2], env) if len(node) > 2 else None
    if isinstance(lo, SeriesFrame) and lo.axis == env.axis:
        env = replace(env, df=lo.df)
    hi = evaluate(node[3], env) if len(node) > 3 else None
    if isinstance(hi, SeriesFrame) and hi.axis == env.axis:
        env = replace(env, df=hi.df)
    df, out_cols = env.df, []
    for c in a.cols:
        col = F.col(c)
        if lo is not None:
            col = F.greatest(col, F.lit(float(lo)) if isinstance(lo, numbers.Number) else F.col(lo.cols[0]))
        if hi is not None:
            col = F.least(col, F.lit(float(hi)) if isinstance(hi, numbers.Number) else F.col(hi.cols[0]))
        name = _newcol()
        # numpy.clip(NaN) is NaN, but Spark greatest/least skip NULLs —
        # propagate the missing-value marker explicitly
        df = df.withColumn(name, F.when(F.col(c).isNotNull(), col))
        out_cols.append(name)
    return replace(a, df=df, cols=out_cols)


def _handle_unary(node, frame: SeriesFrame):
    op = node[0]
    a = evaluate(node[1], frame)
    if not isinstance(a, SeriesFrame):
        raise ValueError(f"unary {op!r} requires a series operand")
    if op == "rateofchange":
        return _diff(a, drop_first=True, per_second=False)
    if op == "rateofchangesec":
        return _diff(a, drop_first=False, per_second=True)
    df, out_cols = a.df, []
    for c in a.cols:
        name = _newcol()
        df = df.withColumn(name, _unary_col(op, F.col(c)))
        out_cols.append(name)
    return replace(a, df=df, cols=out_cols)


def _diff(a: SeriesFrame, drop_first: bool, per_second: bool) -> SeriesFrame:
    if a.partition_cols:
        w = a.window()
        df = a.df.withColumn("__lag_ts", F.lag(F.col("ts")).over(w))
        lag_ts, names = "__lag_ts", {}
        for c in a.cols:
            n = f"__lagp_{c}"
            df = df.withColumn(n, F.lag(F.col(c)).over(w))
            names[c] = n
    else:
        # ungrouped: banded lag instead of a global-sort window
        from gnocchi_spark.operators.banding import banded_lag

        df, names, lag_ts = banded_lag(a.df, list(a.cols))
    dt = (F.unix_micros(F.col("ts")) - F.unix_micros(F.col(lag_ts))) / 1_000_000.0
    out_cols = []
    for c in a.cols:
        name = _newcol()
        d = F.col(c) - F.col(names[c])
        df = df.withColumn(name, d / dt if per_second else d)
        out_cols.append(name)
    if drop_first:
        # exactly the (per-group) first timestamp has no predecessor
        df = df.where(F.col(lag_ts).isNotNull())
    df = df.drop(lag_ts, *names.values())
    if drop_first:
        return SeriesFrame(df=df, cols=out_cols, partition_cols=a.partition_cols,
                           is_aggregated=a.is_aggregated)
    return replace(a, df=df, cols=out_cols)


def _handle_aggregation_operator(node, frame: SeriesFrame):
    op, agg = node[0], node[1]
    sub = evaluate(node[-1], frame)
    if not isinstance(sub, SeriesFrame):
        raise ValueError(f"{op!r} requires a series operand")
    rate = agg.startswith("rate:")
    base_agg = agg[5:] if rate else agg
    if op == "aggregate":
        name = _newcol()
        df = sub.df.withColumn(name, row_aggregate(base_agg, sub.cols))
        out = replace(sub, df=df, cols=[name], is_aggregated=True)
        return _diff(out, drop_first=True, per_second=False) if rate else out
    if op == "rolling":
        window = int(node[2])
        return _rolling(sub, base_agg, window, rate)
    if op == "resample":
        sampling = node[2]
        return _resample(sub, agg, sampling)
    raise ValueError(op)


def _rolling_expr(agg: str, col: Column, w) -> Column:
    if agg == "mean":
        return F.avg(col).over(w)
    if agg == "sum":
        return F.coalesce(F.sum(col).over(w), F.lit(0.0))  # nansum
    if agg == "min":
        return F.min(col).over(w)
    if agg == "max":
        return F.max(col).over(w)
    if agg == "count":
        return F.count(col).over(w).cast("double")
    if agg in ("std", "var"):
        return F.var_pop(col).over(w) if agg == "var" else F.sqrt(F.var_pop(col).over(w))
    if agg == "median":
        return _interp_percentile(F.array_sort(F.collect_list(col).over(w)), F.lit(0.5))
    raise ValueError(f"unsupported rolling aggregation {agg!r}")


def _rolling(a: SeriesFrame, agg: str, window: int, rate: bool) -> SeriesFrame:
    """Trailing row-count window; output starts at point window-1
    (operations.py:243-261).  The window kernels are nan-aware, so nulls
    inside the window are skipped, and the window is over the global
    time axis (rows), not non-null points.

    Ungrouped frames avoid the global sort: rows get a banded global row
    number, are chunked by row number (every chunk except the last holds
    exactly R rows because row numbers are dense), and each chunk's last
    window-1 rows are replicated into the next chunk as halo context —
    the trailing window then runs per chunk, fully parallel."""
    k = window - 1
    if a.partition_cols:
        w = a.window().rowsBetween(-k, 0)
        df, out_cols = a.df, []
        for c in a.cols:
            name = _newcol()
            df = df.withColumn(name, _rolling_expr(agg, F.col(c), w))
            out_cols.append(name)
        df = df.withColumn("__rn", F.row_number().over(a.window()))
        df = df.where(F.col("__rn") >= window).drop("__rn")
    else:
        from gnocchi_spark.operators.banding import banded_row_number

        chunk_rows = max(4096, 4 * window)
        df = banded_row_number(a.df, ts_col="ts")
        df = df.withColumn(
            "__chunk", F.floor((F.col("__rn") - 1) / F.lit(chunk_rows))
        ).withColumn("__halo", F.lit(False))
        if k > 0:
            halo = (
                df.where(((F.col("__rn") - 1) % chunk_rows) >= chunk_rows - k)
                .withColumn("__chunk", F.col("__chunk") + 1)
                .withColumn("__halo", F.lit(True))
            )
            df = df.unionByName(halo)
        w = (
            Window.partitionBy("__chunk")
            .orderBy(F.col("__rn").asc())
            .rowsBetween(-k, 0)
        )
        out_cols = []
        for c in a.cols:
            name = _newcol()
            df = df.withColumn(name, _rolling_expr(agg, F.col(c), w))
            out_cols.append(name)
        df = df.where(~F.col("__halo") & (F.col("__rn") >= window)).drop(
            "__chunk", "__halo", "__rn"
        )
    out = SeriesFrame(df=df, cols=out_cols, partition_cols=a.partition_cols,
                      is_aggregated=a.is_aggregated)
    return _diff(out, drop_first=True, per_second=False) if rate else out


def _resample(a: SeriesFrame, agg: str, sampling: float | str) -> SeriesFrame:
    """Per-series re-bucketing with the carbonara kernels
    (operations.py:264-280): sample std, interpolated percentiles,
    first/last by time order."""
    from gnocchi_spark.policy import parse_method

    base, rate_base, pct = parse_method(agg if not agg.startswith("rate:") else agg[5:])
    bucket = truncate_to_bucket(F.col("ts"), sampling).alias("ts")
    aggs = []
    out_cols = []
    for c in a.cols:
        name = _newcol()
        col = F.col(c)
        if base == "mean":
            e = F.avg(col)
        elif base == "sum":
            e = F.sum(col)
        elif base == "min":
            e = F.min(col)
        elif base == "max":
            e = F.max(col)
        elif base == "count":
            e = F.count(col).cast("double")
        elif base == "std":
            e = F.when(F.count(col) > 1, F.stddev_samp(col))
        elif base == "var":
            e = F.var_pop(col)
        elif base == "median":
            e = F.percentile(col, F.lit(0.5))
        elif base == "pct":
            e = F.percentile(col, F.lit(pct))
        elif base == "first":
            e = F.min_by(col, F.when(col.isNotNull(), F.col("ts")))
        elif base == "last":
            e = F.max_by(col, F.when(col.isNotNull(), F.col("ts")))
        else:
            raise ValueError(f"unsupported resample aggregation {agg!r}")
        aggs.append(e.alias(name))
        out_cols.append(name)
    df = a.df.groupBy(*a.partition_cols, bucket).agg(*aggs)
    return SeriesFrame(df=df, cols=out_cols, partition_cols=a.partition_cols,
                       is_aggregated=a.is_aggregated)


def evaluate_to_long(
    node,
    frame: SeriesFrame,
    granularity: float | str,
    fill=None,
) -> DataFrame:
    """Evaluate and shape like the REST output (processor.py:229-272):
    long rows (ts, granularity, series, value); with dropna-family fills
    NULL/NaN/inf output rows are removed (processor.py:237-244)."""
    res = evaluate(node, frame)
    if isinstance(res, numbers.Number):
        raise ValueError("operation tree evaluates to a scalar, not a series")
    pairs = ", ".join(f"'{c}', `{c}`" for c in res.cols)
    out = res.df.select(
        *res.partition_cols,
        "ts",
        F.expr(f"stack({len(res.cols)}, {pairs}) as (series, value)"),
    )
    if fill in ("dropna", "ffill", "bfill", "full_ffill", "full_bfill"):
        out = out.where(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & (F.abs(F.col("value")) != float("inf"))
        )
    from gnocchi_spark.functions.timeutil import granularity_label

    return out.select(
        *res.partition_cols,
        "ts",
        F.lit(granularity_label(granularity)).alias("granularity"),
        "series",
        "value",
    )

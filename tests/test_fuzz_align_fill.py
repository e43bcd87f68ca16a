"""Property-based differential fuzzing of the alignment / fill /
needed-overlap axis and the calendar + pct/first/last resample kernels
(r12, VERDICT r11 next #3 — the last unfuzzed compiler paths).

Two suites, both with the independent-translation discipline (the
oracle is written from the REFERENCE semantics, never derived from the
compiler under test; ``derandomize=True`` keeps them deterministic
gates):

1. ``align_series`` (operators/align.py): random 2-3 series over a
   shared tick grid with random gaps, every fill mode
   (constant / null / dropna / ffill / bfill / full_ffill /
   full_bfill / None), needed_overlap percentages including 0 and 100,
   and start/stop bounds that are unset, on-grid, off-grid, or
   inverted.  Oracle: the value grid and directional fills are
   computed by DuckDB (IGNORE NULLS windows; ``full_*`` =
   coalesce of the two directional fills, the exact composition of
   utils.forward_fill/backward_fill); the fill=None
   needed-percent-of-overlap enforcement and unbounded-edge trim are a
   line-by-line transcription of processor.py:200-220 over the
   DuckDB grid, including: 'No overlap' raised whenever the overlap
   set is empty and needed > 0 (even on an empty grid), the tail trim
   before the head trim, and the percent computed as
   overlap.size / trimmed-times.size.  Window semantics per
   processor.py:154-160: start floored to the granularity and
   inclusive, stop EXCLUSIVE.  This fuzz pinned two real divergences:
   align_series compared ``stop`` inclusively, and exempted empty
   grids from the No-overlap raise.

2. The ``resample`` form of the operations DSL over calendar
   granularities Y/H/Q/M/W/D (gnocchi/calendar.py:19-100 — half-year
   from month arithmetic, Sunday-start weeks, NOT ISO) and a fixed
   multi-day width, with the full kernel set including the previously
   unfuzzed pct / first / last (carbonara.py:594-616).  Exactness:
   grid values are dyadic, and the fuzzed percentile ranks are the
   dyadic 25/50/75pct, so linear interpolation is exact in both
   engines and comparison is bit-for-bit.  WAIVER: non-dyadic ranks
   (e.g. 95pct) interpolate with engine-divergent last-ulp rounding
   and stay covered by their oracle-checked gate queries
   (tsdb_rollup_pct_1d) at rounded precision instead.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest
# Extended fuzz/property-hunt tier (r13): excluded from the default
# fast run so the driver verify gate finishes; the full-tier gate
# (-m "slow or not slow") still runs it.
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gnocchi_spark.operators.align import UnAggregableTimeseries, align_series
from gnocchi_spark.plans.operations import SeriesFrame, evaluate

# =============================================================================
# Suite 1: align / fill / overlap
# =============================================================================

BASE = datetime.datetime(2026, 4, 1, 0, 0, 0)
G_S = 3600.0
VALUES = [-3.5, -1.0, 0.0, 0.5, 2.25, 4.0]
LABELS = ["s1", "s2", "s3"]


def _hour(h: int) -> datetime.datetime:
    return BASE + datetime.timedelta(hours=h)


def _half(k: int) -> datetime.datetime:
    return BASE + datetime.timedelta(seconds=k * 1800)


@st.composite
def align_cases(draw):
    n_series = draw(st.integers(2, 3))
    series = {}
    for lab in LABELS[:n_series]:
        hours = draw(
            st.lists(st.integers(0, 11), min_size=0, max_size=8, unique=True)
        )
        series[lab] = [(_hour(h), draw(st.sampled_from(VALUES))) for h in hours]
    fill = draw(
        st.sampled_from(
            [None, "null", "dropna", "ffill", "bfill", "full_ffill",
             "full_bfill", 0.0, -1.5, 2.5]
        )
    )
    needed = draw(st.sampled_from([0.0, 25.0, 50.0, 66.6, 100.0]))
    # bounds on a half-hour grid: unset, on-bucket, off-bucket, inverted
    start_k = draw(st.one_of(st.none(), st.integers(0, 24)))
    stop_k = draw(st.one_of(st.none(), st.integers(0, 24)))
    start = _half(start_k) if start_k is not None else None
    stop = _half(stop_k) if stop_k is not None else None
    return series, fill, needed, start, stop


def _fill_sql(lab: str, fill) -> str:
    ff = (
        f"last_value({lab} IGNORE NULLS) OVER "
        f"(ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    bf = (
        f"first_value({lab} IGNORE NULLS) OVER "
        f"(ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )
    if isinstance(fill, (int, float)):
        return f"coalesce({lab}, {float(fill)!r})"
    if fill == "ffill":
        return ff
    if fill == "bfill":
        return bf
    if fill == "full_ffill":
        # forward_fill then backward_fill == bfill only of the leading gap
        return f"coalesce({ff}, {bf})"
    if fill == "full_bfill":
        return f"coalesce({bf}, {ff})"
    return lab  # null / dropna / None: raw grid


def _oracle_grid(con, series, labels, fill, start_eff, stop):
    con.execute("DROP TABLE IF EXISTS long")
    con.execute("CREATE TABLE long (series VARCHAR, ts TIMESTAMP, value DOUBLE)")
    rows = [(lab, t, v) for lab, pts in series.items() for t, v in pts]
    if rows:
        con.executemany("INSERT INTO long VALUES (?,?,?)", rows)
    conds = []
    if start_eff is not None:
        conds.append(f"ts >= TIMESTAMP '{start_eff.isoformat(sep=' ')}'")
    if stop is not None:
        conds.append(f"ts < TIMESTAMP '{stop.isoformat(sep=' ')}'")
    where = f"WHERE {' AND '.join(conds)}" if conds else ""
    pivots = ", ".join(
        f"max(CASE WHEN series = '{lab}' THEN value END) AS {lab}"
        for lab in labels
    )
    fills = ", ".join(f"{_fill_sql(lab, fill)} AS {lab}" for lab in labels)
    return con.execute(
        f"WITH win AS (SELECT * FROM long {where}), "
        f"grid AS (SELECT ts, {pivots} FROM win GROUP BY ts) "
        f"SELECT ts, {fills} FROM grid ORDER BY ts"
    ).fetchall()


def _reference_overlap(times, grids, needed, start, stop):
    """processor.py:200-220 transcription.  ``grids`` is a list of
    per-label value lists aligned to ``times``.  Returns the surviving
    row indices or raises."""
    overlap = [
        i for i in range(len(times)) if all(g[i] is not None for g in grids)
    ]
    if not overlap and needed > 0:
        raise UnAggregableTimeseries("No overlap")
    lo, hi = 0, len(times)
    if times:
        if stop is None and overlap:
            hi = overlap[-1] + 1
        if start is None and overlap:
            lo = overlap[0]
        n_times = hi - lo
        pct = len(overlap) * 100.0 / n_times
        if pct < needed:
            raise UnAggregableTimeseries(
                f"Less than {needed}% of datapoints overlap ({pct:.2f}%)"
            )
    return list(range(lo, hi))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


@settings(
    max_examples=120,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=align_cases())
def test_align_fill_overlap_matches_reference(spark, con, case):
    series, fill, needed, start, stop = case
    labels = sorted(series)

    frames = {
        lab: spark.createDataFrame(pts, "ts timestamp, value double")
        for lab, pts in series.items()
    }

    # reference slice: start floored to the granularity, stop exclusive
    start_eff = None
    if start is not None:
        us = int(start.timestamp() * 1_000_000)
        g_us = int(G_S * 1_000_000)
        start_eff = datetime.datetime.utcfromtimestamp((us // g_us) * g_us / 1e6)

    grid = _oracle_grid(con, series, labels, fill, start_eff, stop)
    times = [r[0] for r in grid]
    grids = [[r[1 + j] for r in grid] for j in range(len(labels))]

    want_exc = None
    keep = range(len(times))
    if fill is None:
        try:
            keep = _reference_overlap(times, grids, needed, start, stop)
        except UnAggregableTimeseries as e:
            want_exc = str(e)
    want = [
        (times[i], *[g[i] for g in grids]) for i in keep
    ] if want_exc is None else None

    got_exc = None
    got = None
    try:
        out = align_series(
            frames, fill=fill, needed_overlap=needed, start=start, stop=stop,
            granularity_s=G_S,
        )
        got = [tuple(r) for r in out.select("ts", *labels).orderBy("ts").collect()]
    except UnAggregableTimeseries as e:
        got_exc = str(e)

    ctx = f"fill={fill!r} needed={needed} start={start} stop={stop}\nseries={series}"
    if want_exc is not None:
        assert got_exc is not None, f"oracle raised ({want_exc}), spark returned {got}\n{ctx}"
        kind = "No overlap" if "No overlap" in want_exc else "Less than"
        assert kind in got_exc, f"exception kind mismatch: {got_exc!r} vs {want_exc!r}\n{ctx}"
    else:
        assert got_exc is None, f"spark raised ({got_exc}), oracle returned\n{ctx}"
        assert got == want, f"spark={got}\noracle={want}\n{ctx}"


# =============================================================================
# Suite 2: calendar + pct/first/last resample kernels
# =============================================================================

_T0 = datetime.datetime(2023, 11, 15, 4, 0, 0)
_STEP = datetime.timedelta(hours=173)  # ~7.2 days: crosses W/M/Q/H/Y bounds
_C1 = [1.0, None, -2.5, 4.0, 0.5, 3.0, None, -0.5, 2.0, 1.5,
       0.0, -3.5, 2.5, None, 1.0, 4.5, -1.5, 0.5, None, 3.5,
       2.0, -4.0, 1.25, 0.75, None, 2.25, -0.25, 5.0, 1.0, 0.5,
       -2.0, 3.25, None, 1.75, 0.25, -1.25, 4.25, 2.75, None, 0.0]
_C2 = [0.5, 2.0, None, -1.0, 3.5, 0.25, 1.5, None, -2.25, 4.0,
       1.0, 0.75, None, 2.5, -0.75, 3.0, None, 1.25, 0.5, -3.0,
       2.75, None, 0.25, 4.5, 1.5, -0.5, 3.75, None, 2.25, 0.0,
       1.0, -1.75, 4.75, None, 0.5, 2.0, -2.5, 3.25, 1.25, None]
_NPTS = len(_C1)


@pytest.fixture(scope="module")
def cal_frame(spark):
    rows = [(_T0 + i * _STEP, _C1[i], _C2[i]) for i in range(_NPTS)]
    df = spark.createDataFrame(rows, "ts timestamp, m1 double, m2 double").cache()
    return SeriesFrame(df=df, cols=["m1", "m2"])


@pytest.fixture(scope="module")
def cal_con():
    c = duckdb.connect()
    c.execute("CREATE TABLE cal (ts TIMESTAMP, m1 DOUBLE, m2 DOUBLE)")
    c.executemany(
        "INSERT INTO cal VALUES (?,?,?)",
        [(_T0 + i * _STEP, _C1[i], _C2[i]) for i in range(_NPTS)],
    )
    yield c
    c.close()


def _bucket_sql(gran) -> str:
    """Calendar bucket starts per gnocchi/calendar.py:19-100."""
    if isinstance(gran, (int, float)):
        secs = int(gran)
        return (
            f"make_timestamp(CAST(floor(epoch(ts) / {secs}) AS BIGINT)"
            f" * {secs} * 1000000)"
        )
    # date_trunc on DATE-precision fields returns DATE in DuckDB; cast
    # back so the Python rows carry datetimes like the Spark side
    return {
        "Y": "CAST(date_trunc('year', ts) AS TIMESTAMP)",
        "Q": "CAST(date_trunc('quarter', ts) AS TIMESTAMP)",
        "M": "CAST(date_trunc('month', ts) AS TIMESTAMP)",
        "D": "CAST(date_trunc('day', ts) AS TIMESTAMP)",
        # half_and_year (calendar.py:81-84): Jan 1 or Jul 1
        "H": "make_timestamp(CAST(year(ts) AS BIGINT), "
             "((month(ts) - 1) // 6) * 6 + 1, 1, 0, 0, 0.0)",
        # week_and_year (calendar.py:40-44): Sunday-start weeks
        "W": "CAST(CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER)"
             " AS TIMESTAMP)",
    }[gran]


_KERNEL_SQL = {
    "mean": "avg({c})",
    "sum": "sum({c})",
    "min": "min({c})",
    "max": "max({c})",
    "count": "CAST(count({c}) AS DOUBLE)",
    "std": "(CASE WHEN count({c}) > 1 THEN stddev_samp({c}) END)",
    "median": "CAST(quantile_cont({c}, 0.5) AS DOUBLE)",
    "25pct": "CAST(quantile_cont({c}, 0.25) AS DOUBLE)",
    "50pct": "CAST(quantile_cont({c}, 0.5) AS DOUBLE)",
    "75pct": "CAST(quantile_cont({c}, 0.75) AS DOUBLE)",
    # first/last by time order among non-null values (carbonara first/last)
    "first": "arg_min({c}, CASE WHEN {c} IS NOT NULL THEN ts END)",
    "last": "arg_max({c}, CASE WHEN {c} IS NOT NULL THEN ts END)",
}

_EXACT_KERNELS = {"sum", "min", "max", "count", "first", "last",
                  "25pct", "50pct", "75pct", "median"}

_INNERS = [
    (["metric", "m1"], ["m1"]),
    (["metric", "m2"], ["m2"]),
    (["metric", ["m1"], ["m2"]], ["m1", "m2"]),
    (["+", ["metric", "m1"], 1.0], ["(m1 + 1.0)"]),
    (["clip", ["metric", ["m1"], ["m2"]], -1.0, 3.0],
     ["(CASE WHEN m1 IS NOT NULL THEN least(greatest(m1, -1.0), 3.0) END)",
      "(CASE WHEN m2 IS NOT NULL THEN least(greatest(m2, -1.0), 3.0) END)"]),
]


def _close(x, y) -> bool:
    if x is None or y is None:
        return x is None and y is None
    if math.isnan(x) or math.isnan(y):
        return math.isnan(x) and math.isnan(y)
    return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)


@settings(
    max_examples=120,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    agg=st.sampled_from(sorted(_KERNEL_SQL)),
    gran=st.sampled_from(["Y", "H", "Q", "M", "W", "D", 259200]),
    inner_i=st.integers(0, len(_INNERS) - 1),
)
def test_calendar_resample_matches_duckdb(spark, cal_frame, cal_con, agg, gran, inner_i):
    inner_ast, inner_sqls = _INNERS[inner_i]
    ast = ["resample", agg, gran, inner_ast]
    out = evaluate(ast, cal_frame)
    got = [
        tuple(r) for r in out.df.select("ts", *out.cols).orderBy("ts").collect()
    ]

    exprs = ", ".join(
        f"{_KERNEL_SQL[agg].format(c=e)} AS v{i}"
        for i, e in enumerate(inner_sqls)
    )
    want = cal_con.execute(
        f"SELECT {_bucket_sql(gran)} AS b, {exprs} FROM cal GROUP BY 1 ORDER BY 1"
    ).fetchall()

    assert len(got) == len(want), f"rows {len(got)} vs {len(want)} agg={agg} gran={gran}"
    exact = agg in _EXACT_KERNELS
    for srow, orow in zip(got, want):
        assert srow[0] == orow[0], f"bucket {srow[0]} vs {orow[0]} agg={agg} gran={gran}"
        for j in range(1, len(inner_sqls) + 1):
            s, o = srow[j], orow[j]
            ok = (s == o or (s is None and o is None)) if exact else _close(s, o)
            assert ok, (
                f"bucket {srow[0]} col {j}: spark={s!r} oracle={o!r} "
                f"agg={agg} gran={gran} inner={inner_ast}"
            )

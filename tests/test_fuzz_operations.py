"""Property-based differential fuzzing of the operations-DSL compiler.

r10 VERDICT next #1 (second half): hypothesis generates random ops-DSL
programs — scalar and series operands through every binary/comparison
operator, the unary set, ``clip``/``clip_min``/``clip_max``,
cross-series ``aggregate`` kernels, trailing ``rolling`` windows and
``rateofchange``/``rateofchangesec`` — evaluates each against the
Spark compiler (plans/operations.py) AND against an independent
translation to DuckDB SQL over the same grid, asserting row-for-row
equality.

The SQL translation is written from the REFERENCE semantics
(gnocchi/rest/aggregates/operations.py:58-280), not from the compiler
under test: numpy divisor-sign ``%``, NaN-comparisons -> 0.0 (and
``!=`` of a missing operand -> 1.0), nan-aware cross-series kernels
over a null-filtered list, nansum -> 0.0 on an all-null row, rolling
output starting at point window-1, rateofchange dropping exactly the
first timestamp.

The top-level time-operator chain also covers ``resample`` (the
carbonara re-bucket kernels mean/sum/min/max/count/std/median, r11
extension) and the ``rate:<agg>`` aggregate variant (collapse then
first-row-dropping diff); the remaining resample kernels (pct,
first/last row-order) are covered by their oracle-checked gate
queries and the ingest-kernel property tests.

Float discipline: comparison operators are generated only over
EXACTLY-reproducible subtrees (grid values are multiples of 0.5, and
+,-,*,/,%,pow,min/max/clip/abs/neg/floor/ceil are correctly-rounded
IEEE ops that yield bit-identical doubles in both engines), because a
comparison over an engine-divergent last-ulp (trig, mean/std/median
kernels) would flip discretely.  Everything else is compared with a
1e-9 relative tolerance.  ``derandomize=True`` keeps the suite a
deterministic gate.
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

from gnocchi_spark.plans.operations import SeriesFrame, evaluate

# --- fixture grid -----------------------------------------------------------

_T0 = datetime.datetime(2024, 1, 1)
# multiples of 0.5 (exact binary fractions) with scattered NULLs, zeros
# (divide/mod-by-zero -> NULL in BOTH engines, probed r11) and negatives
_M1 = [1.0, 2.5, None, 0.0, -3.5, 4.0, 1.5, None, 2.0, -0.5,
       3.0, 0.5, None, -2.0, 5.5, 1.0, 0.0, 2.5, None, -4.5]
_M2 = [None, 1.5, 2.0, -1.0, 0.5, None, 3.5, 2.0, 0.0, 4.5,
       -2.5, None, 1.0, 3.0, -0.5, 2.0, None, 0.5, 1.5, 3.5]
_M3 = [2.0, None, -1.5, 3.5, 1.0, 0.5, None, -3.0, 2.5, 0.0,
       4.0, 1.5, 2.0, None, 0.5, -1.0, 3.0, None, 2.0, 1.0]
_N = len(_M1)


@pytest.fixture(scope="module")
def grid_frame(spark):
    rows = [
        (_T0 + datetime.timedelta(hours=i), _M1[i], _M2[i], _M3[i])
        for i in range(_N)
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, m1 double, m2 double, m3 double"
    ).cache()
    return SeriesFrame(df=df, cols=["m1", "m2", "m3"])


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE grid (ts TIMESTAMP, m1 DOUBLE, m2 DOUBLE, m3 DOUBLE)"
    )
    con.executemany(
        "INSERT INTO grid VALUES (?,?,?,?)",
        [
            (_T0 + datetime.timedelta(hours=i), _M1[i], _M2[i], _M3[i])
            for i in range(_N)
        ],
    )
    yield con
    con.close()


# --- independent reference translation: AST -> DuckDB SQL -------------------
#
# Mirrors the REFERENCE interpreter's structure: a core expression tree
# is axis-preserving and translates to inline SQL expressions; rolling
# and rateofchange(sec) need window functions over computed operands,
# so they flush the current expressions into a CTE first.

_CMP_SQL = {
    "=": "=", "==": "=", "eq": "=", "<": "<", "lt": "<", ">": ">", "gt": ">",
    "<=": "<=", "≤": "<=", "le": "<=", ">=": ">=", "≥": ">=", "ge": ">=",
}
_NE = ("!=", "≠", "ne")
_ARITH = {
    "+": "+", "add": "+", "-": "-", "sub": "-", "*": "*", "×": "*", "mul": "*",
    "/": "/", "÷": "/", "div": "/",
}


def _bin_sql(op: str, a: str, b: str) -> str:
    if op in _ARITH:
        return f"(({a}) {_ARITH[op]} ({b}))"
    if op in ("**", "^", "pow"):
        return f"power({a}, {b})"
    if op in ("%", "mod"):
        # numpy.mod: sign follows the divisor
        return f"(((({a}) % ({b})) + ({b})) % ({b}))"
    if op == "max":
        return f"greatest({a}, {b})"  # both engines skip NULLs
    if op == "clip_min":
        return f"(CASE WHEN ({a}) IS NOT NULL THEN greatest({a}, {b}) END)"
    if op == "clip_max":
        return f"(CASE WHEN ({a}) IS NOT NULL THEN least({a}, {b}) END)"
    if op in _NE:
        # numpy not_equal: a missing operand makes the pair unequal
        return (
            f"(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN 1.0 "
            f"WHEN ({a}) != ({b}) THEN 1.0 ELSE 0.0 END)"
        )
    if op in _CMP_SQL:
        # numpy comparisons with NaN are False -> 0.0, never NULL
        return f"(CASE WHEN ({a}) {_CMP_SQL[op]} ({b}) THEN 1.0 ELSE 0.0 END)"
    raise ValueError(op)


def _unary_sql(op: str, a: str) -> str:
    m = {
        "abs": f"abs({a})", "absolute": f"abs({a})",
        "neg": f"(-({a}))", "negative": f"(-({a}))",
        "cos": f"cos({a})", "sin": f"sin({a})", "tan": f"tan({a})",
        "floor": f"CAST(floor({a}) AS DOUBLE)",
        "ceil": f"CAST(ceil({a}) AS DOUBLE)",
    }
    return m[op]


def _agg_sql(agg: str, exprs: list[str]) -> str:
    arr = f"list_filter([{', '.join(exprs)}], x -> x IS NOT NULL)"
    if agg == "sum":
        return f"coalesce(list_sum({arr}), 0.0)"  # nansum: all-null -> 0.0
    if agg == "mean":
        return f"list_avg({arr})"
    if agg == "count":
        return f"CAST(len({arr}) AS DOUBLE)"
    if agg == "min":
        return f"list_min({arr})"
    if agg == "max":
        return f"list_max({arr})"
    if agg == "var":
        return f"list_aggregate({arr}, 'var_pop')"
    if agg == "std":
        return f"sqrt(list_aggregate({arr}, 'var_pop'))"
    if agg == "median":
        return f"CAST(list_aggregate({arr}, 'quantile_cont', 0.5) AS DOUBLE)"
    raise ValueError(agg)


_ROLL_SQL = {
    "mean": "avg({c}) OVER {w}",
    "sum": "coalesce(sum({c}) OVER {w}, 0.0)",
    "min": "min({c}) OVER {w}",
    "max": "max({c}) OVER {w}",
    "count": "CAST(count({c}) OVER {w} AS DOUBLE)",
    "var": "var_pop({c}) OVER {w}",
    "std": "sqrt(var_pop({c}) OVER {w})",
    "median": "CAST(quantile_cont({c}, 0.5) OVER {w} AS DOUBLE)",
}


class _Translator:
    """Stacks CTEs; core nodes stay inline expressions, time operators
    (rolling / rateofchange / rateofchangesec) flush to a new CTE."""

    def __init__(self):
        self.ctes: list[str] = []
        self.rel = "grid"
        self.n = 0

    def _flush(self, exprs: list[str], qualify: str = "") -> list[str]:
        self.n += 1
        name = f"g{self.n}"
        cols = [f"c{i}" for i in range(len(exprs))]
        sel = ", ".join(f"{e} AS {c}" for e, c in zip(exprs, cols))
        self.ctes.append(
            f"{name} AS (SELECT ts, {sel} FROM {self.rel}{qualify})"
        )
        self.rel = name
        return cols

    def _diff_flush(self, cols: list[str]) -> list[str]:
        diffs = [f"({c} - lag({c}) OVER (ORDER BY ts))" for c in cols]
        return self._flush(
            diffs, qualify=" QUALIFY lag(ts) OVER (ORDER BY ts) IS NOT NULL"
        )

    def core(self, node) -> list[str]:
        if isinstance(node, (int, float)):
            return [repr(float(node))]
        op = node[0]
        if op == "metric":
            if isinstance(node[1], (list, tuple)):
                return [str(r[0]) for r in node[1:]]
            return [str(node[1])]
        if op == "aggregate":
            agg = node[1]
            if agg.startswith("rate:"):
                # rate: variant — nan-aware row collapse then time diff
                # dropping exactly the first row (operations.py:232-240)
                collapsed = [_agg_sql(agg[5:], self.core(node[2]))]
                return self._diff_flush(self._flush(collapsed))
            return [_agg_sql(agg, self.core(node[2]))]
        if op == "clip":
            sub = self.core(node[1])
            lo, hi = repr(float(node[2])), repr(float(node[3]))
            return [
                f"(CASE WHEN ({e}) IS NOT NULL THEN "
                f"least(greatest({e}, {lo}), {hi}) END)"
                for e in sub
            ]
        if op in ("rolling",):
            agg, k = node[1], int(node[2])
            sub = self.core(node[3])
            cols = self._flush(sub)
            w = f"(ORDER BY ts ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)"
            rolled = [_ROLL_SQL[agg].format(c=c, w=w) for c in cols]
            return self._flush(
                rolled,
                qualify=f" QUALIFY row_number() OVER (ORDER BY ts) >= {k}",
            )
        if op in ("rateofchange", "rateofchangesec"):
            sub = self.core(node[1])
            cols = self._flush(sub)
            if op == "rateofchange":
                return self._diff_flush(cols)
            lag_ts = "lag(ts) OVER (ORDER BY ts)"
            dt = f"((epoch_us(ts) - epoch_us({lag_ts})) / 1000000.0)"
            diffs = [
                f"((({c}) - lag({c}) OVER (ORDER BY ts)) / {dt})" for c in cols
            ]
            return self._flush(diffs)
        if op == "resample":
            # per-series re-bucket with the carbonara kernels
            # (reference operations.py:264-280): group-by on the
            # floored-epoch bucket, SQL aggregates are null-skipping
            # like the engine's
            agg, secs = node[1], int(node[2])
            cols = self._flush(self.core(node[3]))
            kern = {
                "mean": "avg({c})",
                "sum": "sum({c})",
                "min": "min({c})",
                "max": "max({c})",
                "count": "CAST(count({c}) AS DOUBLE)",
                "std": "(CASE WHEN count({c}) > 1 THEN stddev_samp({c}) END)",
                "median": "CAST(quantile_cont({c}, 0.5) AS DOUBLE)",
            }
            exprs = [kern[agg].format(c=c) for c in cols]
            self.n += 1
            name = f"g{self.n}"
            sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
            bucket = (
                f"make_timestamp(CAST(floor(epoch(ts) / {secs}) AS BIGINT)"
                f" * {secs} * 1000000)"
            )
            self.ctes.append(
                f"{name} AS (SELECT {bucket} AS ts, {sel} FROM {self.rel}"
                " GROUP BY 1)"
            )
            self.rel = name
            return [f"c{i}" for i in range(len(exprs))]
        if len(node) == 3:  # binary
            a, b = self.core(node[1]), self.core(node[2])
            if len(a) == len(b):
                pairs = list(zip(a, b))
            elif len(a) == 1:
                pairs = [(a[0], eb) for eb in b]
            else:
                pairs = [(ea, b[0]) for ea in a]
            return [_bin_sql(op, ea, eb) for ea, eb in pairs]
        return [_unary_sql(op, e) for e in self.core(node[1])]

    def sql(self, node) -> str:
        exprs = self.core(node)
        sel = ", ".join(f"{e} AS v{i}" for i, e in enumerate(exprs))
        with_ = f"WITH {', '.join(self.ctes)} " if self.ctes else ""
        return f"{with_}SELECT ts, {sel} FROM {self.rel} ORDER BY ts"


# --- hypothesis strategies ---------------------------------------------------
#
# Nodes carry (ast, width, exact): width 0 = scalar operand, 1/3 =
# series count; exact marks bit-identical-across-engines subtrees (the
# only ones comparisons may consume — see module docstring).

_SCALARS = [-2.5, -1.5, -1.0, 0.5, 1.0, 2.0, 3.0, 4.5]
_CMP_OPS = ["=", "==", "eq", "<", "lt", ">", "gt", "<=", "le", ">=", "ge",
            "!=", "ne", "≤", "≥", "≠"]
_ARITH_OPS = ["+", "add", "-", "sub", "*", "mul", "/", "div", "%", "mod",
              "max", "clip_min", "clip_max"]
_EXACT_UNARY = ["abs", "neg", "floor", "ceil"]
_TRIG_UNARY = ["cos", "sin", "tan"]
_EXACT_AGGS = ["sum", "min", "max", "count"]
_INEXACT_AGGS = ["mean", "std", "var", "median"]
_ROLL_AGGS = ["mean", "sum", "min", "max", "count", "std", "var", "median"]


def _scalar():
    return st.sampled_from(_SCALARS).map(lambda v: (v, 0, True))


def _metric1():
    return st.sampled_from(["m1", "m2", "m3"]).map(
        lambda m: (["metric", m], 1, True)
    )


def _metric3():
    return st.just((["metric", ["m1"], ["m2"], ["m3"]], 3, True))


def _combine_width(wa: int, wb: int) -> int:
    return max(wa, wb)


def _binary(children):
    def build(t):
        op, (a, wa, ea), (b, wb, eb) = t
        if wa == 0 and wb == 0:
            # scalar folding is numpy's job, not the compiler's — force
            # a series operand in
            a, wa, ea = ["metric", "m1"], 1, True
        if wa not in (0, wb) and wb not in (0, wa) and 1 not in (wa, wb):
            b, wb, eb = b, wb, eb  # unreachable with widths {0,1,3}
        if op in _CMP_OPS and not (ea and eb):
            op = "+"  # comparisons only over exactly-reproducible subtrees
        if op in ("**", "^", "pow"):
            b, wb, eb = 2.0, 0, True  # integer exponent: exact, no NaN
        return (
            [op, a, b],
            _combine_width(wa, wb),
            ea and eb,
        )

    return st.tuples(
        st.sampled_from(_ARITH_OPS + _CMP_OPS + ["pow"]),
        children,
        st.one_of(_scalar(), children),
    ).map(build)


def _unary(children):
    def build(t):
        op, (a, w, e) = t
        if w == 0:
            a, w, e = ["metric", "m2"], 1, True
        return ([op, a], w, e and op in _EXACT_UNARY)

    return st.tuples(
        st.sampled_from(_EXACT_UNARY + _TRIG_UNARY), children
    ).map(build)


def _clip(children):
    def build(t):
        (a, w, e), lo, hi = t
        if w == 0:
            a, w, e = ["metric", "m3"], 1, True
        return (["clip", a, lo, hi], w, e)

    return st.tuples(
        children, st.sampled_from(_SCALARS), st.sampled_from(_SCALARS)
    ).map(build)


def _aggregate(children):
    def build(t):
        agg, (a, w, e) = t
        if w != 3:
            a, w, e = ["metric", ["m1"], ["m2"], ["m3"]], 3, True
        return (["aggregate", agg, a], 1, e and agg in _EXACT_AGGS)

    return st.tuples(
        st.sampled_from(_EXACT_AGGS + _INEXACT_AGGS), children
    ).map(build)


def _core():
    return st.recursive(
        st.one_of(_metric1(), _metric3(), _scalar()),
        lambda c: st.one_of(_binary(c), _unary(c), _clip(c), _aggregate(c)),
        max_leaves=6,
    )


_RESAMPLE_AGGS = ["mean", "sum", "min", "max", "count", "std", "median"]
_RATE_AGGS = ["sum", "mean", "count"]


def _with_time_ops():
    def build(t):
        (a, w, e), ops = t
        if w == 0:
            a, w, e = ["metric", "m1"], 1, True
        for kind, agg, k in ops:
            if kind == "rolling":
                a = ["rolling", agg, k, a]
            elif kind == "resample":
                a = ["resample", agg, k, a]
            elif kind == "rate_aggregate":
                a, w = ["aggregate", f"rate:{agg}", a], 1
            else:
                a = [kind, a]
            e = False
        return (a, w, e)

    time_op = st.one_of(
        st.tuples(
            st.just("rolling"),
            st.sampled_from(_ROLL_AGGS),
            st.integers(min_value=2, max_value=4),
        ),
        st.tuples(
            st.sampled_from(["rateofchange", "rateofchangesec"]),
            st.none(),
            st.none(),
        ),
        st.tuples(
            st.just("resample"),
            st.sampled_from(_RESAMPLE_AGGS),
            st.sampled_from([7200, 14400]),
        ),
        st.tuples(st.just("rate_aggregate"), st.sampled_from(_RATE_AGGS), st.none()),
    )
    return st.tuples(_core(), st.lists(time_op, max_size=2)).map(build)


# --- comparison ---------------------------------------------------------------


def _close(x, y) -> bool:
    if x is None or y is None:
        return x is None and y is None
    if math.isnan(x) or math.isnan(y):
        return math.isnan(x) and math.isnan(y)
    return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)


@settings(
    max_examples=110,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(prog=_with_time_ops())
def test_ops_dsl_matches_duckdb(spark, grid_frame, oracle_con, prog):
    ast, width, _exact = prog
    out = evaluate(ast, grid_frame)
    spark_rows = [
        tuple(r)
        for r in out.df.select("ts", *out.cols).orderBy("ts").collect()
    ]
    sql = _Translator().sql(ast)
    oracle_rows = oracle_con.execute(sql).fetchall()
    assert len(spark_rows) == len(oracle_rows), (
        f"rowcount {len(spark_rows)} vs {len(oracle_rows)}\nAST {ast!r}\n{sql}"
    )
    for srow, orow in zip(spark_rows, oracle_rows):
        assert srow[0] == orow[0], f"ts {srow[0]} vs {orow[0]}\nAST {ast!r}"
        for j in range(1, width + 1):
            assert _close(srow[j], orow[j]), (
                f"ts {srow[0]} col {j}: spark={srow[j]!r} "
                f"oracle={orow[j]!r}\nAST {ast!r}\n{sql}"
            )

"""Engine-exact aggregation contract (r06).

The r05 driver flake (`tsdb_cusum_profile`) came from two independent
cross-engine divergences:

1. double summation is partition-order-dependent, so Spark's scheduled
   partial aggregation and DuckDB's sequential fold can land a half-ulp
   apart on a bucket mean;
2. ``round(x, n)`` itself disagrees between engines on exact-tie inputs
   (Spark rounds the double's shortest decimal string half-up, DuckDB
   rounds the binary-scaled product) — and bucket means of 2-dp data DO
   land on exact ties (1391.13 / 32 = 43.4728125).

These tests pin the two repairs: order-free long-backed sums
(`_xmean/_xsum/_xdev2`, `agg_expr(..., exact=True)`) and the
engine-uniform floor rounding (`_rnd_col` / `_rnd_sql`).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from gnocchi_spark.functions.aggregates import agg_expr
from gnocchi_spark.queries import (
    _rnd_col,
    _rnd_sql,
    _xdev2_col,
    _xmean_col,
    _xmean_sql,
    _xsum_col,
)

# 32 two-decimal values whose true mean is exactly 43.4728125 — a
# 7-fractional-digit tie at 6-dp rounding (the r05 cusum bucket).
TIE_VALUES = [43.47] * 31 + [43.56]
assert abs(sum(TIE_VALUES) / 32 - 43.4728125) < 1e-9


def _vals_df(spark, vals, parts):
    return (
        spark.createDataFrame([(float(v),) for v in vals], "value double")
        .repartition(parts)
    )


def test_xmean_is_partition_order_free(spark):
    # the same multiset must produce the bit-identical mean double no
    # matter how it is partitioned — the property plain avg() lacks
    vals = [round(0.01 * ((i * 7919) % 99991), 2) for i in range(5000)]
    means = set()
    for parts in (1, 7, 64):
        row = _vals_df(spark, vals, parts).agg(
            _xmean_col("value").alias("m")
        ).collect()[0]
        means.add(row["m"].hex())
    assert len(means) == 1, means


def test_xmean_matches_duckdb_exactly_on_tie_bucket(spark):
    got = _vals_df(spark, TIE_VALUES, 8).agg(
        _rnd_col(_xmean_col("value"), 6).alias("m")
    ).collect()[0]["m"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS value",
        [TIE_VALUES],
    )
    oracle = con.sql(
        f"SELECT {_rnd_sql(_xmean_sql('value'))} AS m FROM t"
    ).fetchone()[0]
    assert got == oracle == 43.472813  # half-up side, both engines


def test_rnd_col_is_engine_uniform_on_ties(spark):
    # floor(x*1e6+0.5)/1e6 must agree with DuckDB's same formula for
    # doubles sitting on (or near) 7-digit decimal ties — including the
    # values where native round() rules pick opposite sides
    ties = [43.4728125, 0.0000005, -2.0000005, 1.0000015, 119.91625]
    df = spark.createDataFrame([(v,) for v in ties], "x double")
    got = [
        r["r"]
        for r in df.select(_rnd_col("x", 6).alias("r"))
        .orderBy("r")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS x", [ties])
    want = [
        r[0]
        for r in con.sql(
            "SELECT (floor(x * 1e6 + 0.5) / 1e6) AS r FROM t ORDER BY r"
        ).fetchall()
    ]
    assert got == want


def test_agg_expr_exact_mean_and_sum_are_exact_for_2dp(spark):
    vals = [round(0.01 * ((i * 31) % 997), 2) for i in range(2000)]
    df = _vals_df(spark, vals, 16)
    row = df.agg(
        agg_expr("mean", exact=True).alias("m"),
        agg_expr("sum", exact=True).alias("s"),
    ).collect()[0]
    # exact rational arithmetic reference
    from fractions import Fraction

    fs = sum(Fraction(round(v * 100), 100) for v in vals)
    assert row["s"] == pytest.approx(float(fs), abs=0)
    assert row["m"] == float(fs) / len(vals)


def test_xdev2_is_partition_order_free(spark):
    vals = [round(0.01 * ((i * 37) % 9973), 2) for i in range(3000)]
    outs = set()
    for parts in (1, 11, 32):
        df = _vals_df(spark, vals, parts)
        mu = df.agg(_xmean_col("value").alias("mu")).collect()[0]["mu"]
        row = df.agg(
            _xdev2_col(F.col("value"), F.lit(mu)).alias("ss2")
        ).collect()[0]
        outs.add(row["ss2"].hex())
    assert len(outs) == 1, outs


def test_rollup_wide_exact_mode_is_repartition_stable(spark, sf_dir):
    from gnocchi_spark import tables
    from gnocchi_spark.operators.rollup import rollup_wide

    m = tables.events_as_measures(spark, sf_dir)
    base = {
        (r["metric_id"], r["bucket_ts"]): r["mean"].hex()
        for r in rollup_wide(m.repartition(1), ["mean"], 3600.0, exact=True)
        .collect()
    }
    shuffled = {
        (r["metric_id"], r["bucket_ts"]): r["mean"].hex()
        for r in rollup_wide(m.repartition(32), ["mean"], 3600.0, exact=True)
        .collect()
    }
    assert base == shuffled


def test_xsum_col_quantizes_engine_uniformly(spark):
    # messy (non-2dp) inputs: the 1e-6 floor quantization must match
    # DuckDB's identical formula bit-for-bit
    vals = [1.0 / 3, 2.0 / 7, 0.1 + 0.2, 43.4728125]
    got = _vals_df(spark, vals, 2).agg(
        _xsum_col("value").alias("s")
    ).collect()[0]["s"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS value", [vals]
    )
    want = con.sql(
        "SELECT CAST(sum(CAST(floor((value) * 1e6 + 0.5) AS BIGINT))"
        "       AS DOUBLE) / 1e6 AS s FROM t"
    ).fetchone()[0]
    assert got == want


# --- property-based: the kernel equals exact rational arithmetic and is
# partition-invariant for arbitrary 2-dp multisets -----------------------

from fractions import Fraction

from hypothesis import example, given, settings, strategies as st

_cents = st.lists(
    st.integers(min_value=-10_000, max_value=100_000),  # -100.00..1000.00
    min_size=1,
    max_size=40,
)


# --- r07 adversarial tie injection (VERDICT r06 next #4) ----------------
# The r06 "tie-free by construction" audit was prose over the shipped
# testdata distribution; these properties generate HOSTILE inputs for
# every _rnd/_xsum call class and assert Spark == DuckDB bit-for-bit.

# doubles whose true decimal value is EXACTLY x.xxxxxx5 — the 7th-digit
# tie where native round() picks opposite sides across engines
_odd_half_micros = st.integers(
    min_value=-(2**40), max_value=2**40
).map(lambda k: (2 * k + 1) / 2e6)

# arbitrary messy doubles (full-precision products/means territory)
_messy = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    min_size=1,
    max_size=24,
)


def _duck_col(vals, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS value", [vals])
    return con.sql(sql).fetchall()


@settings(max_examples=15, deadline=None)
@given(st.lists(_odd_half_micros, min_size=1, max_size=16))
def test_rnd_engine_uniform_on_injected_7digit_ties(spark, vals):
    # _rnd at 6dp over a corpus of EXACT 7th-digit ties: elementwise
    # Spark == DuckDB (pure-IEEE floor form; native round() provably
    # disagrees on a subset of these inputs)
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = sorted(
        r["r"] for r in df.select(_rnd_col("value", 6).alias("r")).collect()
    )
    want = sorted(
        r[0]
        for r in _duck_col(
            vals, f"SELECT {_rnd_sql('value')} AS r FROM t"
        )
    )
    assert got == want


@settings(max_examples=15, deadline=None)
@given(_messy)
def test_xsum_messy_doubles_order_free_and_engine_equal(spark, vals):
    # the floor-quantized long sum on MESSY doubles: identical for any
    # partitioning and equal to DuckDB's same formula — the property
    # the r07 product-sum sweep (correlation sab/saa/sbb, trend x*y,
    # autocorrelation d*d_k, cusum running dev) relies on
    outs = set()
    for parts in (1, 5):
        outs.add(
            _vals_df(spark, vals, parts)
            .agg(_xsum_col("value").alias("s"))
            .collect()[0]["s"]
            .hex()
        )
    assert len(outs) == 1
    want = _duck_col(
        vals,
        "SELECT CAST(sum(CAST(floor((value) * 1e6 + 0.5) AS BIGINT))"
        " AS DOUBLE) / 1e6 AS s FROM t",
    )[0][0]
    assert float.fromhex(outs.pop()) == want


@settings(max_examples=10, deadline=None)
@given(_messy)
@example([1e6] * 24)   # sum of quantized products = 2.4e19 > 2^63: a
@example([-1e6] * 24)  # LONG accumulator wraps here (r07 review
#   finding) while DuckDB promotes to HUGEINT — the DECIMAL(38,0)
#   accumulator must agree with DuckDB on the exact value
def test_xsum_of_products_engine_equal(spark, vals):
    # the product-sum call class itself: sum(floor(va*vb*1e6+0.5))
    # where va, vb are messy doubles (vb = reversed pairing)
    pairs = list(zip(vals, reversed(vals)))
    df = spark.createDataFrame(pairs, "va double, vb double")
    got = df.agg(
        _xsum_col(F.col("va") * F.col("vb")).alias("s")
    ).collect()[0]["s"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?::DOUBLE[]) AS va,"
        " unnest(?::DOUBLE[]) AS vb",
        [[a for a, _ in pairs], [b for _, b in pairs]],
    )
    want = con.sql(
        "SELECT CAST(sum(CAST(floor((va * vb) * 1e6 + 0.5) AS BIGINT))"
        " AS DOUBLE) / 1e6 AS s FROM t"
    ).fetchone()[0]
    assert got == want


@settings(max_examples=12, deadline=None)
@given(_cents)
def test_native_round_is_safe_on_2dp_exact_sums(spark, cents):
    # the SURVIVING native-round class: round(x, nd>=2) where x is a
    # decimal-exact sum of 2-dp inputs — x's true value has exactly
    # <= 2 fractional digits, so no round-boundary tie at nd >= 2 is
    # reachable and both engines' differing tie rules coincide
    vals = [c / 100.0 for c in cents]
    got = (
        _vals_df(spark, vals, 3)
        .agg(F.round(_xsum_col("value"), 4).alias("s"))
        .collect()[0]["s"]
    )
    want = _duck_col(
        vals,
        "SELECT round(CAST(sum(CAST(floor((value) * 1e6 + 0.5) AS BIGINT))"
        " AS DOUBLE) / 1e6, 4) AS s FROM t",
    )[0][0]
    assert got == want


def test_exact_std_decimal_combination_survives_large_moments(spark):
    # ADVICE r07: for 1e4 points near |v| = 5e3, n*S2 ~ 2.5e19 and
    # S1^2 ~ 2.5e19 both exceed 2^63 — the former LONG combination
    # silently wrapped (Spark non-ANSI) while DuckDB promoted to
    # HUGEINT, so std went wrong AND the engines diverged.  The
    # DECIMAL(38,0) combination matches DuckDB and exact rationals.
    from fractions import Fraction
    import math

    vals = [round(4999.0 + 0.01 * (i % 200), 2) for i in range(10_000)]
    got = (
        _vals_df(spark, vals, 16)
        .agg(agg_expr("std", exact=True).alias("s"))
        .collect()[0]["s"]
    )
    want = _duck_col(
        vals,
        "WITH q AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v"
        "           FROM t)"
        " SELECT sqrt(CAST(count(*) * sum(v * v) - sum(v) * sum(v)"
        "                  AS DOUBLE)"
        "             / CAST(count(*) * (count(*) - 1) AS DOUBLE)) / 100.0"
        " FROM q",
    )[0][0]
    assert got == want
    cs = [round(v * 100) for v in vals]
    n = len(cs)
    var = Fraction(n * sum(c * c for c in cs) - sum(cs) ** 2, n * (n - 1))
    exact = math.sqrt(var) / 100.0
    assert got == pytest.approx(exact, rel=1e-12)


@settings(max_examples=12, deadline=None)
@given(_cents)
def test_xmean_is_deterministic_and_ulp_exact_property(spark, cents):
    # The contract is DETERMINISM, not correct rounding: the kernel
    # computes fl(fl(S/1e6)/n) — two roundings — so it can sit 1 ulp
    # from the correctly-rounded rational mean (e.g. mean([0,0,0.21])),
    # but the value is bit-identical for every partitioning (and, per
    # the engine tests above, across engines).
    import math

    vals = [c / 100.0 for c in cents]
    want = float(sum(Fraction(c, 100) for c in cents) / len(cents))
    got = {
        _vals_df(spark, vals, parts)
        .agg(_xmean_col("value").alias("m"))
        .collect()[0]["m"]
        for parts in (1, 5)
    }
    assert len(got) == 1, got
    g = got.pop()
    assert abs(g - want) <= 2 * math.ulp(max(abs(want), 1e-300)), (g, want)

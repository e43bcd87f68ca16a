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

from hypothesis import given, settings, strategies as st

_cents = st.lists(
    st.integers(min_value=-10_000, max_value=100_000),  # -100.00..1000.00
    min_size=1,
    max_size=40,
)


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
